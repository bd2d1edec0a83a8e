package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.Multimodal

/** [EXT] multimodal-column queries. Metadata extraction and the REAL
  * javax.imageio decode path are oracle-checked — the decode query
  * feeds deterministic generated bitmaps whose pixel channels are pure
  * functions of (id, x, y), so DuckDB recomputes the decoded channel
  * statistics analytically without ever seeing the bytes (BMP is
  * lossless and the 8×8 moments divide by a power of two, so the
  * doubles match bit-for-bit). The feature/frame queries run the same
  * plumbing over `documents.text` payloads, exercising the documented
  * byte-histogram fallback for non-image media. */
object MultimodalQueries {

  val all: Seq[Q] = Seq(

    // REAL image decode: synthesize an 8×8 BMP per doc, decode it with
    // javax.imageio, emit per-channel mean/std — oracle-checked against
    // the closed-form pixel statistics
    Q("multimodal_image_decode",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val ids = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        val media = ids.mapPartitions(
          _.map(id => Multimodal.MediaRow(id, Multimodal.syntheticBmp(id))))
        Multimodal.extractFeatures(media).toDF()
          .select(col("id"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            round(element_at(col("feature"), 1), 6).as("mean_r"),
            round(element_at(col("feature"), 2), 6).as("mean_g"),
            round(element_at(col("feature"), 3), 6).as("mean_b"),
            round(element_at(col("feature"), 4), 6).as("std_r"),
            round(element_at(col("feature"), 5), 6).as("std_g"),
            round(element_at(col("feature"), 6), 6).as("std_b"))
          .orderBy("id")
      },
      Some("""WITH px AS (SELECT doc_id, x, y,
             |    ((doc_id*31 + x*7 + y*13) % 256) AS r,
             |    ((doc_id*17 + x*5 + y*11) % 256) AS g,
             |    ((doc_id*7 + x*3 + y*29) % 256) AS b
             |  FROM documents, (SELECT unnest(range(8)) AS x), (SELECT unnest(range(8)) AS y))
             |SELECT doc_id AS id, CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
             |  round(avg(r), 6) AS mean_r, round(avg(g), 6) AS mean_g, round(avg(b), 6) AS mean_b,
             |  round(sqrt(avg(r*r) - avg(r)*avg(r)), 6) AS std_r,
             |  round(sqrt(avg(g*g) - avg(g)*avg(g)), 6) AS std_g,
             |  round(sqrt(avg(b*b) - avg(b)*avg(b)), 6) AS std_b
             |FROM px GROUP BY doc_id ORDER BY id""".stripMargin)),

    // Binary metadata: byte length + checksum — oracle-checked
    Q("multimodal_metadata",
      (s, dir) => Multimodal.asBinaryTable(
          Tables.documents(s, dir), "doc_id", "text", "text/plain")
        .select(col("id"), col("media_type"), col("n_bytes"), col("checksum"))
        .orderBy("id"),
      Some("""SELECT doc_id AS id, 'text/plain' AS media_type,
             |       CAST(strlen(text) AS BIGINT) AS n_bytes, md5(text) AS checksum
             |FROM documents ORDER BY id""".stripMargin)),

    // Partition-batched feature extraction over non-image binary
    // payloads (exercises the byte-histogram fallback path)
    Q("multimodal_features",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val media = Multimodal.asBinaryTable(
            Tables.documents(s, dir), "doc_id", "text", "text/plain")
          .select(col("id"), col("content")).as[Multimodal.MediaRow]
        Multimodal.extractFeatures(media).toDF()
          .select(col("id"), col("width").cast("long").as("width"),
            round(element_at(col("feature"), 1), 6).as("f0"))
          .orderBy("id")
      }),

    // Frame sampling plumbing: every 2nd 64-byte chunk (non-image
    // chunks → byte-histogram fallback)
    Q("multimodal_frames",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val media = Multimodal.asBinaryTable(
            Tables.documents(s, dir), "doc_id", "text", "text/plain")
          .select(col("id"), col("content")).as[Multimodal.MediaRow]
        Multimodal.sampleFrames(media, 64, 2)
          .groupBy("id")
          .agg(count(lit(1)).as("n_frames"), sum(col("frame_bytes")).as("bytes_sampled"))
          .orderBy("id")
      })
  )
}
