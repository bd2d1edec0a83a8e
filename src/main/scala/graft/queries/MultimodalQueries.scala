package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.Multimodal

/** [EXT] multimodal-column queries: the binary plumbing is exercised
  * against `documents.text` payloads (no real media in the test data);
  * metadata extraction is oracle-checked, decode/frame paths are
  * rows-only (the decode itself is a documented deterministic stub). */
object MultimodalQueries {

  val all: Seq[Q] = Seq(

    // Binary metadata: byte length + checksum — oracle-checked
    Q("multimodal_metadata",
      (s, dir) => Multimodal.asBinaryTable(
          Tables.documents(s, dir), "doc_id", "text", "text/plain")
        .select(col("id"), col("media_type"), col("n_bytes"), col("checksum"))
        .orderBy("id"),
      Some("""SELECT doc_id AS id, 'text/plain' AS media_type,
             |       CAST(strlen(text) AS BIGINT) AS n_bytes, md5(text) AS checksum
             |FROM documents ORDER BY id""".stripMargin)),

    // Partition-batched feature extraction over binary payloads (stub decode)
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

    // Frame sampling plumbing: every 2nd 64-byte chunk (stub decode)
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
