package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing ([EXT]): image/audio/video as opaque
  * `binary` columns with typed metadata. The Spark-side plumbing —
  * schema, batch iteration shape, partition-local decode loop — is
  * real and tested; the actual codec is STUBBED with a deterministic
  * fake (this container has no image/audio libraries), clearly marked
  * below. On a real cluster the stub body is replaced by the codec
  * call; nothing around it changes.
  *
  * Scale notes: decode is mapPartitions (one codec init per partition,
  * not per row — the same shape a Pandas-UDF/mapInPandas batch has);
  * metadata extraction is codegen'd expressions; binary payloads never
  * shuffle unless the caller groups on them (they shouldn't — shuffle
  * the metadata + keys, join payloads back by id).
  */
object Multimodal {

  /** Wrap a table into the canonical multimodal schema:
    * (id, content: binary, media_type, n_bytes, checksum). */
  def asBinaryTable(df: DataFrame, idCol: String, payloadCol: String,
      mediaType: String): DataFrame =
    df.select(col(idCol).as("id"),
      col(payloadCol).cast("binary").as("content"),
      lit(mediaType).as("media_type"),
      octet_length(col(payloadCol).cast("binary")).cast("long").as("n_bytes"),
      md5(col(payloadCol).cast("binary")).as("checksum"))

  case class MediaRow(id: Long, content: Array[Byte])
  case class Feature(id: Long, width: Int, height: Int, feature: Array[Double])

  /** Deterministic fake decode: byte histogram moments standing in for
    * pixel statistics. STUB — replace the marked block with a real
    * codec (e.g. javax.imageio / ffmpeg binding) in production. */
  private[ext] def fakeDecode(bytes: Array[Byte]): (Int, Int, Array[Double]) = {
    // >>> STUB: deterministic fake "decode" (no codecs in container) <<<
    val hist = new Array[Double](16)
    bytes.foreach(b => hist((b & 0xFF) / 16) += 1.0)
    val n = math.max(1, bytes.length)
    val feat = hist.map(_ / n)
    val side = math.max(1, math.sqrt(n.toDouble).toInt)
    (side, side, feat)
    // >>> END STUB <<<
  }

  /** Partition-batched feature extraction over binary payloads. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[Feature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // codec/session init would happen once per partition here
      it.map { row =>
        val (w, h, feat) = fakeDecode(row.content)
        Feature(row.id, w, h, feat)
      }
    }
  }

  /** "Frame sampling": every `stride`-th fixed-size chunk of the
    * payload (real chunking plumbing; decode of each frame is the same
    * stub). Output one row per sampled frame. */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int, stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { row =>
      row.content.grouped(frameBytes).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (chunk, idx) =>
          val (w, h, feat) = fakeDecode(chunk)
          (row.id, idx.toLong, chunk.length.toLong, w, h, feat)
        }
    }.toDF("id", "frame_idx", "frame_bytes", "width", "height", "feature")
  }
}
