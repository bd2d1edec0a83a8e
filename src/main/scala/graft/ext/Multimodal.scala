package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing ([EXT]): image/audio/video as opaque
  * `binary` columns with typed metadata. IMAGE decode is REAL —
  * javax.imageio (pure JDK: PNG/BMP/JPEG/GIF/TIFF), oracle-checked on
  * deterministic generated bitmaps. Payloads no image reader
  * recognizes fall back to byte-histogram moments; that fallback is
  * the one remaining STUB, and only because audio/video codecs
  * genuinely don't ship with the JDK — swap it for an ffmpeg binding
  * in production, nothing around it changes.
  *
  * Scale notes: decode is mapPartitions (one codec init per partition,
  * not per row — the same shape a Pandas-UDF/mapInPandas batch has);
  * metadata extraction is codegen'd expressions; binary payloads never
  * shuffle unless the caller groups on them (they shouldn't — shuffle
  * the metadata + keys, join payloads back by id).
  */
object Multimodal {

  // in-memory streams only — never spill ImageIO cache files to disk
  // on executors
  javax.imageio.ImageIO.setUseCache(false)

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

  /** Real image decode via javax.imageio (pure JDK). Returns
    * (width, height, [meanR, meanG, meanB, stdR, stdG, stdB]) or None
    * when no registered reader recognizes the payload. Moments are
    * computed as sum/n and sqrt(sumSq/n − mean²) in doubles — exact
    * and engine-reproducible for integer channels when n is a power of
    * two, which is what lets the DuckDB oracle recompute them. */
  private[graft] def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Double])] = {
    // a recognized-but-corrupt payload (valid signature, truncated data)
    // makes ImageIO.read THROW rather than return null — and one bad
    // record must not kill a 100-TB job, so decode failures degrade to
    // the byte-histogram fallback exactly like unrecognized formats
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      var sr, sg, sb, srr, sgg, sbb = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          val r = ((p >> 16) & 0xFF).toDouble
          val g = ((p >> 8) & 0xFF).toDouble
          val b = (p & 0xFF).toDouble
          sr += r; sg += g; sb += b
          srr += r * r; sgg += g * g; sbb += b * b
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toDouble
      val (mr, mg, mb) = (sr / n, sg / n, sb / n)
      Some((w, h, Array(mr, mg, mb,
        math.sqrt(srr / n - mr * mr),
        math.sqrt(sgg / n - mg * mg),
        math.sqrt(sbb / n - mb * mb))))
    }
  }

  /** Fallback for payloads that are NOT decodable images: byte
    * histogram moments standing in for real feature extraction.
    * STUB — audio/video codecs genuinely don't ship with the JDK;
    * replace this body with an ffmpeg binding in production. */
  private[ext] def byteHistogram(bytes: Array[Byte]): (Int, Int, Array[Double]) = {
    // >>> STUB: byte-histogram stand-in (audio/video codecs absent) <<<
    val hist = new Array[Double](16)
    bytes.foreach(b => hist((b & 0xFF) / 16) += 1.0)
    val n = math.max(1, bytes.length)
    val feat = hist.map(_ / n)
    val side = math.max(1, math.sqrt(n.toDouble).toInt)
    (side, side, feat)
    // >>> END STUB <<<
  }

  /** Decode dispatch: real image decode first, byte-histogram fallback
    * for non-image payloads. */
  private[ext] def decode(bytes: Array[Byte]): (Int, Int, Array[Double]) =
    decodeImage(bytes).getOrElse(byteHistogram(bytes))

  /** Deterministic w×h RGB test pattern for id: each channel is a pure
    * function of (id, x, y), so an external oracle can recompute the
    * decoded statistics without ever seeing the bytes. Encoded as BMP
    * (24-bit, lossless) via the same javax.imageio the decode uses. */
  def syntheticBmp(id: Long, w: Int = 8, h: Int = 8): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((id * 17 + x * 5 + y * 11) % 256).toInt
        val b = ((id * 7 + x * 3 + y * 29) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    bos.toByteArray
  }

  /** Partition-batched feature extraction over binary payloads. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[Feature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // codec/session init would happen once per partition here
      it.map { row =>
        val (w, h, feat) = decode(row.content)
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
          val (w, h, feat) = decode(chunk)
          (row.id, idx.toLong, chunk.length.toLong, w, h, feat)
        }
    }.toDF("id", "frame_idx", "frame_bytes", "width", "height", "feature")
  }
}
