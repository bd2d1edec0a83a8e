package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing ([EXT]): image/audio/video as opaque
  * `binary` columns with typed metadata. IMAGE decode is REAL —
  * javax.imageio (pure JDK: PNG/BMP/JPEG/GIF/TIFF), oracle-checked on
  * deterministic generated bitmaps. AUDIO decode is REAL —
  * javax.sound.sampled (pure JDK: WAV/AIFF/AU containers, PCM),
  * oracle-checked on deterministic generated WAVs. VIDEO pixel decode
  * is REAL for Motion-JPEG tracks (first MP4 sample located via the
  * container tables, decoded with the same ImageIO), oracle-checked on
  * deterministic MJPEG-in-MP4 fixtures. Payloads none of those paths
  * recognize fall back to byte-histogram moments; that fallback is the
  * one remaining STUB, and only for what genuinely needs a native
  * decoder: H.264 beyond the decoded subset (inter residuals, other
  * partitions, B slices, CABAC) and hev1. MPEG-1 decodes FULLY — I,
  * P and B pictures — and H.264 decodes baseline-intra PLUS
  * single-reference P slices (quarter-pel MC, P_Skip, intra
  * refresh), all pure-JVM (rounds 12/12b) — swap the fence for an
  * ffmpeg binding in production, nothing around it changes.
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
  /** `decoded = false` marks the byte-histogram DEGRADE path (the
    * permanent predictive-codec fence, COVERAGE.md): downstream sees
    * typed features either way and filters on the flag. */
  case class Feature(id: Long, width: Int, height: Int,
    feature: Array[Double], decoded: Boolean)

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

  /** Real audio decode via javax.sound.sampled (pure JDK: WAV/AIFF/AU
    * containers, PCM payloads). Parses the container header for format
    * metadata, decodes the PCM frames, and returns
    * (sampleRateHz, channels, nSamples, [mean, rms, zeroCrossings,
    * min, max]) over all samples (channels interleaved). Returns None
    * when no registered reader recognizes the payload or the encoding
    * is not integer PCM. Like [[decodeImage]], a recognized-but-corrupt
    * payload degrades to None rather than killing the job. */
  private[graft] def decodeAudio(bytes: Array[Byte]): Option[(Float, Int, Long, Array[Double])] = {
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (ais == null) return None
    try {
      val fmt = ais.getFormat
      val bits = fmt.getSampleSizeInBits
      val signed = fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
      val unsigned = fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
      if (!(signed || unsigned) || bits % 8 != 0 || bits == 0 || bits > 32) return None
      val raw = ais.readAllBytes()
      val bytesPer = bits / 8
      val n = raw.length / bytesPer
      var i = 0
      var sum, sumSq = 0.0
      var mn = Double.MaxValue
      var mx = Double.MinValue
      var zc = 0L
      var prevNonNeg = true
      while (i < n) {
        var v = 0L
        var b = 0
        while (b < bytesPer) {
          val off = i * bytesPer + b
          val by = raw(off) & 0xFFL
          if (fmt.isBigEndian) v = (v << 8) | by
          else v = v | (by << (8 * b))
          b += 1
        }
        // sign-extend signed PCM; shift unsigned PCM to signed range
        val s =
          if (signed) (v << (64 - bits)) >> (64 - bits)
          else v - (1L << (bits - 1))
        val d = s.toDouble
        sum += d; sumSq += d * d
        if (d < mn) mn = d
        if (d > mx) mx = d
        val nonNeg = s >= 0
        if (i > 0 && nonNeg != prevNonNeg) zc += 1
        prevNonNeg = nonNeg
        i += 1
      }
      if (n == 0) None
      else Some((fmt.getSampleRate, fmt.getChannels, n.toLong,
        Array(sum / n, math.sqrt(sumSq / n), zc.toDouble, mn, mx)))
    } catch { case _: Exception => None }
    finally ais.close()
  }

  /** Deterministic 16-bit mono PCM WAV for id: sample t is a pure
    * integer function of (id, t), so an external oracle recomputes the
    * decoded statistics without seeing the bytes (n a power of two →
    * the integer moments divide exactly in doubles). Encoded through
    * the same javax.sound.sampled container writer the decode parses. */
  def syntheticWavSample(id: Long, t: Int): Int =
    ((id * 37 + t * 13 + (t.toLong * t % 97) * 5) % 4001 - 2000).toInt

  /** mod > 0 compresses the sample into (−mod, mod) via remainder —
    * sign-of-dividend in BOTH JVM and SQL engines, so the quiet
    * variant stays closed-form reproducible (plants silent windows
    * for the energy profiler). */
  def syntheticWav(id: Long, n: Int = 64, sampleRate: Float = 8000f,
      mod: Int = 0): Array[Byte] = {
    val data = new Array[Byte](n * 2)
    var t = 0
    while (t < n) {
      val s0 = syntheticWavSample(id, t)
      val s = if (mod > 0) s0 % mod else s0
      data(2 * t) = (s & 0xFF).toByte // 16-bit little-endian signed PCM
      data(2 * t + 1) = ((s >> 8) & 0xFF).toByte
      t += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Raw PCM samples of a decoded 16-bit signed little-endian mono
    * stream (the shape [[syntheticWav]] writes and crawl audio is
    * normalized to before analysis). None for anything else — decode
    * failures degrade, never throw. */
  private[graft] def pcmSamples(bytes: Array[Byte]): Option[Array[Int]] = {
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (ais == null) return None
    try {
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
        fmt.isBigEndian ||
        fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
        return None
      val raw = ais.readAllBytes()
      val out = new Array[Int](raw.length / 2)
      var i = 0
      while (i < out.length) {
        out(i) = ((raw(2 * i) & 0xFF) | (raw(2 * i + 1) << 8)).toShort.toInt
        i += 1
      }
      Some(out)
    } catch { case _: Exception => None }
    finally ais.close()
  }

  /** Windowed PCM energy profile — the audio pre-filter of a
    * multimodal curation pipeline (silence / dead-air detection before
    * any expensive feature extraction): fixed-size sample windows →
    * integer sum-of-squares, RMS, and a silence flag from an EXACT
    * integer compare (sum_sq < silenceSumSq), so the flag is
    * engine-reproducible with no float threshold ambiguity. Decode is
    * real (javax.sound PCM). Scale: decode runs per partition, only
    * (id, win, sum_sq) rows ever shuffle — the audio payload does not.
    * Trailing partial windows are dropped (fixed-denominator RMS). */
  def audioEnergyWindows(media: Dataset[MediaRow], window: Int,
      silenceSumSq: Long): DataFrame = {
    // fail fast on the driver: grouped(window) would otherwise throw an
    // obscure IllegalArgumentException inside an executor task
    require(window > 0, s"audioEnergyWindows: window must be > 0 (got $window)")
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { row =>
      pcmSamples(row.content) match {
        case None => Iterator.empty
        case Some(s) =>
          s.grouped(window).zipWithIndex
            .filter(_._1.length == window)
            .map { case (w, i) =>
              var ss = 0L
              var j = 0
              while (j < window) { ss += w(j).toLong * w(j); j += 1 }
              (row.id, i.toLong, ss, math.sqrt(ss.toDouble / window),
                ss < silenceSumSq)
            }
      }
    }.toDF("id", "win", "sum_sq", "rms", "silent")
  }

  /** Silence-trim INTERVENTION over an [[audioEnergyWindows]] frame —
    * the dead-air removal a speech-data pipeline applies before
    * feature extraction (silent windows carry no trainable signal but
    * cost the same decode/transform compute): per doc, drop the silent
    * windows and report what survives. kept_rms is the RMS over the
    * KEPT windows only (null when everything was silent — an all-dead
    * clip is a drop candidate, not a divide-by-zero). One map-side
    * partial agg on the already-tiny (id, win) frame — the audio
    * payload was never part of it. */
  def audioTrimSilence(energy: DataFrame, window: Int): DataFrame = {
    val kept = count(lit(1)) - sum(when(col("silent"), 1L).otherwise(0L))
    energy.groupBy("id").agg(
      count(lit(1)).as("n_windows"),
      sum(when(col("silent"), 1L).otherwise(0L)).as("n_silent"),
      (kept * window).as("kept_samples"),
      round(sqrt(sum(when(!col("silent"), col("sum_sq")))
        / (kept * window).cast("double")), 6).as("kept_rms"))
  }

  /** Audio near-dup fingerprint over an [[audioEnergyWindows]] frame —
    * the Shazam constellation idea (Wang, ISMIR 2003) reduced to its
    * integer core: per clip, the coarse per-window energy LEVEL
    * (linear `bucket`-wide bins, capped at 15) concatenated with the
    * DELTA TRITS (rise/flat/fall) between consecutive windows. Two
    * clips whose loudness contour moves the same way land on the same
    * fingerprint; grouping is ONE equi-shuffle on the fingerprint
    * string — no pair enumeration anywhere, so a hot fingerprint costs
    * a count, not a quadratic blow-up (the house banded-dedup rule
    * applied to audio). Boundary-adjacent energies can split a true
    * near-dup across buckets — the standard LSH trade, documented, and
    * why the surface is "candidate groups", not verdicts.
    *
    * Integer-pure end to end (levels are integral division of the
    * exact PCM sum-of-squares, trits are comparisons), so the DuckDB
    * oracle replays it bit-for-bit from the synthetic PCM formula. */
  def audioFingerprintGroups(energy: DataFrame,
      bucket: Long = 4194304L): DataFrame = {
    require(bucket > 0, s"audioFingerprintGroups: bucket must be > 0 (got $bucket)")
    val prof = energy.groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("win"), col("sum_sq")))).as("ws"))
      .select(col("id"), expr("transform(ws, x -> x.sum_sq)").as("es"))
    val fp = prof.select(col("id"), expr(
      s"""concat(
         |  concat_ws('|', transform(es, e -> cast(least(15L, e div ${bucket}L) as string))),
         |  '#',
         |  if(size(es) < 2, '',
         |    concat_ws('', transform(sequence(0, size(es) - 2),
         |      i -> case when es[i+1] > es[i] then '2'
         |                when es[i+1] < es[i] then '0' else '1' end))))""".stripMargin)
      .as("fp"))
    fp.groupBy(col("fp"))
      .agg(count(lit(1)).as("n_docs"), min(col("id")).as("min_id"))
      .filter(col("n_docs") >= 2)
  }

  /** Parsed MP4/ISO-BMFF container metadata: major brand (ftyp),
    * movie timescale + duration in ticks (mvhd), track count (trak),
    * per-track codec 4ccs in trak order (stsd first sample entry),
    * total sync-sample (keyframe) count across tracks (stss
    * entry_count), and the first track's first keyframe sample number
    * (−1 when no track carries an stss). */
  case class Mp4Meta(brand: String, timescale: Long, duration: Long,
      nTracks: Int, codecs: Seq[String] = Nil, nKeyframes: Long = 0L,
      firstKeyframe: Long = -1L)

  /** Pure-JDK ISO-BMFF box primitives shared by every MP4 parser here
    * (ISO/IEC 14496-12 box grammar: 4-byte big-endian size, 4-byte
    * type; size==1 → 64-bit largesize follows; size==0 → to end). */
  private final class BoxWalker(bytes: Array[Byte]) {
    def u32(off: Int): Long =
      ((bytes(off) & 0xFFL) << 24) | ((bytes(off + 1) & 0xFFL) << 16) |
        ((bytes(off + 2) & 0xFFL) << 8) | (bytes(off + 3) & 0xFFL)
    def u64(off: Int): Long = (u32(off) << 32) | u32(off + 4)
    /** Walk boxes in [from, to); f receives (boxType, payloadOff,
      * payloadEnd). False on any malformed box. */
    def walk(from: Int, to: Int)(f: (String, Int, Int) => Unit): Boolean = {
      var pos = from
      while (pos < to) {
        if (pos + 8 > to) return false
        var size = u32(pos)
        var hdr = 8
        if (size == 1) {
          if (pos + 16 > to) return false
          size = u64(pos + 8); hdr = 16
        } else if (size == 0) size = (to - pos).toLong
        if (size < hdr || pos + size > to) return false
        f(new String(bytes, pos + 4, 4, "US-ASCII"), pos + hdr, pos + size.toInt)
        pos += size.toInt
      }
      true
    }
    /** Descend box path segments (e.g. mdia→minf→stbl) under [from,to). */
    def descend(from: Int, to: Int, path: List[String])(
        f: (String, Int, Int) => Unit): Unit = path match {
      case Nil => walk(from, to)(f); ()
      case seg :: rest =>
        walk(from, to) { (t, o, e) => if (t == seg) descend(o, e, rest)(f) }
        ()
    }
  }

  /** REAL MP4 container metadata via a pure-JDK ISO-BMFF box walk
    * (ISO/IEC 14496-12 box grammar: 4-byte big-endian size, 4-byte
    * type; size==1 → 64-bit largesize follows): reads the ftyp major
    * brand, the moov/mvhd timescale + duration (version 0 and 1
    * layouts), counts moov/trak boxes, and descends each
    * trak→mdia→minf→stbl for the stsd codec identifier (the first
    * sample entry's 4cc — 'avc1'/'hev1'/'mp4v'/…) and the stss
    * sync-sample table (keyframe count + first keyframe sample
    * number). Still codec-free: these live in the container's sample
    * TABLES, not the bitstream — only pixel decode needs a codec.
    * Returns None for anything malformed (truncated box, missing
    * ftyp/moov/mvhd) rather than throwing: one bad record must not
    * kill a 100-TB job. */
  private[graft] def parseMp4Metadata(bytes: Array[Byte]): Option[Mp4Meta] = {
    val bw = new BoxWalker(bytes)
    import bw.{u32, u64, walk, descend}
    try {
      var brand: String = null
      var timescale = -1L
      var duration = -1L
      var tracks = 0
      val codecs = scala.collection.mutable.ArrayBuffer.empty[String]
      var nKeyframes = 0L
      var firstKeyframe = -1L
      val ok = walk(0, bytes.length) { (typ, off, end) =>
        typ match {
          case "ftyp" if end - off >= 4 && brand == null =>
            brand = new String(bytes, off, 4, "US-ASCII")
          case "moov" =>
            val inner = walk(off, end) { (t, o, e) =>
              t match {
                case "mvhd" if e - o >= 4 =>
                  val version = bytes(o) & 0xFF
                  if (version == 0 && e - o >= 20) {
                    timescale = u32(o + 12); duration = u32(o + 16)
                  } else if (version == 1 && e - o >= 28) {
                    timescale = u32(o + 20); duration = u64(o + 24)
                  }
                case "trak" =>
                  tracks += 1
                  descend(o, e, List("mdia", "minf", "stbl")) { (t4, o4, e4) =>
                    t4 match {
                      case "stsd" if e4 - o4 >= 16 && u32(o4 + 4) >= 1 =>
                        // FullBox(4) + entry_count(4) + entry size(4) + 4cc
                        codecs += new String(bytes, o4 + 12, 4, "US-ASCII")
                      case "stss" if e4 - o4 >= 8 =>
                        val n = u32(o4 + 4)
                        nKeyframes += n
                        if (firstKeyframe < 0 && n > 0 && e4 - o4 >= 12)
                          firstKeyframe = u32(o4 + 8)
                      case _ => ()
                    }
                  }
                case _ => ()
              }
            }
            if (!inner) { timescale = -1 } // malformed moov → None
          case _ => ()
        }
      }
      if (ok && brand != null && timescale > 0 && duration >= 0)
        Some(Mp4Meta(brand, timescale, duration, tracks,
          codecs.toSeq, nKeyframes, firstKeyframe))
      else None
    } catch { case _: Exception => None }
  }

  /** Per-track sample-size tables (stsz) from the same pure-JDK box
    * walk — the container-level BITRATE profile (frame-size
    * distribution over time) a video curation pass uses to spot
    * broken/padded/black-frame files before any pixel decode. Returns
    * the per-trak (in moov order) sample sizes; a track with a fixed
    * sample_size != 0 expands to sample_count copies (the spec's
    * constant-size shorthand). None when the container is malformed —
    * degrade, never throw. Fence note: this narrows the video stub
    * further; only pixel/bitstream decode remains stubbed. */
  private[graft] def parseMp4SampleSizes(bytes: Array[Byte]): Option[Seq[Array[Long]]] = {
    val bw = new BoxWalker(bytes)
    import bw.{u32, walk, descend}
    try {
      var sawMoov = false
      val perTrack = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
      val ok = walk(0, bytes.length) { (typ, off, end) =>
        if (typ == "moov") {
          sawMoov = true
          walk(off, end) { (t, o, e) =>
            if (t == "trak") {
              var sizes: Array[Long] = Array.emptyLongArray
              descend(o, e, List("mdia", "minf", "stbl")) { (t4, o4, e4) =>
                if (t4 == "stsz" && e4 - o4 >= 12) {
                  val fixed = u32(o4 + 4)
                  val n = u32(o4 + 8).toInt
                  // the explicit path is bounded by the box payload; the
                  // constant-size path has no table to validate against,
                  // so cap the expansion — a crafted count must not OOM
                  // the task (Error, not Exception: uncatchable here)
                  sizes =
                    if (fixed != 0 && n >= 0 && n <= (1 << 24)) Array.fill(n)(fixed)
                    else if (fixed == 0 && n >= 0 && e4 - o4 >= 12 + 4L * n)
                      Array.tabulate(n)(j => u32(o4 + 12 + 4 * j))
                    else Array.emptyLongArray
                }
              }
              perTrack += sizes
            }
          }
          ()
        }
      }
      if (ok && sawMoov) Some(perTrack.toSeq) else None
    } catch { case _: Exception => None }
  }

  /** Per-trak FIRST SAMPLE locator: (codec 4cc, absolute file offset,
    * byte size) of sample 1 — [[trackSamples]] narrowed to its head
    * entry (sample 1 of chunk 1 starts at the first chunk offset,
    * valid for any chunk count), with the same in-range guard the
    * original locator applied. Tracks missing any table, or whose
    * first sample falls outside the file, are skipped — degrade,
    * never throw. */
  private[graft] def firstSamples(bytes: Array[Byte]): Option[Seq[(String, Long, Long)]] =
    trackSamples(bytes).map(_.collect {
      case (codec, off, sizes)
          if sizes.head > 0 && off + sizes.head <= bytes.length =>
        (codec, off, sizes.head)
    })

  /** MJPEG sample-entry 4ccs (QuickTime File Format spec): every
    * sample is a self-contained JPEG image. */
  private[graft] val MjpegCodecs = Set("jpeg", "mjpa", "mjpb")

  /** Per-trak ALL-SAMPLES locator for single-chunk tracks:
    * (codec 4cc, chunk offset, per-sample byte sizes) from
    * stsd + stsz + stco/co64. Sample j starts at
    * chunkOff + Σ sizes[0..j-1] — the contiguous layout of a
    * single-chunk track (stco entry_count 1), which is how
    * self-contained short clips (and the MJPEG fixtures) are laid
    * out. Multi-chunk tracks (stco entry_count > 1) are OUT of the
    * contiguous contract for samples past chunk 1 — the formula would
    * slice wrong bytes, and a silent wrong-offset decode is worse
    * than a degrade — so such tracks expose ONLY their first sample
    * (sample 1 of chunk 1 always starts at the first chunk offset).
    * Range validation happens at decode time per sample, so a
    * truncated tail degrades to the decodable prefix, never a throw. */
  private[graft] def trackSamples(bytes: Array[Byte]): Option[Seq[(String, Long, Array[Long])]] = {
    val bw = new BoxWalker(bytes)
    import bw.{u32, u64, walk, descend}
    try {
      var sawMoov = false
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Array[Long])]
      val ok = walk(0, bytes.length) { (typ, off, end) =>
        if (typ == "moov") {
          sawMoov = true
          walk(off, end) { (t, o, e) =>
            if (t == "trak") {
              var codec: String = null
              var sizes: Array[Long] = Array.emptyLongArray
              var offset = -1L
              var nChunks = 0L
              descend(o, e, List("mdia", "minf", "stbl")) { (t4, o4, e4) =>
                t4 match {
                  case "stsd" if e4 - o4 >= 16 && u32(o4 + 4) >= 1 =>
                    codec = new String(bytes, o4 + 12, 4, "US-ASCII")
                  case "stsz" if e4 - o4 >= 12 =>
                    val fixed = u32(o4 + 4)
                    val n = u32(o4 + 8).toInt
                    // same bounds discipline as parseMp4SampleSizes: the
                    // constant-size expansion is capped so a crafted
                    // count can't OOM the task
                    sizes =
                      if (fixed != 0 && n >= 0 && n <= (1 << 24)) Array.fill(n)(fixed)
                      else if (fixed == 0 && n >= 0 && e4 - o4 >= 12 + 4L * n)
                        Array.tabulate(n)(j => u32(o4 + 12 + 4 * j))
                      else Array.emptyLongArray
                  case "stco" if e4 - o4 >= 12 && u32(o4 + 4) >= 1 =>
                    nChunks = u32(o4 + 4); offset = u32(o4 + 8)
                  case "co64" if e4 - o4 >= 16 && u32(o4 + 4) >= 1 =>
                    nChunks = u32(o4 + 4); offset = u64(o4 + 8)
                  case _ => ()
                }
              }
              if (codec != null && sizes.nonEmpty && offset >= 0)
                out += ((codec, offset,
                  if (nChunks == 1) sizes else sizes.take(1)))
            }
          }
          ()
        }
      }
      if (ok && sawMoov) Some(out.toSeq) else None
    } catch { case _: Exception => None }
  }

  /** Band-0 raster moments of a decoded image: (width, height, mean,
    * std) over raw component values — no getRGB color-space
    * conversion, so a grayscale JPEG's statistics are exact and
    * closed-form-checkable. */
  private def grayStats(img: java.awt.image.BufferedImage): (Int, Int, Double, Double) = {
    val w = img.getWidth
    val h = img.getHeight
    val raster = img.getRaster
    var sum = 0.0
    var sumSq = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = raster.getSample(x, y, 0).toDouble
        sum += v; sumSq += v * v
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).toDouble
    val mean = sum / n
    (w, h, mean, math.sqrt(sumSq / n - mean * mean))
  }

  /** REAL video pixel decode for Motion-JPEG tracks — the one video
    * codec decodable with the pure-JDK ImageIO path: locate the
    * samples of the first MJPEG track via the container tables
    * ([[trackSamples]]), slice each out of mdat, decode the JPEG, and
    * emit (frame 1-based, width, height, meanGray, stdGray) per
    * sample — at most `maxFrames` (BOUNDED: a long clip costs
    * O(maxFrames) decodes, not O(track length); MJPEG is all-intra,
    * so every sample is a keyframe). Samples that fall outside the
    * file or fail to decode are skipped — degrade, never throw.
    * Empty when the payload is not MP4 or has no MJPEG track. */
  private[graft] def decodeMjpegFrames(bytes: Array[Byte],
      maxFrames: Int): Seq[(Int, Int, Int, Double, Double)] =
    trackSamples(bytes).toSeq.flatMap { tracks =>
      tracks.collectFirst {
        case (c, off, sizes) if MjpegCodecs(c) && sizes.nonEmpty => (off, sizes)
      }.toSeq.flatMap { case (off, sizes) =>
        val bounded = sizes.take(maxFrames)
        val starts = bounded.scanLeft(off)(_ + _)
        bounded.indices.flatMap { i =>
          val s = starts(i)
          val len = bounded(i)
          if (s < 0 || len <= 0 || s + len > bytes.length) None
          else {
            val sample = java.util.Arrays.copyOfRange(bytes, s.toInt, (s + len).toInt)
            val img =
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(sample))
              catch { case _: Exception => null }
            if (img == null) None
            else {
              val (w, h, mean, std) = grayStats(img)
              Some((i + 1, w, h, mean, std))
            }
          }
        }
      }
    }

  /** REAL video pixel decode for MJPEG-in-AVI — the second all-intra
    * public container covered pure-JDK (VERDICT r8 #7; AVI-1.0 RIFF
    * layout per the public msdn/OpenDML spec): walk the RIFF
    * ('RIFF'<size>'AVI ') top-level chunks to the 'movi' LIST, and
    * decode its video data chunks ('##dc' compressed / '##db'
    * uncompressed, stream-numbered 4ccs, WORD-aligned with a pad byte
    * after odd sizes) as JPEG via the same ImageIO path as the MP4
    * track decode. Emits (frame ordinal among video chunks, 1-based,
    * width, height, meanGray, stdGray), at most `maxFrames` decodes
    * (bounded like [[decodeMjpegFrames]]). Chunks that fail to decode
    * are skipped WITHOUT renumbering — degrade, never throw; empty
    * for non-AVI payloads. All sizes little-endian (RIFF), vs MP4's
    * big-endian boxes. */
  /** Scene-cut detection over per-frame pixel statistics ([EXT]): flag
    * frame transitions whose mean-luma jump exceeds `thresh` — the
    * shot-boundary pre-pass of a video curation pipeline (sample one
    * frame per SHOT instead of on a fixed stride, dedup near-identical
    * shots, bound per-shot captioning cost). Input is any
    * (id, frame, mean_gray) table — the [[decodeMjpegFrames]] /
    * [[decodeAviMjpegFrames]] output shape, so it composes with both
    * container walks. Per-id lag window: state is bounded by the
    * decoder's maxFrames and the only shuffle key is the doc id the
    * multimodal pipeline already partitions by. Frame 1 has no
    * predecessor and is not a transition row; `delta` is signed
    * (fade-in vs fade-out reads from the sign), the cut flag compares
    * the UNROUNDED jump so the 6-dp display rounding can't flip it. */
  def sceneCuts(frames: DataFrame, thresh: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("id")).orderBy(col("frame"))
    frames
      .withColumn("__prev", lag(col("mean_gray"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .select(col("id"), col("frame"),
        round(col("mean_gray") - col("__prev"), 6).as("delta"),
        (abs(col("mean_gray") - col("__prev")) >= thresh).as("is_cut"))
  }

  /** Chroma-aware scene cuts (round 15, VERDICT r14 #7): a shot
    * boundary is flagged when the LUMA mean jumps past `threshY` OR
    * either CHROMA mean jumps past `threshC` — a color fade or flash
    * at constant brightness is invisible to the luma-only
    * [[sceneCuts]]. Input is any (id, frame, mean_y, mean_u, mean_v)
    * table — the [[decodeAvcFramesYuvStats]] shape. Same per-id lag
    * window and unrounded-comparison discipline as [[sceneCuts]]. */
  def sceneCutsYuv(frames: DataFrame, threshY: Double,
      threshC: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("id")).orderBy(col("frame"))
    frames
      .withColumn("__py", lag(col("mean_y"), 1).over(w))
      .withColumn("__pu", lag(col("mean_u"), 1).over(w))
      .withColumn("__pv", lag(col("mean_v"), 1).over(w))
      .filter(col("__py").isNotNull)
      .select(col("id"), col("frame"),
        round(col("mean_y") - col("__py"), 6).as("delta_y"),
        round(col("mean_u") - col("__pu"), 6).as("delta_u"),
        round(col("mean_v") - col("__pv"), 6).as("delta_v"),
        (abs(col("mean_y") - col("__py")) >= threshY ||
          abs(col("mean_u") - col("__pu")) >= threshC ||
          abs(col("mean_v") - col("__pv")) >= threshC).as("is_cut"))
  }

  private[graft] def decodeAviMjpegFrames(bytes: Array[Byte],
      maxFrames: Int): Seq[(Int, Int, Int, Double, Double)] = {
    def fcc(off: Int): String =
      if (off + 4 > bytes.length) ""
      else new String(bytes, off, 4, "US-ASCII")
    def le32(off: Int): Long =
      (bytes(off) & 0xFFL) | ((bytes(off + 1) & 0xFFL) << 8) |
        ((bytes(off + 2) & 0xFFL) << 16) | ((bytes(off + 3) & 0xFFL) << 24)
    if (bytes.length < 12 || fcc(0) != "RIFF" || fcc(8) != "AVI ") return Nil
    val end = math.min(bytes.length.toLong, 8L + le32(4)).toInt
    val out = Seq.newBuilder[(Int, Int, Int, Double, Double)]
    var found = 0
    var decoded = 0
    var off = 12
    while (off + 8 <= end && decoded < maxFrames) {
      val id = fcc(off)
      val sz = le32(off + 4)
      if (id == "LIST" && off + 12 <= end && fcc(off + 8) == "movi") {
        val lend = math.min(end.toLong, off + 8 + sz).toInt
        var p = off + 12
        while (p + 8 <= lend && decoded < maxFrames) {
          val cid = fcc(p)
          val csz = le32(p + 4)
          val s = p + 8
          val isVideo = cid.length == 4 &&
            cid(0).isDigit && cid(1).isDigit &&
            cid(2) == 'd' && (cid(3) == 'c' || cid(3) == 'b')
          if (isVideo && csz > 0 && s + csz <= lend) {
            found += 1
            val sample = java.util.Arrays.copyOfRange(bytes, s, (s + csz).toInt)
            val img =
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(sample))
              catch { case _: Exception => null }
            if (img != null) {
              val (w, h, mean, std) = grayStats(img)
              out += ((found, w, h, mean, std))
              decoded += 1
            }
          } else if (isVideo) found += 1
          p = s + csz.toInt + (csz.toInt & 1) // WORD alignment pad
        }
      }
      off = off + 8 + sz.toInt + (sz.toInt & 1)
    }
    out.result()
  }

  /** Deterministic MJPEG-in-AVI fixture for id: RIFF('AVI ') with a
    * minimal hdrl (avih main header + one 'vids'/'MJPG' strl) and a
    * movi LIST of `nFrames` '00dc' chunks, each a [[quadrantJpeg]] —
    * the SAME frames as [[syntheticMjpegMp4]], so one closed-form
    * oracle covers both containers. JPEG sizes are frequently odd:
    * the writer emits the spec's pad byte after odd chunks, so the
    * fixture exercises WORD alignment by construction. */
  def syntheticMjpegAvi(id: Long, nFrames: Int = 1): Array[Byte] = {
    require(nFrames >= 1, s"nFrames must be >= 1, got $nFrames")
    def le32(v: Long) = Array[Byte](
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def chunk(id4: String, payload: Array[Byte]): Array[Byte] =
      id4.getBytes("US-ASCII") ++ le32(payload.length.toLong) ++ payload ++
        (if (payload.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
    def list(typ: String, payload: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes("US-ASCII") ++ payload)
    val jpegs = (0 until nFrames).map(f => quadrantJpeg(id, f))
    // avih: 56-byte main header (frame period µs, then zeros except
    // totalFrames/streams/width/height)
    val avih = chunk("avih", le32(33333) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(nFrames.toLong) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(16) ++ le32(16) ++ new Array[Byte](16))
    val strh = chunk("strh", "vids".getBytes("US-ASCII") ++
      "MJPG".getBytes("US-ASCII") ++ new Array[Byte](48))
    // strf: BITMAPINFOHEADER (biSize 40, 16×16, 1 plane, 24bpp, MJPG)
    val strf = chunk("strf", le32(40) ++ le32(16) ++ le32(16) ++
      Array[Byte](1, 0) ++ Array[Byte](24, 0) ++
      "MJPG".getBytes("US-ASCII") ++ new Array[Byte](20))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi", jpegs.flatMap(j => chunk("00dc", j)).toArray)
    val payload = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(payload.length.toLong) ++ payload
  }

  /** First-frame convenience over the MJPEG track decoders (MP4, then
    * AVI — each returns fast on the other's magic) — the decode
    * dispatch's MJPEG hook. None when no frame decodes — callers fall
    * through to the histogram stub exactly as for any other codec. */
  private[graft] def decodeMjpegFirstFrame(bytes: Array[Byte]): Option[(Int, Int, Array[Double])] =
    decodeMjpegFrames(bytes, 1).headOption
      .orElse(decodeAviMjpegFrames(bytes, 1).headOption)
      .map { case (_, w, h, mean, std) => (w, h, Array(mean, std)) }

  /** Deterministic MJPEG-in-MP4 fixture for id: ftyp + mdat carrying
    * `nFrames` complete JPEG samples laid out contiguously + moov
    * whose single trak's stsd says 'jpeg', stsz lists every sample
    * size explicitly, stss marks every sample a keyframe (MJPEG is
    * all-intra), and stco points at the mdat payload. Each frame f is
    * a 16×16 grayscale image of four constant 8×8 quadrants
    * g_{q,f} = (id·(31+6q) + 11+5q + 29f) mod 256, encoded at
    * quality 1.0 (all-ones quant tables): a constant block is DC-only
    * under the DCT, so the round-trip is bit-exact and an external
    * oracle computes every decoded frame's mean/std in closed form
    * from (id, f) — the fixture discipline of syntheticBmp, extended
    * through a lossy codec by staying on its lossless fixed points. */
  /** One 16×16 grayscale JPEG of four constant 8×8 quadrants
    * g_{q,f} = (id·(31+6q) + 11+5q + 29f) mod 256, quality 1.0
    * (all-ones quant tables): constant blocks are DC-only under the
    * DCT, so the round-trip is bit-exact and an oracle recomputes
    * every decoded frame's mean/std in closed form from (id, f).
    * Shared by the MJPEG-in-MP4 and MJPEG-in-AVI fixtures — same
    * frames, two containers, one oracle formula. */
  private[graft] def quadrantJpeg(id: Long, f: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 16) {
        val q = (y / 8) * 2 + (x / 8)
        img.getRaster.setSample(x, y, 0,
          ((id * (31 + 6 * q) + 11 + 5 * q + 29L * f) % 256).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = wr.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(1.0f)
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); wr.dispose()
    bos.toByteArray
  }

  def syntheticMjpegMp4(id: Long, nFrames: Int = 1): Array[Byte] = {
    require(nFrames >= 1, s"nFrames must be >= 1, got $nFrames")
    def be32(v: Long) = Array[Byte](
      ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(8L + payload.length) ++ typ.getBytes("US-ASCII") ++ payload
    // one JPEG sample per frame: 16×16 gray, four constant 8×8 quadrants
    val jpegs = (0 until nFrames).map(f => quadrantJpeg(id, f))

    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ be32(0) ++ "mp41".getBytes("US-ASCII"))
    val mdat = box("mdat", jpegs.flatten.toArray)
    val mdatPayloadOff = ftyp.length + 8L
    val mvhd = box("mvhd",
      be32(0) ++ be32(0) ++ be32(0) ++
        be32(1000) ++ be32((id * 97 + 41) % 100000) ++
        be32(0x00010000L) ++
        Array[Byte](0x01, 0x00) ++ new Array[Byte](10) ++
        new Array[Byte](36) ++ new Array[Byte](24) ++
        be32(2))
    val stsd = box("stsd", be32(0) ++ be32(1) ++
      box("jpeg", new Array[Byte](8)))
    val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(nFrames.toLong) ++
      jpegs.flatMap(j => be32(j.length.toLong)).toArray)
    val stss = box("stss", be32(0) ++ be32(nFrames.toLong) ++
      (1 to nFrames).flatMap(f => be32(f.toLong)).toArray)
    val stco = box("stco", be32(0) ++ be32(1) ++ be32(mdatPayloadOff))
    val stbl = box("stbl", stsd ++ stsz ++ stss ++ stco)
    val trak = box("trak",
      box("tkhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(1)) ++
        box("mdia", box("minf", stbl)))
    ftyp ++ mdat ++ box("moov", mvhd ++ trak)
  }

  /** REAL video pixel decode for MPEG-1 INTRA tracks (round 12,
    * VERDICT r11 #7 — the predictive-codec fence narrowed again):
    * samples of an 'mp4v' track whose payload opens with the MPEG-1
    * sequence-header start code (00 00 01 B3) are decoded pure-JVM by
    * [[Mpeg1]] (headers, DC/AC VLCs, intra dequant, IDCT); raw
    * elementary-stream payloads decode as a single frame. Same
    * bounded walk and degrade discipline as [[decodeMjpegFrames]]:
    * at most `maxFrames` decodes, failures skip, empty for anything
    * that is not MPEG-1 intra. */
  private[graft] def decodeMpeg1Frames(bytes: Array[Byte],
      maxFrames: Int): Seq[(Int, Int, Int, Double, Double)] =
    decodeMpeg1FramesTyped(bytes, maxFrames)
      .map { case (f, _, w, h, m, sd) => (f, w, h, m, sd) }

  /** Like [[decodeMpeg1Frames]] but carrying the picture type
    * ('I'/'P') — the inter paths (round 12b) decode P-pictures for
    * real, so consumers can see which frames were keyframes. Each
    * payload (raw ES, or each MP4 sample — every sample is its own
    * elementary stream) may contain MULTIPLE pictures; frame indices
    * run across the whole payload in decode order. */
  private[graft] def decodeMpeg1FramesTyped(bytes: Array[Byte],
      maxFrames: Int): Seq[(Int, Char, Int, Int, Double, Double)] = {
    def lumaStats(luma: Array[Int]): (Double, Double) = {
      var s = 0.0; var sq = 0.0
      var i = 0
      while (i < luma.length) {
        val v = luma(i).toDouble; s += v; sq += v * v; i += 1
      }
      val n = math.max(1, luma.length)
      val mean = s / n
      (mean, math.sqrt(math.max(0.0, sq / n - mean * mean)))
    }
    def isEs(off: Long): Boolean =
      off >= 0 && off + 4 <= bytes.length &&
        bytes(off.toInt) == 0 && bytes(off.toInt + 1) == 0 &&
        bytes(off.toInt + 2) == 1 && (bytes(off.toInt + 3) & 0xFF) == 0xB3
    def esFrames(es: Array[Byte], limit: Int): (Seq[(Char, Int, Int, Double, Double)], Boolean) = {
      val (fs, clean) = Mpeg1.decodeFramesLumaClean(es, limit)
      (fs.map { case (w, h, l, t) =>
        val (m, sd) = lumaStats(l); (t, w, h, m, sd)
      }, clean)
    }
    if (isEs(0L))
      esFrames(bytes, maxFrames)._1.zipWithIndex.map { case ((t, w, h, m, sd), i) =>
        (i + 1, t, w, h, m, sd)
      }
    else trackSamples(bytes).toSeq.flatMap { tracks =>
      tracks.collectFirst {
        case (c, off, sizes) if c == "mp4v" && sizes.nonEmpty && isEs(off) =>
          (off, sizes)
      }.toSeq.flatMap { case (off, sizes) =>
        val bounded = sizes.take(maxFrames)
        val starts = bounded.scanLeft(off)(_ + _)
        val acc = scala.collection.mutable.ArrayBuffer
          .empty[(Int, Char, Int, Int, Double, Double)]
        // ADVICE r12: mirror the avc1 walk's stop-at-first-undecodable
        // discipline. Skipping bad samples and numbering by decoded
        // count compacted frame indices, so downstream consumers (e.g.
        // scene-cut deltas) saw non-adjacent frames as adjacent; a
        // clean stop makes the truncation visible instead. ADVICE r13:
        // a sample that decodes a nonempty PREFIX and then degrades
        // is the same gap — the decoder now reports clean/partial, and
        // a partial sample ends the walk too (its exact prefix frames
        // are kept; nothing after the gap is renumbered).
        var walking = true
        bounded.indices.foreach { i =>
          if (walking && acc.size < maxFrames) {
            val s = starts(i)
            val len = bounded(i)
            if (s >= 0 && len > 0 && s + len <= bytes.length) {
              val (fs, clean) = esFrames(java.util.Arrays.copyOfRange(
                bytes, s.toInt, (s + len).toInt), maxFrames - acc.size)
              if (!clean || fs.isEmpty) walking = false
              fs.foreach { case (t, w, h, m, sd) =>
                acc += ((acc.size + 1, t, w, h, m, sd))
              }
            } else walking = false
          }
        }
        acc.toSeq
      }
    }
  }

  /** Deterministic MPEG-1 MOTION fixture (raw elementary stream):
    * one 32×32 I-picture (16 flat DC blocks, g_{mb,b} =
    * (id·7 + mb·16 + b·4 + 50) mod 200 + 10), then P1 — every
    * macroblock zero-MV with a flat coded residual (level
    * L = id mod 5 + 1 at qscale 8 adds exactly 2L+1 per pixel) — then
    * P2 mixing real motion (MB1 ← 8 px left, MB2 ← 8 px up), a
    * zero-MV copy, and a second residual — then a B-picture
    * exercising every bidirectional path (forward ← P1, backward ←
    * P2, interpolated average, forward + residual). Every decoded
    * mean is a closed-form k/16 of id — the inter-path oracle. */
  def syntheticMpeg1MotionEs(id: Long): Array[Byte] = {
    def dc(mb: Int, b: Int): Int =
      (((id * 7 + mb * 16 + b * 4 + 50) % 200) + 10).toInt
    val l = (id % 5).toInt + 1
    import Mpeg1.{PMb, BMb, PPic, BPic}
    Mpeg1.encodeSequence(2, 2, dc, Seq(
      PPic(_ => PMb.MoveCoded(0, 0, _ => Seq((0, l)))),
      PPic({
        case 0 => PMb.Move(0, 0)
        case 1 => PMb.Move(-16, 0)
        case 2 => PMb.Move(0, -16)
        case _ => PMb.MoveCoded(0, 0, _ => Seq((0, l)))
      }),
      BPic({
        case 0 => BMb.Fwd(0, 0) // ← P1 (the OLDER anchor)
        case 1 => BMb.Bwd(0, 0) // ← P2
        case 2 => BMb.Bi(0, 0, 0, 0) // rounded (P1 + P2 + 1) >> 1
        case _ => BMb.FwdCoded(0, 0, _ => Seq((0, l))) // P1 + delta
      })))
  }

  /** First-frame convenience over [[decodeMpeg1Frames]] — the decode
    * dispatch's MPEG-1-intra hook, shaped like the MJPEG one. */
  private[graft] def decodeMpeg1FirstFrame(bytes: Array[Byte]): Option[(Int, Int, Array[Double])] =
    decodeMpeg1Frames(bytes, 1).headOption
      .map { case (_, w, h, mean, std) => (w, h, Array(mean, std)) }

  /** Deterministic MPEG-1-in-MP4 fixture: same container layout and
    * the SAME quadrant values as [[syntheticMjpegMp4]] —
    * g_{q,f} = (id·(31+6q) + 11+5q + 29f) mod 256 — but each sample is
    * an [[Mpeg1.encodeIFrame]] DC-only I-frame under an 'mp4v' stsd
    * entry. DC-only blocks are exact through dequant+IDCT (pixel =
    * DC/8, an integer), so one oracle formula covers both codecs. */
  def syntheticMpeg1Mp4(id: Long, nFrames: Int = 1): Array[Byte] = {
    require(nFrames >= 1, s"nFrames must be >= 1, got $nFrames")
    def be32(v: Long) = Array[Byte](
      ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(8L + payload.length) ++ typ.getBytes("US-ASCII") ++ payload
    val samples = (0 until nFrames).map { f =>
      Mpeg1.encodeIFrame(1, 1, (_, q) =>
        ((id * (31 + 6 * q) + 11 + 5 * q + 29L * f) % 256).toInt)
    }
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ be32(0) ++ "mp41".getBytes("US-ASCII"))
    val mdat = box("mdat", samples.flatten.toArray)
    val mdatPayloadOff = ftyp.length + 8L
    val mvhd = box("mvhd",
      be32(0) ++ be32(0) ++ be32(0) ++
        be32(1000) ++ be32((id * 97 + 41) % 100000) ++
        be32(0x00010000L) ++
        Array[Byte](0x01, 0x00) ++ new Array[Byte](10) ++
        new Array[Byte](36) ++ new Array[Byte](24) ++
        be32(2))
    val stsd = box("stsd", be32(0) ++ be32(1) ++
      box("mp4v", new Array[Byte](8)))
    val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(nFrames.toLong) ++
      samples.flatMap(j => be32(j.length.toLong)).toArray)
    val stss = box("stss", be32(0) ++ be32(nFrames.toLong) ++
      (1 to nFrames).flatMap(f => be32(f.toLong)).toArray)
    val stco = box("stco", be32(0) ++ be32(1) ++ be32(mdatPayloadOff))
    val stbl = box("stbl", stsd ++ stsz ++ stss ++ stco)
    val trak = box("trak",
      box("tkhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(1)) ++
        box("mdia", box("minf", stbl)))
    ftyp ++ mdat ++ box("moov", mvhd ++ trak)
  }

  /** avcC decoder configuration (ISO 14496-15 §5.3.3) of the FIRST
    * 'avc1' track: (SPS NAL units, PPS NAL units, NAL length-prefix
    * size). The avcC box lives inside the avc1 VisualSampleEntry
    * (whose fixed body is 78 bytes after the 8-byte box header);
    * None for anything malformed — degrade, never throw. */
  private[graft] def avcConfig(bytes: Array[Byte]): Option[(Seq[Array[Byte]], Seq[Array[Byte]], Int)] = {
    val bw = new BoxWalker(bytes)
    import bw.{u32, walk, descend}
    try {
      var found: Option[(Seq[Array[Byte]], Seq[Array[Byte]], Int)] = None
      walk(0, bytes.length) { (typ, off, end) =>
        if (typ == "moov" && found.isEmpty) {
          walk(off, end) { (t, o, e) =>
            if (t == "trak" && found.isEmpty) {
              descend(o, e, List("mdia", "minf", "stbl")) { (t4, o4, e4) =>
                if (t4 == "stsd" && found.isEmpty && e4 - o4 >= 16 &&
                    u32(o4 + 4) >= 1) {
                  val entryOff = o4 + 8
                  val entrySize = u32(entryOff).toInt
                  if (entrySize >= 94 && entryOff + entrySize <= e4 &&
                      new String(bytes, entryOff + 4, 4, "US-ASCII") == "avc1") {
                    walk(entryOff + 86, entryOff + entrySize) { (t5, o5, e5) =>
                      if (t5 == "avcC" && found.isEmpty && e5 - o5 >= 7)
                        found = parseAvcC(bytes, o5, e5)
                    }
                    ()
                  }
                }
              }
            }
          }
          ()
        }
      }
      found
    } catch { case _: Exception => None }
  }

  private def parseAvcC(bytes: Array[Byte], o5: Int,
      e5: Int): Option[(Seq[Array[Byte]], Seq[Array[Byte]], Int)] = {
    // AVCDecoderConfigurationRecord: version, profile, compat, level,
    // lengthSizeMinusOne (low 2 bits), numSPS (low 5 bits), then
    // length-prefixed SPS/PPS NAL units
    val lenSize = (bytes(o5 + 4) & 3) + 1
    val nSps = bytes(o5 + 5) & 0x1F
    val sps = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val pps = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var p = o5 + 6
    var i = 0
    while (i < nSps) {
      if (p + 2 > e5) return None
      val n = ((bytes(p) & 0xFF) << 8) | (bytes(p + 1) & 0xFF)
      if (p + 2 + n > e5) return None
      sps += java.util.Arrays.copyOfRange(bytes, p + 2, p + 2 + n)
      p += 2 + n
      i += 1
    }
    if (p + 1 > e5) return None
    val nPps = bytes(p) & 0xFF
    p += 1
    i = 0
    while (i < nPps) {
      if (p + 2 > e5) return None
      val n = ((bytes(p) & 0xFF) << 8) | (bytes(p + 1) & 0xFF)
      if (p + 2 + n > e5) return None
      pps += java.util.Arrays.copyOfRange(bytes, p + 2, p + 2 + n)
      p += 2 + n
      i += 1
    }
    if (sps.nonEmpty && pps.nonEmpty) Some((sps.toSeq, pps.toSeq, lenSize))
    else None
  }

  /** Split a length-prefixed (avcC-style) sample into NAL units. */
  private def splitLengthPrefixed(b: Array[Byte],
      lenSize: Int): Option[Seq[Array[Byte]]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var p = 0
    while (p < b.length) {
      if (p + lenSize > b.length) return None
      var n = 0L
      var i = 0
      while (i < lenSize) { n = (n << 8) | (b(p + i) & 0xFF); i += 1 }
      if (n <= 0 || p + lenSize + n > b.length) return None
      out += java.util.Arrays.copyOfRange(b, p + lenSize, (p + lenSize + n).toInt)
      p += (lenSize + n).toInt
    }
    if (out.isEmpty) None else Some(out.toSeq)
  }

  /** Bounded multi-frame H.264 walk, untyped shape (frame, w, h,
    * mean, std) — [[decodeAvcFramesTyped]] minus the picture-type
    * column (one walk, review r12: the two used to be divergent
    * copies, which is where the reference-chain bug lived). */
  private[graft] def decodeAvcFrames(bytes: Array[Byte],
      maxFrames: Int): Seq[(Int, Int, Int, Double, Double)] =
    decodeAvcFramesTyped(bytes, maxFrames)
      .map { case (f, _, w, h, m, sd) => (f, w, h, m, sd) }

    /** First-frame convenience over [[decodeAvcFrames]] — the decode
    * dispatch's avc1 hook, shaped like the MJPEG/MPEG-1 ones. */
  private[graft] def decodeAvcFirstFrame(bytes: Array[Byte]): Option[(Int, Int, Array[Double])] =
    decodeAvcFrames(bytes, 1).headOption
      .map { case (_, w, h, mean, std) => (w, h, Array(mean, std)) }

  /** Multi-frame typed H.264 walk (round 12b): I AND P frames, with
    * the picture type per frame. Raw Annex-B payloads stream through
    * [[H264.decodeFramesLuma]]; avc1 MP4 tracks concatenate every
    * sample's NALs behind the avcC parameter sets and decode as ONE
    * stream, so a P sample references the frame its predecessor
    * decoded — the cross-sample reference an all-keyframe walk never
    * needed. */
  private[graft] def decodeAvcFramesTyped(bytes: Array[Byte],
      maxFrames: Int): Seq[(Int, Char, Int, Int, Double, Double)] = {
    def lumaStats(luma: Array[Int]): (Double, Double) = {
      var s = 0.0; var sq = 0.0
      var i = 0
      while (i < luma.length) {
        val v = luma(i).toDouble; s += v; sq += v * v; i += 1
      }
      val n = math.max(1, luma.length)
      val mean = s / n
      (mean, math.sqrt(math.max(0.0, sq / n - mean * mean)))
    }
    def stat(fs: Seq[(Int, Int, Array[Int], Char)]) =
      fs.zipWithIndex.map { case ((w, h, l, t), i) =>
        val (m, sd) = lumaStats(l); (i + 1, t, w, h, m, sd)
      }
    def isAnnexB: Boolean = {
      var p = 0
      if (bytes.length >= 5 && bytes(0) == 0 && bytes(1) == 0) {
        if (bytes(2) == 1) p = 3
        else if (bytes.length >= 6 && bytes(2) == 0 && bytes(3) == 1) p = 4
      }
      p > 0 && p < bytes.length && Set(6, 7, 9)(bytes(p) & 0x1F)
    }
    if (isAnnexB) stat(H264.decodeFramesLuma(bytes, maxFrames))
    else {
      (for {
        tracks <- trackSamples(bytes)
        (off, sizes) <- tracks.collectFirst {
          case (c, o, ss) if c == "avc1" && ss.nonEmpty => (o, ss)
        }
        (sps, pps, lenSize) <- avcConfig(bytes)
      } yield {
        val bounded = sizes.take(maxFrames)
        val starts = bounded.scanLeft(off)(_ + _)
        // STOP at the first bad sample: with cross-sample references a
        // skip-and-continue would MC later P samples against the wrong
        // predecessor (review r12) — everything before the gap is
        // still decoded exactly
        val nals = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
        var ok = true
        var i = 0
        while (ok && i < bounded.length) {
          val s = starts(i)
          val len = bounded(i)
          if (s < 0 || len <= 0 || s + len > bytes.length) ok = false
          else splitLengthPrefixed(
            java.util.Arrays.copyOfRange(bytes, s.toInt, (s + len).toInt),
            lenSize) match {
            case Some(ns) => nals ++= ns
            case None => ok = false
          }
          i += 1
        }
        stat(H264.decodeFramesLumaNals(sps ++ pps ++ nals.toSeq, maxFrames))
      }).getOrElse(Seq.empty)
    }
  }

  /** Extract the HEVCDecoderConfigurationRecord NALs from an MP4
    * 'hev1'/'hvc1' track: (parameter-set NALs in array order, NAL
    * length-prefix size). hvcC lives in the VisualSampleEntry like
    * avcC; its fixed head is 22 bytes, then typed NAL arrays
    * (ISO 14496-15). None on anything malformed — degrade. */
  private[graft] def hevcConfig(bytes: Array[Byte]): Option[(Seq[Array[Byte]], Int)] = {
    val bw = new BoxWalker(bytes)
    import bw.{u32, walk, descend}
    try {
      var found: Option[(Seq[Array[Byte]], Int)] = None
      walk(0, bytes.length) { (typ, off, end) =>
        if (typ == "moov" && found.isEmpty) {
          walk(off, end) { (t, o, e) =>
            if (t == "trak" && found.isEmpty) {
              descend(o, e, List("mdia", "minf", "stbl")) { (t4, o4, e4) =>
                if (t4 == "stsd" && found.isEmpty && e4 - o4 >= 16 &&
                    u32(o4 + 4) >= 1) {
                  val entryOff = o4 + 8
                  val entrySize = u32(entryOff).toInt
                  val cc = if (entryOff + 8 <= e4)
                    new String(bytes, entryOff + 4, 4, "US-ASCII") else ""
                  if (entrySize >= 94 && entryOff + entrySize <= e4 &&
                      (cc == "hev1" || cc == "hvc1")) {
                    walk(entryOff + 86, entryOff + entrySize) { (t5, o5, e5) =>
                      if (t5 == "hvcC" && found.isEmpty && e5 - o5 >= 23)
                        found = parseHvcC(bytes, o5, e5)
                    }
                    ()
                  }
                }
              }
            }
          }
          ()
        }
      }
      found
    } catch { case _: Exception => None }
  }

  private def parseHvcC(bytes: Array[Byte], o5: Int,
      e5: Int): Option[(Seq[Array[Byte]], Int)] = {
    val lenSize = (bytes(o5 + 21) & 3) + 1
    val nArrays = bytes(o5 + 22) & 0xFF
    val nals = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var p = o5 + 23
    var a = 0
    while (a < nArrays) {
      if (p + 3 > e5) return None
      val count = ((bytes(p + 1) & 0xFF) << 8) | (bytes(p + 2) & 0xFF)
      p += 3
      var i = 0
      while (i < count) {
        if (p + 2 > e5) return None
        val n = ((bytes(p) & 0xFF) << 8) | (bytes(p + 1) & 0xFF)
        if (p + 2 + n > e5) return None
        nals += java.util.Arrays.copyOfRange(bytes, p + 2, p + 2 + n)
        p += 2 + n
        i += 1
      }
      a += 1
    }
    if (nals.nonEmpty) Some((nals.toSeq, lenSize)) else None
  }

  /** Bounded multi-frame HEVC intra walk (round 14): raw Annex-B
    * streams AND MP4 'hev1'/'hvc1' tracks (hvcC parameter sets +
    * length-prefixed samples), shaped like [[decodeAvcFrames]]. The
    * stop-at-first-undecodable discipline applies; each IDR picture
    * is independent (no inter in the starter subset, so there is no
    * cross-sample reference hazard to guard). */
  private[graft] def decodeHevcFrames(bytes: Array[Byte],
      maxFrames: Int): Seq[(Int, Int, Int, Double, Double)] = {
    def stat(fs: Seq[(Int, Int, Array[Int])]) =
      fs.zipWithIndex.map { case ((w, h, l), i) =>
        var s = 0.0; var sq = 0.0
        l.foreach { v => s += v; sq += v.toDouble * v }
        val n = math.max(1, l.length)
        val m = s / n
        (i + 1, w, h, m, math.sqrt(math.max(0.0, sq / n - m * m)))
      }
    def isAnnexB: Boolean = {
      var p = 0
      if (bytes.length >= 6 && bytes(0) == 0 && bytes(1) == 0) {
        if (bytes(2) == 1) p = 3
        else if (bytes(2) == 0 && bytes(3) == 1) p = 4
      }
      p > 0 && p + 1 < bytes.length && {
        val t = (bytes(p) >> 1) & 0x3F
        t == 32 || t == 33 || t == 34 || t == 35 || t == 39
      }
    }
    if (isAnnexB) stat(Hevc.decodeFramesLuma(bytes, maxFrames))
    else {
      (for {
        tracks <- trackSamples(bytes)
        (off, sizes) <- tracks.collectFirst {
          case (c, o, ss) if (c == "hev1" || c == "hvc1") && ss.nonEmpty =>
            (o, ss)
        }
        (psNals, lenSize) <- hevcConfig(bytes)
      } yield {
        val bounded = sizes.take(maxFrames)
        val starts = bounded.scanLeft(off)(_ + _)
        val nals = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
        var ok = true
        var i = 0
        while (ok && i < bounded.length) {
          val s = starts(i)
          val len = bounded(i)
          if (s < 0 || len <= 0 || s + len > bytes.length) ok = false
          else splitLengthPrefixed(
            java.util.Arrays.copyOfRange(bytes, s.toInt, (s + len).toInt),
            lenSize) match {
            case Some(ns) => nals ++= ns
            case None => ok = false
          }
          i += 1
        }
        stat(Hevc.decodeFramesLumaNals(psNals ++ nals.toSeq, maxFrames))
      }).getOrElse(Seq.empty)
    }
  }

  /** First-frame convenience over [[decodeHevcFrames]] — the decode
    * dispatch's hev1 hook (round 14). */
  private[graft] def decodeHevcFirstFrame(bytes: Array[Byte]): Option[(Int, Int, Array[Double])] =
    decodeHevcFrames(bytes, 1).headOption
      .map { case (_, w, h, mean, std) => (w, h, Array(mean, std)) }

  /** YUV stats decode (round 14, chroma reconstruction): per frame
    * (frame, type, w, h, mean_y, mean_u, std_u, mean_v, std_v) over
    * an Annex-B stream — the curation tier's color-statistics hook
    * (scene cuts and phash stay luma-based; this surfaces the chroma
    * planes the decoder now reconstructs for real). */
  private[graft] def decodeAvcFramesYuvStats(bytes: Array[Byte],
      maxFrames: Int): Seq[(Int, Char, Int, Int, Double, Double, Double, Double, Double)] = {
    def stats(p: Array[Int]): (Double, Double) = {
      var s = 0.0; var sq = 0.0
      var i = 0
      while (i < p.length) { val v = p(i).toDouble; s += v; sq += v * v; i += 1 }
      val n = math.max(1, p.length)
      val m = s / n
      (m, math.sqrt(math.max(0.0, sq / n - m * m)))
    }
    H264.decodeFramesYuv(bytes, maxFrames).zipWithIndex.map {
      case ((w, h, y, cb, cr, t), i) =>
        val (my, _) = stats(y)
        val (mu, su) = stats(cb)
        val (mv0, sv) = stats(cr)
        (i + 1, t, w, h, my, mu, su, mv0, sv)
    }
  }

  /** Deterministic H.264 MOTION fixture (raw Annex-B): one I frame of
    * PCM quadrants (exact pixels), then P1 — MB0 a zero-MV copy, MB1
    * an Intra_16x16 refresh whose DC predicts from MB0's
    * reconstructed right edge — then P2 with real ±8 px motion whose
    * out-of-plane fetches exercise H.264's edge CLAMP (unlike
    * MPEG-1, vectors may point outside the picture). qp 28 makes the
    * intra residual exact (pixel = pred + z), so every frame mean is
    * closed-form in id. */
  def syntheticAvcMotionEs(id: Long): Array[Byte] = {
    import H264.{Pcm, I16Dc, PMove, PIntra}
    def g(mb: Int, q: Int): Int =
      (((id * 11 + mb * 16 + q * 4 + 60) % 180) + 20).toInt
    val z = (id % 15).toInt - 7
    H264.encodeIPStream(2, 1,
      mb => Pcm((x, y) => g(mb, (y / 8) * 2 + (x / 8))),
      Seq(
        {
          case 0 => PMove(0, 0)
          case _ => PIntra(I16Dc(z))
        },
        {
          case 0 => PMove(-32, 0) // 8 px left: clamps at column 0
          case _ => PMove(32, 0) // 8 px right: clamps at the last column
        }))
  }

  /** Deterministic H.264-in-MP4 fixture: the same container layout
    * and the SAME quadrant values as [[syntheticMjpegMp4]] /
    * [[syntheticMpeg1Mp4]] — g_{q,f} = (id·(31+6q) + 11+5q + 29f)
    * mod 256 — but each sample is one IDR slice of a single-MB 16x16
    * I_PCM frame (raw pixels: exact by construction), under a REAL
    * 'avc1' sample entry with an avcC record (SPS/PPS + 4-byte NAL
    * length prefixes), so the decode exercises the genuine
    * avcC→length-prefixed-NAL path a real avc1 file takes. One
    * oracle formula covers all three codecs. */
  def syntheticAvcMp4(id: Long, nFrames: Int = 1): Array[Byte] = {
    require(nFrames >= 1, s"nFrames must be >= 1, got $nFrames")
    def be32(v: Long) = Array[Byte](
      ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def be16(v: Int) = Array[Byte](((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(8L + payload.length) ++ typ.getBytes("US-ASCII") ++ payload
    val sps = H264.spsNal(1, 1)
    val pps = H264.ppsNal(28)
    val samples = (0 until nFrames).map { f =>
      val idr = H264.idrNal(1, 1, _ => H264.Pcm { (x, y) =>
        val q = (y / 8) * 2 + (x / 8)
        ((id * (31 + 6 * q) + 11 + 5 * q + 29L * f) % 256).toInt
      }, qp = 28)
      be32(idr.length.toLong) ++ idr
    }
    val avcC = box("avcC",
      Array[Byte](1, 66, 0, 10, (0xFC | 3).toByte, (0xE0 | 1).toByte) ++
        be16(sps.length) ++ sps ++ Array[Byte](1) ++ be16(pps.length) ++ pps)
    // VisualSampleEntry: 6 reserved + 2 data_ref_idx, 16 pre_defined/
    // reserved, width/height, resolutions, reserved, frame_count,
    // compressorname(32), depth, pre_defined(-1) = 78 bytes
    val visual =
      new Array[Byte](6) ++ be16(1) ++
        new Array[Byte](16) ++
        be16(16) ++ be16(16) ++
        be32(0x00480000L) ++ be32(0x00480000L) ++ be32(0) ++
        be16(1) ++ new Array[Byte](32) ++ be16(24) ++ be16(0xFFFF)
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ be32(0) ++ "mp41".getBytes("US-ASCII"))
    val mdat = box("mdat", samples.flatten.toArray)
    val mdatPayloadOff = ftyp.length + 8L
    val mvhd = box("mvhd",
      be32(0) ++ be32(0) ++ be32(0) ++
        be32(1000) ++ be32((id * 97 + 41) % 100000) ++
        be32(0x00010000L) ++
        Array[Byte](0x01, 0x00) ++ new Array[Byte](10) ++
        new Array[Byte](36) ++ new Array[Byte](24) ++
        be32(2))
    val stsd = box("stsd", be32(0) ++ be32(1) ++ box("avc1", visual ++ avcC))
    val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(nFrames.toLong) ++
      samples.flatMap(j => be32(j.length.toLong)).toArray)
    val stss = box("stss", be32(0) ++ be32(nFrames.toLong) ++
      (1 to nFrames).flatMap(f => be32(f.toLong)).toArray)
    val stco = box("stco", be32(0) ++ be32(1) ++ be32(mdatPayloadOff))
    val stbl = box("stbl", stsd ++ stsz ++ stss ++ stco)
    val trak = box("trak",
      box("tkhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(1)) ++
        box("mdia", box("minf", stbl)))
    ftyp ++ mdat ++ box("moov", mvhd ++ trak)
  }

  /** Deterministic HEVC-in-MP4 fixture (round 14): same container
    * layout and the SAME quadrant values as [[syntheticAvcMp4]] —
    * g_{q,f} = (id*(31+6q) + 11+5q + 29f) mod 256 — but each sample
    * is one IDR slice whose single CTU quad-splits into four I_PCM
    * 8x8 CUs (exact pixels), under a REAL 'hev1' sample entry with an
    * hvcC record (VPS-less parameter arrays + 4-byte NAL length
    * prefixes), so the decode exercises the genuine
    * hvcC -> length-prefixed-NAL path a real hev1 file takes. */
  def syntheticHevcMp4(id: Long, nFrames: Int = 1): Array[Byte] = {
    require(nFrames >= 1, s"nFrames must be >= 1, got $nFrames")
    def be32(v: Long) = Array[Byte](
      ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def be16(v: Int) = Array[Byte](((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(8L + payload.length) ++ typ.getBytes("US-ASCII") ++ payload
    val sps = Hevc.spsNal(16, 16)
    val pps = Hevc.ppsNal(28)
    val samples = (0 until nFrames).map { f =>
      val idr = Hevc.idrNal(1, 1, _ => Hevc.Quad((0 until 4).map { q =>
        Hevc.HPcm((_, _) =>
          ((id * (31 + 6 * q) + 11 + 5 * q + 29L * f) % 256).toInt)
      }), qp = 28)
      be32(idr.length.toLong) ++ idr
    }
    val hvcC = box("hvcC",
      Array[Byte](1) ++ new Array[Byte](12) ++ // profile block
        Array[Byte](0xF0.toByte, 0, 0xFC.toByte, 0xFD.toByte, 0xF8.toByte,
          0xF8.toByte) ++ be16(0) ++ // reserved/chroma/depth/fps fields
        Array[Byte](3) ++ // flags | lengthSizeMinusOne = 3
        Array[Byte](2) ++ // numOfArrays: SPS + PPS
        Array[Byte](33) ++ be16(1) ++ be16(sps.length) ++ sps ++
        Array[Byte](34) ++ be16(1) ++ be16(pps.length) ++ pps)
    val visual =
      new Array[Byte](6) ++ be16(1) ++
        new Array[Byte](16) ++
        be16(16) ++ be16(16) ++
        be32(0x00480000L) ++ be32(0x00480000L) ++ be32(0) ++
        be16(1) ++ new Array[Byte](32) ++ be16(24) ++ be16(0xFFFF)
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ be32(0) ++ "mp41".getBytes("US-ASCII"))
    val mdat = box("mdat", samples.flatten.toArray)
    val mdatPayloadOff = ftyp.length + 8L
    val mvhd = box("mvhd",
      be32(0) ++ be32(0) ++ be32(0) ++
        be32(1000) ++ be32((id * 97 + 41) % 100000) ++
        be32(0x00010000L) ++
        Array[Byte](0x01, 0x00) ++ new Array[Byte](10) ++
        new Array[Byte](36) ++ new Array[Byte](24) ++
        be32(2))
    val stsd = box("stsd", be32(0) ++ be32(1) ++ box("hev1", visual ++ hvcC))
    val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(nFrames.toLong) ++
      samples.flatMap(j => be32(j.length.toLong)).toArray)
    val stss = box("stss", be32(0) ++ be32(nFrames.toLong) ++
      (1 to nFrames).flatMap(f => be32(f.toLong)).toArray)
    val stco = box("stco", be32(0) ++ be32(1) ++ be32(mdatPayloadOff))
    val stbl = box("stbl", stsd ++ stsz ++ stss ++ stco)
    val trak = box("trak",
      box("tkhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(1)) ++
        box("mdia", box("minf", stbl)))
    ftyp ++ mdat ++ box("moov", mvhd ++ trak)
  }

  /** Deterministic minimal-but-valid MP4 for id: ftyp(isom) +
    * moov(mvhd v0 + trak×k), each trak carrying a full
    * mdia/minf/stbl with an stsd sample entry and an stss sync-sample
    * table. All fields are pure integer functions of id, so an
    * external oracle recomputes the parsed metadata without seeing
    * the bytes: duration = (id·97 + 41) mod 100000 ticks at timescale
    * 1000; k = 1 + id mod 3 tracks; track i's codec cycles
    * avc1/hev1/mp4v by (id+i) mod 3; track i's stss holds
    * (id·13 + 7i) mod 20 + 1 keyframes starting at sample
    * (id mod 5) + 1 + i, step 2. */
  def syntheticMp4(id: Long): Array[Byte] = {
    def be32(v: Long) = Array[Byte](
      ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(8L + payload.length) ++ typ.getBytes("US-ASCII") ++ payload
    val nTracks = 1 + (id % 3).toInt
    val duration = (id * 97 + 41) % 100000
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ be32(0) ++ "mp41".getBytes("US-ASCII"))
    val mvhd = box("mvhd",
      be32(0) ++ // version 0 + flags
        be32(0) ++ be32(0) ++ // creation, modification
        be32(1000) ++ be32(duration) ++
        be32(0x00010000L) ++ // rate 1.0
        Array[Byte](0x01, 0x00) ++ new Array[Byte](10) ++ // volume + reserved
        new Array[Byte](36) ++ new Array[Byte](24) ++ // matrix + predefined
        be32(nTracks + 1L)) // next_track_ID
    val codecNames = Seq("avc1", "hev1", "mp4v")
    val traks = (0 until nTracks).flatMap { i =>
      val codec = codecNames(((id + i) % 3).toInt)
      // minimal sample entry: 6 reserved bytes + 2-byte data_ref_index
      val stsd = box("stsd", be32(0) ++ be32(1) ++
        box(codec, new Array[Byte](8)))
      val kf = ((id * 13 + 7 * i) % 20 + 1).toInt
      val first = (id % 5) + 1 + i
      val stss = box("stss", be32(0) ++ be32(kf.toLong) ++
        (0 until kf).flatMap(j => be32(first + 2L * j)).toArray)
      // per-sample size table (sample_size=0 → explicit entries):
      // closed-form sizes so the bitrate profile is oracle-checkable
      val ns = ((id * 11 + 5 * i) % 30 + 2).toInt
      val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(ns.toLong) ++
        (0 until ns).flatMap(j =>
          be32((id * 7 + i * 3 + j.toLong * j) % 900 + 100)).toArray)
      val stbl = box("stbl", stsd ++ stss ++ stsz)
      box("trak",
        box("tkhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(i + 1L)) ++
          box("mdia", box("minf", stbl)))
    }.toArray
    ftyp ++ box("moov", mvhd ++ traks)
  }

  /** Fallback for payloads that are NOT decodable images: byte
    * histogram moments standing in for real feature extraction.
    * STUB — and the fence keeps narrowing: [[parseMp4Metadata]] reads
    * real video CONTAINER metadata codec-free,
    * [[decodeMjpegFirstFrame]] decodes real PIXELS for Motion-JPEG
    * tracks, and (round 12) [[decodeMpeg1FirstFrame]] +
    * [[decodeAvcFirstFrame]] decode real pixels for MPEG-1 INTRA
    * frames and H.264/avc1 intra frames (I_PCM + Intra_16x16 CAVLC
    * subset) via the pure-JVM [[Mpeg1]]/[[H264]] decoders. What
    * remains stubbed is inter-frame (P/B) decode, H.264 features
    * beyond that intra subset (CABAC, I_NxN, deblocking), and hev1 —
    * which genuinely need ffmpeg; replace this body with that binding
    * in production, nothing around it changes. */
  private[ext] def byteHistogram(bytes: Array[Byte]): (Int, Int, Array[Double]) = {
    // >>> STUB: byte-histogram stand-in (video FRAME decode only) <<<
    val hist = new Array[Double](16)
    bytes.foreach(b => hist((b & 0xFF) / 16) += 1.0)
    val n = math.max(1, bytes.length)
    val feat = hist.map(_ / n)
    val side = math.max(1, math.sqrt(n.toDouble).toInt)
    (side, side, feat)
    // >>> END STUB <<<
  }

  /** Decode dispatch: real image decode first, then real MJPEG-track
    * pixel decode for MP4 AND AVI payloads, then real MPEG-1, H.264
    * and (round 14) HEVC-intra pixel decode, byte-histogram fallback
    * for everything else (non-media payloads and out-of-subset
    * video — H.264 CABAC P/B and direct modes, HEVC beyond the
    * planar/DC/PCM intra starter, vp09/av01). MPEG-1 decodes fully
    * (I/P/B/D); H.264 decodes I/P/B with CABAC I, reordering, MMCO
    * op 1 and full chroma. The boolean is the
    * DEGRADE flag: true for real pixels, false for the fallback — the
    * permanent-fence contract consumers filter on. */
  private[graft] def decode(bytes: Array[Byte]): (Int, Int, Array[Double], Boolean) =
    decodeImage(bytes)
      .orElse(decodeMjpegFirstFrame(bytes))
      .orElse(decodeMpeg1FirstFrame(bytes))
      .orElse(decodeAvcFirstFrame(bytes))
      .orElse(decodeHevcFirstFrame(bytes)) // round 14: intra starter
      .map { case (w, h, f) => (w, h, f, true) }
      .getOrElse {
        val (w, h, f) = byteHistogram(bytes)
        (w, h, f, false)
      }

  /** Deterministic w×h RGB test pattern for id: each channel is a pure
    * function of (id, x, y), so an external oracle can recompute the
    * decoded statistics without ever seeing the bytes. Encoded as BMP
    * (24-bit, lossless) via the same javax.imageio the decode uses. */
  def syntheticBmp(id: Long, w: Int = 8, h: Int = 8,
      noisy: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r0 = ((id * 31 + x * 7 + y * 13) % 256).toInt
        // noisy: a re-encoded near-duplicate — +1 on the red channel of
        // every fifth diagonal, the closed-form analogue of small
        // re-compression noise (gradients mostly preserved, so the
        // dHash lands within a small Hamming distance of the original)
        val r = if (noisy && (x + y) % 5 == 0) (r0 + 1) % 256 else r0
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

  /** Integer BT.601 grayscale of a decoded image: gray = (299·R +
    * 587·G + 114·B) / 1000 in INTEGER arithmetic — deterministic and
    * reproducible by a closed-form external oracle, unlike float
    * luminance or platform-filtered `Graphics2D` scaling. */
  private[graft] def grayPixels(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val g = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          g(y * w + x) = (((rgb >> 16) & 0xFF) * 299 +
            ((rgb >> 8) & 0xFF) * 587 + (rgb & 0xFF) * 114) / 1000
          x += 1
        }
        y += 1
      }
      Some((w, h, g))
    }
  }

  /** 64-bit difference hash (dHash) — the standard perceptual
    * image-near-dup fingerprint: grayscale → 9×8 grid of exact box
    * sums → bit (r,c) = sum(r,c) > sum(r,c+1) (horizontal gradient
    * sign). Robust to re-encoding and small noise; Hamming ≤ 3 on 64
    * bits ⇒ near-duplicate image, paired at corpus scale by
    * [[Dedup.hamming64Pairs]]'s block banding. Box sums (not averages)
    * keep the arithmetic exact; the image must tile into the 9×8 grid
    * (w % 9 == 0, h % 8 == 0) — a real pipeline resizes first, the
    * synthetic fixture uses 18×16. Returns None for undecodable or
    * non-tiling inputs (bad record ≠ dead job). */
  def dHash64(bytes: Array[Byte]): Option[Long] =
    grayPixels(bytes).flatMap { case (w, h, g) =>
      if (w % 9 != 0 || h % 8 != 0 || w < 9 || h < 8) None
      else Some(boxGradHash(w, h, g))
    }

  /** 9×8 box-sum horizontal-gradient hash over one integer plane —
    * the shared tail of [[dHash64]] and [[dHashYuv]]. */
  private def boxGradHash(w: Int, h: Int, plane: Array[Int]): Long = {
    val bw = w / 9
    val bh = h / 8
    val sums = Array.ofDim[Long](8, 9)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        sums(y / bh)(x / bw) += plane(y * w + x)
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (sums(r)(c) > sums(r)(c + 1)) hash |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    hash
  }

  /** Chroma-aware perceptual hash (round 16, VERDICT r15 #6): three
    * 64-bit dHashes — one per BT.601 YUV channel — from ONE decode.
    * The luma hash matches [[dHash64]] bit-for-bit (same integer
    * formula), so a color-swap or chroma-only re-grade that the luma
    * hash cannot see flips the U/V hashes instead. All three channels
    * use INTEGER arithmetic with the chroma matrix offset (+128000)
    * folded into the numerator so it stays non-negative — integer
    * division then agrees between the JVM (truncate toward zero) and
    * a SQL oracle's floor division, keeping the hashes closed-form
    * recomputable. Scale note: near-dup pairing banded-joins on the
    * LUMA hash only; the chroma hashes refine those candidates, so
    * the chroma channels add no shuffle of their own. */
  def dHashYuv(bytes: Array[Byte]): Option[(Long, Long, Long)] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      if (w % 9 != 0 || h % 8 != 0 || w < 9 || h < 8) None
      else {
        val py = new Array[Int](w * h)
        val pu = new Array[Int](w * h)
        val pv = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xFF
            val g = (rgb >> 8) & 0xFF
            val b = rgb & 0xFF
            val i = y * w + x
            py(i) = (r * 299 + g * 587 + b * 114) / 1000
            pu(i) = (500 * b - 169 * r - 331 * g + 128000) / 1000
            pv(i) = (500 * r - 419 * g - 81 * b + 128000) / 1000
            x += 1
          }
          y += 1
        }
        Some((boxGradHash(w, h, py), boxGradHash(w, h, pu),
          boxGradHash(w, h, pv)))
      }
    }
  }

  /** Partition-batched feature extraction over binary payloads. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[Feature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // codec/session init would happen once per partition here
      it.map { row =>
        val (w, h, feat, dec) = decode(row.content)
        Feature(row.id, w, h, feat, dec)
      }
    }
  }

  /** "Frame sampling": every `stride`-th fixed-size chunk of the
    * payload (real chunking plumbing; each chunk goes through the
    * shared [[decode]] dispatch — real for images and MJPEG samples,
    * histogram fallback otherwise). Output one row per sampled frame. */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int, stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { row =>
      row.content.grouped(frameBytes).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (chunk, idx) =>
          val (w, h, feat, _) = decode(chunk)
          (row.id, idx.toLong, chunk.length.toLong, w, h, feat)
        }
    }.toDF("id", "frame_idx", "frame_bytes", "width", "height", "feature")
  }
}
