package graft.ext

/** H.265/HEVC (Rec. ITU-T H.265, public spec) INTRA-ONLY starter
  * tier — round 14, VERDICT r13 #6: turns the one fully-fenced major
  * codec ('hev1') into the MPEG-1-round-11 state: a subset decoded
  * for real under degrade-to-None, everything else honest.
  *
  * Decoded for real (bit-exact per the spec):
  *  - NAL syntax (two-byte headers), emulation prevention, SPS/PPS
  *    parse for the supported flag set, single-slice IDR pictures.
  *  - CABAC slice data through the SAME arithmetic engine as H.264
  *    ([[H264Cabac]] — HEVC 9.3.4.3 inherited the engine and its
  *    Tables 9-44/9-45 verbatim; only the context INIT VALUES are
  *    HEVC's own, transcribed here with the same offline-provenance
  *    caveat as H264Cabac's): coding-quadtree recursion with
  *    neighbor-depth split contexts, part_mode, the pcm_flag
  *    terminate escape with engine re-init, prev/mpm/rem intra mode
  *    coding with the full 8.4.2 candidate-list derivation,
  *    intra_chroma_pred_mode (parse), cbf flags, end_of_slice.
  *  - I_PCM coding units (raw luma samples — always exact).
  *  - Intra PLANAR (8.4.4.2.4) and DC (8.4.4.2.5, with the luma
  *    boundary smoothing) prediction, including the 8.4.4.2.2
  *    reference-sample substitution and the [1 2 1] smoothing filter
  *    planar uses at nTbS >= 8.
  *
  * Honesty bounds, all degrade-to-None: residual-carrying TUs (any
  * nonzero cbf), angular intra modes, NxN partitions, inferred or
  * coded transform splits, P/B slices, SAO, tiles/WPP, dependent or
  * multiple slice segments, scaling lists, >8-bit, non-4:2:0,
  * long-term/RPS machinery. Chroma syntax is parsed for bitstream
  * sync; only luma is reconstructed (the avc1 round-12 posture). */
object Hevc {

  // HEVC context init values (Tables 9-5..9-40 subset, initType 0 =
  // I slices), initValue -> (m, n): m = (iv >> 4)*5 - 45,
  // n = ((iv & 15) << 3) - 16 (9.3.2.2). Same offline-transcription
  // caveat as H264Cabac: the engine + own-encoder round-trip is what
  // an offline build can prove.
  private val CtxSplit0 = 0 // split_cu_flag: 139, 141, 157
  private val CtxPart = 3 // part_mode: 184
  private val CtxPrevIntra = 4 // prev_intra_luma_pred_flag: 184
  private val CtxChromaMode = 5 // intra_chroma_pred_mode: 63
  private val CtxSplitTrafo = 6 // split_transform_flag: 153, 138, 138
  private val CtxCbfLuma = 9 // cbf_luma: 111, 141
  private val CtxCbfC = 11 // cbf_cb / cbf_cr: 94, 138, 182, 154
  private val InitVals: Array[Int] = Array(
    139, 141, 157, 184, 184, 63, 153, 138, 138, 111, 141,
    94, 138, 182, 154)
  private val InitPairs: Array[Int] = InitVals.flatMap { iv =>
    Array((iv >> 4) * 5 - 45, ((iv & 15) << 3) - 16)
  }

  private object ParseFail extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private final class BitReader(val bytes: Array[Byte]) {
    var pos: Int = 0
    val limit: Int = bytes.length * 8
    def bit(): Int = {
      if (pos >= limit) throw ParseFail
      val b = (bytes(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      b
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def ue(): Int = {
      var zeros = 0
      while (bit() == 0) { zeros += 1; if (zeros > 31) throw ParseFail }
      if (zeros == 0) 0 else (1 << zeros) - 1 + bits(zeros)
    }
    def se(): Int = {
      val k = ue()
      if ((k & 1) == 1) (k + 1) / 2 else -(k / 2)
    }
  }

  /** Strip emulation-prevention bytes (7.4.2: 00 00 03 -> 00 00). */
  private def unescape(nal: Array[Byte], from: Int): Array[Byte] = {
    val out = new Array[Byte](nal.length - from)
    var i = from; var o = 0; var zeros = 0
    while (i < nal.length) {
      val b = nal(i)
      if (zeros >= 2 && b == 3 && i + 1 < nal.length && (nal(i + 1) & 0xFC) == 0) {
        zeros = 0
      } else {
        out(o) = b; o += 1
        zeros = if (b == 0) zeros + 1 else 0
      }
      i += 1
    }
    java.util.Arrays.copyOf(out, o)
  }

  private def splitAnnexB(es: Array[Byte]): Seq[Array[Byte]] = {
    val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i + 3 <= es.length) {
      if (es(i) == 0 && es(i + 1) == 0 && es(i + 2) == 1) { starts += i + 3; i += 3 }
      else i += 1
    }
    starts.toSeq.zipWithIndex.map { case (s, idx) =>
      var e = if (idx + 1 < starts.length) starts(idx + 1) - 3 else es.length
      while (e > s && es(e - 1) == 0 && idx + 1 < starts.length) e -= 1
      java.util.Arrays.copyOfRange(es, s, e)
    }.filter(_.length >= 2)
  }

  private final case class HSps(
      width: Int, height: Int, ctbLog2: Int, minCbLog2: Int,
      maxTbLog2: Int, minTbLog2: Int, pcmEnabled: Boolean,
      pcmMinLog2: Int, pcmMaxLog2: Int,
      cropL: Int = 0, cropR: Int = 0, cropT: Int = 0, cropB: Int = 0) {
    /** Conformance-window output size (7.4.3.2.1). */
    def outW: Int = width - cropL - cropR
    def outH: Int = height - cropT - cropB
  }

  private final case class HPps(id: Int, spsId: Int, initQp: Int)

  private def parseSps(rbsp: Array[Byte]): HSps = {
    val br = new BitReader(rbsp)
    br.bits(4) // sps_video_parameter_set_id
    if (br.bits(3) != 0) throw ParseFail // sps_max_sub_layers_minus1
    br.bit() // temporal_id_nesting
    // profile_tier_level(1, 0): 88 bits general + level_idc(8)
    br.bits(32); br.bits(32); br.bits(24); br.bits(8)
    br.ue() // sps_seq_parameter_set_id (single-SPS streams)
    if (br.ue() != 1) throw ParseFail // chroma_format_idc: 4:2:0 only
    val width = br.ue()
    val height = br.ue()
    if (width <= 0 || height <= 0 ||
      width.toLong * height > 8192L * 4320) throw ParseFail
    // ADVICE r14: APPLY the conformance window (offsets are in
    // chroma units; 4:2:0 -> x2 in luma) instead of emitting the
    // full coded picture with its padding samples
    var cropL = 0; var cropR = 0; var cropT = 0; var cropB = 0
    if (br.bit() == 1) {
      cropL = br.ue() * 2; cropR = br.ue() * 2
      cropT = br.ue() * 2; cropB = br.ue() * 2
      if (cropL + cropR >= width || cropT + cropB >= height) throw ParseFail
    }
    if (br.ue() != 0) throw ParseFail // bit_depth_luma_minus8
    if (br.ue() != 0) throw ParseFail // bit_depth_chroma_minus8
    val log2MaxPoc = br.ue() + 4
    if (log2MaxPoc > 16) throw ParseFail
    val ordering = br.bit()
    val n = if (ordering == 1) 1 else 1 // sub_layer 0 only either way
    var i = 0
    while (i < n) { br.ue(); br.ue(); br.ue(); i += 1 }
    val minCbLog2 = br.ue() + 3
    val ctbLog2 = minCbLog2 + br.ue()
    val minTbLog2 = br.ue() + 2
    val maxTbLog2 = minTbLog2 + br.ue()
    if (ctbLog2 > 6 || minCbLog2 < 3 || maxTbLog2 > 5 ||
      maxTbLog2 > ctbLog2) throw ParseFail
    br.ue() // max_transform_hierarchy_depth_inter
    // ADVICE r14: with depth_intra >= 1 a 2Nx2N CU sized inside
    // (minTbLog2, maxTbLog2] DOES carry split_transform_flag at
    // trafoDepth 0 — skipping it would desync, so refuse loudly here
    // until decodeCqt reads the transform tree.
    if (br.ue() != 0) throw ParseFail // max_transform_hierarchy_depth_intra
    if (br.bit() == 1) throw ParseFail // scaling_list_enabled
    br.bit() // amp_enabled (irrelevant: intra only)
    if (br.bit() == 1) throw ParseFail // sample_adaptive_offset
    var pcmEnabled = false
    var pcmMin = 3
    var pcmMax = 3
    if (br.bit() == 1) { // pcm_enabled
      pcmEnabled = true
      if (br.bits(4) != 7) throw ParseFail // pcm luma depth-1: 8-bit
      if (br.bits(4) != 7) throw ParseFail
      pcmMin = br.ue() + 3
      pcmMax = pcmMin + br.ue()
      br.bit() // pcm_loop_filter_disabled
      if (pcmMax > ctbLog2) throw ParseFail
    }
    if (br.ue() != 0) throw ParseFail // num_short_term_ref_pic_sets
    if (br.bit() == 1) throw ParseFail // long_term_ref_pics_present
    br.bit() // sps_temporal_mvp
    if (br.bit() == 1) throw ParseFail // strong_intra_smoothing (the
    // 32x32 bilinear path is out of the starter subset)
    // vui/extensions ignored
    HSps(width, height, ctbLog2, minCbLog2, maxTbLog2, minTbLog2,
      pcmEnabled, pcmMin, pcmMax, cropL, cropR, cropT, cropB)
  }

  private def parsePps(rbsp: Array[Byte]): HPps = {
    val br = new BitReader(rbsp)
    val id = br.ue()
    val spsId = br.ue()
    if (br.bit() == 1) throw ParseFail // dependent_slice_segments
    if (br.bit() == 1) throw ParseFail // output_flag_present
    if (br.bits(3) != 0) throw ParseFail // num_extra_slice_header_bits
    if (br.bit() == 1) throw ParseFail // sign_data_hiding
    if (br.bit() == 1) throw ParseFail // cabac_init_present
    br.ue(); br.ue() // num_ref_idx defaults
    val initQp = 26 + br.se()
    if (initQp < 0 || initQp > 51) throw ParseFail
    if (br.bit() == 1) throw ParseFail // constrained_intra_pred
    if (br.bit() == 1) throw ParseFail // transform_skip
    if (br.bit() == 1) throw ParseFail // cu_qp_delta_enabled
    br.se(); br.se() // pps cb/cr qp offsets (chroma not reconstructed)
    if (br.bit() == 1) throw ParseFail // slice_chroma_qp_offsets
    br.bit(); br.bit() // weighted pred flags (I-only: unused)
    if (br.bit() == 1) throw ParseFail // transquant_bypass
    if (br.bit() == 1) throw ParseFail // tiles_enabled
    if (br.bit() == 1) throw ParseFail // entropy_coding_sync (WPP)
    br.bit() // loop_filter_across_slices
    if (br.bit() == 1) { // deblocking_filter_control_present
      if (br.bit() == 1) throw ParseFail // override_enabled
      if (br.bit() != 1) throw ParseFail // pps_deblocking MUST be
      // disabled: the HEVC loop filter is outside the starter subset
    } else throw ParseFail // absent control => deblocking ON: degrade
    if (br.bit() == 1) throw ParseFail // pps_scaling_list
    br.bit() // lists_modification (I-only: unused)
    br.ue() // log2_parallel_merge_level_minus2
    if (br.bit() == 1) throw ParseFail // slice_header_extension
    HPps(id, spsId, initQp)
  }

  /** Per-picture decode state: luma plane + per-4x4-cell decoded /
    * depth / intra-mode grids (z-scan availability, split contexts,
    * 8.4.2 mode candidates). */
  private final class Pic(val sps: HSps) {
    val ctb = 1 << sps.ctbLog2
    val ctbW: Int = (sps.width + ctb - 1) >> sps.ctbLog2
    val ctbH: Int = (sps.height + ctb - 1) >> sps.ctbLog2
    val stride: Int = ctbW << sps.ctbLog2
    val planeH: Int = ctbH << sps.ctbLog2
    val luma = new Array[Int](stride * planeH)
    val gw: Int = stride >> 2
    val gh: Int = planeH >> 2
    val decoded = new Array[Boolean](gw * gh)
    val depth = new Array[Int](gw * gh)
    val mode = Array.fill(gw * gh)(-1) // intra mode; -1 undecoded;
    // PCM cells carry DC (1) per the 8.4.2 neighbor rule
    def cellsSet(x0: Int, y0: Int, size: Int, d: Int, m: Int): Unit = {
      var y = y0 >> 2
      while (y < ((y0 + size) >> 2)) {
        var x = x0 >> 2
        while (x < ((x0 + size) >> 2)) {
          decoded(y * gw + x) = true
          depth(y * gw + x) = d
          mode(y * gw + x) = m
          x += 1
        }
        y += 1
      }
    }
    def avail(px: Int, py: Int): Boolean =
      px >= 0 && py >= 0 && px < sps.width && py < sps.height &&
        decoded((py >> 2) * gw + (px >> 2))
  }

  /** 8.4.2 luma intra mode candidate list (shared decoder/encoder). */
  private def candList(pic: Pic, x0: Int, y0: Int): Array[Int] = {
    def modeAt(px: Int, py: Int, isAbove: Boolean): Int = {
      if (px < 0 || py < 0 || !pic.avail(px, py)) 1 // unavailable: DC
      else if (isAbove &&
        (py >> pic.sps.ctbLog2) != (y0 >> pic.sps.ctbLog2)) 1
      else {
        val m = pic.mode((py >> 2) * pic.gw + (px >> 2))
        if (m < 0) 1 else m
      }
    }
    val a = modeAt(x0 - 1, y0, isAbove = false)
    val b = modeAt(x0, y0 - 1, isAbove = true)
    if (a == b) {
      if (a < 2) Array(0, 1, 26)
      else Array(a, 2 + ((a + 29) % 32), 2 + ((a - 2 + 1) % 32))
    } else {
      val c = if (a != 0 && b != 0) 0 else if (a != 1 && b != 1) 1 else 26
      Array(a, b, c)
    }
  }

  /** Gather + substitute reference samples for an nT x nT luma TU at
    * (x0, y0) (8.4.4.2.2), optionally [1 2 1]-filtered (planar at
    * nT >= 8). Returns (corner, left[2nT], top[2nT]) or all-128. */
  private def gatherRefs(pic: Pic, x0: Int, y0: Int, nT: Int,
      filter: Boolean): (Int, Array[Int], Array[Int]) = {
    val left = new Array[Int](2 * nT)
    val top = new Array[Int](2 * nT)
    val haveL = new Array[Boolean](2 * nT)
    val haveT = new Array[Boolean](2 * nT)
    var corner = 0
    var haveC = false
    var any = false
    var i = 0
    while (i < 2 * nT) {
      if (pic.avail(x0 - 1, y0 + i)) {
        left(i) = pic.luma((y0 + i) * pic.stride + x0 - 1)
        haveL(i) = true
        any = true
      }
      if (pic.avail(x0 + i, y0 - 1)) {
        top(i) = pic.luma((y0 - 1) * pic.stride + x0 + i)
        haveT(i) = true
        any = true
      }
      i += 1
    }
    if (pic.avail(x0 - 1, y0 - 1)) {
      corner = pic.luma((y0 - 1) * pic.stride + x0 - 1)
      haveC = true
      any = true
    }
    if (!any) {
      java.util.Arrays.fill(left, 128)
      java.util.Arrays.fill(top, 128)
      corner = 128
    } else {
      // substitution: seed the bottom-most left sample by scanning up
      // the left column, then the corner, then the top row
      if (!haveL(2 * nT - 1)) {
        var seed = Int.MinValue
        var k = 2 * nT - 2
        while (seed == Int.MinValue && k >= 0) {
          if (haveL(k)) seed = left(k)
          k -= 1
        }
        if (seed == Int.MinValue && haveC) seed = corner
        if (seed == Int.MinValue) {
          k = 0
          while (seed == Int.MinValue && k < 2 * nT) {
            if (haveT(k)) seed = top(k)
            k += 1
          }
        }
        left(2 * nT - 1) = seed
        haveL(2 * nT - 1) = true
      }
      var k = 2 * nT - 2
      while (k >= 0) {
        if (!haveL(k)) left(k) = left(k + 1)
        k -= 1
      }
      if (!haveC) corner = left(0)
      k = 0
      while (k < 2 * nT) {
        if (!haveT(k)) top(k) = if (k == 0) corner else top(k - 1)
        k += 1
      }
    }
    if (!filter || nT < 8) (corner, left, top)
    else {
      val fl = new Array[Int](2 * nT)
      val ft = new Array[Int](2 * nT)
      val fc = (left(0) + 2 * corner + top(0) + 2) >> 2
      var j = 0
      while (j < 2 * nT) {
        fl(j) =
          if (j == 2 * nT - 1) left(j)
          else (((if (j == 0) corner else left(j - 1)) + 2 * left(j) +
            left(j + 1) + 2) >> 2)
        ft(j) =
          if (j == 2 * nT - 1) top(j)
          else (((if (j == 0) corner else top(j - 1)) + 2 * top(j) +
            top(j + 1) + 2) >> 2)
        j += 1
      }
      (fc, fl, ft)
    }
  }

  /** PLANAR (8.4.4.2.4) / DC (8.4.4.2.5 with luma boundary smoothing)
    * prediction written straight into the plane. */
  private def predictIntra(pic: Pic, x0: Int, y0: Int, nT: Int,
      mode: Int): Unit = {
    val lg = Integer.numberOfTrailingZeros(nT)
    if (mode == 0) { // planar (refs filtered at nT >= 8)
      val (_, left, top) = gatherRefs(pic, x0, y0, nT, filter = nT >= 8)
      var y = 0
      while (y < nT) {
        var x = 0
        while (x < nT) {
          pic.luma((y0 + y) * pic.stride + x0 + x) =
            ((nT - 1 - x) * left(y) + (x + 1) * top(nT) +
              (nT - 1 - y) * top(x) + (y + 1) * left(nT) + nT) >> (lg + 1)
          x += 1
        }
        y += 1
      }
    } else { // DC (never filtered)
      val (_, left, top) = gatherRefs(pic, x0, y0, nT, filter = false)
      var s = nT
      var i = 0
      while (i < nT) { s += left(i) + top(i); i += 1 }
      val dc = s >> (lg + 1)
      var y = 0
      while (y < nT) {
        var x = 0
        while (x < nT) {
          pic.luma((y0 + y) * pic.stride + x0 + x) = dc
          x += 1
        }
        y += 1
      }
      if (nT < 32) { // luma boundary smoothing
        pic.luma(y0 * pic.stride + x0) =
          (left(0) + 2 * dc + top(0) + 2) >> 2
        var k = 1
        while (k < nT) {
          pic.luma(y0 * pic.stride + x0 + k) = (top(k) + 3 * dc + 2) >> 2
          pic.luma((y0 + k) * pic.stride + x0) = (left(k) + 3 * dc + 2) >> 2
          k += 1
        }
      }
    }
  }

  /** Decode one coding quadtree node; returns false on degrade. */
  private def decodeCqt(pic: Pic, dec: H264Cabac.Dec, cx: H264Cabac.Ctx,
      rbsp: Array[Byte], x0: Int, y0: Int, log2Size: Int,
      depth: Int): Boolean = {
    val sps = pic.sps
    val size = 1 << log2Size
    val inPicR = x0 + size <= sps.width
    val inPicB = y0 + size <= sps.height
    val split =
      if (log2Size > sps.minCbLog2 && inPicR && inPicB) {
        val condL = if (pic.avail(x0 - 1, y0) &&
          pic.depth(((y0) >> 2) * pic.gw + ((x0 - 1) >> 2)) > depth) 1 else 0
        val condA = if (pic.avail(x0, y0 - 1) &&
          pic.depth(((y0 - 1) >> 2) * pic.gw + (x0 >> 2)) > depth) 1 else 0
        dec.decision(cx, CtxSplit0 + condL + condA)
      } else if (!inPicR || !inPicB) true // forced split at the edge
      else false
    if (split) {
      if (log2Size <= sps.minCbLog2) return false // can't split further
      val half = size >> 1
      var i = 0
      while (i < 4) {
        val x1 = x0 + (i & 1) * half
        val y1 = y0 + (i >> 1) * half
        if (x1 < sps.width && y1 < sps.height) {
          if (!decodeCqt(pic, dec, cx, rbsp, x1, y1, log2Size - 1,
            depth + 1)) return false
        }
        i += 1
      }
      return true
    }
    // ---- coding unit (intra; I slice)
    if (log2Size == sps.minCbLog2) {
      // part_mode: bin 1 = PART_2Nx2N; 0 = NxN (out of subset)
      if (!dec.decision(cx, CtxPart)) return false
    }
    var isPcm = false
    if (sps.pcmEnabled && log2Size >= sps.pcmMinLog2 &&
      log2Size <= sps.pcmMaxLog2) isPcm = dec.terminate()
    if (isPcm) {
      val byteStart = (dec.bitPos + 7) >> 3
      val lumaBytes = size * size
      val chromaBytes = 2 * (size >> 1) * (size >> 1)
      if (byteStart + lumaBytes + chromaBytes > rbsp.length) return false
      var y = 0
      while (y < size) {
        var x = 0
        while (x < size) {
          pic.luma((y0 + y) * pic.stride + x0 + x) =
            rbsp(byteStart + y * size + x) & 0xFF
          x += 1
        }
        y += 1
      }
      pic.cellsSet(x0, y0, size, depth, 1) // PCM neighbors read as DC
      return dec.reinit((byteStart + lumaBytes + chromaBytes) * 8)
    }
    // prev_intra_luma_pred_flag + mpm_idx / rem_intra (one PU)
    val cands = candList(pic, x0, y0)
    val mode =
      if (dec.decision(cx, CtxPrevIntra)) {
        var idx = 0
        if (dec.bypass()) { idx = 1; if (dec.bypass()) idx = 2 }
        cands(idx)
      } else {
        var rem = 0
        var b = 0
        while (b < 5) { rem = (rem << 1) | (if (dec.bypass()) 1 else 0); b += 1 }
        val sorted = cands.sorted
        var m = rem
        var k = 0
        while (k < 3) { if (m >= sorted(k)) m += 1; k += 1 }
        m
      }
    if (mode > 1) return false // angular: out of the starter subset
    // intra_chroma_pred_mode: '0' = derived (DM); '1' + 2 bypass =
    // explicit list (parse-only; chroma not reconstructed)
    if (dec.decision(cx, CtxChromaMode)) { dec.bypass(); dec.bypass() }
    // transform tree: a CU wider than the max TU would force a split
    // (out of subset); at CU == TU no split flag is read in the
    // configurations this tier accepts (hierarchy depth gates it out)
    if (log2Size > sps.maxTbLog2) return false
    // cbf_cb, cbf_cr (trafoDepth 0), then cbf_luma — nonzero
    // residuals degrade
    if (dec.decision(cx, CtxCbfC)) return false
    if (dec.decision(cx, CtxCbfC)) return false
    if (dec.decision(cx, CtxCbfLuma + 1)) return false // ctxInc 1 at
    // trafoDepth 0
    predictIntra(pic, x0, y0, size, mode)
    pic.cellsSet(x0, y0, size, depth, mode)
    true
  }

  /** Decode the first IDR picture of an Annex-B HEVC stream:
    * (width, height, luma) or None-degrade. */
  def decodeIFrameLuma(es: Array[Byte]): Option[(Int, Int, Array[Int])] =
    decodeFramesLuma(es, 1).headOption

  /** Decode up to `maxFrames` IDR pictures (intra starter: every
    * picture is independent; non-IDR slices stop the walk). */
  def decodeFramesLuma(es: Array[Byte],
      maxFrames: Int): Seq[(Int, Int, Array[Int])] =
    decodeFramesLumaNals(splitAnnexB(es), maxFrames)

  /** NAL-list form of [[decodeFramesLuma]] (hvcC / length-prefixed
    * callers, round 14). */
  def decodeFramesLumaNals(nals: Seq[Array[Byte]],
      maxFrames: Int): Seq[(Int, Int, Array[Int])] = {
    val frames = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Int, Array[Int])]
    if (maxFrames <= 0) return frames.toSeq
    try {
      var sps: HSps = null
      var pps: HPps = null
      nals.filter(_.length >= 2).foreach { nal =>
        if (frames.size >= maxFrames) return frames.toSeq
        if ((nal(0) & 0x80) == 0) {
          val typ = (nal(0) >> 1) & 0x3F
          typ match {
            case 33 => sps = parseSps(unescape(nal, 2))
            case 34 => pps = parsePps(unescape(nal, 2))
            case 19 | 20 => // IDR_W_RADL / IDR_N_LP
              if (sps == null || pps == null) return frames.toSeq
              decodeIdrSlice(unescape(nal, 2), sps, pps) match {
                case Some(f) => frames += f
                case None => return frames.toSeq
              }
            case 32 | 35 | 39 | 40 => () // VPS / AUD / SEI: skip
            case t if t < 32 => return frames.toSeq // non-IDR slice
            case _ => ()
          }
        }
      }
      frames.toSeq
    } catch {
      case ParseFail => frames.toSeq
      case _: ArrayIndexOutOfBoundsException => frames.toSeq
    }
  }

  private def decodeIdrSlice(rbsp: Array[Byte], sps: HSps,
      pps: HPps): Option[(Int, Int, Array[Int])] = {
    try {
      val br = new BitReader(rbsp)
      if (br.bit() != 1) return None // first_slice_segment_in_pic
      br.bit() // no_output_of_prior_pics (IRAP)
      if (br.ue() != pps.id) return None // slice_pic_parameter_set_id
      if (br.ue() != 2) return None // slice_type: I only
      val qp = pps.initQp + br.se()
      if (qp < 0 || qp > 51) return None
      // deblocking disabled at the PPS; no sao, no tiles/wpp -> the
      // header ends here. byte_alignment: a one bit then zeros.
      if (br.bit() != 1) return None // alignment_bit_equal_to_one
      while ((br.pos & 7) != 0) if (br.bit() != 0) return None
      val pic = new Pic(sps)
      val cx = new H264Cabac.Ctx(qp, InitPairs)
      val dec = new H264Cabac.Dec(rbsp, br.pos)
      if (!dec.valid) return None
      val nCtbs = pic.ctbW * pic.ctbH
      var ctu = 0
      var end = false
      while (ctu < nCtbs && !end) {
        val x0 = (ctu % pic.ctbW) << sps.ctbLog2
        val y0 = (ctu / pic.ctbW) << sps.ctbLog2
        if (!decodeCqt(pic, dec, cx, rbsp, x0, y0, sps.ctbLog2, 0))
          return None
        ctu += 1
        end = dec.terminate() // end_of_slice_segment_flag
        if (!end && ctu >= nCtbs) return None
      }
      if (ctu < nCtbs) return None // slice ended early: partial picture
      if (dec.overrun > 0) return None // phantom-bit guard
      // crop the coded plane to the conformance window (CTB padding
      // AND the SPS conf_win offsets, ADVICE r14)
      val ow = sps.outW
      val oh = sps.outH
      val out =
        if (pic.stride == ow && pic.planeH == oh) pic.luma
        else {
          val o = new Array[Int](ow * oh)
          var y = 0
          while (y < oh) {
            System.arraycopy(pic.luma,
              (y + sps.cropT) * pic.stride + sps.cropL, o, y * ow, ow)
            y += 1
          }
          o
        }
      Some((ow, oh, out))
    } catch {
      case ParseFail => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  // ---------------------------------------------------------------- encode

  /** Coding-unit vocabulary for [[encodeIFrame]]. */
  sealed trait Cu
  /** I_PCM: raw luma, `pix(x, y)` local to the CU; chroma neutral. */
  final case class HPcm(pix: (Int, Int) => Int) extends Cu
  /** Intra PLANAR (0) or DC (1), no residual. */
  final case class HIntra(mode: Int) extends Cu
  /** One CTU: a single CU at full CTB size, or a one-level split into
    * four quadrant CUs (z order). */
  sealed trait Ctu
  final case class Leaf(cu: Cu) extends Ctu
  final case class Quad(cus: Seq[Cu]) extends Ctu

  private final class BitWriter {
    private val buf = new scala.collection.mutable.ArrayBuffer[Byte]
    private var cur = 0
    private var nb = 0
    def put(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1)
        nb += 1
        if (nb == 8) { buf += cur.toByte; cur = 0; nb = 0 }
        i -= 1
      }
    }
    def putUe(k: Int): Unit = {
      require(k >= 0)
      val v = k + 1
      val bits = 32 - Integer.numberOfLeadingZeros(v)
      put(0, bits - 1)
      put(v, bits)
    }
    def putSe(k: Int): Unit = putUe(if (k > 0) 2 * k - 1 else -2 * k)
    def byteAligned: Boolean = nb == 0
    def alignZero(): Unit = while (nb != 0) put(0, 1)
    def putByte(b: Int): Unit = { require(nb == 0); buf += b.toByte }
    def rbspTrailing(): Unit = { put(1, 1); alignZero() }
    def result(): Array[Byte] = { require(nb == 0, "unaligned"); buf.toArray }
  }

  private def escapeRbsp(rbsp: Array[Byte]): Array[Byte] = {
    val out = new scala.collection.mutable.ArrayBuffer[Byte](rbsp.length + 8)
    var zeros = 0
    rbsp.foreach { b =>
      if (zeros >= 2 && (b & 0xFC) == 0) { out += 3; zeros = 0 }
      out += b
      zeros = if (b == 0) zeros + 1 else 0
    }
    out.toArray
  }

  private def nalUnit(typ: Int, rbsp: Array[Byte]): Array[Byte] =
    Array[Byte]((typ << 1).toByte, 1) ++ escapeRbsp(rbsp)

  /** SPS NAL: 4:2:0 8-bit, CTB 16 / min CU 8 / max TU 16, PCM 8..16,
    * no SAO, deblocking handled at the PPS, no RPS. */
  def spsNal(width: Int, height: Int): Array[Byte] = {
    val bw = new BitWriter
    bw.put(0, 4) // vps id
    bw.put(0, 3) // max_sub_layers_minus1
    bw.put(1, 1) // temporal_id_nesting
    // profile_tier_level: space 0, tier 0, idc 1 (Main), flags 0,
    // level 120
    bw.put(0, 2); bw.put(0, 1); bw.put(1, 5)
    bw.put(0, 32) // compatibility flags
    bw.put(0, 32); bw.put(0, 16) // source flags + 43 reserved + inbld
    bw.put(120, 8) // level_idc
    bw.putUe(0) // sps id
    bw.putUe(1) // chroma_format_idc 4:2:0
    bw.putUe(width)
    bw.putUe(height)
    bw.put(0, 1) // conformance_window
    bw.putUe(0); bw.putUe(0) // bit depths
    bw.putUe(0) // log2_max_poc_lsb_minus4
    bw.put(1, 1) // sub_layer_ordering_info_present
    bw.putUe(1); bw.putUe(0); bw.putUe(0) // dpb sizes
    bw.putUe(0) // log2_min_cb_minus3 -> 8
    bw.putUe(1) // log2_diff -> CTB 16
    bw.putUe(0) // log2_min_tb_minus2 -> 4
    bw.putUe(2) // log2_diff tb -> max TU 16
    bw.putUe(0); bw.putUe(0) // transform hierarchy depths
    bw.put(0, 1) // scaling_list
    bw.put(0, 1) // amp
    bw.put(0, 1) // sao
    bw.put(1, 1) // pcm_enabled
    bw.put(7, 4); bw.put(7, 4) // pcm bit depths (8)
    bw.putUe(0) // log2_min_pcm_cb_minus3 -> 8
    bw.putUe(1) // log2_diff -> max pcm 16
    bw.put(1, 1) // pcm_loop_filter_disabled
    bw.putUe(0) // num_short_term_ref_pic_sets
    bw.put(0, 1) // long_term_ref_pics
    bw.put(0, 1) // temporal_mvp
    bw.put(0, 1) // strong_intra_smoothing
    bw.put(0, 1) // vui
    bw.put(0, 1) // sps_extension
    bw.rbspTrailing()
    nalUnit(33, bw.result())
  }

  /** PPS NAL: everything off, deblocking disabled. */
  def ppsNal(qp: Int): Array[Byte] = {
    val bw = new BitWriter
    bw.putUe(0) // pps id
    bw.putUe(0) // sps id
    bw.put(0, 1) // dependent_slice_segments
    bw.put(0, 1) // output_flag_present
    bw.put(0, 3) // extra slice header bits
    bw.put(0, 1) // sign_data_hiding
    bw.put(0, 1) // cabac_init_present
    bw.putUe(0); bw.putUe(0) // num_ref_idx defaults
    bw.putSe(qp - 26) // init_qp_minus26
    bw.put(0, 1) // constrained_intra
    bw.put(0, 1) // transform_skip
    bw.put(0, 1) // cu_qp_delta
    bw.putSe(0); bw.putSe(0) // chroma qp offsets
    bw.put(0, 1) // slice_chroma_qp_offsets_present
    bw.put(0, 1); bw.put(0, 1) // weighted pred flags
    bw.put(0, 1) // transquant_bypass
    bw.put(0, 1) // tiles
    bw.put(0, 1) // entropy_coding_sync
    bw.put(1, 1) // loop_filter_across_slices
    bw.put(1, 1) // deblocking_filter_control_present
    bw.put(0, 1) // override_enabled
    bw.put(1, 1) // pps_deblocking_filter_disabled
    bw.put(0, 1) // pps_scaling_list
    bw.put(0, 1) // lists_modification
    bw.putUe(0) // log2_parallel_merge_level_minus2
    bw.put(0, 1) // slice_header_extension
    bw.put(0, 1) // pps_extension
    bw.rbspTrailing()
    nalUnit(34, bw.result())
  }

  /** IDR slice NAL over a ctbW x ctbH grid of 16-px CTUs, each from
    * `ctu(index)` (raster order). The encoder drives the SAME grids,
    * candidate lists and contexts as the decoder. */
  def idrNal(ctbW: Int, ctbH: Int, ctu: Int => Ctu, qp: Int): Array[Byte] = {
    require(qp >= 0 && qp <= 51, s"qp out of range: $qp")
    val sps = HSps(ctbW * 16, ctbH * 16, 4, 3, 4, 2,
      pcmEnabled = true, pcmMinLog2 = 3, pcmMaxLog2 = 4)
    val pic = new Pic(sps)
    val bw = new BitWriter
    bw.put(1, 1) // first_slice_segment_in_pic
    bw.put(0, 1) // no_output_of_prior_pics
    bw.putUe(0) // pps id
    bw.putUe(2) // slice_type I
    bw.putSe(0) // slice_qp_delta
    bw.put(1, 1) // byte alignment: one bit
    bw.alignZero()
    val cx = new H264Cabac.Ctx(qp, InitPairs)
    var enc = new H264Cabac.Enc
    def drain(): Unit = enc.drain(b => bw.put(b, 1))
    def putCu(x0: Int, y0: Int, log2Size: Int, depth: Int, cu: Cu): Unit = {
      val size = 1 << log2Size
      if (log2Size == sps.minCbLog2)
        enc.decision(cx, CtxPart, bin = true) // PART_2Nx2N
      cu match {
        case HPcm(pix) =>
          enc.terminate(bin = true) // pcm_flag (flush inside)
          drain()
          bw.alignZero()
          var y = 0
          while (y < size) {
            var x = 0
            while (x < size) {
              val v = pix(x, y)
              require(v >= 0 && v <= 255, s"pcm pixel out of range: $v")
              bw.putByte(v)
              x += 1
            }
            y += 1
          }
          var c = 0
          while (c < 2 * (size >> 1) * (size >> 1)) { bw.putByte(128); c += 1 }
          pic.cellsSet(x0, y0, size, depth, 1)
          enc = new H264Cabac.Enc
        case HIntra(mode) =>
          require(mode == 0 || mode == 1, s"starter modes: planar/DC, got $mode")
          enc.terminate(bin = false) // pcm_flag 0
          val cands = candList(pic, x0, y0)
          val idx = cands.indexOf(mode)
          if (idx >= 0) {
            enc.decision(cx, CtxPrevIntra, bin = true)
            enc.bypass(idx > 0)
            if (idx > 0) enc.bypass(idx > 1)
          } else {
            enc.decision(cx, CtxPrevIntra, bin = false)
            val sorted = cands.sorted
            var rem = mode
            var k = 2
            while (k >= 0) { if (mode > sorted(k)) rem -= 1; k -= 1 }
            var b = 4
            while (b >= 0) { enc.bypass(((rem >> b) & 1) == 1); b -= 1 }
          }
          enc.decision(cx, CtxChromaMode, bin = false) // chroma DM
          enc.decision(cx, CtxCbfC, bin = false) // cbf_cb
          enc.decision(cx, CtxCbfC, bin = false) // cbf_cr
          enc.decision(cx, CtxCbfLuma + 1, bin = false) // cbf_luma
          // reconstruct in the encoder's shadow picture so later CUs
          // predict from the same samples the decoder sees
          predictIntra(pic, x0, y0, size, mode)
          pic.cellsSet(x0, y0, size, depth, mode)
      }
    }
    val nCtbs = ctbW * ctbH
    var t = 0
    while (t < nCtbs) {
      val x0 = (t % ctbW) << 4
      val y0 = (t / ctbW) << 4
      def splitCtx: Int = {
        val condL = if (pic.avail(x0 - 1, y0) &&
          pic.depth((y0 >> 2) * pic.gw + ((x0 - 1) >> 2)) > 0) 1 else 0
        val condA = if (pic.avail(x0, y0 - 1) &&
          pic.depth(((y0 - 1) >> 2) * pic.gw + (x0 >> 2)) > 0) 1 else 0
        condL + condA
      }
      ctu(t) match {
        case Leaf(cu) =>
          enc.decision(cx, CtxSplit0 + splitCtx, bin = false)
          putCu(x0, y0, 4, 0, cu)
        case Quad(cus) =>
          require(cus.length == 4, "Quad needs 4 CUs")
          enc.decision(cx, CtxSplit0 + splitCtx, bin = true)
          var i = 0
          while (i < 4) {
            putCu(x0 + (i & 1) * 8, y0 + (i >> 1) * 8, 3, 1, cus(i))
            i += 1
          }
      }
      t += 1
      enc.terminate(t == nCtbs) // end_of_slice_segment_flag
    }
    drain()
    bw.alignZero() // flush's final '1' was the rbsp stop bit
    nalUnit(19, bw.result()) // IDR_W_RADL
  }

  /** Annex-B HEVC I-frame: SPS + PPS + IDR over 16-px CTUs. */
  def encodeIFrame(ctbW: Int, ctbH: Int, ctu: Int => Ctu,
      qp: Int = 28): Array[Byte] = {
    val sep = Array[Byte](0, 0, 0, 1)
    sep ++ spsNal(ctbW * 16, ctbH * 16) ++ sep ++ ppsNal(qp) ++ sep ++
      idrNal(ctbW, ctbH, ctu, qp)
  }
}
