package graft.ext

/** H.265/HEVC (Rec. ITU-T H.265, public spec) INTRA decoder —
  * round 14's starter tier plus the round-15 residual + angular
  * layer (VERDICT r14 #3/#5): real intra-only pictures decode now,
  * under degrade-to-None for everything else.
  *
  * Decoded for real (bit-exact per the spec):
  *  - NAL syntax (two-byte headers), emulation prevention, SPS/PPS
  *    parse for the supported flag set, single-slice IDR pictures,
  *    the conformance window (applied on emit).
  *  - CABAC slice data through the SAME arithmetic engine as H.264
  *    ([[H264Cabac]] — HEVC 9.3.4.3 inherited the engine and its
  *    Tables 9-44/9-45 verbatim; only the context INIT VALUES are
  *    HEVC's own, transcribed here with the same offline-provenance
  *    caveat as H264Cabac's): coding-quadtree recursion with
  *    neighbor-depth split contexts, part_mode, the pcm_flag
  *    terminate escape with engine re-init, prev/mpm/rem intra mode
  *    coding with the full 8.4.2 candidate-list derivation,
  *    intra_chroma_pred_mode (decoded to the real chroma mode — it
  *    drives the mode-dependent residual scans), cbf flags,
  *    end_of_slice.
  *  - I_PCM coding units (raw luma samples — always exact).
  *  - Intra PLANAR (8.4.4.2.4), DC (8.4.4.2.5 with the luma boundary
  *    smoothing) and ALL 33 ANGULAR modes (8.4.4.2.6, round 15 —
  *    invAngle side projection, 5-bit fraction interpolation, the
  *    mode-10/26 boundary filters), with 8.4.4.2.2 reference
  *    substitution and the 8.4.4.2.3 filtering decision.
  *  - The TRANSFORM TREE (7.3.8.8, round 15): coded
  *    split_transform_flag, per-depth cbf_cb/cbf_cr inheritance,
  *    per-TU intra prediction from reconstructed neighbors.
  *  - LUMA RESIDUALS (7.3.8.11 + 8.6, round 15): last position,
  *    coded_sub_block_flag, position/pattern significance contexts,
  *    greater1/greater2 sets, sign bins, Golomb-Rice
  *    coeff_abs_level_remaining with rice adaptation, the
  *    mode-dependent scans, dequant (8.6.3) and the 4/8/16/32 inverse
  *    DCT + 4x4 DST-VII (8.6.4; the 16/32 matrices derive from the
  *    hardcoded 4/8 rows + canonical odd constants by the standard's
  *    structural identities). Chroma residuals are PARSED for
  *    bitstream sync with their own context sets; only luma is
  *    reconstructed (the avc1 round-12 posture).
  *
  *  - PART_NxN coding units (round 15): four PUs with their own
  *    modes (two-pass prev-flag/payload syntax, z-scan candidate
  *    availability across the CU), one chroma mode (DM = PU 0), and
  *    the IntraSplitFlag-forced transform split (MaxTrafoDepth + 1).
  *
  * Honesty bounds, all degrade-to-None: P/B slices, SAO, deblocking,
  * tiles/WPP, dependent or multiple slice segments, scaling lists,
  * transform_skip/transquant_bypass, sign data hiding, cu_qp_delta,
  * strong intra smoothing, >8-bit, non-4:2:0, long-term/RPS
  * machinery. */
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
  // round 16 (SAO): appended at the pool's end so earlier indices
  // stay put
  private val CtxSaoMerge = 127 // sao_merge_left/up: 153
  private val CtxSaoType = 128 // sao_type_idx bin 0: 200
  // round 16 (P slices): inter-only contexts, appended; the I column
  // carries never-read 154 fillers in these slots
  private val CtxCuSkip = 129 // 3 ctxs (neighbor-skip inc)
  private val CtxPredMode = 132 // pred_mode_flag
  private val CtxMergeFlag = 133
  private val CtxMergeIdx = 134 // bin 0; rest bypass
  private val CtxMvp = 135 // mvp_l0_flag
  private val CtxRqtRoot = 136 // rqt_root_cbf
  private val CtxMvdGr0 = 137 // abs_mvd_greater0 (both comps)
  private val CtxMvdGr1 = 138 // abs_mvd_greater1 (both comps)
  // ---- residual-coding contexts (round 15, Tables 9-x initType 0):
  // one 18-value row initializes BOTH last-x and last-y pools (the
  // spec repeats it), 15 luma + 3 chroma each
  private val CtxLastX = 15
  private val CtxLastY = 33
  private val CtxCsbf = 51 // coded_sub_block_flag: 2 luma + 2 chroma
  private val CtxSig = 55 // sig_coeff_flag: 27 luma + 15 chroma
  private val CtxGt1 = 97 // greater1: 16 luma + 8 chroma
  private val CtxGt2 = 121 // greater2: 4 luma + 2 chroma
  private val LastInit = Array(
    110, 110, 124, 125, 140, 153, 125, 127, 140, 109, 111, 143,
    127, 111, 79, 108, 123, 63)
  private val InitVals: Array[Int] = Array(
    139, 141, 157, 184, 184, 63, 153, 138, 138, 111, 141,
    94, 138, 182, 154) ++
    LastInit ++ LastInit ++
    // ROUND-16 CORRECTION: this row had carried {121, 140, 61, 154},
    // which is the B/P column of the public table — the reference
    // software lists its init rows in {B, P, I} order, and reading
    // "the first row" as I swaps columns (the same failure shape as
    // the H.264 InitI mix-up fixed this round; every OTHER row of
    // this pool cross-checks as the true I column under that
    // ordering). No local gate can catch it (the twin encoder shares
    // the table); only wild-stream entropy decode reads the wrong
    // state.
    Array(91, 171, 134, 141) ++ // coded_sub_block_flag (I column)
    Array( // sig_coeff_flag (27 luma + 15 chroma)
      111, 111, 125, 110, 110, 94, 124, 108, 124, 107, 125, 141,
      179, 153, 125, 107, 125, 141, 179, 153, 125, 107, 125, 141,
      179, 153, 125, 140, 139, 182, 182, 152, 136, 152, 136, 153,
      136, 139, 111, 136, 139, 111) ++
    Array( // coeff_abs_level_greater1 (16 luma + 8 chroma)
      140, 92, 137, 138, 140, 152, 138, 139, 153, 74, 149, 92,
      139, 107, 122, 152, 140, 179, 166, 182, 140, 227, 122, 197) ++
    Array(138, 153, 136, 167, 152, 152) ++ // greater2 (4 luma + 2 chroma)
    Array(153, 200) ++ // sao_merge, sao_type_idx (round 16)
    Array(154, 154, 154, 154, 154, 154, 154, 154, 154, 154) // inter
    // slots 129-138: never read in I slices (filler)
  assert(InitVals.length == 139, s"HEVC ctx pool: ${InitVals.length}")

  /** initType-1 (P slice) column, same index order as [[InitVals]]
    * (round 16). Transcribed from the public table with the {B, P, I}
    * row ordering this round validated against 12 independent rows;
    * the own-encoder twin keeps local gates exact regardless. */
  private val InitValsP: Array[Int] = Array(
    107, 139, 126, // split_cu_flag
    154, // part_mode bin 0
    154, // prev_intra_luma_pred_flag
    152, // intra_chroma_pred_mode
    124, 138, 94, // split_transform_flag
    153, 111, // cbf_luma
    149, 107, 167, 154) ++ // cbf_cb / cbf_cr
    {
      val lastP = Array(125, 110, 94, 110, 95, 79, 125, 111, 110,
        78, 110, 111, 111, 95, 94, 108, 123, 108)
      lastP ++ lastP
    } ++
    Array(121, 140, 61, 154) ++ // coded_sub_block_flag (P column)
    Array( // sig_coeff_flag (27 luma + 15 chroma, P column)
      155, 154, 139, 153, 139, 123, 123, 63, 153, 166, 183, 140,
      136, 153, 154, 166, 183, 140, 136, 153, 154, 166, 183, 140,
      136, 153, 154, 170, 153, 123, 123, 107, 121, 107, 121, 167,
      151, 183, 140, 151, 183, 140) ++
    Array( // coeff_abs_level_greater1 (P column)
      154, 196, 196, 167, 154, 152, 167, 182, 182, 134, 149, 136,
      153, 121, 136, 137, 169, 194, 166, 167, 154, 167, 137, 182) ++
    Array(107, 167, 91, 107, 107, 167) ++ // greater2 (P column)
    Array(153, 185) ++ // sao_merge, sao_type_idx
    Array(197, 185, 201) ++ // cu_skip_flag
    Array(149) ++ // pred_mode_flag
    Array(110) ++ // merge_flag
    Array(122) ++ // merge_idx
    Array(168) ++ // mvp_l0_flag
    Array(79) ++ // rqt_root_cbf
    Array(140, 198) // abs_mvd_greater0 / greater1
  assert(InitValsP.length == 139,
    s"HEVC P ctx pool: ${InitValsP.length}")
  private def toPairs(vals: Array[Int]): Array[Int] = vals.flatMap { iv =>
    Array((iv >> 4) * 5 - 45, ((iv & 15) << 3) - 16)
  }
  private val InitPairs: Array[Int] = toPairs(InitVals)
  private val InitPairsP: Array[Int] = toPairs(InitValsP)

  // ---- scans (round 15): 4x4 in-sub-block position orders as
  // (y << 2) | x, scan position 0 = DC; 0 = up-right diagonal,
  // 1 = horizontal, 2 = vertical (6.5.3)
  private val Scan4: Array[Array[Int]] = {
    val diag = {
      val out = new Array[Int](16)
      var i = 0
      var d = 0
      while (d <= 6) { // anti-diagonals, bottom-left to top-right
        var y = math.min(d, 3)
        while (y >= 0 && d - y <= 3) {
          val x = d - y
          if (x >= 0 && x <= 3) { out(i) = (y << 2) | x; i += 1 }
          y -= 1
        }
        d += 1
      }
      out
    }
    val hor = Array.tabulate(16)(identity)
    val ver = Array.tabulate(16)(i => ((i & 3) << 2) | (i >> 2))
    Array(diag, hor, ver)
  }
  /** sub-block scan for an n x n grid of 4x4 sub-blocks, same
    * pattern; entries (y * n + x). */
  private def subScan(n: Int, scanIdx: Int): Array[Int] = {
    val out = new Array[Int](n * n)
    var i = 0
    if (scanIdx == 1) { var k = 0; while (k < n * n) { out(k) = k; k += 1 }; i = n * n }
    else if (scanIdx == 2) {
      var x = 0
      while (x < n) { var y = 0; while (y < n) { out(i) = y * n + x; i += 1; y += 1 }; x += 1 }
    } else {
      var d = 0
      while (d <= 2 * (n - 1)) {
        var y = math.min(d, n - 1)
        while (y >= 0 && d - y <= n - 1) {
          out(i) = y * n + (d - y); i += 1; y -= 1
        }
        d += 1
      }
    }
    out
  }
  /** sig_coeff_flag 4x4 position ctx map (9.3.4.2.5). */
  private val SigCtx4x4 = Array(
    0, 1, 4, 5, 2, 3, 4, 5, 6, 6, 8, 8, 7, 7, 8, 8)
  /** intraPredAngle for modes 2..34 (Table 8-5). */
  private val PredAngle = Array(
    32, 26, 21, 17, 13, 9, 5, 2, 0, -2, -5, -9, -13, -17, -21, -26,
    -32, -26, -21, -17, -13, -9, -5, -2, 0, 2, 5, 9, 13, 17, 21, 26,
    32)
  /** invAngle for modes 11..25 (Table 8-6). */
  private val InvAngle = Array(
    -4096, -1638, -910, -630, -482, -390, -315, -256, -315, -390,
    -482, -630, -910, -1638, -4096)
  /** dequant levelScale (8.6.3). */
  private val LevelScale = Array(40, 45, 51, 57, 64, 72)
  /** Core transform matrices (8.6.4): T4/T8 hardcoded from the spec;
    * T16/T32 generated from them by the exact structural identities
    * of the standard's matrix — even rows are the half-size rows
    * reflected (T2N[2k][2N-1-n] = TN[k][n]), odd rows index the fixed
    * odd-phase constant sets via the cosine argument — so the only
    * transcribed constants are the canonical 4/8/16/32 basis values.
    * DST-VII 4x4 (intra luma 4x4) uses {29, 55, 74, 84}. */
  private val Dst4 = Array(
    Array(29, 55, 74, 84), Array(74, 74, 0, -74),
    Array(84, -29, -74, 55), Array(55, -84, 74, -29))
  private val Dct4 = Array(
    Array(64, 64, 64, 64), Array(83, 36, -36, -83),
    Array(64, -64, -64, 64), Array(36, -83, 83, -36))
  private val Dct8: Array[Array[Int]] = {
    val o = Array(89, 75, 50, 18)
    val t = Array.ofDim[Int](8, 8)
    var k = 0
    while (k < 4) {
      var n = 0
      while (n < 4) {
        t(2 * k)(n) = Dct4(k)(n)
        t(2 * k)(7 - n) = Dct4(k)(n)
        n += 1
      }
      k += 1
    }
    var r = 1
    while (r < 8) { // odd rows from the cosine index of (2n+1)r/16
      var n = 0
      while (n < 8) {
        var a = ((2 * n + 1) * r) % 32
        if (a > 16) a = 32 - a
        t(r)(n) = if (a < 8) o((a - 1) / 2) else -o((16 - a - 1) / 2)
        n += 1
      }
      r += 2
    }
    t
  }
  private def expandDct(half: Array[Array[Int]],
      odd: Array[Int]): Array[Array[Int]] = {
    val m = half.length
    val nN = 2 * m
    val t = Array.ofDim[Int](nN, nN)
    var k = 0
    while (k < m) {
      var n = 0
      while (n < m) {
        t(2 * k)(n) = half(k)(n)
        t(2 * k)(nN - 1 - n) = half(k)(n)
        n += 1
      }
      k += 1
    }
    var r = 1
    while (r < nN) {
      var n = 0
      while (n < nN) {
        var a = ((2 * n + 1) * r) % (4 * nN)
        if (a > 2 * nN) a = 4 * nN - a
        t(r)(n) =
          if (a < nN) odd((a - 1) / 2) else -odd((2 * nN - a - 1) / 2)
        n += 1
      }
      r += 2
    }
    t
  }
  private val Dct16 = expandDct(Dct8,
    Array(90, 87, 80, 70, 57, 43, 25, 9))
  private val Dct32 = expandDct(Dct16,
    Array(90, 90, 88, 85, 82, 78, 73, 67, 61, 54, 46, 38, 31, 22, 13,
      4))
  assert(Dct16(1)(0) == 90 && Dct16(2)(0) == 89 && Dct16(15)(0) == 9 &&
    Dct32(1)(0) == 90 && Dct32(31)(0) == 4, "transform generation pins")
  private def dctOf(nT: Int): Array[Array[Int]] = nT match {
    case 4 => Dct4
    case 8 => Dct8
    case 16 => Dct16
    case _ => Dct32
  }

  /** Inverse transform (8.6.4, 8-bit): two full matrix passes with
    * the spec's intermediate clip and shifts (7 then 12). `coef` is
    * raster nT x nT; returns raster residuals. */
  private def invTransform(coef: Array[Int], nT: Int,
      dst: Boolean): Array[Int] = {
    val t = if (dst) Dst4 else dctOf(nT)
    // pass 1 (columns): e[x][y] = sum_k T[k][y] * coef[x + k*nT]
    val mid = new Array[Int](nT * nT)
    var x = 0
    while (x < nT) {
      var y = 0
      while (y < nT) {
        var acc = 0
        var k = 0
        while (k < nT) { acc += t(k)(y) * coef(k * nT + x); k += 1 }
        var v = (acc + 64) >> 7
        if (v < -32768) v = -32768 else if (v > 32767) v = 32767
        mid(y * nT + x) = v
        y += 1
      }
      x += 1
    }
    // pass 2 (rows)
    val out = new Array[Int](nT * nT)
    var y2 = 0
    while (y2 < nT) {
      var x2 = 0
      while (x2 < nT) {
        var acc = 0
        var k = 0
        while (k < nT) { acc += t(k)(x2) * mid(y2 * nT + k); k += 1 }
        var v = (acc + 2048) >> 12
        if (v < -32768) v = -32768 else if (v > 32767) v = 32767
        out(y2 * nT + x2) = v
        x2 += 1
      }
      y2 += 1
    }
    out
  }

  /** Dequant (8.6.3, no scaling lists, 8-bit): bdShift = log2 + 3. */
  private def dequant(level: Int, qp: Int, log2Size: Int): Int = {
    val bd = log2Size + 3
    val v = ((level * 16 * LevelScale(qp % 6)) << (qp / 6)) +
      (1 << (bd - 1)) >> bd
    if (v < -32768) -32768 else if (v > 32767) 32767 else v
  }

  /** Chroma QP (Table 8-10, 4:2:0, zero cb/cr offsets). */
  private def qpC(qpY: Int): Int = {
    val qPi = if (qpY < 0) 0 else if (qpY > 57) 57 else qpY
    if (qPi < 30) qPi
    else if (qPi > 43) qPi - 6
    else Array(29, 30, 31, 32, 33, 33, 34, 34, 35, 35, 36, 36, 37,
      37)(qPi - 30)
  }

  private object ParseFail extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** Test hook: a fresh context pool (the I-slice init column). */
  private[graft] def ctxPool(qp: Int): H264Cabac.Ctx =
    new H264Cabac.Ctx(qp, InitPairs)

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
      pcmMinLog2: Int, pcmMaxLog2: Int, pcmLfOff: Boolean = false,
      saoOn: Boolean = false,
      /** round 16 (P slices): POC lsb width, the inter transform
        * hierarchy depth, and sps_temporal_mvp (whose slice flag
        * must then be parsed; enabled TMVP degrades). */
      log2MaxPoc: Int = 8, maxDepthInter: Int = 0, tmvp: Boolean = false,
      cropL: Int = 0, cropR: Int = 0, cropT: Int = 0, cropB: Int = 0,
      maxDepthIntra: Int = 0) {
    /** Conformance-window output size (7.4.3.2.1). */
    def outW: Int = width - cropL - cropR
    def outH: Int = height - cropT - cropB
  }

  private final case class HPps(id: Int, spsId: Int, initQp: Int,
      /** round 16: in-loop deblocking (8.7.2) + its offsets; the
        * across-slices flag decides a slice-header bit. */
      deblockOn: Boolean = false, betaOff: Int = 0, tcOff: Int = 0,
      acrossSlices: Boolean = true, numRefL0Def: Int = 1)

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
    val maxDepthInter = br.ue() // round 16: P-slice transform trees
    if (maxDepthInter > 4) throw ParseFail
    val maxDepthIntra = br.ue() // round 15: the transform tree reads
    // split_transform_flag for real now (ADVICE r14 closed properly)
    if (maxDepthIntra > 4) throw ParseFail
    if (br.bit() == 1) throw ParseFail // scaling_list_enabled
    br.bit() // amp_enabled (irrelevant: intra only)
    val saoOn = br.bit() == 1 // sample_adaptive_offset (round 16)
    var pcmEnabled = false
    var pcmMin = 3
    var pcmMax = 3
    var pcmLfOff = false
    if (br.bit() == 1) { // pcm_enabled
      pcmEnabled = true
      if (br.bits(4) != 7) throw ParseFail // pcm luma depth-1: 8-bit
      if (br.bits(4) != 7) throw ParseFail
      pcmMin = br.ue() + 3
      pcmMax = pcmMin + br.ue()
      pcmLfOff = br.bit() == 1 // pcm_loop_filter_disabled (round 16)
      if (pcmMax > ctbLog2) throw ParseFail
    }
    if (br.ue() != 0) throw ParseFail // num_short_term_ref_pic_sets
    if (br.bit() == 1) throw ParseFail // long_term_ref_pics_present
    val tmvp = br.bit() == 1 // sps_temporal_mvp (round 16: stored)
    if (br.bit() == 1) throw ParseFail // strong_intra_smoothing (the
    // 32x32 bilinear path is out of the starter subset)
    // vui/extensions ignored
    HSps(width, height, ctbLog2, minCbLog2, maxTbLog2, minTbLog2,
      pcmEnabled, pcmMin, pcmMax, pcmLfOff, saoOn,
      log2MaxPoc, maxDepthInter, tmvp,
      cropL, cropR, cropT, cropB,
      maxDepthIntra)
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
    val numRefL0Def = br.ue() + 1 // round 16: P header default
    br.ue() // num_ref_idx_l1 default (B: out of the subset)
    val initQp = 26 + br.se()
    if (initQp < 0 || initQp > 51) throw ParseFail
    if (br.bit() == 1) throw ParseFail // constrained_intra_pred
    if (br.bit() == 1) throw ParseFail // transform_skip
    if (br.bit() == 1) throw ParseFail // cu_qp_delta_enabled
    // round 16: chroma reconstructs — nonzero QP offsets are outside
    // the decoded subset (degrade, never mis-dequant)
    if (br.se() != 0 || br.se() != 0) throw ParseFail // cb/cr qp offsets
    if (br.bit() == 1) throw ParseFail // slice_chroma_qp_offsets
    // r17 (ADVICE r16 #2): weighted_pred_flag=1 puts pred_weight_table()
    // in every P slice header, which the header parser does not read —
    // the stream would silently desync instead of degrading. Fence it
    // like the other unsupported tools now that P slices decode.
    // weighted_bipred stays ignorable: B slices are refused earlier.
    if (br.bit() == 1) throw ParseFail // weighted_pred (P header unparsed)
    br.bit() // weighted_bipred (B slices refused)
    if (br.bit() == 1) throw ParseFail // transquant_bypass
    if (br.bit() == 1) throw ParseFail // tiles_enabled
    if (br.bit() == 1) throw ParseFail // entropy_coding_sync (WPP)
    val across = br.bit() == 1 // loop_filter_across_slices
    // round 16: the deblocking filter DECODES (8.7.2) — PPS-level
    // control only (slice override still degrades)
    var deblockOn = true
    var betaOff = 0
    var tcOff = 0
    if (br.bit() == 1) { // deblocking_filter_control_present
      if (br.bit() == 1) throw ParseFail // override_enabled
      if (br.bit() == 1) deblockOn = false // pps_deblocking_disabled
      else {
        betaOff = br.se() << 1
        tcOff = br.se() << 1
        if (betaOff < -12 || betaOff > 12 ||
          tcOff < -12 || tcOff > 12) throw ParseFail
      }
    }
    if (br.bit() == 1) throw ParseFail // pps_scaling_list
    br.bit() // lists_modification (I-only: unused)
    br.ue() // log2_parallel_merge_level_minus2
    if (br.bit() == 1) throw ParseFail // slice_header_extension
    HPps(id, spsId, initQp, deblockOn, betaOff, tcOff, across,
      numRefL0Def)
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
    /** 4:2:0 chroma planes (round 16: chroma reconstructs). */
    val strideC: Int = stride >> 1
    val planeHC: Int = planeH >> 1
    val cb = new Array[Int](strideC * planeHC)
    val cr = new Array[Int](strideC * planeHC)
    val gw: Int = stride >> 2
    val gh: Int = planeH >> 2
    val decoded = new Array[Boolean](gw * gh)
    val depth = new Array[Int](gw * gh)
    /** round 16 (deblocking): a TU/CU boundary runs along the LEFT /
      * TOP side of this 4x4 cell AND sits on the 8-sample deblock
      * grid. Marked at every TU leaf and PCM CU. */
    val vE = new Array[Boolean](gw * gh)
    val hE = new Array[Boolean](gw * gh)
    /** a PCM CU decoded (the pcm_loop_filter_disabled fence). */
    var hasPcm = false
    /** round 16 (P slices): per-4x4-cell motion state — inter flag,
      * quarter-pel MV (single list, refIdx always 0 in the starter
      * subset) and the cu_skip flag for its ctxIdxInc. */
    val interF = new Array[Boolean](gw * gh)
    val skipF = new Array[Boolean](gw * gh)
    /** TU carried coded luma coefficients (deblock bS-1 term). */
    val codedF = new Array[Boolean](gw * gh)
    val mvXg = new Array[Int](gw * gh)
    val mvYg = new Array[Int](gw * gh)
    def motionSet(x0: Int, y0: Int, size: Int, mvx: Int, mvy: Int,
        skip: Boolean): Unit = {
      var y = y0 >> 2
      while (y < ((y0 + size) >> 2)) {
        var x = x0 >> 2
        while (x < ((x0 + size) >> 2)) {
          interF(y * gw + x) = true
          skipF(y * gw + x) = skip
          mvXg(y * gw + x) = mvx
          mvYg(y * gw + x) = mvy
          x += 1
        }
        y += 1
      }
    }
    /** round 16 (SAO): per-CTB per-component params — type (0 off,
      * 1 band, 2 edge), four SIGNED offsets, band position / EO
      * class. Indexed [ctb][cIdx]. */
    var saoType: Array[Array[Int]] = null
    var saoOff: Array[Array[Array[Int]]] = null
    var saoArg: Array[Array[Int]] = null // bandPos or eoClass
    def markEdges(x0: Int, y0: Int, nT: Int): Unit = {
      if (x0 > 0 && (x0 & 7) == 0) {
        var y = y0 >> 2
        while (y < ((y0 + nT) >> 2)) { vE(y * gw + (x0 >> 2)) = true; y += 1 }
      }
      if (y0 > 0 && (y0 & 7) == 0) {
        var x = x0 >> 2
        while (x < ((x0 + nT) >> 2)) { hE((y0 >> 2) * gw + x) = true; x += 1 }
      }
    }
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
      filter: Boolean, cIdx: Int = 0): (Int, Array[Int], Array[Int]) = {
    // cIdx > 0 (round 16): the half-resolution plane; availability is
    // the co-located luma cell's
    val plane = if (cIdx == 0) pic.luma else if (cIdx == 1) pic.cb else pic.cr
    val strideP = if (cIdx == 0) pic.stride else pic.strideC
    val sh = if (cIdx == 0) 0 else 1
    def availC(px: Int, py: Int): Boolean = pic.avail(px << sh, py << sh)
    val left = new Array[Int](2 * nT)
    val top = new Array[Int](2 * nT)
    val haveL = new Array[Boolean](2 * nT)
    val haveT = new Array[Boolean](2 * nT)
    var corner = 0
    var haveC = false
    var any = false
    var i = 0
    while (i < 2 * nT) {
      if (availC(x0 - 1, y0 + i)) {
        left(i) = plane((y0 + i) * strideP + x0 - 1)
        haveL(i) = true
        any = true
      }
      if (availC(x0 + i, y0 - 1)) {
        top(i) = plane((y0 - 1) * strideP + x0 + i)
        haveT(i) = true
        any = true
      }
      i += 1
    }
    if (availC(x0 - 1, y0 - 1)) {
      corner = plane((y0 - 1) * strideP + x0 - 1)
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

  /** PLANAR (8.4.4.2.4) / DC (8.4.4.2.5 with luma boundary
    * smoothing) / ANGULAR 2-34 (8.4.4.2.6, round 15 — including the
    * invAngle side projection, the 5-bit fraction interpolation and
    * the mode-10/26 luma boundary filter) written straight into the
    * plane. Reference filtering per 8.4.4.2.3 (planar at nT >= 8;
    * angular by minDistVerHor vs the per-size threshold). */
  private def predictIntra(pic: Pic, x0: Int, y0: Int, nT: Int,
      mode: Int, cIdx: Int = 0): Unit = {
    // chroma (round 16): no reference filtering, no DC boundary
    // smoothing, no mode-10/26 edge filters (8.4.4.2.3/.5/.6 gate all
    // three on cIdx == 0); the geometry is otherwise identical
    val plane = if (cIdx == 0) pic.luma else if (cIdx == 1) pic.cb else pic.cr
    val strideP = if (cIdx == 0) pic.stride else pic.strideC
    val lg = Integer.numberOfTrailingZeros(nT)
    if (mode >= 2) { // angular
      val thresh = nT match {
        case 8 => 7
        case 16 => 1
        case 32 => 0
        case _ => 99 // 4x4: never filtered
      }
      val minDist = math.min(math.abs(mode - 26), math.abs(mode - 10))
      val (corner, left, top) =
        gatherRefs(pic, x0, y0, nT,
          filter = cIdx == 0 && minDist > thresh, cIdx)
      val angle = PredAngle(mode - 2)
      val off = nT + 1 // ref index offset: ref(-nT..2nT)
      val ref = new Array[Int](3 * nT + 2)
      if (mode >= 18) { // main reference = top row
        ref(off) = corner
        var x = 1
        while (x <= 2 * nT) { ref(off + x) = top(x - 1); x += 1 }
        if (angle < 0) {
          val lo = (nT * angle) >> 5
          val inv = InvAngle(mode - 11)
          var k = -1
          while (k >= lo) {
            val j = -1 + ((k * inv + 128) >> 8)
            ref(off + k) = if (j < 0) corner else left(j)
            k -= 1
          }
        }
        var y = 0
        while (y < nT) {
          val iIdx = ((y + 1) * angle) >> 5
          val iFact = ((y + 1) * angle) & 31
          var x2 = 0
          while (x2 < nT) {
            val a = ref(off + x2 + iIdx + 1)
            val v =
              if (iFact == 0) a
              else ((32 - iFact) * a +
                iFact * ref(off + x2 + iIdx + 2) + 16) >> 5
            plane((y0 + y) * strideP + x0 + x2) = v
            x2 += 1
          }
          y += 1
        }
        if (cIdx == 0 && mode == 26 && nT < 32) { // vertical boundary filter
          var y2 = 0
          while (y2 < nT) {
            val v = top(0) + ((left(y2) - corner) >> 1)
            plane((y0 + y2) * strideP + x0) =
              if (v < 0) 0 else if (v > 255) 255 else v
            y2 += 1
          }
        }
      } else { // modes 2..17: main reference = left column
        ref(off) = corner
        var y = 1
        while (y <= 2 * nT) { ref(off + y) = left(y - 1); y += 1 }
        if (angle < 0) {
          val lo = (nT * angle) >> 5
          val inv = InvAngle(mode - 11)
          var k = -1
          while (k >= lo) {
            val j = -1 + ((k * inv + 128) >> 8)
            ref(off + k) = if (j < 0) corner else top(j)
            k -= 1
          }
        }
        var x2 = 0
        while (x2 < nT) {
          val iIdx = ((x2 + 1) * angle) >> 5
          val iFact = ((x2 + 1) * angle) & 31
          var y2 = 0
          while (y2 < nT) {
            val a = ref(off + y2 + iIdx + 1)
            val v =
              if (iFact == 0) a
              else ((32 - iFact) * a +
                iFact * ref(off + y2 + iIdx + 2) + 16) >> 5
            plane((y0 + y2) * strideP + x0 + x2) = v
            y2 += 1
          }
          x2 += 1
        }
        if (cIdx == 0 && mode == 10 && nT < 32) { // horizontal boundary filter
          var x3 = 0
          while (x3 < nT) {
            val v = left(0) + ((top(x3) - corner) >> 1)
            plane(y0 * strideP + x0 + x3) =
              if (v < 0) 0 else if (v > 255) 255 else v
            x3 += 1
          }
        }
      }
      return
    }
    if (mode == 0) { // planar (refs filtered at nT >= 8, luma only)
      val (_, left, top) = gatherRefs(pic, x0, y0, nT,
        filter = cIdx == 0 && nT >= 8, cIdx)
      var y = 0
      while (y < nT) {
        var x = 0
        while (x < nT) {
          plane((y0 + y) * strideP + x0 + x) =
            ((nT - 1 - x) * left(y) + (x + 1) * top(nT) +
              (nT - 1 - y) * top(x) + (y + 1) * left(nT) + nT) >> (lg + 1)
          x += 1
        }
        y += 1
      }
    } else { // DC (never filtered)
      val (_, left, top) = gatherRefs(pic, x0, y0, nT, filter = false, cIdx)
      var s = nT
      var i = 0
      while (i < nT) { s += left(i) + top(i); i += 1 }
      val dc = s >> (lg + 1)
      var y = 0
      while (y < nT) {
        var x = 0
        while (x < nT) {
          plane((y0 + y) * strideP + x0 + x) = dc
          x += 1
        }
        y += 1
      }
      if (cIdx == 0 && nT < 32) { // luma boundary smoothing
        plane(y0 * strideP + x0) =
          (left(0) + 2 * dc + top(0) + 2) >> 2
        var k = 1
        while (k < nT) {
          plane(y0 * strideP + x0 + k) = (top(k) + 3 * dc + 2) >> 2
          plane((y0 + k) * strideP + x0) = (left(k) + 3 * dc + 2) >> 2
          k += 1
        }
      }
    }
  }

  /** Fixture-encoder mirror of [[residualCoding]] (luma): emits one
    * TU's coefficients through the same scans, contexts and
    * adaptation, so encode -> decode is exact by construction. */
  private[graft] def putResidual(enc: H264Cabac.Enc, cx: H264Cabac.Ctx,
      log2Size: Int, scanIdx: Int, coef: Array[Int],
      cIdx: Int = 0): Unit = {
    val luma = cIdx == 0
    val nT = 1 << log2Size
    require(coef.length == nT * nT, "coef raster size")
    val nSb = nT >> 2
    val sbScan = subScan(nSb, scanIdx)
    val posScan = Scan4(scanIdx)
    // locate the last significant coefficient in scan order
    var lastSb = -1
    var lastPos = -1
    var sb = nSb * nSb - 1
    while (sb >= 0 && lastSb < 0) {
      val sbX = sbScan(sb) % nSb
      val sbY = sbScan(sb) / nSb
      var n = 15
      while (n >= 0 && lastSb < 0) {
        val pp = posScan(n)
        val xC = (sbX << 2) + (pp & 3)
        val yC = (sbY << 2) + (pp >> 2)
        if (coef(yC * nT + xC) != 0) { lastSb = sb; lastPos = n }
        n -= 1
      }
      sb -= 1
    }
    require(lastSb >= 0, "putResidual needs a nonzero coefficient")
    val lastSbX = sbScan(lastSb) % nSb
    val lastSbY = sbScan(lastSb) / nSb
    val lp = posScan(lastPos)
    var lastX = (lastSbX << 2) + (lp & 3)
    var lastY = (lastSbY << 2) + (lp >> 2)
    if (scanIdx == 2) { val t = lastX; lastX = lastY; lastY = t }
    val ctxOffset =
      if (luma) 3 * (log2Size - 2) + ((log2Size - 1) >> 2) else 15
    val ctxShift = if (luma) (log2Size + 1) >> 2 else log2Size - 2
    val cMax = (log2Size << 1) - 1
    // 7.3.8.11 order: BOTH prefixes (context-coded), then both
    // bypass suffixes
    def prefixOf(v: Int): Int =
      if (v <= 3) v
      else {
        var nb = 1
        while ((v >> nb) >= 2) nb += 1 // nb = floor(log2 v)
        // group base (2 + (p & 1)) << ((p >> 1) - 1): p = 2*nb for
        // v in [2^nb, 3*2^(nb-1)), p = 2*nb + 1 above
        (nb << 1) + ((v >> (nb - 1)) & 1)
      }
    def putLastPrefix(base: Int, prefix: Int): Unit = {
      var b = 0
      while (b < prefix) {
        enc.decision(cx, base + ctxOffset + (b >> ctxShift), bin = true)
        b += 1
      }
      if (prefix < cMax)
        enc.decision(cx, base + ctxOffset + (prefix >> ctxShift),
          bin = false)
    }
    def putLastSuffix(prefix: Int, v: Int): Unit =
      if (prefix > 3) {
        val nBits = (prefix >> 1) - 1
        val suf = v - ((2 + (prefix & 1)) << nBits)
        var j = nBits - 1
        while (j >= 0) { enc.bypass(((suf >> j) & 1) == 1); j -= 1 }
      }
    val pfxX = prefixOf(lastX)
    val pfxY = prefixOf(lastY)
    putLastPrefix(CtxLastX, pfxX)
    putLastPrefix(CtxLastY, pfxY)
    putLastSuffix(pfxX, lastX)
    putLastSuffix(pfxY, lastY)
    val csbf = new Array[Boolean](nSb * nSb)
    var i = 0
    while (i < nSb * nSb) {
      val sbX = sbScan(i) % nSb
      val sbY = sbScan(i) / nSb
      var any = false
      var n = 0
      while (n < 16) {
        val pp = posScan(n)
        if (coef(((sbY << 2) + (pp >> 2)) * nT + (sbX << 2) + (pp & 3))
          != 0) any = true
        n += 1
      }
      csbf(sbScan(i)) = any || i == 0 || i == lastSb
      i += 1
    }
    var gt1Carry = 1
    sb = lastSb
    while (sb >= 0) {
      val sbPos = sbScan(sb)
      val sbX = sbPos % nSb
      val sbY = sbPos / nSb
      val explicit = sb != lastSb && sb != 0 && nSb > 1
      if (explicit) {
        val right = sbX + 1 < nSb && csbf(sbY * nSb + sbX + 1)
        val below = sbY + 1 < nSb && csbf((sbY + 1) * nSb + sbX)
        enc.decision(cx, CtxCsbf + (if (right || below) 1 else 0) +
          (if (luma) 0 else 2), csbf(sbPos))
      }
      if (csbf(sbPos)) {
        val prevCsbf =
          (if (sbX + 1 < nSb && csbf(sbY * nSb + sbX + 1)) 1 else 0) |
            (if (sbY + 1 < nSb && csbf((sbY + 1) * nSb + sbX)) 2 else 0)
        val sigPos = new Array[Int](16)
        val sigVal = new Array[Int](16)
        var nSig = 0
        def cAt(n: Int): Int = {
          val pp = posScan(n)
          coef(((sbY << 2) + (pp >> 2)) * nT + (sbX << 2) + (pp & 3))
        }
        if (sb == lastSb) {
          sigPos(nSig) = lastPos; sigVal(nSig) = cAt(lastPos); nSig += 1
        }
        var n = if (sb == lastSb) lastPos - 1 else 15
        while (n >= 0) {
          val pp = posScan(n)
          val xB = pp & 3
          val yB = pp >> 2
          val xC = (sbX << 2) + xB
          val yC = (sbY << 2) + yB
          val v = coef(yC * nT + xC)
          val inferDc = n == 0 && explicit && nSig == 0
          if (inferDc) require(v != 0,
            "explicit coded sub-block with only a zero DC is unencodable")
          if (!inferDc) {
            val sigCtx =
              if (log2Size == 2) SigCtx4x4(pp)
              else if (xC == 0 && yC == 0) 0
              else {
                var c0 = prevCsbf match {
                  case 0 =>
                    if (xB + yB == 0) 2 else if (xB + yB < 3) 1 else 0
                  case 1 => if (yB == 0) 2 else if (yB == 1) 1 else 0
                  case 2 => if (xB == 0) 2 else if (xB == 1) 1 else 0
                  case _ => 2
                }
                if (luma && (sbX | sbY) != 0) c0 += 3
                c0 + (if (log2Size == 3) { if (scanIdx == 0) 9 else 15 }
                else if (luma) 21
                else 12)
              }
            enc.decision(cx, CtxSig + (if (luma) 0 else 27) + sigCtx,
              v != 0)
          }
          if (v != 0) { sigPos(nSig) = n; sigVal(nSig) = v; nSig += 1 }
          n -= 1
        }
        if (nSig > 0) {
          val ctxSet0 = (if (sb > 0 && luma) 2 else 0) +
            (if (gt1Carry == 0) 1 else 0)
          var c1 = 1
          var firstG2 = -1
          var k = 0
          val nGt1 = math.min(nSig, 8)
          while (k < nGt1) {
            val g = math.abs(sigVal(k)) > 1
            enc.decision(cx, CtxGt1 + (if (luma) 0 else 16) +
              ctxSet0 * 4 + c1, g)
            if (g) { c1 = 0; if (firstG2 < 0) firstG2 = k }
            else if (c1 > 0 && c1 < 3) c1 += 1
            k += 1
          }
          gt1Carry = c1
          if (firstG2 >= 0)
            enc.decision(cx, CtxGt2 + (if (luma) 0 else 4) + ctxSet0,
              math.abs(sigVal(firstG2)) > 2)
          k = 0
          while (k < nSig) { enc.bypass(sigVal(k) < 0); k += 1 }
          var rice = 0
          k = 0
          while (k < nSig) {
            val a = math.abs(sigVal(k))
            val baseLevel =
              if (k < 8) {
                if (k == firstG2) math.min(a, 3) else math.min(a, 2)
              } else 1
            val flagged =
              if (k < 8) { if (k == firstG2) 3 else 2 } else 1
            if (baseLevel == flagged && a >= flagged) {
              val rem = a - flagged
              // Golomb-Rice with the 4-run escape, mirror of decode
              val q = rem >> rice
              if (q < 4) {
                var b = 0
                while (b < q) { enc.bypass(bin = true); b += 1 }
                enc.bypass(bin = false)
                var j = rice - 1
                while (j >= 0) { enc.bypass(((rem >> j) & 1) == 1); j -= 1 }
              } else {
                // prefix p > 3: rem = ((2^(p-3) + 2) << rice) + suffix
                var pfx = 4
                while (rem >= (((1 << (pfx - 3)) + 3 - 1) << rice) +
                  (1 << (pfx - 3 + rice))) pfx += 1
                var b = 0
                while (b < pfx) { enc.bypass(bin = true); b += 1 }
                enc.bypass(bin = false)
                val nb = pfx - 3 + rice
                val suf = rem - ((((1 << (pfx - 3)) + 3 - 1) << rice))
                require(suf >= 0 && suf < (1 << nb), s"rice escape: $rem")
                var j = nb - 1
                while (j >= 0) { enc.bypass(((suf >> j) & 1) == 1); j -= 1 }
              }
            }
            if (a > (3 << rice) && rice < 4) rice += 1
            k += 1
          }
        }
      }
      sb -= 1
    }
  }

  /** Mode-dependent scan selection (6.5.3 / 7.4.9.11): horizontal
    * for near-vertical modes 22-30, vertical for near-horizontal
    * 6-14, diagonal otherwise; only for 4x4/8x8 luma and 4x4 chroma
    * intra TUs. */
  private def scanIdxOf(log2Size: Int, cIdx: Int, mode: Int): Int =
    if ((cIdx == 0 && log2Size <= 3) || (cIdx > 0 && log2Size == 2)) {
      if (mode >= 6 && mode <= 14) 2
      else if (mode >= 22 && mode <= 30) 1
      else 0
    } else 0

  /** residual_coding (7.3.8.11, round 15): returns the raster
    * coefficient array (nT x nT) or null on a malformed stream. The
    * SAME helper parses chroma blocks (cIdx > 0) for bitstream sync —
    * chroma stays unreconstructed. */
  private[graft] def residualCoding(dec: H264Cabac.Dec, cx: H264Cabac.Ctx,
      log2Size: Int, cIdx: Int, scanIdx: Int): Array[Int] = {
    val nT = 1 << log2Size
    val luma = cIdx == 0
    // last_sig_coeff_{x,y}: TR prefix over size-dependent contexts +
    // FL bypass suffix (9.3.4.2.3)
    val ctxOffset = if (luma) 3 * (log2Size - 2) + ((log2Size - 1) >> 2) else 15
    val ctxShift = if (luma) (log2Size + 1) >> 2 else log2Size - 2
    val cMax = (log2Size << 1) - 1
    def lastPrefix(base: Int): Int = {
      var v = 0
      while (v < cMax &&
        dec.decision(cx, base + ctxOffset + (v >> ctxShift))) v += 1
      v
    }
    def lastVal(prefix: Int): Int =
      if (prefix <= 3) prefix
      else {
        val nBits = (prefix >> 1) - 1
        var suf = 0
        var i = 0
        while (i < nBits) { suf = (suf << 1) | (if (dec.bypass()) 1 else 0); i += 1 }
        ((2 + (prefix & 1)) << nBits) + suf
      }
    val px = lastPrefix(CtxLastX)
    val py = lastPrefix(CtxLastY)
    var lastX = lastVal(px)
    var lastY = lastVal(py)
    if (scanIdx == 2) { val t = lastX; lastX = lastY; lastY = t }
    if (lastX >= nT || lastY >= nT) return null
    val nSb = nT >> 2 // sub-blocks per side
    val sbScan = subScan(nSb, scanIdx)
    val posScan = Scan4(scanIdx)
    // locate the last coefficient's (sub-block scan idx, in-sb idx)
    val lastSbX = lastX >> 2
    val lastSbY = lastY >> 2
    var lastSb = -1
    var i = 0
    while (i < nSb * nSb && lastSb < 0) {
      if (sbScan(i) == lastSbY * nSb + lastSbX) lastSb = i
      i += 1
    }
    var lastPos = -1
    i = 0
    while (i < 16 && lastPos < 0) {
      val p = posScan(i)
      if ((p >> 2) == (lastY & 3) && (p & 3) == (lastX & 3)) lastPos = i
      i += 1
    }
    if (lastSb < 0 || lastPos < 0) return null
    val coef = new Array[Int](nT * nT)
    val csbf = new Array[Boolean](nSb * nSb)
    csbf(lastSbY * nSb + lastSbX) = true
    csbf(0) = true
    // greater1 context-set carry across THIS TU's sub-blocks
    // (9.3.4.2.6: +1 set when the previous sub-block ended c1 == 0)
    var gt1Carry = 1
    var sb = lastSb
    while (sb >= 0) {
      val sbPos = sbScan(sb)
      val sbX = sbPos % nSb
      val sbY = sbPos / nSb
      val explicit = sb != lastSb && sb != 0 && nSb > 1
      val coded =
        if (!explicit) csbf(sbPos)
        else {
          val right = sbX + 1 < nSb && csbf(sbY * nSb + sbX + 1)
          val below = sbY + 1 < nSb && csbf((sbY + 1) * nSb + sbX)
          val inc = (if (right || below) 1 else 0) + (if (luma) 0 else 2)
          val c = dec.decision(cx, CtxCsbf + inc)
          csbf(sbPos) = c
          c
        }
      if (coded) {
        val prevCsbf =
          (if (sbX + 1 < nSb && csbf(sbY * nSb + sbX + 1)) 1 else 0) |
            (if (sbY + 1 < nSb && csbf((sbY + 1) * nSb + sbX)) 2 else 0)
        // significance map (descending scan), last coeff implicit
        val sigPos = new Array[Int](16)
        var nSig = 0
        if (sb == lastSb) { sigPos(nSig) = lastPos; nSig += 1 }
        var n = if (sb == lastSb) lastPos - 1 else 15
        while (n >= 0) {
          val p = posScan(n)
          val xB = p & 3
          val yB = p >> 2
          val xC = (sbX << 2) + xB
          val yC = (sbY << 2) + yB
          val inferDc = n == 0 && explicit && nSig == 0
          val sig =
            if (inferDc) true
            else {
              val sigCtx =
                if (log2Size == 2) SigCtx4x4(p)
                else if (xC == 0 && yC == 0) 0
                else {
                  var c0 = prevCsbf match {
                    case 0 =>
                      if (xB + yB == 0) 2 else if (xB + yB < 3) 1 else 0
                    case 1 => if (yB == 0) 2 else if (yB == 1) 1 else 0
                    case 2 => if (xB == 0) 2 else if (xB == 1) 1 else 0
                    case _ => 2
                  }
                  if (luma && (sbX | sbY) != 0) c0 += 3
                  c0 + (if (log2Size == 3) { if (scanIdx == 0) 9 else 15 }
                  else if (luma) 21
                  else 12)
                }
              dec.decision(cx,
                CtxSig + (if (luma) 0 else 27) + sigCtx)
            }
          if (sig) { sigPos(nSig) = n; nSig += 1 }
          n -= 1
        }
        if (nSig > 0) {
          // greater1 (first 8), greater2 (first gt1), signs, remaining
          val absC = new Array[Int](nSig)
          val ctxSet0 = (if (sb > 0 && luma) 2 else 0) +
            (if (gt1Carry == 0) 1 else 0)
          var c1 = 1
          var firstG2 = -1
          var k = 0
          val nGt1 = math.min(nSig, 8)
          while (k < nGt1) {
            val g = dec.decision(cx,
              CtxGt1 + (if (luma) 0 else 16) + ctxSet0 * 4 + c1)
            if (g) {
              c1 = 0
              if (firstG2 < 0) firstG2 = k
            } else if (c1 > 0 && c1 < 3) c1 += 1
            absC(k) = if (g) 2 else 1
            k += 1
          }
          gt1Carry = c1
          while (k < nSig) { absC(k) = 1; k += 1 }
          if (firstG2 >= 0) {
            if (dec.decision(cx,
              CtxGt2 + (if (luma) 0 else 4) + ctxSet0)) absC(firstG2) += 1
          }
          val neg = new Array[Boolean](nSig)
          k = 0
          while (k < nSig) { neg(k) = dec.bypass(); k += 1 }
          var rice = 0
          k = 0
          while (k < nSig) {
            val baseLevel =
              if (k < 8) { if (k == firstG2) 3 else 2 } else 1
            var lvl = absC(k)
            if (lvl == baseLevel) {
              // coeff_abs_level_remaining: Golomb-Rice + EG escape
              var prefix = 0
              while (prefix < 24 && dec.bypass()) prefix += 1
              if (prefix >= 24) return null
              var rem = 0
              if (prefix <= 3) {
                var b = 0
                while (b < rice) {
                  rem = (rem << 1) | (if (dec.bypass()) 1 else 0)
                  b += 1
                }
                rem += prefix << rice
              } else {
                val nb = prefix - 3 + rice
                if (nb > 24) return null
                var v2 = 0
                var b = 0
                while (b < nb) {
                  v2 = (v2 << 1) | (if (dec.bypass()) 1 else 0)
                  b += 1
                }
                rem = (((1 << (prefix - 3)) + 3 - 1) << rice) + v2
              }
              lvl += rem
            }
            if (lvl > (3 << rice) && rice < 4) rice += 1
            val p = posScan(sigPos(k))
            val xC = (sbX << 2) + (p & 3)
            val yC = (sbY << 2) + (p >> 2)
            coef(yC * nT + xC) = if (neg(k)) -lvl else lvl
            if (lvl > 32767) return null
            k += 1
          }
        }
      }
      sb -= 1
    }
    coef
  }
  /** transform_tree + transform_unit (7.3.8.8/7.3.8.10, round 15,
    * intra 2Nx2N): coded split_transform_flag with the 5-log2 ctx,
    * per-depth cbf_cb/cbf_cr (4x4 leaves inherit the 8x8 parent's;
    * their chroma residual rides blkIdx 3), cbf_luma with the
    * trafoDepth-0 ctx, per-TU intra prediction from RECONSTRUCTED
    * neighbors, luma residual decode + dequant + inverse DST/DCT,
    * chroma residuals parsed for sync (house posture: luma-only
    * reconstruction). */
  private def transformTree(pic: Pic, dec: H264Cabac.Dec,
      cx: H264Cabac.Ctx, x0: Int, y0: Int, log2Size: Int,
      trafoDepth: Int, mode: Int, chromaMode: Int, qp: Int,
      parentCbfCb: Boolean, parentCbfCr: Boolean, blkIdx: Int,
      xBase: Int, yBase: Int, maxDepth: Int): Boolean = {
    val sps = pic.sps
    val forced = log2Size > sps.maxTbLog2
    val split =
      if (forced) true
      else if (log2Size > sps.minTbLog2 && trafoDepth < maxDepth)
        dec.decision(cx, CtxSplitTrafo + (5 - log2Size))
      else false
    var cbfCb = parentCbfCb
    var cbfCr = parentCbfCr
    if (log2Size > 2) {
      if (trafoDepth == 0 || parentCbfCb)
        cbfCb = dec.decision(cx, CtxCbfC + trafoDepth)
      if (trafoDepth == 0 || parentCbfCr)
        cbfCr = dec.decision(cx, CtxCbfC + trafoDepth)
    }
    if (split) {
      val half = 1 << (log2Size - 1)
      var i = 0
      while (i < 4) {
        if (!transformTree(pic, dec, cx, x0 + (i & 1) * half,
          y0 + (i >> 1) * half, log2Size - 1, trafoDepth + 1, mode,
          chromaMode, qp, cbfCb, cbfCr, i, x0, y0, maxDepth))
          return false
        i += 1
      }
      return true
    }
    // ---- transform_unit leaf. mode == -1 (round 16) = an INTER TU:
    // the prediction is already in the planes (MC), cbf_luma is
    // inferred 1 at depth 0 with no chroma cbf (7.3.8.8), and the
    // 4x4 DST-VII stays intra-only (8.6.4).
    val isIntra = mode >= 0
    val cbfLuma =
      if (!isIntra && trafoDepth == 0 && !cbfCb && !cbfCr) true
      else dec.decision(cx,
        CtxCbfLuma + (if (trafoDepth == 0) 1 else 0))
    val nT = 1 << log2Size
    // intra-predict THIS TU now: split trees predict each TU from
    // already-reconstructed neighbors (8.4.4.2.1)
    if (isIntra) {
      predictIntra(pic, x0, y0, nT, mode)
      pic.cellsSet(x0, y0, nT, -1, mode) // availability for later TUs;
      // depth is rewritten at the CU level afterwards
    }
    pic.markEdges(x0, y0, nT) // deblock edge map (round 16)
    if (cbfLuma) {
      var cy2 = y0 >> 2
      while (cy2 < ((y0 + nT) >> 2)) {
        var cx2 = x0 >> 2
        while (cx2 < ((x0 + nT) >> 2)) {
          pic.codedF(cy2 * pic.gw + cx2) = true
          cx2 += 1
        }
        cy2 += 1
      }
      val scan = scanIdxOf(log2Size, 0, mode)
      val coef = residualCoding(dec, cx, log2Size, 0, scan)
      if (coef == null) return false
      val dst = isIntra && log2Size == 2 // intra luma 4x4: DST-VII
      val dq = new Array[Int](nT * nT)
      var k = 0
      while (k < nT * nT) {
        if (coef(k) != 0) dq(k) = dequant(coef(k), qp, log2Size)
        k += 1
      }
      val res = invTransform(dq, nT, dst)
      var y = 0
      while (y < nT) {
        var x = 0
        while (x < nT) {
          val kk = (y0 + y) * pic.stride + x0 + x
          val v = pic.luma(kk) + res(y * nT + x)
          pic.luma(kk) = if (v < 0) 0 else if (v > 255) 255 else v
          x += 1
        }
        y += 1
      }
    }
    // chroma TU (round 16: RECONSTRUCTED, not just parsed): at this
    // leaf when its chroma TU exists (log2 > 2), else on the parent's
    // behalf at blkIdx 3. Prediction runs whether or not residuals
    // are coded; residuals dequant at QPc and inverse-DCT (DST is
    // luma-4x4-intra only, 8.6.4).
    def chromaTu(xC: Int, yC: Int, cl: Int): Boolean = {
      val nC = 1 << cl
      val qc = qpC(qp)
      var comp = 1
      while (comp <= 2) {
        if (isIntra) predictIntra(pic, xC, yC, nC, chromaMode, comp)
        val coded = if (comp == 1) cbfCb else cbfCr
        if (coded) {
          val coef = residualCoding(dec, cx, cl, comp,
            scanIdxOf(cl, comp, chromaMode))
          if (coef == null) return false
          val dq = new Array[Int](nC * nC)
          var k = 0
          while (k < nC * nC) {
            if (coef(k) != 0) dq(k) = dequant(coef(k), qc, cl)
            k += 1
          }
          val res = invTransform(dq, nC, dst = false)
          val plane = if (comp == 1) pic.cb else pic.cr
          var y = 0
          while (y < nC) {
            var x = 0
            while (x < nC) {
              val kk = (yC + y) * pic.strideC + xC + x
              val v = plane(kk) + res(y * nC + x)
              plane(kk) = if (v < 0) 0 else if (v > 255) 255 else v
              x += 1
            }
            y += 1
          }
        }
        comp += 1
      }
      true
    }
    if (log2Size > 2) {
      if (!chromaTu(x0 >> 1, y0 >> 1, log2Size - 1)) return false
    } else if (blkIdx == 3) {
      if (!chromaTu(xBase >> 1, yBase >> 1, 2)) return false
    }
    true
  }

  /** Decode one coding quadtree node; returns false on degrade. */
  private def decodeCqt(pic: Pic, dec: H264Cabac.Dec, cx: H264Cabac.Ctx,
      rbsp: Array[Byte], x0: Int, y0: Int, log2Size: Int,
      depth: Int, qp: Int,
      refPic: Pic = null, maxMerge: Int = 5): Boolean = {
    val sliceP = refPic != null
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
            depth + 1, qp, refPic, maxMerge)) return false
        }
        i += 1
      }
      return true
    }
    // ---- coding unit. P slices (round 16): cu_skip_flag, then
    // pred_mode_flag; inter CUs decode PART_2Nx2N with merge or
    // AMVP+mvd motion, single-list single-reference MC, and an
    // optional inter transform tree behind rqt_root_cbf. Non-2Nx2N
    // inter partitions degrade (starter subset).
    if (sliceP) {
      def skipCond(px: Int, py: Int): Int = {
        if (px < 0 || py < 0) return 0
        val cell = (py >> 2) * pic.gw + (px >> 2)
        if (px < sps.width && py < sps.height && pic.decoded(cell) &&
          pic.skipF(cell)) 1 else 0
      }
      val skipInc = skipCond(x0 - 1, y0) + skipCond(x0, y0 - 1)
      def readMergeIdx(): Int =
        if (maxMerge <= 1) 0
        else if (!dec.decision(cx, CtxMergeIdx)) 0
        else {
          var v = 1
          while (v < maxMerge - 1 && dec.bypass()) v += 1
          v
        }
      def mcCu(mvx: Int, mvy: Int): Unit = {
        mcLuma(refPic, pic, x0, y0, size, size, mvx, mvy)
        mcChroma(refPic.cb, refPic, pic.cb, pic, x0 >> 1, y0 >> 1,
          size >> 1, size >> 1, mvx, mvy)
        mcChroma(refPic.cr, refPic, pic.cr, pic, x0 >> 1, y0 >> 1,
          size >> 1, size >> 1, mvx, mvy)
      }
      if (dec.decision(cx, CtxCuSkip + skipInc)) { // cu_skip_flag
        val idx = readMergeIdx()
        val (mvx, mvy) = mergeList(pic, x0, y0, size, maxMerge)(idx)
        mcCu(mvx, mvy)
        pic.markEdges(x0, y0, size)
        pic.motionSet(x0, y0, size, mvx, mvy, skip = true)
        pic.cellsSet(x0, y0, size, depth, 1) // inter reads as DC
        return true
      }
      if (!dec.decision(cx, CtxPredMode)) { // pred_mode_flag: inter
        // part_mode bin 0: PART_2Nx2N = 1; anything else degrades
        if (!dec.decision(cx, CtxPart)) return false
        var mvx = 0
        var mvy = 0
        if (dec.decision(cx, CtxMergeFlag)) {
          val idx = readMergeIdx()
          val m = mergeList(pic, x0, y0, size, maxMerge)(idx)
          mvx = m._1
          mvy = m._2
        } else {
          // mvd_coding (7.3.8.9; ref_idx absent with one active ref)
          val gr0x = dec.decision(cx, CtxMvdGr0)
          val gr0y = dec.decision(cx, CtxMvdGr0)
          val gr1x = gr0x && dec.decision(cx, CtxMvdGr1)
          val gr1y = gr0y && dec.decision(cx, CtxMvdGr1)
          def readComp(gr0: Boolean, gr1: Boolean): Int = {
            if (!gr0) return 0
            var a = 1
            if (gr1) { // abs_mvd_minus2: order-1 exp-Golomb, bypass
              var k = 1
              var sym = 0
              while (dec.bypass()) {
                sym += 1 << k
                k += 1
                if (k > 24) return Int.MinValue
              }
              var v = 0
              var b = 0
              while (b < k) {
                v = (v << 1) | (if (dec.bypass()) 1 else 0)
                b += 1
              }
              a = 2 + sym + v
            }
            if (dec.bypass()) -a else a
          }
          val adx = readComp(gr0x, gr1x)
          val ady = readComp(gr0y, gr1y)
          if (adx == Int.MinValue || ady == Int.MinValue) return false
          val mvpIdx = if (dec.decision(cx, CtxMvp)) 1 else 0
          val mvp = mvpList(pic, x0, y0, size)(mvpIdx)
          mvx = mvp._1 + adx
          mvy = mvp._2 + ady
          if (mvx < -(1 << 15) || mvx >= (1 << 15) ||
            mvy < -(1 << 15) || mvy >= (1 << 15)) return false
        }
        mcCu(mvx, mvy)
        pic.markEdges(x0, y0, size)
        pic.motionSet(x0, y0, size, mvx, mvy, skip = false)
        pic.cellsSet(x0, y0, size, depth, 1)
        if (dec.decision(cx, CtxRqtRoot)) { // rqt_root_cbf
          if (!transformTree(pic, dec, cx, x0, y0, log2Size, 0,
            -1, -1, qp, parentCbfCb = false, parentCbfCr = false,
            blkIdx = 0, xBase = x0, yBase = y0,
            maxDepth = sps.maxDepthInter)) return false
        }
        return true
      }
      // pred_mode_flag = intra: fall through to the intra CU path
    }
    var partNxN = false
    if (log2Size == sps.minCbLog2) {
      // part_mode: bin 1 = PART_2Nx2N; 0 = NxN (round 15: decodes)
      partNxN = !dec.decision(cx, CtxPart)
    }
    // the NxN luma mode reader, shared with the 2Nx2N path below
    def readMode(cands: Array[Int], prev: Boolean): Int =
      if (prev) {
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
    def chromaModeOf(luma: Int): Int =
      if (!dec.decision(cx, CtxChromaMode)) luma
      else {
        val idx = (if (dec.bypass()) 2 else 0) | (if (dec.bypass()) 1 else 0)
        val m2 = Array(0, 26, 10, 1)(idx)
        if (m2 == luma) 34 else m2
      }
    if (partNxN) {
      // ---- PART_NxN (7.3.8.5, round 15): four PUs at half size; no
      // pcm_flag; all four prev_intra flags first, then the four
      // mode payloads (each PU's candidate list sees the earlier
      // PUs' modes — z-scan availability), one chroma mode (DM = the
      // FIRST PU's mode, 8.4.3 for 4:2:0), and an IntraSplitFlag-
      // forced transform split whose children carry their PU's mode
      // and may split one level deeper (MaxTrafoDepth + 1).
      val half = size >> 1
      val prevFlags = new Array[Boolean](4)
      var j = 0
      while (j < 4) {
        prevFlags(j) = dec.decision(cx, CtxPrevIntra)
        j += 1
      }
      val modes = new Array[Int](4)
      j = 0
      while (j < 4) {
        val px = x0 + (j & 1) * half
        val py = y0 + (j >> 1) * half
        val m = readMode(candList(pic, px, py), prevFlags(j))
        if (m < 0 || m > 34) return false
        modes(j) = m
        // mark mode cells now for the NEXT PU's candidates; the
        // pixel `decoded` state is only read through gatherRefs,
        // whose left/top windows never touch a LATER z-order TU of
        // this CU
        pic.cellsSet(px, py, half, depth, m)
        j += 1
      }
      val cmN = chromaModeOf(modes(0))
      var cbfCbN = false
      var cbfCrN = false
      if (log2Size > 2) {
        cbfCbN = dec.decision(cx, CtxCbfC)
        cbfCrN = dec.decision(cx, CtxCbfC)
      }
      j = 0
      while (j < 4) {
        if (!transformTree(pic, dec, cx, x0 + (j & 1) * half,
          y0 + (j >> 1) * half, log2Size - 1, 1, modes(j), cmN, qp,
          cbfCbN, cbfCrN, j, x0, y0,
          maxDepth = sps.maxDepthIntra + 1)) return false
        j += 1
      }
      // restore the CU depth the transform leaves overwrote with -1
      // (split_cu contexts of later CUs read it), keeping per-PU modes
      j = 0
      while (j < 4) {
        pic.cellsSet(x0 + (j & 1) * half, y0 + (j >> 1) * half, half,
          depth, modes(j))
        j += 1
      }
      return true
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
      // pcm_sample_chroma (round 16): all Cb then all Cr (7.3.8.7)
      val sc = size >> 1
      val xC = x0 >> 1
      val yC = y0 >> 1
      var cy = 0
      while (cy < sc) {
        var cx0 = 0
        while (cx0 < sc) {
          pic.cb((yC + cy) * pic.strideC + xC + cx0) =
            rbsp(byteStart + lumaBytes + cy * sc + cx0) & 0xFF
          pic.cr((yC + cy) * pic.strideC + xC + cx0) =
            rbsp(byteStart + lumaBytes + sc * sc + cy * sc + cx0) & 0xFF
          cx0 += 1
        }
        cy += 1
      }
      pic.markEdges(x0, y0, size) // deblock edge map (round 16)
      pic.hasPcm = true
      pic.cellsSet(x0, y0, size, depth, 1) // PCM neighbors read as DC
      return dec.reinit((byteStart + lumaBytes + chromaBytes) * 8)
    }
    // prev_intra_luma_pred_flag + mpm_idx / rem_intra (one PU), then
    // intra_chroma_pred_mode ('0' = DM; '1' + 2 bypass bins index
    // {planar, vertical, horizontal, DC} with the 34-substitution).
    // Chroma stays unreconstructed — the mode drives the scans.
    val prevF = dec.decision(cx, CtxPrevIntra)
    val mode = readMode(candList(pic, x0, y0), prevF)
    if (mode < 0 || mode > 34) return false
    val chromaMode = chromaModeOf(mode)
    if (!transformTree(pic, dec, cx, x0, y0, log2Size, 0, mode,
      chromaMode, qp, parentCbfCb = false, parentCbfCr = false,
      blkIdx = 0, xBase = x0, yBase = y0,
      maxDepth = sps.maxDepthIntra)) return false
    pic.cellsSet(x0, y0, size, depth, mode)
    true
  }

  /** Decode the first IDR picture of an Annex-B HEVC stream:
    * (width, height, luma) or None-degrade. */
  def decodeIFrameLuma(es: Array[Byte]): Option[(Int, Int, Array[Int])] =
    decodeFramesLuma(es, 1).headOption

  /** YUV form (round 16): (width, height, luma, cb, cr) per frame,
    * chroma at half resolution, all planes conformance-cropped. */
  def decodeFramesYuv(es: Array[Byte], maxFrames: Int
      ): Seq[(Int, Int, Array[Int], Array[Int], Array[Int])] =
    decodeFramesYuvNals(splitAnnexB(es), maxFrames)

  /** Decode up to `maxFrames` IDR pictures (intra starter: every
    * picture is independent; non-IDR slices stop the walk). */
  def decodeFramesLuma(es: Array[Byte],
      maxFrames: Int): Seq[(Int, Int, Array[Int])] =
    decodeFramesLumaNals(splitAnnexB(es), maxFrames)

  /** NAL-list form of [[decodeFramesLuma]] (hvcC / length-prefixed
    * callers, round 14). */
  def decodeFramesLumaNals(nals: Seq[Array[Byte]],
      maxFrames: Int): Seq[(Int, Int, Array[Int])] =
    decodeFramesYuvNals(nals, maxFrames).map(f => (f._1, f._2, f._3))

  private def decodeFramesYuvNals(nals: Seq[Array[Byte]],
      maxFrames: Int
      ): Seq[(Int, Int, Array[Int], Array[Int], Array[Int])] = {
    val frames = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Int, Array[Int], Array[Int], Array[Int])]
    if (maxFrames <= 0) return frames.toSeq
    try {
      var sps: HSps = null
      var pps: HPps = null
      var prevPoc = 0
      var prevPic: Pic = null
      def emit(pic: Pic): Unit = frames += cropYuv(pic)
      nals.filter(_.length >= 2).foreach { nal =>
        if (frames.size >= maxFrames) return frames.toSeq
        if ((nal(0) & 0x80) == 0) {
          val typ = (nal(0) >> 1) & 0x3F
          typ match {
            case 33 => sps = parseSps(unescape(nal, 2))
            case 34 => pps = parsePps(unescape(nal, 2))
            case 19 | 20 => // IDR_W_RADL / IDR_N_LP
              if (sps == null || pps == null) return frames.toSeq
              decodeSlice(unescape(nal, 2), sps, pps, isIdr = true,
                prevPoc = 0, prevPic = null) match {
                case Some((poc, pic)) =>
                  prevPoc = poc
                  prevPic = pic
                  emit(pic)
                case None => return frames.toSeq
              }
            case 0 | 1 => // TRAIL_N / TRAIL_R: P slice (round 16)
              if (sps == null || pps == null || prevPic == null)
                return frames.toSeq
              decodeSlice(unescape(nal, 2), sps, pps, isIdr = false,
                prevPoc = prevPoc, prevPic = prevPic) match {
                case Some((poc, pic)) =>
                  prevPoc = poc
                  prevPic = pic
                  emit(pic)
                case None => return frames.toSeq
              }
            case 32 | 35 | 39 | 40 => () // VPS / AUD / SEI: skip
            case t if t < 32 => return frames.toSeq // other slices
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

  // ---------------------------------------------- inter prediction (P)

  /** 8-tap luma DCT-IF per quarter-pel phase (8.5.4.2.2.1). */
  private val LumaFilt: Array[Array[Int]] = Array(
    Array(0, 0, 0, 64, 0, 0, 0, 0),
    Array(-1, 4, -10, 58, 17, -5, 1, 0),
    Array(-1, 4, -11, 40, 40, -11, 4, -1),
    Array(0, 1, -5, 17, 58, -10, 4, -1))

  /** 4-tap chroma filters per eighth-pel phase (8.5.4.2.2.2). */
  private val ChromaFilt: Array[Array[Int]] = Array(
    Array(0, 64, 0, 0), Array(-2, 58, 10, -2), Array(-4, 54, 16, -2),
    Array(-6, 46, 28, -4), Array(-4, 36, 36, -4), Array(-4, 28, 46, -6),
    Array(-2, 16, 54, -4), Array(-2, 10, 58, -2))

  /** Quarter-pel luma MC of a w x h rect from `ref` into `dst` at
    * (x0, y0): separable 8-tap chain with the 14-bit intermediate
    * (shift1 = 0 at 8-bit, shift2 = 6) and the default uni-pred
    * rounding (pred + 32) >> 6. Out-of-picture fetches clamp. */
  private def mcLuma(ref: Pic, dst: Pic, x0: Int, y0: Int, w: Int,
      h: Int, mvx: Int, mvy: Int): Unit = {
    val xi = x0 + (mvx >> 2)
    val yi = y0 + (mvy >> 2)
    val fx = mvx & 3
    val fy = mvy & 3
    val fw = ref.sps.width
    val fh = ref.sps.height
    def sm(x: Int, y: Int): Int = {
      val cx = if (x < 0) 0 else if (x >= fw) fw - 1 else x
      val cy = if (y < 0) 0 else if (y >= fh) fh - 1 else y
      ref.luma(cy * ref.stride + cx)
    }
    if (fx == 0 && fy == 0) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          dst.luma((y0 + y) * dst.stride + x0 + x) = sm(xi + x, yi + y)
          x += 1
        }
        y += 1
      }
    } else if (fy == 0) {
      val f = LumaFilt(fx)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var acc = 0
          var i = 0
          while (i < 8) { acc += f(i) * sm(xi + x + i - 3, yi + y); i += 1 }
          dst.luma((y0 + y) * dst.stride + x0 + x) = clip255((acc + 32) >> 6)
          x += 1
        }
        y += 1
      }
    } else if (fx == 0) {
      val f = LumaFilt(fy)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var acc = 0
          var j = 0
          while (j < 8) { acc += f(j) * sm(xi + x, yi + y + j - 3); j += 1 }
          dst.luma((y0 + y) * dst.stride + x0 + x) = clip255((acc + 32) >> 6)
          x += 1
        }
        y += 1
      }
    } else {
      val fh2 = LumaFilt(fx)
      val fv = LumaFilt(fy)
      val tmp = new Array[Int]((h + 7) * w)
      var ty = 0
      while (ty < h + 7) {
        var x = 0
        while (x < w) {
          var acc = 0
          var i = 0
          while (i < 8) { acc += fh2(i) * sm(xi + x + i - 3, yi + ty - 3); i += 1 }
          tmp(ty * w + x) = acc
          x += 1
        }
        ty += 1
      }
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var acc = 0
          var j = 0
          while (j < 8) { acc += fv(j) * tmp((y + j) * w + x); j += 1 }
          dst.luma((y0 + y) * dst.stride + x0 + x) =
            clip255(((acc >> 6) + 32) >> 6)
          x += 1
        }
        y += 1
      }
    }
  }

  /** Eighth-pel 4-tap chroma MC of one component (same shift
    * structure as [[mcLuma]]); (xC, yC) in chroma units, luma MV. */
  private def mcChroma(refP: Array[Int], refPic: Pic, dstP: Array[Int],
      dst: Pic, xC: Int, yC: Int, wC: Int, hC: Int, mvx: Int,
      mvy: Int): Unit = {
    val xi = xC + (mvx >> 3)
    val yi = yC + (mvy >> 3)
    val fx = mvx & 7
    val fy = mvy & 7
    val cw = refPic.sps.width >> 1
    val ch = refPic.sps.height >> 1
    def sm(x: Int, y: Int): Int = {
      val cx = if (x < 0) 0 else if (x >= cw) cw - 1 else x
      val cy = if (y < 0) 0 else if (y >= ch) ch - 1 else y
      refP(cy * refPic.strideC + cx)
    }
    if (fx == 0 && fy == 0) {
      var y = 0
      while (y < hC) {
        var x = 0
        while (x < wC) {
          dstP((yC + y) * dst.strideC + xC + x) = sm(xi + x, yi + y)
          x += 1
        }
        y += 1
      }
    } else {
      val tmp = new Array[Int]((hC + 3) * wC)
      val fh2 = ChromaFilt(fx)
      var ty = 0
      while (ty < hC + 3) {
        var x = 0
        while (x < wC) {
          var acc = 0
          var i = 0
          while (i < 4) { acc += fh2(i) * sm(xi + x + i - 1, yi + ty - 1); i += 1 }
          tmp(ty * wC + x) = acc
          x += 1
        }
        ty += 1
      }
      val fv = ChromaFilt(fy)
      var y = 0
      while (y < hC) {
        var x = 0
        while (x < wC) {
          var acc = 0
          var j = 0
          while (j < 4) { acc += fv(j) * tmp((y + j) * wC + x); j += 1 }
          dstP((yC + y) * dst.strideC + xC + x) =
            clip255(((acc >> 6) + 32) >> 6)
          x += 1
        }
        y += 1
      }
    }
  }

  /** Motion of the 4x4 cell covering luma sample (px, py), when that
    * cell is decoded and inter (shared by merge and AMVP). */
  private def motAt(pic: Pic, px: Int, py: Int): Option[(Int, Int)] =
    if (px < 0 || py < 0 || px >= pic.sps.width || py >= pic.sps.height)
      None
    else {
      val cell = (py >> 2) * pic.gw + (px >> 2)
      if (pic.decoded(cell) && pic.interF(cell))
        Some((pic.mvXg(cell), pic.mvYg(cell)))
      else None
    }

  /** Spatial merge candidate list (8.5.3.2.2-.2.6; single list, one
    * reference, PART_2Nx2N): A1 B1 B0 A0 (+B2 when < 4 so far),
    * pairwise pruned, zero-padded to `maxCand`. Shared verbatim by
    * the decoder and the fixture encoder. */
  private def mergeList(pic: Pic, x0: Int, y0: Int, nCbS: Int,
      maxCand: Int): IndexedSeq[(Int, Int)] = {
    val a1 = motAt(pic, x0 - 1, y0 + nCbS - 1)
    val b1 = motAt(pic, x0 + nCbS - 1, y0 - 1)
    val b0 = motAt(pic, x0 + nCbS, y0 - 1)
    val a0 = motAt(pic, x0 - 1, y0 + nCbS)
    val b2 = motAt(pic, x0 - 1, y0 - 1)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    a1.foreach(out += _)
    b1.foreach(m => if (!a1.contains(m)) out += m)
    b0.foreach(m => if (!b1.contains(m)) out += m)
    a0.foreach(m => if (!a1.contains(m)) out += m)
    if (out.length < 4)
      b2.foreach(m => if (!a1.contains(m) && !b1.contains(m)) out += m)
    while (out.length < maxCand) out += ((0, 0))
    out.take(maxCand).toIndexedSeq
  }

  /** AMVP predictor pair (8.5.3.2.8; single same-ref list, no
    * scaling): first inter of (A0, A1), first inter of (B0, B1, B2),
    * deduped, zero-padded to 2. */
  private def mvpList(pic: Pic, x0: Int, y0: Int,
      nCbS: Int): IndexedSeq[(Int, Int)] = {
    val candA = motAt(pic, x0 - 1, y0 + nCbS)
      .orElse(motAt(pic, x0 - 1, y0 + nCbS - 1))
    val candB = motAt(pic, x0 + nCbS, y0 - 1)
      .orElse(motAt(pic, x0 + nCbS - 1, y0 - 1))
      .orElse(motAt(pic, x0 - 1, y0 - 1))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    candA.foreach(out += _)
    candB.foreach(m => if (!candA.contains(m)) out += m)
    while (out.length < 2) out += ((0, 0))
    out.take(2).toIndexedSeq
  }

  // ------------------------------------------------- deblocking (8.7.2)

  /** Table 8-12 beta' (Q 0-51). */
  private val BetaT: Array[Int] = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 20, 22, 24,
    26, 28, 30, 32, 34, 36, 38, 40, 42, 44, 46, 48, 50, 52, 54, 56,
    58, 60, 62, 64)

  /** Table 8-12 tc' (Q 0-53). */
  private val TcT: Array[Int] = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4,
    4, 4, 5, 5, 6, 6, 7, 8, 9, 10, 11, 13, 14, 16, 18, 20, 22, 24)

  private def clip3(lo: Int, hi: Int, v: Int): Int =
    if (v < lo) lo else if (v > hi) hi else v
  private def clip255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  /** In-loop deblocking over one decoded INTRA picture (8.7.2):
    * every marked TU/CU boundary on the 8-sample grid carries bS 2
    * (both sides intra), so beta/tc are picture constants (constant
    * slice QP, cu_qp_delta outside the subset). All vertical edges
    * filter first, then all horizontal edges over the vertically
    * filtered samples; chroma edges live on the 16-luma-sample grid
    * and run the p0/q0-only 8.7.2.5.5 filter at QPc. */
  private def deblockPicture(pic: Pic, qp: Int, betaOff: Int,
      tcOff: Int): Unit = {
    val sps = pic.sps
    val beta = BetaT(clip3(0, 51, qp + betaOff))
    val tcOf = Array( // per-bS tc (8.7.2.5.3): Q = qp + 2(bS-1)
      0, TcT(clip3(0, 53, qp + tcOff)),
      TcT(clip3(0, 53, qp + 2 + tcOff)))
    val qcQ = clip3(0, 53, qpC(qp) + 2 + tcOff)
    val tcC = TcT(qcQ)
    val stride = pic.stride
    val luma = pic.luma
    // round 16 (P pictures): per-edge boundary strength — 2 when
    // either side is intra, 1 on coded coefficients or a >= 1-sample
    // MV delta, else 0 (8.7.2.4; single list, one reference)
    def bsAt(cellP: Int, cellQ: Int): Int =
      if (!pic.interF(cellP) || !pic.interF(cellQ)) 2
      else if (pic.codedF(cellP) || pic.codedF(cellQ)) 1
      else {
        val dx = pic.mvXg(cellP) - pic.mvXg(cellQ)
        val dy = pic.mvYg(cellP) - pic.mvYg(cellQ)
        if (dx <= -4 || dx >= 4 || dy <= -4 || dy >= 4) 1 else 0
      }
    def filterLumaSeg(pos0: Int, step: Int, line: Int, tc: Int): Unit = {
      // pos0 = q0 of segment line 0; p side at pos - step
      def p(i: Int, l: Int) = luma(pos0 + l * line - (i + 1) * step)
      def q(i: Int, l: Int) = luma(pos0 + l * line + i * step)
      def set(off: Int, l: Int, v: Int): Unit =
        luma(pos0 + l * line + off * step) = v
      val dp0 = math.abs(p(2, 0) - 2 * p(1, 0) + p(0, 0))
      val dp3 = math.abs(p(2, 3) - 2 * p(1, 3) + p(0, 3))
      val dq0 = math.abs(q(2, 0) - 2 * q(1, 0) + q(0, 0))
      val dq3 = math.abs(q(2, 3) - 2 * q(1, 3) + q(0, 3))
      if (dp0 + dp3 + dq0 + dq3 >= beta) return
      def strongLine(l: Int): Boolean =
        2 * ((if (l == 0) dp0 + dq0 else dp3 + dq3)) < (beta >> 2) &&
          math.abs(p(3, l) - p(0, l)) + math.abs(q(0, l) - q(3, l)) <
            (beta >> 3) &&
          math.abs(p(0, l) - q(0, l)) < ((5 * tc + 1) >> 1)
      if (strongLine(0) && strongLine(3)) {
        var l = 0
        while (l < 4) {
          val (p3, p2, p1, p0) = (p(3, l), p(2, l), p(1, l), p(0, l))
          val (q0, q1, q2, q3) = (q(0, l), q(1, l), q(2, l), q(3, l))
          set(-1, l, clip3(p0 - 2 * tc, p0 + 2 * tc,
            (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3))
          set(-2, l, clip3(p1 - 2 * tc, p1 + 2 * tc,
            (p2 + p1 + p0 + q0 + 2) >> 2))
          set(-3, l, clip3(p2 - 2 * tc, p2 + 2 * tc,
            (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3))
          set(0, l, clip3(q0 - 2 * tc, q0 + 2 * tc,
            (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3))
          set(1, l, clip3(q1 - 2 * tc, q1 + 2 * tc,
            (q2 + q1 + q0 + p0 + 2) >> 2))
          set(2, l, clip3(q2 - 2 * tc, q2 + 2 * tc,
            (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3))
          l += 1
        }
      } else {
        val dEp1 = dp0 + dp3 < ((beta + (beta >> 1)) >> 3)
        val dEq1 = dq0 + dq3 < ((beta + (beta >> 1)) >> 3)
        var l = 0
        while (l < 4) {
          val (p2, p1, p0) = (p(2, l), p(1, l), p(0, l))
          val (q0, q1, q2) = (q(0, l), q(1, l), q(2, l))
          var d = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
          if (math.abs(d) < tc * 10) {
            d = clip3(-tc, tc, d)
            set(-1, l, clip255(p0 + d))
            set(0, l, clip255(q0 - d))
            if (dEp1) {
              val dp = clip3(-(tc >> 1), tc >> 1,
                (((p2 + p0 + 1) >> 1) - p1 + d) >> 1)
              set(-2, l, clip255(p1 + dp))
            }
            if (dEq1) {
              val dq = clip3(-(tc >> 1), tc >> 1,
                (((q2 + q0 + 1) >> 1) - q1 - d) >> 1)
              set(1, l, clip255(q1 + dq))
            }
          }
          l += 1
        }
      }
    }
    def filterChromaSeg(plane: Array[Int], pos0: Int, step: Int,
        line: Int, lines: Int): Unit = {
      if (tcC == 0) return
      var l = 0
      while (l < lines) {
        val p1 = plane(pos0 + l * line - 2 * step)
        val p0 = plane(pos0 + l * line - step)
        val q0 = plane(pos0 + l * line)
        val q1 = plane(pos0 + l * line + step)
        val d = clip3(-tcC, tcC,
          ((((q0 - p0) << 2) + p1 - q1 + 4) >> 3))
        plane(pos0 + l * line - step) = clip255(p0 + d)
        plane(pos0 + l * line) = clip255(q0 - d)
        l += 1
      }
    }
    if (beta == 0) return
    val gw = pic.gw
    // vertical luma edges (whole picture), then horizontal
    var vert = 0
    while (vert < 2) {
      var y4 = 0
      while (y4 < (sps.height >> 2)) {
        var x4 = 0
        while (x4 < (sps.width >> 2)) {
          val marked = if (vert == 0) pic.vE(y4 * gw + x4)
            else pic.hE(y4 * gw + x4)
          if (marked) {
            val cellQ = y4 * gw + x4
            val cellP = if (vert == 0) cellQ - 1 else cellQ - gw
            val bs = bsAt(cellP, cellQ)
            if (bs > 0) {
              val pos0 = (y4 * 4) * stride + x4 * 4
              filterLumaSeg(pos0,
                if (vert == 0) 1 else stride,
                if (vert == 0) stride else 1, tcOf(bs))
            }
          }
          x4 += 1
        }
        y4 += 1
      }
      vert += 1
    }
    // chroma edges on the 16-luma grid: cell (x4, y4) marked AND the
    // edge coordinate is a multiple of 16; two chroma lines per cell
    vert = 0
    while (vert < 2) {
      var y4 = 0
      while (y4 < (sps.height >> 2)) {
        var x4 = 0
        while (x4 < (sps.width >> 2)) {
          val markedE = if (vert == 0) pic.vE(y4 * gw + x4) && (x4 & 3) == 0
            else pic.hE(y4 * gw + x4) && (y4 & 3) == 0
          val marked = markedE && {
            val cellQ = y4 * gw + x4
            val cellP = if (vert == 0) cellQ - 1 else cellQ - gw
            bsAt(cellP, cellQ) == 2 // chroma: intra edges only
          }
          if (marked) {
            val cx = x4 * 2
            val cy = y4 * 2
            val pos0 = cy * pic.strideC + cx
            Seq(pic.cb, pic.cr).foreach { plane =>
              filterChromaSeg(plane, pos0,
                if (vert == 0) 1 else pic.strideC,
                if (vert == 0) pic.strideC else 1, 2)
            }
          }
          x4 += 1
        }
        y4 += 1
      }
      vert += 1
    }
  }

  // ------------------------------------------------------- SAO (8.7.3)

  /** Parse one CTB's sao() (7.3.8.3) into pic.sao*. `saoL`/`saoC`
    * are the slice-header component switches. Returns false on a
    * malformed payload. */
  private def parseSao(pic: Pic, dec: H264Cabac.Dec, cx: H264Cabac.Ctx,
      ctu: Int, saoL: Boolean, saoC: Boolean): Boolean = {
    val ctbW = pic.ctbW
    val rx = ctu % ctbW
    val ry = ctu / ctbW
    def copyFrom(src: Int): Unit = {
      var c = 0
      while (c < 3) {
        pic.saoType(ctu)(c) = pic.saoType(src)(c)
        pic.saoArg(ctu)(c) = pic.saoArg(src)(c)
        System.arraycopy(pic.saoOff(src)(c), 0, pic.saoOff(ctu)(c), 0, 4)
        c += 1
      }
    }
    if (rx > 0 && dec.decision(cx, CtxSaoMerge)) {
      copyFrom(ctu - 1); return true
    }
    if (ry > 0 && dec.decision(cx, CtxSaoMerge)) {
      copyFrom(ctu - ctbW); return true
    }
    var c = 0
    while (c < 3) {
      val on = if (c == 0) saoL else saoC
      if (!on) { pic.saoType(ctu)(c) = 0 }
      else if (c == 2) {
        // Cr inherits Cb's type and EO class; offsets are its own
        pic.saoType(ctu)(2) = pic.saoType(ctu)(1)
        pic.saoArg(ctu)(2) = pic.saoArg(ctu)(1)
      } else {
        // sao_type_idx: one context bin then a bypass bin (TR cMax 2)
        val t =
          if (!dec.decision(cx, CtxSaoType)) 0
          else if (dec.bypass()) 2
          else 1
        pic.saoType(ctu)(c) = t
      }
      val t = pic.saoType(ctu)(c)
      if (on && t != 0) {
        val abs = new Array[Int](4)
        var i = 0
        while (i < 4) { // sao_offset_abs: TR bypass, cMax 7 (8-bit)
          var v = 0
          while (v < 7 && dec.bypass()) v += 1
          abs(i) = v
          i += 1
        }
        if (t == 1) { // band: signs + position
          i = 0
          while (i < 4) {
            pic.saoOff(ctu)(c)(i) =
              if (abs(i) != 0 && dec.bypass()) -abs(i) else abs(i)
            i += 1
          }
          var bp = 0
          i = 0
          while (i < 5) { bp = (bp << 1) | (if (dec.bypass()) 1 else 0); i += 1 }
          pic.saoArg(ctu)(c) = bp
        } else { // edge: first two positive, last two negative
          pic.saoOff(ctu)(c)(0) = abs(0)
          pic.saoOff(ctu)(c)(1) = abs(1)
          pic.saoOff(ctu)(c)(2) = -abs(2)
          pic.saoOff(ctu)(c)(3) = -abs(3)
          if (c < 2) { // sao_eo_class: 2 bypass bits (Cr inherits)
            val cls = ((if (dec.bypass()) 1 else 0) << 1) |
              (if (dec.bypass()) 1 else 0)
            pic.saoArg(ctu)(c) = cls
          }
        }
      }
      c += 1
    }
    true
  }

  /** Apply SAO (8.7.3.1) over the deblocked picture: band offsets by
    * 5-bit band index window; edge offsets by the 2-neighbor sign
    * pattern along the EO class, reading PRE-SAO samples (a plane
    * copy) and skipping samples whose neighbor leaves the picture. */
  private def applySao(pic: Pic): Unit = {
    val sps = pic.sps
    val planes = Seq(
      (0, pic.luma, pic.stride, sps.width, sps.height),
      (1, pic.cb, pic.strideC, sps.width >> 1, sps.height >> 1),
      (2, pic.cr, pic.strideC, sps.width >> 1, sps.height >> 1))
    planes.foreach { case (cIdx, plane, stride, w, h) =>
      val src = plane.clone()
      val sh = if (cIdx == 0) 0 else 1
      val ctbSize = (1 << sps.ctbLog2) >> sh
      var ctu = 0
      while (ctu < pic.ctbW * pic.ctbH) {
        val t = pic.saoType(ctu)(cIdx)
        if (t != 0) {
          val off = pic.saoOff(ctu)(cIdx)
          val x0 = (ctu % pic.ctbW) * ctbSize
          val y0 = (ctu / pic.ctbW) * ctbSize
          val x1 = math.min(x0 + ctbSize, w)
          val y1 = math.min(y0 + ctbSize, h)
          if (t == 1) { // band
            val bp = pic.saoArg(ctu)(cIdx)
            val bandOf = new Array[Int](32)
            var k = 0
            while (k < 4) { bandOf((bp + k) & 31) = off(k); k += 1 }
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val v = src(y * stride + x)
                val o = bandOf(v >> 3)
                if (o != 0) plane(y * stride + x) = clip255(v + o)
                x += 1
              }
              y += 1
            }
          } else { // edge
            val (dx, dy) = pic.saoArg(ctu)(cIdx) match {
              case 0 => (1, 0)
              case 1 => (0, 1)
              case 2 => (1, 1)
              case _ => (1, -1)
            }
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val xa = x - dx; val ya = y - dy
                val xb = x + dx; val yb = y + dy
                if (xa >= 0 && xb >= 0 && xa < w && xb < w &&
                  ya >= 0 && yb >= 0 && ya < h && yb < h) {
                  val c0 = src(y * stride + x)
                  val a = src(ya * stride + xa)
                  val b = src(yb * stride + xb)
                  val idx = 2 + Integer.signum(c0 - a) +
                    Integer.signum(c0 - b)
                  if (idx != 2) {
                    val o = off(if (idx < 2) idx else idx - 1)
                    if (o != 0) plane(y * stride + x) = clip255(c0 + o)
                  }
                }
                x += 1
              }
              y += 1
            }
          }
        }
        ctu += 1
      }
    }
  }

  private def decodeSlice(rbsp: Array[Byte], sps: HSps, pps: HPps,
      isIdr: Boolean, prevPoc: Int,
      prevPic: Pic): Option[(Int, Pic)] = {
    try {
      val br = new BitReader(rbsp)
      if (br.bit() != 1) return None // first_slice_segment_in_pic
      if (isIdr) br.bit() // no_output_of_prior_pics (IRAP only)
      if (br.ue() != pps.id) return None // slice_pic_parameter_set_id
      val sliceType = br.ue()
      var poc = 0
      var maxMerge = 5
      if (isIdr) {
        if (sliceType != 2) return None // IDR: I only
      } else {
        // round 16 (P slices): POC lsb + a slice-header short-term
        // RPS naming exactly the previous picture; B and multi-ref
        // shapes degrade (starter subset)
        if (sliceType != 1) return None
        poc = br.bits(sps.log2MaxPoc) // lsb == poc (no wrap handling:
        // a wrap fails the RPS delta check below and degrades)
        if (br.bit() != 0) return None // short_term_ref_pic_set_sps
        val numNeg = br.ue()
        val numPos = br.ue()
        if (numNeg != 1 || numPos != 0) return None
        val deltaPoc = br.ue() + 1 // delta_poc_s0_minus1
        if (br.bit() != 1) return None // used_by_curr_pic_s0
        if (prevPic == null || prevPoc != poc - deltaPoc) return None
        if (sps.tmvp && br.bit() == 1) return None // slice TMVP: out
        // of the subset (collocated syntax would follow)
      }
      // round 16: SAO slice switches (7.3.6.1)
      var saoL = false
      var saoC = false
      if (sps.saoOn) {
        saoL = br.bit() == 1
        saoC = br.bit() == 1
      }
      if (!isIdr) {
        // num_ref_idx_active_override (one active L0 ref only)
        val active =
          if (br.bit() == 1) br.ue() + 1
          else pps.numRefL0Def
        if (active != 1) return None
        // pps lists_modification is refused; NumPocTotalCurr == 1
        // keeps the modification block absent regardless (7.3.6.1)
        // cabac_init_flag absent (pps cabac_init_present refused)
        maxMerge = 5 - br.ue() // five_minus_max_num_merge_cand
        if (maxMerge < 1 || maxMerge > 5) return None
      }
      val qp = pps.initQp + br.se()
      if (qp < 0 || qp > 51) return None
      // round 16: with in-loop filtering active and
      // loop_filter_across enabled the header carries one more flag
      // (7.3.6.1; value irrelevant in a single-slice picture). No
      // tiles/wpp -> then byte_alignment: a one bit then zeros.
      if (pps.acrossSlices && (pps.deblockOn || saoL || saoC)) br.bit()
      if (br.bit() != 1) return None // alignment_bit_equal_to_one
      while ((br.pos & 7) != 0) if (br.bit() != 0) return None
      val pic = new Pic(sps)
      val cx = new H264Cabac.Ctx(qp,
        if (isIdr) InitPairs else InitPairsP)
      val dec = new H264Cabac.Dec(rbsp, br.pos)
      if (!dec.valid) return None
      val nCtbs = pic.ctbW * pic.ctbH
      if (saoL || saoC) {
        pic.saoType = Array.fill(nCtbs)(new Array[Int](3))
        pic.saoOff = Array.fill(nCtbs, 3)(new Array[Int](4))
        pic.saoArg = Array.fill(nCtbs)(new Array[Int](3))
      }
      var ctu = 0
      var end = false
      while (ctu < nCtbs && !end) {
        val x0 = (ctu % pic.ctbW) << sps.ctbLog2
        val y0 = (ctu / pic.ctbW) << sps.ctbLog2
        if ((saoL || saoC) &&
          !parseSao(pic, dec, cx, ctu, saoL, saoC)) return None
        if (!decodeCqt(pic, dec, cx, rbsp, x0, y0, sps.ctbLog2, 0, qp,
          refPic = if (isIdr) null else prevPic,
          maxMerge = maxMerge)) return None
        ctu += 1
        end = dec.terminate() // end_of_slice_segment_flag
        if (!end && ctu >= nCtbs) return None
      }
      if (ctu < nCtbs) return None // slice ended early: partial picture
      if (dec.overrun > 0) return None // phantom-bit guard
      // round 16: the in-loop deblocking filter (8.7.2). PCM CUs
      // under pcm_loop_filter_disabled would need per-CU sample
      // exemption — outside the subset, degrade.
      if (pps.deblockOn) {
        if (sps.pcmLfOff && pic.hasPcm) return None
        deblockPicture(pic, qp, pps.betaOff, pps.tcOff)
      }
      // round 16: SAO over the deblocked picture (8.7.3); PCM CUs
      // under pcm_loop_filter_disabled would be exempt — same fence
      if (saoL || saoC) {
        if (sps.pcmLfOff && pic.hasPcm) return None
        applySao(pic)
      }
      Some((poc, pic))
    } catch {
      case ParseFail => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** Conformance-window crop of a decoded picture's three planes
    * (CTB padding AND the SPS conf_win offsets, ADVICE r14). */
  private def cropYuv(pic: Pic
      ): (Int, Int, Array[Int], Array[Int], Array[Int]) = {
    val sps = pic.sps
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
    def cropC(plane: Array[Int]): Array[Int] = {
      val cw = ow >> 1
      val ch = oh >> 1
      if (pic.strideC == cw && pic.planeHC == ch) plane
      else {
        val o = new Array[Int](cw * ch)
        var y = 0
        while (y < ch) {
          System.arraycopy(plane,
            (y + (sps.cropT >> 1)) * pic.strideC + (sps.cropL >> 1),
            o, y * cw, cw)
          y += 1
        }
        o
      }
    }
    (ow, oh, out, cropC(pic.cb), cropC(pic.cr))
  }

  // ---------------------------------------------------------------- encode

  /** Coding-unit vocabulary for [[encodeIFrame]]. */
  sealed trait Cu
  /** I_PCM: raw samples, `pix(x, y)` local to the CU; chroma from
    * the half-resolution `cbPix`/`crPix` (default neutral 128). */
  final case class HPcm(pix: (Int, Int) => Int,
      cbPix: (Int, Int) => Int = (_, _) => 128,
      crPix: (Int, Int) => Int = (_, _) => 128) extends Cu
  /** Intra mode 0-34 (planar/DC/angular since round 15), no
    * residual. */
  final case class HIntra(mode: Int) extends Cu
  /** Intra CU whose single TU carries sparse luma coefficients:
    * (rasterPos, level) pairs over the nT x nT block (round 15). */
  final case class HIntraCoded(mode: Int,
      coeffs: Seq[(Int, Int)],
      /** round 16: one chroma DC per component (0 = uncoded); the
        * chroma TU is half the CU, mode DM (= luma mode). */
      cbDc: Int = 0, crDc: Int = 0) extends Cu
  /** 16x16 intra CU with a SPLIT transform tree: four 8x8 TUs, one
    * DC level each (z order; 0 = uncoded). Needs an SPS with
    * max_transform_hierarchy_depth_intra >= 1. */
  final case class HIntraSplit(mode: Int, dcs: Seq[Int]) extends Cu
  /** 8x8 intra CU (inside a Quad) splitting into four 4x4 TUs — the
    * DST-VII path. Same depth_intra >= 1 requirement. */
  final case class HIntraSplit8(mode: Int, dcs: Seq[Int]) extends Cu
  /** PART_NxN 8x8 CU (inside a Quad, round 15): four 4x4 PUs with
    * their own intra modes and optional per-TU DC levels. */
  final case class HIntraNxN(modes: Seq[Int],
      dcs: Seq[Int] = Seq(0, 0, 0, 0)) extends Cu
  /** Fixture SAO spec (round 16): one luma-component parameter set
    * applied identically at every CTB (full syntax per CTB, no
    * merges). */
  sealed trait HSao
  /** Band offsets: 4 SIGNED values (|o| <= 7) over the 4 bands at
    * `bandPos` (0-31; band = sample >> 3). */
  final case class HSaoBand(offsets: Seq[Int], bandPos: Int) extends HSao
  /** Edge offsets: 4 NON-NEGATIVE magnitudes (the first two apply as
    * +, the last two as -), `eoClass` 0-3 (H / V / 135 / 45). */
  final case class HSaoEdge(absOffsets: Seq[Int], eoClass: Int) extends HSao

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
  def spsNal(width: Int, height: Int, depthIntra: Int = 0,
      sao: Boolean = false): Array[Byte] = {
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
    bw.putUe(0) // max_transform_hierarchy_depth_inter
    bw.putUe(depthIntra) // max_transform_hierarchy_depth_intra
    bw.put(0, 1) // scaling_list
    bw.put(0, 1) // amp
    bw.put(if (sao) 1 else 0, 1) // sample_adaptive_offset
    bw.put(1, 1) // pcm_enabled
    bw.put(7, 4); bw.put(7, 4) // pcm bit depths (8)
    bw.putUe(0) // log2_min_pcm_cb_minus3 -> 8
    bw.putUe(1) // log2_diff -> max pcm 16
    bw.put(0, 1) // pcm_loop_filter_disabled: PCM deblocks normally
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
  def ppsNal(qp: Int, deblock: Boolean = false): Array[Byte] = {
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
    // across-slices stays 0 so the slice header never carries the
    // 7.3.6.1 extra flag regardless of the deblock/SAO switches
    bw.put(0, 1) // loop_filter_across_slices
    bw.put(1, 1) // deblocking_filter_control_present
    bw.put(0, 1) // override_enabled
    bw.put(if (deblock) 0 else 1, 1) // pps_deblocking_filter_disabled
    if (deblock) { bw.putSe(0); bw.putSe(0) } // beta/tc offsets
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
  def idrNal(ctbW: Int, ctbH: Int, ctu: Int => Ctu, qp: Int,
      depthIntra: Int = 0, sao: Option[HSao] = None): Array[Byte] = {
    require(qp >= 0 && qp <= 51, s"qp out of range: $qp")
    val sps = HSps(ctbW * 16, ctbH * 16, 4, 3, 4, 2,
      pcmEnabled = true, pcmMinLog2 = 3, pcmMaxLog2 = 4,
      maxDepthIntra = depthIntra)
    val pic = new Pic(sps)
    val bw = new BitWriter
    bw.put(1, 1) // first_slice_segment_in_pic
    bw.put(0, 1) // no_output_of_prior_pics
    bw.putUe(0) // pps id
    bw.putUe(2) // slice_type I
    if (sao.isDefined) {
      bw.put(1, 1) // slice_sao_luma_flag
      bw.put(0, 1) // slice_sao_chroma_flag
    }
    bw.putSe(0) // slice_qp_delta
    // loop_filter_across stays 0 in the fixture PPS, so no extra flag
    bw.put(1, 1) // byte alignment: one bit
    bw.alignZero()
    val cx = new H264Cabac.Ctx(qp, InitPairs)
    var enc = new H264Cabac.Enc
    def drain(): Unit = enc.drain(b => bw.put(b, 1))
    def putCu(x0: Int, y0: Int, log2Size: Int, depth: Int, cu: Cu): Unit = {
      val size = 1 << log2Size
      cu match {
        case HIntraNxN(modes, dcs) =>
          require(log2Size == sps.minCbLog2,
            "HIntraNxN: a minimum-size CU only")
          require(modes.length == 4 && dcs.length == 4 &&
            modes.forall(m => m >= 0 && m <= 34), "HIntraNxN shape")
          enc.decision(cx, CtxPart, bin = false) // PART_NxN (no pcm)
          val half = size >> 1
          // all four prev flags, then the four payloads with the
          // per-PU candidate lists the decoder derives
          val prevF = new Array[Boolean](4)
          var j = 0
          while (j < 4) {
            val px = x0 + (j & 1) * half
            val py = y0 + (j >> 1) * half
            // candidate list at payload time includes earlier PUs;
            // the FLAG pass only needs membership, which is the same
            // question — but the list can change between the two
            // passes (earlier PUs set their cells), so the flag must
            // be decided against the PAYLOAD-time list. Emit flags
            // from a dry-run that mirrors the decoder's two passes.
            prevF(j) = true // placeholder; fixed below
            j += 1
          }
          // dry run: compute payload-time candidate lists by
          // replaying cell updates on a scratch copy is equivalent to
          // sequential emission — but flags are emitted BEFORE any
          // payload. Restrict the fixture to the decidable case: a
          // mode is flagged MPM iff it is in its payload-time list,
          // which depends only on modes of EARLIER PUs (known here).
          val simModes = new Array[Int](4)
          val inMpm = new Array[Boolean](4)
          j = 0
          while (j < 4) {
            val px = x0 + (j & 1) * half
            val py = y0 + (j >> 1) * half
            val cands = candList(pic, px, py)
            inMpm(j) = cands.contains(modes(j))
            simModes(j) = modes(j)
            pic.cellsSet(px, py, half, depth, modes(j))
            j += 1
          }
          // rewind is unnecessary: cells now hold the final modes,
          // and the flag/payload emission below re-derives candidate
          // lists from OUTSIDE-CU neighbors plus these same cells —
          // identical to what the decoder sees at payload time only
          // if earlier-PU cells were already set, which they are.
          j = 0
          while (j < 4) {
            enc.decision(cx, CtxPrevIntra, inMpm(j))
            j += 1
          }
          j = 0
          while (j < 4) {
            val px = x0 + (j & 1) * half
            val py = y0 + (j >> 1) * half
            val cands = candList(pic, px, py)
            if (inMpm(j)) {
              val idx = cands.indexOf(modes(j))
              require(idx >= 0, "MPM drift")
              enc.bypass(idx > 0)
              if (idx > 0) enc.bypass(idx > 1)
            } else {
              val sorted = cands.sorted
              var rem = modes(j)
              var k = 2
              while (k >= 0) { if (modes(j) > sorted(k)) rem -= 1; k -= 1 }
              var b = 4
              while (b >= 0) { enc.bypass(((rem >> b) & 1) == 1); b -= 1 }
            }
            j += 1
          }
          enc.decision(cx, CtxChromaMode, bin = false) // DM = PU 0
          enc.decision(cx, CtxCbfC, bin = false) // depth-0 cb
          enc.decision(cx, CtxCbfC, bin = false) // depth-0 cr
          j = 0
          while (j < 4) {
            val px = x0 + (j & 1) * half
            val py = y0 + (j >> 1) * half
            // forced split; child at minTb: no split flag
            enc.decision(cx, CtxCbfLuma, dcs(j) != 0) // depth 1
            predictIntra(pic, px, py, half, modes(j))
            if (dcs(j) != 0) {
              val coef = new Array[Int](half * half)
              coef(0) = dcs(j)
              putResidual(enc, cx, log2Size - 1,
                scanIdxOf(log2Size - 1, 0, modes(j)), coef)
              val dq = coef.map(c =>
                if (c != 0) dequant(c, qp, log2Size - 1) else 0)
              val res = invTransform(dq, half, log2Size - 1 == 2)
              var y = 0
              while (y < half) {
                var x = 0
                while (x < half) {
                  val kk = (py + y) * pic.stride + px + x
                  val v = pic.luma(kk) + res(y * half + x)
                  pic.luma(kk) =
                    if (v < 0) 0 else if (v > 255) 255 else v
                  x += 1
                }
                y += 1
              }
            }
            pic.cellsSet(px, py, half, depth, modes(j))
            j += 1
          }
          return
        case _ => ()
      }
      if (log2Size == sps.minCbLog2)
        enc.decision(cx, CtxPart, bin = true) // PART_2Nx2N
      cu match {
        case HPcm(pix, cbPix, crPix) =>
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
          Seq(cbPix, crPix).foreach { cp =>
            var cy = 0
            while (cy < (size >> 1)) {
              var cx0 = 0
              while (cx0 < (size >> 1)) {
                val v = cp(cx0, cy)
                require(v >= 0 && v <= 255, s"pcm chroma out of range: $v")
                bw.putByte(v)
                cx0 += 1
              }
              cy += 1
            }
          }
          pic.cellsSet(x0, y0, size, depth, 1)
          enc = new H264Cabac.Enc
        case intra @ (HIntra(_) | HIntraCoded(_, _, _, _) |
            HIntraSplit(_, _) | HIntraSplit8(_, _)) =>
          val mode = intra match {
            case HIntra(m) => m
            case c: HIntraCoded => c.mode
            case HIntraSplit(m, _) => m
            case HIntraSplit8(m, _) => m
            case _ => 0
          }
          require(mode >= 0 && mode <= 34, s"intra mode out of range: $mode")
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
          // transform tree, mirroring the decoder's flag-presence
          // rule: split flag at this CU when coded
          val splitPresent = log2Size > sps.minTbLog2 &&
            0 < sps.maxDepthIntra && log2Size <= sps.maxTbLog2
          // dequant + inverse transform + add onto the shadow plane
          def applyResidual(tx0: Int, ty0: Int, lg: Int,
              coef: Array[Int]): Unit = {
            val nT = 1 << lg
            val dq = new Array[Int](nT * nT)
            var k2 = 0
            while (k2 < nT * nT) {
              if (coef(k2) != 0) dq(k2) = dequant(coef(k2), qp, lg)
              k2 += 1
            }
            val res = invTransform(dq, nT, lg == 2)
            var y = 0
            while (y < nT) {
              var x = 0
              while (x < nT) {
                val kk = (ty0 + y) * pic.stride + tx0 + x
                val v = pic.luma(kk) + res(y * nT + x)
                pic.luma(kk) = if (v < 0) 0 else if (v > 255) 255 else v
                x += 1
              }
              y += 1
            }
          }
          intra match {
            case HIntra(_) =>
              if (splitPresent)
                enc.decision(cx, CtxSplitTrafo + (5 - log2Size),
                  bin = false)
              enc.decision(cx, CtxCbfC, bin = false) // cbf_cb
              enc.decision(cx, CtxCbfC, bin = false) // cbf_cr
              enc.decision(cx, CtxCbfLuma + 1, bin = false) // cbf_luma
              predictIntra(pic, x0, y0, size, mode)
            case HIntraCoded(_, coeffs, cbDc, crDc) =>
              if (splitPresent)
                enc.decision(cx, CtxSplitTrafo + (5 - log2Size),
                  bin = false)
              enc.decision(cx, CtxCbfC, cbDc != 0)
              enc.decision(cx, CtxCbfC, crDc != 0)
              enc.decision(cx, CtxCbfLuma + 1, bin = true)
              predictIntra(pic, x0, y0, size, mode)
              val coef = new Array[Int](size * size)
              coeffs.foreach { case (pos, lvl) =>
                require(pos >= 0 && pos < size * size, s"coef pos $pos")
                coef(pos) = lvl
              }
              putResidual(enc, cx, log2Size,
                scanIdxOf(log2Size, 0, mode), coef)
              applyResidual(x0, y0, log2Size, coef)
              // chroma TU residuals (round 16): DM mode, half size
              val cl = log2Size - 1
              Seq((cbDc, 1), (crDc, 2)).foreach { case (dc, comp) =>
                if (dc != 0) {
                  val coefC = new Array[Int]((1 << cl) * (1 << cl))
                  coefC(0) = dc
                  putResidual(enc, cx, cl,
                    scanIdxOf(cl, comp, mode), coefC, comp)
                }
              }
            case HIntraSplit(_, dcs) =>
              require(dcs.length == 4, "HIntraSplit needs 4 DC levels")
              require(log2Size == 4 && sps.maxDepthIntra >= 1,
                "HIntraSplit: 16x16 CU under depth_intra >= 1")
              enc.decision(cx, CtxSplitTrafo + (5 - log2Size),
                bin = true)
              enc.decision(cx, CtxCbfC, bin = false) // depth-0 cb
              enc.decision(cx, CtxCbfC, bin = false) // depth-0 cr
              var q2 = 0
              while (q2 < 4) {
                val tx0 = x0 + (q2 & 1) * 8
                val ty0 = y0 + (q2 >> 1) * 8
                if (1 < sps.maxDepthIntra) // child split flag
                  enc.decision(cx, CtxSplitTrafo + (5 - 3), bin = false)
                enc.decision(cx, CtxCbfLuma, dcs(q2) != 0) // depth 1
                predictIntra(pic, tx0, ty0, 8, mode)
                if (dcs(q2) != 0) {
                  val coef = new Array[Int](64)
                  coef(0) = dcs(q2)
                  putResidual(enc, cx, 3, scanIdxOf(3, 0, mode), coef)
                  applyResidual(tx0, ty0, 3, coef)
                }
                pic.cellsSet(tx0, ty0, 8, -1, mode)
                q2 += 1
              }
            case HIntraSplit8(_, dcs) =>
              require(dcs.length == 4, "HIntraSplit8 needs 4 DC levels")
              require(log2Size == 3 && sps.maxDepthIntra >= 1,
                "HIntraSplit8: 8x8 CU under depth_intra >= 1")
              enc.decision(cx, CtxSplitTrafo + (5 - 3), bin = true)
              enc.decision(cx, CtxCbfC, bin = false) // depth-0 cb
              enc.decision(cx, CtxCbfC, bin = false) // depth-0 cr
              var q2 = 0
              while (q2 < 4) {
                val tx0 = x0 + (q2 & 1) * 4
                val ty0 = y0 + (q2 >> 1) * 4
                // 4x4 TU: no split flag (at minTbLog2), chroma cbfs
                // inherited (parent false)
                enc.decision(cx, CtxCbfLuma, dcs(q2) != 0) // depth 1
                predictIntra(pic, tx0, ty0, 4, mode)
                if (dcs(q2) != 0) {
                  val coef = new Array[Int](16)
                  coef(0) = dcs(q2)
                  putResidual(enc, cx, 2, scanIdxOf(2, 0, mode), coef)
                  applyResidual(tx0, ty0, 2, coef)
                }
                pic.cellsSet(tx0, ty0, 4, -1, mode)
                q2 += 1
              }
            case _ => ()
          }
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
      sao.foreach { sp => // sao() per CTB (7.3.8.3), luma only
        val rx = t % ctbW
        val ry = t / ctbW
        if (rx > 0) enc.decision(cx, CtxSaoMerge, bin = false)
        if (ry > 0) enc.decision(cx, CtxSaoMerge, bin = false)
        enc.decision(cx, CtxSaoType, bin = true)
        sp match {
          case HSaoBand(offs, bandPos) =>
            require(offs.length == 4 && offs.forall(o => o.abs <= 7))
            require(bandPos >= 0 && bandPos < 32)
            enc.bypass(bin = false) // type 1: band
            offs.foreach { o =>
              var v = 0
              while (v < o.abs) { enc.bypass(bin = true); v += 1 }
              if (o.abs < 7) enc.bypass(bin = false)
            }
            offs.foreach(o => if (o != 0) enc.bypass(o < 0))
            var b = 4
            while (b >= 0) {
              enc.bypass(((bandPos >> b) & 1) == 1); b -= 1
            }
          case HSaoEdge(offs, cls) =>
            require(offs.length == 4 && offs.forall(o => o >= 0 && o <= 7))
            require(cls >= 0 && cls < 4)
            enc.bypass(bin = true) // type 2: edge
            offs.foreach { o =>
              var v = 0
              while (v < o) { enc.bypass(bin = true); v += 1 }
              if (o < 7) enc.bypass(bin = false)
            }
            enc.bypass(((cls >> 1) & 1) == 1)
            enc.bypass((cls & 1) == 1)
        }
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

  /** P-slice CU vocabulary (round 16): one 16x16 CU per CTU. */
  sealed trait PCu
  /** cu_skip: merge candidate `idx`'s motion, no residual. */
  final case class HPSkip(idx: Int = 0) extends PCu
  /** Explicit motion (AMVP predictor 0 + mvd), quarter-pel luma MV,
    * optional 16x16-DC residual (at qp 28 coefficient c adds exactly
    * c per sample). */
  final case class HPMv(mvx: Int, mvy: Int, dc: Int = 0) extends PCu
  /** merge_flag = 1 with candidate `idx`, optional DC residual. */
  final case class HPMerge(idx: Int, dc: Int = 0) extends PCu

  /** One P slice (TRAIL_R) over 16x16 inter CUs, referencing the
    * previous picture through a slice-header RPS at `pocDelta`. The
    * shadow Pic drives the SAME merge/AMVP derivations and contexts
    * as the decoder. */
  def pSliceNal(ctbW: Int, ctbH: Int, cu: Int => PCu, qp: Int,
      poc: Int, pocDelta: Int = 1): Array[Byte] = {
    require(qp >= 0 && qp <= 51 && poc >= 1 && pocDelta >= 1)
    val sps = HSps(ctbW * 16, ctbH * 16, 4, 3, 4, 2,
      pcmEnabled = true, pcmMinLog2 = 3, pcmMaxLog2 = 4,
      log2MaxPoc = 4)
    val pic = new Pic(sps)
    val bw = new BitWriter
    bw.put(1, 1) // first_slice_segment_in_pic
    bw.putUe(0) // pps id
    bw.putUe(1) // slice_type P
    bw.put(poc & 15, 4) // slice_pic_order_cnt_lsb (log2 = 4)
    bw.put(0, 1) // short_term_ref_pic_set_sps_flag
    bw.putUe(1) // num_negative_pics
    bw.putUe(0) // num_positive_pics
    bw.putUe(pocDelta - 1) // delta_poc_s0_minus1
    bw.put(1, 1) // used_by_curr_pic_s0
    bw.put(1, 1) // num_ref_idx_active_override
    bw.putUe(0) // num_ref_idx_l0_active_minus1 -> 1
    bw.putUe(0) // five_minus_max_num_merge_cand -> 5
    bw.putSe(0) // slice_qp_delta
    bw.put(1, 1) // byte alignment: one bit
    bw.alignZero()
    val cx = new H264Cabac.Ctx(qp, InitPairsP)
    val enc = new H264Cabac.Enc
    def drain(): Unit = enc.drain(b => bw.put(b, 1))
    val maxMerge = 5
    def putMergeIdx(idx: Int): Unit = {
      require(idx >= 0 && idx < maxMerge, s"merge idx $idx")
      enc.decision(cx, CtxMergeIdx, idx > 0)
      if (idx > 0) {
        var k = 1
        while (k < idx) { enc.bypass(bin = true); k += 1 }
        if (idx < maxMerge - 1) enc.bypass(bin = false)
      }
    }
    def putMvdComp(d: Int): Unit = { // one mvd component's gr1+tail
      val a = math.abs(d)
      if (a > 0) {
        if (a > 1) { // abs_mvd_minus2: EG1 bypass
          var v = a - 2
          var k = 1
          while (v >= (1 << k)) { enc.bypass(bin = true); v -= 1 << k; k += 1 }
          enc.bypass(bin = false)
          var b = k - 1
          while (b >= 0) { enc.bypass(((v >> b) & 1) == 1); b -= 1 }
        }
        enc.bypass(d < 0) // mvd_sign
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
      def skipCond(px: Int, py: Int): Int =
        if (px >= 0 && py >= 0 && px < sps.width && py < sps.height &&
          pic.decoded((py >> 2) * pic.gw + (px >> 2)) &&
          pic.skipF((py >> 2) * pic.gw + (px >> 2))) 1 else 0
      val skipInc = skipCond(x0 - 1, y0) + skipCond(x0, y0 - 1)
      cu(t) match {
        case HPSkip(idx) =>
          enc.decision(cx, CtxSplit0 + splitCtx, bin = false)
          enc.decision(cx, CtxCuSkip + skipInc, bin = true)
          putMergeIdx(idx)
          val m = mergeList(pic, x0, y0, 16, maxMerge)(idx)
          pic.motionSet(x0, y0, 16, m._1, m._2, skip = true)
          pic.cellsSet(x0, y0, 16, 0, 1)
        case HPMerge(idx, dc) =>
          enc.decision(cx, CtxSplit0 + splitCtx, bin = false)
          enc.decision(cx, CtxCuSkip + skipInc, bin = false)
          enc.decision(cx, CtxPredMode, bin = false) // inter
          enc.decision(cx, CtxPart, bin = true) // PART_2Nx2N
          enc.decision(cx, CtxMergeFlag, bin = true)
          putMergeIdx(idx)
          val m = mergeList(pic, x0, y0, 16, maxMerge)(idx)
          pic.motionSet(x0, y0, 16, m._1, m._2, skip = false)
          pic.cellsSet(x0, y0, 16, 0, 1)
          enc.decision(cx, CtxRqtRoot, dc != 0)
          if (dc != 0) {
            enc.decision(cx, CtxCbfC, bin = false) // cbf_cb
            enc.decision(cx, CtxCbfC, bin = false) // cbf_cr
            // cbf_luma inferred 1 (inter, depth 0, no chroma cbf)
            val coef = new Array[Int](256)
            coef(0) = dc
            putResidual(enc, cx, 4, 0, coef)
          }
        case HPMv(mvx, mvy, dc) =>
          enc.decision(cx, CtxSplit0 + splitCtx, bin = false)
          enc.decision(cx, CtxCuSkip + skipInc, bin = false)
          enc.decision(cx, CtxPredMode, bin = false) // inter
          enc.decision(cx, CtxPart, bin = true) // PART_2Nx2N
          enc.decision(cx, CtxMergeFlag, bin = false)
          val mvp = mvpList(pic, x0, y0, 16)(0)
          val dx = mvx - mvp._1
          val dy = mvy - mvp._2
          enc.decision(cx, CtxMvdGr0, dx != 0)
          enc.decision(cx, CtxMvdGr0, dy != 0)
          if (dx != 0) enc.decision(cx, CtxMvdGr1, math.abs(dx) > 1)
          if (dy != 0) enc.decision(cx, CtxMvdGr1, math.abs(dy) > 1)
          putMvdComp(dx)
          putMvdComp(dy)
          enc.decision(cx, CtxMvp, bin = false) // mvp_l0_flag = 0
          pic.motionSet(x0, y0, 16, mvx, mvy, skip = false)
          pic.cellsSet(x0, y0, 16, 0, 1)
          enc.decision(cx, CtxRqtRoot, dc != 0)
          if (dc != 0) {
            enc.decision(cx, CtxCbfC, bin = false)
            enc.decision(cx, CtxCbfC, bin = false)
            val coef = new Array[Int](256)
            coef(0) = dc
            putResidual(enc, cx, 4, 0, coef)
          }
      }
      t += 1
      enc.terminate(t == nCtbs) // end_of_slice_segment_flag
    }
    drain()
    bw.alignZero()
    nalUnit(1, bw.result()) // TRAIL_R
  }

  /** Annex-B HEVC I + P stream: SPS + PPS + IDR + one P slice per
    * entry (decode order, each referencing the previous picture). */
  def encodeIPStream(ctbW: Int, ctbH: Int, iCtu: Int => Ctu,
      pFrames: Seq[Int => PCu], qp: Int = 28): Array[Byte] = {
    val sep = Array[Byte](0, 0, 0, 1)
    encodeIFrame(ctbW, ctbH, iCtu, qp) ++
      pFrames.zipWithIndex.flatMap { case (f, k) =>
        sep ++ pSliceNal(ctbW, ctbH, f, qp, poc = k + 1)
      }
  }

  /** Annex-B HEVC I-frame: SPS + PPS + IDR over 16-px CTUs. */
  def encodeIFrame(ctbW: Int, ctbH: Int, ctu: Int => Ctu,
      qp: Int = 28, depthIntra: Int = 0,
      deblock: Boolean = false,
      sao: Option[HSao] = None): Array[Byte] = {
    val sep = Array[Byte](0, 0, 0, 1)
    sep ++ spsNal(ctbW * 16, ctbH * 16, depthIntra,
      sao = sao.isDefined) ++ sep ++
      ppsNal(qp, deblock) ++ sep ++
      idrNal(ctbW, ctbH, ctu, qp, depthIntra, sao)
  }
}
