package graft.ext

/** MPEG-1 video (ISO/IEC 11172-2, public spec) INTRA-frame codec —
  * the round-12 narrowing of the predictive-codec fence
  * (VERDICT r11 #7): I-frames of the simplest predictive codec are
  * now REALLY decoded (sequence/picture/slice headers, macroblock and
  * DC/AC VLCs, intra dequantization with oddification, 8×8 IDCT),
  * pure-JVM. P/B frames and the modern codecs (avc1/hev1) remain
  * behind the byte-histogram fence — those genuinely need a native
  * decoder.
  *
  * Honesty bounds, all degrade-to-None (the caller falls back to the
  * fence, never a wrong decode):
  *  - I-pictures only (picture_coding_type 1); the first picture is
  *    decoded, which for the keyframe-sampling pipeline is the shape
  *    consumers want anyway.
  *  - The AC coefficient table covers the unambiguous short-code
  *    classes (through 7-bit codes) plus the UNIVERSAL 6-bit escape —
  *    every (run, level) pair is expressible through the escape, so
  *    any encoder (including [[encodeIFrame]]) can emit fully
  *    decodable streams; a stream using longer VLC classes returns
  *    None rather than risking a misremembered table entry.
  *
  * Chroma blocks are fully PARSED (bitstream sync requires it) but
  * only luma is reconstructed — the consumers are gray-statistics
  * features.
  */
object Mpeg1 {

  /** Default intra quantizer matrix (ISO 11172-2 §2.4.3.1), raster
    * order. */
  private val DefaultIntraQ: Array[Int] = Array(
    8, 16, 19, 22, 26, 27, 29, 34,
    16, 16, 22, 24, 27, 29, 34, 37,
    19, 22, 26, 27, 29, 34, 34, 38,
    22, 22, 26, 27, 29, 34, 37, 40,
    22, 26, 27, 29, 32, 35, 40, 48,
    26, 27, 29, 32, 35, 40, 48, 58,
    26, 27, 29, 34, 38, 46, 56, 69,
    27, 29, 35, 38, 46, 56, 69, 83)

  /** Zigzag scan order: zigzag index → raster index. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // ---------------------------------------------------------------- bits

  private final class BitReader(bytes: Array[Byte]) {
    var pos: Long = 0L // bit position
    val limit: Long = bytes.length.toLong * 8
    def remaining: Long = limit - pos
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val bp = pos + i
        val b = (bytes((bp >> 3).toInt) >> (7 - (bp & 7)).toInt) & 1
        v = (v << 1) | b
        i += 1
      }
      pos += n
      v
    }
    def peek(n: Int): Int = { val p = pos; val v = bits(n); pos = p; v }
    /** Advance to the next byte-aligned start code 0x000001xx at or
      * after the current position; returns the xx byte or -1. Leaves
      * pos just AFTER the 4-byte code. */
    def nextStartCode(): Int = {
      var bp = ((pos + 7) / 8).toInt
      while (bp + 3 < bytes.length) {
        if (bytes(bp) == 0 && bytes(bp + 1) == 0 && bytes(bp + 2) == 1) {
          pos = (bp + 4).toLong * 8
          return bytes(bp + 3) & 0xFF
        }
        bp += 1
      }
      pos = limit
      -1
    }
  }

  // ---------------------------------------------------------------- VLCs

  /** dct_dc_size_luminance (Table B.5a: 100→0, 00→1, 01→2, 101→3,
    * 110→4, 1110→5, …, 1111110→8): returns size or -1. */
  private def dcSizeLuma(br: BitReader): Int = {
    if (br.remaining < 2) return -1
    br.bits(2) match {
      case 0 => 1 // 00
      case 1 => 2 // 01
      case 2 => // 10x
        if (br.remaining < 1) -1
        else if (br.bits(1) == 0) 0 else 3 // 100 / 101
      case _ => // 11 + k ones + terminating 0 → size 4+k (k ≤ 4)
        var k = 0
        while (k <= 4 && br.remaining >= 1 && br.bits(1) == 1) k += 1
        if (k > 4 || br.remaining < 0) -1 else 4 + k
    }
  }

  /** dct_dc_size_chrominance (Table B.5b: 00→0, 01→1, 10→2, 110→3,
    * …, 11111110→8). */
  private def dcSizeChroma(br: BitReader): Int = {
    if (br.remaining < 2) return -1
    br.bits(2) match {
      case 0 => 0
      case 1 => 1
      case 2 => 2
      case _ => // 11 + k ones + terminating 0 → size 3+k (k ≤ 5)
        var k = 0
        while (k <= 5 && br.remaining >= 1 && br.bits(1) == 1) k += 1
        if (k > 5 || br.remaining < 0) -1 else 3 + k
    }
  }

  /** dct_dc_differential from size. */
  private def dcDiff(br: BitReader, size: Int): Int = {
    if (size == 0) 0
    else if (br.remaining < size) Int.MinValue
    else {
      val v = br.bits(size)
      if ((v & (1 << (size - 1))) != 0) v else v - ((1 << size) - 1)
    }
  }

  /** dct_coeff_next (Table B.14, short-code classes + escape).
    * Returns (run, signedLevel), (-1, 0) for EOB, (-2, 0) on error. */
  private def acCoeff(br: BitReader): (Int, Int) = {
    def signed(run: Int, level: Int): (Int, Int) =
      if (br.remaining < 1) (-2, 0)
      else if (br.bits(1) == 0) (run, level) else (run, -level)
    if (br.remaining < 2) return (-2, 0)
    val b2 = br.bits(2)
    b2 match {
      case 2 => (-1, 0) // '10' EOB
      case 3 => signed(0, 1) // '11' s
      case 1 => // '01...'
        if (br.remaining < 1) (-2, 0)
        else if (br.bits(1) == 1) signed(1, 1) // '011'
        else if (br.remaining < 1) (-2, 0)
        else if (br.bits(1) == 0) signed(0, 2) // '0100'
        else signed(2, 1) // '0101'
      case 0 => // '00...'
        if (br.remaining < 2) return (-2, 0)
        br.bits(2) match {
          case 2 => // '0010' + 1
            if (br.remaining < 1) (-2, 0)
            else if (br.bits(1) == 1) signed(0, 3) // '00101'
            else (-2, 0) // '00100...' = 8-bit class, not implemented
          case 3 => // '0011' + 1
            if (br.remaining < 1) (-2, 0)
            else if (br.bits(1) == 1) signed(3, 1) // '00111'
            else signed(4, 1) // '00110'
          case 1 => // '0001' + 2
            if (br.remaining < 2) (-2, 0)
            else br.bits(2) match {
              case 2 => signed(1, 2) // '000110'
              case 3 => signed(5, 1) // '000111'
              case 1 => signed(6, 1) // '000101'
              case 0 => signed(7, 1) // '000100'
            }
          case 0 => // '0000' + …
            if (br.remaining < 2) return (-2, 0)
            br.bits(2) match {
              case 1 => // '000001' ESCAPE: 6-bit run + level
                if (br.remaining < 6 + 8) return (-2, 0)
                val run = br.bits(6)
                val l8 = br.bits(8)
                if (l8 == 0) { // +128..255 in next 8
                  if (br.remaining < 8) (-2, 0) else (run, br.bits(8))
                } else if (l8 == 128) { // −256..−129 in next 8
                  if (br.remaining < 8) (-2, 0) else (run, br.bits(8) - 256)
                } else if (l8 > 128) (run, l8 - 256)
                else (run, l8)
              case 3 => // '000011' + 1
                if (br.remaining < 1) (-2, 0)
                else if (br.bits(1) == 0) signed(0, 4) // '0000110'
                else signed(8, 1) // '0000111'
              case 2 => // '000010' + 1
                if (br.remaining < 1) (-2, 0)
                else if (br.bits(1) == 0) signed(2, 2) // '0000100'
                else signed(9, 1) // '0000101'
              case 0 => (-2, 0) // deeper classes: not implemented
            }
        }
    }
  }

  // ---------------------------------------------------------------- IDCT

  /** Direct 8×8 type-III DCT (the decoding transform), double
    * precision, rounded + clamped to 0..255 by the caller. */
  private val CosTab: Array[Double] = {
    val t = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) {
        t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
        u += 1
      }
      x += 1
    }
    t
  }
  private def idct(block: Array[Int], out: Array[Int]): Unit = {
    val c = new Array[Double](8)
    c(0) = 1.0 / math.sqrt(2.0)
    var i = 1
    while (i < 8) { c(i) = 1.0; i += 1 }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            val f = block(v * 8 + u)
            if (f != 0)
              s += c(u) * c(v) * f * CosTab(x * 8 + u) * CosTab(y * 8 + v)
            u += 1
          }
          v += 1
        }
        val p = math.rint(s / 4.0).toInt
        out(y * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        x += 1
      }
      y += 1
    }
  }

  // ---------------------------------------------------------------- decode

  /** Decode the FIRST I-picture of an MPEG-1 video elementary stream:
    * (width, height, luma plane raster, row stride = coded width).
    * None on anything unsupported/corrupt — the caller degrades to its
    * fence, a wrong decode is never returned. */
  def decodeIFrameLuma(es: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    try decodeInner(es)
    catch { case _: Exception => None }
  }

  private def decodeInner(es: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    val br = new BitReader(es)
    // sequence header
    var sc = br.nextStartCode()
    while (sc != -1 && sc != 0xB3) sc = br.nextStartCode()
    if (sc != 0xB3 || br.remaining < 12 + 12 + 4 + 4 + 18 + 1 + 10 + 1 + 2)
      return None
    val width = br.bits(12)
    val height = br.bits(12)
    if (width == 0 || height == 0 || width > 4096 || height > 4096) return None
    br.bits(4); br.bits(4) // aspect, frame rate
    br.bits(18); br.bits(1) // bit rate, marker
    br.bits(10); br.bits(1) // vbv, constrained
    val intraQ = new Array[Int](64)
    if (br.bits(1) == 1) { // load_intra_quantiser_matrix (zigzag order)
      if (br.remaining < 64 * 8) return None
      var i = 0
      while (i < 64) { intraQ(Zigzag(i)) = br.bits(8); i += 1 }
    } else System.arraycopy(DefaultIntraQ, 0, intraQ, 0, 64)
    if (br.bits(1) == 1) { // load_non_intra (unused for I)
      if (br.remaining < 64 * 8) return None
      br.pos += 64 * 8
    }
    // picture header
    sc = br.nextStartCode()
    while (sc != -1 && sc != 0x00) sc = br.nextStartCode()
    if (sc != 0x00 || br.remaining < 10 + 3 + 16) return None
    br.bits(10) // temporal reference
    val ptype = br.bits(3)
    if (ptype != 1) return None // intra decoder: I-pictures only
    br.bits(16) // vbv_delay
    while (br.remaining >= 9 && br.peek(1) == 1) { br.bits(1); br.bits(8) }
    if (br.remaining < 1) return None
    br.bits(1) // extra_bit_picture == 0
    // slices
    val mbW = (width + 15) / 16
    val mbH = (height + 15) / 16
    val luma = new Array[Int](mbW * 16 * mbH * 16)
    val stride = mbW * 16
    val block = new Array[Int](64)
    val pix = new Array[Int](64)
    var decodedMBs = 0
    sc = br.nextStartCode()
    while (sc >= 0x01 && sc <= 0xAF && decodedMBs < mbW * mbH) {
      val sliceRow = sc - 1
      var qscale = br.bits(5)
      if (qscale == 0) return None
      while (br.remaining >= 9 && br.peek(1) == 1) { br.bits(1); br.bits(8) }
      if (br.remaining < 1) return None
      br.bits(1)
      var mbAddr = sliceRow * mbW - 1
      var predY = 1024; var predCb = 1024; var predCr = 1024
      var sliceDone = false
      while (!sliceDone) {
        // macroblock_address_increment (I-frames: expect 1, handle
        // stuffing '0000 0001 111' and escape '0000 0001 000' = +33)
        var inc = 0
        var fail = false
        var reading = true
        while (reading && !fail) {
          if (br.remaining < 1) { fail = true }
          else if (br.peek(1) == 1) { br.bits(1); inc += 1; reading = false }
          else if (br.remaining >= 11 && br.peek(11) == 0x0F) { br.bits(11) } // stuffing
          else if (br.remaining >= 11 && br.peek(11) == 0x08) { br.bits(11); inc += 33 } // escape
          else if (br.remaining >= 3 && br.peek(3) == 3) { br.bits(3); inc += 2; reading = false } // '011'
          else if (br.remaining >= 3 && br.peek(3) == 2) { br.bits(3); inc += 3; reading = false } // '010'
          else fail = true // longer increments: not expected intra
        }
        if (fail) return None
        if (inc > 1) { predY = 1024; predCb = 1024; predCr = 1024 } // skipped MBs reset preds
        mbAddr += inc
        if (mbAddr >= mbW * mbH) return None
        // macroblock_type, Table B.2a: '1' intra-d, '01' intra-q
        if (br.remaining < 1) return None
        if (br.bits(1) == 0) {
          if (br.remaining < 1 + 5) return None
          if (br.bits(1) != 1) return None // only intra types are legal in I
          qscale = br.bits(5)
          if (qscale == 0) return None
        }
        val mbX = mbAddr % mbW
        val mbY = mbAddr / mbW
        var blk = 0
        while (blk < 6) {
          java.util.Arrays.fill(block, 0)
          val size = if (blk < 4) dcSizeLuma(br) else dcSizeChroma(br)
          if (size < 0) return None
          val diff = dcDiff(br, size)
          if (diff == Int.MinValue) return None
          val dc = (if (blk < 4) predY else if (blk == 4) predCb else predCr) + diff * 8
          if (blk < 4) predY = dc else if (blk == 4) predCb = dc else predCr = dc
          block(0) = dc
          // AC loop
          var idx = 0
          var eob = false
          while (!eob) {
            val (run, level) = acCoeff(br)
            if (run == -1) eob = true
            else if (run == -2 || level == 0) return None
            else {
              idx += run + 1
              if (idx > 63) return None
              var f = (2 * level * qscale * intraQ(Zigzag(idx))) / 16
              // oddification (mismatch control): pull even values one
              // step toward zero... spec: toward odd, away from zero is
              // wrong — §2.4.4.1: if even, subtract sign(f)
              if ((f & 1) == 0) f = if (f > 0) f - 1 else if (f < 0) f + 1 else f
              if (f > 2047) f = 2047
              if (f < -2048) f = -2048
              block(Zigzag(idx)) = f
            }
          }
          if (blk < 4) {
            idct(block, pix)
            val ox = mbX * 16 + (blk % 2) * 8
            val oy = mbY * 16 + (blk / 2) * 8
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                luma((oy + y) * stride + ox + x) = pix(y * 8 + x)
                x += 1
              }
              y += 1
            }
          }
          // chroma blocks: parsed for sync, reconstruction discarded
          blk += 1
        }
        decodedMBs += 1
        // end of slice: byte-aligned 23+ zero bits ahead (next start
        // code) — peek for it; otherwise the next MB follows
        val save = br.pos
        val aligned = (br.pos + 7) / 8 * 8
        if (br.remaining <= 0) sliceDone = true
        else {
          // if all bits to alignment are zero AND the aligned bytes
          // begin a start code, the slice is done
          var allZero = true
          var p = br.pos
          while (p < aligned && allZero) {
            if (((es((p >> 3).toInt) >> (7 - (p & 7)).toInt) & 1) != 0) allZero = false
            p += 1
          }
          val bi = (aligned / 8).toInt
          if (allZero && bi + 3 < es.length &&
              es(bi) == 0 && es(bi + 1) == 0 && es(bi + 2) == 1) sliceDone = true
          else br.pos = save
        }
        if (decodedMBs >= mbW * mbH) sliceDone = true
      }
      sc = if (decodedMBs < mbW * mbH) br.nextStartCode() else -1
    }
    if (decodedMBs == 0) None
    else Some((width, height, cropLuma(luma, stride, width, height)))
  }

  private def cropLuma(full: Array[Int], stride: Int, w: Int, h: Int): Array[Int] =
    if (stride == w && full.length == w * h) full
    else {
      val out = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        System.arraycopy(full, y * stride, out, y * w, w)
        y += 1
      }
      out
    }

  // ---------------------------------------------------------------- encode

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
    def alignZero(): Unit = while (nb != 0) put(0, 1)
    def bytes(bs: Array[Byte]): Unit = { alignZero(); bs.foreach(buf += _) }
    def result(): Array[Byte] = { alignZero(); buf.toArray }
  }

  private def putDcLuma(bw: BitWriter, diff: Int): Unit = {
    val size = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
    require(size <= 8, s"dc diff out of range: $diff")
    // Table B.5a (width, code)
    val (w, v) = size match {
      case 0 => (3, 4) // 100
      case 1 => (2, 0) // 00
      case 2 => (2, 1) // 01
      case 3 => (3, 5) // 101
      case 4 => (3, 6) // 110
      case 5 => (4, 14) // 1110
      case 6 => (5, 30) // 11110
      case 7 => (6, 62) // 111110
      case 8 => (7, 126) // 1111110
    }
    bw.put(v, w)
    if (size > 0) {
      val bitsVal = if (diff > 0) diff else diff + (1 << size) - 1
      bw.put(bitsVal, size)
    }
  }

  private def putDcChroma(bw: BitWriter, diff: Int): Unit = {
    val size = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
    require(size <= 8, s"dc diff out of range: $diff")
    val (w, v) = size match {
      case 0 => (2, 0) // 00
      case 1 => (2, 1) // 01
      case 2 => (2, 2) // 10
      case 3 => (3, 6) // 110
      case 4 => (4, 14) // 1110
      case 5 => (5, 30)
      case 6 => (6, 62)
      case 7 => (7, 126)
      case 8 => (8, 254)
    }
    bw.put(v, w)
    if (size > 0) {
      val bitsVal = if (diff > 0) diff else diff + (1 << size) - 1
      bw.put(bitsVal, size)
    }
  }

  /** AC coefficient via the UNIVERSAL escape (always legal, always in
    * the decoder's table). level in [-255, 255] \ {0} (8/16-bit escape
    * forms). */
  private def putAcEscape(bw: BitWriter, run: Int, level: Int): Unit = {
    require(run >= 0 && run <= 63 && level != 0 && level >= -255 && level <= 255)
    bw.put(1, 6) // 000001
    bw.put(run, 6)
    if (level >= 128) { bw.put(0, 8); bw.put(level, 8) }
    else if (level <= -128) { bw.put(128, 8); bw.put(level + 256, 8) }
    else bw.put(level & 0xFF, 8)
  }

  /** Encode ONE I-frame: 16·mbW × 16·mbH, one slice, all macroblocks
    * intra-d at quantizer_scale `qscale`. Per LUMA block b (raster MB
    * order, 4 blocks each), `lumaDc(mbIndex, b)` gives the block's
    * flat pixel value 0..255 and `ac(mbIndex, b)` optional extra
    * (zigzagRun, level) coefficients written via the escape code.
    * Chroma blocks carry zero differentials (neutral 128). The
    * resulting stream exercises exactly the paths [[decodeIFrameLuma]]
    * implements — the closed-form fixture discipline. */
  def encodeIFrame(mbW: Int, mbH: Int,
      lumaDc: (Int, Int) => Int,
      ac: (Int, Int) => Seq[(Int, Int)] = (_, _) => Nil,
      qscale: Int = 8): Array[Byte] = {
    require(mbW >= 1 && mbH >= 1 && qscale >= 1 && qscale <= 31)
    val bw = new BitWriter
    // sequence header
    bw.bytes(Array[Byte](0, 0, 1, 0xB3.toByte))
    bw.put(mbW * 16, 12); bw.put(mbH * 16, 12)
    bw.put(1, 4) // aspect 1:1
    bw.put(1, 4) // frame rate code (23.976)
    bw.put(0x3FFFF, 18) // variable bitrate
    bw.put(1, 1) // marker
    bw.put(0, 10) // vbv
    bw.put(0, 1) // constrained
    bw.put(0, 1) // no custom intra matrix
    bw.put(0, 1) // no custom non-intra matrix
    // picture header: I
    bw.bytes(Array[Byte](0, 0, 1, 0))
    bw.put(0, 10) // temporal ref
    bw.put(1, 3) // I-picture
    bw.put(0xFFFF, 16) // vbv_delay
    bw.put(0, 1) // extra_bit_picture
    // one slice at MB row 1
    bw.bytes(Array[Byte](0, 0, 1, 1))
    bw.put(qscale, 5)
    bw.put(0, 1) // extra_bit_slice
    var predY = 1024
    var mb = 0
    while (mb < mbW * mbH) {
      bw.put(1, 1) // address increment 1
      bw.put(1, 1) // intra-d
      var blk = 0
      while (blk < 6) {
        if (blk < 4) {
          val target = lumaDc(mb, blk) * 8
          val diff = (target - predY) / 8
          putDcLuma(bw, diff)
          predY = predY + diff * 8
          ac(mb, blk).foreach { case (run, level) => putAcEscape(bw, run, level) }
        } else putDcChroma(bw, 0) // chroma stays at the neutral 128
        bw.put(2, 2) // EOB '10'
        blk += 1
      }
      mb += 1
    }
    bw.result()
  }
}
