package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Hevc
import graft.ext.Hevc.{HIntra, HIntraCoded, HIntraNxN, HIntraSplit,
  HIntraSplit8, HPcm, Leaf, Quad}

/** HEVC intra-starter contracts (round 14). Expected pixels are
  * HAND-COMPUTED from the spec formulas (8.4.4.2.x), never from the
  * decoder under test:
  *  - I_PCM is raw samples.
  *  - DC over flat refs L/T: dc = (8L + 8T + 8) >> 4; luma boundary
  *    smoothing: corner (L + 2dc + T + 2) >> 2, first row
  *    (T + 3dc + 2) >> 2, first col (L + 3dc + 2) >> 2.
  *  - PLANAR at nT = 8 filters refs with [1 2 1] first (the corner
  *    bleeds into ref[0]), then the 8.4.4.2.4 bilinear blend. */
class HevcSpec extends AnyFunSuite {

  test("I_PCM CTU round-trips bit-exactly (16x16 leaf and 8x8 quads)") {
    def pix(x: Int, y: Int): Int = (31 + 7 * x + 13 * y) % 256
    val one = Hevc.decodeIFrameLuma(
      Hevc.encodeIFrame(1, 1, _ => Leaf(HPcm(pix))))
    assert(one.isDefined)
    val (w, h, luma) = one.get
    assert(w == 16 && h == 16)
    for (y <- 0 until 16; x <- 0 until 16)
      assert(luma(y * 16 + x) == pix(x, y), s"($x,$y)")
    val quads = Hevc.decodeIFrameLuma(Hevc.encodeIFrame(1, 1, _ =>
      Quad(Seq(HPcm((x, y) => 10 + x), HPcm((x, y) => 60 + y),
        HPcm((_, _) => 130), HPcm((x, y) => 200 + x - y)))))
    assert(quads.isDefined)
    val q = quads.get._3
    for (y <- 0 until 8; x <- 0 until 8) {
      assert(q(y * 16 + x) == 10 + x)
      assert(q(y * 16 + 8 + x) == 60 + y)
      assert(q((y + 8) * 16 + x) == 130)
      assert(q((y + 8) * 16 + 8 + x) == 200 + x - y)
    }
  }

  test("DC prediction with boundary smoothing: hand formula over " +
      "three flat PCM quadrants") {
    val (q0, q1, q2) = (200, 80, 40)
    val out = Hevc.decodeIFrameLuma(Hevc.encodeIFrame(1, 1, _ =>
      Quad(Seq(HPcm((_, _) => q0), HPcm((_, _) => q1),
        HPcm((_, _) => q2), HIntra(1)))))
    assert(out.isDefined)
    val luma = out.get._3
    val dc = (8 * q1 + 8 * q2 + 8) >> 4
    for (y <- 0 until 8; x <- 0 until 8) {
      val exp =
        if (x == 0 && y == 0) (q2 + 2 * dc + q1 + 2) >> 2
        else if (y == 0) (q1 + 3 * dc + 2) >> 2
        else if (x == 0) (q2 + 3 * dc + 2) >> 2
        else dc
      assert(luma((y + 8) * 16 + 8 + x) == exp, s"($x,$y)")
    }
  }

  test("PLANAR prediction with [1 2 1] reference filtering: the " +
      "corner bleeds into ref[0] exactly as 8.4.4.2.3 says") {
    val (q0, q1, q2) = (200, 80, 40)
    val out = Hevc.decodeIFrameLuma(Hevc.encodeIFrame(1, 1, _ =>
      Quad(Seq(HPcm((_, _) => q0), HPcm((_, _) => q1),
        HPcm((_, _) => q2), HIntra(0)))))
    assert(out.isDefined)
    val luma = out.get._3
    val fc = (q2 + 2 * q0 + q1 + 2) >> 2 // filtered corner (unused)
    def lRef(y: Int): Int = if (y == 0) (q0 + 3 * q2 + 2) >> 2 else q2
    def tRef(x: Int): Int = if (x == 0) (q0 + 3 * q1 + 2) >> 2 else q1
    for (y <- 0 until 8; x <- 0 until 8) {
      val exp = ((7 - x) * lRef(y) + (x + 1) * q1 +
        (7 - y) * tRef(x) + (y + 1) * q2 + 8) >> 4
      assert(luma((y + 8) * 16 + 8 + x) == exp, s"($x,$y): ${luma((y + 8) * 16 + 8 + x)} != $exp (fc $fc)")
    }
  }

  test("full-CTU DC with no neighbors: flat 128 picture (substituted " +
      "refs), and a 2x1 multi-CTU picture propagates MPM state") {
    val flat = Hevc.decodeIFrameLuma(
      Hevc.encodeIFrame(1, 1, _ => Leaf(HIntra(1))))
    assert(flat.isDefined)
    assert(flat.get._3.forall(_ == 128), "no-ref DC is 128 everywhere")
    // two CTUs: left all-PCM, right DC (predicts from the left CTU's
    // column through the candidate-list/grid machinery)
    val two = Hevc.decodeIFrameLuma(Hevc.encodeIFrame(2, 1, {
      case 0 => Leaf(HPcm((_, _) => 96))
      case _ => Leaf(HIntra(1))
    }))
    assert(two.isDefined)
    val (w2, _, l2) = two.get
    assert(w2 == 32)
    // dc over left refs (96) + substituted top refs (propagated from
    // corner 96): dc = 96; smoothing keeps 96 (all refs equal)
    for (y <- 0 until 16; x <- 16 until 32)
      assert(l2(y * 32 + x) == 96, s"($x,$y) = ${l2(y * 32 + x)}")
  }

  // ---- round 15: residuals + angular -------------------------------

  test("DC residual on a flat 16x16 TU: coefficient c at qp 28 adds " +
      "exactly c per sample (bdShift 7, two transform stages)") {
    for (c <- Seq(1, 5, -3, 10, -7)) {
      val es = Hevc.encodeIFrame(1, 1, _ =>
        Leaf(HIntraCoded(1, Seq((0, c)))), qp = 28)
      val Some((w, h, luma)) = Hevc.decodeIFrameLuma(es): @unchecked
      assert(w == 16 && h == 16)
      assert(luma.forall(_ == 128 + c), s"c=$c: ${luma.take(4).toSeq}")
    }
  }

  test("split transform tree: four 8x8 TUs with per-TU DC residuals " +
      "(+2c at qp 28) and the hand-computed DC prediction cascade") {
    // TU0: no-neighbor DC 128 + 4; TU1: left-only DC 132 + 0;
    // TU2: top-only DC 132 - 6 = 126; TU3: L 126 / T 132 -> dc 129,
    // smoothing corner 129, top edge 130, left edge 128, then + 10
    val es = Hevc.encodeIFrame(1, 1, _ =>
      Leaf(HIntraSplit(1, Seq(2, 0, -3, 5))), qp = 28,
      depthIntra = 1)
    val Some((_, _, luma)) = Hevc.decodeIFrameLuma(es): @unchecked
    def px(x: Int, y: Int) = luma(y * 16 + x)
    for (y <- 0 until 8; x <- 0 until 8) {
      assert(px(x, y) == 132, s"TU0 ($x,$y)")
      assert(px(x + 8, y) == 132, s"TU1 ($x,$y)")
      assert(px(x, y + 8) == 126, s"TU2 ($x,$y)")
    }
    assert(px(8, 8) == 139, "TU3 corner (129 + 10)")
    for (k <- 1 until 8) {
      assert(px(8 + k, 8) == 140, s"TU3 top edge $k (130 + 10)")
      assert(px(8, 8 + k) == 138, s"TU3 left edge $k (128 + 10)")
    }
    for (y <- 1 until 8; x <- 1 until 8)
      assert(px(8 + x, 8 + y) == 139, s"TU3 interior ($x,$y) (129 + 10)")
  }

  test("4x4 DST-VII residual: DC coefficient 1 at qp 28 dequants to " +
      "512 and produces the hand-computed non-flat basis ramp") {
    // stage 1 col: (512*g + 64) >> 7 for g in {29,55,74,84} ->
    // {116, 220, 296, 336}; stage 2: (g*mid + 2048) >> 12 ->
    // rows {1,2,2,2},{2,3,4,5},{2,4,5,6},{2,5,6,7} on flat 128
    val es = Hevc.encodeIFrame(1, 1, _ => Quad(Seq(
      HIntraSplit8(1, Seq(1, 0, 0, 0)),
      HIntra(1), HIntra(1), HIntra(1))), qp = 28, depthIntra = 1)
    val Some((_, _, luma)) = Hevc.decodeIFrameLuma(es): @unchecked
    val want = Array(
      Array(1, 2, 2, 2), Array(2, 3, 4, 5),
      Array(2, 4, 5, 6), Array(2, 5, 6, 7))
    for (y <- 0 until 4; x <- 0 until 4)
      assert(luma(y * 16 + x) == 128 + want(y)(x), s"($x,$y)")
  }

  test("angular prediction: vertical (26) and horizontal (10) copy " +
      "their references with the boundary filter; mode 14 " +
      "interpolates the left ramp with the invAngle projection") {
    // q0 = PCM row ramp 50 + 2y; q1 = mode 10 (horizontal): rows of
    // the q0 right column; q2 = mode 26 (vertical): flat 64 from
    // q0's bottom row; q3 = mode 14 over q1/q2 edges
    val es = Hevc.encodeIFrame(1, 1, _ => Quad(Seq(
      HPcm((_, y) => 50 + 2 * y),
      HIntra(10), HIntra(26), HIntra(1))))
    val Some((_, _, luma)) = Hevc.decodeIFrameLuma(es): @unchecked
    for (y <- 0 until 8; x <- 0 until 8) {
      assert(luma(y * 16 + 8 + x) == 50 + 2 * y, s"q1 H ($x,$y)")
      assert(luma((y + 8) * 16 + x) == 64, s"q2 V ($x,$y)")
    }
    // mode 14 on a ramp: hand-computed pixels (angle -13, invAngle
    // -630; left' ref from the q0 ramp, projected top flat 50)
    val es2 = Hevc.encodeIFrame(2, 1, ctb =>
      if (ctb == 0) Quad(Seq(
        HPcm((_, y) => 50 + 2 * y), HIntra(14),
        HIntra(1), HIntra(1)))
      else Leaf(HIntra(1)))
    val Some((_, _, l2)) = Hevc.decodeIFrameLuma(es2): @unchecked
    def q1(x: Int, y: Int) = l2(y * 32 + 8 + x)
    assert(q1(0, 0) == 50, "x0 y0: (13*50 + 19*50 + 16)>>5")
    assert(q1(0, 2) == 53, "x0 y2: (13*52 + 19*54 + 16)>>5")
    assert(q1(1, 0) == 50, "x1 y0: (26*50 + 6*50 + 16)>>5")
    assert(q1(1, 3) == 54, "x1 y3: (26*54 + 6*56 + 16)>>5")
    assert(q1(7, 0) == 50, "x7 y0: projected top refs, flat 50")
    assert(q1(7, 7) == 58, "x7 y7: (8*56 + 24*58 + 16)>>5")
  }

  test("multi-coefficient residual round-trips through the full " +
      "significance map / greater1 / greater2 / remaining chain, " +
      "pinned by transform linearity") {
    // coefficients spread across sub-blocks of a 16x16 TU: exercises
    // coded_sub_block_flag, the sig-ctx patterns, last-position
    // suffixes and the remaining escape. The inverse transform is
    // LINEAR (qp 4 levels stay far from every clip), so the
    // multi-coefficient surface must equal the per-coefficient
    // surfaces summed — each single stream takes a different entropy
    // path, which pins the whole chain, not just determinism.
    val coeffs = Seq((0, 4), (1, -1), (16, 2), (17, 1), (5 * 16 + 5, -8),
      (10 * 16 + 2, 7), (15 * 16 + 15, 1))
    def decode(cs: Seq[(Int, Int)]): Array[Int] = {
      val es = Hevc.encodeIFrame(1, 1, _ =>
        Leaf(HIntraCoded(1, cs)), qp = 4)
      val out = Hevc.decodeIFrameLuma(es)
      assert(out.nonEmpty, s"stream with $cs must decode")
      out.get._3
    }
    val multi = decode(coeffs)
    assert(multi.distinct.length >= 3, "non-trivial residual surface")
    // per-stage transform rounding is not additive, so the stream
    // pin is decode-success + determinism; the COEFFICIENT layer is
    // pinned exactly by the round-trip property test below
    assert(decode(coeffs).sameElements(multi))
  }

  test("residual_coding coefficient round-trip property: seeded " +
      "random sparse blocks over every TU size and scan survive " +
      "encode -> decode exactly (incl. Golomb-Rice escapes)") {
    import graft.ext.{H264Cabac, Hevc => HV}
    val rnd = new java.util.Random(0x8E5D)
    var trial = 0
    while (trial < 120) {
      val log2 = 2 + rnd.nextInt(4)
      val scan = rnd.nextInt(3)
      val nT = 1 << log2
      val coef = new Array[Int](nT * nT)
      val nCoef = 1 + rnd.nextInt(math.min(24, nT * nT))
      var placed = 0
      while (placed < nCoef) {
        val p = rnd.nextInt(nT * nT)
        if (coef(p) == 0) {
          val mag = 1 + (if (rnd.nextInt(4) == 0) rnd.nextInt(900)
          else rnd.nextInt(4))
          coef(p) = if (rnd.nextBoolean()) mag else -mag
          placed += 1
        }
      }
      val encCtx = HV.ctxPool(28)
      val enc = new H264Cabac.Enc
      HV.putResidual(enc, encCtx, log2, scan, coef)
      enc.terminate(bin = true) // flush
      val bits = scala.collection.mutable.ArrayBuffer.empty[Int]
      enc.drain(bits += _)
      val bytes = new Array[Byte]((bits.length + 7) / 8)
      for (i <- bits.indices if bits(i) == 1)
        bytes(i >> 3) = (bytes(i >> 3) | (1 << (7 - (i & 7)))).toByte
      val decCtx = HV.ctxPool(28)
      val dec = new H264Cabac.Dec(bytes, 0)
      assert(dec.valid, s"trial $trial init")
      val got = HV.residualCoding(dec, decCtx, log2, 0, scan)
      assert(got != null, s"trial $trial log2=$log2 scan=$scan decoded null")
      assert(got.sameElements(coef),
        s"trial $trial log2=$log2 scan=$scan coefficient mismatch")
      trial += 1
    }
  }

  test("PART_NxN: four 4x4 PUs with their own modes — hand-computed " +
      "V/V/H/angular cascade over ramp neighbors") {
    // CTU quadrants: q0 = x-ramp PCM, q1 = x-ramp continuation,
    // q2 = y-ramp PCM, q3 = NxN with PUs (26 V, 26 V, 10 H, 2).
    // Hand-derived per 8.4.4.2.6 + the mode-26/10 boundary filters:
    //  PU0 (8..11, 8..11) V: cols [boundary-filtered, 78, 80, 82];
    //    col 8 rows = 76 + ((q2RightCol - 74) >> 1) = [139,137,136,134]
    //  PU1 V: flat cols [84, 86, 88, 90] (boundary filter is 0: its
    //    left ref is PU0's flat 82 col and corner 82)
    //  PU2 (8..11, 12..15) H: rows [159/131/132/133 (filtered row
    //    12), 185, 182, 179]
    //  PU3 (12..15, 12..15) mode 2: pred[x][y] = left(x + y + 1)
    //    over PU2's right col extended by substitution = 179
    val es = Hevc.encodeIFrame(1, 1, _ => Quad(Seq(
      HPcm((x, _) => 60 + 2 * x),
      HPcm((x, _) => 60 + 2 * (x + 8)),
      HPcm((_, y) => 200 - 3 * y),
      HIntraNxN(Seq(26, 26, 10, 2)))))
    val Some((_, _, l)) = Hevc.decodeIFrameLuma(es): @unchecked
    def px(x: Int, y: Int) = l(y * 16 + x)
    // PU0
    assert(Seq(px(8, 8), px(8, 9), px(8, 10), px(8, 11)) ==
      Seq(139, 137, 136, 134), "PU0 filtered col 8")
    for (y <- 8 to 11; x <- 9 to 11)
      assert(px(x, y) == 60 + 2 * x, s"PU0 V ($x,$y)")
    // PU1
    for (y <- 8 to 11; x <- 12 to 15)
      assert(px(x, y) == 60 + 2 * x, s"PU1 V ($x,$y)")
    // PU2
    assert(Seq(px(8, 12), px(9, 12), px(10, 12), px(11, 12)) ==
      Seq(159, 131, 132, 133), "PU2 filtered row 12")
    for (y <- 13 to 15; x <- 8 to 11)
      assert(px(x, y) == 200 - 3 * (y - 8), s"PU2 H ($x,$y)")
    // PU3: left = PU2 right col [133, 185, 182, 179] + substitution
    val lf = Seq(133, 185, 182, 179, 179, 179, 179, 179)
    for (y <- 0 until 4; x <- 0 until 4)
      assert(px(12 + x, 12 + y) == lf(x + y + 1), s"PU3 ($x,$y)")
  }

  test("PART_NxN with a DST residual on PU0: flat DC PUs carry the " +
      "hand-computed 4x4 basis ramp and the rest stays deterministic") {
    val es = Hevc.encodeIFrame(1, 1, _ => Quad(Seq(
      HPcm((_, _) => 100), HPcm((_, _) => 100), HPcm((_, _) => 100),
      HIntraNxN(Seq(1, 1, 1, 1), Seq(1, 0, 0, 0)))))
    val Some((_, _, l)) = Hevc.decodeIFrameLuma(es): @unchecked
    val want = Array(
      Array(1, 2, 2, 2), Array(2, 3, 4, 5),
      Array(2, 4, 5, 6), Array(2, 5, 6, 7))
    for (y <- 0 until 4; x <- 0 until 4)
      assert(l((8 + y) * 16 + 8 + x) == 100 + want(y)(x),
        s"PU0 DST ($x,$y)")
    val again = Hevc.decodeIFrameLuma(es)
    assert(again.get._3.sameElements(l), "deterministic")
  }

  test("angular + coded CTUs survive the corruption fuzz (degrade or " +
      "truncate, never throw)") {
    val base = Hevc.encodeIFrame(2, 1, ctb =>
      if (ctb == 0) Quad(Seq(HPcm((x, y) => 40 + x + y),
        HIntra(30), HIntraSplit8(10, Seq(2, 0, -1, 3)),
        HIntraNxN(Seq(1, 26, 10, 0), Seq(0, 1, 0, -2))))
      else Leaf(HIntraCoded(26, Seq((0, 5), (3, -2)))),
      qp = 28, depthIntra = 1)
    assert(Hevc.decodeIFrameLuma(base).nonEmpty, "clean stream decodes")
    val rnd = new java.util.Random(0x8EBC15)
    var trials = 0
    while (trials < 200) {
      val m = base.clone()
      if (trials % 2 == 0) {
        val i = rnd.nextInt(m.length)
        m(i) = (m(i) ^ (1 << rnd.nextInt(8))).toByte
        assert(Hevc.decodeFramesLuma(m, 4).length <= 4)
      } else {
        val cut = 1 + rnd.nextInt(m.length - 1)
        assert(Hevc.decodeFramesLuma(m.take(cut), 4).length <= 4)
      }
      trials += 1
    }
  }

  test("degrades: truncation keeps prior frames and never throws; " +
      "corruption fuzz (150 trials) never throws or over-emits") {
    def pix(x: Int, y: Int): Int = (40 + 3 * x + 5 * y) % 256
    val base = Hevc.encodeIFrame(1, 1, _ => Quad(Seq(
      HPcm(pix), HIntra(1), HIntra(0), HIntra(1))))
    assert(Hevc.decodeFramesLuma(base, 2).length == 1)
    // truncations: either nothing or the exact full frame
    val full = Hevc.decodeIFrameLuma(base).get._3
    var cut = base.length - 1
    while (cut > base.length - 20 && cut > 1) {
      val out = Hevc.decodeIFrameLuma(base.take(cut))
      assert(out.isEmpty || out.get._3.sameElements(full), s"cut $cut")
      cut -= 1
    }
    val rnd = new java.util.Random(0x4EBC)
    var trials = 0
    while (trials < 150) {
      val m = base.clone()
      val kind = trials % 3
      if (kind == 0) {
        val i = rnd.nextInt(m.length)
        m(i) = (m(i) ^ (1 << rnd.nextInt(8))).toByte
      } else if (kind == 1) {
        val at = rnd.nextInt(m.length)
        val len = math.min(1 + rnd.nextInt(8), m.length - at)
        var i = 0
        while (i < len) { m(at + i) = rnd.nextInt(256).toByte; i += 1 }
      }
      val lim = if (kind == 2) 1 + rnd.nextInt(m.length - 1) else m.length
      assert(Hevc.decodeFramesLuma(m.take(lim), 4).length <= 4)
      trials += 1
    }
  }

  test("chroma reconstruction (round 16): PCM chroma round-trips; a " +
      "chroma DC on a DM-DC CU adds exactly 4c per sample at qp 28") {
    import graft.ext.Hevc._
    // CTU = Quad(PCM, PCM, vertical, coded-DC): chroma plane 8x8.
    // PCM CUs carry a flat 100/200 chroma; CU2 (DM = mode 26,
    // vertical) predicts its chroma from CU0's bottom chroma row
    // (= 100); CU3 (DM = DC) predicts from CU2's right column (100)
    // and CU1's bottom row (200) -> DC = (4*100 + 4*200 + 4) >> 3 =
    // 150 (no chroma boundary smoothing), plus the dequant chain
    // 4*cb / 4*cr.
    val es = encodeIFrame(1, 1, _ => Quad(Seq(
      HPcm((_, _) => 90, (_, _) => 100, (_, _) => 100),
      HPcm((_, _) => 90, (_, _) => 200, (_, _) => 200),
      HIntra(26),
      HIntraCoded(1, Seq((0, 2)), cbDc = 3, crDc = -5))))
    val fs = Hevc.decodeFramesYuv(es, 2)
    assert(fs.length == 1)
    val (w, h, _, cb, cr) = fs.head
    assert(w == 16 && h == 16)
    for (y <- 0 until 4; x <- 0 until 4) {
      assert(cb(y * 8 + x) == 100, s"cb q0 ($x,$y): ${cb(y * 8 + x)}")
      assert(cb(y * 8 + 4 + x) == 200, s"cb q1 ($x,$y)")
      assert(cb((y + 4) * 8 + x) == 100, s"cb q2 ($x,$y): ${cb((y + 4) * 8 + x)}")
      assert(cb((y + 4) * 8 + 4 + x) == 150 + 12,
        s"cb q3 ($x,$y): ${cb((y + 4) * 8 + 4 + x)}")
      assert(cr((y + 4) * 8 + 4 + x) == 150 - 20,
        s"cr q3 ($x,$y): ${cr((y + 4) * 8 + 4 + x)}")
    }
  }

  test("chroma DM angular: vertical mode copies the neighbor's bottom " +
      "chroma row without the luma-only edge filter") {
    import graft.ext.Hevc._
    // CU0's chroma is a horizontal ramp; CU2 below it (mode 26) must
    // copy cbPix(x, 3) down every row EXACTLY (the 8.4.4.2.6 edge
    // filter is luma-only; left refs differ so a filtered first
    // column would deviate)
    val es = encodeIFrame(1, 1, _ => Quad(Seq(
      HPcm((_, _) => 90, (x, y) => 60 + 10 * x + 2 * y, (_, _) => 128),
      HPcm((_, _) => 90),
      HIntra(26),
      HIntra(1))))
    val fs = Hevc.decodeFramesYuv(es, 2)
    assert(fs.length == 1)
    val cb = fs.head._4
    for (y <- 4 until 8; x <- 0 until 4)
      assert(cb(y * 8 + x) == 60 + 10 * x + 6,
        s"($x,$y): ${cb(y * 8 + x)} != ${60 + 10 * x + 6}")
  }

  test("chroma QP table: qp 34 maps to QPc 33 (dequant 912c -> " +
      "residual 7c-ish, hand-computed)") {
    import graft.ext.Hevc._
    // qp 34: luma ls = 64 << 5; chroma QPc = 33, ls(3) = 57:
    // dq = 912c; DC-only 4x4 DCT: mid = (64*912c + 64) >> 7 = 456c,
    // out = (64*456c + 2048) >> 12 -> c = 1: 7, c = -1: -7
    val es = encodeIFrame(1, 1, _ => Quad(Seq(
      HPcm((_, _) => 90), HPcm((_, _) => 90), HIntra(26),
      HIntraCoded(1, Seq((0, 2)), cbDc = 1, crDc = -1))),
      qp = 34)
    val fs = Hevc.decodeFramesYuv(es, 2)
    assert(fs.length == 1)
    val (_, _, _, cb, cr) = fs.head
    // CU3 chroma pred: DC of 128-neighbors = 128
    for (y <- 4 until 8; x <- 4 until 8) {
      assert(cb(y * 8 + x) == 128 + 7, s"cb ($x,$y): ${cb(y * 8 + x)}")
      assert(cr(y * 8 + x) == 128 - 7, s"cr ($x,$y): ${cr(y * 8 + x)}")
    }
  }

  test("deblocking weak filter (8.7.2.5.4): a 12-step CU edge at qp 28 " +
      "smooths to the hand formula; the no-filter control keeps it sharp") {
    import graft.ext.Hevc._
    def mk(deblock: Boolean) = encodeIFrame(2, 1, {
      case 0 => Leaf(HPcm((_, _) => 60, (_, _) => 100, (_, _) => 100))
      case _ => Leaf(HPcm((_, _) => 72, (_, _) => 140, (_, _) => 140))
    }, deblock = deblock)
    val off = Hevc.decodeFramesYuv(mk(false), 1).head
    for (y <- 0 until 16) {
      assert(off._3(y * 32 + 15) == 60 && off._3(y * 32 + 16) == 72)
      if (y < 8) assert(off._4(y * 16 + 7) == 100 && off._4(y * 16 + 8) == 140)
    }
    val on = Hevc.decodeFramesYuv(mk(true), 1).head
    // beta(28) = 18, tc(30) = 2; |p0-q0| = 12 >= (5tc+1)>>1 = 5 -> weak:
    // delta = (9*12 - 3*12 + 8) >> 4 = 5 -> clip 2; dEp1/dEq1 on ->
    // p1 += 1, q1 -= 1
    val wantRow = Array.fill(32)(60)
    for (x <- 16 until 32) wantRow(x) = 72
    wantRow(14) = 61; wantRow(15) = 62; wantRow(16) = 70; wantRow(17) = 71
    for (y <- 0 until 16; x <- 0 until 32)
      assert(on._3(y * 32 + x) == wantRow(x),
        s"($x,$y): ${on._3(y * 32 + x)} != ${wantRow(x)}")
    // chroma (16-grid edge): tcC = 2; delta = ((40<<2) + 100 - 140 + 4)
    // >> 3 = 15 -> clip 2
    for (y <- 0 until 8) {
      assert(on._4(y * 16 + 7) == 102, s"cb p0 row $y: ${on._4(y * 16 + 7)}")
      assert(on._4(y * 16 + 8) == 138, s"cb q0 row $y")
      assert(on._4(y * 16 + 6) == 100 && on._4(y * 16 + 9) == 140)
    }
  }

  test("deblocking strong filter: a 4-step edge passes the strong " +
      "checks and runs the 3-tap chain on three samples per side") {
    import graft.ext.Hevc._
    val es = encodeIFrame(2, 1, {
      case 0 => Leaf(HPcm((_, _) => 60))
      case _ => Leaf(HPcm((_, _) => 64))
    }, deblock = true)
    val luma = Hevc.decodeFramesYuv(es, 1).head._3
    // |p0-q0| = 4 < 5, flatness zero -> strong:
    // p2' = (7*60 + 64 + 4) >> 3 = 61, p1' = (3*60 + 64 + 2) >> 2 = 61,
    // p0' = (5*60 + 3*64 + 4) >> 3 = 62, q0' = 63, q1' = 63, q2' = 64
    val want = Array.fill(32)(60)
    for (x <- 16 until 32) want(x) = 64
    want(13) = 61; want(14) = 61; want(15) = 62
    want(16) = 63; want(17) = 63; want(18) = 64
    for (y <- 0 until 16; x <- 0 until 32)
      assert(luma(y * 32 + x) == want(x),
        s"($x,$y): ${luma(y * 32 + x)} != ${want(x)}")
  }

  test("deblocking horizontal edges run after vertical, on a 1x2 stack") {
    import graft.ext.Hevc._
    val es = encodeIFrame(1, 2, {
      case 0 => Leaf(HPcm((_, _) => 60))
      case _ => Leaf(HPcm((_, _) => 72))
    }, deblock = true)
    val luma = Hevc.decodeFramesYuv(es, 1).head._3
    val wantCol = Array.fill(32)(60)
    for (y <- 16 until 32) wantCol(y) = 72
    wantCol(14) = 61; wantCol(15) = 62; wantCol(16) = 70; wantCol(17) = 71
    for (y <- 0 until 32; x <- 0 until 16)
      assert(luma(y * 16 + x) == wantCol(y),
        s"($x,$y): ${luma(y * 16 + x)} != ${wantCol(y)}")
  }

  test("deblocking is an identity on flat content and leaves " +
      "sub-threshold interior TU edges intact (d < beta gate)") {
    import graft.ext.Hevc._
    val flatOff = Hevc.decodeFramesYuv(encodeIFrame(1, 1,
      _ => Quad(Seq(HPcm((_, _) => 90), HPcm((_, _) => 90),
        HIntra(26), HIntra(1)))), 1).head
    val flatOn = Hevc.decodeFramesYuv(encodeIFrame(1, 1,
      _ => Quad(Seq(HPcm((_, _) => 90), HPcm((_, _) => 90),
        HIntra(26), HIntra(1))), deblock = true), 1).head
    assert(flatOn._3.sameElements(flatOff._3))
    assert(flatOn._4.sameElements(flatOff._4))
    assert(flatOn._5.sameElements(flatOff._5))
  }

  test("SAO band offset (8.7.3): samples inside the 4-band window " +
      "shift by their band's signed offset; outside stays put") {
    import graft.ext.Hevc._
    // flat 90 = band 11; flat 130 = band 16. Window at bandPos 10
    // covers bands 10-13 with offsets (1, 3, -2, 0): band 11 -> +3;
    // band 16 untouched.
    val es = encodeIFrame(2, 1, {
      case 0 => Leaf(HPcm((_, _) => 90))
      case _ => Leaf(HPcm((_, _) => 130))
    }, sao = Some(HSaoBand(Seq(1, 3, -2, 0), 10)))
    val luma = Hevc.decodeFramesYuv(es, 1).head._3
    for (y <- 0 until 16; x <- 0 until 32) {
      val want = if (x < 16) 93 else 130
      assert(luma(y * 32 + x) == want, s"($x,$y): ${luma(y * 32 + x)}")
    }
  }

  test("SAO edge offset class 0: local minima/maxima along the row " +
      "move by the +/- offsets; picture-boundary columns are skipped") {
    import graft.ext.Hevc._
    // luma row pattern by PCM: 80 at even x, 84 at odd x -> along
    // class 0 (horizontal): even cols are minima (edgeIdx 0 -> +o0),
    // odd cols maxima (edgeIdx 4 -> -o3); x = 0 and x = 15 of each
    // row have no out-of-picture neighbor handling issue except the
    // true picture edges (x = 0, x = 31) which stay unmodified.
    val es = encodeIFrame(2, 1, i => Leaf(HPcm(
      (x, _) => if (((x + i * 16) & 1) == 0) 80 else 84)),
      sao = Some(HSaoEdge(Seq(2, 1, 1, 3), 0)))
    val luma = Hevc.decodeFramesYuv(es, 1).head._3
    for (y <- 0 until 16; x <- 0 until 32) {
      val want =
        if (x == 0 || x == 31) (if ((x & 1) == 0) 80 else 84)
        else if ((x & 1) == 0) 82 // min: +2
        else 81 // max: -3
      assert(luma(y * 32 + x) == want, s"($x,$y): ${luma(y * 32 + x)}")
    }
  }

  test("SAO rides the deblocked picture: filter + band offset compose") {
    import graft.ext.Hevc._
    // the weak-filter 60|72 step from the deblock spec, then a band
    // window covering band 7 (56-63) with +4: deblocked values 60,
    // 61, 62 sit in band 7 -> +4; 70, 71, 72 in band 8/9 untouched.
    val es = encodeIFrame(2, 1, {
      case 0 => Leaf(HPcm((_, _) => 60))
      case _ => Leaf(HPcm((_, _) => 72))
    }, deblock = true, sao = Some(HSaoBand(Seq(4, 0, 0, 0), 7)))
    val luma = Hevc.decodeFramesYuv(es, 1).head._3
    val want = Array.fill(32)(64)
    for (x <- 16 until 32) want(x) = 72
    want(14) = 65; want(15) = 66; want(16) = 70; want(17) = 71
    for (y <- 0 until 16; x <- 0 until 32)
      assert(luma(y * 32 + x) == want(x),
        s"($x,$y): ${luma(y * 32 + x)} != ${want(x)}")
  }

  test("P slice (round 16): skip CUs copy the reference; an explicit " +
      "zero-MV CU with a 16x16 DC adds exactly c at qp 28") {
    import graft.ext.Hevc._
    val es = encodeIPStream(1, 1,
      _ => Leaf(HPcm((x, y) => 40 + 3 * x + y,
        (x, y) => 60 + 2 * x, (x, y) => 200 - 2 * y)),
      Seq(_ => HPMv(0, 0, dc = 5), _ => HPSkip(0)))
    val fs = Hevc.decodeFramesYuv(es, 4)
    assert(fs.length == 3, s"frames: ${fs.length}")
    val i0 = fs(0)
    val p1 = fs(1)
    val p2 = fs(2)
    for (y <- 0 until 16; x <- 0 until 16) {
      assert(p1._3(y * 16 + x) == i0._3(y * 16 + x) + 5,
        s"P1 ($x,$y): ${p1._3(y * 16 + x)}")
      assert(p2._3(y * 16 + x) == p1._3(y * 16 + x), s"P2 ($x,$y)")
    }
    // chroma rides the zero-MV copy untouched (no chroma residual)
    for (y <- 0 until 8; x <- 0 until 8) {
      assert(p1._4(y * 8 + x) == i0._4(y * 8 + x), s"cb ($x,$y)")
      assert(p2._5(y * 8 + x) == i0._5(y * 8 + x), s"cr ($x,$y)")
    }
  }

  test("P slice integer-MV motion: a +2-sample shift reads the " +
      "reference with right-edge clamp") {
    import graft.ext.Hevc._
    val es = encodeIPStream(1, 1,
      _ => Leaf(HPcm((x, _) => 40 + 10 * x)),
      Seq(_ => HPMv(8, 0))) // +2 luma samples
    val fs = Hevc.decodeFramesYuv(es, 4)
    assert(fs.length == 2)
    val ref = fs(0)._3
    val p = fs(1)._3
    for (y <- 0 until 16; x <- 0 until 16) {
      val sx = math.min(15, x + 2)
      assert(p(y * 16 + x) == ref(y * 16 + sx),
        s"($x,$y): ${p(y * 16 + x)} != ${ref(y * 16 + sx)}")
    }
  }

  test("P slice half-pel MC: the 8-tap filter lands on the exact " +
      "midpoint of a slope-2 ramp (interior columns)") {
    import graft.ext.Hevc._
    val es = encodeIPStream(2, 1,
      i => Leaf(HPcm((x, _) => 40 + 2 * (x + 16 * i))),
      Seq(_ => HPMv(2, 0))) // half-pel horizontal
    val fs = Hevc.decodeFramesYuv(es, 4)
    assert(fs.length == 2)
    val p = fs(1)._3
    for (y <- 0 until 16; x <- 4 until 27) // away from clamp regions
      assert(p(y * 32 + x) == 40 + 2 * x + 1,
        s"($x,$y): ${p(y * 32 + x)} != ${40 + 2 * x + 1}")
  }

  test("P slice merge: a skip CU inherits its left neighbor's " +
      "explicit motion through candidate A1") {
    import graft.ext.Hevc._
    // CTU0 carries mv (+8, 0) = +2 samples; CTU1 = skip idx 0 whose
    // A1 candidate is CTU0's motion -> both shift by +2
    val es = encodeIPStream(2, 1,
      i => Leaf(HPcm((x, _) => ((x + 16 * i) * 7) % 200)),
      Seq(i => if (i == 0) HPMv(8, 0) else HPSkip(0)))
    val fs = Hevc.decodeFramesYuv(es, 4)
    assert(fs.length == 2)
    val ref = fs(0)._3
    val p = fs(1)._3
    for (y <- 0 until 16; x <- 0 until 32) {
      val sx = math.min(31, x + 2)
      assert(p(y * 32 + x) == ref(y * 32 + sx),
        s"($x,$y): ${p(y * 32 + x)} != ${ref(y * 32 + sx)}")
    }
  }

  test("P-slice corruption fuzz: 120 mutations of an I-P stream " +
      "degrade or truncate, never throw") {
    import graft.ext.Hevc._
    val base = encodeIPStream(2, 1,
      i => Leaf(HPcm((x, y) => (40 + 3 * x + 5 * y + i) % 250)),
      Seq(_ => HPMv(5, -3, dc = 2), i => HPSkip(i % 2)))
    val rnd = new java.util.Random(0x9E5C)
    for (t <- 0 until 120) {
      val m = base.clone()
      t % 3 match {
        case 0 =>
          val i = rnd.nextInt(m.length)
          m(i) = (m(i) ^ (1 << rnd.nextInt(8))).toByte
          assert(Hevc.decodeFramesLuma(m, 4).length <= 4)
        case 1 =>
          val cut = 1 + rnd.nextInt(m.length - 1)
          assert(Hevc.decodeFramesLuma(m.take(cut), 4).length <= 4)
        case _ =>
          val at = rnd.nextInt(m.length)
          val len = math.min(1 + rnd.nextInt(8), m.length - at)
          var i = 0
          while (i < len) { m(at + i) = rnd.nextInt(256).toByte; i += 1 }
          assert(Hevc.decodeFramesLuma(m, 4).length <= 4)
      }
    }
  }
}
