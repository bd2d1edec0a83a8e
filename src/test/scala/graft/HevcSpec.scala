package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Hevc
import graft.ext.Hevc.{HIntra, HPcm, Leaf, Quad}

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
}
