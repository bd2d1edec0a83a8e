package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ext.H264
import graft.ext.H264.{BBi, BBwd, BDirect, BFwd, BFwdCoded, BIntra, BSkip,
  BSubBi, BSubDirect, BSubL0, BSubL04x4, BSubL1, B16x8, B8x8, Bf, I16Dc,
  Pcm, Pf, PMove, PMoveCoded}

/** H.264 B-slice contracts (round 14). Decode order I, P, B with
  * display order I, B, P: the B's list 0 resolves (by POC) to the
  * EARLIER anchor (I) and list 1 to the LATER one (P), so every
  * expectation is a closed form over the two anchor planes:
  *  - I = PCM quadrants q(b) (exact).
  *  - P = zero-MV copy of I plus one DC coefficient z per 4x4 block:
  *    at qp 28, +4z per sample (the r13 inter-residual rule).
  *  - B_L0 (fwd) == I pixels; B_L1 (bwd) == P pixels; B_Bi == the
  *    rounded average (I + P + 1) >> 1; B_L0 + residual == I + 4z.
  */
class H264BSpec extends AnyFunSuite {

  /** quadrant values bounded so residuals never clip. */
  private def q(id: Int)(b: Int): Int = ((id * 11 + 4 * b + 60) % 180) + 20

  private def ipbStream(id: Int, bMb: Int => H264.MbB) =
    H264.encodeIPBStream(1, 1,
      _ => Pcm((x, y) => q(id)((y / 8) * 2 + x / 8)),
      Seq(
        Pf(_ => PMoveCoded(0, 0, blk => (id + blk) % 5 - 2)),
        Bf(bMb, pocLsb = 1)))

  private def pcmPlane(id: Int): Array[Int] =
    Array.tabulate(256)(k => q(id)((k / 16 / 8) * 2 + (k % 16) / 8))

  private def pPlane(id: Int): Array[Int] = {
    val i = pcmPlane(id)
    Array.tabulate(256) { k =>
      val x = k % 16; val y = k / 16
      val blk = ((y / 4 / 2) * 2 + (x / 4 / 2)) * 4 +
        ((y / 4 % 2) * 2 + (x / 4 % 2)) // z-order 4x4 block index
      i(k) + 4 * ((id + blk) % 5 - 2)
    }
  }

  test("B_L0 / B_L1 / B_Bi / B_L0+residual: closed-form against the " +
      "two anchors, decode order I P B with POC-built lists") {
    for (id <- Seq(3, 7, 12)) {
      val iExp = pcmPlane(id)
      val pExp = pPlane(id)
      def check(bMb: Int => H264.MbB, exp: Int => Int, tag: String): Unit = {
        val fs = H264.decodeFramesLuma(ipbStream(id, bMb), 4)
        assert(fs.map(_._4) == Seq('I', 'P', 'B'), s"$tag types ${fs.map(_._4)}")
        val b = fs(2)._3
        var k = 0
        while (k < 256) {
          assert(b(k) == exp(k), s"$tag id $id px $k: ${b(k)} != ${exp(k)}")
          k += 1
        }
      }
      check(_ => BFwd(0, 0), iExp, "fwd")
      check(_ => BBwd(0, 0), pExp, "bwd")
      check(_ => BBi((0, 0), (0, 0)),
        k => (iExp(k) + pExp(k) + 1) >> 1, "bi")
      check(_ => BFwdCoded(0, 0, blk => blk % 3 - 1),
        k => {
          val x = k % 16; val y = k / 16
          val blk = ((y / 8) * 2 + (x / 8)) * 4 + ((y / 4 % 2) * 2 + (x / 4 % 2))
          iExp(k) + 4 * (blk % 3 - 1)
        }, "fwd+res")
    }
  }

  test("B16x8 mixed lists: top partition from L0 (I), bottom from L1 " +
      "(P) — the two-pass ref/mvd syntax") {
    val id = 5
    val iExp = pcmPlane(id)
    val pExp = pPlane(id)
    val fs = H264.decodeFramesLuma(
      ipbStream(id, _ => B16x8(0, (0, 0), 1, (0, 0))), 4)
    assert(fs.map(_._4) == Seq('I', 'P', 'B'))
    val b = fs(2)._3
    for (k <- 0 until 256) {
      val exp = if (k / 16 < 8) iExp(k) else pExp(k)
      assert(b(k) == exp, s"px $k")
    }
    // and the (L1, L0) mirror
    val fs2 = H264.decodeFramesLuma(
      ipbStream(id, _ => B16x8(1, (0, 0), 0, (0, 0))), 4)
    val b2 = fs2(2)._3
    for (k <- 0 until 256) {
      val exp = if (k / 16 < 8) pExp(k) else iExp(k)
      assert(b2(k) == exp, s"mirror px $k")
    }
  }

  test("B motion: forward MC with a real vector hits the shifted " +
      "anchor sample (16px left of a 32-wide PCM gradient)") {
    val es = H264.encodeIPBStream(2, 1,
      mb => Pcm((x, y) => 20 + 3 * (x + 16 * (mb % 2)) + y), // global-x ramp
      Seq(
        Pf(_ => graft.ext.H264.PMove(0, 0)),
        Bf(_ => BFwd(-64, 0), pocLsb = 1))) // -16 px in quarter-pel
    val fs = H264.decodeFramesLuma(es, 4)
    assert(fs.map(_._4) == Seq('I', 'P', 'B'))
    val i = fs(0)._3
    val b = fs(2)._3
    // MB1 of the B frame (x >= 16) should equal MB0 of the I frame;
    // MB0 clamps to the left edge column values
    for (y <- 0 until 16; x <- 16 until 32)
      assert(b(y * 32 + x) == i(y * 32 + x - 16), s"($x,$y)")
  }

  test("non-reference B stays out of the DPB: a later P references " +
      "the PREVIOUS P, not the B") {
    val id = 9
    val es = H264.encodeIPBStream(1, 1,
      _ => Pcm((x, y) => q(id)((y / 8) * 2 + x / 8)),
      Seq(
        Pf(_ => PMoveCoded(0, 0, blk => (id + blk) % 5 - 2)),
        Bf(_ => BBi((0, 0), (0, 0)), pocLsb = 1),
        // P2 copies P1; if the B had entered the DPB this would MC
        // from the average plane instead
        Pf(_ => graft.ext.H264.PMove(0, 0))))
    val fs = H264.decodeFramesLuma(es, 6)
    assert(fs.map(_._4) == Seq('I', 'P', 'B', 'P'))
    assert(fs(3)._3.sameElements(fs(1)._3),
      "P2 must reproduce P1 exactly (B never referenced)")
  }

  test("B intra refresh (mb_type offset 23) and degrade containment " +
      "on a truncated B NAL") {
    val id = 4
    // intra refresh inside a B slice decodes via the shared I16 path
    val fs = H264.decodeFramesLuma(ipbStream(id, _ => BIntra(I16Dc(3))), 4)
    assert(fs.map(_._4) == Seq('I', 'P', 'B'))
    assert(fs(2)._3.forall(_ == 131), "I16Dc(3) with no neighbors = 131")
    // degrade containment: a failing B slice must keep the exact
    // frames already decoded (direct/B_8x8/filtered degrades are
    // exercised per-byte by the fuzz suite below; here pin the
    // walk-level contract with a truncation inside the B NAL)
    val base = ipbStream(id, _ => BBi((0, 0), (0, 0)))
    val cut = H264.decodeFramesLuma(base.dropRight(3), 4)
    assert(cut.map(_._4) == Seq('I', 'P'),
      s"truncated B keeps I+P: ${cut.map(_._4)}")
  }

  test("explicit weighted bipred (idc 1): single-list weights apply " +
      "per 8.4.2.3.2 and Bi combines with the two-sided formula") {
    val id = 8
    val iExp = pcmPlane(id)
    val pExp = pPlane(id)
    val sep = Array[Byte](0, 0, 0, 1)
    val (denom, w0, o0, w1, o1) = (1, 3, 4, 1, -2)
    def stream(bMb: Int => H264.MbB) =
      sep ++ H264.spsNal(1, 1, maxRef = 2) ++
        sep ++ H264.ppsNal(28, bipredExplicit = true) ++
        sep ++ H264.idrNal(1, 1,
          _ => Pcm((x, y) => q(id)((y / 8) * 2 + x / 8)), 28) ++
        sep ++ H264.pNal(1, 1,
          _ => PMoveCoded(0, 0, blk => (id + blk) % 5 - 2), 28,
          frameNum = 1) ++
        sep ++ H264.bNal(1, 1, bMb, 28, frameNum = 2, pocLsb = 1,
          weight = Some((denom, w0, o0, w1, o1)))
    def clip(v: Int) = math.max(0, math.min(255, v))
    // single-list L0: ((p*w0 + 1) >> 1) + o0
    val fw = H264.decodeFramesLuma(stream(_ => BFwd(0, 0)), 4)
    assert(fw.map(_._4) == Seq('I', 'P', 'B'))
    for (k <- 0 until 256)
      assert(fw(2)._3(k) == clip(((iExp(k) * w0 + 1) >> 1) + o0), s"fwd $k")
    // single-list L1
    val bw2 = H264.decodeFramesLuma(stream(_ => BBwd(0, 0)), 4)
    for (k <- 0 until 256)
      assert(bw2(2)._3(k) == clip(((pExp(k) * w1 + 1) >> 1) + o1), s"bwd $k")
    // Bi: ((i*w0 + p*w1 + 2^denom) >> (denom+1)) + ((o0+o1+1) >> 1)
    val bi = H264.decodeFramesLuma(stream(_ => BBi((0, 0), (0, 0))), 4)
    for (k <- 0 until 256)
      assert(bi(2)._3(k) == clip(
        ((iExp(k) * w0 + pExp(k) * w1 + (1 << denom)) >> (denom + 1)) +
          ((o0 + o1 + 1) >> 1)), s"bi $k")
  }

  // ---- round 15: spatial direct / B_Skip / B_8x8 / implicit / ----
  // ---- deblocked B -------------------------------------------------

  test("B_Skip and B_Direct_16x16 with no inter neighbors: " +
      "directZeroPrediction averages the two anchors") {
    for (id <- Seq(3, 11)) {
      val iExp = pcmPlane(id)
      val pExp = pPlane(id)
      // 1x1 MB picture: the direct MB has no neighbors at all ->
      // zero-prediction, both lists refIdx 0, mv 0 -> (I + P + 1)>>1
      for ((bMb, tag) <- Seq[(H264.MbB, String)]((BSkip, "skip"),
        (BDirect(), "direct"))) {
        val fs = H264.decodeFramesLuma(ipbStream(id, _ => bMb), 4)
        assert(fs.map(_._4) == Seq('I', 'P', 'B'), s"$tag types")
        for (k <- 0 until 256)
          assert(fs(2)._3(k) == ((iExp(k) + pExp(k) + 1) >> 1),
            s"$tag id $id px $k")
      }
      // direct WITH a residual: average + 4c per 4x4 block at qp 28
      val fr = H264.decodeFramesLuma(
        ipbStream(id, _ => BDirect(blk => blk % 3 - 1)), 4)
      for (k <- 0 until 256) {
        val x = k % 16; val y = k / 16
        val blk = ((y / 8) * 2 + (x / 8)) * 4 +
          ((y / 4 % 2) * 2 + (x / 4 % 2))
        assert(fr(2)._3(k) ==
          ((iExp(k) + pExp(k) + 1) >> 1) + 4 * (blk % 3 - 1),
          s"direct+res id $id px $k")
      }
    }
  }

  test("colZeroFlag true: a static colocated P zeroes the direct " +
      "motion inherited from a moving L0 neighbor") {
    // 2x1 MBs over a global-x luma ramp. MB0 = B_L0 with mv -64
    // (16 px left); MB1 = B_Skip. Spatial direct derives refIdxL0 = 0
    // (MinPositive over MB0), refIdxL1 = -1 (MB0 carries no L1), and
    // mvpL0 = (-64, 0) by the only-A rule — but the colocated P is
    // static refIdx-0 (PMove(0, 0)), so colZeroFlag zeroes the
    // vector: MB1 must equal the I anchor IN PLACE, not shifted.
    val es = H264.encodeIPBStream(2, 1,
      mb => Pcm((x, y) => 20 + 3 * (x + 16 * (mb % 2)) + y),
      Seq(
        Pf(_ => PMove(0, 0)),
        Bf(mb => if (mb == 0) BFwd(-64, 0) else BSkip, pocLsb = 1)),
      colZeroAt = (_, _) => true)
    val fs = H264.decodeFramesLuma(es, 4)
    assert(fs.map(_._4) == Seq('I', 'P', 'B'), s"types ${fs.map(_._4)}")
    val i = fs(0)._3
    val b = fs(2)._3
    for (y <- 0 until 16; x <- 16 until 32)
      assert(b(y * 32 + x) == i(y * 32 + x), s"($x,$y) zeroed motion")
  }

  test("colZeroFlag false: a moving colocated P lets direct keep the " +
      "neighbor-derived vector") {
    // same fixture but the P anchor moves 2 px (mv -8): |mvCol| > 1
    // makes colZeroFlag false, so MB1's direct motion stays (-64, 0)
    // and its L0-only prediction is the I anchor shifted 16 px left.
    val es = H264.encodeIPBStream(2, 1,
      mb => Pcm((x, y) => 20 + 3 * (x + 16 * (mb % 2)) + y),
      Seq(
        Pf(_ => PMove(-8, 0)),
        Bf(mb => if (mb == 0) BFwd(-64, 0) else BSkip, pocLsb = 1)),
      colZeroAt = (_, _) => false)
    val fs = H264.decodeFramesLuma(es, 4)
    assert(fs.map(_._4) == Seq('I', 'P', 'B'))
    val i = fs(0)._3
    val b = fs(2)._3
    for (y <- 0 until 16; x <- 16 until 32)
      assert(b(y * 32 + x) == i(y * 32 + x - 16), s"($x,$y) kept motion")
  }

  test("B_8x8: direct / L0 / L1 / Bi / L0_4x4 quadrants reconstruct " +
      "from their own lists") {
    val id = 7
    val iExp = pcmPlane(id)
    val pExp = pPlane(id)
    val fs = H264.decodeFramesLuma(ipbStream(id, _ => B8x8(Seq(
      BSubL0(0, 0), BSubL1(0, 0), BSubBi((0, 0), (0, 0)),
      BSubDirect))), 4)
    assert(fs.map(_._4) == Seq('I', 'P', 'B'))
    val b = fs(2)._3
    for (k <- 0 until 256) {
      val x = k % 16; val y = k / 16
      // q3 (direct): no MB neighbors on a 1x1 grid -> zero-pred avg
      val exp =
        if (y < 8 && x < 8) iExp(k)
        else if (y < 8) pExp(k)
        else (iExp(k) + pExp(k) + 1) >> 1
      assert(b(k) == exp, s"px $k ($x,$y)")
    }
    // 4x4 sub-partitions: four explicit zero vectors = L0 pixels
    val f2 = H264.decodeFramesLuma(ipbStream(id, _ => B8x8(Seq(
      BSubL04x4(Seq((0, 0), (0, 0), (0, 0), (0, 0))),
      BSubL0(0, 0), BSubL0(0, 0), BSubL0(0, 0)))), 4)
    for (k <- 0 until 256)
      assert(f2(2)._3(k) == iExp(k), s"4x4 px $k")
  }

  test("implicit weighted bipred (idc 2): POC-distance weights " +
      "(w0 96, w1 -32) on an off-center B") {
    val id = 9
    val sep = Array[Byte](0, 0, 0, 1)
    // anchors P1 (poc 2) and P2 (poc 4), zero-MV copies of the IDR
    // with distinct residuals; B at poc 1 -> both anchors are AFTER:
    // L0 = [P1, P2], L1 swaps to [P2, P1]. tb = 1-2 = -1, td = 4-2 =
    // 2 -> DistScaleFactor>>2 = -32 -> w1 = -32, w0 = 96.
    def res1(blk: Int): Int = (id + blk) % 5 - 2
    def res2(blk: Int): Int = (id + 2 * blk) % 7 - 3
    val es = sep ++ H264.spsNal(1, 1, maxRef = 2) ++
      sep ++ H264.ppsNal(28, bipredImplicit = true) ++
      sep ++ H264.idrNal(1, 1,
        _ => Pcm((x, y) => q(id)((y / 8) * 2 + x / 8)), 28) ++
      sep ++ H264.pNal(1, 1, _ => PMoveCoded(0, 0, res1), 28,
        frameNum = 1) ++
      sep ++ H264.pNal(1, 1, _ => PMoveCoded(0, 0, res2), 28,
        frameNum = 2) ++
      sep ++ H264.bNal(1, 1, _ => BBi((0, 0), (0, 0)), 28,
        frameNum = 3, pocLsb = 1)
    val fs = H264.decodeFramesLuma(es, 5)
    assert(fs.map(_._4) == Seq('I', 'P', 'P', 'B'), s"${fs.map(_._4)}")
    val p1 = fs(1)._3 // poc 2 = L0(0)
    val p2 = fs(2)._3 // poc 4 = L1(0)
    def clip(v: Int) = math.max(0, math.min(255, v))
    for (k <- 0 until 256)
      assert(fs(3)._3(k) ==
        clip((p1(k) * 96 + p2(k) * (-32) + 32) >> 6), s"px $k")
  }

  test("B deblocking: bS 0 on same-list same-motion edges (step " +
      "survives), hand-computed bS-1 weak filter across a " +
      "different-picture MB edge") {
    val sep = Array[Byte](0, 0, 0, 1)
    // I = flat 120 (2x1 MBs); P adds +4 on MB0's block 0 only
    // (x 0..3, y 0..3); B deblocks (idc 0, qp 28: alpha 20, beta 7,
    // tC0[bS1] = 1)
    def flatStream(bMb: Int => H264.MbB) =
      sep ++ H264.spsNal(2, 1, maxRef = 2) ++
        sep ++ H264.ppsNal(28) ++
        sep ++ H264.idrNal(2, 1, _ => Pcm((_, _) => 120), 28) ++
        sep ++ H264.pNal(2, 1, mb => PMoveCoded(0, 0,
          blk => if (mb == 0 && blk == 0) 1 else 0), 28,
          frameNum = 1) ++
        sep ++ H264.bNal(2, 1, bMb, 28, frameNum = 2, pocLsb = 1,
          deblock = true)
    // both MBs Bi with identical lists + vectors: every edge bS 0,
    // the +2 step of the averaged block-0 survives un-smoothed
    val fs = H264.decodeFramesLuma(flatStream(_ => BBi((0, 0), (0, 0))), 4)
    assert(fs.map(_._4) == Seq('I', 'P', 'B'), s"${fs.map(_._4)}")
    val b = fs(2)._3
    for (y <- 0 until 16; x <- 0 until 32) {
      val exp = if (x < 4 && y < 4) 122 else 120
      assert(b(y * 32 + x) == exp, s"bS0 ($x,$y)")
    }
    // MB0 L0-only (I: flat 120), MB1 L1-only with mv -64 (P's MB0
    // area: 124 block lands at x 16..19, y 0..3): the x=16 MB edge
    // sees ONE vector each side over DIFFERENT pictures -> bS 1.
    // Rows 0..3 (p side x13..15, q side x16..): p0 = x15 = 120,
    // q0 = x16 = 124 -> delta = (16 - 4 + 4)>>3 = 2 (tc = 1+ap+aq =
    // 3), p0' 122, q0' 122; p1' (x14) = 120 +
    // clip3(+-1, (120+122-240)>>1) = 121; q1' (x17) = 124 +
    // clip3(+-1, (124+122-248)>>1) = 123. The x=20 edge inside MB1
    // (same list, same vector) is bS 0: its 124 -> 120 step survives.
    val fs3 = H264.decodeFramesLuma(flatStream(
      mb => if (mb == 0) BFwd(0, 0) else BBwd(-64, 0)), 4)
    assert(fs3.map(_._4) == Seq('I', 'P', 'B'))
    val b3 = fs3(2)._3
    for (y <- 0 until 4) {
      assert(b3(y * 32 + 13) == 120, s"p2 row $y")
      assert(b3(y * 32 + 14) == 121, s"p1' row $y")
      assert(b3(y * 32 + 15) == 122, s"p0' row $y")
      assert(b3(y * 32 + 16) == 122, s"q0' row $y")
      assert(b3(y * 32 + 17) == 123, s"q1' row $y")
      assert(b3(y * 32 + 18) == 124, s"q2 row $y")
      assert(b3(y * 32 + 19) == 124, s"inside 124 block row $y")
      assert(b3(y * 32 + 20) == 120, s"bS0 step at x=20 row $y")
    }
    for (y <- 4 until 16; x <- 12 until 24)
      assert(b3(y * 32 + x) == 120, s"flat rows ($x,$y)")
  }

  test("long-term reference in a B list: L1(0) resolves to the " +
      "long-term IDR, colZeroFlag stays off, implicit bipred falls " +
      "back to 32/32") {
    val sep = Array[Byte](0, 0, 0, 1)
    // IDR marks itself long-term; P1 (the only short) sits AFTER the
    // B in POC, so listL1 = [P1, IDR-long] == listL0 -> the
    // identical-list swap fronts the LONG-TERM IDR in L1
    def stream(bMb: Int => H264.MbB, implicitW: Boolean) =
      sep ++ H264.spsNal(1, 1, maxRef = 2) ++
        sep ++ H264.ppsNal(28, bipredImplicit = implicitW) ++
        sep ++ H264.idrNal(1, 1, _ => Pcm((x, y) => 50 + 2 * x + y),
          28, longTermRef = true) ++
        sep ++ H264.pNal(1, 1,
          _ => PMoveCoded(0, 0, blk => blk % 5 - 2), 28,
          frameNum = 1) ++
        sep ++ H264.bNal(1, 1, bMb, 28, frameNum = 2, pocLsb = 1)
    val fs = H264.decodeFramesLuma(stream(_ => BBwd(0, 0),
      implicitW = false), 6)
    assert(fs.map(_._4) == Seq('I', 'P', 'B'), s"${fs.map(_._4)}")
    assert(fs(2)._3.sameElements(fs(0)._3),
      "L1(0) must be the long-term IDR")
    // B_Skip: spatial direct with a LONG-TERM colocated picture ->
    // colZeroFlag 0 by rule; with no inter neighbors the derivation
    // is zero-prediction anyway, so pixels are the rounded average
    val fsk = H264.decodeFramesLuma(stream(_ => BSkip,
      implicitW = false), 6)
    assert(fsk.map(_._4) == Seq('I', 'P', 'B'))
    for (k <- 0 until 256)
      assert(fsk(2)._3(k) ==
        ((fsk(1)._3(k) + fsk(0)._3(k) + 1) >> 1), s"skip px $k")
    // implicit bipred against a long-term reference: weights fall
    // back to 32/32, which is EXACTLY the rounded average
    val fim = H264.decodeFramesLuma(stream(_ => BBi((0, 0), (0, 0)),
      implicitW = true), 6)
    assert(fim.map(_._4) == Seq('I', 'P', 'B'))
    for (k <- 0 until 256)
      assert(fim(2)._3(k) ==
        ((fim(1)._3(k) + fim(0)._3(k) + 1) >> 1), s"implicit px $k")
  }

  test("pocType 1: the 8.2.1.2 cycle derivation builds the B lists " +
      "(no POC syntax in any slice header)") {
    // cycle = [4], offset_for_non_ref_pic = -2: I (idr, fn0) poc 0,
    // P (ref, fn1) poc 4, B (non-ref, fn2) poc 4 - 2 = 2 — strictly
    // BETWEEN the anchors, so L0(0) = I and L1(0) = P exactly as in
    // the pocType-0 fixtures. delta_pic_order_always_zero: the slice
    // headers carry zero POC bits.
    val sep = Array[Byte](0, 0, 0, 1)
    def q(b: Int): Int = (7 * 11 + 4 * b + 60) % 180 + 20
    val es = sep ++ H264.spsNal(1, 1, maxRef = 2,
      pocCycle = Seq(4), offsetNonRef = -2) ++
      sep ++ H264.ppsNal(28) ++
      sep ++ H264.idrNal(1, 1,
        _ => Pcm((x, y) => q((y / 8) * 2 + x / 8)), 28,
        pocType1 = true) ++
      sep ++ H264.pNal(1, 1,
        _ => PMoveCoded(0, 0, blk => (7 + blk) % 5 - 2), 28,
        frameNum = 1, pocType1 = true) ++
      sep ++ H264.bNal(1, 1, _ => BBi((0, 0), (0, 0)), 28,
        frameNum = 2, pocLsb = 0, pocType1 = true)
    val fs = H264.decodeFramesLuma(es, 6)
    assert(fs.map(_._4) == Seq('I', 'P', 'B'), s"${fs.map(_._4)}")
    val i = fs(0)._3
    val p = fs(1)._3
    for (k <- 0 until 256)
      assert(fs(2)._3(k) == ((i(k) + p(k) + 1) >> 1), s"px $k")
    // direction check: a backward-only B must equal the P anchor
    // (L1(0) = the poc-4 P), not the I
    val es2 = es.dropRight(
      es.length - es.lastIndexOfSlice(sep)) ++
      sep ++ H264.bNal(1, 1, _ => BBwd(0, 0), 28, frameNum = 2,
        pocLsb = 0, pocType1 = true)
    val fs2 = H264.decodeFramesLuma(es2, 6)
    assert(fs2.map(_._4) == Seq('I', 'P', 'B'))
    assert(fs2(2)._3.sameElements(p), "L1(0) must be the later anchor")
  }

  test("temporal direct (8.4.1.2.3): colocated motion scales by POC " +
      "distance; intra colocated blocks read as zero against the " +
      "colocated picture's own L0(0); evicted references degrade") {
    val sep = Array[Byte](0, 0, 0, 1)
    // I = x-ramp; P = uniform 2-px-left copy of I (mvCol = (-8, 0));
    // B at poc 1 between I (0) and P (2): tb = 1, td = 2 ->
    // DistScaleFactor = 128, mvL0 = (128*-8 + 128) >> 8 = -4 (1 px),
    // mvL1 = -4 + 8 = +4. BOTH legs land on I shifted one pixel left
    // (P(x+1) = I(x-1)), edge-clamped.
    def iPix(x: Int, y: Int): Int = 20 + 3 * x + y
    val es = sep ++ H264.spsNal(1, 1, maxRef = 2) ++
      sep ++ H264.ppsNal(28) ++
      sep ++ H264.idrNal(1, 1, _ => Pcm(iPix), 28) ++
      sep ++ H264.pNal(1, 1, _ => PMove(-8, 0), 28, frameNum = 1) ++
      sep ++ H264.bNal(1, 1, _ => BSkip, 28, frameNum = 2,
        pocLsb = 1, temporal = true)
    val fs = H264.decodeFramesLuma(es, 6)
    assert(fs.map(_._4) == Seq('I', 'P', 'B'), s"${fs.map(_._4)}")
    val b = fs(2)._3
    for (y <- 0 until 16; x <- 0 until 16) {
      val exp =
        if (x <= 14) iPix(math.max(0, x - 1), y)
        else (iPix(14, y) + iPix(13, y) + 1) >> 1 // L1 leg clamps
      assert(b(y * 16 + x) == exp, s"($x,$y)")
    }
    // intra colocated blocks: a P with an intra refresh MB — both
    // lists collapse to zero motion against the colocated picture's
    // own first reference, so the B is the plain anchor average
    val es2 = sep ++ H264.spsNal(2, 1, maxRef = 2) ++
      sep ++ H264.ppsNal(28) ++
      sep ++ H264.idrNal(2, 1, mb => Pcm((x, y) =>
        40 + 2 * (x + 16 * (mb % 2)) + y), 28) ++
      sep ++ H264.pNal(2, 1, mb =>
        if (mb == 0) PMoveCoded(0, 0, blk => blk % 3 - 1)
        else H264.PIntra(I16Dc(3)), 28, frameNum = 1) ++
      sep ++ H264.bNal(2, 1, _ => BSkip, 28, frameNum = 2,
        pocLsb = 1, temporal = true)
    val fs2 = H264.decodeFramesLuma(es2, 6)
    assert(fs2.map(_._4) == Seq('I', 'P', 'B'), s"${fs2.map(_._4)}")
    for (k <- 0 until 16 * 32)
      assert(fs2(2)._3(k) ==
        ((fs2(0)._3(k) + fs2(1)._3(k) + 1) >> 1), s"intra-col px $k")
    // eviction degrade: a late B whose colocated picture references
    // the I that already slid out of the 2-deep window keeps the
    // exact frames decoded so far
    val es3 = sep ++ H264.spsNal(1, 1, maxRef = 2) ++
      sep ++ H264.ppsNal(28) ++
      sep ++ H264.idrNal(1, 1, _ => Pcm(iPix), 28) ++
      sep ++ H264.pNal(1, 1, _ => PMove(0, 0), 28, frameNum = 1) ++
      sep ++ H264.pNal(1, 1, _ => PMove(0, 0), 28, frameNum = 2) ++
      sep ++ H264.bNal(1, 1, _ => BSkip, 28, frameNum = 3,
        pocLsb = 5, temporal = true)
    assert(H264.decodeFramesLuma(es3, 6).map(_._4) ==
      Seq('I', 'P', 'P'), "evicted colocated reference degrades")
  }

  test("bottom-field POC delta: PicOrderCnt = Min(top, bottom) flips " +
      "the B's list construction") {
    // PPS with bottom_field_pic_order_in_frame_present: the B carries
    // lsb 3 but delta_pic_order_cnt_bottom -4 -> poc -1, BEFORE both
    // anchors (I at 0, P at 2): its L0(0) becomes the I. Without the
    // min(top, bottom) rule the poc would be 3 and L0(0) the P.
    val sep = Array[Byte](0, 0, 0, 1)
    def q(b: Int): Int = (5 * 11 + 4 * b + 60) % 180 + 20
    val es = sep ++ H264.spsNal(1, 1, maxRef = 2) ++
      sep ++ H264.ppsNal(28, bottomPoc = true) ++
      sep ++ H264.idrNal(1, 1,
        _ => Pcm((x, y) => q((y / 8) * 2 + x / 8)), 28,
        pocBottomDelta = Some(0)) ++
      sep ++ H264.pNal(1, 1,
        _ => PMoveCoded(0, 0, blk => (5 + blk) % 5 - 2), 28,
        frameNum = 1, pocBottomDelta = Some(0)) ++
      sep ++ H264.bNal(1, 1, _ => BFwd(0, 0), 28, frameNum = 2,
        pocLsb = 3, pocBottomDelta = Some(-4))
    val fs = H264.decodeFramesLuma(es, 6)
    assert(fs.map(_._4) == Seq('I', 'P', 'B'), s"${fs.map(_._4)}")
    assert(fs(2)._3.sameElements(fs(0)._3),
      "poc -1 fronts the I in L0")
    // control: delta 0 keeps poc 3 -> L0(0) is the P anchor
    val es2 = es.dropRight(es.length - es.lastIndexOfSlice(sep)) ++
      sep ++ H264.bNal(1, 1, _ => BFwd(0, 0), 28, frameNum = 2,
        pocLsb = 3, pocBottomDelta = Some(0))
    val fs2 = H264.decodeFramesLuma(es2, 6)
    assert(fs2.map(_._4) == Seq('I', 'P', 'B'))
    assert(fs2(2)._3.sameElements(fs2(1)._3),
      "delta 0 keeps the P in front")
  }

  test("corruption fuzz: 200 mutations of an I-P-B stream degrade or " +
      "truncate, never throw") {
    val id = 6
    val base = ipbStream(id, mb => if (mb == 0) BBi((0, 0), (0, 0))
      else BFwd(0, 0))
    assert(H264.decodeFramesLuma(base, 4).map(_._4) == Seq('I', 'P', 'B'))
    val rnd = new java.util.Random(0xB00B5)
    var trials = 0
    while (trials < 200) {
      val mutated = base.clone()
      val kind = trials % 3
      if (kind == 0) {
        var f = 0
        val nf = 1 + rnd.nextInt(4)
        while (f < nf) {
          val i = rnd.nextInt(mutated.length)
          mutated(i) = (mutated(i) ^ (1 << rnd.nextInt(8))).toByte
          f += 1
        }
        assert(H264.decodeFramesLuma(mutated, 4).length <= 4)
      } else if (kind == 1) {
        val cutAt = 1 + rnd.nextInt(mutated.length - 1)
        assert(H264.decodeFramesLuma(mutated.take(cutAt), 4).length <= 4)
      } else {
        val at = rnd.nextInt(mutated.length)
        val len = math.min(1 + rnd.nextInt(12), mutated.length - at)
        var i2 = 0
        while (i2 < len) { mutated(at + i2) = rnd.nextInt(256).toByte; i2 += 1 }
        assert(H264.decodeFramesLuma(mutated, 4).length <= 4)
      }
      trials += 1
    }
  }
}
