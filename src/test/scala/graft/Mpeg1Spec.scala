package graft

import graft.ext.Mpeg1

/** MPEG-1 intra codec contracts (ISO 11172-2; VERDICT r11 #7 — the
  * predictive-codec fence narrowed to P/B frames + modern codecs). */
class Mpeg1Spec extends SparkSpec {

  test("DC-only round-trip: encoder quadrants come back exactly (16x16, 1 MB)") {
    // one macroblock: 4 luma blocks = 4 flat 8x8 quadrants
    for (id <- Seq(0L, 1L, 7L, 123L, 255L)) {
      def g(q: Int): Int = ((id * (31 + 6 * q) + 11 + 5 * q) % 256).toInt
      val es = Mpeg1.encodeIFrame(1, 1, (_, b) => g(b))
      val got = Mpeg1.decodeIFrameLuma(es)
      assert(got.isDefined, s"id $id failed to decode")
      val (w, h, luma) = got.get
      assert(w == 16 && h == 16)
      for (y <- 0 until 16; x <- 0 until 16) {
        val q = (y / 8) * 2 + (x / 8)
        assert(luma(y * 16 + x) == g(q),
          s"id $id pixel ($x,$y): got ${luma(y * 16 + x)} want ${g(q)}")
      }
    }
  }

  test("multi-macroblock frame: 48x32 (6 MBs), per-block DC ramp decodes exactly") {
    def dc(mb: Int, b: Int): Int = (17 * mb + 31 * b + 5) % 256
    val es = Mpeg1.encodeIFrame(3, 2, dc)
    val got = Mpeg1.decodeIFrameLuma(es)
    assert(got.isDefined)
    val (w, h, luma) = got.get
    assert(w == 48 && h == 32)
    for (y <- 0 until h; x <- 0 until w) {
      val mb = (y / 16) * 3 + (x / 16)
      val b = ((y % 16) / 8) * 2 + ((x % 16) / 8)
      assert(luma(y * w + x) == dc(mb, b), s"pixel ($x,$y)")
    }
  }

  test("D-pictures decode exactly: DC-only blocks, no EOB, " +
      "end_of_macroblock bit, no anchor update (round 13)") {
    def gi(mb: Int, b: Int): Int = (19 * mb + 23 * b + 40) % 256
    def gd(mb: Int, b: Int): Int = (13 * mb + 29 * b + 77) % 256
    // I then two Ds (each D re-predicts DC from a fresh slice)
    val es = Mpeg1.encodeSequence(2, 1, gi,
      Seq(Mpeg1.DPic(gd), Mpeg1.DPic((mb, b) => (gd(mb, b) + 9) % 256)))
    val frames = Mpeg1.decodeFramesLuma(es, 10)
    assert(frames.map(_._4) == Seq('I', 'D', 'D'), s"types: ${frames.map(_._4)}")
    val (w, h, d1, _) = frames(1)
    assert(w == 32 && h == 16)
    for (y <- 0 until h; x <- 0 until w) {
      val mb = x / 16
      val b = ((y % 16) / 8) * 2 + ((x % 16) / 8)
      assert(d1(y * w + x) == gd(mb, b), s"D pixel ($x,$y)")
    }
    val d2 = frames(2)._3
    assert(d2(0) == (gd(0, 0) + 9) % 256, "second D decodes independently")
    // a D between an I and a P must NOT become the P's anchor: the P
    // (zero-MV full copy) must reproduce the I, not the D
    val es2 = Mpeg1.encodeSequence(2, 1, gi,
      Seq(Mpeg1.DPic(gd), Mpeg1.PPic(_ => Mpeg1.PMb.Move(0, 0))))
    val fr2 = Mpeg1.decodeFramesLuma(es2, 10)
    assert(fr2.map(_._4) == Seq('I', 'D', 'P'))
    assert(fr2(2)._3.sameElements(fr2(0)._3),
      "P after a D must reference the I (D never anchors)")
  }

  test("AC path through the universal escape: one cosine coefficient " +
      "reconstructs to the test's own direct IDCT") {
    // block 0 carries AC (zigzag idx 1 = (0,1) raster = horizontal
    // cosine) at level 6, qscale 8: F = (2*6*8*W)/16 with W the default
    // intra weight at that position (16), then oddified
    val level = 6
    val es = Mpeg1.encodeIFrame(1, 1, (_, b) => if (b == 0) 100 else 50,
      ac = (_, b) => if (b == 0) Seq((0, level)) else Nil, qscale = 8)
    val got = Mpeg1.decodeIFrameLuma(es)
    assert(got.isDefined)
    val (_, _, luma) = got.get
    // independent reconstruction of block 0: DC = 100*8, AC(0,1) per
    // the intra dequant + oddification rules
    var f01 = (2 * level * 8 * 16) / 16
    if ((f01 & 1) == 0) f01 -= 1
    def expected(x: Int): Int = {
      val s = (1.0 / math.sqrt(2.0)) * (1.0 / math.sqrt(2.0)) * 800.0 +
        (1.0 / math.sqrt(2.0)) * f01 * math.cos((2 * x + 1) * math.Pi / 16.0)
      val p = math.rint(s / 4.0).toInt
      math.max(0, math.min(255, p))
    }
    for (y <- 0 until 8; x <- 0 until 8)
      assert(luma(y * 16 + x) == expected(x), s"AC pixel ($x,$y)")
    // the other three quadrants stay flat 50
    assert(luma(0 * 16 + 8) == 50 && luma(8 * 16 + 0) == 50 && luma(8 * 16 + 8) == 50)
  }

  // ------------------------------------------------------- inter (P) paths

  import Mpeg1.PMb

  /** Decode helper: frames as (w, h, luma, type). */
  private def frames(es: Array[Byte], n: Int) = Mpeg1.decodeFramesLuma(es, n)

  /** Reference shift: what forward MC with integer vector (dx, dy)
    * half-pels must reproduce for macroblock (mbX, mbY). */
  private def expectMoved(ref: Array[Int], stride: Int,
      mbX: Int, mbY: Int, mvx: Int, mvy: Int): IndexedSeq[Int] = {
    val ix = (mvx >> 1) + mbX * 16
    val iy = (mvy >> 1) + mbY * 16
    val hx = mvx & 1
    val hy = mvy & 1
    for (y <- 0 until 16; x <- 0 until 16) yield {
      val b = (iy + y) * stride + ix + x
      if (hx == 0 && hy == 0) ref(b)
      else if (hy == 0) (ref(b) + ref(b + 1) + 1) >> 1
      else if (hx == 0) (ref(b) + ref(b + stride) + 1) >> 1
      else (ref(b) + ref(b + 1) + ref(b + stride) + ref(b + stride + 1) + 2) >> 2
    }
  }

  test("P pred-m: even/odd motion vectors reproduce the shifted I exactly " +
      "(incl. half-pel round-half-away and MV-predictor wrap)") {
    def dc(mb: Int, b: Int): Int = 20 * mb + 10 * b + 40
    // 2x2 MBs (32x32): distinct per-quadrant content everywhere
    val mvs = Map( // mb index -> (mvx, mvy) in half-pels, windows in-plane
      0 -> ((0, 0)), 1 -> ((-16, 0)), 2 -> ((0, -16)), 3 -> ((-11, -9)))
    val es = Mpeg1.encodeIPStream(2, 2, dc,
      Seq(mb => { val (x, y) = mvs(mb); PMb.Move(x, y) }))
    val fs = frames(es, 4)
    assert(fs.map(_._4) == Seq('I', 'P'), s"types: ${fs.map(_._4)}")
    val i = fs(0)._3
    val p = fs(1)._3
    for (mb <- 0 to 3) {
      val (mvx, mvy) = mvs(mb)
      val mbX = mb % 2; val mbY = mb / 2
      val want = expectMoved(i, 32, mbX, mbY, mvx, mvy)
      for (y <- 0 until 16; x <- 0 until 16)
        assert(p((mbY * 16 + y) * 32 + mbX * 16 + x) == want(y * 16 + x),
          s"mb $mb mv ($mvx,$mvy) pixel ($x,$y)")
    }
  }

  test("motion VLC magnitudes 8..16 (Table B.4 = B.1 codes for 2m/2m+1, " +
      "the rule magnitudes 1..7 provably follow) round-trip through MC") {
    // differential sequence hits every magnitude 8..16 exactly once
    // (16 via the [-16,15] wrap); odd targets exercise half-pel too
    val targets = Seq(0, 8, -1, 9, -2, 10, -3, 11, -4, 12, 12, 0)
    def dc(mb: Int, b: Int): Int = 40 + 9 * mb + 5 * b
    val es = Mpeg1.encodeIPStream(12, 1, dc,
      Seq(mb => PMb.Move(targets(mb), 0)))
    val fs = frames(es, 2)
    assert(fs.map(_._4) == Seq('I', 'P'), s"types: ${fs.map(_._4)}")
    val i = fs(0)._3
    val p = fs(1)._3
    for (mb <- targets.indices) {
      val want = expectMoved(i, 192, mb, 0, targets(mb), 0)
      for (y <- 0 until 16; x <- 0 until 16)
        assert(p(y * 192 + mb * 16 + x) == want(y * 16 + x),
          s"mb $mb mv ${targets(mb)} pixel ($x,$y)")
    }
  }

  test("P skipped macroblocks copy the co-located reference exactly") {
    def dc(mb: Int, b: Int): Int = (37 * mb + 13 * b + 22) % 200
    val es = Mpeg1.encodeIPStream(3, 1, dc,
      Seq(mb => if (mb == 1) PMb.Skip else PMb.Move(0, 0)))
    val fs = frames(es, 2)
    assert(fs.size == 2 && fs(1)._4 == 'P')
    assert(fs(0)._3.toSeq == fs(1)._3.toSeq, "skip+zero-MV P must equal I")
  }

  test("P coded residual: non-intra dequant adds the closed-form delta " +
      "(all-luma cbp 60 and single-block cbp)") {
    def dc(mb: Int, b: Int): Int = 100 + 5 * mb + 3 * b
    // qscale 8, flat non-intra matrix 16: level L -> f = (2L+sgn)*8,
    // oddified; DC-only residual pixel = rint(f/8)
    def delta(l: Int): Int = {
      var f = (2 * l + (if (l > 0) 1 else -1)) * 8
      if ((f & 1) == 0) f = if (f > 0) f - 1 else f + 1
      math.rint(f / 8.0).toInt
    }
    assert(delta(1) == 3 && delta(-2) == -5) // sanity of the closed form
    for (l <- Seq(1, 2, -2, 5)) {
      // frame of 2 MBs: MB0 all-luma residual (cbp 60), MB1 residual
      // only on block 2 (cbp 8)
      val es = Mpeg1.encodeIPStream(2, 1, dc, Seq(mb =>
        if (mb == 0) PMb.MoveCoded(0, 0, _ => Seq((0, l)))
        else PMb.MoveCoded(0, 0, b => if (b == 2) Seq((0, l)) else Nil)))
      val fs = frames(es, 2)
      assert(fs.size == 2, s"level $l: ${fs.size} frames")
      val i = fs(0)._3
      val p = fs(1)._3
      for (y <- 0 until 16; x <- 0 until 32) {
        val mb = x / 16
        val blk = (y / 8) * 2 + (x % 16) / 8
        val d = if (mb == 0 || blk == 2) delta(l) else 0
        val want = math.max(0, math.min(255, i(y * 32 + x) + d))
        assert(p(y * 32 + x) == want, s"level $l pixel ($x,$y)")
      }
    }
  }

  test("P intra-refresh macroblock decodes via the intra path inside " +
      "an inter picture") {
    def dc(mb: Int, b: Int): Int = 60 + 10 * mb + 4 * b
    def newDc(b: Int): Int = 200 + 5 * b
    val es = Mpeg1.encodeIPStream(2, 1, dc,
      Seq(mb => if (mb == 1) PMb.Intra(newDc) else PMb.Move(0, 0)))
    val fs = frames(es, 2)
    assert(fs.size == 2)
    val p = fs(1)._3
    for (y <- 0 until 16; x <- 0 until 16) {
      val blk = (y / 8) * 2 + (x / 8)
      assert(p(y * 32 + 16 + x) == newDc(blk), s"intra-in-P pixel ($x,$y)")
      assert(p(y * 32 + x) == fs(0)._3(y * 32 + x), s"moved MB pixel ($x,$y)")
    }
  }

  test("P chain: the second P references the decoded FIRST P, not the I") {
    def dc(mb: Int, b: Int): Int = 80 + 16 * b
    val es = Mpeg1.encodeIPStream(1, 1, dc, Seq(
      _ => PMb.MoveCoded(0, 0, _ => Seq((0, 1))), // I + 3
      _ => PMb.MoveCoded(0, 0, _ => Seq((0, 1))))) // (I + 3) + 3
    val fs = frames(es, 3)
    assert(fs.map(_._4) == Seq('I', 'P', 'P'))
    for (k <- 0 until 256) {
      assert(fs(1)._3(k) == fs(0)._3(k) + 3)
      assert(fs(2)._3(k) == fs(0)._3(k) + 6)
    }
  }

  // ------------------------------------------------------- inter (B) paths

  import graft.ext.Mpeg1.{PPic, BPic, BMb}

  /** Shared I→P→B rig: P = I + delta (zero-MV residual), B per spec. */
  private def ipb(mbW: Int, dc: (Int, Int) => Int, l: Int,
      bSpec: Int => BMb) = {
    val es = Mpeg1.encodeSequence(mbW, 1, dc, Seq(
      PPic(_ => PMb.MoveCoded(0, 0, _ => Seq((0, l)))),
      BPic(bSpec)))
    val fs = frames(es, 4)
    assert(fs.map(_._4) == Seq('I', 'P', 'B'), s"types: ${fs.map(_._4)}")
    (fs(0)._3, fs(1)._3, fs(2)._3)
  }

  test("B directions: forward copies the OLDER anchor, backward the " +
      "NEWER, interpolated averages with round-half-away") {
    def dc(mb: Int, b: Int): Int = 90 + 11 * mb + 7 * b
    // delta odd (L=2 -> +5) so (i + p + 1) >> 1 exercises real rounding
    val (i, p, bf) = ipb(3, dc, 2, {
      case 0 => BMb.Fwd(0, 0)
      case 1 => BMb.Bwd(0, 0)
      case _ => BMb.Bi(0, 0, 0, 0)
    })
    for (y <- 0 until 16; x <- 0 until 48) {
      val k = y * 48 + x
      val want =
        if (x < 16) i(k)
        else if (x < 32) p(k)
        else (i(k) + p(k) + 1) >> 1
      assert(bf(k) == want, s"pixel ($x,$y): ${bf(k)} want $want")
    }
  }

  test("B skip inherits the previous macroblock's prediction " +
      "(direction AND vectors), not a co-located copy") {
    def dc(mb: Int, b: Int): Int = 70 + 13 * mb + 5 * b
    val (i, p, bf) = ipb(3, dc, 1, {
      case 0 => BMb.Bwd(0, 0)
      case 1 => BMb.Skip // inherits Bwd(0,0) -> NEWER anchor, not I
      case _ => BMb.Fwd(0, 0)
    })
    for (y <- 0 until 16; x <- 0 until 48) {
      val k = y * 48 + x
      val want = if (x < 32) p(k) else i(k)
      assert(bf(k) == want, s"pixel ($x,$y)")
    }
  }

  test("B motion + coded residual + intra refresh inside one picture") {
    def dc(mb: Int, b: Int): Int = 60 + 9 * mb + 6 * b
    def newDc(b: Int): Int = 220 + 4 * b
    val (i, p, bf) = ipb(3, dc, 1, {
      case 0 => BMb.FwdCoded(0, 0, _ => Seq((0, 2))) // I + 5
      case 1 => BMb.Fwd(-16, 0) // I shifted 8 px left
      case _ => BMb.Intra(newDc)
    })
    val _ = p
    for (y <- 0 until 16; x <- 0 until 48) {
      val k = y * 48 + x
      val want =
        if (x < 16) i(k) + 5
        else if (x < 32) i(y * 48 + x - 8)
        else newDc((y / 8) * 2 + ((x - 32) / 8))
      assert(bf(k) == want, s"pixel ($x,$y): ${bf(k)} want $want")
    }
  }

  test("B degrade: a B without both anchors stops the walk; anchors " +
      "chain PAST intervening Bs (P references P, not the B between)") {
    def dc(mb: Int, b: Int): Int = 100 + 8 * b
    // B directly after the I (only one anchor decoded): dropped
    val early = Mpeg1.encodeSequence(1, 1, dc, Seq(
      BPic(_ => BMb.Fwd(0, 0))))
    assert(frames(early, 4).map(_._4) == Seq('I'))
    // I P1 B P2: P2 must reference P1 (the last ANCHOR), not the B
    val es = Mpeg1.encodeSequence(1, 1, dc, Seq(
      PPic(_ => PMb.MoveCoded(0, 0, _ => Seq((0, 1)))), // I + 3
      BPic(_ => BMb.Fwd(0, 0)), // = I (would poison P2 if treated as ref)
      PPic(_ => PMb.MoveCoded(0, 0, _ => Seq((0, 1)))))) // P1 + 3
    val fs = frames(es, 8)
    assert(fs.map(_._4) == Seq('I', 'P', 'B', 'P'))
    for (k <- 0 until 256) {
      assert(fs(1)._3(k) == fs(0)._3(k) + 3)
      assert(fs(2)._3(k) == fs(0)._3(k)) // B forward-copies the I
      assert(fs(3)._3(k) == fs(0)._3(k) + 6) // P2 = P1 + 3, unaffected by B
    }
  }

  test("P degrade: a mislabeled anchorless B stops the walk cleanly; " +
      "truncated P keeps the I; out-of-plane MC degrades") {
    def dc(mb: Int, b: Int): Int = 90
    val es = Mpeg1.encodeIPStream(1, 1, dc, Seq(_ => PMb.Move(0, 0)))
    // corrupt the SECOND picture header's type to B (3): find the 2nd
    // picture start code and set ptype bits. Only ONE anchor is
    // decoded at that point, so the claimed B must be refused — never
    // guessed from a single reference.
    val pics = (0 until es.length - 3).filter(i =>
      es(i) == 0 && es(i + 1) == 0 && es(i + 2) == 1 && es(i + 3) == 0)
    assert(pics.size == 2)
    val asB = es.clone()
    // byte at pic+5 holds tref[8:9] + ptype(3) + vbv[0:2]; ptype sits
    // at bit offsets 2..4 — '010' (2=P) -> '011' (3=B) flips bit 4
    asB(pics(1) + 5) = (asB(pics(1) + 5) ^ 0x08).toByte
    val fsB = frames(asB, 4)
    assert(fsB.map(_._4) == Seq('I'), s"anchorless B must stop: ${fsB.map(_._4)}")
    // truncation inside the P picture: the I survives
    val fsT = frames(es.take(es.length - 2), 4)
    assert(fsT.map(_._4) == Seq('I'))
    // MC window outside the plane: single MB moving left degrades the
    // whole P picture (never a guessed edge policy)
    val oob = Mpeg1.encodeIPStream(1, 1, dc, Seq(_ => PMb.Move(-2, 0)))
    assert(frames(oob, 2).map(_._4) == Seq('I'))
  }

  test("degrade, never throw: truncated / corrupt / non-MPEG payloads -> None") {
    val es = Mpeg1.encodeIFrame(1, 1, (_, b) => 10 * (b + 1))
    assert(Mpeg1.decodeIFrameLuma(es.take(es.length / 2)).isEmpty ||
      Mpeg1.decodeIFrameLuma(es.take(es.length / 2)).isDefined == false)
    assert(Mpeg1.decodeIFrameLuma(Array[Byte](1, 2, 3, 4)).isEmpty)
    assert(Mpeg1.decodeIFrameLuma(Array.empty[Byte]).isEmpty)
    // P-picture header (type 2) must be refused by the intra decoder
    val bad = es.clone()
    // picture_coding_type lives 10 bits after the picture start code;
    // flip it crudely by corrupting the byte containing it
    val pi = bad.indexOfSlice(Seq[Byte](0, 0, 1, 0))
    assert(pi > 0)
    bad(pi + 5) = (bad(pi + 5) ^ 0x60).toByte // 10 bits tref + 3 bits type
    assert(Mpeg1.decodeIFrameLuma(bad).isEmpty)
  }
}
