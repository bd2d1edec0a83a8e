package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ext.H264
import graft.ext.H264.{I16Dc, I4x4, Pcm}

/** High-profile contracts (round 16, VERDICT r15 #2/#5): scaling
  * matrices in the dequant chain. Expected pixels are HAND-COMPUTED
  * from 8.5.12.1 with weightScale w: at qp 28 the 4x4 DC dequant is
  * d0 = 16·w₀·c (shift 0), and the core inverse transform of a lone
  * DC gives (d0 + 32) >> 6 on every sample — so an I4x4 macroblock
  * whose block 0 carries DC c and whose other blocks are flat DC-mode
  * predictions reconstructs UNIFORMLY to 128 + ((16·w₀·c + 32) >> 6)
  * (every block's DC prediction sees only 128+Δ or nothing).
  */
class H264HighSpec extends AnyFunSuite {

  private def uniform4(w: Int) = Array.fill(16)(w)
  private def uniform8(w: Int) = Array.fill(64)(w)

  private def delta(w0: Int, c: Int): Int = (16 * w0 * c + 32) >> 6

  private def lumaOf(es: Array[Byte]): Array[Int] = {
    val fs = H264.decodeFramesLuma(es, 2)
    assert(fs.length == 1, s"expected 1 frame, got ${fs.length}")
    fs.head._3
  }

  test("High-profile SPS without matrices decodes exactly like baseline") {
    val mb = (_: Int) => I4x4(_ => 2, blk => if (blk == 0) 3 else 0)
    val base = lumaOf(H264.encodeIFrame(1, 1, mb))
    val high = lumaOf(H264.encodeIFrameHigh(1, 1, mb))
    assert(high.sameElements(base))
    assert(base.forall(_ == 128 + delta(16, 3))) // flat: 4c = 12
  }

  test("seq scaling matrix: uniform weight 20 turns a DC coefficient " +
      "c into 5c per sample (16*20*c + 32 >> 6)") {
    for (c <- Seq(-3, -1, 1, 2, 5)) {
      val es = H264.encodeIFrameHigh(1, 1,
        _ => I4x4(_ => 2, blk => if (blk == 0) c else 0),
        seqScal4 = Seq.fill(6)(uniform4(20)),
        seqScal8 = Seq.fill(2)(uniform8(20)))
      val luma = lumaOf(es)
      val want = 128 + delta(20, c)
      assert(delta(20, c) == ((320 * c + 32) >> 6))
      assert(luma.forall(_ == want), s"c=$c: ${luma.take(4).toSeq} != $want")
    }
  }

  test("fall-back rule A: an ABSENT intra list under a present seq " +
      "matrix takes the DEFAULT (non-flat) list, not flat 16") {
    // Default_4x4_Intra has weightScale(0,0) = 6
    val es = H264.encodeIFrameHigh(1, 1,
      _ => I4x4(_ => 2, blk => if (blk == 0) 4 else 0),
      seqScal4 = null +: Seq.fill(5)(uniform4(16)),
      seqScal8 = Seq.fill(2)(uniform8(16)))
    val luma = lumaOf(es)
    val want = 128 + delta(6, 4) // (384 + 32) >> 6 = 6, NOT 16 (flat 4c)
    assert(delta(6, 4) == 6 && delta(16, 4) == 16)
    assert(luma.forall(_ == want), s"${luma.take(4).toSeq} != $want")
  }

  test("pic scaling matrix overrides the seq matrix (fall-back rule B " +
      "only for absent pic lists)") {
    // SPS says 20 everywhere; PPS overrides intra luma to 24 and
    // leaves list 1 absent (rule B -> the SPS's 20 list; unread here,
    // chroma is uncoded) — the decode must use 24: delta = 6c
    val es0 = H264.encodeIFrameHigh(1, 1,
      _ => I4x4(_ => 2, blk => if (blk == 0) 2 else 0),
      seqScal4 = Seq.fill(6)(uniform4(20)),
      seqScal8 = Seq.fill(2)(uniform8(20)),
      picScal4 = uniform4(24) +: null +: Seq.fill(4)(uniform4(20)))
    val luma = lumaOf(es0)
    val want = 128 + delta(24, 2) // (768 + 32) >> 6 = 12
    assert(luma.forall(_ == want), s"${luma.take(4).toSeq} != $want")
  }

  test("pic scaling matrix under a BASELINE SPS: absent anchor lists " +
      "fall back to the default list (rule B with no seq matrix)") {
    // PPS present, intra-luma list ABSENT, no seq matrix -> the
    // DEFAULT intra list (w0 = 6)
    val es = H264.encodeIFrameHigh(1, 1,
      _ => I4x4(_ => 2, blk => if (blk == 0) 4 else 0),
      picScal4 = null +: Seq.fill(5)(uniform4(16)))
    val luma = lumaOf(es)
    val want = 128 + delta(6, 4)
    assert(luma.forall(_ == want), s"${luma.take(4).toSeq} != $want")
  }

  test("scaling applies to the Intra_16x16 DC path through 8.5.10 " +
      "(w(0,0) of the intra list scales the Hadamard output)") {
    // I16 DC-only z at qp 28, flat: pixel = 128 + z (existing pin).
    // With w0 = 32 the DC dequant doubles: dcY = (z16·w0·NA(4,0)
    // ... ) -> ls = 32*16 = 512, shift 2 -> dcY = 128z; residual
    // (128z + 32) >> 6 = 2z.
    val es = H264.encodeIFrameHigh(1, 1, _ => I16Dc(3),
      seqScal4 = Seq.fill(6)(uniform4(32)),
      seqScal8 = Seq.fill(2)(uniform8(32)))
    val luma = lumaOf(es)
    assert(luma.forall(_ == 128 + 6), s"${luma.take(4).toSeq}")
  }

  test("non-uniform list: position-dependent weights hit the right " +
      "raster cells (AC scan position 1 scaled independently of DC)") {
    // I16Dc(z = 2, ac0 = 1) at qp 28: DC dequant d0 = 128 (flat w(0));
    // scale ONLY scan position 1 (raster 1) by 2x -> d1 = 1·32·20 =
    // 640 (vs flat 320). Row transform of (128, 640, 0, 0) gives
    // t = (768, 448, -32, -512); columns collapse to (t + 32) >> 6 =
    // (12, 7, -3, -8) on pred 128 -> (140, 135, 125, 120). The flat
    // twin pins (135, 133, 128, 125), so both the DC cell (w
    // unchanged) and the AC cell (w doubled) land on their own
    // weights.
    val list = uniform4(16); list(1) = 32 // SCAN order; scan 1 = raster 1
    val es = H264.encodeIFrameHigh(1, 2, {
      case 0 => I16Dc(2, ac0 = 1)
      case _ => I16Dc(0)
    }, seqScal4 = Seq(list) ++ Seq.fill(5)(uniform4(16)),
      seqScal8 = Seq.fill(2)(uniform8(16)))
    val fs = H264.decodeFramesLuma(es, 2)
    assert(fs.length == 1)
    val luma = fs.head._3
    val want = Array(140, 135, 125, 120)
    for (y <- 0 until 4; x <- 0 until 4)
      assert(luma(y * 16 + x) == want(x), s"($x,$y): ${luma(y * 16 + x)}")
  }

  test("Intra_8x8 DC: lone macroblock, per-quadrant DC coefficients " +
      "compose through the 8.3.2 DC prediction chain (residual 2c at " +
      "qp 28 flat)") {
    import graft.ext.H264.I8x8
    // blk0 has no neighbors -> pred 128; blk1 left-only; blk2
    // top-only; blk3 averages blk1/blk2 with the (sum + 8) >> 4 round
    val (c0, c1, c2, c3) = (5, -3, 2, 4)
    val es = H264.encodeIFrameHigh(1, 1,
      _ => I8x8(_ => 2, Seq(c0, c1, c2, c3)),
      transform8x8 = true)
    val luma = lumaOf(es)
    val q0 = 128 + 2 * c0
    val q1 = q0 + 2 * c1
    val q2 = q0 + 2 * c2
    val q3 = ((q1 + q2 + 1) >> 1) + 2 * c3
    for (y <- 0 until 16; x <- 0 until 16) {
      val want = (if (y < 8) { if (x < 8) q0 else q1 }
        else { if (x < 8) q2 else q3 })
      assert(luma(y * 16 + x) == want, s"($x,$y): ${luma(y * 16 + x)} != $want")
    }
  }

  test("Intra_8x8 vertical: filtered references — a linear PCM top " +
      "row predicts exactly except the 3-tap left end (8.3.2.2.1)") {
    import graft.ext.H264.I8x8
    // 1x2 picture: MB0 = PCM 40 + 2x (y-independent); MB1 = I8x8
    // vertical. Filtering preserves a linear ramp exactly; the x = 0
    // end uses (3p0 + p1 + 2) >> 2 = 41. Block 1's top-right is
    // outside the picture -> p[8..15,-1] substitute p[7,-1] BEFORE
    // filtering, but its real top arm is linear so columns stay
    // 40 + 2x there too.
    val es = H264.encodeIFrameHigh(1, 2, {
      case 0 => Pcm((x, _) => 40 + 2 * x)
      case _ => I8x8(_ => 0)
    }, transform8x8 = true)
    val luma = lumaOf(es)
    for (y <- 16 until 32; x <- 0 until 16) {
      val want = if (x == 0) 41 else 40 + 2 * x
      assert(luma(y * 16 + x) == want, s"($x,$y): ${luma(y * 16 + x)} != $want")
    }
  }

  test("Intra_8x8 horizontal: the left-column twin (ends 3-tap, " +
      "interior exact on a linear ramp)") {
    import graft.ext.H264.I8x8
    val es = H264.encodeIFrameHigh(2, 1, {
      case 0 => Pcm((_, y) => 40 + 2 * y)
      case _ => I8x8(_ => 1)
    }, transform8x8 = true)
    val luma = lumaOf(es)
    for (y <- 0 until 16; x <- 16 until 32) {
      val want = if (y == 0) 41 else 40 + 2 * y
      assert(luma(y * 32 + x) == want, s"($x,$y): ${luma(y * 32 + x)} != $want")
    }
  }

  test("8x8 scaling list: uniform weight 20 turns an 8x8 DC " +
      "coefficient c into (160c + 32) >> 6 per sample") {
    import graft.ext.H264.I8x8
    for (c <- Seq(-3, 2, 4)) {
      // only quadrant 0 coded: the DC prediction chain then carries
      // 128 + r uniformly to all four quadrants
      val es = H264.encodeIFrameHigh(1, 1,
        _ => I8x8(_ => 2, blk => if (blk == 0) c else 0),
        seqScal4 = Seq.fill(6)(uniform4(16)),
        seqScal8 = Seq.fill(2)(uniform8(20)),
        transform8x8 = true)
      val luma = lumaOf(es)
      val want = 128 + ((160 * c + 32) >> 6) // ls = 20*32, dq = 160c
      assert(luma.forall(_ == want), s"c=$c: ${luma.take(3).toSeq} != $want")
    }
  }

  test("deblock x transform_size_8x8: internal 4x4 luma edges are NOT " +
      "filtered under the 8x8 transform; the 4x4 twin IS filtered") {
    import graft.ext.H264.I8x8
    // MB0 = PCM step 60|72 at x = 4 (within alpha(28) = 20 so a bS-3
    // edge WOULD filter); MB1 predicts vertically from it.
    def topMb = Pcm((x, _) => if (x < 4) 60 else 72)
    // t8 stream: MB1 = Intra_8x8 vertical, deblock ON. The filtered
    // reference smooths the step to ... 60, 60, 60, 63, 69, 72, ...;
    // rows away from the horizontal MB edge must keep EXACTLY that
    // vector (k = 1 vertical edge skipped under t8).
    val t8 = H264.decodeFramesLuma(H264.encodeIFrameHigh(1, 2, {
      case 0 => topMb
      case _ => I8x8(_ => 0)
    }, deblock = true, transform8x8 = true), 2)
    assert(t8.length == 1)
    val lumaT8 = t8.head._3
    // row 0 of MB1: exactly the filtered reference vector. Pins three
    // things at once — the 8.3.2.2.1 filter, the MB-boundary edge
    // being alpha-gated off (I_PCM neighbor deblocks at qp 0), and
    // the skipped k = 1 internal edge (which WOULD move x = 3/4 from
    // 63/69 to 65/67 if filtered: |63-69| = 6 < alpha(28) = 20).
    val tf = Array(60, 60, 60, 63, 69, 72, 72, 72)
    for (x <- 0 until 8)
      assert(lumaT8(16 * 16 + x) == tf(x),
        s"t8 row 0 x=$x: ${lumaT8(16 * 16 + x)} != ${tf(x)}")
    // 4x4 twin: same geometry, Intra_4x4 vertical, deblock ON. The
    // raw (unfiltered) prediction keeps the sharp 60|72 step, and the
    // internal k = 1 edge at x = 4 (bS 3) must then smooth it.
    val t4 = H264.decodeFramesLuma(H264.encodeIFrameHigh(1, 2, {
      case 0 => topMb
      case _ => I4x4(_ => 0)
    }, deblock = true, transform8x8 = false), 2)
    assert(t4.length == 1)
    val lumaT4 = t4.head._3
    val row8 = (0 until 8).map(x => lumaT4((16 + 8) * 16 + x))
    assert(row8(3) != 60 || row8(4) != 72,
      s"4x4 twin: the x=4 edge should have been deblocked: $row8")
  }

  test("inter transform_size_8x8_flag sync: a coded P 16x16 under a " +
      "t8 PPS parses the flag (0) and decodes exactly like the " +
      "non-t8 twin") {
    import graft.ext.H264._
    val sep = Array[Byte](0, 0, 0, 1)
    def iMb(i: Int): Mb = Pcm((x, y) => 60 + x + 2 * y)
    def pMb(i: Int): MbP = PMoveCoded(0, 0, blk => (blk % 5) - 2)
    val plain = sep ++ spsNal(2, 2) ++ sep ++ ppsNal(28) ++
      sep ++ idrNal(2, 2, iMb, 28) ++
      sep ++ pNal(2, 2, pMb, 28, frameNum = 1)
    val t8 = sep ++ spsNal(2, 2) ++ sep ++ ppsNal(28, transform8x8 = true) ++
      sep ++ idrNal(2, 2, iMb, 28, t8Pps = true) ++
      sep ++ pNal(2, 2, pMb, 28, frameNum = 1, t8Pps = true)
    val a = H264.decodeFramesLuma(plain, 4)
    val b = H264.decodeFramesLuma(t8, 4)
    assert(a.length == 2 && b.length == 2)
    a.zip(b).foreach { case (fa, fb) =>
      assert(fb._3.sameElements(fa._3))
    }
  }

  test("CABAC Intra_8x8 == CAVLC Intra_8x8: a mixed I8x8/I4x4/I16/PCM " +
      "High picture decodes pixel-identical through both entropy " +
      "layers (ctx 399-401 flag + cat-5 residuals on trial)") {
    import graft.ext.H264.I8x8
    def mbs(i: Int): graft.ext.H264.Mb = i match {
      case 0 => I8x8(_ => 2, Seq(5, -3, 2, 4))
      case 1 => I4x4(_ => 2, blk => if (blk == 5) 1 else 0)
      case 2 => Pcm((x, y) => 50 + 3 * x + y)
      case _ => I8x8(blk => Seq(2, 0, 1, 2)(blk), Seq(-2, 6, 0, -7))
    }
    val cavlc = H264.decodeFramesLuma(
      H264.encodeIFrameHigh(2, 2, mbs, transform8x8 = true), 2)
    val cabac = H264.decodeFramesLuma(
      H264.encodeIFrameHighCabac(2, 2, mbs), 2)
    assert(cavlc.length == 1 && cabac.length == 1)
    assert(cabac.head._3.sameElements(cavlc.head._3),
      "CABAC and CAVLC High pictures must reconstruct identically")
  }

  test("CABAC P under a t8 PPS: skip and 4x4-coded macroblocks decode " +
      "(flag 0 parses in sync); the t8 flag itself stays fenced") {
    import graft.ext.H264._
    val sep = Array[Byte](0, 0, 0, 1)
    def iMb(i: Int): Mb = Pcm((x, y) => 60 + x + y)
    def pMb(i: Int): MbP = PMoveCoded(0, 0, blk => (blk % 3) - 1)
    // t8 PPS, all-4x4 inter MBs: the per-MB flag decodes as 0 and the
    // P frame reconstructs exactly like the non-t8 twin
    val t8 = sep ++ spsNal(1, 1, high = true) ++
      sep ++ ppsNal(28, cabac = true, transform8x8 = true) ++
      sep ++ idrNalCabac(1, 1, iMb, 28, t8Pps = true) ++
      sep ++ pNalCabac(1, 1, pMb, 28, frameNum = 1, t8Pps = true)
    val plain = sep ++ spsNal(1, 1) ++
      sep ++ ppsNal(28, cabac = true) ++
      sep ++ idrNalCabac(1, 1, iMb, 28) ++
      sep ++ pNalCabac(1, 1, pMb, 28, frameNum = 1)
    val a = H264.decodeFramesLuma(t8, 4)
    val b = H264.decodeFramesLuma(plain, 4)
    assert(a.length == 2 && b.length == 2,
      s"frames: t8=${a.length} plain=${b.length}")
    a.zip(b).foreach { case (fa, fb) =>
      assert(fa._3.sameElements(fb._3))
    }
    // PSkip-only P slice also decodes under the t8 PPS (no cbp, no flag)
    val skips = sep ++ spsNal(1, 1, high = true) ++
      sep ++ ppsNal(28, cabac = true, transform8x8 = true) ++
      sep ++ idrNalCabac(1, 1, iMb, 28, t8Pps = true) ++
      sep ++ pNalCabac(1, 1, _ => PSkip, 28, frameNum = 1)
    assert(H264.decodeFramesLuma(skips, 4).length == 2)
  }

  test("inter 8x8 transform (CAVLC): a coded P 16x16 with flag = 1 " +
      "adds 2c per 8x8 quadrant onto the MC prediction at qp 28") {
    import graft.ext.H264._
    val sep = Array[Byte](0, 0, 0, 1)
    def iMb(i: Int): Mb = Pcm((_, _) => 100)
    val dcs = Seq(5, -3, 0, 7)
    val es = sep ++ spsNal(1, 1, high = true) ++
      sep ++ ppsNal(28, transform8x8 = true) ++
      sep ++ idrNal(1, 1, iMb, 28, t8Pps = true) ++
      sep ++ pNal(1, 1, _ => PMoveCoded8(0, 0, dcs), 28,
        frameNum = 1, t8Pps = true)
    val fs = H264.decodeFramesLuma(es, 4)
    assert(fs.length == 2, s"frames: ${fs.length}")
    val p = fs(1)._3
    for (y <- 0 until 16; x <- 0 until 16) {
      val blk8 = (y / 8) * 2 + (x / 8)
      val want = 100 + 2 * dcs(blk8)
      assert(p(y * 16 + x) == want, s"($x,$y): ${p(y * 16 + x)} != $want")
    }
  }

  test("inter 8x8 transform under an 8x8 scaling list: the INTER list " +
      "(index 1) scales the dequant — (160c + 32) >> 6 at w = 20") {
    import graft.ext.H264._
    val sep = Array[Byte](0, 0, 0, 1)
    // intra 8x8 list flat 16, INTER 8x8 list uniform 20: a decoder
    // picking the wrong list produces 2c instead of the scaled value
    val es = sep ++ spsNal(1, 1, high = true,
      seqScal4 = Seq.fill(6)(uniform4(16)),
      seqScal8 = Seq(uniform8(16), uniform8(20))) ++
      sep ++ ppsNal(28, transform8x8 = true) ++
      sep ++ idrNal(1, 1, _ => Pcm((_, _) => 100), 28, t8Pps = true) ++
      sep ++ pNal(1, 1, _ => PMoveCoded8(0, 0, _ => 4), 28,
        frameNum = 1, t8Pps = true)
    val fs = H264.decodeFramesLuma(es, 4)
    assert(fs.length == 2)
    val want = 100 + ((160 * 4 + 32) >> 6) // 110, not 108 (flat)
    assert(fs(1)._3.forall(_ == want),
      s"${fs(1)._3.take(4).toSeq} != $want")
  }

  test("corruption fuzz: 120 mutations of a High-profile scaled stream " +
      "degrade or truncate, never throw") {
    val base = H264.encodeIFrameHigh(2, 2,
      i => if (i % 2 == 0) I4x4(_ => 2, blk => blk % 3 - 1)
      else I16Dc(i - 1, ac0 = 1),
      seqScal4 = Seq.fill(6)(uniform4(20)),
      seqScal8 = Seq.fill(2)(uniform8(20)))
    val rnd = new java.util.Random(20240816)
    for (t <- 0 until 120) {
      val mutated = base.clone()
      t % 3 match {
        case 0 =>
          val i = rnd.nextInt(mutated.length)
          mutated(i) = (mutated(i) ^ (1 << rnd.nextInt(8))).toByte
          assert(H264.decodeFramesLuma(mutated, 2).length <= 2)
        case 1 =>
          val cut = 1 + rnd.nextInt(mutated.length - 1)
          assert(H264.decodeFramesLuma(mutated.take(cut), 2).length <= 2)
        case _ =>
          val at = rnd.nextInt(mutated.length)
          val len = math.min(1 + rnd.nextInt(8), mutated.length - at)
          val garbled = mutated.take(at) ++
            Array.fill[Byte](len)(rnd.nextInt(256).toByte) ++
            mutated.drop(at + len)
          assert(H264.decodeFramesLuma(garbled, 2).length <= 2)
      }
    }
  }
}
