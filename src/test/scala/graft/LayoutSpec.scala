package graft

import graft.ops.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  // 16x16 grid: every (x, y) combination once — the worst case for a
  // single-dimension layout (each x-bucket spans the FULL y range)
  // and the textbook case for Morton interleaving (each z-bucket is a
  // bounded block in both dimensions)
  private def grid = (for { x <- 0 until 16; y <- 0 until 16 }
    yield (x.toLong, y.toLong)).toDF("x", "y")

  test("zorderAudit: linear layout cannot prune the y-selective band; z-order bounds both dims") {
    val got = Layout.zorderAudit(grid, "x", "y", nBuckets = 16)
      .as[(String, String, Long, Long, Long, Long, Double)].collect()
    assert(got.map(r => (r._1, r._2)).toSeq == Seq(
      "linear_x" -> "x_sel", "linear_x" -> "y_sel",
      "zorder" -> "x_sel", "zorder" -> "y_sel"), got.mkString(", "))
    val byKey = got.map(r => (r._1, r._2) -> r).toMap
    got.foreach { r =>
      assert(r._4 == 256L, s"total_rows must be the full grid: $r")
      assert(r._6 <= r._4 && r._5 <= r._3, s"conservation: $r")
    }
    // the x-band covers ~10% of the x range -> the linear layout
    // reads a sliver for x_sel but EVERYTHING for y_sel
    assert(byKey("linear_x" -> "x_sel")._7 <= 0.3,
      byKey("linear_x" -> "x_sel").toString)
    assert(byKey("linear_x" -> "y_sel")._7 == 1.0,
      byKey("linear_x" -> "y_sel").toString)
    // z-order pays a bounded fraction on BOTH predicates — that is
    // the whole point of the layout
    assert(byKey("zorder" -> "x_sel")._7 < 1.0
      && byKey("zorder" -> "x_sel")._7 <= 0.6,
      byKey("zorder" -> "x_sel").toString)
    assert(byKey("zorder" -> "y_sel")._7 < 1.0
      && byKey("zorder" -> "y_sel")._7 <= 0.6,
      byKey("zorder" -> "y_sel").toString)
  }

  test("zorderAudit: constant dimension degrades loudly to bucket 0, never divides by zero") {
    val df = (0 until 32).map(i => (i.toLong, 7L)).toDF("x", "y")
    val got = Layout.zorderAudit(df, "x", "y", nBuckets = 8)
      .as[(String, String, Long, Long, Long, Long, Double)].collect()
    assert(got.length == 4 && got.forall(_._4 == 32L), got.mkString(", "))
    // constant y quantizes to 0 -> the y-band [29491, 36044] misses
    // every zone map: y_sel reads NOTHING under either layout
    got.filter(_._2 == "y_sel").foreach(r =>
      assert(r._6 == 0L && r._7 == 0.0, r.toString))
  }

  test("mortonCode: hand-computed interleavings on an identity-quantized domain") {
    // x,y in 0..65535 quantize to themselves (span = 65535), so z is
    // the raw Morton interleave: z(5,3) = 27, z(0,1) = 2, z(1,0) = 1,
    // z(65535,65535) = 2^32 - 1
    val df = Seq((5L, 3L), (0L, 1L), (1L, 0L), (0L, 0L),
      (65535L, 65535L)).toDF("x", "y")
    val got = Layout.mortonCode(df, "x", "y")
      .select("x", "y", "z").as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got(5L -> 3L) == 27L, got.toString)
    assert(got(0L -> 1L) == 2L && got(1L -> 0L) == 1L && got(0L -> 0L) == 0L)
    assert(got(65535L -> 65535L) == (1L << 32) - 1L, got.toString)
  }

  test("zorderAudit: invalid knobs fail loudly") {
    intercept[IllegalArgumentException] {
      Layout.zorderAudit(grid, "x", "y", nBuckets = 1)
    }
    intercept[IllegalArgumentException] {
      Layout.zorderAudit(grid, "x", "y", selLo = -1)
    }
  }
}
