package graft

import org.apache.spark.sql.functions._
import graft.ops.Imaging

/** I1/I2/I3 properties (SURVEY.md §5): RP symmetry/zero-diagonal/255
  * scale (app.py:394-402); GAF diagonal identity and range
  * (app.py:427-448); resize shape + constant preservation. */
class ImagingSpec extends SparkSpec {
  import spark.implicits._

  private val v = Array(0.0, 1.0, 3.0, 2.0, 8.0, 5.0, 4.0, 6.0)
  private lazy val df = Seq(("s", v)).toDF("series_id", "values")

  private def matrix(c: org.apache.spark.sql.Column): Array[Array[Double]] =
    df.select(c.as("m")).head()
      .getAs[collection.Seq[collection.Seq[Double]]]("m")
      .map(_.toArray).toArray

  test("RP is symmetric with zero diagonal and max 255") {
    val m = matrix(Imaging.rp(col("values")))
    val n = m.length
    assert(n == v.length)
    for (i <- 0 until n) assert(m(i)(i) == 0.0)
    for (i <- 0 until n; j <- 0 until n) assert(math.abs(m(i)(j) - m(j)(i)) < 1e-9)
    assert(math.abs(m.flatten.max - 255.0) < 1e-9)
  }

  test("GAF diagonal = (1+cos(2·acos(scaled)))·127.5, values in [0,255]") {
    val m = matrix(Imaging.gaf(col("values")))
    val mn = v.min; val mx = v.max
    val scaled = v.map(x => math.min(1.0, math.max(-1.0, (2 * x - mx - mn) / (mx - mn))))
    for (i <- v.indices) {
      val expected = (1 + math.cos(2 * math.acos(scaled(i)))) * 127.5
      assert(math.abs(m(i)(i) - expected) < 1e-9)
    }
    assert(m.flatten.forall(x => x >= -1e-9 && x <= 255 + 1e-9))
  }

  test("resize shrinks by area-average and grows bilinearly, preserving constants") {
    val img = Seq.fill(8)(Seq.fill(8)(7.0))
    val small = Imaging.resize(img, 4)
    assert(small.length == 4 && small.head.length == 4)
    assert(small.flatten.forall(x => math.abs(x - 7.0) < 1e-12))
    val big = Imaging.resize(img, 16)
    assert(big.length == 16 && big.flatten.forall(x => math.abs(x - 7.0) < 1e-12))
  }

  test("resize area-average halving averages 2x2 blocks") {
    val img = Seq(Seq(0.0, 2.0), Seq(4.0, 6.0))
    val out = Imaging.resize(img, 1)
    assert(math.abs(out.head.head - 3.0) < 1e-12)
  }

  test("resize non-integer shrink uses fractional coverage (cv2 INTER_AREA)") {
    // 3→2, scale 1.5: target (0,0) covers rows/cols [0, 1.5) with
    // weights [1, 0.5] — hand-computed cv2 float-path values
    val img = Seq(Seq(0.0, 1.0, 2.0), Seq(3.0, 4.0, 5.0), Seq(6.0, 7.0, 8.0))
    val out = Imaging.resize(img, 2)
    val expect = Seq(Seq(3.0, 6.0), Seq(12.0, 15.0)).map(_.map(_ / 2.25))
    for (i <- 0 until 2; j <- 0 until 2)
      assert(math.abs(out(i)(j) - expect(i)(j)) < 1e-12, s"($i,$j): ${out(i)(j)}")
    // weights normalize: constant image stays constant at any ratio
    val const = Imaging.resize(Seq.fill(5)(Seq.fill(5)(7.0)), 3)
    const.foreach(_.foreach(v => assert(math.abs(v - 7.0) < 1e-12)))
  }
}
