package graft.ml

import scala.util.Random

/** Driver-local 2-D kernels for the reference regime (one embedding
  * point per series — small even when the raw data is 100 TB). Used by
  * the silhouette model-selection scan; the distributed MLlib path
  * handles anything larger (Clustering.silhouetteScan gates on size).
  */
private[ml] object Local {

  /** Seeded k-means++ init + Lloyd's iterations. Deterministic. */
  def kmeans(pts: Array[(Double, Double)], k: Int, seed: Long,
      maxIter: Int = 50): Array[Int] = {
    val rnd = new Random(seed)
    val n = pts.length
    def d2(a: (Double, Double), b: (Double, Double)): Double = {
      val dx = a._1 - b._1; val dy = a._2 - b._2; dx * dx + dy * dy
    }
    // k-means++ seeding
    val centers = new Array[(Double, Double)](k)
    centers(0) = pts(rnd.nextInt(n))
    val minD = Array.fill(n)(Double.MaxValue)
    for (c <- 1 until k) {
      var i = 0
      while (i < n) { minD(i) = math.min(minD(i), d2(pts(i), centers(c - 1))); i += 1 }
      val total = minD.sum
      var r = rnd.nextDouble() * total
      var idx = 0
      while (idx < n - 1 && r > minD(idx)) { r -= minD(idx); idx += 1 }
      centers(c) = pts(idx)
    }
    // Lloyd's
    val labels = new Array[Int](n)
    var moved = true
    var it = 0
    while (moved && it < maxIter) {
      moved = false
      var i = 0
      while (i < n) {
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          val dd = d2(pts(i), centers(c))
          if (dd < bestD) { best = c; bestD = dd }
          c += 1
        }
        if (labels(i) != best) { labels(i) = best; moved = true }
        i += 1
      }
      val sx = new Array[Double](k); val sy = new Array[Double](k)
      val cnt = new Array[Int](k)
      var j = 0
      while (j < n) {
        sx(labels(j)) += pts(j)._1; sy(labels(j)) += pts(j)._2; cnt(labels(j)) += 1
        j += 1
      }
      var c = 0
      while (c < k) {
        if (cnt(c) > 0) centers(c) = (sx(c) / cnt(c), sy(c) / cnt(c))
        c += 1
      }
      it += 1
    }
    labels
  }

  /** Exact mean euclidean silhouette (sklearn semantics; also the C5
    * per-sample machinery — mean of the per-sample values). */
  def silhouette(pts: Array[(Double, Double)], labels: Array[Int], k: Int): Double = {
    val n = pts.length
    val counts = new Array[Int](k)
    labels.foreach(counts(_) += 1)
    var total = 0.0
    var valid = 0
    var i = 0
    while (i < n) {
      if (counts(labels(i)) > 1) {
        val sums = new Array[Double](k)
        var j = 0
        while (j < n) {
          if (j != i) {
            val dx = pts(i)._1 - pts(j)._1; val dy = pts(i)._2 - pts(j)._2
            sums(labels(j)) += math.sqrt(dx * dx + dy * dy)
          }
          j += 1
        }
        val a = sums(labels(i)) / (counts(labels(i)) - 1)
        var b = Double.MaxValue
        var c = 0
        while (c < k) {
          if (c != labels(i) && counts(c) > 0) b = math.min(b, sums(c) / counts(c))
          c += 1
        }
        // degenerate clustering (every other cluster empty): s := 0, so
        // a single-cluster fit can never win the silhouette scan
        if (b != Double.MaxValue) {
          total += (b - a) / math.max(a, b)
          valid += 1
        }
      }
      i += 1
    }
    if (valid == 0) 0.0 else total / valid
  }
}
