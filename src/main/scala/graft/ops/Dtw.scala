package graft.ops

import scala.collection.mutable

/** W4: FastDTW + the reference's DTW-based series stretch.
  *
  * FastDTW follows the public algorithm (Salvador & Chan, "FastDTW:
  * Toward Accurate Dynamic Time Warping in Linear Time and Space",
  * Intelligent Data Analysis 11(5), 2007): coarsen by 2 recursively,
  * solve at the coarse level, project + expand the warp path by
  * `radius`, refine with a window-constrained DTW. radius=1 matches
  * the fastdtw library default the reference calls (app.py:330).
  *
  * The stretch semantics mirror DTW_resize_algorithm (app.py:321-350):
  * walking the path accumulates, for every long-series index i, the
  * differences (long[i] − short[a]) over all path entries (a, i); the
  * stretched series is long − that accumulated difference. Equal
  * lengths are an identity (app.py:321-323).
  */
object Dtw {

  type Path = IndexedSeq[(Int, Int)]

  private def dist(a: Double, b: Double): Double = math.abs(a - b)

  /** Window-constrained DTW; `window` = allowed (i, j) cells, or all.
    * Dense inputs run a flat-array DP (no hashing, no boxing); windowed
    * inputs a LongMap keyed by (i << 32 | j) — identical recurrence and
    * tie-breaking (diagonal, then up, then left) in both. */
  def dtwPath(x: Array[Double], y: Array[Double],
      window: Option[Set[(Int, Int)]] = None): (Double, Path) = window match {
    case None => dtwDense(x, y)
    case Some(w) => dtwSparse(x, y, w)
  }

  /** Backtrack preferring diagonal, then (i-1, j), then (i, j-1). */
  private def backtrack(n: Int, m: Int, has: (Int, Int) => Boolean,
      costAt: (Int, Int) => Double): Path = {
    val path = mutable.ArrayBuffer.empty[(Int, Int)]
    var i = n - 1; var j = m - 1
    path += ((i, j))
    while (i > 0 || j > 0) {
      val cands = List((i - 1, j - 1), (i - 1, j), (i, j - 1))
        .filter { case (a, b) => a >= 0 && b >= 0 && has(a, b) }
      val (ni, nj) = cands.minBy { case c => (costAt(c._1, c._2), cands.indexOf(c)) }
      i = ni; j = nj
      path += ((i, j))
    }
    path.reverse.toIndexedSeq
  }

  private def dtwDense(x: Array[Double], y: Array[Double]): (Double, Path) = {
    val n = x.length; val m = y.length
    val cost = new Array[Double](n * m)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < m) {
        val d = dist(x(i), y(j))
        val prev =
          if (i == 0 && j == 0) 0.0
          else {
            var p = Double.PositiveInfinity
            if (i > 0 && j > 0) p = math.min(p, cost((i - 1) * m + j - 1))
            if (i > 0) p = math.min(p, cost((i - 1) * m + j))
            if (j > 0) p = math.min(p, cost(i * m + j - 1))
            p
          }
        cost(i * m + j) = d + prev
        j += 1
      }
      i += 1
    }
    val path = backtrack(n, m, (_, _) => true, (a, b) => cost(a * m + b))
    (cost(n * m - 1), path)
  }

  private def dtwSparse(x: Array[Double], y: Array[Double],
      w: Set[(Int, Int)]): (Double, Path) = {
    val n = x.length; val m = y.length
    def key(i: Int, j: Int): Long = (i.toLong << 32) | (j.toLong & 0xFFFFFFFFL)
    // long-key sort == lexicographic (i, j): every predecessor of a
    // cell is processed before it
    val keys = w.iterator.map { case (i, j) => key(i, j) }.toArray
    java.util.Arrays.sort(keys)
    val cost = mutable.LongMap.empty[Double]
    var c = 0
    while (c < keys.length) {
      val i = (keys(c) >>> 32).toInt; val j = keys(c).toInt
      val d = dist(x(i), y(j))
      val prev =
        if (i == 0 && j == 0) 0.0
        else {
          var p = Double.PositiveInfinity
          if (i > 0 && j > 0) p = math.min(p, cost.getOrElse(key(i - 1, j - 1), p))
          if (i > 0) p = math.min(p, cost.getOrElse(key(i - 1, j), p))
          if (j > 0) p = math.min(p, cost.getOrElse(key(i, j - 1), p))
          p
        }
      cost(keys(c)) = d + prev
      c += 1
    }
    val path = backtrack(n, m,
      (a, b) => cost.contains(key(a, b)), (a, b) => cost(key(a, b)))
    (cost(key(n - 1, m - 1)), path)
  }

  private def reduceByHalf(x: Array[Double]): Array[Double] =
    x.grouped(2).map(g => g.sum / g.length).toArray

  private def expandWindow(path: Path, n: Int, m: Int, radius: Int): Set[(Int, Int)] = {
    val set = mutable.HashSet.empty[(Int, Int)]
    for ((i, j) <- path; a <- -radius to radius; b <- -radius to radius) {
      // project each coarse cell to the 2x2 block it covers, then pad
      for (di <- 0 to 1; dj <- 0 to 1) {
        val ii = i * 2 + di + a; val jj = j * 2 + dj + b
        if (ii >= 0 && ii < n && jj >= 0 && jj < m) set += ((ii, jj))
      }
    }
    // ensure connectivity of corners
    set += ((0, 0)); set += ((n - 1, m - 1))
    set.toSet
  }

  /** FastDTW path between x and y. */
  def fastdtw(x: Array[Double], y: Array[Double], radius: Int = 1): (Double, Path) = {
    val minSize = radius + 2
    if (x.length <= minSize || y.length <= minSize) dtwPath(x, y)
    else {
      val (_, coarse) = fastdtw(reduceByHalf(x), reduceByHalf(y), radius)
      dtwPath(x, y, Some(expandWindow(coarse, x.length, y.length, radius)))
    }
  }

  /** Reference stretch: expand `short` to `long`'s length via the warp
    * path (see scaladoc above). Identity when lengths match. */
  def stretch(short: Array[Double], long: Array[Double]): Array[Double] = {
    if (short.length == long.length) return short.clone()
    val (_, path) = fastdtw(short, long)
    val sdp = Array.fill(long.length)(0.0)
    for ((a, b) <- path) sdp(b) += long(b) - short(a)
    long.indices.map(i => long(i) - sdp(i)).toArray
  }
}
