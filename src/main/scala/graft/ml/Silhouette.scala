package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C5: per-sample silhouette values (reference: app.py:760-783 uses
  * sklearn.silhouette_samples for the diagram).
  *
  * Distributed form (SURVEY.md §2.11): pairwise distances via
  * self-join, aggregated into per-(point, other-cluster) mean
  * distances; a(i) = mean distance within own cluster, b(i) = min
  * over other clusters, s(i) = (b−a)/max(a,b); singleton clusters get
  * s = 0 (sklearn convention). Noise (−1) is excluded.
  *
  * Scale: the exact-euclidean form pairs all points — O(n²), correct
  * for the reference regime (n = series count) and for the DuckDB
  * oracle. The corpus-scale path is [[samplesSquared]]: the SQUARED
  * euclidean silhouette decomposes into per-cluster sufficient
  * statistics (count, Σx, Σy, Σ|p|²), so per-sample values come from
  * one k-row broadcast and a single map pass — O(n·k), no pair join.
  * (Same decomposition MLlib's ClusteringEvaluator uses for the mean
  * score; sklearn's euclidean values differ numerically, which is why
  * the exact form stays for reference parity.)
  */
object Silhouette {

  /** Input: (series_id, x, y, cluster). Output: (series_id, cluster,
    * a, b, s). */
  def samples(assigned: DataFrame): DataFrame = {
    val pts = assigned.filter(col("cluster") =!= -1)
      .select(col("series_id"), col("x"), col("y"), col("cluster"))
    val sizes = pts.groupBy(col("cluster").as("cb"))
      .agg(count(lit(1)).as("csize"))
    val pairs = pts.as("a").join(pts.as("b"),
        col("a.series_id") =!= col("b.series_id"))
      .select(col("a.series_id").as("series_id"), col("a.cluster").as("ca"),
        col("b.cluster").as("cb"),
        sqrt(pow(col("a.x") - col("b.x"), 2) + pow(col("a.y") - col("b.y"), 2)).as("d"))
    // mean distance from each point to every cluster (own: /(size-1))
    val sums = pairs.groupBy(col("series_id"), col("ca"), col("cb"))
      .agg(sum(col("d")).as("sd"), count(lit(1)).as("n"))
      .join(broadcast(sizes), "cb")
      .withColumn("meanD",
        when(col("cb") === col("ca"), col("sd") / (col("csize") - 1))
          .otherwise(col("sd") / col("csize")))
    val a = sums.filter(col("cb") === col("ca") && col("csize") > 1)
      .select(col("series_id"), col("meanD").as("a"))
    val b = sums.filter(col("cb") =!= col("ca"))
      .groupBy(col("series_id")).agg(min(col("meanD")).as("b"))
    pts.select(col("series_id"), col("cluster"))
      .join(a, Seq("series_id"), "left")
      .join(b, Seq("series_id"), "left")
      .withColumn("s",
        when(col("a").isNull || col("b").isNull, lit(0.0))
          .otherwise((col("b") - col("a")) / greatest(col("a"), col("b"))))
      .select(col("series_id"), col("cluster"), col("a"), col("b"), col("s"))
  }

  /** Squared-euclidean per-sample silhouette — the O(n·k) scale path.
    *
    * Σ_{q∈C} |p−q|² = |C|·|p|² − 2·p·Σq + Σ_{q∈C}|q|², so the mean
    * squared distance from any point to any cluster needs only that
    * cluster's (count, Σx, Σy, Σ|q|²) — k tiny rows collected and
    * broadcast as literals. a(i) divides by |C|−1 (own cluster, self
    * excluded — the self term contributes 0 to the sum); b(i) is the
    * min over other clusters; singletons get s = 0. */
  def samplesSquared(assigned: DataFrame): DataFrame = {
    val pts = assigned.filter(col("cluster") =!= -1)
      .select(col("series_id"), col("x"), col("y"), col("cluster"))
    val stats = pts.groupBy("cluster")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x") + col("y") * col("y")).as("sq"))
      .collect()
      .map(r => (r.getAs[Any]("cluster").toString.toLong,
        (r.getAs[Long]("n"), r.getAs[Double]("sx"), r.getAs[Double]("sy"),
          r.getAs[Double]("sq"))))
      .sortBy(_._1)
    // all-noise input: array() of zero struct columns is unresolvable,
    // so short-circuit to an empty frame with the output schema. (The
    // k inline struct columns below are fine to k ~ 10³; a corpus with
    // far more clusters would switch to broadcast-joining the stats
    // table instead of inlining it.)
    if (stats.isEmpty)
      return pts.select(col("series_id"), col("cluster"),
        lit(0.0).as("a"), lit(0.0).as("b"), lit(0.0).as("s")).limit(0)
    // mean squared distance to cluster c, excluding self when own
    val meanCols = stats.map { case (c, (n, sx, sy, sq)) =>
      val p2 = col("x") * col("x") + col("y") * col("y")
      val total = lit(n) * p2 - lit(2.0) * (col("x") * lit(sx) + col("y") * lit(sy)) + lit(sq)
      val own = col("cluster").cast("long") === c
      struct(lit(c).as("c"), own.as("own"),
        when(own && lit(n) > 1, total / lit((n - 1).toDouble))
          .when(!own, total / lit(n.toDouble)).as("m")).as(s"__m$c")
    }
    val withM = pts.withColumn("__ms", array(meanCols.toIndexedSeq: _*))
    withM
      .withColumn("a", expr("filter(__ms, e -> e.own)[0].m"))
      .withColumn("b", expr("array_min(transform(filter(__ms, e -> NOT e.own), e -> e.m))"))
      .withColumn("s",
        when(col("a").isNull || col("b").isNull, lit(0.0))
          .otherwise((col("b") - col("a")) / greatest(col("a"), col("b"))))
      .select(col("series_id"), col("cluster"), col("a"), col("b"), col("s"))
  }
}
