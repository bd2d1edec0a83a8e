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
  * Scale: one shuffle to pair on nothing is O(n²) — correct for the
  * reference regime (n = series count). For large n, sample or bucket
  * first; the aggregation shape is unchanged.
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
}
