package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ml.{Clustering, TraceBack}
import graft.queries.MlQueries

/** The flagship end-to-end pipeline (SURVEY.md §7.3) — the reference's
  * whole purpose (README.md:15-20) over the driver's `events` table:
  *
  *   events → order by event_id → group per user (A1)
  *          → whole-column min-max normalize (N1) → pad to max (W2)
  *          → PCA 2-D (E1) → silhouette-scan k (A5+C4)
  *          → seeded KMeans (C1) → centroid representatives (A4+J2)
  *
  * Returns one row per cluster: representative series, centroid
  * coordinates, member count. */
object Pipeline {
  def flagship(spark: SparkSession, dir: String): DataFrame = {
    // the Memo-cached PCA embedding shared with the ML query family —
    // no bare session-lifetime cache here (bounded LRU owns the release)
    val emb = MlQueries.pcaEmb(spark, dir)
    val bestK = Clustering.silhouetteScan(emb, 8).head().getInt(0)
    val assigned = Clustering.kmeans(emb, bestK)
    val reps = TraceBack.centroidRepresentatives(assigned)
    val sizes = assigned.groupBy("cluster").agg(count(lit(1)).as("n_members"))
    reps.join(sizes, "cluster")
      .select(col("cluster"), col("rep_id"),
        round(col("cx"), 6).as("cx"), round(col("cy"), 6).as("cy"),
        col("n_members"))
      .orderBy("cluster")
  }
}
