package graft.ml

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.evaluation.ClusteringEvaluator
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C1/C4/A5 clustering built-ins (reference: app.py:704-720, 790-808).
  *
  * The reference's production KMeans is unseeded (app.py:712) — we pin
  * seeds everywhere (SURVEY.md §7.5 #2, documented deviation). Input is
  * a 2-D embedding DataFrame (series_id, x, y) exactly like the
  * reference feeds sklearn.
  */
object Clustering {

  private def withFeatures(emb: DataFrame): DataFrame =
    emb.withColumn("__f", array_to_vector(array(col("x"), col("y"))))

  /** C1: seeded KMeans assignment: adds `cluster` int column. Small
    * inputs use the driver-local seeded k-means++ (bitwise
    * deterministic — MLlib's k-means|| init samples per partition, so
    * its result depends on partitioning even with a fixed seed);
    * larger inputs use the distributed MLlib fit.
    *
    * No bare cache of the caller's plan: the gate is a column-pruned
    * limited count (the repo's probe idiom — unpersisting a
    * caller-visible plan can evict a cache entry the caller shares,
    * since Spark's cache manager matches canonicalized plans). The
    * distributed path caches only the DERIVED `__f` plan and releases
    * it after an eager materialize, like Ivf.topK. */
  def kmeans(emb: DataFrame, k: Int, seed: Long = 10,
      gate: Long = 100000L): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    if (gate > 0 && emb.limit(gate.toInt).count() < gate) {
      val rows = emb
        .select(col("series_id").cast("long"), col("x").cast("double"),
          col("y").cast("double"))
        .orderBy(col("series_id"))
        .as[(Long, Double, Double)].collect()
      val labels = Local.kmeans(rows.map(r => (r._2, r._3)), k, seed)
      val labelDf = rows.map(_._1).zip(labels).toSeq.toDF("series_id", "cluster")
      return emb.join(broadcast(labelDf), "series_id")
    }
    // distributed: MLlib's iterative fit re-reads its input every
    // iteration — persist the derived plan, materialize the (small)
    // assignment eagerly, release the working cache
    val f = withFeatures(emb).cache()
    val model = new KMeans().setK(k).setSeed(seed)
      .setFeaturesCol("__f").setPredictionCol("cluster").fit(f)
    val out = model.transform(f).drop("__f").localCheckpoint()
    f.unpersist()
    out
  }

  /** C4: mean silhouette (squared-euclidean, like sklearn's default
    * euclidean silhouette up to the squared variant MLlib implements). */
  def silhouette(assigned: DataFrame): Double = {
    val f = withFeatures(assigned)
    new ClusteringEvaluator().setFeaturesCol("__f")
      .setPredictionCol("cluster").setMetricName("silhouette").evaluate(f)
  }

  /** A5: silhouette model-selection scan k = 2..maxK, top `keep` ks by
    * score desc (score×100 rounded 2, app.py:790-808; seed 10 like the
    * reference's scan).
    *
    * Reference-regime fast path: the embedding is one point per series
    * — tiny even at 100 TB of raw events — so for < 10⁵ points the
    * whole scan (seeded KMeans++ + EXACT euclidean silhouette, the
    * sklearn semantics the reference uses; MLlib's evaluator computes
    * the squared-euclidean variant) runs on the driver. Larger inputs
    * fall back to distributed MLlib fits. */
  def silhouetteScan(emb: DataFrame, maxK: Int, keep: Int = 5): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // gate probe, not a bare cache of the caller's plan (see kmeans)
    val gate = 100000
    val scores =
      if (emb.limit(gate).count() < gate) {
        // deterministic collect order: the seeded k-means++ init indexes
        // into this array, so partitioning must not leak into results
        val pts = emb.select(col("x").cast("double"), col("y").cast("double"))
          .orderBy(col("series_id"))
          .as[(Double, Double)].collect()
        (2 to maxK).map { k =>
          val labels = Local.kmeans(pts, k, seed = 10)
          (k, math.rint(Local.silhouette(pts, labels, k) * 100 * 100) / 100)
        }
      } else {
        // derived-plan cache for the k fits, released once the scores
        // (plain doubles — already materialized) are in hand
        val f = withFeatures(emb).cache()
        val out = (2 to maxK).map { k =>
          val m = new KMeans().setK(k).setSeed(10)
            .setFeaturesCol("__f").setPredictionCol("cluster").fit(f)
          val s = new ClusteringEvaluator().setFeaturesCol("__f")
            .setPredictionCol("cluster").evaluate(m.transform(f))
          (k, math.rint(s * 100 * 100) / 100)
        }
        f.unpersist()
        out
      }
    scores.sortBy { case (k, s) => (-s, k) }.take(keep)
      .toDF("k", "silhouette_pct")
  }
}
