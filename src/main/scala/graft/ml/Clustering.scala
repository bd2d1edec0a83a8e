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

  /** C1: seeded KMeans assignment: adds `cluster` int column. */
  def kmeans(emb: DataFrame, k: Int, seed: Long = 10): DataFrame = {
    val f = withFeatures(emb)
    val model = new KMeans().setK(k).setSeed(seed)
      .setFeaturesCol("__f").setPredictionCol("cluster").fit(f)
    model.transform(f).drop("__f")
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
    * reference's scan). Driver-side loop over ≤ maxK-1 fits — each fit
    * is a distributed job; the scan itself is tiny. */
  def silhouetteScan(emb: DataFrame, maxK: Int, keep: Int = 5): DataFrame = {
    val f = withFeatures(emb).cache()
    val scores = (2 to maxK).map { k =>
      val m = new KMeans().setK(k).setSeed(10)
        .setFeaturesCol("__f").setPredictionCol("cluster").fit(f)
      val s = new ClusteringEvaluator().setFeaturesCol("__f")
        .setPredictionCol("cluster").evaluate(m.transform(f))
      (k, math.rint(s * 100 * 100) / 100)
    }
    val spark = emb.sparkSession
    import spark.implicits._
    scores.sortBy { case (k, s) => (-s, k) }.take(keep)
      .toDF("k", "silhouette_pct")
  }
}
