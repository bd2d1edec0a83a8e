package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column ([EXT]).
  *
  * Two paths:
  *  - bruteForceTopK: exact cosine top-k via query×corpus join +
  *    per-query window rank. Correct baseline; O(|Q|·|C|) — only sane
  *    when the query set is small or the corpus is pre-filtered.
  *  - IVF (in graft.ml.Ivf, spark.ml KMeans coarse quantizer): probe
  *    only the nearest nprobe centroids' buckets — the 100-TB path,
  *    turning the scan into a bucket-pruned join on centroid_id.
  */
object Similarity {

  /** Normalize to (id, v: array<double>, nrm) using the native
    * codegen'd dot-product expression. */
  private[graft] def prep(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    emb.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(call_function("array_dot", col("v"), col("v"))))
  }

  /** Exact cosine top-k neighbors for each query id (queries = rows of
    * `emb` satisfying `queryPred` SQL predicate; self excluded).
    * Deterministic: ties broken by neighbor id. */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: String, k: Int): DataFrame = {
    val e = prep(emb, idCol, vecCol)
    val q = e.filter(expr(queryPred))
      .select(col(idCol).as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = q.join(e, col("q_id") =!= col(idCol))
      .select(col("q_id"), col(idCol).as("n_id"),
        (call_function("array_dot", col("qv"), col("v"))
          / (col("qn") * col("nrm"))).as("cosine"))
    rankTopK(scored, k)
  }

  /** Shared deterministic ranking + output shape for exact and ANN
    * top-k (one definition keeps IvfSpec's recall comparison honest). */
  private[graft] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("n_id"), round(col("cosine"), 5).as("cosine"))
  }
}
