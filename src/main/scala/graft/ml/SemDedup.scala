package graft.ml

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public paper;
  * [EXT], no reference counterpart): SEMANTIC deduplication in
  * embedding space — the dedup stage that catches paraphrases and
  * re-renderings that share almost no n-grams, invisible to
  * MinHash/SimHash. A seeded KMeans buckets L2-normalized embeddings
  * into semantic clusters; within each cluster, pairs at cosine ≥
  * `eps` are semantic duplicates; per duplicate group the member with
  * the LOWEST cosine to its cluster centroid survives (the paper's
  * keep rule — the least-prototypical copy carries the most marginal
  * information), ties broken toward the smaller id.
  *
  * Scale: the quadratic cosine scan is confined WITHIN clusters —
  * the paper's own scaling trick: pair volume falls from C(n,2) to
  * ~k·C(n/k,2), and the within-cluster self-join is an equi-join on
  * centroid_id that AQE handles like any other skew-prone join. The
  * KMeans fit reads [[CanonicalFit]]'s layout — a bounded seeded
  * sample in a fixed id-keyed partitioning — so the clustering,
  * hence the dedup decision, is identical at any parallelism AND the
  * fit cost is flat in corpus size (the full corpus is assigned
  * map-side via the model's broadcast centers, never reshaped for
  * the fit). The group closure reuses the shared union-find
  * ([[Components.minLabel]]) and the keeper selection reuses
  * [[graft.ext.Dedup.dedupGroupsBest]] with score = −cent_sim.
  * The assignment (fit + centroid similarity) is memoized per
  * (session, input, params): repeated calls at different `eps`
  * re-fit nothing.
  */
object SemDedup {

  /** The memoized cluster assignment: (idCol, vn, centroid_id,
    * cent_sim) — one row per input vector, vn = the L2-normalized
    * embedding. Exposed package-wide so the recall gate
    * (sem_dedup_recall) can measure cluster confinement against the
    * exact scan without re-deriving the fit. */
  private[graft] def assignments(emb: DataFrame, idCol: String, vecCol: String,
      nClusters: Int, seed: Long = 42): DataFrame = {
    require(nClusters > 0, s"nClusters must be positive, got $nClusters")
    val spark = emb.sparkSession
    import spark.implicits._
    graft.queries.Memo.cached(spark,
      s"semdedup|$nClusters|$seed|$idCol|$vecCol|${emb.queryExecution.logical.semanticHash()}") {
      val e = graft.ext.Similarity.prep(emb, idCol, vecCol)
        .withColumn("vn", transform(col("v"), x => x / col("nrm")))
        .withColumn("__f", array_to_vector(col("vn")))
      val model = new KMeans().setK(nClusters).setSeed(seed)
        .setFeaturesCol("__f").setPredictionCol("centroid_id")
        .fit(CanonicalFit.fitInput(e, idCol, seed))
      // normalized centroids as a tiny broadcast lookup; cent_sim =
      // cosine(vn, centroid) via the codegen'd array_dot
      val centDf = model.clusterCenters.map(_.toArray).zipWithIndex
        .map { case (c, i) =>
          val n = math.sqrt(c.map(x => x * x).sum)
          (i, (if (n == 0.0) c else c.map(_ / n)).toSeq)
        }.toSeq.toDF("centroid_id", "cn")
      model.transform(e)
        .select(col(idCol), col("vn"), col("centroid_id"))
        .join(broadcast(centDf), "centroid_id")
        .withColumn("cent_sim",
          call_function("array_dot", col("vn"), col("cn")))
        .select(col(idCol), col("vn"),
          col("centroid_id").cast("long").as("centroid_id"), col("cent_sim"))
    }
  }

  /** The cluster-CONFINED eps-pair scan: within-cluster pairs at
    * cosine ≥ eps — the quadratic scan SemDeDup's scaling trick
    * restricts to clusters. Exposed for the recall gate, which
    * asserts this finds 100% of the exact eps-pairs that are
    * co-clustered (and measures the cross-cluster miss rate the
    * confinement trades away). */
  def epsPairs(emb: DataFrame, idCol: String, vecCol: String,
      nClusters: Int, eps: Double, seed: Long = 42): DataFrame = {
    val assigned = assignments(emb, idCol, vecCol, nClusters, seed)
    assigned.as("a").join(assigned.as("b"),
        col("a.centroid_id") === col("b.centroid_id") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("__cos", call_function("array_dot", col("a.vn"), col("b.vn")))
      .filter(col("__cos") >= eps)
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
  }

  /** Output: (idCol, centroid_id, group_id, cent_sim, keep_id, keep)
    * — one row per input vector; `keep = false` rows are the semantic
    * duplicates a curation pass drops. */
  def semDedup(emb: DataFrame, idCol: String, vecCol: String,
      nClusters: Int, eps: Double, seed: Long = 42): DataFrame = {
    val assigned = assignments(emb, idCol, vecCol, nClusters, seed)
    val pairs = epsPairs(emb, idCol, vecCol, nClusters, eps, seed)
    graft.ext.Dedup.dedupGroupsBest(
        assigned.select(col(idCol), (-col("cent_sim")).as("__negsim")),
        idCol, "__negsim", pairs)
      .select(col(idCol), col("group_id"), col("keep_id"), col("keep"))
      .join(assigned.select(col(idCol), col("centroid_id"), col("cent_sim")),
        Seq(idCol))
      .select(col(idCol), col("centroid_id"), col("group_id"),
        round(col("cent_sim"), 6).as("cent_sim"), col("keep_id"), col("keep"))
  }
}
