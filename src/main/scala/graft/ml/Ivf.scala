package graft.ml

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** IVF approximate nearest-neighbor search ([EXT] similarity scale
  * path): a KMeans coarse quantizer (nlist centroids, seeded) buckets
  * the corpus; each query probes only its nprobe nearest centroids'
  * buckets, then ranks candidates by exact cosine.
  *
  * Scale design: the corpus scan becomes an equi-join on centroid_id —
  * a bucket-pruned fraction (~nprobe/nlist) of the corpus per query —
  * instead of the full cross product. Centroids (nlist × dim doubles)
  * are broadcast. Vectors are L2-normalized before quantization so
  * euclidean cells approximate cosine neighborhoods.
  */
object Ivf {

  /** Driver-side centroid cache paired with the Memo'd bucketed table
    * (same key): nlist × dim doubles — a few KB each. Lifetime is tied
    * to the paired Memo entry: the release listener below drops the
    * centroids whenever the Memo entry leaves (eviction, staleness, or
    * explicit release), so a long-lived JVM touching many sessions or
    * inputs cannot accumulate centroid arrays unboundedly. If the Memo
    * entry is released and rebuilt, the build block overwrites this
    * entry consistently. */
  private val centersCache =
    scala.collection.concurrent.TrieMap.empty[String, Array[Array[Double]]]
  graft.queries.Memo.onRelease { internalKey =>
    // internal keys are "sessionHash|callerKey"; our callerKey starts
    // with "ivf|" and is exactly the centersCache key
    val raw = internalKey.substring(internalKey.indexOf('|') + 1)
    if (raw.startsWith("ivf|")) centersCache.remove(raw)
  }

  /** NOTE on `queryPred`'s column contract: the predicate is resolved
    * against the memoized IVF index frame, which carries ONLY
    * (`idCol`, `vn` — the L2-normalized vector — , `centroid_id`).
    * Predicates over the raw vector column or other input columns are
    * not in scope; filter `emb` before calling if you need them. */
  def topK(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: String, k: Int, nlist: Int, nprobe: Int,
      seed: Long = 42): DataFrame = {
    val spark = emb.sparkSession
    GraftFunctions.register(spark)

    // The IVF INDEX — normalized vectors + their centroid assignment —
    // is built once and probed by every subsequent search (that is the
    // production shape: index build is offline, probes are the query
    // path). Memoized per (session, input plan, nlist, seed) like the
    // other ML fits; the repeated-search cost is the bucket-pruned
    // join only, never a re-fit.
    // session identity in the key: Memo scopes its entries per session
    // internally, but centersCache must not serve centroids fitted
    // under a stopped session to a new one
    val key = s"ivf|${System.identityHashCode(spark)}|$nlist|$seed|$idCol|$vecCol|${emb.queryExecution.logical.semanticHash()}"
    val bucketed = graft.queries.Memo.cached(spark, key) {
      val e = graft.ext.Similarity.prep(emb, idCol, vecCol)
        .withColumn("vn", transform(col("v"), x => x / col("nrm")))
      val withVec = e.withColumn("__f", array_to_vector(col("vn")))
      val model = new KMeans().setK(nlist).setSeed(seed)
        .setFeaturesCol("__f").setPredictionCol("centroid_id").fit(withVec)
      centersCache(key) = model.clusterCenters.map(_.toArray)
      model.transform(withVec)
        .select(col(idCol), col("vn"), col("centroid_id"))
    }
    val centers = centersCache(key)
    val bc = spark.sparkContext.broadcast(centers)
    val probeUdf = udf((vn: Seq[Double]) => {
      val cs = bc.value
      cs.indices.map { c =>
        var d = 0.0; var i = 0
        while (i < vn.length) { val t = vn(i) - cs(c)(i); d += t * t; i += 1 }
        (c, d)
      }.sortBy(_._2).take(nprobe).map(_._1).toArray
    })

    val queries = bucketed.filter(expr(queryPred))
      .select(col(idCol).as("q_id"), col("vn").as("qv"),
        explode(probeUdf(col("vn"))).as("centroid_id"))

    val scored = queries.join(bucketed, "centroid_id")
      .filter(col("q_id") =!= col(idCol))
      .select(col("q_id"), col(idCol).as("n_id"),
        call_function("array_dot", col("qv"), col("vn")).as("cosine"))
    graft.ext.Similarity.rankTopK(scored, k)
  }
}
