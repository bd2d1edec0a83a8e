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

  def topK(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: String, k: Int, nlist: Int, nprobe: Int,
      seed: Long = 42): DataFrame = {
    val spark = emb.sparkSession
    GraftFunctions.register(spark)

    val e = graft.ext.Similarity.prep(emb, idCol, vecCol)
      .withColumn("vn", transform(col("v"), x => x / col("nrm")))
      .cache()

    val withVec = e.withColumn("__f", array_to_vector(col("vn")))
    val model = new KMeans().setK(nlist).setSeed(seed)
      .setFeaturesCol("__f").setPredictionCol("centroid_id").fit(withVec)
    val bucketed = model.transform(withVec)
      .select(col(idCol), col("vn"), col("centroid_id"))

    val centers = model.clusterCenters.map(_.toArray)
    val bc = spark.sparkContext.broadcast(centers)
    val probeUdf = udf((vn: Seq[Double]) => {
      val cs = bc.value
      cs.indices.map { c =>
        var d = 0.0; var i = 0
        while (i < vn.length) { val t = vn(i) - cs(c)(i); d += t * t; i += 1 }
        (c, d)
      }.sortBy(_._2).take(nprobe).map(_._1).toArray
    })

    val queries = e.filter(expr(queryPred))
      .select(col(idCol).as("q_id"), col("vn").as("qv"),
        explode(probeUdf(col("vn"))).as("centroid_id"))

    val scored = queries.join(bucketed, "centroid_id")
      .filter(col("q_id") =!= col(idCol))
      .select(col("q_id"), col(idCol).as("n_id"),
        call_function("array_dot", col("qv"), col("vn")).as("cosine"))
    // the result is #queries × k rows — materialize it eagerly so the
    // corpus cache is freed instead of accumulating across a session
    val out = graft.ext.Similarity.rankTopK(scored, k).localCheckpoint()
    e.unpersist()
    out
  }
}
