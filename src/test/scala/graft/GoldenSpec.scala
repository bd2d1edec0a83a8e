package graft

/** SURVEY.md §5.3 golden pipeline test: the flagship on the pinned
  * sf0.001 data. Cluster coordinates are MLlib-version-sensitive, so
  * the golden pins the stable invariants: the silhouette-chosen k, the
  * total membership, the representative set, and that representatives
  * belong to their own cluster's membership. Seeded end to end — any
  * change here is a semantic change to the pipeline, not noise. */
class GoldenSpec extends SparkSpec {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def clusterMap(name: String): Map[Long, Long] = {
    import org.apache.spark.sql.functions.col
    run(name).select(col("series_id").cast("long"), col("cluster").cast("long"))
      .as[(Long, Long)].collect().toMap
  }

  // The driver can't DuckDB-oracle the ML fits (no_oracle rows), but the
  // pipelines are deterministic end to end (seeded KMeans, id-mod init
  // K-Shape, driver-local PCA/MDS with pinned sign rules) — so their
  // exact sf0.001 outputs are pinned here. A diff means a SEMANTIC
  // change to the fit, not partitioning noise.
  test("golden: ml_kmeans_clusters exact labels on sf0.001") {
    assert(clusterMap("ml_kmeans_clusters") == Map(
      0L -> 9L, 1L -> 8L, 2L -> 4L, 3L -> 0L, 4L -> 4L, 5L -> 4L, 6L -> 0L,
      7L -> 2L, 8L -> 1L, 9L -> 5L, 10L -> 9L, 11L -> 3L, 12L -> 6L,
      13L -> 7L, 14L -> 2L))
  }

  test("golden: ml_kshape_clusters exact labels on sf0.001") {
    assert(clusterMap("ml_kshape_clusters") == Map(
      0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 0L, 4L -> 1L, 5L -> 1L, 6L -> 1L,
      7L -> 1L, 8L -> 1L, 9L -> 0L, 10L -> 2L, 11L -> 2L, 12L -> 0L,
      13L -> 1L, 14L -> 0L))
  }

  test("golden: ml_dbscan_clusters exact labels + outlier set on sf0.001") {
    assert(clusterMap("ml_dbscan_clusters") == Map(
      0L -> 0L, 1L -> 1L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 0L, 6L -> -1L,
      7L -> -1L, 8L -> -1L, 9L -> -1L, 10L -> -1L, 11L -> 1L, 12L -> 1L,
      13L -> -1L, 14L -> -1L))
    val outliers = run("ml_dbscan_outliers")
      .select("series_id").as[Long].collect().toSet
    assert(outliers == Set(6L, 7L, 8L, 9L, 10L, 13L, 14L))
  }

  test("golden: ml_silhouette_scan top-5 ks on sf0.001") {
    val top = run("ml_silhouette_scan").as[(Int, Double)].collect().toSeq
    assert(top == Seq(10 -> 57.88, 2 -> 47.81, 9 -> 45.12, 8 -> 43.23, 3 -> 41.5))
  }

  test("golden: ml_pca_variance percentages on sf0.001") {
    val v = run("ml_pca_variance").as[(Int, Double)].collect().toSeq
    assert(v == Seq(1 -> 16.8, 2 -> 13.2, 3 -> 10.5, 4 -> 9.9, 5 -> 8.3,
      6 -> 7.2, 7 -> 6.9, 8 -> 5.3, 9 -> 4.8, 10 -> 4.7))
  }

  test("golden: ml_pipeline_dtw_kmeans membership histogram on sf0.001") {
    val hist = run("ml_pipeline_dtw_kmeans").as[(Int, Long)].collect().toSeq
    assert(hist == Seq(0 -> 6L, 1 -> 3L, 2 -> 6L))
  }

  test("golden: ml_dist_path_parity — distributed paths match driver paths exactly") {
    // the driver-context proof that every size-gated fit's distributed
    // path (gate forced to 0) agrees with the driver-local path: zero
    // mismatches, pinned
    val rows = run("ml_dist_path_parity")
      .as[(String, Long, Long)].collect().toSeq
    assert(rows == Seq(("dbscan", 15L, 0L), ("kmeans_cost", 15L, 0L),
      ("kshape", 15L, 0L), ("mds_landmark_c1", 15L, 0L),
      ("mds_landmark_c1_16d", 40L, 0L)), s"parity drift: $rows")
  }

  private def digest(name: String): String = {
    val s = run(name).collect().map(_.toSeq.mkString(",")).mkString("|")
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
  }

  // Row-content md5 digests over each query's own deterministic ORDER
  // BY — compact exact pins for the embedding/ANN/multimodal queries
  // whose full outputs are too wide to inline. ml_pca_embedding and
  // ml_mds_embedding share a digest by THEOREM, not accident:
  // classical MDS of euclidean distances reproduces PCA scores, and
  // both paths use the same max-|loading| sign rule and 6dp rounding.
  test("golden: embedding/ANN/multimodal digests on sf0.001") {
    val pins = Map(
      "ml_pca_embedding" -> "141e1b8a488a69e6ac7a11c337beca14",
      "ml_pca_embedding_3d" -> "53e0a32a7615721a6d798ff2e1790a83",
      "ml_mds_embedding" -> "141e1b8a488a69e6ac7a11c337beca14",
      "ml_ae_embedding" -> "63b05ebe9f9c84f809082e539e495245",
      "ml_dtw_stretch" -> "9c043300d16d1d8eef4193a9d8427a46",
      "sim_ivf_topk" -> "ea250d44e0e96b7b782ebd2135c04495",
      // re-pinned when the KMeans fit moved to a canonical input layout
      // (repartition-on-id + sort), making the model — and hence this
      // digest — independent of session parallelism
      "sample_cluster_balanced" -> "e4ebb6ecf6bb26c7e8e653556ef5fc6d",
      "sem_dedup" -> "a453b17d798a0db32d7c318bce1bb05a",
      // re-pinned when the decode dispatch grew the typed `decoded`
      // degrade flag (permanent predictive-codec fence, COVERAGE.md)
      "multimodal_features" -> "1a398d6ccb449a5934fc8ef3a473806e",
      "multimodal_frames" -> "bfc37e8bad10637b90010db016cad7ab")
    val got = pins.keys.toSeq.sorted.map(q => q -> digest(q))
    val bad = got.filter { case (q, d) => d != pins(q) }
    assert(bad.isEmpty, s"digest drift: $bad")
  }

  test("flagship golden on sf0.001: pinned k, memberships, representatives") {
    // verified bitwise identical across local[4]/local[8]/local[32]
    // after the driver-local PCA/KMeans determinism fix
    val out = SparkEntry.entry(spark)
      .as[(Long, Long, Double, Double, Long)].collect().sortBy(_._1)
    assert(out.length == 2, s"silhouette-chosen k changed: ${out.length}")
    assert(out.map(_._5).sum == 15, "total membership != series count")
    assert(out.map(_._2).toSet == Set(7L, 8L),
      s"representative set changed: ${out.map(_._2).toSeq}")
    assert(out.map(r => (r._1, r._5)).toSeq == Seq((0L, 14L), (1L, 1L)),
      "cluster memberships changed")
  }
}
