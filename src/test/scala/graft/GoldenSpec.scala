package graft

/** SURVEY.md §5.3 golden pipeline test: the flagship on the pinned
  * sf0.001 data. Cluster coordinates are MLlib-version-sensitive, so
  * the golden pins the stable invariants: the silhouette-chosen k, the
  * total membership, the representative set, and that representatives
  * belong to their own cluster's membership. Seeded end to end — any
  * change here is a semantic change to the pipeline, not noise. */
class GoldenSpec extends SparkSpec {
  import spark.implicits._

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
