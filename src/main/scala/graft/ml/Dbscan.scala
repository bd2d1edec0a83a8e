package graft.ml

import scala.collection.mutable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C2: DBSCAN over a 2-D embedding — not in MLlib, so a custom
  * distributed implementation (reference behavior: app.py:748-752,
  * sklearn semantics: the point itself counts toward min_samples;
  * label −1 = noise).
  *
  * Scale design (the reference regime is n ≤ 10⁵, but this plan holds
  * at 10⁹): grid-partition the plane into eps-sized cells; a point's
  * eps-neighbors can only live in its 3×3 cell neighborhood, so the
  * neighbor search is an equi-join on cell key (9× fan-out on one
  * side), never an all-pairs product. Cluster formation is connected
  * components over core-core edges via iterative min-label
  * propagation — O(diameter) joins, each shuffling only the edge list.
  * Labels are canonicalized to the minimum member series_id, making
  * output deterministic regardless of partitioning.
  */
object Dbscan {

  /** Input: (series_id, x, y). Output: (series_id, cluster) with
    * cluster = min series_id of the component's core points, −1 noise.
    * `maxDriverEdges` gates the driver union-find fast path; set 0 to
    * force the distributed label-propagation path (tested for parity
    * in ClusteringSpec). */
  def run(points: DataFrame, eps: Double, minPts: Int,
      maxDriverEdges: Long = 5000000L): DataFrame = {
    val spark = points.sparkSession
    val pts = points.select(col("series_id").cast("long").as("id"),
      col("x").cast("double"), col("y").cast("double"))
      .withColumn("cx", floor(col("x") / eps))
      .withColumn("cy", floor(col("y") / eps))
      .cache()

    // 9-cell fan-out on the left side, equi-join on cell key.
    val probes = pts.select(col("id"), col("x"), col("y"),
        explode(expr("sequence(-1, 1)")).as("dx"), col("cx"), col("cy"))
      .select(col("id"), col("x"), col("y"),
        (col("cx") + col("dx")).as("jcx"), col("cy"),
        explode(expr("sequence(-1, 1)")).as("dy"))
      .select(col("id"), col("x"), col("y"), col("jcx"),
        (col("cy") + col("dy")).as("jcy"))
    val rhs = pts.select(col("id").as("id2"), col("x").as("x2"),
      col("y").as("y2"), col("cx").as("jcx"), col("cy").as("jcy"))
    val edges = probes.join(rhs, Seq("jcx", "jcy"))
      .filter(pow(col("x") - col("x2"), 2) + pow(col("y") - col("y2"), 2)
        <= eps * eps)
      .select(col("id"), col("id2"))
      .cache()

    // Core points: |eps-ball| >= minPts (self included, sklearn-style).
    val core = edges.groupBy("id").agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= minPts).select(col("id")).cache()

    // Connected components over core-core edges: min-label propagation.
    val coreEdges = edges
      .join(core, "id")
      .join(core.select(col("id").as("id2")), "id2")
      .select(col("id"), col("id2"))
      .cache()

    // Reference-regime fast path (SURVEY.md §7.5 #4): the core-core
    // edge list fits on the driver → union-find there instead of
    // O(diameter) distributed rounds. Same result (canonical min-id
    // labels) either way; the distributed path remains for scale.
    val nEdges = coreEdges.count()
    var labels: DataFrame = null
    if (nEdges <= maxDriverEdges) {
      import spark.implicits._
      val parent = mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      coreEdges.as[(Long, Long)].collect().foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val coreIds = core.as[Long].collect()
      labels = coreIds.map(id => (id, find(id))).toSeq.toDF("id", "label")
    } else {
      // localCheckpoint each round: truncates the iterative plan
      // lineage, which otherwise outgrows the driver's analyzer.
      labels = core.select(col("id"), col("id").as("label")).localCheckpoint()
      var changed = 1L
      var iter = 0
      while (changed > 0 && iter < 50) {
        val prop = coreEdges
          .join(labels.select(col("id").as("id2"), col("label")), "id2")
          .groupBy("id").agg(min(col("label")).as("nl"))
        val next = labels.join(prop, Seq("id"), "left")
          .select(col("id"), least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
          .localCheckpoint()
        changed = next.join(labels.withColumnRenamed("label", "old"), "id")
          .filter(col("label") =!= col("old")).count()
        labels = next
        iter += 1
      }
    }

    // Border points: non-core with >=1 core neighbor → that core's label.
    val borderLabels = edges
      .join(labels.select(col("id").as("id2"), col("label")), "id2")
      .join(core, Seq("id"), "left_anti")
      .groupBy("id").agg(min(col("label")).as("cluster"))

    val coreLabels = labels.select(col("id"), col("label").as("cluster"))
    val assigned = coreLabels.unionByName(borderLabels)
    // materialize the (small) result eagerly so the working caches can
    // be freed instead of accumulating across a long session
    val result = pts.select(col("id"))
      .join(assigned, Seq("id"), "left")
      .select(col("id").as("series_id"),
        coalesce(col("cluster"), lit(-1L)).as("cluster"))
      .localCheckpoint()
    Seq(coreEdges, core, edges, pts).foreach(_.unpersist())
    result
  }
}
