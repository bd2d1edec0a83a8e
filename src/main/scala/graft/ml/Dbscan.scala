package graft.ml

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
      maxDriverEdges: Long = 5000000L): DataFrame =
    runFrom(neighborhood(points, eps, minPts), minPts, maxDriverEdges,
      unpersistAfter = true)

  /** The gate-independent HALF of a DBSCAN run: grid cells, the 9-cell
    * neighbor equi-join, degrees, core set, core-core edges — all
    * cached. Split out so the parity harness can build this ONCE and
    * run only the gate-DEPENDENT labeling tail down both paths (the
    * paths under test are the CC engines, not the neighbor join —
    * VERDICT r8 #6). Callers own the unpersist (via [[runFrom]]'s
    * `unpersistAfter`). */
  private[graft] case class Neighborhood(pts: DataFrame, edges: DataFrame,
      core: DataFrame, coreEdges: DataFrame) {
    def unpersist(): Unit =
      Seq(coreEdges, core, edges, pts).foreach(_.unpersist())
  }

  private[graft] def neighborhood(points: DataFrame, eps: Double,
      minPts: Int): Neighborhood = {
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
    Neighborhood(pts, edges, core, coreEdges)
  }

  /** The gate-DEPENDENT labeling tail over a prebuilt [[Neighborhood]]. */
  private[graft] def runFrom(nb: Neighborhood, minPts: Int,
      maxDriverEdges: Long, unpersistAfter: Boolean): DataFrame = {
    import nb.{pts, edges, core, coreEdges}
    // Reference-regime fast path (SURVEY.md §7.5 #4): small edge lists
    // union-find on the driver, else O(diameter) min-label propagation —
    // both canonical min-id labels, extracted into the shared
    // [[Components]] helper (also the dedup-group-closure engine).
    // Every core has a self-edge (distance 0 ≤ eps), so the node set
    // Components derives from the edge list covers all cores.
    val labels = Components.minLabel(coreEdges, maxDriverEdges,
      alreadySymmetric = true) // the cell join emits both directions

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
    if (unpersistAfter) Seq(coreEdges, core, edges, pts).foreach(_.unpersist())
    result
  }
}
