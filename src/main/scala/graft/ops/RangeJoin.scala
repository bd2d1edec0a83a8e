package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range (interval) join: Spark plans a plain
  * `p.value >= i.lo AND p.value < i.hi` join as
  * BroadcastNestedLoopJoin — O(points × intervals) and a driver OOM
  * once the interval side outgrows broadcast. Binning restores an
  * equi-join: every interval explodes onto the fixed-width bin grid it
  * overlaps, every point lands in exactly one bin, the join is
  * hash-partitioned on the bin key, and the exact range predicate
  * filters the bin-collision false positives afterwards. Identical
  * result set to the naive predicate join, by construction.
  *
  * Scale: shuffle volume is points + Σ interval-widths/binWidth rows
  * on the bin key — pick binWidth near the median interval width so
  * each interval explodes into O(1) bins. Skewed bins (a hot value
  * range) shuffle-split under AQE like any hash join; the plan never
  * degrades into a product. PlanSpec asserts the no-BNLJ shape.
  */
object RangeJoin {

  /** Join each point row to every interval row whose [lo, hi) contains
    * its `pCol` value. Both inputs pass through unchanged (plus the
    * match), intervals with no points and points with no interval drop
    * (inner join). */
  def pointInInterval(points: DataFrame, pCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val pb = points.withColumn("__bin",
      floor(col(pCol) / binWidth).cast("long"))
    val ib = intervals.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    pb.join(ib, Seq("__bin"))
      .filter(col(pCol) >= col(loCol) && col(pCol) < col(hiCol))
      .drop("__bin")
  }
}
