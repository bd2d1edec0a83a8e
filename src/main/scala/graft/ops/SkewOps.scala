package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation aggregation: two-phase salted aggregate.
  *
  * A plain groupBy on a skewed key sends every row of a hot key to one
  * reducer. Salting splits each key into `salts` sub-groups on a
  * deterministic hash of a high-cardinality column, aggregates
  * partially per (key, salt), then merges the small per-salt partials.
  * Results are identical to the direct aggregate for decomposable
  * aggregates (sum/count/min/max); the oracle for the salted queries
  * is the plain GROUP BY.
  *
  * (AQE's skew-join handling covers joins; this is the agg-side
  * equivalent for static plans and a building block for custom
  * operators that can't rely on AQE.)
  */
object SkewOps {

  /** Salted sum/count: groupBy(keys :+ salt) → partial, then merge.
    * `saltSource` must be a deterministic high-cardinality column. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: Column,
      saltSource: Column, salts: Int): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(hash(saltSource), lit(salts)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as("sum_v"), sum(col("__pcnt")).as("n"))
  }
}
