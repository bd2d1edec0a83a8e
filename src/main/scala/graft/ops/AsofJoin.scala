package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * rightTime <= leftTime within the same key — the canonical
  * time-series enrichment operator (absent from the reference, which
  * never joins on data values — SURVEY.md §2.3 — but core to any
  * time-series engine).
  *
  * Composed from built-ins per the customization preference order
  * (compose > custom Expression > custom plan): the two sides are
  * unioned into one keyed stream and the right payload is carried
  * forward with last(ignoreNulls) over an ordered window — ONE shuffle
  * on the key, no range-condition join explosion, and Catalyst keeps
  * the plan fusable. At equal timestamps the right row is considered
  * visible to the left row (ASOF >= semantics, matching DuckDB).
  *
  * Scale: equivalent to a sort-merge as-of; the window never holds
  * more than the running last right payload per key. Skewed keys
  * shard like any windowed computation (salt by time range if a
  * single key's history exceeds a partition).
  */
object AsofJoin {

  /** leftDf(keyCol, timeCol, ...), rightDf(keyCol, timeCol, payload*).
    * Right must be unique per (key, time) — pre-aggregate if not.
    * Output: left rows + nullable right payload columns. */
  def asof(leftDf: DataFrame, rightDf: DataFrame, keyCol: String,
      timeCol: String): DataFrame = {
    val payloadCols = rightDf.columns.filterNot(c => c == keyCol || c == timeCol)
    val leftCols = leftDf.columns
    val lTagged = leftDf.withColumn("__side", lit(1))
    val rTagged = payloadCols.foldLeft(
      rightDf.withColumn("__side", lit(0)))((df, c) =>
      df.withColumnRenamed(c, s"__r_$c"))
    val all = lTagged.unionByName(rTagged, allowMissingColumns = true)
    // right rows sort before left rows at the same timestamp → visible
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = payloadCols.foldLeft(all)((df, c) =>
      df.withColumn(s"__r_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w)))
    val out = carried.filter(col("__side") === 1)
    payloadCols.foldLeft(out)((df, c) => df.withColumnRenamed(s"__r_$c", c))
      .select((leftCols ++ payloadCols).map(col): _*)
  }
}
