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
    // the whole right payload is carried as ONE struct (non-null for
    // every right row even when its fields are null) so the join can
    // never stitch fields from different right rows and a legitimately
    // NULL payload field survives
    val lTagged = leftDf.withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          rightDf.select(payloadCols.map(col): _*).schema.fields)))
    val rTagged = rightDf.withColumn("__side", lit(0))
      .withColumn("__r", struct(payloadCols.map(col): _*))
      .drop(payloadCols: _*)
    val all = lTagged.select((Seq(keyCol, timeCol, "__side", "__r") ++
        leftCols.filterNot(c => c == keyCol || c == timeCol)).map(col): _*)
      .unionByName(rTagged.select(col(keyCol), col(timeCol), col("__side"),
        col("__r")), allowMissingColumns = true)
    // right rows sort before left rows at the same timestamp → visible
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = all.withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
    val out = carried.filter(col("__side") === 1)
    payloadCols.foldLeft(out)((df, c) => df.withColumn(c, col("__r")(c)))
      .select((leftCols ++ payloadCols).map(col): _*)
  }
}
