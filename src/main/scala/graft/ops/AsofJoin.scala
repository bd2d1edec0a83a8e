package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
  * more than the running last right payload per key. A single key
  * whose history exceeds a partition is the one skew [[asof]] cannot
  * shard — [[asofSalted]] covers it by chunking the timeline and
  * carrying payloads across chunk boundaries with a second small pass
  * (identical results, parity-tested and oracle-checked).
  */
object AsofJoin {

  /** Union both sides into one keyed stream: right payload carried as
    * ONE struct (non-null for every right row even when its fields are
    * null) so the carry can never stitch fields from different right
    * rows and a legitimately NULL payload field survives. */
  private def unioned(leftDf: DataFrame, rightDf: DataFrame, keyCol: String,
      timeCol: String): (DataFrame, Array[String], Array[String]) = {
    val payloadCols = rightDf.columns.filterNot(c => c == keyCol || c == timeCol)
    val leftCols = leftDf.columns
    val lTagged = leftDf.withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          rightDf.select(payloadCols.toIndexedSeq.map(col): _*).schema.fields)))
    val rTagged = rightDf.withColumn("__side", lit(0))
      .withColumn("__r", struct(payloadCols.toIndexedSeq.map(col): _*))
      .drop(payloadCols.toIndexedSeq: _*)
    val all = lTagged.select((Seq(keyCol, timeCol, "__side", "__r") ++
        leftCols.filterNot(c => c == keyCol || c == timeCol)).map(col): _*)
      .unionByName(rTagged.select(col(keyCol), col(timeCol), col("__side"),
        col("__r")), allowMissingColumns = true)
    (all, leftCols, payloadCols)
  }

  private def finish(carried: DataFrame, leftCols: Array[String],
      payloadCols: Array[String], rCol: Column): DataFrame = {
    val out = carried.filter(col("__side") === 1)
    payloadCols.foldLeft(out)((df, c) => df.withColumn(c, rCol(c)))
      .select((leftCols ++ payloadCols).toIndexedSeq.map(col): _*)
  }

  /** leftDf(keyCol, timeCol, ...), rightDf(keyCol, timeCol, payload*).
    * Right must be unique per (key, time) — pre-aggregate if not.
    * Output: left rows + nullable right payload columns. */
  def asof(leftDf: DataFrame, rightDf: DataFrame, keyCol: String,
      timeCol: String): DataFrame = {
    val (all, leftCols, payloadCols) = unioned(leftDf, rightDf, keyCol, timeCol)
    // right rows sort before left rows at the same timestamp → visible
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = all.withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
    finish(carried, leftCols, payloadCols, col("__r"))
  }

  /** Hot-key-safe [[asof]]: partitions each key's timeline into
    * `numChunks` global time-range chunks so no window partition holds
    * more than ~1/numChunks of a hot key's history.
    *
    * Pass 1 carries payloads within (key, chunk) — the same one-shuffle
    * window as [[asof]], sharded numChunks ways. A left row whose chunk
    * holds no earlier right row is healed by pass 2: the per-(key,
    * chunk) LAST right payload (one tiny aggregate row per key-chunk)
    * is range-carried across the chunk sequence with a window over
    * strictly-earlier chunks, and joined back by (key, chunk). The
    * second pass shuffles only keys × numChunks rows — negligible next
    * to the data — and results are identical to [[asof]] (parity spec +
    * the same DuckDB ASOF oracle as the unsalted query). */
  def asofSalted(leftDf: DataFrame, rightDf: DataFrame, keyCol: String,
      timeCol: String, numChunks: Int = 32): DataFrame = {
    require(numChunks >= 1, s"numChunks must be >= 1, got $numChunks")
    val (all0, leftCols, payloadCols) = unioned(leftDf, rightDf, keyCol, timeCol)
    // Global time bounds → equal-width chunks. Both sides share the
    // boundaries, so equal timestamps always land in the same chunk
    // and the in-chunk __side ordering still decides visibility. The
    // bounds come from per-side single-column aggregates (the scans
    // prune to timeCol) — NOT from the materialized union, which would
    // add a full-width scan of both inputs just for two scalars.
    val tc = col(timeCol).cast("double")
    val bl = leftDf.agg(min(tc).as("mn"), max(tc).as("mx")).head()
    val br = rightDf.agg(min(tc).as("mn"), max(tc).as("mx")).head()
    val bounds = Seq(bl, br).flatMap(r =>
      if (r.isNullAt(0)) Nil else Seq((r.getDouble(0), r.getDouble(1))))
    if (bounds.isEmpty) return finish( // both sides empty of usable rows
      all0.withColumn("__r", col("__r")), leftCols, payloadCols, col("__r"))
    val mn = bounds.map(_._1).min
    val mx = bounds.map(_._2).max
    val span = math.max(mx - mn, 1e-9)
    def chunkOf(t: Column): Column = least(lit(numChunks - 1),
      floor((t.cast("double") - lit(mn)) / lit(span) * numChunks)).cast("int")
    val all = all0.withColumn("__chunk", chunkOf(col(timeCol)))

    // pass 1: carry within (key, chunk)
    val w1 = Window.partitionBy(col(keyCol), col("__chunk"))
      .orderBy(col(timeCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = all.withColumn("__r1", last(col("__r"), ignoreNulls = true).over(w1))

    // pass 2: per-(key, chunk) last right payload, carried across
    // strictly-earlier chunks on the full key × chunk grid. Built
    // straight from rightDf (pruned scan of the right side only), not
    // by re-deriving and re-filtering the whole union.
    val rSide = rightDf.select(col(keyCol), col(timeCol),
        struct(payloadCols.toIndexedSeq.map(col): _*).as("__r"))
      .withColumn("__chunk", chunkOf(col(timeCol)))
    val chunkLast = rSide.groupBy(col(keyCol), col("__chunk"))
      .agg(max_by(col("__r"), col(timeCol)).as("__rl"))
    val grid = rSide.select(col(keyCol)).distinct()
      .select(col(keyCol), explode(sequence(lit(0), lit(numChunks - 1))).as("__chunk"))
    val wPrev = Window.partitionBy(col(keyCol)).orderBy(col("__chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val boundary = grid.join(chunkLast, Seq(keyCol, "__chunk"), "left")
      .withColumn("__prev", last(col("__rl"), ignoreNulls = true).over(wPrev))
      .select(col(keyCol), col("__chunk"), col("__prev"))

    val healed = carried.join(boundary, Seq(keyCol, "__chunk"), "left")
      .withColumn("__rf", coalesce(col("__r1"), col("__prev")))
    finish(healed, leftCols, payloadCols, col("__rf"))
  }
}
