package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiling: the cheap full-scan passes a pipeline runs
  * before committing 100 TB to an expensive job (complements
  * [[SkewOps.heavyHitters]], which profiles key skew).
  */
object Profile {

  /** Small-file COMPACTION planner — the remedy for the classic
    * warehouse pathology where a partitioned/bucketed layout leaves
    * thousands of under-sized files whose per-file open/footer/task
    * overhead dominates the scan (the inverse of data skipping): given
    * per-cell byte masses (cell = file, shard, or partition — whatever
    * the rewrite unit is), assign cells to target-sized rewrite bins
    * by deterministic next-fit over the (bytes desc, cell asc) order.
    * A cell lands in the bin where its cumulative prefix STARTS
    * (bin = ⌊(cumsum − bytes) / target⌋), so bins are contiguous runs
    * of the sorted order: totals are ≤ target + the bin's first cell,
    * single cells above target get bins of their own (flagged
    * `oversize` — they need splitting, not packing), and the plan is
    * reproducible on any engine with integer arithmetic alone.
    *
    * Scale: the INPUT is metadata — one row per cell, i.e. per file or
    * partition, never per record — so the single-partition ordering
    * window runs over a frame that is ~10⁵ rows when the data is
    * 100 TB (house regime: same documented shape as the mixture
    * planners' post-aggregation windows). The actual rewrite then
    * streams each bin's cells independently. */
  def compactionPlan(cells: DataFrame, cellCols: Seq[String],
      bytesCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(bytesCol).desc +: cellCols.map(col(_).asc): _*)
      .rowsBetween(Long.MinValue, 0)
    cells.withColumn("__cum", sum(col(bytesCol)).over(w))
      .select(cellCols.map(col) :+ col(bytesCol).as("bytes") :+
        floor((col("__cum") - col(bytesCol)).cast("double") / targetBytes)
          .cast("long").as("bin") :+
        (col(bytesCol) > targetBytes).as("oversize"): _*)
  }

  /** Execute a [[compactionPlan]]: co-write each bin's cells as one
    * output partition and audit the result from the READ-BACK data —
    * the rewrite half of small-file compaction (the planner says which
    * cells share a file; this moves the rows). The input streams
    * straight into the partitioned write — one shuffle onto the bin
    * key, no driver materialization — and the audit counts come from
    * re-reading the artifact, so a row lost or duplicated by the
    * rewrite breaks the audit, not just a size estimate. Output per
    * bin: (bin, n_cells, n_docs, bytes). */
  def compactionExecute(df: DataFrame, cellCols: Seq[String],
      sizeCol: String, targetBytes: Long, outDir: String): DataFrame = {
    val cells = df.groupBy(cellCols.map(col): _*)
      .agg(sum(col(sizeCol)).as("bytes"))
    val plan = compactionPlan(cells, cellCols, "bytes", targetBytes)
    // the documented "one shuffle onto the bin key": without it the
    // write inherits the SCAN's partitioning (often one task for a
    // small input; at 100 TB, input-file-aligned tasks), so a single
    // writer emits every bin's file sequentially and each task that
    // holds k bins opens k files. Hash-distributing by bin gives a
    // parallel write with exactly one file per bin (guide §6: cluster
    // by the partition key before a partitioned write).
    df.join(plan.select(cellCols.map(col) :+ col("bin"): _*), cellCols)
      .repartition(col("bin"))
      .write.mode("overwrite").partitionBy("bin").parquet(outDir)
    // explicit read-back schema (input columns + the bin partition key):
    // skips the footer-sampling schema inference over ~|bins| directories
    df.sparkSession.read
      .schema(org.apache.spark.sql.types.StructType(
        df.schema.fields :+ org.apache.spark.sql.types.StructField(
          "bin", org.apache.spark.sql.types.LongType)))
      .parquet(outDir)
      .groupBy(col("bin").cast("long").as("bin"))
      .agg(countDistinct(struct(cellCols.map(col): _*)).as("n_cells"),
        count(lit(1)).as("n_docs"),
        sum(col(sizeCol)).cast("long").as("bytes"))
  }

  /** Partition-layout pruning audit ([EXT]): materialize a
    * month-partitioned copy of `df` (partition key ym = year·100 +
    * month of `tsCol` — the canonical time-partitioned lakehouse
    * layout), read the artifact BACK, and report per partition: row
    * count, min/max event time (exact epoch micros), and whether a
    * reader filtering `tsCol >= cutoff` skips the partition outright.
    * At 100 TB the `pruned` column IS the I/O bill: a time-range scan
    * over a month-partitioned table reads only the unpruned rows, and
    * Catalyst enforces it as PartitionFilters at the scan (pinned in
    * ProfileSpec against this artifact — listing-level pruning, zero
    * bytes of skipped partitions touched). Stats come from the
    * read-back data, so a row the writer misroutes breaks the audit,
    * not an estimate.
    *
    * Scale: one partitioned write (shuffle onto ym), one
    * partial-aggregated group-by over the read-back — both linear; the
    * output is one row per partition (~10³ rows for an 80-year span). */
  def partitionPruneAudit(df: DataFrame, tsCol: String, cutoff: String,
      outDir: String): DataFrame = {
    df.withColumn("__ym",
        (year(col(tsCol)) * 100 + month(col(tsCol))).cast("int"))
      // shuffle onto the partition key before the partitioned write:
      // the source scan is one task per input split, so without this
      // one writer emits all ~|months| files sequentially (and every
      // task holding m months opens m files). Hash-distribution by ym
      // writes months in parallel, one file per month (guide §6).
      .repartition(col("__ym"))
      .write.mode("overwrite").partitionBy("__ym").parquet(outDir)
    // explicit read-back schema — no footer-sampling inference over
    // the ~|months| partition directories
    df.sparkSession.read
      .schema(org.apache.spark.sql.types.StructType(
        df.schema.fields :+ org.apache.spark.sql.types.StructField(
          "__ym", org.apache.spark.sql.types.IntegerType)))
      .parquet(outDir)
      .groupBy(col("__ym").cast("long").as("ym"))
      .agg(count(lit(1)).as("n_rows"),
        // NTZ sources cast through TimestampType under the pinned UTC
        // session TZ — identical wall-clock micros either way
        min(unix_micros(col(tsCol).cast("timestamp"))).as("min_ts_us"),
        max(unix_micros(col(tsCol).cast("timestamp"))).as("max_ts_us"))
      .withColumn("pruned",
        col("max_ts_us") < unix_micros(to_timestamp(lit(cutoff))))
  }

  /** Per-column null/missing ratios, one row per (table, column).
    * ONE pass per table: all columns' null counts are parallel
    * aggregates of a single global aggregation — no per-column jobs,
    * no shuffle of the raw rows (partial aggregation reduces each
    * partition to one row). */
  def nullRatios(tables: Seq[(String, DataFrame)]): DataFrame =
    tables.map { case (label, df) =>
      val aggs = count(lit(1)).as("__n") +:
        df.columns.toSeq.map(c =>
          count(when(col(c).isNull, 1)).as(s"__nn_$c"))
      val one = df.agg(aggs.head, aggs.tail: _*)
      val stacked = df.columns.toSeq.map(c =>
        s"'$c', __nn_$c").mkString(", ")
      one.selectExpr(s"stack(${df.columns.length}, $stacked) AS (col, n_null)",
          "__n AS n_rows")
        .select(lit(label).as("tbl"), col("col"), col("n_rows"),
          col("n_null"), round(col("n_null") / col("n_rows"), 6).as("null_ratio"))
    }.reduce(_.unionAll(_))

  /** Embedding-corpus profile: the pre-flight scan before any ANN /
    * semantic-dedup job — row count, dimensionality (min and max, so a
    * ragged corpus fails loudly rather than silently truncating dot
    * products), L2-norm distribution, and degenerate-vector counts
    * (zero norm breaks cosine; NaN/Inf poisons every distance — and
    * they are counted SEPARATELY: a +Inf component yields an Inf norm,
    * not NaN, so an n_nan-only count would let a degenerate corpus
    * profile clean).
    * ONE pass, all parallel aggregates over per-row codegen'd
    * expressions — no shuffle (partial agg reduces each partition to
    * one row). */
  def embeddingProfile(emb: DataFrame, vecCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val v = col(vecCol).cast("array<double>")
    val nrm = sqrt(call_function("array_dot", v, v))
    emb.select(v.as("__v"), nrm.as("__nrm"))
      .agg(count(lit(1)).as("n"),
        min(size(col("__v"))).cast("long").as("dim_min"),
        max(size(col("__v"))).cast("long").as("dim_max"),
        round(avg(col("__nrm")), 6).as("avg_norm"),
        round(min(col("__nrm")), 6).as("min_norm"),
        round(max(col("__nrm")), 6).as("max_norm"),
        count(when(col("__nrm") === 0.0, 1)).as("n_zero"),
        count(when(col("__nrm").isNaN, 1)).as("n_nan"),
        // sqrt never returns -Inf, so +Inf is the only infinite norm
        count(when(col("__nrm") === Double.PositiveInfinity, 1)).as("n_inf"))
  }

  /** Referential-integrity audit — the data-contract gate a lakehouse
    * runs before trusting a join graph: for each declared
    * (child.key → parent.key) relation, the child rows whose key is
    * NULL (not a violation under SQL FK semantics, but reported — a
    * silent null-key population breaks downstream inner joins by
    * dropping rows, not by erroring) and the ORPHANS (non-null child
    * keys with no parent row). `ok` = zero orphans.
    *
    * Scale shape per relation: one left_anti join against the
    * DISTINCT parent keys (AQE broadcasts dimension-sized parents;
    * fact-to-fact relations shuffle on the key — the join's own
    * partitioning) plus two map-side-combined count aggregates; the
    * result is |relations| rows. Exact integer counts throughout. */
  def fkIntegrity(
      relations: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(relations.nonEmpty, "fkIntegrity needs at least one relation")
    relations.map { case (name, child, childKey, parent, parentKey) =>
      val keys = child.select(col(childKey).as("__k"))
      val base = keys.agg(count(lit(1)).as("n_child"),
        sum(when(col("__k").isNull, 1L).otherwise(0L)).as("n_null_keys"))
      val orphans = keys.na.drop(Seq("__k"))
        .join(parent.select(col(parentKey).as("__k")).distinct(),
          Seq("__k"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      base.crossJoin(orphans)
        .select(lit(name).as("relation"), col("n_child"),
          col("n_null_keys"), col("n_orphans"),
          (col("n_orphans") === 0L).as("ok"))
    }.reduce(_ unionAll _).orderBy("relation")
  }
}
