package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering and the
  * data-skipping audit that justifies it.
  *
  * At 100 TB the dominant cost of a selective query is which FILES it
  * must open, and file-level min/max zone maps prune only along the
  * physical sort order. A table laid out by `x` answers `x BETWEEN`
  * predicates from a sliver of files but reads EVERYTHING for a
  * `y BETWEEN` predicate; interleaving the bits of both columns
  * (Morton 1966; the Z-ORDER of the lakehouse table formats) gives
  * every file a bounded range in BOTH dimensions, so either predicate
  * prunes. [[zorderAudit]] quantifies exactly that trade on real
  * data: it buckets the table both ways (linear-by-x vs z-order),
  * computes each bucket's min/max zone map, and reports the fraction
  * of rows a zone-map reader must fetch for an x-selective and a
  * y-selective box — four rows that ARE the layout decision.
  *
  * Scale shape: ONE corpus pass computes the quantized coordinates
  * and the Morton code (the shared [[ZOrder.interleave]] mask ladder
  * — codegen'd shifts, no UDF) and grades BOTH layouts through a
  * single map-side-combined groupBy onto <= 2·nBuckets rows; the
  * min/max extremes ride a 1-row broadcast (lazy — no eager driver
  * action) and the pruning decision runs on the bucket table, never
  * the corpus. Everything is integer arithmetic (quantization by
  * `div`, interleave by shifts), so the audit is bit-identical across
  * engines and partitionings. The physical writer this audit gates is
  * [[ZOrder.writeZOrdered]] (same curve; double rank-quantization on
  * the write side where oracle parity isn't needed), or
  * [[mortonCode]] + `repartitionByRange(col("z"))` when the caller
  * wants the audit-exact integer quantization — parquet then carries
  * the per-file zone maps this audit simulates.
  */
object Layout {

  /** Morton-interleave two 16-bit quantized columns into a 32-bit
    * Z-value — delegates to [[ZOrder.interleave]], the repo's ONE
    * Morton definition (lockstep rule: the write layout and this
    * audit can only differ in quantization, never in the curve). The
    * values match the per-bit definition the DuckDB oracle replays. */
  private def mortonExpr(x16: String, y16: String) =
    ZOrder.interleave(col(x16), col(y16), 16)

  /** Overflow-safe 16-bit quantizer: `floor((x-lo) * 65535.0 / span)`
    * in DOUBLE, clamped to [0, 65535]. The old all-integer
    * `((x-lo) * 65535) div span` silently wrapped the long product
    * once the span exceeded ~1.4e14 (e.g. epoch-micros over a few
    * years — ADVICE r10), corrupting the z-codes. The double chain is
    * one identical IEEE sequence in Spark and DuckDB (the oracle
    * replays it verbatim), so engine parity is preserved. The clamp
    * bounds the round-UP overshoot side only (a quotient landing just
    * above 65535 or below 0); when the rounded product lands just
    * BELOW an integer (possible for spans past ~2^53/65535), the max
    * value can quantize to 65534 — a one-cell quantization skew at
    * the top of the range, identical on both engines, not an oracle
    * hazard. */
  private def quant16(x: String, lo: String, hi: String) =
    expr(s"least(CAST(65535 AS BIGINT), greatest(CAST(0 AS BIGINT), "
      + s"CAST(floor((CAST($x AS DOUBLE) - CAST($lo AS DOUBLE)) * 65535.0"
      + s" / (CAST($hi AS DOUBLE) - CAST($lo AS DOUBLE))) AS BIGINT)))")

  /** The deploy-path helper: `df` plus its quantized coordinates
    * (`x16`, `y16` in [0, 65535]) and the Morton code `z` — the sort
    * key the audited layout ships with:
    * `mortonCode(df, x, y).repartitionByRange(n, col("z"))
    * .sortWithinPartitions("z").write.parquet(...)`. Same lazy 1-row
    * broadcast extremes and integer-only arithmetic as the audit, so
    * the code a writer sorts by is bit-identical to the code the
    * audit graded. */
  def mortonCode(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val ext = df.agg(
      min(col(xCol)).cast("long").as("__xmin"),
      max(col(xCol)).cast("long").as("__xmax"),
      min(col(yCol)).cast("long").as("__ymin"),
      max(col(yCol)).cast("long").as("__ymax"))
    df.crossJoin(broadcast(ext))
      .withColumn("x16", when(col("__xmax") > col("__xmin"),
        quant16(s"CAST($xCol AS BIGINT)", "__xmin", "__xmax"))
        .otherwise(lit(0L)))
      .withColumn("y16", when(col("__ymax") > col("__ymin"),
        quant16(s"CAST($yCol AS BIGINT)", "__ymin", "__ymax"))
        .otherwise(lit(0L)))
      .withColumn("z", mortonExpr("x16", "y16"))
      .drop("__xmin", "__xmax", "__ymin", "__ymax")
  }

  /** The layout audit: for `layout IN (linear_x, zorder)` ×
    * `pred IN (x_sel, y_sel)`, the rows/buckets a min-max zone-map
    * reader must fetch. `selLo`/`selHi` bound the selective range in
    * quantized [0, 65535] space (both predicates use the same band,
    * center-band by default, so the two dimensions are symmetric and
    * the contrast isolates the LAYOUT, not the predicate). */
  def zorderAudit(df: DataFrame, xCol: String, yCol: String,
      nBuckets: Int = 64, selLo: Long = 29491, selHi: Long = 36044): DataFrame = {
    // truncating width division means a non-power-of-2 nBuckets can
    // observe one extra sliver bucket at the top of the range (e.g.
    // 48 → 49 occupied ids); n_buckets reports OBSERVED buckets, so
    // the audit stays exact either way — power-of-2 values give the
    // tidy aligned quadtree blocks
    require(nBuckets >= 2 && nBuckets <= 65536,
      s"nBuckets must be in [2, 65536], got $nBuckets")
    require(selLo >= 0 && selHi <= 65535 && selLo <= selHi,
      s"selection band [$selLo, $selHi] must sit inside [0, 65535]")
    val ext = df.agg(
      min(col(xCol)).cast("long").as("__xmin"),
      max(col(xCol)).cast("long").as("__xmax"),
      min(col(yCol)).cast("long").as("__ymin"),
      max(col(yCol)).cast("long").as("__ymax"))
    def q16(c: String, lo: String, hi: String) =
      when(col(hi) > col(lo), quant16(c, lo, hi)).otherwise(lit(0L))
    val coded = df
      .select(col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
      .na.drop(Seq("__x", "__y"))
      .crossJoin(broadcast(ext))
      .withColumn("x16", q16("__x", "__xmin", "__xmax"))
      .withColumn("y16", q16("__y", "__ymin", "__ymax"))
      .withColumn("z", mortonExpr("x16", "y16"))
      .withColumn("__b_linear", expr(s"x16 div (65536 div $nBuckets)"))
      .withColumn("__b_zorder", expr(s"z div (4294967296 div $nBuckets)"))
    // ONE corpus pass for BOTH layouts: each row contributes a
    // (layout, bucket) pair per layout via explode, and the map-side
    // combine collapses to <= 2·nBuckets rows before the shuffle — at
    // a scan-bound 100-TB table, one pass beats a per-layout rescan
    val zones = coded
      .select(explode(array(
        struct(lit("linear_x").as("layout"), col("__b_linear").as("bucket"),
          col("x16"), col("y16")),
        struct(lit("zorder").as("layout"), col("__b_zorder").as("bucket"),
          col("x16"), col("y16")))).as("e"))
      .select(col("e.layout").as("layout"), col("e.bucket").as("bucket"),
        col("e.x16").as("x16"), col("e.y16").as("y16"))
      .groupBy("layout", "bucket")
      .agg(count(lit(1)).as("rows"),
        min(col("x16")).as("bxmin"), max(col("x16")).as("bxmax"),
        min(col("y16")).as("bymin"), max(col("y16")).as("bymax"))
    // a zone-map reader fetches a bucket iff the bucket's range
    // intersects the predicate band on the CONSTRAINED dimension;
    // both predicates grade off the SAME tiny zone table in one agg
    zones
      .select(col("layout"), col("rows"), explode(array(
        struct(lit("x_sel").as("pred"),
          (col("bxmax") >= lit(selLo) && col("bxmin") <= lit(selHi))
            .as("hit")),
        struct(lit("y_sel").as("pred"),
          (col("bymax") >= lit(selLo) && col("bymin") <= lit(selHi))
            .as("hit")))).as("p"))
      .select(col("layout"), col("rows"),
        col("p.pred").as("pred"), col("p.hit").as("__hit"))
      .groupBy("layout", "pred")
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("rows")).as("total_rows"),
        sum(when(col("__hit"), 1L).otherwise(0L)).as("buckets_read"),
        sum(when(col("__hit"), col("rows")).otherwise(0L)).as("rows_read"))
      .select(col("layout"), col("pred"), col("n_buckets"),
        col("total_rows"), col("buckets_read"), col("rows_read"),
        (floor(col("rows_read").cast("double") / col("total_rows")
          * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)).as("read_frac"))
      .orderBy("layout", "pred")
  }
}
