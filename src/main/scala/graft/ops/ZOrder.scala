package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) write layout: interleave the bits of two
  * key columns and range-partition + sort the output files by the
  * interleaved value, so EVERY file's min/max footer stats are tight
  * in BOTH dimensions at once. A single-column sort gives perfect
  * pruning on that column and none on the other; the Morton layout
  * trades a little of each for locality in both — the standard
  * data-skipping move for two-dimensional predicates (key × time,
  * tenant × date) at 100-TB scan scale, where row-group pruning IS
  * the query plan.
  *
  * The interleave is pure codegen'd bit arithmetic (shifts/and/or
  * folded over the bit positions — no UDF); inputs are rank-quantized
  * to `bits` via their value range so skew in the raw values doesn't
  * collapse curve cells. Two dimensions cover the overwhelming
  * majority of real predicates; higher dimensions fold the same way.
  */
object ZOrder {

  /** Morton-interleave two non-negative long columns, `bits` bits
    * each (result uses 2·bits bits). Codegen'd shifts — no UDF. */
  def interleave(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be 1..31, got $bits")
    (0 until bits).map { i =>
      val abit = shiftleft(shiftrightunsigned(a, i).bitwiseAND(lit(1L)), 2 * i)
      val bbit = shiftleft(shiftrightunsigned(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
      abit.bitwiseOR(bbit)
    }.reduce(_.bitwiseOR(_))
  }

  /** Quantize a numeric column to `bits`-bit rank space over its
    * observed [min, max] (one-row agg broadcast back) — skew-robust
    * cell assignment for the curve. Resolves against the plan the
    * `__lo_/__hi_` stat columns were joined into. */
  private def quantize(c: String, bits: Int): Column = {
    val lo = col(s"__lo_$c")
    val hi = col(s"__hi_$c")
    val span = when(hi > lo, hi - lo).otherwise(lit(1.0))
    least(lit((1L << bits) - 1),
      floor((col(c).cast("double") - lo) / span * ((1L << bits) - 1)))
      .cast("long")
  }

  /** Write `df` as `numFiles` parquet files laid out along the Morton
    * curve of (c1, c2). Output is bit-identical data to a plain write;
    * only the file layout (and thus footer min/max tightness) changes. */
  def writeZOrdered(df: DataFrame, c1: String, c2: String,
      path: String, numFiles: Int, bits: Int = 16): Unit = {
    val stats = df.agg(
      min(col(c1)).cast("double").as(s"__lo_$c1"),
      max(col(c1)).cast("double").as(s"__hi_$c1"),
      min(col(c2)).cast("double").as(s"__lo_$c2"),
      max(col(c2)).cast("double").as(s"__hi_$c2"))
    df.crossJoin(broadcast(stats))
      .withColumn("__z", interleave(quantize(c1, bits), quantize(c2, bits), bits))
      .drop(s"__lo_$c1", s"__hi_$c1", s"__lo_$c2", s"__hi_$c2")
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
