package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Core time-series operators re-expressed Spark-first.
  *
  * Reference semantics (citations into /root/reference/):
  *  - align + normalize front door: app.py:140-238 (§1.4 of SURVEY.md)
  *  - min-max / z-score (whole-column, population std): app.py:358-382
  *  - truncation / padding: app.py:246-280
  *  - sliding window (drop_remainder): app.py:285-295
  *
  * Scale notes: the global stats used by normalize/truncate/pad are
  * one-row full-scan reductions (map-side partial agg), broadcast back
  * via a 1-row cross join — the data itself never shuffles for them.
  * The long→nested transform shuffles once on the series key, which is
  * the natural partitioning for every downstream per-series operator.
  */
object SeriesOps {

  /** P2 + N1 + N2: drop null values, append whole-column `min_max` and
    * `z_score` columns (app.py:184-192; population stddev, ddof=0).
    * The reference appends both but feeds min_max downstream (§1.4). */
  def withNormalized(df: DataFrame, vc: String): DataFrame = {
    val v = col(vc)
    val clean = df.na.drop(Seq(vc))
    val stats = clean.agg(
      min(v).as("__mn"), max(v).as("__mx"),
      avg(v).as("__av"), stddev_pop(v).as("__sd"))
    clean.crossJoin(broadcast(stats))
      .withColumn("min_max", (v - col("__mn")) / (col("__mx") - col("__mn")))
      .withColumn("z_score", (v - col("__av")) / col("__sd"))
      .drop("__mn", "__mx", "__av", "__sd")
  }

  /** A1: long rows → one nested row per series, values in explicit
    * `seqCol` order. The reference depends on file order within each
    * group (app.py:212-217); Spark makes that an explicit sort key.
    * Output schema: series_id, values: Array[Double]. */
  def collectSeries(df: DataFrame, keyCol: String, vc: String, seqCol: String): DataFrame =
    df.na.drop(Seq(vc))
      .groupBy(col(keyCol).as("series_id"))
      .agg(transform(
        sort_array(collect_list(struct(col(seqCol).as("__s"), col(vc).cast("double").as("__v")))),
        x => x("__v")).as("values"))

  private def sumArr(c: Column): Column = aggregate(c, lit(0.0), (a, x) => a + x)

  /** Sum of an array column (sequential left fold, like numpy's walk). */
  def arraySum(c: Column): Column = sumArr(c)

  /** W1 truncation: cut every series to the global min length
    * (app.py:246-261). One-row agg broadcast, no data shuffle. */
  def truncate(series: DataFrame): DataFrame = {
    val m = series.agg(min(size(col("values"))).as("__L"))
    series.crossJoin(broadcast(m))
      .withColumn("values", slice(col("values"), lit(1), col("__L")))
      .drop("__L")
  }

  /** W2 zero padding: right-pad every series to the global max length
    * with 0.0 (app.py:266-280, np.pad constant). */
  def pad(series: DataFrame): DataFrame = {
    val m = series.agg(max(size(col("values"))).as("__M"))
    series.crossJoin(broadcast(m))
      .withColumn("values",
        concat(col("values"),
          array_repeat(lit(0.0), (col("__M") - size(col("values"))).cast("int"))))
      .drop("__M")
  }

  /** W3 + W3b sliding window, drop_remainder=True: series of length n
    * → floor((n-w)/s)+1 windows (app.py:285-295); the window index
    * becomes the new key (app.py:1788-1793). Series shorter than w
    * yield no windows. Output: series_id, win_id, window. */
  def slidingWindow(series: DataFrame, w: Int, s: Int): DataFrame = {
    val n = size(col("values"))
    series
      .filter(n >= w)
      .select(col("series_id"),
        posexplode(transform(
          sequence(lit(0), n - lit(w), lit(s)),
          i => slice(col("values"), i + lit(1), lit(w)))))
      .withColumnRenamed("pos", "win_id")
      .withColumnRenamed("col", "window")
  }

  /** Resample to a fixed interval with LOCF gap-fill: bucket each
    * key's observations to `intervalSec`-wide bins (bin value = mean),
    * materialize every bin between the key's first and last
    * observation, and carry the last observed bin value forward into
    * empty bins (last-observation-carried-forward — the canonical
    * time-series regularization the reference lacks because its time
    * axis is positional).
    *
    * Scale: one shuffle onto the key for the bin aggregation; the bin
    * grid is generated per key with `sequence` + explode (rows ∝ bins,
    * never a cross join); the fill is one ordered window per key.
    * Output: (keyCol, bin_start_s, n_obs, v: filled mean, is_gap). */
  def resampleLocf(df: DataFrame, keyCol: String, tsCol: String,
      vc: String, intervalSec: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bin = floor(unix_timestamp(col(tsCol)) / intervalSec).cast("long")
    val agged = df.na.drop(Seq(vc))
      .withColumn("__bin", bin)
      .groupBy(col(keyCol), col("__bin"))
      .agg(count(lit(1)).as("n_obs"), avg(col(vc)).as("__v"))
    val grid = agged.groupBy(col(keyCol))
      .agg(min(col("__bin")).as("__b0"), max(col("__bin")).as("__b1"))
      .select(col(keyCol),
        explode(sequence(col("__b0"), col("__b1"))).as("__bin"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__bin"))
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(agged, Seq(keyCol, "__bin"), "left")
      .withColumn("v", last(col("__v"), ignoreNulls = true).over(w))
      .select(col(keyCol), (col("__bin") * intervalSec).as("bin_start_s"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        col("v"), (col("n_obs").isNull).as("is_gap"))
  }
}
