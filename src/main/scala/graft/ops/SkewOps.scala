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

  /** Key-distribution profiler: top-k heavy hitters per profiled
    * column, with each value's share of its column's rows. The planning
    * tool behind every skew mitigation in this repo (salted aggs, df
    * caps, AQE skew joins): run it BEFORE the expensive job to learn
    * which keys need salting.
    *
    * Scale: each profile is groupBy(value).count() — map-side partial
    * aggregation collapses the input to one row per distinct value
    * before the shuffle — then orderBy().limit(k), which Spark executes
    * as TakeOrderedAndProject (per-partition top-k, merged on the
    * driver): no single task ever sorts the full distinct-value set,
    * so even a high-cardinality column profiles safely. The rank
    * window only touches the k surviving rows. */
  def heavyHitters(profiles: Seq[(String, DataFrame, String)], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    profiles.map { case (label, df, c) =>
      val counts = df.groupBy(col(c).cast("string").as("value"))
        .agg(count(lit(1)).as("cnt"))
      val total = counts.agg(sum(col("cnt")).as("__tot"))
      val top = counts.orderBy(col("cnt").desc, col("value").asc).limit(k)
      top.crossJoin(broadcast(total))
        .withColumn("share", round(col("cnt") / col("__tot"), 6))
        .withColumn("rank", row_number()
          .over(Window.orderBy(col("cnt").desc, col("value").asc)).cast("long"))
        .select(lit(label).as("col"), col("value"), col("cnt"),
          col("share"), col("rank"))
    }.reduce(_.unionAll(_))
  }

  /** Count-min-sketch frequency estimates (Cormode & Muthukrishnan
    * 2005) for every distinct value of a key column: the sketch is
    * built in ONE distributive pass (`df.stat.countMinSketch` — each
    * partition sketches locally, sketches merge associatively) and
    * broadcast; estimates are read per distinct key. The 100-TB
    * story: frequency answers from a few-KB summary without holding
    * per-key counters — the exact groupBy this suite uses as the
    * oracle is what the sketch REPLACES at scale.
    *
    * Estimates never undercount; with distinct keys ≪ width (2/eps)
    * and a fixed seed the collision pattern is deterministic and, in
    * the profiled-keys regime, estimates equal exact counts — which
    * is what the oracle asserts (the error bound itself is
    * spec-tested on a planted wide key set). The probe is a Scala UDF
    * over the broadcast sketch — justified: no codegen'd probe exists
    * for a driver-built CountMinSketch, and the per-row work is one
    * hash of a short string. */
  def cmsEstimates(df: DataFrame, keyCol: String, eps: Double,
      confidence: Double, seed: Int): DataFrame = {
    val spark = df.sparkSession
    val sketch = df.stat.countMinSketch(col(keyCol).cast("string"),
      eps, confidence, seed)
    val bc = spark.sparkContext.broadcast(sketch)
    val est = udf((k: String) => bc.value.estimateCount(k))
    // a CMS stores no nulls (countMinSketch skips them, and the probe
    // would NPE) — the null-key row is answered exactly, so a
    // null-bearing keyspace agrees with the exact-groupBy oracle
    // instead of crashing the task
    val keyed = df.select(col(keyCol).cast("string").as("value"))
    val nonNull = keyed.filter(col("value").isNotNull).distinct()
      .withColumn("est_count", est(col("value")))
    val nullRow = keyed.filter(col("value").isNull)
      .agg(count(lit(1)).as("est_count"))
      .select(lit(null).cast("string").as("value"), col("est_count"))
      .filter(col("est_count") > 0)
    nonNull.unionByName(nullRow)
  }

  /** Pre-join EXPLOSION audit ([EXT]): for each join-key value, the
    * EXACT output cardinality n_left·n_right the equi-join would
    * produce, top-k offenders first — the diagnosis run BEFORE
    * launching a 100-TB join, where one hot key (the null-like
    * sentinel user, the default timestamp, the empty string) can emit
    * more rows than the rest of the join combined and wedge a single
    * reducer. The self-join case (a = b on a session key) is the
    * classic sessionization detonation: output per key is c².
    *
    * Scale: two map-side-combined groupBys to |keys| rows each, one
    * |keys|-row join, and `orderBy.limit` compiling to
    * TakeOrderedAndProject (per-partition k-heaps, no global sort).
    * The audited tables are scanned once each and never shuffled
    * beyond their count aggregations. Determinism: exact integer
    * counts; ties break on the key. */
  def joinExplosion(left: DataFrame, right: DataFrame, keyCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"joinExplosion: k must be > 0, got $k")
    val ca = left.na.drop(Seq(keyCol)).groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_left"))
    val cb = right.na.drop(Seq(keyCol)).groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_right"))
    ca.join(cb, keyCol)
      .select(col(keyCol), col("n_left"), col("n_right"),
        (col("n_left") * col("n_right")).as("out_rows"))
      .orderBy(col("out_rows").desc, col(keyCol))
      .limit(k)
  }

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
