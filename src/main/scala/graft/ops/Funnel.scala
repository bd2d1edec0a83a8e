package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analytics: how many keys (users) progress through a
  * sequence of event types IN ORDER, each step within a horizon of the
  * previous one. Stage semantics are the strict classic form: the
  * stage-i event must occur at or after the key's FIRST qualifying
  * stage-(i−1) time, and within `horizon` of it; the stage time is the
  * earliest such event (min — deterministic, no window ordering
  * ambiguity). Output: one row per stage with the count of keys
  * reaching it (cumulative-by-construction: reaching stage i implies
  * stages 1..i−1).
  *
  * Scale: each stage is filter → keyed join against the previous
  * stage's (key, time) table → keyed min-aggregation. Every shuffle is
  * on the funnel key; the stage tables shrink monotonically, so AQE
  * broadcasts them against the filtered event stream — the events
  * table is scanned once per stage with the type filter pushed to the
  * scan, never materialized wide. */
object Funnel {

  /** `horizon` is a SQL interval body, e.g. "24 HOURS". */
  def stages(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, stageTypes: Seq[String], horizon: String): DataFrame = {
    require(stageTypes.nonEmpty, "need at least one funnel stage")
    var cur: DataFrame = null
    stageTypes.zipWithIndex.map { case (st, i) =>
      cur =
        if (i == 0)
          events.filter(col(typeCol) === st)
            .groupBy(col(keyCol)).agg(min(col(tsCol)).as("__t"))
        else
          events.filter(col(typeCol) === st)
            .join(cur.select(col(keyCol), col("__t").as("__prev")), Seq(keyCol))
            .filter(col(tsCol) >= col("__prev") &&
              col(tsCol) <= col("__prev") + expr(s"INTERVAL $horizon"))
            .groupBy(col(keyCol)).agg(min(col(tsCol)).as("__t"))
      cur.agg(count(lit(1)).as("n_keys"))
        .select(lit((i + 1).toLong).as("stage"), lit(st).as("name"),
          col("n_keys"))
    }.reduce(_.unionAll(_))
  }
}
