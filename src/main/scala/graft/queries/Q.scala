package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: Spark plan + (when SQL-expressible) the
  * equivalent DuckDB oracle. Column names and row order are part of the
  * contract: every aggregate/computed column is aliased identically on
  * both sides, doubles are rounded explicitly, and both sides end in
  * the same deterministic ORDER BY over a unique key. */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)
