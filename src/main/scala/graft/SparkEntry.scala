package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in graft.queries.* as (Spark plan, DuckDB oracle) pairs;
  * this object is just the registry the driver reads. */
object SparkEntry {

  private def registry: Seq[Q] = {
    val all = CoreQueries.all ++ RelationalQueries.all ++ ExtQueries.all ++
      MlQueries.all ++ MultimodalQueries.all
    val dup = all.groupBy(_.name).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"duplicate query names would be silently dropped: ${dup.mkString(", ")}")
    all
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Definition
    * order is preserved (ListMap): a plain HashMap reshuffles iteration
    * order every time a query is added, which made bench-to-bench
    * per-query comparisons meaningless (whichever query hashed to the
    * front absorbed the cold-JVM warmup) and defeated the Memo families
    * (a closure query could run before the pair query whose cache it
    * shares). Registry order runs cheap relational/series queries
    * first and keeps each Memo-sharing family adjacent. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    scala.collection.immutable.ListMap(registry.map(q => q.name -> q.fn): _*)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
