package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Structural guards for the COVERAGE.md plan audit: predicate
  * pushdown, column pruning, and broadcast joins are asserted against
  * the optimized plans so a refactor can't silently turn a pruned
  * broadcast plan back into a full-scan shuffle. */
class PlanSpec extends SparkSpec {

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def run(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)

  test("q6: every predicate reaches the lineitem scan; only 4 columns read") {
    val plan = formatted(run("q6_forecast_revenue"))
    assert(plan.contains("PushedFilters:"), "no pushdown section on the scan")
    val pushed = plan.linesIterator.find(_.contains("PushedFilters:")).get
    assert(pushed.contains("GreaterThanOrEqual") || pushed.contains("GreaterThan"),
      s"range predicates not pushed: $pushed")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema:")).get
    val cols = "l_\\w+".r.findAllIn(readSchema).toSet
    assert(cols.size <= 4, s"scan reads more than the referenced columns: $cols")
  }

  test("q3: dimension sides broadcast (no shuffle join for customer/orders dims)") {
    val plan = formatted(run("q3_shipping_priority"))
    assert(plan.contains("BroadcastHashJoin"), "expected broadcast hash joins")
  }

  test("ts_profile: events scan prunes to the value column") {
    val plan = formatted(run("ts_profile"))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema:")).get
    assert(readSchema.contains("value"), s"value column missing: $readSchema")
    assert(!readSchema.contains("props") && !readSchema.contains("event_type"),
      s"unreferenced columns read: $readSchema")
  }

  test("cosine queries run the native array_dot expression, not a UDF") {
    val plan = formatted(run("dedup_cosine_pairs"))
    assert(plan.toLowerCase.contains("array_dot"), "native expression missing from plan")
    assert(!plan.contains("BatchEvalPython"), "python UDF in the hot path")
  }
}
