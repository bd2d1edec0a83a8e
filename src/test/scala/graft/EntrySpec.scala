package graft

/** Driver-contract smoke: every registered query runs at sf0.001 and
  * the flagship returns clusters. */
class EntrySpec extends SparkSpec {

  test("entry flagship returns >0 cluster rows with expected schema") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSeq ==
      Seq("cluster", "rep_id", "cx", "cy", "n_members"))
    assert(df.count() > 0)
  }

  test("oracleSql keys are a subset of queries keys; names nonempty") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.nonEmpty)
  }
}
