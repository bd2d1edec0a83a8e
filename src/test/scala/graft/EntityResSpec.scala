package graft

import graft.ops.EntityRes

class EntityResSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, String)], maxDist: Int = 2) =
    EntityRes.resolve(
      rows.toDF("id", "name", "blk"), "id", "name", Seq("blk"), maxDist)
      .select("id", "entity_id").as[(Long, Long)].collect().toMap

  test("transitive chain merges through the middle record; singleton labels itself") {
    // widget—widgex (1) —widgexx (1 from widgex, 2 from widget): one
    // entity despite widget↔widgexx being distance 2 ≤ bound anyway;
    // make the chain strict with maxDist 1: widget↔widgexx is 2 > 1,
    // so only the B-bridge connects them.
    val got = run(Seq(
      (1L, "widget", "b1"), (2L, "widgex", "b1"), (3L, "widgexx", "b1"),
      (9L, "unrelated thing", "b1")), maxDist = 1)
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L, s"chain: $got")
    assert(got(9L) == 9L, s"singleton: $got")
  }

  test("blocking fences identical names into separate entities") {
    val got = run(Seq(
      (1L, "widget", "b1"), (2L, "widget", "b2"), (3L, "widget", "b1")))
    assert(got(1L) == 1L && got(3L) == 1L, s"in-block merge: $got")
    assert(got(2L) == 2L, s"cross-block leak: $got")
  }

  test("maxDist 0 is exact-duplicate resolution only") {
    val got = run(Seq(
      (1L, "bolt", "b"), (2L, "bolt", "b"), (3L, "bolts", "b")), maxDist = 0)
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 3L, got.toString)
  }

  test("empty blocking column list is rejected loudly") {
    val df = Seq((1L, "x", "b")).toDF("id", "name", "blk")
    intercept[IllegalArgumentException] {
      EntityRes.resolve(df, "id", "name", Seq.empty, 2)
    }
  }
}
