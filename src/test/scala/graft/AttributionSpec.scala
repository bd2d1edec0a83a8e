package graft

import java.sql.Timestamp
import graft.ops.Attribution

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("uShaped: 40/40/20 split, last-touch contrast, unattributed and mega rows") {
    // user 1: view t1, click t2, signup t3, click t4, purchase 100 at t5
    //   -> m=4: first view 40, last click 40, middles click/signup 10/10
    // user 2: view t1, purchase 50 -> single touch takes all 50
    // user 3: purchase 25 with no preceding touch -> (unattributed)
    // user 4: 5 touches > maxTouches=4 -> (mega_user_skipped) 77
    val rows = Seq(
      (1L, "view", ts(10), 101L, 0.0), (1L, "click", ts(20), 102L, 0.0),
      (1L, "signup", ts(30), 103L, 0.0), (1L, "click", ts(40), 104L, 0.0),
      (1L, "purchase", ts(50), 105L, 100.0),
      (2L, "view", ts(10), 201L, 0.0), (2L, "purchase", ts(20), 202L, 50.0),
      (3L, "purchase", ts(20), 301L, 25.0),
      (4L, "view", ts(1), 401L, 0.0), (4L, "view", ts(2), 402L, 0.0),
      (4L, "view", ts(3), 403L, 0.0), (4L, "view", ts(4), 404L, 0.0),
      (4L, "view", ts(5), 406L, 0.0),
      (4L, "purchase", ts(6), 405L, 77.0))
      .toDF("user_id", "event_type", "ts", "event_id", "value")
    val got = Attribution.uShaped(rows, "user_id", "event_type", "ts",
        "event_id", "value", Seq("view", "click", "signup"), "purchase",
        maxTouches = 4)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == Set("view", "click", "signup",
      "(unattributed)", "(mega_user_skipped)"), got.keys.mkString(", "))
    assert(got("view") == (("view", 2L, 90.0, 50.0)), got("view").toString)
    assert(got("click") == (("click", 2L, 50.0, 100.0)), got("click").toString)
    assert(got("signup") == (("signup", 1L, 10.0, 0.0)), got("signup").toString)
    assert(got("(unattributed)") == (("(unattributed)", 1L, 25.0, 25.0)))
    assert(got("(mega_user_skipped)") == (("(mega_user_skipped)", 1L, 77.0, 77.0)))
    // conservation: u-shaped credit across ALL rows equals total
    // purchase revenue
    assert(got.values.map(_._3).sum == 252.0)
  }

  test("uShaped: two touches split 50/50; simultaneous-timestamp tie breaks by event id") {
    val rows = Seq(
      (1L, "view", ts(10), 1L, 0.0), (1L, "click", ts(10), 2L, 0.0),
      (1L, "purchase", ts(10), 3L, 10.0))
      .toDF("user_id", "event_type", "ts", "event_id", "value")
    val got = Attribution.uShaped(rows, "user_id", "event_type", "ts",
        "event_id", "value", Seq("view", "click"), "purchase")
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    // both touches precede the purchase under the (ts, id) total
    // order; click (higher id) is the LAST touch
    assert(got("view") == (("view", 1L, 5.0, 0.0)), got.toString)
    assert(got("click") == (("click", 1L, 5.0, 10.0)), got.toString)
  }
}
