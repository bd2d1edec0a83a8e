package graft

import graft.ops.Basket

class BasketSpec extends SparkSpec {
  import spark.implicits._

  test("liftPairs: hand-computed lift/confidence; duplicates collapse; mega-basket excluded") {
    // b1{1,2} b2{1,2} b3{1,3} b4{2,3,4} → N=4, n1=3 n2=3 n3=2 n4=1;
    // only (1,2) survives minSupport 2: lift 2·4/(3·3)=8/9, conf 2/3.
    // b1's duplicate (b1,1) row must collapse to presence; b5 has 5
    // items and maxBasket=4, so it vanishes from N and the marginals.
    val rows = Seq(
      ("b1", 1L), ("b1", 1L), ("b1", 2L),
      ("b2", 1L), ("b2", 2L),
      ("b3", 1L), ("b3", 3L),
      ("b4", 2L), ("b4", 3L), ("b4", 4L)) ++
      (10L to 14L).map(i => ("b5", i))
    val got = Basket.liftPairs(rows.toDF("basket", "item"), "basket", "item",
        2, maxBasket = 4)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(got.length == 1, got.mkString(", "))
    val (a, b, n, lift, conf) = got.head
    assert(a == 1L && b == 2L && n == 2L)
    assert(lift == 0.888889 && conf == 0.666667, s"$lift / $conf")
  }

  test("liftPairs: independent items have lift 1 exactly on a complete design") {
    // every basket contains both items → n_ab = n_a = n_b = N → lift
    // N·N/(N·N) = 1, confidence 1
    val rows = (1 to 6).flatMap(k => Seq((s"b$k", 1L), (s"b$k", 2L)))
    val got = Basket.liftPairs(rows.toDF("basket", "item"), "basket", "item", 2)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(got.toSeq == Seq((1L, 2L, 6L, 1.0, 1.0)), got.mkString(", "))
  }
}
