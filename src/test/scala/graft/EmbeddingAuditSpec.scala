package graft

import graft.ext.Similarity

/** Embedding-space audits (ext/Similarity.scala dimStats /
  * matryoshkaAudit): closed-form pins on planted vectors. */
class EmbeddingAuditSpec extends SparkSpec {
  import spark.implicits._

  test("dimStats: closed-form mean/std/min/max on planted vectors") {
    // dim 0: values (1, 3) → mean 2, var ((1-2)²+(3-2)²)/2 = 1, std 1
    // dim 1: constant 5 → std 0 (dead-dim detection)
    val df = Seq((1L, Seq(1.0f, 5.0f)), (2L, Seq(3.0f, 5.0f)))
      .toDF("vec_id", "embedding")
    val rows = Similarity.dimStats(df, "vec_id", "embedding")
      .orderBy("dim")
      .as[(Int, Long, Double, Double, Double, Double)].collect().toSeq
    assert(rows == Seq(
      (0, 2L, 2.0, 1.0, 1.0, 3.0),
      (1, 2L, 5.0, 0.0, 5.0, 5.0)))
  }

  test("matryoshka: energy concentrated in the prefix audits as frac 1; zero vector as 0") {
    // v1: all energy in dims 1-2 → frac(k=2) = 1 and frac(k=1) = 3/5
    // v2: zero vector → frac 0 at every k (greatest(·,1) guard)
    val df = Seq(
      (1L, Seq(3.0f, 4.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val rows = Similarity.matryoshkaAudit(df, "vec_id", "embedding", Seq(1, 2, 4))
      .orderBy("k")
      .as[(Int, Long, Double, Double, Double)].collect().toSeq
    // per-k (n, avg, min, max): v1 fracs are 0.6, 1.0, 1.0; v2 all 0
    assert(rows == Seq(
      (1, 2L, 0.3, 0.0, 0.6),
      (2, 2L, 0.5, 0.0, 1.0),
      (4, 2L, 0.5, 0.0, 1.0)))
  }

  test("matryoshka: fractions are monotone non-decreasing in k on real data") {
    val audit = SparkEntry.queries("sim_matryoshka")(spark, sf)
      .orderBy("k")
      .as[(Int, Long, Double, Double, Double)].collect().toSeq
    assert(audit.map(_._1) == Seq(8, 16, 32, 64))
    val avgs = audit.map(_._3)
    assert(avgs == avgs.sorted, s"avg_frac not monotone: $avgs")
    assert(math.abs(audit.last._3 - 1.0) < 1e-9 &&
      math.abs(audit.last._4 - 1.0) < 1e-9,
      "full-length prefix must capture the whole norm")
  }
}
