package graft

import graft.ext.Similarity

/** Embedding-space audits (ext/Similarity.scala dimStats /
  * matryoshkaAudit): closed-form pins on planted vectors. */
class EmbeddingAuditSpec extends SparkSpec {

  test("dimRobustStats: hand-picked order statistics; one wild outlier cannot move them") {
    import spark.implicits._
    import graft.ext.Similarity
    // dim 0 values {1..8}: k1=⌈8/4⌉... lower stats: q1=s[2]=2, med=s[4]=4,
    // q3=s[6]=6, iqr=4; dim 1 constant → dead
    val clean = (1 to 8).map(i =>
      (i.toLong, Array(i.toFloat, 5.0f))).toDF("vec_id", "embedding")
    val r = Similarity.dimRobustStats(clean, "vec_id", "embedding")
      .orderBy("dim")
      .as[(Long, Long, Double, Double, Double, Double, Boolean)].collect()
    assert(r(0) == ((0L, 8L, 2.0, 4.0, 6.0, 4.0, false)), r(0).toString)
    assert(r(1)._6 == 0.0 && r(1)._7, r(1).toString)
    // replace the max with 10⁶: every order statistic below q3's index
    // is untouched (breakdown resistance the mean/std audit lacks)
    val dirty = ((1 to 7).map(i => (i.toLong, Array(i.toFloat))) :+
      (8L, Array(1e6f))).toDF("vec_id", "embedding")
    val d = Similarity.dimRobustStats(dirty, "vec_id", "embedding")
      .as[(Long, Long, Double, Double, Double, Double, Boolean)].head()
    assert(d._3 == 2.0 && d._4 == 4.0 && d._5 == 6.0, d.toString)
  }
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

  test("integrity: a clean corpus audits as four zero-count rows") {
    val audit = Similarity.embeddingIntegrity(
      Tables.documents(spark, sf), Tables.embeddings(spark, sf),
      "doc_id", "vec_id", "embedding")
      .as[(String, Long, Option[Long])].collect().toSeq
    assert(audit == Seq(
      ("dim_mismatch", 0L, None),
      ("missing_embedding", 0L, None),
      ("orphan_vector", 0L, None),
      ("zero_norm", 0L, None)))
  }

  test("integrity: each planted defect class is found with its smallest id") {
    // one doc with no vector, one orphan vector, one short vector, one
    // zero vector — the audit must attribute each to the right row
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val emb = Seq(
      (2L, Seq(1.0f, 2.0f)), // doc 1 missing
      (3L, Seq(1.0f)),       // short
      (4L, Seq(0.0f, 0.0f)), // zero
      (5L, Seq(1.0f, 1.0f)),
      (9L, Seq(2.0f, 2.0f))) // orphan
      .toDF("vec_id", "embedding")
    val audit = Similarity.embeddingIntegrity(docs, emb,
      "doc_id", "vec_id", "embedding")
      .as[(String, Long, Option[Long])].collect().toSeq
    assert(audit == Seq(
      ("dim_mismatch", 1L, Some(3L)),
      ("missing_embedding", 1L, Some(1L)),
      ("orphan_vector", 1L, Some(9L)),
      ("zero_norm", 1L, Some(4L))))
  }

  test("drift: a shifted dimension is flagged, an unchanged one is not") {
    // dim 0: mean 0.5 -> 5.5 (shift = 10x its 0.5 std) -> drifted at tol 1
    // dim 1: constant 10 both sides (std 0, delta 0) -> not drifted
    val a = Seq((1L, Seq(0.0, 10.0)), (2L, Seq(1.0, 10.0)))
      .toDF("vec_id", "embedding")
    val b = Seq((1L, Seq(5.0, 10.0)), (2L, Seq(6.0, 10.0)))
      .toDF("vec_id", "embedding")
    val rows = Similarity.dimDrift(a, b, "vec_id", "embedding", 1.0)
      .orderBy("dim")
      .as[(Int, Double, Double, Double, Double, Double, Boolean)]
      .collect().toSeq
    assert(rows == Seq(
      (0, 0.5, 5.5, 5.0, 0.5, 0.5, true),
      (1, 10.0, 10.0, 0.0, 0.0, 0.0, false)))
  }

  test("integrity: empty embedding table fails with a named error, not an NPE") {
    val docs = Seq(1L).toDF("doc_id")
    val emb = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.embeddingIntegrity(docs, emb, "doc_id", "vec_id", "embedding")
    }
    assert(e.getMessage.contains("empty"))
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

  test("procrustes: recovers a planted rotation, W orthogonal, residual collapses") {
    import graft.ext.Similarity
    // planted 4-d snapshot; rotation R = block-Givens (c, s) = (0.6, 0.8)
    val c = 0.6; val s = 0.8
    def rot(v: Seq[Double]): Seq[Double] =
      Seq(c * v(0) - s * v(1), s * v(0) + c * v(1),
        c * v(2) - s * v(3), s * v(2) + c * v(3))
    val base = Seq(
      1L -> Seq(1.0, 2.0, -1.0, 0.5), 2L -> Seq(0.2, -3.0, 4.0, 1.0),
      3L -> Seq(-2.0, 0.1, 0.0, 2.5), 4L -> Seq(3.0, 3.0, -3.0, -1.0),
      5L -> Seq(0.5, -0.5, 1.5, -2.0))
    val a = base.toDF("vec_id", "embedding")
    val b = base.map { case (id, v) => (id, rot(v)) }.toDF("vec_id", "embedding")
    val w = Similarity.fitProcrustes(a, b, "vec_id", "embedding")
    // the contract: W inverts the planted rotation — b·W reproduces a
    for (((_, va), (_, vb)) <- base.zip(base.map { case (id, v) => (id, rot(v)) })) {
      val back = (0 until 4).map(j =>
        (0 until 4).map(i => vb(i) * w(i)(j)).sum)
      for (d <- 0 until 4)
        assert(math.abs(back(d) - va(d)) < 1e-9,
          s"b·W != a at dim $d: ${back(d)} vs ${va(d)}")
    }
    // orthogonality
    for (i <- 0 until 4; j <- 0 until 4) {
      val dot = (0 until 4).map(k => w(k)(i) * w(k)(j)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9)
    }
    // audit face: post-residual 0, pre-residual > 0, all ok
    val audit = Similarity.procrustesAudit(a, b, "vec_id", "embedding")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(audit("n_aligned") == ((5L, true)))
    assert(audit("orthogonality_micro") == ((0L, true)))
    assert(audit("post_residual_micro") == ((0L, true)))
    assert(audit("pre_residual_micro")._1 > 0L && audit("pre_residual_micro")._2)
    // disjoint snapshots fail loudly, not with an empty-collect NPE
    val other = Seq(99L -> Seq(1.0, 0.0, 0.0, 0.0)).toDF("vec_id", "embedding")
    val err = intercept[IllegalArgumentException] {
      Similarity.fitProcrustes(a, other, "vec_id", "embedding")
    }
    assert(err.getMessage.contains("share no ids"))
  }

  test("diversity: identical vectors cos 1, orthogonal pair cos 0, singleton NULL, corpus row additive") {
    // label 0: two identical unit vectors → mean pairwise cos 1,
    //          diversity 0
    // label 1: two orthogonal unit vectors → mean cos 0, diversity 1
    // label 2: a singleton → no pairs → NULL mean_cos/diversity
    // a zero vector is excluded entirely (norm-0 sentinel)
    val df = Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(1.0f, 0.0f), 0),
      (3L, Seq(1.0f, 0.0f), 1), (4L, Seq(0.0f, 1.0f), 1),
      (5L, Seq(0.6f, 0.8f), 2),
      (6L, Seq(0.0f, 0.0f), 2))
      .toDF("vec_id", "embedding", "label")
    val rows = Similarity.diversityAudit(df, "embedding", "label")
      .orderBy("label")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    // corpus row (label -1): 5 vectors; sum-vector S/1e6 =
    // (1+1+1+0.6, 1+0.8) = (3.6, 1.8) → |S|² = 12.96+3.24 = 16.2
    // → mean cos = (16.2 − 5)/(5·4) = 0.56
    assert(rows == Seq(
      (-1L, 5L, Some(0.56), Some(0.44)),
      (0L, 2L, Some(1.0), Some(0.0)),
      (1L, 2L, Some(0.0), Some(1.0)),
      (2L, 1L, None, None)))
  }

  test("diversity: zero-norm vectors never reach the audit") {
    val df = Seq((1L, Seq(0.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    assert(Similarity.diversityAudit(df, "embedding", "label").count() == 0)
  }
}
