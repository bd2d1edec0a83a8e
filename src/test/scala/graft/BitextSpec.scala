package graft

import graft.ext.Similarity

class BitextSpec extends SparkSpec {
  import spark.implicits._

  test("bitextMine: axis-aligned translations pair up; hubness margin beats raw cosine") {
    // en1 ≈ de1 (x-axis), en2 ≈ de2 (y-axis); with k=2 the margin
    // denominator averages the good and the bad neighbor, so the
    // matched pair scores well above 1
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (10L, Array(0.9f, 0.1f)), (11L, Array(0.1f, 0.9f)))
      .toDF("vec_id", "embedding")
    val lang = Seq((1L, "en"), (2L, "en"), (10L, "de"), (11L, "de"))
      .toDF("vec_id", "lang")
    val got = Similarity.bitextMine(emb, "vec_id", "embedding", lang, "lang",
        "en", "de", k = 2, threshold = 1.0)
      .orderBy("src_id")
      .as[(Long, Long, Double, Double)].collect()
    assert(got.map(r => r._1 -> r._2).toSeq == Seq(1L -> 10L, 2L -> 11L),
      got.mkString(", "))
    got.foreach(r => assert(r._4 > 1.0 && r._3 > 0.9, r.toString))
  }

  test("bitextMine: argmax ties break to the lower target id; zero vectors excluded") {
    // de 10 and 11 are bit-identical → every score ties → the forward
    // pick must be the LOWER id, deterministically; de 12 is the zero
    // vector and must vanish (no NaN poisoning the averages)
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),
      (10L, Array(0.9f, 0.1f)), (11L, Array(0.9f, 0.1f)),
      (12L, Array(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val lang = Seq((1L, "en"), (10L, "de"), (11L, "de"), (12L, "de"))
      .toDF("vec_id", "lang")
    val got = Similarity.bitextMine(emb, "vec_id", "embedding", lang, "lang",
        "en", "de", k = 2, threshold = 0.0)
      .as[(Long, Long, Double, Double)].collect()
    assert(got.length == 1 && got.head._2 == 10L, got.mkString(", "))
    assert(!got.head._4.isNaN && got.head._4 > 0.0, got.head.toString)
  }

  test("bitextMine: threshold above the best score yields the empty mining result") {
    val emb = Seq((1L, Array(1.0f, 0.0f)), (10L, Array(0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
    val lang = Seq((1L, "en"), (10L, "de")).toDF("vec_id", "lang")
    assert(Similarity.bitextMine(emb, "vec_id", "embedding", lang, "lang",
      "en", "de", k = 2, threshold = 99.0).count() == 0)
  }

  test("bitextMineIvf: exhaustive regime (nprobe==nlist, cand>=|tgt|) is bitwise the exact tier") {
    // the shared-margin-tail lockstep pin: when the probe covers every
    // cell and the candidate heap holds the whole target side, the
    // IVF variant sees the full bipartite graph and must reproduce
    // bitextMine row-for-row — scores included, since both feed the
    // same bitextMarginTail
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.7f, 0.7f)),
      (10L, Array(0.9f, 0.1f)), (11L, Array(0.1f, 0.9f)),
      (12L, Array(0.6f, 0.8f)), (13L, Array(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val lang = Seq((1L, "en"), (2L, "en"), (3L, "en"),
      (10L, "de"), (11L, "de"), (12L, "de"), (13L, "de"))
      .toDF("vec_id", "lang")
    val exact = Similarity.bitextMine(emb, "vec_id", "embedding", lang,
      "lang", "en", "de", k = 2, threshold = 0.0).orderBy("src_id").collect()
    val ivf = Similarity.bitextMineIvf(emb, "vec_id", "embedding", lang,
      "lang", "en", "de", k = 2, threshold = 0.0,
      cand = 8, nlist = 2, nprobe = 2, seed = 7).orderBy("src_id").collect()
    assert(ivf.toSeq == exact.toSeq,
      s"ivf=${ivf.mkString(", ")} exact=${exact.mkString(", ")}")
  }

  test("bitextMutual: intersection keeps only reciprocal argmax pairs; subset of forward") {
    // en1 and en3 both point at de10 (en3 weakly); de10's backward
    // argmax is en1 -> (en3, de10) survives forward mining but must
    // die in the intersection; (en1, de10) and (en2, de11) survive
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.8f, 0.2f)),
      (10L, Array(0.9f, 0.1f)), (11L, Array(0.1f, 0.9f)))
      .toDF("vec_id", "embedding")
    val lang = Seq((1L, "en"), (2L, "en"), (3L, "en"),
      (10L, "de"), (11L, "de")).toDF("vec_id", "lang")
    val fwd = Similarity.bitextMine(emb, "vec_id", "embedding", lang,
      "lang", "en", "de", k = 2, threshold = 0.0)
      .select("src_id", "tgt_id").as[(Long, Long)].collect().toSet
    val mut = Similarity.bitextMutual(emb, "vec_id", "embedding", lang,
      "lang", "en", "de", k = 2, threshold = 0.0)
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(fwd.contains(3L -> 10L), s"fixture broken: $fwd")
    val mutPairs = mut.map(r => r._1 -> r._2).toSet
    assert(mutPairs.subsetOf(fwd), s"mutual not a forward subset: $mutPairs")
    assert(mutPairs == Set(1L -> 10L, 2L -> 11L), mut.mkString(", "))
    mut.foreach(r => assert(r._4 > 0.0 && r._5 > 0.0 && !r._4.isNaN, r.toString))
  }

  test("bitextMutualIvf: exhaustive regime is bitwise the exact mutual tier") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.8f, 0.2f)),
      (10L, Array(0.9f, 0.1f)), (11L, Array(0.1f, 0.9f)))
      .toDF("vec_id", "embedding")
    val lang = Seq((1L, "en"), (2L, "en"), (3L, "en"),
      (10L, "de"), (11L, "de")).toDF("vec_id", "lang")
    val exact = Similarity.bitextMutual(emb, "vec_id", "embedding", lang,
      "lang", "en", "de", k = 2, threshold = 0.0).orderBy("src_id").collect()
    val ivf = Similarity.bitextMutualIvf(emb, "vec_id", "embedding", lang,
      "lang", "en", "de", k = 2, threshold = 0.0,
      cand = 8, nlist = 2, nprobe = 2, seed = 7).orderBy("src_id").collect()
    assert(ivf.toSeq == exact.toSeq,
      s"ivf=${ivf.mkString(", ")} exact=${exact.mkString(", ")}")
  }

  test("bitextMineIvf: pruned probe mines a pair subset with scores from the shared tail") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (10L, Array(0.9f, 0.1f)), (11L, Array(0.1f, 0.9f)))
      .toDF("vec_id", "embedding")
    val lang = Seq((1L, "en"), (2L, "en"), (10L, "de"), (11L, "de"))
      .toDF("vec_id", "lang")
    val exactPairs = Similarity.bitextMine(emb, "vec_id", "embedding",
      lang, "lang", "en", "de", k = 2, threshold = 0.0)
      .select("src_id", "tgt_id").as[(Long, Long)].collect().toSet
    val pruned = Similarity.bitextMineIvf(emb, "vec_id", "embedding",
      lang, "lang", "en", "de", k = 2, threshold = 0.0,
      cand = 2, nlist = 2, nprobe = 1, seed = 7)
      .as[(Long, Long, Double, Double)].collect()
    assert(pruned.nonEmpty, "pruned probe mined nothing on a 2x2 fixture")
    pruned.foreach { r =>
      assert(exactPairs.contains(r._1 -> r._2) || r._4 > 0.0, r.toString)
      assert(!r._4.isNaN && !r._3.isNaN, r.toString)
    }
  }
}
