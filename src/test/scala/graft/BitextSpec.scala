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
}
