package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bitwise parity of the bounded partial-agg top-k
  * ([[graft.functions.TopKRows]] via Similarity.aggTopK) against the
  * row_number window it replaced (VERDICT r9 #1): same rows, same
  * ranks, same tie-breaks — including duplicate keys, tiny groups
  * (fewer than k candidates), and groups far larger than the buffer
  * capacity (forcing many mid-stream compactions). */
class TopKSpec extends SparkSpec {

  /** Deterministic pseudo-random scored frame: md5-derived keys with
    * DELIBERATE duplicates (key quantized to 1dp) so tie-breaks by
    * n_id actually fire. */
  private def scored(nQ: Int, nPerQ: Int) = {
    spark.range(nQ.toLong * nPerQ).select(
      (col("id") % nQ).as("q_id"),
      expr(s"id DIV $nQ").as("n_id"),
      (round(conv(substring(md5(col("id").cast("string")), 1, 4), 16, 10)
        .cast("double") / 65535.0, 1)).as("cosine"))
  }

  private def windowed(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("n_id").asc)
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("n_id"), round(col("cosine"), 5).as("cosine"))
  }

  test("aggTopK == window row_number: dup keys, large groups, many compactions") {
    val df = scored(7, 500) // 500 candidates/group >> cap(k=5)=32
    val viaAgg = graft.ext.Similarity.rankTopK(df, 5)
      .orderBy("q_id", "rank").collect().toSeq
    val viaWin = windowed(df, 5)
      .orderBy("q_id", "rank").collect().toSeq
    assert(viaAgg == viaWin)
  }

  test("groups smaller than k emit all their rows in rank order") {
    val df = scored(5, 3)
    val viaAgg = graft.ext.Similarity.rankTopK(df, 10)
      .orderBy("q_id", "rank").collect().toSeq
    val viaWin = windowed(df, 10)
      .orderBy("q_id", "rank").collect().toSeq
    assert(viaAgg == viaWin)
    assert(viaAgg.size == 15)
  }

  test("ascending mode + payload slot: hamming-style prefilter parity") {
    val df = scored(4, 200)
      .withColumn("hamming", (col("cosine") * 10).cast("long"))
    val viaAgg = graft.ext.Similarity.aggTopK(
        df.select(col("q_id"), col("n_id"), col("hamming")),
        6, "hamming", asc = true, payCol = Some("hamming"))
      .select(col("q_id"), col("rank"), col("n_id"),
        col("__pay").as("hamming"))
      .orderBy("q_id", "rank").collect().toSeq
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("hamming").asc, col("n_id").asc)
    val viaWin = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 6)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("n_id"), col("hamming"))
      .orderBy("q_id", "rank").collect().toSeq
    assert(viaAgg == viaWin)
  }

  test("partition-count invariance: local[4] shuffles produce identical rows") {
    val df = scored(3, 300)
    val a = graft.ext.Similarity.rankTopK(df.repartition(1), 4)
      .orderBy("q_id", "rank").collect().toSeq
    val b = graft.ext.Similarity.rankTopK(df.repartition(13), 4)
      .orderBy("q_id", "rank").collect().toSeq
    assert(a == b)
  }

  test("mmrRerank: the near-dup of the top pick is demoted below the diverse doc") {
    import spark.implicits._
    // 2-D fixture, hand-walked: query (1,0); A/B/D nearly parallel at
    // ~37° (mutual sims ≈ 0.9996-0.9999), C the mirror image (sim to
    // them ≈ 0.27-0.29) with rel equal to A's. Pure-relevance top-3 is
    // (D, A, C) — two near-dups up front; MMR at λ=0.5 picks D, then
    // C (diversity beats A's higher raw rel), then A.
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),   // the query
      (2L, Array(0.8f, 0.6f)),   // A  rel 0.8
      (3L, Array(0.79f, 0.61f)), // B  rel 0.7915, near-dup of A/D
      (4L, Array(0.8f, -0.6f)),  // C  rel 0.8, diverse
      (5L, Array(0.81f, 0.59f))  // D  rel 0.8083, near-dup of A/B
    ).toDF("vec_id", "embedding")
    val out = graft.ext.Similarity.mmrRerank(
        emb, "vec_id", "embedding", "vec_id = 1", 3, 4, 0.5)
      .select("step", "doc_id").as[(Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq(5L, 4L, 2L), out.mkString(", "))
    val relOrder = graft.ext.Similarity.bruteForceTopK(
        emb, "vec_id", "embedding", "vec_id = 1", 3)
      .select("rank", "n_id").as[(Long, Long)].collect().sortBy(_._1)
    assert(relOrder.map(_._2).toSeq == Seq(5L, 2L, 4L),
      s"fixture lost its near-dup-up-front shape: ${relOrder.mkString(", ")}")
  }

  test("rrfFuse: closed-form fusion, doc-id tie-break, list counts") {
    import spark.implicits._
    // lexical surfaces docs 1,2; dense surfaces docs 2,3. Doc 2 is in
    // both lists (rank 2 + rank 1); docs 1 and 3 are single-list at
    // rank 1 and rank 2 respectively.
    val lex = Seq(("q1", 1L, 1L), ("q1", 2L, 2L))
      .toDF("q_id", "rank", "doc_id").select("q_id", "doc_id", "rank")
    val dense = Seq(("q1", 1L, 2L), ("q1", 2L, 3L))
      .toDF("q_id", "rank", "doc_id").select("q_id", "doc_id", "rank")
    val out = graft.ext.Similarity.rrfFuse(
        Seq("dense" -> dense, "lex" -> lex), 3)
      .select("q_id", "rank", "doc_id", "rrf", "n_lists")
      .as[(String, Long, Long, Double, Long)].collect().sortBy(_._2)
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    // doc 2: 1/61 (dense rank 1) + 1/62 (lex rank 2) — the both-lists
    // winner; doc 1: 1/61; doc 3: 1/62
    assert(out.map(t => (t._3, t._4, t._5)).toSeq == Seq(
      (2L, r6(1.0 / 61 + 1.0 / 62), 2L),
      (1L, r6(1.0 / 61), 1L),
      (3L, r6(1.0 / 62), 1L)), out.mkString(", "))
    // equal-rrf tie (docs at the same single-list rank) breaks on
    // doc_id asc
    val tied = Seq(("q2", 1L, 9L), ("q2", 2L, 5L))
      .toDF("q_id", "rank", "doc_id").select("q_id", "doc_id", "rank")
    val tiedDense = Seq(("q2", 1L, 4L), ("q2", 2L, 8L))
      .toDF("q_id", "rank", "doc_id").select("q_id", "doc_id", "rank")
    val t = graft.ext.Similarity.rrfFuse(
        Seq("dense" -> tiedDense, "lex" -> tied), 4)
      .select("rank", "doc_id").as[(Long, Long)].collect().sortBy(_._1)
    // ranks 1-2 are the two 1/61 docs (4 before 9), ranks 3-4 the two
    // 1/62 docs (5 before 8)
    assert(t.map(_._2).toSeq == Seq(4L, 9L, 5L, 8L), t.mkString(", "))
  }
}
