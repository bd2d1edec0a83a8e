package graft

import org.apache.spark.sql.functions._
import graft.ext.Bpe

/** BPE tokenizer training (Sennrich 2016, ext/Bpe.scala): kernel
  * properties, an INDEPENDENT reimplementation check of the training
  * loop (different code structure — list-of-lists rewrite per round vs
  * the trainer's count-map + array walk), driver/distributed path
  * parity, and the sf0.001 golden head of the learned merge table. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // --- mergeSyms kernel -------------------------------------------------

  test("mergeSyms: left-to-right non-overlapping, exact rewrite") {
    assert(Bpe.mergeSyms(Vector("a", "b", "c"), "a", "b") == Vector("ab", "c"))
    // overlapping run: greedy pairs, leftover single survives
    assert(Bpe.mergeSyms(Vector("a", "a", "a"), "a", "a") == Vector("aa", "a"))
    assert(Bpe.mergeSyms(Vector("a", "a", "a", "a"), "a", "a") ==
      Vector("aa", "aa"))
    // no occurrence: unchanged
    assert(Bpe.mergeSyms(Vector("x", "y"), "a", "b") == Vector("x", "y"))
    // merged symbol does not re-trigger within the same pass
    assert(Bpe.mergeSyms(Vector("a", "b", "b"), "a", "b") == Vector("ab", "b"))
  }

  // --- independent reimplementation of the training loop ----------------

  /** A from-scratch BPE trainer written differently on purpose:
    * symbols as List[String], pair counts via groupBy over a flat
    * tuple list, merges via recursive list rewrite. Shares NOTHING
    * with ext/Bpe.scala but the published algorithm. */
  private def referenceBpe(words: Seq[(String, Long)],
      n: Int): Seq[(Int, String, String, String, Long)] = {
    def rewrite(s: List[String], l: String, r: String): List[String] = s match {
      case a :: b :: rest if a == l && b == r => (l + r) :: rewrite(rest, l, r)
      case a :: rest => a :: rewrite(rest, l, r)
      case Nil => Nil
    }
    var tbl: Seq[(List[String], Long)] =
      words.map { case (w, f) => (w.toList.map(_.toString) ::: List("</w>"), f) }
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank = 1
    var go = true
    while (rank <= n && go) {
      val counts = tbl.flatMap { case (s, f) =>
        s.zip(s.drop(1)).map(p => (p, f))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      if (counts.isEmpty) go = false
      else {
        val ((l, r), c) = counts.toSeq.sortBy { case ((l, r), c) => (-c, l, r) }.head
        acc += ((rank, l, r, l + r, c))
        tbl = tbl.map { case (s, f) => (rewrite(s, l, r), f) }
        rank += 1
      }
    }
    acc.toSeq
  }

  private val planted: Array[(String, Long)] = Array(
    ("lower", 5L), ("low", 7L), ("newest", 6L), ("widest", 3L),
    ("west", 2L), ("aaa", 4L))

  test("trainLocal matches the independent reimplementation (planted)") {
    val a = Bpe.trainLocal(planted, 25)
    val b = referenceBpe(planted.toSeq, 25)
    assert(a == b)
  }

  test("trainLocal matches the independent reimplementation (sf0.001 words)") {
    val words = Bpe.wordFreq(Tables.documents(spark, sf), "doc_id", "text")
      .select(col("w"), col("freq").cast("long")).as[(String, Long)]
      .collect()
    assert(Bpe.trainLocal(words, 15) == referenceBpe(words.toSeq, 15))
  }

  // --- driver / distributed path parity ---------------------------------

  test("parity: distributed loop == driver loop on sf0.001") {
    val docs = Tables.documents(spark, sf)
    val driver = Bpe.merges(docs, "doc_id", "text", 12)
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1).toSeq
    // force the distributed path via the gate, bypassing the Memo'd
    // driver result (different key: maxDriverWords participates)
    val dist = Bpe.merges(docs, "doc_id", "text", 12, maxDriverWords = 0)
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(driver == dist)
    assert(driver.size == 12)
  }

  // --- golden: the learned head on the pinned corpus --------------------

  test("golden: first merges on sf0.001 are exact and exhaustion is clean") {
    val m = SparkEntry.queries("text_bpe_merges")(spark, sf)
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1)
    // ranks are 1..n dense and merged = left+right throughout
    assert(m.map(_._1).toSeq == (1 to m.length))
    assert(m.forall { case (_, l, r, g, _) => g == l + r })
    // pair freqs never increase faster than the remaining mass allows:
    // the head merge is the global argmax of the initial pair counts
    val top = Bpe.pairCounts(Tables.documents(spark, sf), "doc_id", "text")
      .limit(1).as[(String, String, Long)].collect().head
    assert((m(0)._2, m(0)._3, m(0)._5) == top)
  }

  test("tokenizeCounts: zero merges counts chars; full merges reach 1 token/word") {
    val df = Seq((1L, "abc ab")).toDF("id", "text")
    val zero = Bpe.tokenizeCounts(df, "id", "text", Nil)
      .as[(Long, Long)].collect().head
    assert(zero == ((1L, 5L))) // 3 chars + 2 chars, '</w>' uncounted
    // merges that collapse both words fully (including the sentinel)
    val ms = Seq(("a", "b"), ("ab", "c"), ("abc", "</w>"), ("ab", "</w>"))
    val full = Bpe.tokenizeCounts(df, "id", "text", ms)
      .as[(Long, Long)].collect().head
    assert(full == ((1L, 2L)))
  }

  test("trainedFertility: learned vocab beats chars-per-word on sf0.001") {
    val f = SparkEntry.queries("text_bpe_fertility")(spark, sf)
    val row = f.agg(sum("total_words").cast("long"),
      sum("total_tokens").cast("long")).as[(Long, Long)].collect().head
    // with 40 merges on a 31-word vocabulary, tokens per word must be
    // far below character count (~4.8 chars/word) and at least 1
    assert(row._2 >= row._1, "at least one token per word")
    assert(row._2 < row._1 * 3, "learned merges compress well below chars/word")
  }
}
