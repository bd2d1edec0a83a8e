package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines ([EXT]).
  *
  * Five escalating strategies, all pure DataFrame plans:
  *  - exact: hash-groupBy on the raw text — one shuffle on md5(text).
  *  - n-gram Jaccard: exact set similarity via a shingle inverted-
  *    index self-join. Correct but O(pairs sharing a shingle) — the
  *    oracle baseline for the approximate paths.
  *  - MinHash + LSH: md5-string minhashes, band-bucket join, then
  *    exact-Jaccard verification of candidates only. The 100-TB path:
  *    cost is O(docs × hashes) + O(candidate pairs), never all pairs.
  *  - SimHash: 32-bit frequency-weighted fingerprint; near-dups =
  *    small Hamming distance. Fingerprinting is one pass; the pair
  *    scan here is brute-force (fine ≤10⁶ docs) — at scale, bucket by
  *    bit-bands exactly like MinHash-LSH.
  *  - Embedding cosine: near-dup = cosine above threshold; brute
  *    pairs here, IVF/LSH bucketing in Similarity for the scale path.
  *
  * All hashes are md5-derived so the DuckDB oracle can reproduce them
  * bit-for-bit (no murmur/xxhash divergence between engines).
  */
object Dedup {

  /** Exact duplicate groups keyed by md5 of the raw text. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol).cast("binary")).as("h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Exact n-gram (word-shingle) Jaccard pairs ≥ threshold.
    * Inverted-index join: only pairs sharing ≥1 shingle are scored. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    val sh = TextOps.shingles(docs, idCol, textCol, n).cache()
    val ns = sh.groupBy(col(idCol)).agg(count(lit(1)).as("nsh"))
    val inter = sh.as("x").join(sh.as("y"),
        col("x.s") === col("y.s") && col(s"x.$idCol") < col(s"y.$idCol"))
      .groupBy(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(ns.select(col(idCol).as("id_a"), col("nsh").as("na")), "id_a")
      .join(ns.select(col(idCol).as("id_b"), col("nsh").as("nb")), "id_b")
      .withColumn("jaccard", col("i") / (col("na") + col("nb") - col("i")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Per-doc minhash signature rows (id, h, mv): mv = lexicographic
    * min of md5(h || '|' || shingle) over the doc's shingles. */
  def minhashSignatures(sh: DataFrame, idCol: String, numHashes: Int): DataFrame =
    sh.select(col(idCol), col("s"),
        explode(sequence(lit(0), lit(numHashes - 1))).as("h"))
      .groupBy(col(idCol), col("h"))
      .agg(min(md5(concat(col("h").cast("string"), lit("|"), col("s")).cast("binary"))).as("mv"))

  /** MinHash-LSH near-dup pairs: bands of r=1 minhash each → candidate
    * pairs share any minhash value; candidates are then verified with
    * exact Jaccard and filtered at `threshold`. */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, threshold: Double): DataFrame = {
    val sh = TextOps.shingles(docs, idCol, textCol, n).cache()
    val mh = minhashSignatures(sh, idCol, numHashes)
    val cand = mh.as("a").join(mh.as("b"),
        col("a.h") === col("b.h") && col("a.mv") === col("b.mv")
          && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
    val ns = sh.groupBy(col(idCol)).agg(count(lit(1)).as("nsh"))
    val inter = cand
      .join(sh.select(col(idCol).as("id_a"), col("s")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("s").as("s2")), "id_b")
      .filter(col("s") === col("s2"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("i"))
    inter
      .join(ns.select(col(idCol).as("id_a"), col("nsh").as("na")), "id_a")
      .join(ns.select(col(idCol).as("id_b"), col("nsh").as("nb")), "id_b")
      .withColumn("jaccard", col("i") / (col("na") + col("nb") - col("i")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 32-bit SimHash per doc: per bit, frequency-weighted ±1 vote from
    * each token's md5 nibble bits; bit set iff the vote sum is > 0. */
  def simhash32(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextOps.tokens(docs, idCol, textCol)
    val votes = toks
      .select(col(idCol), explode(sequence(lit(0), lit(31))).as("b"), col("w"))
      .withColumn("v", expr(
        "CASE WHEN (shiftright(instr('0123456789abcdef', substr(md5(w), CAST(b div 4 AS INT) + 1, 1)) - 1, CAST(b % 4 AS INT)) & 1) = 1 THEN 1 ELSE -1 END"))
      .groupBy(col(idCol), col("b")).agg(sum(col("v")).as("sv"))
    votes.groupBy(col(idCol))
      .agg(sum(expr(
        "CASE WHEN sv > 0 THEN shiftleft(CAST(1 AS BIGINT), CAST(b AS INT)) ELSE CAST(0 AS BIGINT) END"))
        .as("simhash"))
  }

  /** SimHash near-dup pairs: Hamming distance ≤ maxHamming. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int): DataFrame = {
    val s = simhash32(docs, idCol, textCol)
    val a = s.select(col(idCol).as("id_a"), col("simhash").as("sa"))
    val b = s.select(col(idCol).as("id_b"), col("simhash").as("sb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("hamming", expr("CAST(bit_count(sa ^ sb) AS BIGINT)"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Embedding-cosine near-dup pairs above `threshold` (brute-force
    * pair scan; see Similarity for the bucketed scale path). */
  def cosinePairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val e = emb.select(col(idCol), col(vecCol).cast("array<double>").as("v"),
      sqrt(aggregate(col(vecCol).cast("array<double>"),
        lit(0.0), (a, x) => a + x * x)).as("nrm"))
    e.as("a").join(e.as("b"), col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        (aggregate(zip_with(col("a.v"), col("b.v"), (x, y) => x * y),
          lit(0.0), (a, x) => a + x) / (col("a.nrm") * col("b.nrm"))).as("cosine"))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 5).as("cosine"))
  }
}
