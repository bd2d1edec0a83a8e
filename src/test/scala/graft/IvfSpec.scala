package graft

import graft.ext.Similarity
import graft.ml.Ivf

/** IVF ANN vs exact brute force: recall@5 over the sf0.001 embeddings.
  * IVF trades recall for a bucket-pruned scan; with nprobe=4 of
  * nlist=16 it must still recover most true neighbors. */
class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("IVF recall@5 vs brute force ≥ 0.6 with nprobe/nlist = 1/4") {
    val emb = Tables.embeddings(spark, sf)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", "vec_id < 20", 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val approx = Ivf.topK(emb, "vec_id", "embedding", "vec_id < 20", 5, 16, 4)
      .select("q_id", "n_id").as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.keys.map { q =>
      val hit = approx.getOrElse(q, Set.empty)
      exact(q).count(hit.contains).toDouble / exact(q).size
    }.toSeq
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"mean recall $mean")
  }

  test("int8-quantized top-5 keeps high recall vs exact (quantization noise only)") {
    val emb = Tables.embeddings(spark, sf)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", "vec_id < 20", 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val quant = Similarity.quantizedTopK(emb, "vec_id", "embedding", "vec_id < 20", 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.keys.map { q =>
      exact(q).count(quant.getOrElse(q, Set.empty).contains).toDouble / exact(q).size
    }.toSeq
    val mean = recalls.sum / recalls.size
    // int8 is a far gentler approximation than IVF bucket pruning:
    // expect near-perfect neighbor agreement, not just "most"
    assert(mean >= 0.9, s"mean recall $mean")
  }

  test("quantized-IVF with full probe recovers the exact brute-force top-k") {
    val emb = Tables.embeddings(spark, sf)
    // probing every cell removes the only lossy stage (cell pruning);
    // the quantized pre-rank's top-50 pool must then contain the true
    // top-5, and the exact re-rank uses brute-force arithmetic — so the
    // composition must be EQUAL, not merely close
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", "vec_id < 10", 5)
      .select("q_id", "rank", "n_id").as[(Long, Long, Long)].collect().sorted
    val ann = Ivf.quantizedTopK(emb, "vec_id", "embedding", "vec_id < 10", 5, 16, 16, 50)
      .select("q_id", "rank", "n_id").as[(Long, Long, Long)].collect().sorted
    assert(ann.sameElements(exact))
  }

  test("IVF-PQ with full probe recovers the exact brute-force top-k") {
    val emb = Tables.embeddings(spark, sf)
    // full probe removes cell pruning; the ADC pre-rank's top-200 pool
    // must contain the true top-5 and the exact re-rank is brute-force
    // arithmetic — EQUAL, not merely close, despite 40-bit codes (mSub
    // 8 × ksub 32 over 64 dims — ~100× smaller than fp64). The pool is
    // deliberately generous: i.i.d. random embeddings are PQ's
    // adversarial case (no subspace structure to exploit), the same
    // caveat the quantized-IVF row documents for nprobe.
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", "vec_id < 10", 5)
      .select("q_id", "rank", "n_id").as[(Long, Long, Long)].collect().sorted
    val ann = Ivf.pqTopK(emb, "vec_id", "embedding", "vec_id < 10", 5, 16, 16, 200, 8, 32)
      .select("q_id", "rank", "n_id").as[(Long, Long, Long)].collect().sorted
    assert(ann.sameElements(exact))
  }

  test("IVF-PQ pruned probe keeps most true neighbors (ADC quality floor)") {
    val emb = Tables.embeddings(spark, sf)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", "vec_id < 20", 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val ann = Ivf.pqTopK(emb, "vec_id", "embedding", "vec_id < 20", 5, 16, 8, 200, 8, 32)
      .select("q_id", "n_id").as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.keys.map { q =>
      exact(q).count(ann.getOrElse(q, Set.empty).contains).toDouble / exact(q).size
    }.toSeq
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"mean recall $mean")
  }

  test("IVF-PQ survives a constant subspace (short codebook padded, alignment intact)") {
    // second subspace is all zeros after normalization -> its sub-fit
    // returns FEWER than ksub distinct centers; without padding, the
    // m*ksub+c flattening misaligns and every ADC score is wrong/NULL.
    // With full probe + all-candidate pool the output must still be
    // bitwise the brute-force answer.
    val vecs = (0 until 20).map { i =>
      val a = math.toRadians((i * 17 % 180).toDouble)
      (i.toLong, Seq(math.cos(a), math.sin(a), math.cos(2 * a), math.sin(2 * a),
        0.0, 0.0, 0.0, 0.0))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", "vec_id < 5", 3)
      .select("q_id", "rank", "n_id").as[(Long, Long, Long)].collect().sorted
    val ann = Ivf.pqTopK(emb, "vec_id", "embedding", "vec_id < 5", 3,
      2, 2, 19, mSub = 2, ksub = 8)
      .select("q_id", "rank", "n_id").as[(Long, Long, Long)].collect().sorted
    assert(ann.sameElements(exact),
      "constant-subspace PQ must still recover the exact top-k at full probe")
  }

  test("IVF-PQ rejects a non-divisible subspace split and an undersized pool") {
    intercept[IllegalArgumentException] {
      Ivf.pqTopK(Tables.embeddings(spark, sf),
        "vec_id", "embedding", "vec_id < 5", 5, 8, 2, 3) // rerank < k
    }
    intercept[IllegalArgumentException] {
      // 64 dims, mSub 7 — not divisible; must fail loudly, not
      // silently mis-slice
      Ivf.pqTopK(Tables.embeddings(spark, sf),
        "vec_id", "embedding", "vec_id < 5", 5, 8, 2, 10, mSub = 7)
    }
  }

  test("quantized-IVF rejects a rerank pool smaller than k") {
    intercept[IllegalArgumentException] {
      Ivf.quantizedTopK(Tables.embeddings(spark, sf),
        "vec_id", "embedding", "vec_id < 5", 5, 8, 2, 3)
    }
  }

  test("IVF returns exactly k ranked rows per query") {
    val out = Ivf.topK(Tables.embeddings(spark, sf),
      "vec_id", "embedding", "vec_id < 5", 5, 8, 2)
      .select("q_id", "rank").as[(Long, Long)].collect()
    assert(out.groupBy(_._1).forall(_._2.length == 5))
  }

  test("per-sample silhouette: well-separated points score near 1, misplaced negative") {
    val pts = (
      (0 until 10).map(i => (i.toLong, 0.0 + i * 0.01, 0.0, 0)) ++
      (10 until 20).map(i => (i.toLong, 100.0 + i * 0.01, 0.0, 1)) ++
      Seq((20L, 0.05, 0.0, 1)) // labeled 1 but sits inside cluster 0
    ).toSeq.toDF("series_id", "x", "y", "cluster")
    val s = graft.ml.Silhouette.samples(pts)
      .select("series_id", "s").as[(Long, Double)].collect().toMap
    assert(s(0L) > 0.9)
    assert(s(20L) < 0.0)
  }

  test("hardNegatives: the band keeps informative negatives, drops near-dups and noise") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),   // query
      (1L, Array(1.0f, 0.1f)),   // cos ≈ 0.995 — near-dup, above band
      (2L, Array(1.0f, 1.0f)),   // cos ≈ 0.707 — the hard negative
      (3L, Array(0.3f, 1.0f)),   // cos ≈ 0.287 — below band
      (4L, Array(-1.0f, 0.0f))   // cos = −1  — useless
    ).toDF("vec_id", "embedding")
    val out = Similarity.hardNegatives(emb, "vec_id", "embedding",
        "vec_id = 0", 5, 0.5, 0.95)
      .select("q_id", "n_id").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((0L, 2L)))
  }

  test("clusterBalancedSample enforces the per-cluster cap deterministically") {
    val emb = Tables.embeddings(spark, sf)
    val n = emb.count()
    // cap 4 with 8 clusters: by pigeonhole some cluster holds ≥ ⌈n/8⌉
    // members, so the cap MUST drop rows — the balancing is exercised
    val out = graft.ml.ClusterSample
      .clusterBalancedSample(emb, "vec_id", "embedding", 8, 4)
      .select("vec_id", "centroid_id", "rank")
      .as[(Long, Long, Long)].collect()
    val byCluster = out.groupBy(_._2)
    // cap respected, ranks are 1..size within each cluster
    byCluster.foreach { case (c, rows) =>
      assert(rows.length <= 4, s"cluster $c over cap: ${rows.length}")
      assert(rows.map(_._3).sorted.sameElements(1L to rows.length.toLong),
        s"cluster $c ranks not contiguous")
    }
    // no doc sampled twice; dominant clusters were actually downsampled
    assert(out.map(_._1).distinct.length == out.length)
    assert(out.length < n && out.length >= 4)
    // determinism: a second run selects the identical set
    val again = graft.ml.ClusterSample
      .clusterBalancedSample(emb, "vec_id", "embedding", 8, 4)
      .select("vec_id", "centroid_id", "rank")
      .as[(Long, Long, Long)].collect()
    assert(out.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("binary-Hamming with rerank ≥ corpus recovers the exact brute-force top-k") {
    val emb = Tables.embeddings(spark, sf)
    val n = emb.count().toInt
    // rerank = corpus size disables the prefilter entirely; the exact
    // cosine rerank then IS brute force, so equality must be bitwise
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", "vec_id < 10", 5)
      .select("q_id", "rank", "n_id").as[(Long, Long, Long)].collect().sorted
    val bh = Similarity.binaryHammingTopK(emb, "vec_id", "embedding", "vec_id < 10", 5, n)
      .select("q_id", "rank", "n_id").as[(Long, Long, Long)].collect().sorted
    assert(bh.sameElements(exact))
  }

  test("binary-Hamming packed popcount equals per-dim sign-mismatch count") {
    // ragged dims included: 70 dims spans two words with 58 padding
    // bits that must contribute 0 on both sides of the xor
    val vecs = Seq(
      (0L, Array(0.5, -1.0, 0.0, 2.0, -0.1, 3.0, -4.0, 0.7, -2.2, 1.1)),
      (1L, Array(-0.5, 1.0, -0.0, -2.0, 0.1, 3.0, 4.0, -0.7, 2.2, -1.1)),
      (2L, Array.tabulate(70)(i => if (i % 3 == 0) -1.0 else 1.0)),
      (3L, Array.tabulate(70)(i => if (i % 2 == 0) -1.0 else 1.0)),
      (4L, Array(0.5, -1.0, 0.0, 2.0, -0.1, 3.0, -4.0, 0.7, -2.2, 1.1)))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.binaryHammingTopK(df, "vec_id", "embedding",
        "vec_id = 0", 4, 4)
      .select("n_id", "hamming").as[(Long, Long)].collect().toMap
    def sign(x: Double) = x >= 0
    def ham(a: Array[Double], b: Array[Double]): Long = {
      val d = math.max(a.length, b.length)
      // shorter vector's missing dims read as sign-0 bits (negative)
      (0 until d).count(i =>
        (i < a.length && sign(a(i))) != (i < b.length && sign(b(i)))).toLong
    }
    val q = vecs.head._2
    vecs.tail.foreach { case (id, v) =>
      assert(got(id) == ham(q, v), s"n_id $id: got ${got(id)}, want ${ham(q, v)}")
    }
    // the exact duplicate (id 4) has hamming 0 and must rank first
    assert(got(4L) == 0L)
  }

  test("binary-Hamming prefilter always keeps an exact sign-duplicate") {
    val emb = Tables.embeddings(spark, sf)
    // plant an exact duplicate of vector 0 as id 999999: hamming 0 is
    // the unique minimum, so even rerank=1 must surface it
    val dup = emb.filter($"vec_id" === 0)
      .withColumn("vec_id", org.apache.spark.sql.functions.lit(999999L))
    val planted = emb.unionByName(dup)
    val top = Similarity.binaryHammingTopK(planted, "vec_id", "embedding",
        "vec_id = 0", 1, 1)
      .select("n_id", "hamming").as[(Long, Long)].collect()
    assert(top.length == 1 && top(0) == ((999999L, 0L)), top.mkString(","))
  }

  test("IVF hard negatives: full probe is bitwise the exact operator; pruned probe stays in-band") {
    val emb = Tables.embeddings(spark, sf)
    val exact = Similarity.hardNegatives(emb, "vec_id", "embedding",
        "vec_id < 10", 5, 0.2, 0.45)
      .orderBy("q_id", "rank").collect().toSeq
    val full = graft.ml.Ivf.hardNegatives(emb, "vec_id", "embedding",
        "vec_id < 10", 5, 8, 8, 0.2, 0.45)
      .orderBy("q_id", "rank").collect().toSeq
    assert(full == exact, "full probe must reproduce the exact band top-k")
    // pruned probe: a SUBSET of the exact result set per query, all
    // rows inside the band, ranks contiguous from 1
    val pruned = graft.ml.Ivf.hardNegatives(emb, "vec_id", "embedding",
        "vec_id < 10", 5, 8, 2, 0.2, 0.45)
      .select("q_id", "n_id", "cosine")
      .as[(Long, Long, Double)].collect()
    assert(pruned.forall(r => r._3 >= 0.2 && r._3 < 0.45))
    val exactPairs = exact.map(r => (r.getLong(0), r.getLong(2))).toSet
    // pruned candidates are a subset of the full candidate set, so any
    // pruned pair that IS in the exact top-5 stays; pairs outside the
    // exact top-5 can only appear when pruning removed a better one —
    // all still in-band by the filter above
    assert(pruned.nonEmpty)
  }

  test("filtered ANN: full probe is bitwise the filtered brute force; filter is PRE, not post") {
    val emb = Tables.embeddings(spark, sf)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        "vec_id < 10", 5, corpus = Some(emb.filter("label = 0")))
      .orderBy("q_id", "rank").collect().toSeq
    val full = graft.ml.Ivf.filteredTopK(emb, "vec_id", "embedding",
        "vec_id < 10", "label = 0", 5, 16, 16)
      .orderBy("q_id", "rank").collect().toSeq
    assert(full == exact, "full probe must reproduce the filtered brute force")
    // PRE-filtering semantics: every surfaced neighbor satisfies the
    // corpus predicate, and every query — including those NOT matching
    // the filter themselves — still surfaces a full k (post-filtering
    // a top-k could not: most of an unfiltered top-5 fails label = 0)
    val labels = emb.select("vec_id", "label").as[(Long, Int)].collect().toMap
    assert(full.forall(r => labels(r.getLong(2)) == 0),
      "a neighbor escaped the corpus filter")
    val perQuery = full.groupBy(_.getLong(0)).view.mapValues(_.size)
    assert(perQuery.values.forall(_ == 5), perQuery.toMap.toString)
    assert(perQuery.keys.exists(q => labels(q) != 0),
      "fixture lost its unfiltered-query case — pick a query set spanning labels")
  }

  test("saved index: loaded probe is bitwise the in-memory probe AND partition-prunes") {
    val emb = Tables.embeddings(spark, sf)
    val path = tempDir("ivfidx")
    graft.ml.Ivf.saveIndex(emb, "vec_id", "embedding", 16, 42, path)
    val fresh = graft.ml.Ivf.topK(emb, "vec_id", "embedding", "vec_id < 10", 5, 16, 4)
      .orderBy("q_id", "rank").collect().toSeq
    val loadedDf = graft.ml.Ivf.topKFromSaved(spark, path, "vec_id",
      "vec_id < 10", 5, 4)
    val loaded = loadedDf.orderBy("q_id", "rank").collect().toSeq
    assert(loaded == fresh, "artifact probe must reproduce the in-memory probe")
    // the probed-cell isin must reach the lists scan as PARTITION
    // pruning — untouched inverted lists are never opened
    val plan = loadedDf.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters")).mkString
    assert(pf.contains("centroid_id") && !pf.contains("PartitionFilters: []"),
      s"probed-cell filter did not become partition pruning:\n$pf")
  }

  test("banded Hamming: pigeonhole completeness on a planted radius-edge pair") {
    import org.apache.spark.sql.functions._
    // base vector all-positive (sign bits all 1); a copy with exactly
    // `radius` sign flips sits ON the edge (must be found); one with
    // radius+1 flips sits just outside (must be excluded even though
    // it may band-collide as a candidate)
    val radius = 3
    def vec(flips: Int) =
      (0 until 16).map(i => if (i < flips) -1.0 else 1.0).toArray
    val emb = Seq((1L, vec(0)), (2L, vec(radius)), (3L, vec(radius + 1)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.bandedHammingPairs(emb, "vec_id", "embedding", radius)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)]
      .collect().toSet
    // (1,2) at hamming 3 = radius: in; (2,3) at hamming 1: in;
    // (1,3) at hamming 4 > radius: out
    assert(pairs == Set((1L, 2L, 3L), (2L, 3L, 1L)), pairs.toString)
  }

  test("banded Hamming recall gate: exactly 1.0 by theorem on the fixture") {
    val row = Similarity.bandedHammingRecall(
        Tables.embeddings(spark, sf), "vec_id", "embedding", 15)
      .select("n_exact", "n_found", "recall")
      .as[(Long, Long, Double)].head()
    assert(row._1 == row._2 && row._3 == 1.0, row.toString)
  }

  test("banded Hamming candidates come from an equi-join on band keys, not a product join") {
    val plan = Similarity.bandedHammingPairs(
        Tables.embeddings(spark, sf), "vec_id", "embedding", 15)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("CartesianProduct"),
      s"banded candidate generation degraded into a product join:\n$plan")
    // the x–y candidate join must hash on the band keys (bi, bv); the
    // only nested-loop joins allowed are the 1-ROW dim-broadcast
    // crossJoins (withDim), which the corpus streams past map-side
    val candJoin = plan.split("\n\n").exists(b =>
      b.contains("HashJoin") && b.contains("bv#"))
    assert(candJoin, s"no hash join on the band value key:\n$plan")
    val badNlj = plan.split("\n\n").exists(b =>
      b.matches("(?s)\\(\\d+\\) BroadcastNestedLoopJoin\\b.*") &&
        !b.contains("Cross"))
    assert(!badNlj, s"non-cross nested-loop join in the banded plan:\n$plan")
  }
}
