package graft

import graft.ops.{Profile, SkewOps}

/** Profiler-operator semantics on hand-built fixtures: CMS error
  * bounds, embedding-corpus stats, URL-domain extraction. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("joinExplosion: exact c_a*c_b per key, hot key first, nulls excluded, keys missing a side dropped") {
    val left = Seq(1L, 1L, 1L, 2L, 3L).map(Tuple1(_)).toDF("k")
      .unionByName(Seq(Tuple1(null.asInstanceOf[java.lang.Long])).toDF("k"))
    val right = Seq(1L, 1L, 2L, 9L).map(Tuple1(_)).toDF("k")
    val out = graft.ops.SkewOps.joinExplosion(left, right, "k", 10)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // key 1: 3×2 = 6; key 2: 1×1 = 1; key 3 and 9 have no partner;
    // null never joins
    assert(out == Seq((1L, 3L, 2L, 6L), (2L, 1L, 1L, 1L)), out.toString)
  }

  test("cmsEstimates: never undercounts, overcount within eps·N on a wide key set") {
    // 200 keys with frequencies 1..200 (N = 20100) — far above the
    // profiled-keys regime, so collisions are likely and the CMS
    // guarantee (exact <= est <= exact + eps·N at the confidence) is
    // the thing to assert, not equality
    val rows = (0 until 200).flatMap(i => Seq.fill(i + 1)(s"k$i"))
    val df = rows.toDF("k")
    val n = rows.size
    val eps = 0.01
    val est = SkewOps.cmsEstimates(df, "k", eps, 0.99, 42)
      .as[(String, Long)].collect().toMap
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, c) =>
      assert(est(k) >= c, s"$k undercounted: ${est(k)} < $c")
      assert(est(k) <= c + (eps * n).toLong + 1, s"$k overcount beyond bound")
    }
  }

  test("cmsEstimates: null keys answered exactly, not NPE'd") {
    // the sketch stores no nulls (countMinSketch skips them; the probe
    // UDF would NPE) — the null-key row must come back with its EXACT
    // count, agreeing with the exact-groupBy oracle on null-bearing data
    val df = (Seq("a", "a", "b") ++ Seq.fill(3)(null: String)).toDF("k")
    val est = SkewOps.cmsEstimates(df, "k", 0.001, 0.99, 42)
      .as[(Option[String], Long)].collect().toMap
    assert(est(Some("a")) == 2L && est(Some("b")) == 1L)
    assert(est(None) == 3L, s"null-key row wrong: $est")
  }

  test("cmsEstimates is deterministic for a fixed seed") {
    val df = (0 until 50).map(i => s"k${i % 7}").toDF("k")
    val a = SkewOps.cmsEstimates(df, "k", 0.001, 0.99, 7)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    val b = SkewOps.cmsEstimates(df, "k", 0.001, 0.99, 7)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("embeddingProfile: dims, norm stats, and degenerate-vector counts") {
    val emb = Seq(
      Array(3.0f, 4.0f),   // norm 5
      Array(0.0f, 0.0f),   // zero vector
      Array(1.0f, 0.0f)    // norm 1
    ).toDF("embedding")
    val r = Profile.embeddingProfile(emb, "embedding")
      .as[(Long, Long, Long, Double, Double, Double, Long, Long, Long)].head()
    assert(r == ((3L, 2L, 2L, 2.0, 0.0, 5.0, 1L, 0L, 0L)))
  }

  test("embeddingProfile: an Inf component is flagged as n_inf, not hidden") {
    // +Inf component → Inf norm (NOT NaN: only Inf−Inf yields NaN), so
    // an n_nan-only profile would pass a degenerate corpus as clean
    val emb = Seq(
      Array(1.0f, 2.0f),
      Array(Float.PositiveInfinity, 1.0f),
      Array(Float.NaN, 1.0f)
    ).toDF("embedding")
    val r = Profile.embeddingProfile(emb, "embedding")
      .select("n", "n_zero", "n_nan", "n_inf")
      .as[(Long, Long, Long, Long)].head()
    assert(r == ((3L, 0L, 1L, 1L)), s"got $r")
  }

  test("binned range join == naive predicate join, boundaries half-open") {
    import org.apache.spark.sql.functions.col
    // seeded values hitting bin edges, interval edges, and overlaps
    val rng = new scala.util.Random(7)
    val pts = ((0 until 300).map(_ => rng.nextDouble() * 120) ++
      Seq(0.0, 10.0, 25.0, 50.0, 99.999, 100.0)).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("pid", "value")
    val iv = Seq(("a", 0.0, 10.0), ("b", 5.0, 30.0), // overlapping
      ("c", 30.0, 100.0), ("d", 100.0, 120.0)).toDF("band", "lo", "hi")
    val binned = graft.ops.RangeJoin
      .pointInInterval(pts, "value", iv, "lo", "hi", 13.0)
      .select("pid", "band").as[(Long, String)].collect().toSet
    val naive = pts.join(iv, col("value") >= col("lo") && col("value") < col("hi"))
      .select("pid", "band").as[(Long, String)].collect().toSet
    assert(binned == naive)
    // half-open: value 10.0 is in band b (5..30), NOT band a (0..10)
    val at10 = pts.filter(col("value") === 10.0)
      .select("pid").as[Long].head()
    assert(naive.contains((at10, "b")) && !naive.contains((at10, "a")))
  }

  test("interleave: Morton bits land in the right positions; locality holds") {
    import org.apache.spark.sql.functions.{col, lit}
    // (a=0b101, b=0b011) -> z interleaves as b2a2 b1a1 b0a0 = 0b011011...
    // compute: a bits at even positions, b bits at odd:
    // a=5 (101): positions 0,4 -> 1+16=17; b=3 (011): positions 1,3 -> 2+8=10
    // z = 27
    val z = Seq((5L, 3L)).toDF("a", "b")
      .select(graft.ops.ZOrder.interleave(col("a"), col("b"), 3).as("z"))
      .as[Long].head()
    assert(z == 27L)
    // zero interleaved with zero is zero; max with max fills 2*bits
    val z0 = Seq((0L, 0L)).toDF("a", "b")
      .select(graft.ops.ZOrder.interleave(col("a"), col("b"), 4).as("z")).as[Long].head()
    val zm = Seq((15L, 15L)).toDF("a", "b")
      .select(graft.ops.ZOrder.interleave(col("a"), col("b"), 4).as("z")).as[Long].head()
    assert(z0 == 0L && zm == 255L)
  }

  test("z-ordered layout: every file is tight in BOTH dimensions vs a time-sorted write") {
    import org.apache.spark.sql.functions.{col, floor, unix_timestamp}
    val tmp = tempDir("graftz")
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        floor(unix_timestamp(col("ts")) / 3600).cast("long").as("h"))
    // control: sorted by hour only — each file spans ~the full user range
    ev.repartitionByRange(8, col("h")).sortWithinPartitions("h")
      .write.mode("overwrite").parquet(s"$tmp/by_time")
    graft.ops.ZOrder.writeZOrdered(ev, "user_id", "h", s"$tmp/zorder", 8)
    def meanRange(dir: String, c: String): Double = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath)
      val spans = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(org.apache.spark.sql.functions.min(col(c)),
            org.apache.spark.sql.functions.max(col(c)))
          .as[(Long, Long)].head()
        (r._2 - r._1).toDouble
      }
      spans.sum / spans.length
    }
    val naive = meanRange(s"$tmp/by_time", "user_id")
    val zed = meanRange(s"$tmp/zorder", "user_id")
    // the z-layout's user_id footer ranges must be substantially
    // tighter — that tightness IS the row-group pruning win
    assert(zed < naive * 0.7, s"z-order user_id range $zed !< 0.7 * $naive")
    // and the data itself round-trips exactly (layout-only change)
    val a = spark.read.parquet(s"$tmp/zorder").orderBy("event_id").collect()
    val b = ev.orderBy("event_id").collect()
    assert(a.sameElements(b))
  }

  test("partitionPruneAudit: stats match the source; Catalyst prunes the artifact's partitions") {
    import org.apache.spark.sql.functions.col
    val tmp = tempDir("graftprune")
    val orders = Tables.orders(spark, sf)
    val audit = graft.ops.Profile.partitionPruneAudit(
      orders, "o_orderdate", "1998-01-01", tmp).orderBy("ym").collect()
    // totals conserve: no row lost or duplicated by the partitioned rewrite
    assert(audit.map(_.getLong(1)).sum == orders.count())
    // every partition's min/max sit inside its own month
    audit.foreach { r =>
      val (ym, lo, hi) = (r.getLong(0), r.getLong(2), r.getLong(3))
      def ymOf(us: Long) = {
        val d = java.time.Instant.ofEpochSecond(us / 1000000L)
          .atZone(java.time.ZoneOffset.UTC)
        d.getYear * 100L + d.getMonthValue
      }
      assert(ymOf(lo) == ym && ymOf(hi) == ym, s"partition $ym spans [$lo,$hi]")
      assert(r.getBoolean(4) == (hi < 883612800000000L), s"pruned flag at $ym")
    }
    // THE point of the layout: a time-range reader prunes at the
    // listing level — the scan's partition filter kicks in and the
    // skipped months' files are never touched
    val back = spark.read.parquet(tmp)
    val fdf = back.filter(col("__ym") >= 199801)
    val scan = fdf.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*__ym".r.findFirstIn(scan).isDefined,
      s"partition filter not at the scan:\n$scan")
    // the layout really splits at the cutoff (so the filter above has
    // partitions to skip), and the pruned read returns exactly the
    // unpruned partitions' rows
    val dirs = new java.io.File(tmp).listFiles()
      .filter(_.getName.startsWith("__ym=")).map(_.getName.drop(5).toInt)
    assert(dirs.count(_ >= 199801) > 0 && dirs.count(_ < 199801) > 0,
      s"degenerate layout: ${dirs.sorted.mkString(",")}")
    assert(fdf.count() ==
      audit.filter(_.getLong(0) >= 199801L).map(_.getLong(1)).sum)
  }

  test("sourceVocabOverlap: exact counts on a planted fixture, sketch within tolerance, map-side sketch combine") {
    val d = Seq(
      (1L, "srcA", "w1 w2 w3 w4"),   // shingles {w1 w2 w3, w2 w3 w4}
      (2L, "srcB", "w2 w3 w4 w5"),   // shingles {w2 w3 w4, w3 w4 w5}
      (3L, "srcC", "x y z")          // shingle  {x y z}
    ).toDF("doc_id", "source", "text")
    val sh = graft.ext.TextOps.shingles(d, "source", "text", 3)
    val out = graft.ext.TextOps.sourceVocabOverlap(sh, "source")
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(out(("srcA", "srcB")) == ((1L, 3L, true)))
    assert(out(("srcA", "srcC")) == ((0L, 3L, true)))
    assert(out(("srcB", "srcC")) == ((0L, 3L, true)))
    assert(out.size == 3)
    // the sketch build must partially aggregate before its one shuffle
    // (per-source sketches merge map-side — the 100-TB shape)
    val plan = graft.ext.TextOps.sourceVocabOverlap(sh, "source")
      .queryExecution.executedPlan.toString
    assert(plan.contains("hll_sketch_agg"), "sketch aggregate missing from plan")
    assert(plan.toLowerCase.contains("partial_hll_sketch_agg") ||
      plan.contains("ObjectHashAggregate"),
      s"no map-side sketch combine:\n$plan")
  }

  test("sourceVocabRollup: partial-sketch union answers the source question on a planted fixture") {
    val d = Seq(
      (1L, "srcA", "en", "w1 w2 w3 w4"),  // srcA/en: {w1 w2 w3, w2 w3 w4}
      (2L, "srcA", "de", "w2 w3 w4 w5"),  // srcA/de: {w2 w3 w4, w3 w4 w5} — w2w3w4 shared across cells
      (3L, "srcB", "en", "x y z")         // srcB/en: {x y z}
    ).toDF("doc_id", "source", "lang", "text")
    val sh = graft.ext.TextOps.shinglesKeyed(d, Seq("source", "lang"), "text", 3)
    val out = graft.ext.TextOps.sourceVocabRollup(sh, "source", "lang")
      .as[(String, Long, Boolean, Boolean)].collect().sortBy(_._1)
    // srcA vocab = 3 (the shared shingle counted once across cells —
    // the union dedups, a sum of partials would say 4)
    assert(out.toSeq == Seq(("srcA", 3L, true, true), ("srcB", 1L, true, true)),
      s"got ${out.toSeq}")
  }

  test("urlDomains: hosts extracted and aggregated across docs") {
    val d = Seq(
      (1L, "intro https://a.example.com/x words http://b.example.org/y tail"),
      (2L, "see https://a.example.com/z only")
    ).toDF("doc_id", "text")
    val out = graft.ext.TextOps.urlDomains(d, "doc_id", "text")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("a.example.com") == ((2L, 2L)))
    assert(out("b.example.org") == ((1L, 1L)))
    assert(out.size == 2)
  }

  test("compactionPlan: hand-computed next-fit bins; oversize cells bin alone; totals bounded") {
    val cells = Seq(("a", 25000L), ("b", 12000L), ("c", 6000L),
      ("d", 5000L), ("e", 4000L), ("f", 3000L), ("g", 500L))
      .toDF("cell", "bytes")
    val out = graft.ops.Profile.compactionPlan(cells, Seq("cell"), "bytes", 10000L)
      .select("cell", "bytes", "bin", "oversize")
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // cumsum over (25000, 12000, 6000, 5000, 4000, 3000, 500):
    // starts at 0, 25000, 37000, 43000, 48000, 52000, 55000
    assert(out("a")._3 == 0L && out("a")._4)
    assert(out("b")._3 == 2L && out("b")._4)
    assert(out("c")._3 == 3L && !out("c")._4)
    assert(out("d")._3 == 4L && out("e")._3 == 4L) // 5000+4000 packed
    assert(out("f")._3 == 5L && out("g")._3 == 5L) // 3000+500 packed
    // an oversize cell always has its bin to itself (the next start
    // jumps more than one whole target past its own)
    val byBin = out.values.groupBy(_._3)
    out.values.filter(_._4).foreach(o => assert(byBin(o._3).size == 1))
    // every non-oversize bin total ≤ target + its first (largest) cell
    byBin.values.foreach { bs =>
      val tot = bs.map(_._2).sum
      assert(tot <= 10000L + bs.map(_._2).max, s"bin overfull: $bs")
    }
  }

  test("fkIntegrity: null keys are reported but not orphans; duplicate parents don't double-count") {
    import spark.implicits._
    val child = Seq(Some(1L), Some(1L), Some(9L), None, Some(2L))
      .toDF("ck")
    // duplicate parent key 1 must not multiply matched child rows
    val parent = Seq(1L, 1L, 2L, 3L).toDF("pk")
    val got = graft.ops.Profile.fkIntegrity(Seq(
        ("child->parent", child, "ck", parent, "pk")))
      .as[(String, Long, Long, Long, Boolean)].collect()
    assert(got.toSeq == Seq(("child->parent", 5L, 1L, 1L, false)),
      got.mkString(", "))
    val clean = graft.ops.Profile.fkIntegrity(Seq(
        ("c2", child.na.drop().filter($"ck" =!= 9L), "ck", parent, "pk")))
      .as[(String, Long, Long, Long, Boolean)].collect()
    assert(clean.head._4 == 0L && clean.head._5, clean.mkString(", "))
    intercept[IllegalArgumentException] {
      graft.ops.Profile.fkIntegrity(Seq.empty)
    }
  }
}
