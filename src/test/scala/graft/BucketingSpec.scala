package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing — the 100-TB join strategy the plan
  * audit (COVERAGE.md) relies on: two tables bucketed on the join key
  * hash-join WITHOUT a shuffle on either side. Asserted structurally:
  * the executed plan of the bucketed join contains no ShuffleExchange
  * below the join, while the same join on plain parquet does. */
class BucketingSpec extends SparkSpec {

  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // force AQE to finalize the executed plan
    // AQE's toString prints the Final Plan AND the Initial Plan —
    // count only the final section or every Exchange doubles
    val executed = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==")(0)
    "ShuffleExchange|Exchange hashpartitioning".r.findAllIn(executed).length
  }

  test("bucketed-by-key tables join with zero shuffles; unbucketed shuffle both sides") {
    val wh = new java.io.File(tempDir("graft-bucketing"))
    wh.deleteOnExit()
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    // db LOCATION keeps the test out of the default warehouse dir
    // (spark.sql.warehouse.dir is static and can't be set per-session)
    s.sql(s"CREATE DATABASE IF NOT EXISTS bspec LOCATION '${wh.getAbsolutePath}/bspec'")

    val ev = Tables.events(s, sf).select("event_id", "user_id", "value")
    val stats = ev.groupBy("user_id").agg(count(lit(1)).as("n"))

    ev.write.format("parquet").bucketBy(4, "user_id").sortBy("user_id")
      .mode("overwrite").saveAsTable("bspec.ev_b")
    stats.write.format("parquet").bucketBy(4, "user_id")
      .mode("overwrite").saveAsTable("bspec.st_b")

    val bucketed = s.table("bspec.ev_b").join(s.table("bspec.st_b"), "user_id")
    val plain = ev.join(stats, "user_id")

    assert(shuffleCount(bucketed) == 0,
      "bucketed join must be co-located (no Exchange)")
    assert(shuffleCount(plain) > 0,
      "control: the unbucketed join should shuffle")
    // same rows either way
    assert(bucketed.count() == plain.count())
    s.sql("DROP DATABASE bspec CASCADE")
  }

  test("persist-and-probe dedup: corpus side never reshuffles; results equal the direct form") {
    import graft.ext.Dedup
    val wh = new java.io.File(tempDir("graft-probe-spec"))
    wh.deleteOnExit()
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    s.sql(s"CREATE DATABASE IF NOT EXISTS pspec LOCATION '${wh.getAbsolutePath}/pspec'")
    import s.implicits._

    // 12 corpus docs (0-11, 10/11 duplicate 0/1) + 6 batch docs (100-105,
    // 100 duplicates corpus doc 0, 104/105 duplicate each other)
    def words(seed: Int) = (0 until 12).map(i => s"w${seed}x$i").mkString(" ")
    val corpus = ((0 until 10).map(i => (i.toLong, words(i)))
      ++ Seq((10L, words(0)), (11L, words(1)))).toDF("doc_id", "text")
    val batch = Seq((100L, words(0)), (101L, words(50)), (102L, words(51)),
      (103L, words(52)), (104L, words(60)), (105L, words(60))).toDF("doc_id", "text")

    Dedup.persistBandedSignatures(corpus, "doc_id", "text", 3, 8, "pspec.bands", 4)
    val bandedC = s.table("pspec.bands")

    // structural pin: the candidate equi-join reshuffles ONLY the
    // unbucketed batch side — the persisted corpus reads co-partitioned.
    // Both inputs are materialized to parquet first so the ONLY
    // Exchanges in these plans are the join's own (the signature
    // aggregation shuffles would otherwise pollute the count).
    Dedup.minhashBandedFlat(
      graft.ext.TextOps.shingles(batch, "doc_id", "text", 3), "doc_id", 8)
      .write.mode("overwrite").parquet(s"${wh.getAbsolutePath}/bands_b")
    Dedup.minhashBandedFlat(
      graft.ext.TextOps.shingles(corpus, "doc_id", "text", 3), "doc_id", 8)
      .write.mode("overwrite").parquet(s"${wh.getAbsolutePath}/bands_c_plain")
    val bandedB = s.read.parquet(s"${wh.getAbsolutePath}/bands_b")
    val probeJoin = bandedC.as("a").join(bandedB.as("b"),
      $"a.band" === $"b.band" && $"a.key" === $"b.key")
    assert(shuffleCount(probeJoin) == 1,
      "probe join must shuffle only the batch side")
    val plainJoin = s.read.parquet(s"${wh.getAbsolutePath}/bands_c_plain")
      .as("a").join(bandedB.as("b"), $"a.band" === $"b.band" && $"a.key" === $"b.key")
    assert(shuffleCount(plainJoin) == 2,
      "control: the unpersisted join shuffles both sides")

    // semantic pin: probing the persisted table decides exactly like
    // the direct incremental form
    val viaTable = Dedup.incrementalDedupFrom(bandedC, corpus, batch,
      "doc_id", "text", 3, 8, 0.5)
      .as[(Long, Option[Long], Boolean)].collect().sortBy(_._1)
    val direct = Dedup.incrementalDedup(corpus, batch,
      "doc_id", "text", 3, 8, 0.5)
      .as[(Long, Option[Long], Boolean)].collect().sortBy(_._1)
    assert(viaTable.toSeq == direct.toSeq)
    // and the decisions themselves are the planted ones
    val keep = viaTable.map(r => r._1 -> r._3).toMap
    assert(keep == Map(100L -> false, 101L -> true, 102L -> true,
      103L -> true, 104L -> true, 105L -> false), s"got ${viaTable.toSeq}")
    assert(viaTable.find(_._1 == 100L).get._2.contains(0L))
    assert(viaTable.find(_._1 == 105L).get._2.contains(104L))
    s.sql("DROP DATABASE pspec CASCADE")
  }

  test("streaming sem-dedup/IVF state is centroid-bucketed: probes never reshuffle the state side") {
    import graft.streaming.EventStreams
    import graft.ml.Ivf
    val wh = new java.io.File(tempDir("graft-semstate"))
    wh.deleteOnExit()
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    s.sql(s"CREATE DATABASE IF NOT EXISTS sbspec LOCATION '${wh.getAbsolutePath}/sbspec'")
    import s.implicits._

    def vec(id: Long): Seq[Double] = {
      val r = math.toRadians((id * 7 % 360).toDouble)
      Seq(math.cos(r), math.sin(r))
    }
    val rows = (0L until 60L).map(id => (id, vec(id)))
    val centers = Ivf.fittedCenters(
      rows.toDF("vec_id", "embedding"), "vec_id", "embedding", 4)
    val slices = rows.grouped(20).toSeq
    slices.zipWithIndex.foreach { case (sl, i) =>
      EventStreams.semDedupEpoch(sl.toDF("vec_id", "embedding"), i.toLong,
        "vec_id", "embedding", centers, 0.9999, "sbspec.sem_state", 4)
      EventStreams.ivfEpoch(sl.toDF("vec_id", "embedding"), i.toLong,
        "vec_id", "embedding", centers, "sbspec.ivf_state", 4)
    }
    // structural pin — the epoch's prior-state probe shape: micro-batch
    // joined to the ACCUMULATED state on centroid_id. The state table is
    // bucketed on that key, so only the batch side may shuffle.
    val batch = Ivf.assignWith(slices.last.toDF("vec_id", "embedding"),
      "vec_id", "embedding", centers).localCheckpoint()
    def probeOf(state: org.apache.spark.sql.DataFrame) = batch.join(
      state.filter(col("batch_id") < 2)
        .select(col("vec_id").as("__pid"), col("vn").as("__pvn"),
          col("centroid_id")),
      Seq("centroid_id"))
    assert(shuffleCount(probeOf(s.table("sbspec.sem_state"))) == 1,
      "sem-dedup probe must shuffle only the micro-batch side")
    assert(shuffleCount(probeOf(s.table("sbspec.ivf_state"))) == 1,
      "IVF cell probe must shuffle only the query side")
    // control: the same state read BY PATH loses the bucket metadata
    // and the join reshuffles the whole accumulated state
    val semLoc = s.sql("DESCRIBE TABLE EXTENDED sbspec.sem_state")
      .filter($"col_name" === "Location").select("data_type").as[String].head()
    assert(shuffleCount(probeOf(s.read.parquet(semLoc))) == 2,
      "control: a path read of the state should shuffle both sides")
    // cell pruning: an IVF probe over the state must READ only the
    // probed cells — the isin pushdown becomes bucket pruning
    // (SelectedBucketsCount below total on the index-side scan)
    val probedTopK = EventStreams.ivfTopKFromState(s, "sbspec.ivf_state",
      "vec_id", centers, "vec_id < 1", 3, 1)
    probedTopK.collect()
    val scanCounts = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findAllMatchIn(probedTopK.queryExecution.executedPlan.toString)
      .map(m => (m.group(1).toInt, m.group(2).toInt)).toSeq
    assert(scanCounts.exists { case (sel, tot) => sel < tot },
      s"IVF probe must bucket-prune to the probed cells, scans=$scanCounts")
    // epoch replay stayed idempotent under insertInto (dynamic overwrite)
    val n0 = s.table("sbspec.sem_state").count()
    EventStreams.semDedupEpoch(slices.last.toDF("vec_id", "embedding"),
      (slices.size - 1).toLong, "vec_id", "embedding", centers, 0.9999,
      "sbspec.sem_state", 4)
    assert(s.table("sbspec.sem_state").count() == n0)
    // maintenance compaction: fold epochs ≤ 1 into one partition —
    // rows identical, partition count drops, the zero-Exchange probe
    // pin STILL holds (bucketing survives the staging-table swap)
    val before = s.table("sbspec.sem_state")
      .orderBy("vec_id").collect().map(r =>
        (r.getAs[Long]("vec_id"), r.getAs[Boolean]("keep"))).toSeq
    EventStreams.compactEpochState(s, "sbspec.sem_state", 1L, 4)
    val after = s.table("sbspec.sem_state")
      .orderBy("vec_id").collect().map(r =>
        (r.getAs[Long]("vec_id"), r.getAs[Boolean]("keep"))).toSeq
    assert(after == before, "compaction must not change state rows")
    val parts = s.table("sbspec.sem_state")
      .select("batch_id").distinct().as[Long].collect().sorted.toSeq
    assert(parts == Seq(1L, 2L), s"epochs 0-1 must fold into 1, got $parts")
    assert(shuffleCount(probeOf(s.table("sbspec.sem_state"))) == 1,
      "probe must stay shuffle-free on the state side after compaction")
    s.sql("DROP DATABASE sbspec CASCADE")
  }
}
