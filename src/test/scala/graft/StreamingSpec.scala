package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Ev

/** Structured Streaming semantics: the windowed streaming aggregates
  * must equal their batch `window()` counterparts over the same data
  * (batch = oracle), and custom keyed state accumulates per user. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  private val rows = Seq(
    Ev(1L, ts(0), 1.0), Ev(1L, ts(1), 2.0), Ev(2L, ts(2), 3.0),
    Ev(1L, ts(16), 4.0), Ev(2L, ts(17), 5.0), Ev(2L, ts(33), 6.0))

  test("streaming tumbling window equals the batch window() aggregate") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Ev]
    val events = mem.toDF().withColumn("event_type", lit("e"))
    val q = EventStreams.tumblingCounts(events, "10 minutes", "15 minutes")
      .writeStream.format("memory").queryName("tumb").outputMode("complete").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    val got = spark.table("tumb").select("wstart", "n", "sum_v")
      .as[(Timestamp, Long, Double)].collect().sortBy(_._1.getTime)
    q.stop()
    val batch = rows.toDF().withColumn("event_type", lit("e"))
      .groupBy(window(col("ts"), "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"))
      .select(col("w.start"), col("n"), col("sum_v"))
      .as[(Timestamp, Long, Double)].collect().sortBy(_._1.getTime)
    assert(got.toSeq == batch.toSeq)
  }

  test("session windows split on the gap") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.sessionCounts(mem.toDF(), "10 minutes", "10 minutes")
      .writeStream.format("memory").queryName("sess").outputMode("complete").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    val got = spark.table("sess")
      .select("user_id", "n").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    q.stop()
    // user 1: events at 0,1 then 16 → sessions (2, 1); user 2: 2, 17, 33 → (1,1,1)
    assert(got(1L) == Seq(1L, 2L))
    assert(got(2L) == Seq(1L, 1L, 1L))
  }

  test("stream-stream interval join equals the batch join over the same data") {
    implicit val sql = spark.sqlContext
    val evs = Seq(
      (1L, 1L, ts(0), "click"), (2L, 1L, ts(10), "purchase"), // in bound (10m ≤ 30m)
      (3L, 1L, ts(45), "purchase"),                           // out of bound for click 1
      (4L, 2L, ts(5), "click"), (5L, 2L, ts(4), "purchase"),  // purchase BEFORE click: excluded
      (6L, 3L, ts(7), "click"))                               // user with no purchase
    val mem = MemoryStream[(Long, Long, Timestamp, String)]
    val stream = mem.toDF().toDF("event_id", "user_id", "ts", "event_type")
    val q = EventStreams.clickPurchaseIntervalJoin(stream, "10 minutes", 1800)
      .writeStream.format("memory").queryName("ij").outputMode("append").start()
    mem.addData(evs: _*)
    q.processAllAvailable()
    val got = spark.table("ij").as[(Long, Long, Long, Long)].collect().toSet
    q.stop()
    val batch = EventStreams.clickPurchaseIntervalJoin(
      evs.toDF().toDF("event_id", "user_id", "ts", "event_type"), "10 minutes", 1800)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == batch)
    assert(got == Set((1L, 2L, 1L, 600L)))
  }

  test("streaming dedup drops duplicate keys within the watermark, equals batch distinct") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Ev]
    val dup = rows ++ rows.take(4) // re-send the first four events
    val q = EventStreams.dedupEvents(mem.toDF(), "1 hour", "user_id", "ts")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    mem.addData(dup: _*)
    q.processAllAvailable()
    val got = spark.table("dedup").select("user_id", "ts", "value")
      .as[(Long, Timestamp, Double)].collect().sortBy(r => (r._1, r._2.getTime))
    q.stop()
    val batch = rows.toDF().dropDuplicates("user_id", "ts")
      .as[Ev].collect().map(e => (e.user_id, e.ts, e.value))
      .sortBy(r => (r._1, r._2.getTime))
    assert(got.toSeq == batch.toSeq)
  }

  test("stream-static enrichment join equals the batch join; unmatched keys survive") {
    implicit val sql = spark.sqlContext
    val dim = Seq((1L, "gold")).toDF("user_id", "segment") // user 2 unmatched
    val mem = MemoryStream[Ev]
    val q = EventStreams.enrichWithDim(mem.toDF(), dim, "user_id")
      .select("user_id", "ts", "value", "segment")
      .writeStream.format("memory").queryName("enrich").outputMode("append").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    val got = spark.table("enrich")
      .as[(Long, Timestamp, Double, Option[String])].collect()
      .sortBy(r => (r._1, r._2.getTime))
    q.stop()
    val batch = rows.toDF().join(dim, Seq("user_id"), "left")
      .select("user_id", "ts", "value", "segment")
      .as[(Long, Timestamp, Double, Option[String])].collect()
      .sortBy(r => (r._1, r._2.getTime))
    assert(got.toSeq == batch.toSeq)
    assert(got.exists(_._4.isEmpty) && got.exists(_._4.contains("gold")))
  }

  test("watermark drops late data in append mode once the window is finalized") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Ev]
    val events = mem.toDF().withColumn("event_type", lit("e"))
    val q = EventStreams.tumblingCounts(events, "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("late").outputMode("append").start()
    // window [0,10) gets 2 events; the watermark then advances past
    // 10:00 + 5min via a much later event, finalizing the window
    mem.addData(Ev(1L, ts(1), 1.0), Ev(1L, ts(2), 2.0))
    q.processAllAvailable()
    mem.addData(Ev(1L, ts(40), 3.0))
    q.processAllAvailable()
    // a LATE arrival into the finalized [0,10) window must be dropped
    mem.addData(Ev(2L, ts(3), 100.0))
    q.processAllAvailable()
    mem.addData(Ev(1L, ts(55), 4.0)) // advance watermark past [40,50)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("late").select("wstart", "n", "sum_v")
      .as[(Timestamp, Long, Double)].collect().sortBy(_._1.getTime).toSeq
    // [0,10) emitted with ONLY the on-time events; the late 100.0 never lands
    assert(got.exists(r => r._2 == 2L && r._3 == 3.0),
      s"finalized window wrong or missing: $got")
    assert(!got.exists(_._3 >= 100.0), s"late event leaked into results: $got")
  }

  test("foreachBatch incremental dedup: decisions see intra-batch and all earlier batches") {
    implicit val sql = spark.sqlContext
    val tmp = tempDir("graft_sdedup")
    val (corpusDir, decisionsDir) = (s"$tmp/corpus", s"$tmp/decisions")
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = EventStreams.incrementalDedupSink(docs, "doc_id", "text",
      corpusDir, decisionsDir).start()
    // batch 0: 1 kept, 2 dups 1 intra-batch, 3 fresh
    mem.addData((1L, "alpha beta gamma"), (2L, "alpha  BETA gamma"), (3L, "delta"))
    q.processAllAvailable()
    // batch 1: 10 dups batch-0's doc 1 (cross-batch), 11 fresh,
    // 12 dups 11 intra-batch
    mem.addData((10L, "ALPHA beta gamma"), (11L, "epsilon"), (12L, "epsilon"))
    q.processAllAvailable()
    q.stop()
    val dec = spark.read.parquet(decisionsDir)
      .select(col("doc_id"), col("batch_id").cast("long"), col("keep"), col("reason"))
      .as[(Long, Long, Boolean, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(dec(1L)._3 && dec(1L)._4 == "new")
    assert(!dec(2L)._3 && dec(2L)._4 == "intra_batch_dup")
    assert(dec(3L)._3)
    assert(!dec(10L)._3 && dec(10L)._4 == "corpus_dup") // dup across batches
    assert(dec(11L)._3 && dec(11L)._4 == "new")
    assert(!dec(12L)._3 && dec(12L)._4 == "intra_batch_dup")
    // the corpus holds exactly the kept docs
    val corpus = spark.read.parquet(corpusDir).select("doc_id")
      .as[Long].collect().sorted
    assert(corpus.sameElements(Seq(1L, 3L, 11L)))
  }

  test("foreachBatch url dedup: canonical variants collapse within and across batches") {
    implicit val sql = spark.sqlContext
    val tmp = tempDir("graft_surl")
    val (corpusDir, decisionsDir) = (s"$tmp/corpus", s"$tmp/decisions")
    val mem = MemoryStream[(Long, String)]
    val urls = mem.toDF().toDF("doc_id", "url")
    val q = EventStreams.incrementalUrlDedupSink(urls, "doc_id", "url",
      corpusDir, decisionsDir).start()
    // batch 0: 2 is a syntactic variant of 1 (case + port + tracking
    // param + trailing slash); 3 is a different page
    mem.addData((1L, "https://a.com/x?utm_source=s"),
      (2L, "HTTPS://A.COM:443/x/"), (3L, "https://a.com/y"))
    q.processAllAvailable()
    // batch 1: 10 refetches page x under yet another variant; 11 fresh
    mem.addData((10L, "https://a.com/x#frag"), (11L, "https://b.com/z"))
    q.processAllAvailable()
    q.stop()
    val dec = spark.read.parquet(decisionsDir)
      .select(col("doc_id"), col("keep"), col("reason"))
      .as[(Long, Boolean, String)].collect().map(r => r._1 -> r).toMap
    assert(dec(1L)._2 && dec(1L)._3 == "new")
    assert(!dec(2L)._2 && dec(2L)._3 == "intra_batch_dup")
    assert(dec(3L)._2)
    assert(!dec(10L)._2 && dec(10L)._3 == "corpus_dup")
    assert(dec(11L)._2 && dec(11L)._3 == "new")
    assert(spark.read.parquet(corpusDir).select("doc_id")
      .as[Long].collect().sorted.sameElements(Seq(1L, 3L, 11L)))
  }

  test("dedup epochs survive an empty first batch (no schema-less corpus dir)") {
    // an empty micro-batch writes a corpus dir with no partitions; the
    // next epoch must treat that as bootstrap, not attempt a parquet
    // read that fails schema inference and kills the stream forever
    val tmp = tempDir("graft_sempty")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "url")
    EventStreams.urlDedupEpoch(empty, 0L, "doc_id", "url",
      s"$tmp/uc", s"$tmp/ud")
    val b1 = Seq((1L, "https://a.com/x")).toDF("doc_id", "url")
    EventStreams.urlDedupEpoch(b1, 1L, "doc_id", "url", s"$tmp/uc", s"$tmp/ud")
    assert(spark.read.parquet(s"$tmp/uc").select("doc_id").as[Long].collect()
      .sameElements(Seq(1L)))
    val emptyT = Seq.empty[(Long, String)].toDF("doc_id", "text")
    EventStreams.dedupEpoch(emptyT, 0L, "doc_id", "text", s"$tmp/tc", s"$tmp/td")
    val t1 = Seq((1L, "alpha")).toDF("doc_id", "text")
    EventStreams.dedupEpoch(t1, 1L, "doc_id", "text", s"$tmp/tc", s"$tmp/td")
    assert(spark.read.parquet(s"$tmp/tc").select("doc_id").as[Long].collect()
      .sameElements(Seq(1L)))
  }

  test("url dedup epoch replay is idempotent") {
    val tmp = tempDir("graft_surl_replay")
    val (corpusDir, decisionsDir) = (s"$tmp/corpus", s"$tmp/decisions")
    val b0 = Seq((1L, "https://a.com/x"), (2L, "https://a.com/y")).toDF("doc_id", "url")
    val b1 = Seq((10L, "HTTPS://a.com:443/x/"), (11L, "https://c.com/w")).toDF("doc_id", "url")
    EventStreams.urlDedupEpoch(b0, 0L, "doc_id", "url", corpusDir, decisionsDir)
    EventStreams.urlDedupEpoch(b1, 1L, "doc_id", "url", corpusDir, decisionsDir)
    def snapshot() = (
      spark.read.parquet(decisionsDir)
        .select(col("doc_id"), col("batch_id").cast("long"), col("keep"), col("reason"))
        .as[(Long, Long, Boolean, String)].collect().sortBy(_._1).toSeq,
      spark.read.parquet(corpusDir).select("doc_id").as[Long].collect().sorted.toSeq)
    val before = snapshot()
    EventStreams.urlDedupEpoch(b1, 1L, "doc_id", "url", corpusDir, decisionsDir)
    assert(snapshot() == before, "replay mutated state")
    val byId = before._1.map(r => r._1 -> r).toMap
    assert(!byId(10L)._3 && byId(10L)._4 == "corpus_dup")
    assert(byId(11L)._3 && before._2 == Seq(1L, 2L, 11L))
  }

  test("foreachBatch dedup sink resumes from a checkpoint without reprocessing") {
    implicit val sql = spark.sqlContext
    val tmp = tempDir("graft_sdedup_ckpt")
    val (corpusDir, decisionsDir, ckpt) =
      (s"$tmp/corpus", s"$tmp/decisions", s"$tmp/ckpt")
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    def start() = EventStreams.incrementalDedupSink(docs, "doc_id", "text",
      corpusDir, decisionsDir).option("checkpointLocation", ckpt).start()
    val q1 = start()
    mem.addData((1L, "alpha content"))
    q1.processAllAvailable(); q1.stop()
    // new data arrives while the query is DOWN; the restart must pick
    // up only the unprocessed offsets — batch 0 is not re-delivered
    mem.addData((2L, "alpha content"), (3L, "fresh content"))
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    val dec = spark.read.parquet(decisionsDir)
      .select(col("doc_id"), col("batch_id").cast("long"), col("keep"), col("reason"))
      .as[(Long, Long, Boolean, String)].collect()
    assert(dec.length == 3, s"expected 3 decisions, got ${dec.toSeq}") // doc 1 decided exactly once
    val byId = dec.map(r => r._1 -> r).toMap
    assert(byId(1L)._3)
    assert(!byId(2L)._3 && byId(2L)._4 == "corpus_dup") // dups the pre-restart corpus
    assert(byId(3L)._3)
    val corpus = spark.read.parquet(corpusDir).select("doc_id")
      .as[Long].collect().sorted
    assert(corpus.sameElements(Seq(1L, 3L)))
  }

  test("dedup epoch replay is idempotent: re-running a batch changes nothing") {
    // foreachBatch is at-least-once: a failure after the decisions (or
    // corpus) write committed but before the CHECKPOINT commit replays
    // the whole epoch. The epoch body must therefore be idempotent —
    // the replay must not append duplicate/contradictory decision rows
    // (doc first 'new', then 'corpus_dup' because its own partial
    // corpus append became visible).
    val tmp = tempDir("graft_sdedup_replay")
    val (corpusDir, decisionsDir) = (s"$tmp/corpus", s"$tmp/decisions")
    val b0 = Seq((1L, "alpha beta"), (2L, "fresh text")).toDF("doc_id", "text")
    val b1 = Seq((10L, "ALPHA  beta"), (11L, "novel words")).toDF("doc_id", "text")
    EventStreams.dedupEpoch(b0, 0L, "doc_id", "text", corpusDir, decisionsDir)
    EventStreams.dedupEpoch(b1, 1L, "doc_id", "text", corpusDir, decisionsDir)
    def snapshot() = (
      spark.read.parquet(decisionsDir)
        .select(col("doc_id"), col("batch_id").cast("long"), col("keep"), col("reason"))
        .as[(Long, Long, Boolean, String)].collect().sortBy(_._1).toSeq,
      spark.read.parquet(corpusDir).select("doc_id").as[Long].collect().sorted.toSeq)
    val before = snapshot()
    // worst-case replay: batch 1 runs AGAIN after its own writes landed
    EventStreams.dedupEpoch(b1, 1L, "doc_id", "text", corpusDir, decisionsDir)
    val after = snapshot()
    assert(after == before, s"replay mutated state:\n  before=$before\n  after=$after")
    // and the decisions themselves are right: 10 dups batch-0's doc 1
    val byId = before._1.map(r => r._1 -> r).toMap
    assert(byId(10L)._4 == "corpus_dup" && !byId(10L)._3)
    assert(byId(11L)._4 == "new" && byId(11L)._3)
    assert(before._2 == Seq(1L, 2L, 11L))
  }

  test("mapGroupsWithState accumulates running user totals across batches") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.runningUserTotals(mem.toDS())
      .writeStream.format("memory").queryName("run").outputMode("update").start()
    mem.addData(rows.take(3): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(3): _*)
    q.processAllAvailable()
    val last = spark.table("run").groupBy("user_id")
      .agg(max("events").as("events"), max("sum_v").as("sum_v"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    q.stop()
    assert(last(1L) == ((3L, 7.0)))
    assert(last(2L) == ((3L, 14.0)))
  }

  test("cdcLastWriter: streaming state == batch last-writer aggregate, ties and tombstones included") {
    import graft.streaming.EventStreams.CdcEv
    implicit val sql = spark.sqlContext
    def t(s: Long): java.sql.Timestamp = new java.sql.Timestamp(s * 1000L)
    // user 1: upsert then later upsert (split across batches) → last wins
    // user 2: last change is a tombstone → key absent after filter
    // user 3: ts TIE at 50 — higher event_id wins regardless of arrival order
    // user 4: tombstone then later upsert → key resurrected
    val b1 = Seq(
      CdcEv(1L, t(10), 1L, "view", Some(2.0)),
      CdcEv(2L, t(10), 2L, "purchase", Some(9.0)),
      CdcEv(3L, t(50), 31L, "click", Some(1.0)),
      CdcEv(4L, t(10), 4L, "error", None))
    val b2 = Seq(
      CdcEv(1L, t(20), 5L, "purchase", Some(3.5)),
      CdcEv(2L, t(30), 6L, "error", None),
      CdcEv(3L, t(50), 30L, "view", Some(8.0)),
      CdcEv(4L, t(40), 7L, "signup", Some(4.0)))
    val mem = MemoryStream[CdcEv]
    val q = EventStreams.cdcLastWriter(mem.toDS())
      .writeStream.format("memory").queryName("cdc").outputMode("update").start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    // final state = the max-n_changes row per key (update mode emits each step)
    val fin = spark.table("cdc").groupBy("user_id")
      .agg(org.apache.spark.sql.functions.max_by(
        org.apache.spark.sql.functions.struct("last_ts_us", "last_event_id",
          "last_type", "value", "n_changes"),
        org.apache.spark.sql.functions.col("n_changes")).as("r"))
      .select("user_id", "r.*")
      .as[(Long, Long, Long, String, Option[Double], Long)].collect()
      .map(r => r._1 -> r).toMap
    q.stop()
    // batch truth: the evt_cdc_apply aggregate over the union of batches
    import org.apache.spark.sql.functions._
    val batch = (b1 ++ b2).toDS().groupBy("user_id")
      .agg(max_by(struct(col("ts"), col("event_id"), col("event_type"),
        col("value")), struct(col("ts"), col("event_id"))).as("lw"),
        count(lit(1)).as("n"))
      .select(col("user_id"), unix_micros(col("lw.ts")).as("us"),
        col("lw.event_id"), col("lw.event_type"), col("lw.value"), col("n"))
      .as[(Long, Long, Long, String, Option[Double], Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(fin == batch, s"streaming != batch:\n  s=$fin\n  b=$batch")
    // consumer-side tombstone filter leaves exactly users 1, 3, 4
    val live = fin.values.filter(_._4 != "error").map(_._1).toSet
    assert(live == Set(1L, 3L, 4L), live.toString)
    assert(fin(3L)._3 == 31L, s"tie broken wrong: ${fin(3L)}")
    assert(fin(1L)._5.contains(3.5) && fin(1L)._6 == 2L)
  }

  test("attributionAtConversion: summed streaming credits == the batch U-shaped report") {
    import graft.streaming.EventStreams.CdcEv
    implicit val sql = spark.sqlContext
    def t(s: Long): java.sql.Timestamp = new java.sql.Timestamp(s * 1000L)
    // mirrors AttributionSpec: user 1 = 4 touches split ACROSS batches
    // then purchase 100; user 2 = single view + purchase 50; user 3 =
    // bare purchase 25 (unattributed); user 4 = crosses the
    // maxTouches=4 cap BEFORE its purchase 77 (mega row)
    val b1 = Seq(
      CdcEv(1L, t(10), 101L, "view", None),
      CdcEv(1L, t(20), 102L, "click", None),
      CdcEv(2L, t(10), 201L, "view", None),
      CdcEv(4L, t(1), 401L, "view", None),
      CdcEv(4L, t(2), 402L, "view", None))
    val b2 = Seq(
      CdcEv(1L, t(30), 103L, "signup", None),
      CdcEv(1L, t(40), 104L, "click", None),
      CdcEv(1L, t(50), 105L, "purchase", Some(100.0)),
      CdcEv(2L, t(20), 202L, "purchase", Some(50.0)),
      CdcEv(3L, t(20), 301L, "purchase", Some(25.0)),
      CdcEv(4L, t(3), 403L, "view", None),
      CdcEv(4L, t(4), 404L, "view", None),
      CdcEv(4L, t(5), 406L, "view", None),
      CdcEv(4L, t(6), 405L, "purchase", Some(77.0)))
    val mem = MemoryStream[CdcEv]
    val q = EventStreams.attributionAtConversion(mem.toDS(),
        Set("view", "click", "signup"), "purchase", maxTouches = 4)
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    import org.apache.spark.sql.functions._
    val streamed = spark.table("attrib").groupBy("channel")
      .agg(count(lit(1)).as("n_credits"),
        (sum(col("credit_u6")).cast("double") / lit(1e6)).as("rev_u_shaped"),
        (sum(col("credit_l6")).cast("double") / lit(1e6)).as("rev_last_touch"))
      .orderBy("channel")
      .as[(String, Long, Double, Double)].collect().toSeq
    q.stop()
    val batch = graft.ops.Attribution.uShaped(
        (b1 ++ b2).toDF("user_id", "ts", "event_id", "event_type", "value")
          .select(col("user_id"), col("event_type"), col("ts"),
            col("event_id"), col("value")),
        "user_id", "event_type", "ts", "event_id", "value",
        Seq("view", "click", "signup"), "purchase", maxTouches = 4)
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(streamed == batch, s"streaming != batch:\n  s=$streamed\n  b=$batch")
  }

  test("streaming refresh pipeline: ordered epochs equal the one-shot batch; replay idempotent") {
    implicit val sql = spark.sqlContext
    import graft.ext.TextOps
    val tmp = tempDir("graft_srefresh")
    val (urlDir, outDir) = (s"$tmp/urls", s"$tmp/out")

    // old corpus + new snapshot, same closed-form family as the batch
    // pipeline_refresh fixture: drop %13, edit %17, clone %31 as new ids
    def mkText(id: Long): String =
      if (id % 19 == 0) s"alpha beta gamma delta epsilon zeta $id"
      else s"the of a alpha beta $id"
    def mkUrl(id: Long): String = {
      val base = s"www.site${id % 20}.com/page${id % 20}"
      (id % 3) match {
        case 0 => s"https://$base?utm_source=feed"
        case 1 => s"HTTPS://${base.toUpperCase}#frag"
        case _ => s"https://$base/"
      }
    }
    val old = (0L until 600L).map(id => (id, mkText(id))).toDF("doc_id", "text")
    val newSnap: Seq[(Long, String, String)] =
      (0L until 600L).filter(_ % 13 != 0).map { id =>
        val t = if (id % 17 == 0) mkText(id) + " v2" else mkText(id)
        (id, t, mkUrl(id))
      } ++ (0L until 600L).filter(_ % 31 == 0).map { id =>
        (id + 1000L, "new doc " + mkText(id), mkUrl(id + 1000L))
      }
    val oldFp = TextOps.fingerprint(old, "doc_id", "text")
    val cutoff = 0.3 // the pre-calibrated standing-corpus bar
    val binTokens = 8L

    // one-shot batch reference: same operators, whole delta at once
    val snapDf = newSnap.toDF("doc_id", "text", "url")
    val delta = snapDf.join(oldFp.withColumnRenamed("fp", "__ofp"),
        Seq("doc_id"), "left")
      .join(TextOps.fingerprint(snapDf, "doc_id", "text"), "doc_id")
      .filter(col("__ofp").isNull || col("__ofp") =!= col("fp"))
      .select("doc_id", "text", "url")
    val urlKept = delta.join(
      TextOps.urlDedup(delta.select(col("doc_id"), col("url")),
        "doc_id", "url").filter(col("keep")).select("doc_id"), "doc_id")
    val gated = urlKept.join(
      TextOps.quality(urlKept.select(col("doc_id"), col("text")), "doc_id", "text")
        .filter(col("stopword_ratio") >= cutoff).select("doc_id"), "doc_id")
    val withTok = gated.select(col("doc_id"),
        ceil(length(col("text")) / 4.0).cast("long").as("n_tokens"))
      .join(TextOps.splitAssign(gated, "doc_id").select("doc_id", "bucket"), "doc_id")
    val batchBins = TextOps.packedBoundaries(withTok, "doc_id", "n_tokens",
        "bucket", binTokens)
      .select("bucket", "bin", "n_docs", "bin_tokens", "doc_offsets")
      .as[(Int, Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    // the gate and the url dedup must actually bite or the test is vacuous
    assert(delta.count() > gated.count(), "quality gate dropped nothing")
    assert(delta.count() > urlKept.count(), "url dedup dropped nothing")

    // streaming: three id-ORDERED epochs of the same snapshot
    val mem = MemoryStream[(Long, String, String)]
    val docs = mem.toDF().toDF("doc_id", "text", "url")
    val q = EventStreams.incrementalRefreshSink(docs, "doc_id", "text", "url",
      oldFp, cutoff, binTokens, urlDir, outDir).start()
    val ordered = newSnap.sortBy(_._1)
    val slices = ordered.grouped((ordered.size + 2) / 3).toSeq
    slices.foreach { s => mem.addData(s); q.processAllAvailable() }
    q.stop()

    // accumulated per-doc boundary rows, re-aggregated with the exact
    // packedBoundaries output shape
    def streamBins() = spark.read.parquet(outDir)
      .groupBy(col("bucket"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("bin_tokens"),
        array_join(transform(
          sort_array(collect_list(struct(col("off"), col("doc_id").as("__id")))),
          x => concat(x("__id").cast("string"), lit("@"), x("off").cast("string"))),
          ";").as("doc_offsets"))
      .select("bucket", "bin", "n_docs", "bin_tokens", "doc_offsets")
      .as[(Int, Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(streamBins() == batchBins,
      "N-epoch streaming output != one-shot batch output")
    // offsets really CONTINUED across epochs: some bucket spans batches
    val spanning = spark.read.parquet(outDir)
      .groupBy("bucket").agg(countDistinct(col("batch_id")).as("nb"))
      .filter(col("nb") > 1).count()
    assert(spanning > 0, "no bucket spans epochs — continuation untested")

    // at-least-once replay: re-running the LAST epoch must change nothing
    def snapshotState() = (
      spark.read.parquet(outDir).collect().map(_.toString).sorted.toSeq,
      spark.read.parquet(urlDir).collect().map(_.toString).sorted.toSeq)
    val before = snapshotState()
    EventStreams.refreshEpoch(slices.last.toDF("doc_id", "text", "url"),
      (slices.size - 1).toLong, "doc_id", "text", "url",
      oldFp, cutoff, binTokens, urlDir, outDir)
    assert(snapshotState() == before, "epoch replay mutated state")
  }

  test("streaming DSIR epochs: N-epoch selection equals batch dsir select; replay idempotent") {
    implicit val sql = spark.sqlContext
    import graft.ext.TextOps
    val stateDir =
      tempDir("graft_sdsir") + "/state"
    // closed-form corpus: target docs (id % 3 == 0) lean on one token
    // family, the rest on another — weights separate the classes
    def mkText(id: Long): String =
      if (id % 3 == 0) s"alpha beta alpha gamma beta alpha $id"
      else s"delta epsilon zeta delta epsilon $id"
    val corpus = (0L until 300L).map(id => (id, mkText(id)))
    val corpusDf = corpus.toDF("doc_id", "text")
    val targetPred = col("doc_id") % 3 === 0

    // batch reference: the text_dsir_select shape over the full corpus
    import org.apache.spark.sql.expressions.Window
    val batchTop = TextOps.dsirWeights(corpusDf, "doc_id", "text", targetPred)
      .orderBy(col("log_w").desc, col("doc_id")).limit(50)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("log_w").desc, col("doc_id"))).cast("long"))
      .select(col("rk"), col("doc_id"), col("is_target"), col("log_w"))
      .as[(Long, Long, Boolean, Double)].collect().toSeq

    // the ratio table is fit ONCE on the same snapshots the batch saw,
    // then broadcast-stable across all epochs
    val ratio = TextOps.dsirRatioTable(corpusDf, "doc_id", "text", targetPred)
    val mem = MemoryStream[(Long, String)]
    val q = EventStreams.incrementalDsirSink(mem.toDF().toDF("doc_id", "text"),
      "doc_id", "text", targetPred, ratio, 64, stateDir).start()
    val slices = corpus.grouped(100).toSeq
    slices.foreach { s => mem.addData(s); q.processAllAvailable() }
    q.stop()

    def selected() = EventStreams.dsirSelectFromState(spark, stateDir, "doc_id", 50)
      .as[(Long, Long, Boolean, Double)].collect().toSeq
    assert(selected() == batchTop,
      "N-epoch DSIR selection != batch dsir select on the same snapshots")
    // the selection really spans epochs (not all winners in one slice)
    val winners = batchTop.map(_._2).toSet
    assert(slices.count(_.exists(d => winners(d._1))) > 1,
      "top-k fell inside one epoch — cross-epoch selection untested")

    // at-least-once replay: re-scoring the last epoch changes nothing
    val before = selected()
    EventStreams.dsirEpoch(slices.last.toDF("doc_id", "text"),
      (slices.size - 1).toLong, "doc_id", "text", targetPred,
      ratio.localCheckpoint(), 64, stateDir)
    assert(selected() == before, "DSIR epoch replay mutated the selection")
  }

  test("streaming contamination epochs: accumulated state equals the one-shot batch audit") {
    implicit val sql = spark.sqlContext
    import graft.ext.Similarity
    val stateDir =
      tempDir("graft_scontam") + "/state"
    // planted geometry: unit vectors at closed-form angles; eval at 0°
    // and 90°, train fanned between — some contaminated at tau, some not
    def unit(deg: Int): Seq[Double] = {
      val r = math.toRadians(deg)
      Seq(math.cos(r), math.sin(r), 0.0, 0.0)
    }
    val ev = Seq((100L, unit(0)), (200L, unit(90))).toDF("vec_id", "embedding")
    val train = (0 until 90).map(i => (i.toLong, unit(i * 2)))
    val trainDf = train.toDF("vec_id", "embedding")
    val batchRef = Similarity.evalContamination(trainDf, ev, "vec_id", "embedding", 0.9)
      .orderBy("vec_id").collect().toSeq

    val mem = MemoryStream[(Long, Seq[Double])]
    val q = EventStreams.incrementalContaminationSink(
      mem.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      ev, 0.9, stateDir).start()
    val slices = train.grouped(30).toSeq
    slices.foreach { s => mem.addData(s); q.processAllAvailable() }
    q.stop()

    def accumulated() = spark.read.parquet(stateDir)
      .select("vec_id", "nearest_eval", "max_cos", "contaminated")
      .orderBy("vec_id").collect().toSeq
    assert(accumulated() == batchRef,
      "N-epoch contamination state != one-shot batch audit")
    // both verdicts must actually occur or the test is vacuous
    assert(batchRef.exists(_.getBoolean(3)) && batchRef.exists(!_.getBoolean(3)))

    // at-least-once replay: re-scoring the last epoch changes nothing
    val before = accumulated()
    EventStreams.contaminationEpoch(slices.last.toDF("vec_id", "embedding"),
      (slices.size - 1).toLong, "vec_id", "embedding",
      ev.localCheckpoint(), 0.9, stateDir)
    assert(accumulated() == before, "contamination epoch replay mutated state")
  }

  test("streaming embedding-audit gate: planted defects quarantined per epoch; replay idempotent") {
    implicit val sql = spark.sqlContext
    val base = tempDir("graft_saudit")
    val acceptDir = base + "/accept"; val qDir = base + "/quar"
    val docs = (1L to 10L).toDF("doc_id")
    val dim = 3
    // one defect of each class plus precedence overlaps: 98 is orphan
    // AND short AND zero (orphan wins); 5 is wrong-dim AND zero (dim wins)
    val rows = Seq(
      (1L, Seq(1.0, 0.0, 0.0)), // clean
      (2L, Seq(0.0, 0.0, 0.0)), // zero_norm
      (3L, Seq(1.0, 2.0)), // dim_mismatch
      (99L, Seq(1.0, 1.0, 1.0)), // orphan_vector
      (4L, Seq(0.5, 0.5, 0.5)), // clean (epoch 1)
      (98L, Seq(0.0, 0.0)), // orphan + short + zero → orphan
      (5L, Seq(0.0, 0.0, 0.0, 0.0))) // wrong dim + zero → dim
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = EventStreams.embeddingAuditSink(
      mem.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      docs, "doc_id", dim, acceptDir, qDir).start()
    val slices = rows.grouped(4).toSeq
    slices.foreach { s => mem.addData(s); q.processAllAvailable() }
    q.stop()

    def accepted() = spark.read.parquet(acceptDir)
      .select("vec_id").as[Long].collect().toSet
    def quarantined() = spark.read.parquet(qDir)
      .select(col("vec_id"), col("issue"), col("batch_id").cast("long"))
      .as[(Long, String, Long)].collect().toSet
    assert(accepted() == Set(1L, 4L))
    assert(quarantined() == Set(
      (2L, "zero_norm", 0L), (3L, "dim_mismatch", 0L),
      (99L, "orphan_vector", 0L),
      (98L, "orphan_vector", 1L), (5L, "dim_mismatch", 1L)))

    // the corpus-level audit over the ACCEPTED table finds no per-row
    // issue (the gate held the door); missing_embedding — the check the
    // gate deliberately defers — reports the 8 docs whose vectors never
    // arrived
    val audit = graft.ext.Similarity.embeddingIntegrity(docs,
        spark.read.parquet(acceptDir), "doc_id", "vec_id", "embedding")
      .as[(String, Long, Option[Long])].collect()
      .map(r => r._1 -> r._2).toMap
    assert(audit == Map("dim_mismatch" -> 0L, "orphan_vector" -> 0L,
      "zero_norm" -> 0L, "missing_embedding" -> 8L))

    // at-least-once replay: re-running epoch 1 changes nothing
    val before = (accepted(), quarantined())
    EventStreams.embeddingAuditEpoch(slices(1).toDF("vec_id", "embedding"),
      1L, "vec_id", "embedding",
      docs.select(col("doc_id").cast("long").as("__did")).localCheckpoint(),
      dim, acceptDir, qDir)
    assert((accepted(), quarantined()) == before,
      "audit epoch replay mutated state")
  }

  test("streaming IVF ingest: probe over accumulated state equals the batch probe") {
    implicit val sql = spark.sqlContext
    import graft.ml.Ivf
    val wh = tempDir("graft_sivf")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS sivf LOCATION '$wh/sivf'")
    val stateTable = "sivf.state"
    val emb = Tables.embeddings(spark, sf)
    // the frozen offline artifact: coarse quantizer fit ONCE on the
    // standing corpus — the stream never re-fits
    val centers = Ivf.fittedCenters(emb, "vec_id", "embedding", 8)

    // batch reference: assignment + probe with the SAME centers
    val batchRef = graft.ml.Ivf.probeAndRank(
        graft.ml.Ivf.assignWith(emb, "vec_id", "embedding", centers),
        centers, "vec_id", "vec_id < 10", 5, 4)
      .orderBy("q_id", "rank").collect().toSeq

    val rows = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toSeq.sortBy(_._1)
      .map { case (id, v) => (id, v.toSeq) }
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = EventStreams.incrementalIvfSink(
      mem.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      centers, stateTable).start()
    val slices = rows.grouped((rows.size + 2) / 3).toSeq
    slices.foreach { s => mem.addData(s); q.processAllAvailable() }
    q.stop()

    def probed() = EventStreams.ivfTopKFromState(spark, stateTable, "vec_id",
        centers, "vec_id < 10", 5, 4)
      .orderBy("q_id", "rank").collect().toSeq
    assert(probed() == batchRef,
      "probe over N-epoch ingested index != batch probe with the same centers")
    assert(batchRef.nonEmpty)
    // the model's own assignment and the map-side frozen-center
    // assignment agree (same argmin, same centers)
    // replay: re-ingesting the last epoch changes nothing
    val before = probed()
    EventStreams.ivfEpoch(slices.last.toDF("vec_id", "embedding"),
      (slices.size - 1).toLong, "vec_id", "embedding", centers, stateTable)
    assert(probed() == before, "IVF ingest epoch replay mutated the index")
    spark.sql("DROP DATABASE sivf CASCADE")
  }

  test("streamed filtered ANN: metadata sidecar at ingest, filtered probe == batch, pre-filter semantics") {
    implicit val sql = spark.sqlContext
    import graft.ml.Ivf
    val wh = tempDir("graft_sfivf")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS sfivf LOCATION '$wh/sfivf'")
    val stateTable = "sfivf.state"
    val emb = Tables.embeddings(spark, sf)
    val centers = Ivf.fittedCenters(emb, "vec_id", "embedding", 8)

    // batch reference: same assignment + the same filtered probe tail
    val batchRef = Ivf.probeAndRank(
        Ivf.assignWith(emb, "vec_id", "embedding", centers)
          .join(emb.select("vec_id", "label"), Seq("vec_id")),
        centers, "vec_id", "vec_id < 10", 5, 4, corpusPred = "label = 0")
      .orderBy("q_id", "rank").collect().toSeq

    val rows = emb.select("vec_id", "embedding", "label")
      .as[(Long, Array[Float], Int)].collect().toSeq.sortBy(_._1)
      .map { case (id, v, l) => (id, v.toSeq, l) }
    val mem = MemoryStream[(Long, Seq[Float], Int)]
    val q = EventStreams.incrementalIvfSink(
      mem.toDF().toDF("vec_id", "embedding", "label"), "vec_id", "embedding",
      centers, stateTable, metaCols = Seq("label")).start()
    rows.grouped((rows.size + 2) / 3).foreach { s =>
      mem.addData(s); q.processAllAvailable()
    }
    q.stop()

    val served = EventStreams.ivfFilteredTopKFromState(spark, stateTable,
        "vec_id", centers, "vec_id < 10", "label = 0", 5, 4)
      .orderBy("q_id", "rank").collect().toSeq
    assert(served == batchRef,
      "filtered probe over streamed state != batch filtered probe")
    assert(served.nonEmpty)
    // pre-filter semantics: every surfaced neighbor satisfies the
    // predicate; queries that do NOT satisfy it still surface rows
    val labels = emb.select("vec_id", "label").as[(Long, Int)].collect().toMap
    assert(served.forall(r => labels(r.getLong(2)) == 0))
    assert(served.map(_.getLong(0)).distinct.exists(q0 => labels(q0) != 0),
      "fixture lost its unfiltered-query case")
    spark.sql("DROP DATABASE sfivf CASCADE")
  }

  test("streaming semantic dedup: min-id keeps equal the batch twin; replay idempotent") {
    implicit val sql = spark.sqlContext
    import graft.ml.Ivf
    import org.apache.spark.sql.functions.call_function
    val wh = tempDir("graft_ssem")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS ssem LOCATION '$wh/ssem'")
    val stateTable = "ssem.state"
    // closed-form: unit vectors at angle (id·7)%360; every id%10==9 is
    // planted AT an earlier id's angle — 39 back when possible (crosses
    // at least one 20-wide epoch: the cross-epoch decision under test),
    // 9 back otherwise (intra-epoch dups)
    def dupBase(id: Long): Long =
      if (id % 10 != 9) id else if (id >= 39) id - 39 else id - 9
    def vec(id: Long): Seq[Double] = {
      val r = math.toRadians((dupBase(id) * 7 % 360).toDouble)
      Seq(math.cos(r), math.sin(r))
    }
    val rows = (0L until 60L).map(id => (id, vec(id)))
    val full = rows.toDF("vec_id", "embedding")
    val centers = Ivf.fittedCenters(full, "vec_id", "embedding", 4)
    val eps = 0.9999

    // batch twin: keep(b) = no co-clustered eps-neighbor with smaller id
    val asgAll = Ivf.assignWith(full, "vec_id", "embedding", centers)
    val dupAll = asgAll.as("a").join(asgAll.as("b"),
        col("a.centroid_id") === col("b.centroid_id") &&
          col("a.vec_id") < col("b.vec_id") &&
          call_function("array_dot", col("a.vn"), col("b.vn")) >= eps)
      .select(col("b.vec_id").as("vec_id")).distinct()
    val twin = asgAll.join(dupAll.withColumn("__d", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("__d").isNull.as("keep"))
      .orderBy("vec_id").as[(Long, Boolean)].collect().toSeq
    assert(twin.exists(!_._2) && twin.exists(_._2), "twin must drop AND keep")

    val mem = MemoryStream[(Long, Seq[Double])]
    val q = EventStreams.incrementalSemDedupSink(
      mem.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      centers, eps, stateTable).start()
    val slices = rows.grouped(20).toSeq
    slices.foreach { s => mem.addData(s); q.processAllAvailable() }
    q.stop()

    def kept() = spark.table(stateTable)
      .select("vec_id", "keep").orderBy("vec_id")
      .as[(Long, Boolean)].collect().toSeq
    assert(kept() == twin, "N-epoch semantic-dedup state != batch min-id twin")
    // the cross-epoch path actually fired: some doc was dropped against
    // a PRIOR epoch's state (its dup partner sits in an earlier slice)
    val bySlice = slices.map(_.map(_._1).toSet)
    val crossDropped = twin.filter(!_._2).map(_._1).exists { b =>
      val si = bySlice.indexWhere(_.contains(b))
      si > 0 && bySlice.take(si).exists(_.contains(dupBase(b)))
    }
    assert(crossDropped, "no cross-epoch drop occurred — the prior-state join is untested")

    // replay: re-running the last epoch changes nothing
    val before = kept()
    EventStreams.semDedupEpoch(slices.last.toDF("vec_id", "embedding"),
      (slices.size - 1).toLong, "vec_id", "embedding", centers, eps, stateTable)
    assert(kept() == before, "semantic-dedup epoch replay mutated state")
    spark.sql("DROP DATABASE ssem CASCADE")
  }

  test("streaming JSONL ingest: epochs equal the batch read; quarantine audited per epoch; replay idempotent") {
    implicit val sql = spark.sqlContext
    val tmp = tempDir("graft_singest")
    val (cleanDir, qDir) = (s"$tmp/clean", s"$tmp/quarantine")
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val b0 = Seq(
      """{"doc_id": 1, "text": "first shard"}""",
      """broken {line""",
      """{"doc_id": 2, "text": "ok"}""")
    val b1 = Seq(
      """{"text": "parses but has no id"}""",
      "",
      """{"doc_id": 3, "text": "second shard"}""")

    val mem = MemoryStream[String]
    val q = EventStreams.jsonlIngestSink(mem.toDF(), schema, "doc_id",
      cleanDir, qDir).start()
    mem.addData(b0); q.processAllAvailable()
    mem.addData(b1); q.processAllAvailable()
    q.stop()

    // epochs == the one-shot batch read over the union of all lines
    val all = java.nio.file.Paths.get(tempDir("graft_singest_all"))
    java.nio.file.Files.write(all.resolve("all.jsonl"),
      (b0 ++ b1).mkString("\n").getBytes("UTF-8"))
    val (bClean, bQuar) = graft.sources.DocSources.readJsonlAs(
      spark, all.toString, schema, "doc_id")
    def cleanRows() = spark.read.parquet(cleanDir)
      .select("doc_id", "text").orderBy("doc_id")
      .as[(Long, String)].collect().toSeq
    assert(cleanRows() == bClean.orderBy("doc_id")
      .as[(Long, String)].collect().toSeq)
    // quarantine: each bad line attributed to the epoch it arrived in
    val quar = spark.read.parquet(qDir)
      .select(col("raw_line"), col("batch_id").cast("long"))
      .as[(String, Long)].collect().toSet
    assert(quar == Set(("broken {line", 0L),
      ("""{"text": "parses but has no id"}""", 1L)))
    assert(quar.map(_._1) == bQuar.as[String].collect().toSet)

    // replay: re-running epoch 1 rewrites its partitions byte-identically
    val before = (cleanRows(), quar)
    EventStreams.jsonlIngestEpoch(b1.toDF("value"), 1L, schema, "doc_id",
      cleanDir, qDir)
    val after = (cleanRows(), spark.read.parquet(qDir)
      .select(col("raw_line"), col("batch_id").cast("long"))
      .as[(String, Long)].collect().toSet)
    assert(after == before, "ingest epoch replay mutated state")
  }

  test("streaming HLL rollup: epoch partials union to the corpus answer; probe never shuffles; replay idempotent") {
    implicit val sql = spark.sqlContext
    val wh = tempDir("graft_shll")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS shll LOCATION '$wh/shll'")
    val stateTable = "shll.state"
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "lang", "text")
    val rows = docs.as[(Long, String, String, String)].collect()
      .toSeq.sortBy(_._1)

    val mem = MemoryStream[(Long, String, String, String)]
    val q = EventStreams.incrementalHllRollupSink(
      mem.toDF().toDF("doc_id", "source", "lang", "text"),
      "source", "lang", "text", stateTable).start()
    val slices = rows.grouped((rows.size + 2) / 3).toSeq
    slices.foreach { s => mem.addData(s); q.processAllAvailable() }
    q.stop()

    // the accumulated partials answer the per-source distinct question
    // within sketch tolerance of the EXACT count over the full corpus
    // (same contract the batch twin profile_hll_rollup pins)
    def probed() = EventStreams.hllRollupFromState(spark, stateTable, "source")
      .as[(String, Double)].collect().toMap
    val exact = graft.ext.TextOps.shingles(docs, "source", "text", 3)
      .distinct().groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val est = probed()
    assert(est.keySet == exact.keySet)
    for ((s, n) <- exact)
      assert(math.abs(est(s) - n) <= math.max(5.0, 0.03 * n),
        s"source $s: est ${est(s)} vs exact $n")
    // state holds sketch bytes per (epoch, cell), never corpus rows
    val stateRows = spark.table(stateTable).count()
    assert(stateRows <= slices.size.toLong * est.size * 8,
      s"state has $stateRows rows — is the corpus leaking into it?")
    // the probe reads the bucketed state co-partitioned: zero Exchange
    val plan = EventStreams.hllRollupFromState(spark, stateTable, "source")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"rollup probe shuffles the state:\n$plan")
    // replay: re-running the last epoch rewrites its partition with
    // identical sketch bytes — estimates bitwise unchanged
    EventStreams.hllRollupEpoch(
      slices.last.toDF("doc_id", "source", "lang", "text"),
      (slices.size - 1).toLong, "source", "lang", "text", stateTable)
    assert(probed() == est, "rollup epoch replay changed the estimates")
    spark.sql("DROP DATABASE shll CASCADE")
  }
}
