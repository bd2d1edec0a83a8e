package graft

import graft.sources.DocSources

/** JSONL/ORC corpus round-trips (sources/DocSources.scala): writer →
  * explicit-schema reader fidelity on hostile strings, and the driver
  * rows. (Quarantine accounting and gzip transparency are pinned in
  * MultimodalSourcesSpec's JSONL ingest tests.) */
class SourcesRoundTripSpec extends SparkSpec {
  import spark.implicits._

  private val hostile = Seq(
    (1L, "plain text", "en"),
    (2L, "with \"quotes\" and \\backslash\\", "en"),
    (3L, "newline\nand\ttab and emoji é中文", "zh"),
    (4L, null.asInstanceOf[String], "de"),
    (5L, "{\"looks\":\"like json\"}", "en"))

  test("jsonl round-trip preserves hostile strings and nulls exactly") {
    val df = hostile.toDF("doc_id", "text", "lang")
    val back = DocSources.jsonlRoundTrip(df)
      .orderBy("doc_id").as[(Long, String, String)].collect().toSeq
    assert(back == hostile)
  }

  test("orc round-trip preserves hostile strings and nulls exactly") {
    val df = hostile.toDF("doc_id", "text", "lang")
    val back = DocSources.orcRoundTrip(df)
      .orderBy("doc_id").as[(Long, String, String)].collect().toSeq
    assert(back == hostile)
  }

  test("driver rows: sf0.001 documents survive both round-trips bit-for-bit") {
    val docs = Tables.documents(spark, sf).orderBy("doc_id").collect().toSeq
    val viaJson = SparkEntry.queries("source_jsonl_roundtrip")(spark, sf)
      .collect().toSeq
    val viaOrc = SparkEntry.queries("source_orc_roundtrip")(spark, sf)
      .collect().toSeq
    assert(viaJson == docs)
    assert(viaOrc == docs)
  }
}
