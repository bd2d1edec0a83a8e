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
    val executed = df.queryExecution.executedPlan.toString()
    "ShuffleExchange|Exchange hashpartitioning".r.findAllIn(executed).length
  }

  test("bucketed-by-key tables join with zero shuffles; unbucketed shuffle both sides") {
    val wh = Files.createTempDirectory("graft-bucketing").toFile
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
}
