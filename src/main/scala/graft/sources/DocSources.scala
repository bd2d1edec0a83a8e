package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document-corpus ingest/egress for training-data pipelines ([EXT] —
  * the reference ingests only CSV/XLS uploads; real corpora arrive as
  * JSONL and leave as partitioned parquet shards).
  *
  * Scale notes: JSONL scans parallelize per file split like any text
  * source; quarantine is per row — at 100 TB a single bad line must
  * not kill the job — and `clean` + `quarantined` together account for
  * every non-blank input line (nothing is silently dropped: lines that
  * parse but lack the required id are quarantined too, not vanished).
  * Parsing is a plain `from_json` projection over a text scan, so both
  * outputs replan safely with no dependence on cache state. The shard
  * writer repartitions by (split, shard) so each output file is one
  * task's stream — no post-hoc file merge — and sorts within
  * partitions by id for deterministic, diff-able shards.
  */
object DocSources {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType)))

  /** Read a JSONL corpus. Returns (clean rows, quarantined raw lines).
    * A line is clean iff it parses AND carries a doc_id; every other
    * non-blank line lands in the quarantine with its raw text. */
  def readJsonl(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val parsed = spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(col("value"),
        from_json(col("value"), docSchema).as("j"))
    val ok = col("j").isNotNull && col("j.doc_id").isNotNull
    val clean = parsed.filter(ok).select(col("j.*"))
    val quarantined = parsed.filter(!ok).select(col("value").as("raw_line"))
    (clean, quarantined)
  }

  /** Write deterministic training shards: `shardsPerSplit` parquet
    * files per split value, rows hash-assigned to shards by id (stable
    * across runs) and sorted by id within each shard. */
  def writeTrainingShards(df: DataFrame, idCol: String, splitCol: String,
      outDir: String, shardsPerSplit: Int): Unit = {
    df.withColumn("__shard",
        pmod(hash(col(idCol)), lit(shardsPerSplit)))
      .repartition(col(splitCol), col("__shard"))
      .sortWithinPartitions(col(idCol))
      .drop("__shard")
      .write.mode("overwrite").partitionBy(splitCol).parquet(outDir)
  }
}
