package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document-corpus ingest/egress for training-data pipelines ([EXT] —
  * the reference ingests only CSV/XLS uploads; real corpora arrive as
  * JSONL and leave as partitioned parquet shards).
  *
  * Scale notes: JSONL scans parallelize per file split like any text
  * source; corrupt records are quarantined per row (PERMISSIVE), never
  * failing the scan — at 100 TB a single bad line must not kill the
  * job, and the quarantine count is an explicit output, not a silent
  * drop. The shard writer repartitions by (split, shard) so each
  * output file is one task's stream — no post-hoc file merge — and
  * sorts within partitions by id for deterministic, diff-able shards.
  */
object DocSources {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("_corrupt", StringType)))

  /** Read a JSONL corpus with per-row corrupt-record quarantine.
    * Returns (clean rows, corrupt raw lines). */
  def readJsonl(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    // one scan feeds both outputs; cached via the bounded LRU
    // (evict → unpersist), never a bare .cache()
    val raw = graft.queries.Memo.cached(spark, s"jsonl|$path")(
      spark.read.schema(docSchema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path))
    val clean = raw.filter(col("_corrupt").isNull && col("doc_id").isNotNull)
      .drop("_corrupt")
    val corrupt = raw.filter(col("_corrupt").isNotNull).select(col("_corrupt"))
    (clean, corrupt)
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
