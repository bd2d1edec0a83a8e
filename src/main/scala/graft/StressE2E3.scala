package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Above-gate stress for the round-12 embedding slots: E3 (driver conv
  * fit+embed → broadcast-weights distributed conv projection past the
  * 2·10⁴ gate) and E2 (UMAP-lite → landmark path past its gate).
  * Proves the gates flip, the scale paths engage, and cost stays sane
  * as n grows. Results recorded in SCALE.md; not part of the shipped
  * surface. */
object StressE2E3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](tag: String)(f: => T): Unit = {
      val t1 = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      val t2 = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"[stress] $tag: cold ${t1}%.2f s warm-min ${math.min(t1, t2)}%.2f s")
    }

    // 3 latent classes, length-64 series with deterministic noise
    def series(n: Long) = spark.range(n)
      .select(col("id").as("series_id"),
        expr("""transform(sequence(1, 64), t ->
          sin(CAST(t AS DOUBLE) * (0.2 + CAST(id % 3 AS DOUBLE) * 0.17))
          + CAST(pmod(hash(id, t), 100) AS DOUBLE) / 400.0)""").as("values"))

    // E3: below the gate the seeded conv AE trains and embeds on the
    // driver (bounded 256-image fit regardless of n); above it the
    // SAME conv latents continue — broadcast weights + map-side forward
    for (n <- Seq(15000L, 19999L, 50000L, 200000L))
      time(s"aeEmbed n=$n (${if (n < 20000) "driver conv fit+embed" else "distributed conv projection"})") {
        graft.ml.Embedding.aeEmbed(series(n), "gaf", 8)
          .agg(sum(abs(col("x"))), sum(abs(col("y")))).collect()
      }

    // E2: below the gate the exact O(n²) kNN fit; above it the
    // landmark path (1024-sample fit + broadcast softmax placement)
    for (n <- Seq(3000L, 4999L, 50000L, 200000L))
      time(s"umap2d n=$n (${if (n < 5000) "exact driver fit" else "landmark path"})") {
        graft.ml.Umap.umap2d(series(n))
          .agg(sum(abs(col("x"))), sum(abs(col("y")))).collect()
      }
    spark.stop()
  }
}
