package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway above-gate stress for the C1 (KMeans) and C3 (K-Shape)
  * local-kernel gates: generates synthetic inputs past the 100k gate,
  * proving the distributed paths engage and stay ~linear. Results are
  * recorded in SCALE.md; this main is not part of the shipped surface. */
object StressC1C3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      // NOTE: spark.driver.memory is a no-op on an in-process local
      // builder (the driver IS this JVM) — heap comes from the
      // launcher (tools/run.sh SPARK_DRIVER_MEM → -Xmx)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](tag: String)(f: => T): Unit = {
      // min of 2 (warm), matching the bench convention
      val t1 = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      val t2 = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"[stress] $tag: cold ${t1}%.2f s warm-min ${math.min(t1, t2)}%.2f s")
    }

    // C1: 4 deterministic 2-D blobs
    def emb(n: Long) = spark.range(n)
      .select(col("id").as("series_id"),
        (col("id") % 4 * 10 + sin(col("id") * 0.37) * 2).as("x"),
        (col("id") % 4 * 7 + cos(col("id") * 0.53) * 2).as("y"))
    for (n <- Seq(90000L, 150000L, 600000L))
      time(s"kmeans n=$n (${if (n < 100000) "driver" else "MLlib distributed"})") {
        graft.ml.Clustering.kmeans(emb(n), 4).groupBy("cluster").count().collect()
      }

    // C3: 3 phase-shifted sine classes, length-32 series
    def series(n: Long) = spark.range(n)
      .select(col("id").as("series_id"),
        expr("""transform(sequence(1, 32), t ->
          sin(CAST(t AS DOUBLE) * 0.4 + CAST(id % 3 AS DOUBLE) * 2.1)
          + CAST(pmod(hash(id, t), 100) AS DOUBLE) / 500.0)""").as("values"))
    for (n <- Seq(90000L, 100000L, 200000L))
      time(s"kshape n=$n (${if (n < 100000) "driver" else "distributed Gram"})") {
        graft.ml.KShape.fit(series(n), 3, maxIter = 3)
          .groupBy("cluster").count().collect()
      }
    spark.stop()
  }
}
