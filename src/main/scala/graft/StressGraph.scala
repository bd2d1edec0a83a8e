package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Above-scale stress for the round-11 graph tier: the planted
  * link-graph shape at 10× and 100× the sf0.1 node count, proving the
  * Pregel iteration cost tracks nodes/edges linearly (the edge list
  * shuffles once into the Memo'd sidecar; each of the 10 rounds moves
  * only node-sized data). Results recorded in SCALE.md. */
object StressGraph {
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

    for (n <- Seq(5000L, 50000L, 500000L)) {
      val nodes = spark.range(n).select(col("id").as("node"))
      val edges = nodes
        .select(col("node").as("src"), explode(array(
          expr("node div 2"),
          (col("node") * 31L + 7L) % lit(n))).as("dst"))
      time(s"pagerank n=$n (10 iters, ${2 * n} edges)") {
        graft.ops.Graph.pageRank(nodes, edges, iters = 10)
          .agg(sum(col("rank_nano"))).collect()
      }
      val e1 = nodes.filter(col("node") % 16 =!= 0)
        .select(col("node").as("id"), expr("(node div 16) * 16").as("id2"))
      val e2 = nodes.filter(col("node") % 256 === 0 && col("node") >= 16)
        .select(col("node").as("id"), (col("node") - 16).as("id2"))
      time(s"components n=$n") {
        graft.ml.Components.minLabel(e1.unionByName(e2))
          .groupBy("label").count().count()
      }
      graft.queries.Memo.advance(); graft.queries.Memo.releaseStale(0)
    }
    spark.stop()
  }
}
