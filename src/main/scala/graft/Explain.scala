package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan-capture utility for the optimization rounds: writes the
  * `.explain("formatted")` output of named registry queries to files.
  *
  * Usage: tools/run.sh graft.Explain <sfDir> <outDir> <name1,name2,...>
  * Each query's formatted physical plan goes to <outDir>/<name>.txt.
  * Analysis-only — nothing executes, no result is computed or cached.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    java.nio.file.Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = SparkEntry.queries
    names.foreach { n =>
      qs.get(n) match {
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
            java.nio.file.Files.write(outDir.resolve(s"$n.txt"), txt.getBytes("UTF-8"))
            println(s"[explain] wrote $n (${txt.length} chars)")
          } catch {
            case e: Throwable => println(s"[explain] FAILED $n: ${e.getMessage}")
          }
        case None => println(s"[explain] unknown query: $n")
      }
    }
    spark.stop()
  }
}
