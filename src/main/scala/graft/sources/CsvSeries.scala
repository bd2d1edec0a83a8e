package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1/S2/S4 scans and K1-K3 sinks — the reference's ingest surface
  * (app.py:159-161, 1597-1650, 1835-1864).
  *
  * The reference reads path CSVs as euc-kr (app.py:159) and uploads as
  * utf-8 base64 (app.py:1616-1618); the value column is cast to float
  * on load (app.py:160). XLS upload is out of scope (no OSS Spark
  * reader in the offline env; SURVEY.md §2.1 S2).
  */
object CsvSeries {

  /** S1: CSV path scan, header + schema inference, configurable
    * encoding (reference default euc-kr), value column cast to float
    * then compute in double (SURVEY.md §7.5 #5). */
  def readCsv(spark: SparkSession, path: String, valueCol: String,
      encoding: String = "euc-kr"): DataFrame = {
    // Spark 4 rejects charsets outside its canonical list (euc-kr
    // included) unless legacy java charsets are allowed.
    spark.conf.set("spark.sql.legacy.javaCharsets", "true")
    spark.read
      .option("header", "true")
      .option("encoding", encoding)
      .option("inferSchema", "true")
      .csv(path)
      .withColumn(valueCol, col(valueCol).cast("float").cast("double"))
  }

  /** S2: base64-upload decode → CSV parse (the Dash upload body,
    * app.py:1597-1625). The payload is parsed as an in-memory dataset
    * of lines — same schema path as the file scan. */
  def readUploadBase64(spark: SparkSession, b64Body: String, valueCol: String): DataFrame = {
    import spark.implicits._
    val text = new String(java.util.Base64.getDecoder.decode(b64Body),
      java.nio.charset.StandardCharsets.UTF_8)
    val lines = spark.createDataset(text.split("\n").toSeq.filter(_.nonEmpty))
    spark.read.option("header", "true").option("inferSchema", "true")
      .csv(lines)
      .withColumn(valueCol, col(valueCol).cast("float").cast("double"))
  }

  /** S4: preview head (app.py:1634-1636). */
  def preview(df: DataFrame, n: Int = 5): DataFrame = df.limit(n)

  /** K1/K2: CSV sink with header (app.py:1835-1864). */
  def writeCsv(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(dir)

  /** K3: path-derived sink — write next to the source file
    * (app.py:915-920). */
  def writeBesideSource(df: DataFrame, sourcePath: String, name: String): Unit = {
    val parent = new java.io.File(sourcePath).getParent
    writeCsv(df, s"$parent/$name")
  }
}
