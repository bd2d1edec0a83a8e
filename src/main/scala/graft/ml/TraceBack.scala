package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A4 + J1/J2 + C6/C7: centroid representatives, trace-back joins and
  * outlier extraction (reference: app.py:1003-1034, 976-988, 925-948).
  *
  * The reference's trace-back is a positional list-index join; here
  * every series carries `series_id` from creation, so trace-back is a
  * broadcast hash equi-join of the (small) embedding/assignment side
  * against the raw series table.
  */
object TraceBack {

  /** A4: per cluster, the centroid (member mean) and the member
    * nearest to it (argmin euclidean; ties → lowest series_id).
    * Noise (−1) is skipped like the reference. Input: (series_id, x,
    * y, cluster). Output: (cluster, rep_id, cx, cy). */
  def centroidRepresentatives(assigned: DataFrame): DataFrame = {
    val pts = assigned.filter(col("cluster") =!= -1)
    val cent = pts.groupBy("cluster")
      .agg(avg(col("x")).as("cx"), avg(col("y")).as("cy"))
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("dist").asc, col("series_id").asc)
    pts.join(broadcast(cent), "cluster")
      .withColumn("dist",
        sqrt(pow(col("x") - col("cx"), 2) + pow(col("y") - col("cy"), 2)))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("cluster"), col("series_id").as("rep_id"),
        col("cx"), col("cy"))
  }

  /** J2/C6: raw series of each cluster representative. */
  def representativeSeries(assigned: DataFrame, series: DataFrame): DataFrame =
    centroidRepresentatives(assigned)
      .join(series.withColumnRenamed("series_id", "rep_id"), "rep_id")

  /** C7/P4: raw series of DBSCAN noise points (cluster == −1). */
  def outlierSeries(assigned: DataFrame, series: DataFrame): DataFrame =
    assigned.filter(col("cluster") === -1)
      .select(col("series_id"))
      .join(series, "series_id")
}
