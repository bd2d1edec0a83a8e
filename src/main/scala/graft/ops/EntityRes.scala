package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked entity resolution (record linkage) — [EXT], beyond the
  * reference surface: the master-data op a training pipeline runs to
  * collapse near-identical catalog/author/source records before they
  * skew per-entity statistics.
  *
  * Shape (Fellegi–Sunter blocking, JASA 1969): candidate pairs are
  * generated ONLY within a blocking key — one equi-join shuffle on the
  * block columns, never a corpus theta join — then matched with a
  * bounded edit-distance predicate (Spark's 3-arg levenshtein
  * early-exits past the bound, so a non-match costs O(d·min(len))),
  * and closed transitively through the shared min-label CC engine
  * ([[graft.ml.Components]]: driver union-find under the edge gate,
  * pointer-jumped label propagation above it). Canonical entity id =
  * min member id, so labels are stable under partitioning.
  *
  * Scale: per-block pair work is quadratic in BLOCK size — the knob
  * the caller owns (add block columns until blocks bound); the closure
  * shuffles only the match-edge list (≈ |true duplicates|, tiny
  * relative to the corpus); the final assignment is one equi-join of
  * the input against the label table. */
object EntityRes {

  /** Returns the input's (id, block columns, name) plus `entity_id` —
    * every row assigned, singletons labeled by their own id. */
  def resolve(df: DataFrame, idCol: String, nameCol: String,
      blockCols: Seq[String], maxDist: Int): DataFrame = {
    require(blockCols.nonEmpty, "entity resolution without blocking is a theta join — pass at least one block column")
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val base = df.select(
      (Seq(col(idCol).cast("long").as("__id"), col(nameCol).as("__name")) ++
        blockCols.map(col)): _*)
    val a = base.select(
      (Seq(col("__id").as("__ida"), col("__name").as("__na")) ++
        blockCols.map(col)): _*)
    val b = base.select(
      (Seq(col("__id").as("__idb"), col("__name").as("__nb")) ++
        blockCols.map(c => col(c).as(s"__b_$c"))): _*)
    val joinCond = blockCols.map(c => col(c) === col(s"__b_$c"))
      .reduce(_ && _) && col("__ida") < col("__idb") &&
      levenshtein(col("__na"), col("__nb"), maxDist) >= 0
    val edges = a.join(b, joinCond).select(col("__ida"), col("__idb"))
    val labels = graft.ml.Components.minLabel(edges)
      .select(col("id").as("__id"), col("label").as("entity_id"))
    base.join(labels, Seq("__id"), "left")
      .withColumn("entity_id", coalesce(col("entity_id"), col("__id")))
      .withColumnRenamed("__id", idCol)
      .withColumnRenamed("__name", nameCol)
  }
}
