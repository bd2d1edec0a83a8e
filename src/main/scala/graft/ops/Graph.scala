package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics for corpus curation ([EXT]): PageRank
  * domain authority (Page, Brin, Motwani, Winograd 1999) over a link
  * graph — the classic "which sources does the web itself vouch for"
  * curation signal (inlink authority is a standard quality weight next
  * to classifier lift; e.g. Common-Crawl-derived corpora weight hosts
  * by harmonic centrality / rank percentile).
  *
  * Determinism contract (the repo's integer-exact discipline): ranks
  * live in NANO-UNITS (rq = round(rank·10⁹) as BIGINT) from
  * initialization onward; every per-iteration step is integer-only —
  * contribution = rq div outdeg (exact long division), damping =
  * (d_pct · Σ contrib) div 100, teleport base = ((100 − d_pct) ·
  * (10⁹ div N)) div 100 — so the incoming-edge sums are order-free
  * exact longs and EVERY iteration is bit-identical on any engine,
  * partitioning, or fold order. A DuckDB oracle replays the identical
  * ladder as `iters` unrolled CTEs (no float anywhere, no recursive
  * CTE version sensitivity). Rank mass leaks at dangling nodes and at
  * edges pointing outside the node set (documented: mass is NOT
  * renormalized — the standard simplification when ranks are consumed
  * as an ORDERING signal, which is what curation does with them).
  *
  * Scale: the Pregel shape — each iteration is one equi-join of the
  * rank frame onto the edge list plus one map-side-combined groupBy on
  * dst. The edge list is the big operand and it NEVER moves: iterating
  * joins shuffle the (node, rq) frame (one row per node) against the
  * edge partitioning, so a 100-TB edge list bucketed/partitioned by
  * src pays its shuffle once at ingest, and each of the `iters` rounds
  * moves only node-sized data. The loop materializes each iteration's
  * rank frame via localCheckpoint to keep the plan linear (10 chained
  * shuffles, not an exponentially re-derived lineage).
  */
object Graph {

  /** PageRank over `edges` (src, dst BIGINT) restricted to `nodes`
    * (node BIGINT): `iters` integer-exact damped iterations. Output:
    * (node, rank_nano BIGINT, n_in BIGINT) — rank in nano-units plus
    * the inlink count for the audit eye. `dampingPct` is the damping
    * factor in percent (85 = the classic 0.85). */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int,
      dampingPct: Int = 85, checkpoint: Boolean = true): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be 1..50, got $iters")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be 0..100, got $dampingPct")
    val nd = nodes.select(col("node").cast("long").as("node"))
    val nAgg = nd.agg(count(lit(1)).as("__n"))
    // outdeg over the node-restricted edge list: contributions divide
    // by the SAME degree the oracle computes
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .join(nd.select(col("node").as("src")), Seq("src"), "left_semi")
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("__deg"))
    // the edge-with-degree frame is consumed once PER ITERATION —
    // Memo-materialize it (the coded-ANN-table barrier pattern) so the
    // upstream scan + degree aggregation runs once, not `iters` times
    val e2 = graft.queries.Memo.cached(nodes.sparkSession, s"predge|" +
      s"${nodes.queryExecution.logical.semanticHash()}|" +
      s"${edges.queryExecution.logical.semanticHash()}")(
      e.join(outdeg, Seq("src"))
        .select(col("src"), col("dst"), col("__deg")))
    // ALL divisions are SQL `div` (exact integer division — Column./
    // on longs is DOUBLE division, which can round across an integer
    // boundary and diverge from DuckDB's `//`)
    var rank = nd.crossJoin(broadcast(nAgg))
      .select(col("node"), expr("1000000000L div __n").as("rq"), col("__n"))
    for (_ <- 1 to iters) {
      val contrib = rank.join(e2, rank("node") === e2("src"))
        .select(col("dst").as("node"), expr("rq div __deg").as("__c"))
        .groupBy("node").agg(sum(col("__c")).as("__s"))
      val next = rank.select(col("node"), col("__n"))
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          expr(s"(${100 - dampingPct}L * (1000000000L div __n)) div 100L"
            + s" + ($dampingPct" + "L * coalesce(__s, 0L)) div 100L").as("rq"),
          col("__n"))
      rank = if (checkpoint) next.localCheckpoint(false) else next
    }
    val nIn = e2.groupBy(col("dst").as("node")).agg(count(lit(1)).as("n_in"))
    rank.join(nIn, Seq("node"), "left")
      .select(col("node"), col("rq").as("rank_nano"),
        coalesce(col("n_in"), lit(0L)).as("n_in"))
  }

  /** The DuckDB replay of [[pageRank]] as `iters` UNROLLED CTE levels
    * (engine-version-robust: no recursive CTE, no float): callers
    * splice `nodesSql` (a CTE body yielding `node`) and `edgesSql`
    * (yielding `src, dst`) and consume the final `pr$iters(node, rq)`.
    * Integer ladder identical to the Spark loop. */
  def pageRankOracleSql(nodesSql: String, edgesSql: String, iters: Int,
      dampingPct: Int = 85): String = {
    // teleport base via a scalar subquery (no comma-join/LEFT JOIN
    // precedence trap); every division is DuckDB's integer `//`
    val base =
      s"((${100 - dampingPct} * (1000000000 // (SELECT n FROM nn))) // 100)"
    // CAST each level's rq to BIGINT: sum() is HUGEINT in DuckDB and
    // would otherwise propagate int128 into the output column — the
    // round-11 driver-hash divergence class
    val levels = (1 to iters).map { i =>
      s"""pr$i AS (SELECT nd.node,
         |    CAST($base + ($dampingPct * coalesce(s.s, 0)) // 100
         |      AS BIGINT) AS rq
         |  FROM nd LEFT JOIN (
         |    SELECT e.dst AS node, sum(p.rq // d.deg) AS s
         |    FROM pr${i - 1} p JOIN e ON e.src = p.node
         |    JOIN deg d ON d.src = e.src GROUP BY e.dst) s
         |    ON s.node = nd.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH nd AS ($nodesSql),
       |e0 AS ($edgesSql),
       |e AS (SELECT e0.src, e0.dst FROM e0 SEMI JOIN nd ON nd.node = e0.src),
       |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
       |nn AS (SELECT count(*) AS n FROM nd),
       |pr0 AS (SELECT nd.node, (1000000000 // (SELECT n FROM nn)) AS rq
       |        FROM nd),
       |$levels""".stripMargin
  }
}
