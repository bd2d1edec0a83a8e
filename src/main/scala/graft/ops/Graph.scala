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
  * live in PER-NODE NANO-UNITS — every node initializes to 10⁹, i.e.
  * rq = round(rank·N·10⁹), so the unit never divides by the corpus
  * size and the signal cannot erode at web-scale node counts (a
  * round-11 review caught the earlier 10⁹ div N unit collapsing to
  * all-zero ranks past N ≈ 10⁹ and degrading well before). Every
  * per-iteration step is integer-only: contribution = rq div outdeg
  * (exact long division), teleport base = ((100−d_pct)·10⁹) div 100
  * (a constant), and damping uses the EXACT decomposition
  * (s div 100)·d + ((s mod 100)·d) div 100 == (d·s) div 100, which
  * never forms the d·s product — so the incoming-edge sums are
  * order-free exact longs with headroom to Σ rank mass ≈ N·10⁹
  * (int64-safe to N ≈ 9·10⁸ nodes; past that, shrink the unit) and
  * EVERY iteration is bit-identical on any engine, partitioning, or
  * fold order. A DuckDB oracle replays the identical ladder as
  * `iters` unrolled CTEs (no recursive CTE, no float, every level
  * CAST to BIGINT). Rank mass leaks at dangling nodes and at edges
  * pointing outside the node set (documented: mass is NOT
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

  /** Per-(session, node-plan) cache of the int64-safety gate count —
    * bounded by distinct pageRank call sites per session. */
  private val nodeCountCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]

  /** PageRank over `edges` (src, dst BIGINT) restricted to `nodes`
    * (node BIGINT): `iters` integer-exact damped iterations. Output:
    * (node, rank_nano BIGINT, n_in BIGINT) — rank in per-node
    * nano-units (mean-ish 10⁹; exact mean only on leak-free graphs)
    * plus the inlink count for the audit eye. `dampingPct` is the
    * damping factor in percent (85 = the classic 0.85). */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int,
      dampingPct: Int = 85, checkpoint: Boolean = true): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be 1..50, got $iters")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be 0..100, got $dampingPct")
    val nd = nodes.select(col("node").cast("long").as("node"))
    // Enforce the scaladoc's int64-safety bound (ADVICE r11): past
    // ~9e8 nodes the nano-unit contribution sums can wrap 2^63 under
    // Spark's non-ANSI long sum() while the DuckDB oracle sums in
    // HUGEINT — the engines would diverge SILENTLY. Fail loudly at
    // the contract edge instead. r17: the gate count is cached per
    // (session, node-plan) — deterministic sources make it a constant,
    // and re-counting cost one full scan job on every invocation.
    val ndKey = s"${System.identityHashCode(nodes.sparkSession)}|" +
      s"${nodes.queryExecution.logical.semanticHash()}"
    val nNodes = nodeCountCache.computeIfAbsent(ndKey, _ => nd.count())
      .longValue()
    require(nNodes <= 900000000L,
      s"pageRank int64-safety bound exceeded: $nNodes nodes > 9e8 — " +
        "nano-unit rank sums can wrap past 2^63 (silent divergence vs " +
        "a HUGEINT oracle); shrink the rank unit before raising this")
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
    // boundary and diverge from DuckDB's `//`); the damping multiply
    // uses the exact (q·d + (r·d) div 100) decomposition so the d·s
    // product never forms (s can approach N·10⁹)
    val base = (100L - dampingPct) * 1000000000L / 100L
    var rank = nd.select(col("node"), lit(1000000000L).as("rq"))
    for (_ <- 1 to iters) {
      val contrib = rank.join(e2, rank("node") === e2("src"))
        .select(col("dst").as("node"), expr("rq div __deg").as("__c"))
        .groupBy("node").agg(sum(col("__c")).as("__s"))
      val next = rank.select(col("node"))
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          expr(s"${base}L + (coalesce(__s, 0L) div 100L) * ${dampingPct}L"
            + s" + ((coalesce(__s, 0L) % 100L) * ${dampingPct}L) div 100L")
            .as("rq"))
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
    * Integer ladder identical to the Spark loop, including the exact
    * damping decomposition; every level CAST to BIGINT (sum() is
    * HUGEINT in DuckDB — the round-11 driver-hash divergence class). */
  def pageRankOracleSql(nodesSql: String, edgesSql: String, iters: Int,
      dampingPct: Int = 85): String = {
    val base = (100L - dampingPct) * 1000000000L / 100L
    val levels = (1 to iters).map { i =>
      s"""pr$i AS (SELECT nd.node,
         |    CAST($base + (coalesce(s.s, 0) // 100) * $dampingPct
         |      + ((coalesce(s.s, 0) % 100) * $dampingPct) // 100
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
       |pr0 AS (SELECT nd.node, CAST(1000000000 AS BIGINT) AS rq FROM nd),
       |$levels""".stripMargin
  }
}
