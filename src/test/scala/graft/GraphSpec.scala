package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

/** PageRank (ops/Graph.scala): integer-exact iteration contract. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: hand-checked star graph — the hub absorbs the damped mass") {
    // 4 spokes all link to hub 0; hub links back to spoke 1.
    val nodes = (0L to 4L).toDF("node")
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (0L, 1L))
      .toDF("src", "dst")
    val r = Graph.pageRank(nodes, edges, iters = 1, checkpoint = false)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    // per-node nano-units: init rq = 1e9 for EVERY node (no div by N),
    // outdeg 1 everywhere, base = (15 * 1e9) div 100 = 150_000_000.
    // hub: base + damp(4e9) = 150e6 + (4e9 div 100)*85 = 150e6 + 3.4e9
    assert(r(0L) == (3550000000L, 4L), s"hub: ${r(0L)}")
    // spoke 1: base + damp(1e9) = 150e6 + 850e6 = exactly 1e9
    assert(r(1L) == (1000000000L, 1L), s"spoke1: ${r(1L)}")
    // spokes 2-4: teleport base only, zero inlinks
    Seq(2L, 3L, 4L).foreach(n => assert(r(n) == (150000000L, 0L), s"$n: ${r(n)}"))
  }

  test("pageRank: authority ordering converges and reruns are bit-identical") {
    // chain with a shortcut: 0 <- 1 <- 2 <- ... <- 19, plus i -> i div 2
    val nodes = (0L until 20L).toDF("node")
    val edges = (1L until 20L).flatMap(i => Seq((i, i - 1), (i, i / 2)))
      .toDF("src", "dst")
    val a = Graph.pageRank(nodes, edges, iters = 10, checkpoint = false)
      .orderBy("node").collect().toSeq
    val b = Graph.pageRank(nodes, edges, iters = 10, checkpoint = false)
      .orderBy("node").collect().toSeq
    assert(a == b, "rerun diverged")
    val rank = a.map(x => x.getLong(0) -> x.getLong(1)).toMap
    // authority concentrates at the low ids (chain + div-2 links both
    // point downward); every low-id node outranks every tail node
    assert(Seq(0L, 1L, 2L, 3L).map(rank).min
      > (15L until 20L).map(rank).max, s"authority inverted: $rank")
    // edges outside the node set / dangling mass: ranks stay positive
    // and bounded by the total initial mass (20 nodes × 1e9 units)
    assert(rank.values.forall(v => v > 0 && v < 20L * 1000000000L))
  }

  test("pageRank: a cycle graph is EXACTLY stationary at 1e9 per node") {
    // i -> (i+1) mod n: leak-free, outdeg 1, uniform — the damped
    // update base + damp(1e9) = 150e6 + 850e6 reproduces 1e9 exactly,
    // so any iteration count returns the initial vector bit-for-bit
    // (the integer ladder introduces no drift on the fixed point)
    val n = 12L
    val nodes = (0L until n).toDF("node")
    val edges = (0L until n).map(i => (i, (i + 1) % n)).toDF("src", "dst")
    for (iters <- Seq(1, 7)) {
      val r = Graph.pageRank(nodes, edges, iters, checkpoint = false)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      assert(r.length == n && r.forall { case (_, rq, nin) =>
        rq == 1000000000L && nin == 1L }, s"iters=$iters: ${r.toSeq}")
    }
  }

  test("pageRank: edges from outside the node set are ignored") {
    val nodes = (0L to 2L).toDF("node")
    val edges = Seq((0L, 1L), (99L, 1L)).toDF("src", "dst")
    val r = Graph.pageRank(nodes, edges, iters = 1, checkpoint = false)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r(1L) == 1L, s"outside-src edge leaked into n_in: $r")
  }
}
