package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k accumulator: three parallel arrays + a fill count.
  * Capacity is fixed at construction; the aggregator compacts (keeps
  * the best k) whenever the arrays fill, so a buffer never holds more
  * than `cap` rows no matter how many candidates stream through. */
case class TopKAcc(var key: Array[Double], var id: Array[Long],
    var pay: Array[Long], var n: Int)

/** One result row of [[TopKRows]]: the sort key (e.g. cosine), the
  * neighbor id, and an opaque payload carried through unsorted-on
  * (e.g. the Hamming distance of a prefilter stage). */
case class TopHit(key: Double, id: Long, pay: Long)

/** Map-side bounded top-k per group — the partial-aggregation
  * replacement for `row_number() OVER (PARTITION BY q_id ORDER BY key)`
  * in the ANN tiers (VERDICT r9 #1): grouped by q_id, the shuffle
  * carries at most partitions × |Q| buffers of ≤ `cap` rows instead of
  * every scored candidate row (|Q|·n for a full-scan tier). Registered
  * via `functions.udaf` → Spark wraps it in a TypedImperativeAggregate
  * with genuine partial/merge modes (ObjectHashAggregate, map-side
  * combine before the Exchange — PlanSpec pins it).
  *
  * Ordering contract (must stay bitwise-identical to the window it
  * replaces): (key asc|desc, id asc), with Spark SQL's double
  * semantics — NaN sorts greatest and -0.0 == 0.0 (both normalized by
  * the `+ 0.0` trick before java.lang.Double.compare). Compaction only
  * ever drops rows strictly outside the current top-k under that total
  * order, so the final k are exactly the window's first k. */
class TopKRows(k: Int, asc: Boolean)
    extends Aggregator[(Double, Long, Long), TopKAcc, Seq[TopHit]] {
  require(k > 0, s"top-k needs k > 0, got $k")

  /** 4k amortizes the O(cap log cap) compaction to O(log cap) per
    * insert; the floor keeps tiny-k buffers from compacting every few
    * rows. Serialized partial size is cap × 24 bytes — for k=5 that is
    * ~1.5 KB per (partition, query), the new shuffle payload. */
  private val cap = math.max(4 * k, 32)

  def zero: TopKAcc =
    TopKAcc(new Array[Double](cap), new Array[Long](cap), new Array[Long](cap), 0)

  /** Strict "a ranks before b" under (key asc|desc, id asc). */
  private def before(k1: Double, i1: Long, k2: Double, i2: Long): Boolean = {
    // + 0.0 collapses -0.0 to 0.0 (Spark SQL comparison semantics);
    // Double.compare puts NaN above every value, matching Spark's sort
    val c = java.lang.Double.compare(k1 + 0.0, k2 + 0.0)
    val o = if (asc) c else -c
    if (o != 0) o < 0 else i1 < i2
  }

  /** Keep only the best k of the n buffered rows (in rank order). */
  private def compact(b: TopKAcc): Unit = {
    if (b.n <= k) return
    val idx = Array.range(0, b.n)
      .sortWith((x, y) => before(b.key(x), b.id(x), b.key(y), b.id(y)))
    val nk = new Array[Double](cap)
    val ni = new Array[Long](cap)
    val np = new Array[Long](cap)
    var i = 0
    while (i < k) {
      val s = idx(i)
      nk(i) = b.key(s); ni(i) = b.id(s); np(i) = b.pay(s)
      i += 1
    }
    b.key = nk; b.id = ni; b.pay = np; b.n = k
  }

  private def push(b: TopKAcc, key: Double, id: Long, pay: Long): Unit = {
    if (b.n == cap) compact(b) // leaves n == k < cap
    b.key(b.n) = key; b.id(b.n) = id; b.pay(b.n) = pay
    b.n += 1
  }

  def reduce(b: TopKAcc, a: (Double, Long, Long)): TopKAcc = {
    push(b, a._1, a._2, a._3); b
  }

  def merge(b1: TopKAcc, b2: TopKAcc): TopKAcc = {
    var i = 0
    while (i < b2.n) { push(b1, b2.key(i), b2.id(i), b2.pay(i)); i += 1 }
    b1
  }

  /** Rank order, exactly k rows (fewer iff the group had fewer). */
  def finish(b: TopKAcc): Seq[TopHit] = {
    val idx = Array.range(0, b.n)
      .sortWith((x, y) => before(b.key(x), b.id(x), b.key(y), b.id(y)))
    idx.take(k).map(s => TopHit(b.key(s), b.id(s), b.pay(s))).toSeq
  }

  def bufferEncoder: Encoder[TopKAcc] = Encoders.product[TopKAcc]
  def outputEncoder: Encoder[Seq[TopHit]] = ExpressionEncoder()
}

object TopKRows {
  /** The udaf input encoder ((key, id, payload) triples). */
  val inputEncoder: Encoder[(Double, Long, Long)] = ExpressionEncoder()
}
