package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S3 scan memoization (app.py:156-178 → df.cache()), shared by the ML
  * and [EXT] query families: one cached DataFrame per (session, key).
  * The key includes the session identity so a cached plan bound to a
  * stopped session is never replayed into a new one. Bounded LRU:
  * evicted entries are unpersisted, so a long-lived session touching
  * many dirs can't accumulate unbounded executor cache. */
private[graft] object Memo {
  // Sized to cover the FULL bench suite's distinct keys (scans + shared
  // passes) without mid-suite eviction — an evicted shared pass silently
  // recomputes its whole upstream pipeline inside whichever later query
  // touches it (the round-3 bench mystery: minhash 39 s; resurfaced at
  // 114 queries when 48 entries no longer covered the suite —
  // dedup_edit_distance 0.4 s → 6.6 s). 96 covers the 115-query suite
  // with headroom; still bounded so a long-lived session touching many
  // dirs can't grow without limit.
  private val MaxEntries = 96
  private val memo = new java.util.LinkedHashMap[String, DataFrame](32, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, DataFrame]): Boolean =
      if (size() > MaxEntries) { e.getValue.unpersist(); true } else false
  }

  def cached(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val k = s"${System.identityHashCode(s)}|$key"
    memo.synchronized {
      val hit = memo.get(k)
      if (hit != null) hit
      else { val df = build.cache(); memo.put(k, df); df }
    }
  }
}
