package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S3 scan memoization (app.py:156-178 → df.cache()), shared by the ML
  * and [EXT] query families: one cached DataFrame per (session, key).
  * The key includes the session identity so a cached plan bound to a
  * stopped session is never replayed into a new one. Bounded LRU:
  * evicted entries are unpersisted, so a long-lived session touching
  * many dirs can't accumulate unbounded executor cache. */
private[graft] object Memo {
  // 48 covers the full 80-query bench suite's distinct keys (scans + shared
  // passes) without mid-suite eviction; still bounded so a long-lived session
  // touching many dirs can't grow without limit.
  private val MaxEntries = 48
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
