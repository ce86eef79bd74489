package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bounded persist for operator-internal intermediates: persisting inside a
  * library function would otherwise pin one cached copy per invocation for
  * the session's lifetime (block-manager leak under repeated calls).
  * `swap` persists the new frame and unpersists the previous one registered
  * under the same (session, tag) — at most one pinned copy per operator per
  * session. Unpersisting a frame another in-flight query still references
  * is safe (Spark recomputes); it just forfeits that reuse. */
object CacheOnce {
  private val last =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def swap(tag: String, df: DataFrame): DataFrame = {
    val p = df.persist()
    // Compare plans, not object identity: a repeat call builds a fresh
    // Dataset over the SAME logical plan, whose persist() is a no-op
    // against the existing cache entry — unpersisting the old handle
    // would evict that shared entry and leave the "cached" frame cold.
    Option(last.put((df.sparkSession, tag), p))
      .filter(old => !old.sameSemantics(p))
      .foreach(_.unpersist(blocking = false))
    p
  }
}
