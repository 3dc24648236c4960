package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-session memoization of cached staging DataFrames (shared shingle
  * index, synthesized flagship table, simhash signatures).
  *
  * Keyed WEAKLY by the SparkSession instance: a stopped/GC'd session's
  * entries disappear with it, so (a) a recycled identity hash can never
  * resolve to a DataFrame bound to a dead session and (b) retired
  * sessions' plans and cache pins are not leaked for process lifetime.
  */
private[ops] object SessionCache {
  private val caches =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, DataFrame]]()

  def getOrElseUpdate(s: SparkSession, key: String)
                     (build: => DataFrame): DataFrame = {
    val m = caches.synchronized {
      var c = caches.get(s)
      if (c == null) {
        c = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
        caches.put(s, c)
      }
      c
    }
    m.getOrElseUpdate(key, build)
  }
}
