package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-session memoization of cached staging DataFrames (shared shingle
  * index, synthesized flagship table, simhash signatures, langId words,
  * transformed embedding corpus).
  *
  * Lifetime note: the map is keyed by the SparkSession, but each cached
  * DataFrame strongly references its session (`Dataset.sparkSession`), so
  * entries pin the key and are NOT collectable while they exist — weak
  * keys alone cannot reclaim them. Reclamation is therefore explicit:
  * hosts that retire a session (or finish a query family) call
  * [[release]] / [[releaseAll]], which unpersists the plans and drops the
  * strong value chain; only then can the weak key entry go.
  */
private[graft] object SessionCache {
  private val caches =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, DataFrame]]()

  def getOrElseUpdate(s: SparkSession, key: String)
                     (build: => DataFrame): DataFrame = {
    val m = mapFor(s)
    m.getOrElseUpdate(key, build)
  }

  private def mapFor(s: SparkSession) = caches.synchronized {
    var c = caches.get(s)
    if (c == null) {
      c = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
      caches.put(s, c)
    }
    c
  }

  /** Unpersist and forget every memoized DataFrame whose key starts with
    * `prefix` (empty prefix = everything for the session). Safe to call
    * concurrently with readers: an in-flight query holding the DataFrame
    * keeps its plan; only the cache pin and the memo entry go.
    */
  def release(s: SparkSession, prefix: String = ""): Unit = {
    val m = caches.synchronized(Option(caches.get(s)))
    m.foreach { c =>
      c.keys.filter(_.startsWith(prefix)).foreach { k =>
        c.remove(k).foreach { df =>
          try df.unpersist(blocking = false)
          catch { case _: Throwable => () }
        }
      }
    }
  }

  def releaseAll(s: SparkSession): Unit = release(s, "")
}
