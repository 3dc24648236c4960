package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

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
  *
  * Attribution note: a lazily-persisted pin charges its one-time
  * materialization cost to whichever CONSUMER happens to run first — in a
  * benchmark that makes the first query of a family unreadable across
  * runs (the round-9 `x_tfidf_terms` 1.08 s → 3.99 s "regression" was the
  * shingle staging moving between entries as the suite grew). So
  * persisted pins are materialized EAGERLY here, at creation, and the
  * elapsed build time is recorded in a per-session log that
  * [[drainStaging]] hands to the host: `graft.Bench` subtracts it from
  * the consuming query's sample and reports staging as its own line.
  * Non-persisted pins (plan-only memos) stay lazy — counting them would
  * compute a plan nobody caches.
  */
private[graft] object SessionCache {
  private val caches =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, DataFrame]]()

  private val stagingLog =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.ArrayBuffer[(String, Double)]]()

  // Monotone per-(session, THREAD) sum of every recorded staging second —
  // never reset by drains. A pin whose build triggers ANOTHER pin (the
  // dedup_clusters → ngram_pairs → capped_shingles chain) must report
  // only its OWN marginal cost: recording the full elapsed time charged
  // the nested builds two and three times over, inflating the bench's
  // staging_total by the whole inner chain (~8.5 s at sf0.1). The
  // baseline is THREAD-local because a nested build always runs on its
  // parent build's thread — a session-global cumulative would subtract
  // whatever an unrelated concurrent build (or a streaming replay's
  // recordStaging) logged while this build was timing.
  private val stagedCumulative =
    new ThreadLocal[java.util.WeakHashMap[SparkSession, java.lang.Double]]() {
      override def initialValue() =
        new java.util.WeakHashMap[SparkSession, java.lang.Double]()
    }

  private def cumulativeFor(s: SparkSession): Double =
    Option(stagedCumulative.get.get(s)).map(_.doubleValue).getOrElse(0.0)

  def getOrElseUpdate(s: SparkSession, key: String)
                     (build: => DataFrame): DataFrame = {
    val m = mapFor(s)
    m.get(key) match {
      case Some(df) => df
      case None => m.getOrElseUpdate(key, {
        val nestedBefore = cumulativeFor(s)
        val t0 = System.nanoTime()
        val df = build
        if (df.storageLevel != StorageLevel.NONE) df.count()
        val nested = cumulativeFor(s) - nestedBefore
        record(s, key,
          math.max(0.0, (System.nanoTime() - t0) / 1e9 - nested))
        df
      })
    }
  }

  /** Record a labeled one-time cost on the staging channel from OUTSIDE
    * the memo path — e.g. the streaming-equivalence entries report their
    * micro-batch replay machinery (query start/stop, offset log, state
    * finalization) here so the bench's per-query line reads as operator
    * cost, with the harness on its own labeled line.
    */
  def recordStaging(s: SparkSession, key: String, sec: Double): Unit =
    record(s, key, sec)

  private def record(s: SparkSession, key: String, sec: Double): Unit =
    stagingLog.synchronized {
      var b = stagingLog.get(s)
      if (b == null) {
        b = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
        stagingLog.put(s, b)
      }
      b += ((key, sec))
      val tl = stagedCumulative.get
      tl.put(s, java.lang.Double.valueOf(
        Option(tl.get(s)).map(_.doubleValue).getOrElse(0.0) + sec))
    }

  /** Return-and-clear the (pin key, build seconds) entries materialized
    * since the last drain — the bench's staging-attribution feed.
    */
  def drainStaging(s: SparkSession): Seq[(String, Double)] =
    stagingLog.synchronized {
      val b = stagingLog.get(s)
      if (b == null) Seq.empty
      else { val out = b.toSeq; b.clear(); out }
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
