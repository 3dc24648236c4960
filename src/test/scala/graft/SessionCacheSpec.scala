package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** Staging attribution of [[graft.ops.SessionCache]]: every pin build
  * must report its MARGINAL cost. A pin whose build triggers another pin
  * (the dedup_clusters → ngram_pairs → capped_shingles chain) used to
  * record its full elapsed time, so the inner builds were summed two and
  * three times over in the bench's staging_total.
  */
class SessionCacheSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("session-cache-spec").getOrCreate()

  test("nested pin builds report marginal, not cumulative, seconds") {
    val s = spark
    import graft.ops.SessionCache
    SessionCache.releaseAll(s)
    SessionCache.drainStaging(s)
    def pinned(key: String)(build: => org.apache.spark.sql.DataFrame) =
      SessionCache.getOrElseUpdate(s, key)(
        build.persist(StorageLevel.MEMORY_AND_DISK_SER))
    val inner = pinned("spec_inner") {
      Thread.sleep(300)
      s.range(100).toDF("id")
    }
    // outer build consumes the (already-built-within-this-build) inner
    // pin: its recorded seconds must EXCLUDE the inner's 300 ms sleep
    SessionCache.release(s, "spec_inner")
    SessionCache.drainStaging(s)
    val outer = pinned("spec_outer") {
      val in = pinned("spec_inner2") {
        Thread.sleep(1500)
        s.range(100).toDF("id")
      }
      in.select(org.apache.spark.sql.functions.col("id"))
    }
    assert(outer.count() == 100 && inner.count() == 100)
    val staged = SessionCache.drainStaging(s).toMap
    assert(staged.contains("spec_inner2") && staged.contains("spec_outer"))
    assert(staged("spec_inner2") >= 1.5,
      s"inner build must carry its own sleep: $staged")
    // assert against the known sleep, not the inner's wall-clock: the
    // outer's own work is a persist+count of 100 rows — well under the
    // 1.5 s nested sleep it must NOT re-count, with margin for a slow
    // contended CI host (the old `outer < inner` form compared two
    // wall-clocks and flaked whenever the outer's real work exceeded a
    // 300 ms sleep)
    assert(staged("spec_outer") < 1.5,
      s"outer build must not re-count the nested build: $staged")
    SessionCache.releaseAll(s)
  }

  test("sibling pins after a drain still attribute independently") {
    val s = spark
    import graft.ops.SessionCache
    SessionCache.drainStaging(s)
    SessionCache.getOrElseUpdate(s, "spec_a")(
      s.range(10).toDF("id").persist(StorageLevel.MEMORY_AND_DISK_SER))
    SessionCache.drainStaging(s)
    SessionCache.getOrElseUpdate(s, "spec_b") {
      Thread.sleep(200)
      s.range(10).toDF("id").persist(StorageLevel.MEMORY_AND_DISK_SER)
    }
    val staged = SessionCache.drainStaging(s).toMap
    assert(staged.keySet == Set("spec_b"))
    assert(staged("spec_b") >= 0.2, s"own cost must be kept: $staged")
    SessionCache.releaseAll(s)
  }
}
