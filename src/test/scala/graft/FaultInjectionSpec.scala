package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.materialize._

/** Systematic crash-consistency sweep of the warehouse commit protocol.
  *
  * Every mutation path announces named fault points ([[Warehouse.faultPoint]])
  * at each externally visible filesystem transition. For each protocol
  * operation this spec:
  *
  *  1. TRACES one clean run to enumerate the exact fault points on its
  *     path (so newly added seams are swept automatically — the sweep can
  *     never silently under-cover a protocol change);
  *  2. for EVERY point index i, rebuilds the fixture from scratch, aborts
  *     the operation at firing #i (simulating a crash there — the lock is
  *     released, which models crash + stale-lock expiry, the end state
  *     [[LockLeaseSpec]] proves reachable), then asserts:
  *       - '''no torn read''': a cold re-open (fresh Warehouse instance,
  *         empty caches) reads EXACTLY the pre-state or the post-state
  *         multiset — never a mixture, never a duplicate, never a
  *         resurrected deleted row (manifest mode; rename mode's
  *         documented contract is weaker: the table may be mid-swap, but
  *         retry must still converge losslessly);
  *       - '''retry convergence''': re-running the same operation cold
  *         lands the exact post-state;
  *       - '''GC safety''': every version dir the latest manifest
  *         references exists on disk after crash AND after retry — GC
  *         never collects referenced data.
  *
  * The r17 hand-found race classes ride as explicit regression rows:
  * TTL-expiry CAS-retry unlink (expire-vs-refresh interleaving via the
  * same seam used as a RACE injector, not a crash), rename-swap backup
  * destruction (crash at swap.live-backed-up + retry), and the
  * exactly-once stream watermark (crash anywhere in appendStreamBatch +
  * replay of the same batch id must never double-append).
  */
class FaultInjectionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def df(ids: Long*): DataFrame = {
    val s = spark; import s.implicits._
    ids.map(i => (i, s"n$i")).toDF("id", "name").coalesce(1)
  }
  private def pdf(rows: (Long, String)*): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("id", "dt").coalesce(1)
  }

  private final class Crash(val point: String, val idx: Int)
    extends RuntimeException(s"injected crash at $point#$idx")

  /** Run `op` with a recording handler; returns the ordered fault trace. */
  private def trace(op: => Unit): Seq[String] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    Warehouse.faultHandler = n => { buf += n; () }
    try op finally Warehouse.faultHandler = Warehouse.NoFault
    buf.toSeq
  }

  /** Run `op`, throwing at fault-point firing #i; asserts the crash
    * actually landed (the path reached point i).
    */
  private def crashAt(i: Int, label: String)(op: => Unit): String = {
    var c = -1
    var fired: Option[String] = None
    Warehouse.faultHandler = n => {
      c += 1
      if (c == i) { fired = Some(n); throw new Crash(n, i) }
    }
    try {
      val thrown =
        try { op; false }
        catch { case _: Crash => true }
      assert(thrown, s"$label: run completed without reaching point #$i")
    } finally Warehouse.faultHandler = Warehouse.NoFault
    fired.get
  }

  /** Crash at the first firing of the NAMED point. */
  private def crashAtPoint(point: String, label: String)(op: => Unit): Unit = {
    Warehouse.faultHandler = n => if (n == point) throw new Crash(n, -1)
    try {
      val thrown =
        try { op; false }
        catch { case _: Crash => true }
      assert(thrown, s"$label: run completed without reaching point $point")
    } finally Warehouse.faultHandler = Warehouse.NoFault
  }

  /** One protocol operation under sweep. `before`/`after` are expected
    * row-id MULTISETS (sorted) — a mixture, loss, duplicate, or
    * resurrected delete can never equal either.
    */
  private case class Scenario(
      name: String,
      mode: CommitMode,
      setup: Warehouse => Unit,
      op: Warehouse => Unit,
      before: Seq[Long],
      after: Seq[Long],
      // manifest mode: the relation must be READABLE at every crash
      // point (old or new snapshot). Rename mode: mid-swap windows may
      // leave it absent/partial; only retry convergence is contracted.
      strictReads: Boolean,
      // pre-state may legitimately not exist (e.g. clone target)
      mayNotExist: Boolean = false,
      // expected retry result when the crash landed AT/AFTER the commit
      // point: a non-idempotent op (plain append) legitimately re-applies
      // — the documented reason the watermarked appendStreamBatch exists
      retryAfterCommit: Option[Seq[Long]] = None)

  private val R = Relation("db", "s", "t")

  private def mkWh(root: String, mode: CommitMode): Warehouse =
    new Warehouse(spark, root, mode)

  private def ids(wh: Warehouse): Seq[Long] =
    wh.read(R).select("id").collect().map(_.getLong(0)).toSeq.sorted

  /** Every version dir the newest manifest references must exist. */
  private def assertReferencedExist(wh: Warehouse, label: String): Unit =
    wh.manifestEntries(R).foreach(_.foreach { case (d, _) =>
      val p =
        if (d.startsWith("/")) java.nio.file.Paths.get(d)
        else java.nio.file.Paths.get(wh.path(R), "_graft", d)
      assert(Files.exists(p), s"$label: GC collected referenced dir $d")
    })

  private def sweep(sc: Scenario): Unit = {
    // -- enumerate the path's fault points on a throwaway fixture
    val root0 = Files.createTempDirectory(s"graft_fi_${sc.name}_t").toString
    val wh0 = mkWh(root0, sc.mode)
    sc.setup(wh0)
    val points = trace { sc.op(wh0) }
    assert(points.nonEmpty, s"${sc.name}: no fault points on path — seam missing")
    assert(ids(wh0) == sc.after, s"${sc.name}: clean run post-state wrong")
    info(s"${sc.name}: ${points.length} points [${points.mkString(", ")}]")

    for (i <- points.indices) {
      val root = Files.createTempDirectory(s"graft_fi_${sc.name}_$i").toString
      val wh = mkWh(root, sc.mode)
      sc.setup(wh)
      val at = crashAt(i, sc.name)(sc.op(wh))
      val label = s"${sc.name} @$at#$i"
      // -- torn-read check on a COLD instance (no caches)
      val cold = mkWh(root, sc.mode)
      if (cold.exists(R)) {
        val seen = ids(cold)
        if (sc.strictReads)
          assert(seen == sc.before || seen == sc.after,
            s"$label: torn read $seen (expected ${sc.before} or ${sc.after})")
        else {
          // rename mode's weaker mid-swap contract: a partition may be
          // transiently absent, but a reader must NEVER see rows that
          // belong to neither state, nor the same row twice (old+new
          // copies of one partition visible together)
          val legal = sc.before.toSet ++ sc.after.toSet
          assert(seen.toSet.subsetOf(legal) && seen.distinct == seen,
            s"$label: phantom/duplicate rows $seen")
        }
      } else assert(!sc.strictReads || sc.mayNotExist,
        s"$label: relation unreadable after crash under strict-read contract")
      assertReferencedExist(cold, s"$label (post-crash)")
      // -- retry converges
      val committedIdx = points.indexOf("commit.committed")
      val postCommit = committedIdx >= 0 && i >= committedIdx
      val expectRetry =
        if (postCommit) sc.retryAfterCommit.getOrElse(sc.after) else sc.after
      val retry = mkWh(root, sc.mode)
      sc.op(retry)
      assert(ids(retry) == expectRetry,
        s"$label: retry diverged: ${ids(retry)} (expected $expectRetry)")
      assertReferencedExist(retry, s"$label (post-retry)")
    }
  }

  // ===================================================== manifest mode

  test("manifest: full overwrite survives a crash at every point") {
    sweep(Scenario("mf-overwrite", CommitMode.Manifest,
      setup = wh => wh.writeAtomic(df(1, 2), R),
      op = wh => wh.writeAtomic(df(3, 4), R),
      before = Seq(1L, 2L), after = Seq(3L, 4L), strictReads = true))
  }

  test("manifest: overwrite with retention GC on the path") {
    // 4th overwrite expires manifest 1 and its version dir — the
    // gc.manifest-delete / gc.vdir-delete points must be on this trace
    val sc = Scenario("mf-overwrite-gc", CommitMode.Manifest,
      setup = wh => { wh.writeAtomic(df(1), R); wh.writeAtomic(df(2), R)
        wh.writeAtomic(df(3), R) },
      op = wh => wh.writeAtomic(df(4, 5), R),
      before = Seq(3L), after = Seq(4L, 5L), strictReads = true)
    val root0 = Files.createTempDirectory("graft_fi_gcprobe").toString
    val wh0 = mkWh(root0, sc.mode); sc.setup(wh0)
    val pts = trace { sc.op(wh0) }
    assert(pts.contains("gc.manifest-delete") && pts.contains("gc.vdir-delete"),
      s"retention GC points missing from trace: $pts")
    sweep(sc)
  }

  test("manifest: append survives a crash at every point") {
    sweep(Scenario("mf-append", CommitMode.Manifest,
      setup = wh => wh.writeAtomic(df(1, 2), R),
      op = wh => wh.append(df(3), R),
      before = Seq(1L, 2L), after = Seq(1L, 2L, 3L), strictReads = true,
      // plain append is NOT idempotent: a retry of a crash that landed
      // after the commit re-appends (the caller cannot know). That is
      // precisely the gap appendStreamBatch's watermark closes — proven
      // in the exactly-once test below.
      retryAfterCommit = Some(Seq(1L, 2L, 3L, 3L))))
  }

  test("manifest: equality delete survives a crash at every point") {
    sweep(Scenario("mf-delete", CommitMode.Manifest,
      setup = wh => wh.writeAtomic(df(1, 2, 3), R),
      op = wh => { wh.deleteKeys(R, df(2).select("id")); () },
      before = Seq(1L, 2L, 3L), after = Seq(1L, 3L), strictReads = true))
  }

  test("manifest: compaction materializing deletes never resurrects rows") {
    // pre-state already has the delete APPLIED (reads are delete-aware),
    // so before == after: every crash point must read exactly this set —
    // a resurrected id=2 or a lost id=5 can never equal it
    sweep(Scenario("mf-compact", CommitMode.Manifest,
      setup = wh => {
        wh.writeAtomic(df(1, 2, 3, 4), R)
        wh.deleteKeys(R, df(2).select("id"))
        wh.append(df(5), R)
      },
      op = wh => { wh.compactTable(R, maxEntries = 1); () },
      before = Seq(1L, 3L, 4L, 5L), after = Seq(1L, 3L, 4L, 5L),
      strictReads = true))
  }

  test("manifest: partition replacement survives a crash at every point") {
    sweep(Scenario("mf-replace", CommitMode.Manifest,
      setup = wh => wh.writeAtomic(
        pdf((1L, "a"), (2L, "a"), (3L, "b")), R, partitionCols = Seq("dt")),
      op = wh => wh.replacePartitions(pdf((30L, "b"), (31L, "b")), R, Seq("dt")),
      before = Seq(1L, 2L, 3L), after = Seq(1L, 2L, 30L, 31L),
      strictReads = true))
  }

  test("manifest: rollback survives a crash at every point") {
    sweep(Scenario("mf-rollback", CommitMode.Manifest,
      setup = wh => { wh.writeAtomic(df(1, 2), R); wh.writeAtomic(df(3), R) },
      op = wh => wh.rollbackTo(R, wh.listVersions(R).min),
      before = Seq(3L), after = Seq(1L, 2L), strictReads = true))
  }

  test("manifest: zero-copy clone survives a crash at every point") {
    val SRC = Relation("db", "s", "src")
    sweep(Scenario("mf-clone", CommitMode.Manifest,
      setup = wh => wh.writeAtomic(df(1, 2),
        SRC) /* target R starts absent */,
      op = wh => wh.cloneFrom(wh, SRC, R),
      before = Nil, after = Seq(1L, 2L), strictReads = true,
      mayNotExist = true))
  }

  test("manifest: TTL expiry survives a crash at every point") {
    def stale(wh: Warehouse): Unit = {
      wh.writeAtomic(pdf((1L, "old"), (2L, "new")), R, partitionCols = Seq("dt"))
      // age the dt=old leaf of the committed version dir
      val mf = java.nio.file.Paths.get(wh.path(R), "_graft")
      val s = Files.list(mf)
      val vdirs = try {
        val it = s.iterator()
        val b = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
        while (it.hasNext) { val p = it.next(); if (Files.isDirectory(p)) b += p }
        b.toSeq
      } finally s.close()
      vdirs.foreach { v =>
        val oldLeaf = v.resolve("dt=old")
        if (Files.exists(oldLeaf))
          Files.setLastModifiedTime(oldLeaf,
            java.nio.file.attribute.FileTime.fromMillis(1000L))
      }
    }
    sweep(Scenario("mf-ttl", CommitMode.Manifest,
      setup = stale,
      op = wh => { wh.expirePartitions(R, ttlMs = 60000L,
        asOfMs = System.currentTimeMillis()); () },
      before = Seq(1L, 2L), after = Seq(2L), strictReads = true))
  }

  test("exactly-once: stream batch replay after a crash at every point") {
    // the core exactly-once claim: whatever point the writer dies at,
    // re-delivering the SAME batch id can never double its rows, and the
    // committed watermark always agrees with the committed data
    val sc = Scenario("mf-stream", CommitMode.Manifest,
      setup = wh => { wh.appendStreamBatch(df(1, 2), R, "src", 0L); () },
      op = wh => { wh.appendStreamBatch(df(3, 4), R, "src", 1L); () },
      before = Seq(1L, 2L), after = Seq(1L, 2L, 3L, 4L), strictReads = true)
    sweep(sc)
    // watermark/data agreement at each crash point, checked explicitly
    val root0 = Files.createTempDirectory("graft_fi_stream_t").toString
    val wh0 = mkWh(root0, sc.mode); sc.setup(wh0)
    val points = trace { sc.op(wh0) }
    for (i <- points.indices) {
      val root = Files.createTempDirectory(s"graft_fi_stream_$i").toString
      val wh = mkWh(root, sc.mode); sc.setup(wh)
      crashAt(i, "mf-stream-wm")(sc.op(wh))
      val cold = mkWh(root, sc.mode)
      val mark = cold.streamWatermark(R, "src")
      val seen = ids(cold)
      if (mark.contains(1L)) assert(seen == sc.after,
        s"watermark says batch 1 committed but rows are $seen")
      else assert(seen == sc.before,
        s"watermark ${mark} yet rows are $seen — marker/data split commit")
      // replay of batch 1 on the cold instance: appended exactly once
      cold.appendStreamBatch(df(3, 4), R, "src", 1L)
      assert(ids(cold) == sc.after, s"replay duplicated rows: ${ids(cold)}")
      assert(mkWh(root, sc.mode).streamWatermark(R, "src").contains(1L))
    }
  }

  // ====================================================== rename mode

  test("rename: atomic swap crash-recovers losslessly at every point") {
    sweep(Scenario("rn-overwrite", CommitMode.Rename,
      setup = wh => wh.writeAtomic(df(1, 2), R),
      op = wh => wh.writeAtomic(df(3, 4), R),
      before = Seq(1L, 2L), after = Seq(3L, 4L), strictReads = false))
  }

  test("rename: partition swap (pbackup protocol) recovers at every point") {
    sweep(Scenario("rn-replace", CommitMode.Rename,
      setup = wh => wh.writeAtomic(
        pdf((1L, "a"), (2L, "a"), (3L, "b")), R, partitionCols = Seq("dt")),
      op = wh => wh.replacePartitions(pdf((30L, "b"), (31L, "b")), R, Seq("dt")),
      before = Seq(1L, 2L, 3L), after = Seq(1L, 2L, 30L, 31L),
      strictReads = false))
  }

  test("rename: TTL leaf expiry recovers at every point") {
    def stale(wh: Warehouse): Unit = {
      wh.writeAtomic(pdf((1L, "old"), (2L, "new")), R, partitionCols = Seq("dt"))
      Files.setLastModifiedTime(
        java.nio.file.Paths.get(wh.path(R), "dt=old"),
        java.nio.file.attribute.FileTime.fromMillis(1000L))
    }
    sweep(Scenario("rn-ttl", CommitMode.Rename,
      setup = stale,
      op = wh => { wh.expirePartitions(R, ttlMs = 60000L,
        asOfMs = System.currentTimeMillis()); () },
      before = Seq(1L, 2L), after = Seq(2L), strictReads = false))
  }

  test("rename: double crash — swap dies mid-window, then retry dies too") {
    // r17 regression class: the first crash leaves the live dir renamed
    // away (backup holds the only copy); the RETRY's recovery preamble
    // must restore BEFORE anything destructive, so a second crash right
    // after the restore still leaves the data recoverable
    val root = Files.createTempDirectory("graft_fi_double").toString
    val wh = mkWh(root, CommitMode.Rename)
    wh.writeAtomic(df(1, 2), R)
    // locate the live-backed-up point index on this op's trace
    val probe = {
      val r2 = Files.createTempDirectory("graft_fi_double_t").toString
      val w2 = mkWh(r2, CommitMode.Rename)
      w2.writeAtomic(df(1, 2), R)
      trace { w2.writeAtomic(df(3, 4), R) }
    }
    val iBack = probe.indexOf("swap.live-backed-up")
    assert(iBack >= 0, s"swap.live-backed-up not on trace: $probe")
    crashAt(iBack, "double-1")(wh.writeAtomic(df(3, 4), R))
    // retry crashes at tmp-written — by then the recovery preamble has
    // restored the backed-up live copy (crashing at index 0 would land
    // INSIDE the restore rename, before it executes)
    val wh2 = mkWh(root, CommitMode.Rename)
    crashAtPoint("swap.tmp-written", "double-2")(wh2.writeAtomic(df(3, 4), R))
    val cold = mkWh(root, CommitMode.Rename)
    assert(cold.exists(R) && ids(cold) == Seq(1L, 2L),
      "recovery preamble failed to restore the backed-up live copy")
    val wh3 = mkWh(root, CommitMode.Rename)
    wh3.writeAtomic(df(3, 4), R)
    assert(ids(wh3) == Seq(3L, 4L))
  }

  test("manifest: orphan-vdir vacuum survives a crash at every point") {
    // an orphan = a writer that crashed after its data write, before its
    // manifest claim (exactly what crashing mf.overwrite.data-written
    // leaves behind). The sweep: age the orphan, vacuum it, crash at
    // every vacuum point, assert committed data untouched throughout and
    // the retry completes the reclaim.
    def setupWithOrphan(wh: Warehouse): Unit = {
      wh.writeAtomic(df(1, 2), R)
      crashAtPoint("mf.overwrite.data-written", "orphan-setup")(
        wh.writeAtomic(df(9), R))
      // age every unreferenced version dir past the sweep horizon
      val mf = java.nio.file.Paths.get(wh.path(R), "_graft")
      val referenced = wh.manifestEntries(R).getOrElse(Nil).map(_._1).toSet
      val s = Files.list(mf)
      try {
        val it = s.iterator()
        while (it.hasNext) {
          val p = it.next()
          if (Files.isDirectory(p) &&
              !referenced.contains(p.getFileName.toString))
            Files.setLastModifiedTime(p,
              java.nio.file.attribute.FileTime.fromMillis(1000L))
        }
      } finally s.close()
    }
    sweep(Scenario("mf-orphan-gc", CommitMode.Manifest,
      setup = setupWithOrphan,
      op = wh => { wh.gcOrphanVersions(R, olderThanMs = 60000L); () },
      before = Seq(1L, 2L), after = Seq(1L, 2L), strictReads = true))
    // and the reclaim actually happened: no unreferenced vdirs remain
    val root = Files.createTempDirectory("graft_fi_orphan_post").toString
    val wh = mkWh(root, CommitMode.Manifest)
    setupWithOrphan(wh)
    val removed = wh.gcOrphanVersions(R, olderThanMs = 60000L)
    assert(removed.nonEmpty, "vacuum reclaimed nothing — orphan not seen")
  }

  // ============================================= race rows via the seam

  test("race: TTL expiry CAS-retry must not unlink a racing refresh (r17)") {
    // the seam as a RACE injector: just before the expire's manifest
    // claim, a 'concurrent' writer refreshes the very partition being
    // expired. The expire loses the CAS, retries, and MUST recompute its
    // expired set from the fresh state — the r17 bug re-applied the
    // stale set and silently unlinked the refreshed data.
    val root = Files.createTempDirectory("graft_fi_race").toString
    val wh = mkWh(root, CommitMode.Manifest)
    wh.writeAtomic(pdf((1L, "old"), (2L, "new")), R, partitionCols = Seq("dt"))
    val mf = java.nio.file.Paths.get(wh.path(R), "_graft")
    val s = Files.list(mf)
    try {
      val it = s.iterator()
      while (it.hasNext) {
        val p = it.next()
        val leaf = p.resolve("dt=old")
        if (Files.isDirectory(p) && Files.exists(leaf))
          Files.setLastModifiedTime(leaf,
            java.nio.file.attribute.FileTime.fromMillis(1000L))
      }
    } finally s.close()
    val other = mkWh(root, CommitMode.Manifest)
    var injected = false
    Warehouse.faultHandler = n => {
      if (n == "commit.claim" && !injected) {
        injected = true
        Warehouse.faultHandler = Warehouse.NoFault // no recursion
        other.replacePartitions(pdf((10L, "old"), (11L, "old")), R, Seq("dt"))
        // re-arm nothing: one interleaving is the scenario
      }
    }
    try wh.expirePartitions(R, ttlMs = 60000L,
      asOfMs = System.currentTimeMillis())
    finally Warehouse.faultHandler = Warehouse.NoFault
    assert(injected, "race was never injected — commit.claim not reached")
    val cold = mkWh(root, CommitMode.Manifest)
    assert(ids(cold) == Seq(2L, 10L, 11L),
      s"racing refresh of dt=old was unlinked by the expiry: ${ids(cold)}")
    assertReferencedExist(cold, "ttl-race")
  }

  // ==================================== end-to-end: SCD-2 snapshot RMW

  test("snapshot RMW: crash at every warehouse point, retry converges") {
    val s = spark; import s.implicits._
    def ts(x: String) = Timestamp.valueOf(x)
    def src(rows: Seq[(Long, String, Timestamp)]) =
      rows.toDF("id", "payload", "updated_at").coalesce(1)
    val strat = SnapshotStrategy.Timestamp("updated_at")
    val v1 = Seq((1L, "a", ts("2024-01-01 00:00:00")),
                 (2L, "b", ts("2024-01-01 00:00:00")))
    val v2 = Seq((1L, "a2", ts("2024-02-01 00:00:00")),
                 (2L, "b", ts("2024-01-01 00:00:00")),
                 (3L, "c", ts("2024-02-01 00:00:00")))
    val now = lit(ts("2024-02-02 00:00:00"))
    def state(wh: Warehouse): Seq[String] = {
      val snap = new Snapshotter(wh)
      snap.read(R).collect().map(_.toString).toSeq.sorted
    }
    // no-crash baseline
    val rootB = Files.createTempDirectory("graft_fi_snapb").toString
    val whB = mkWh(rootB, CommitMode.Manifest)
    val snapB = new Snapshotter(whB)
    snapB.snapshot(src(v1), R, Seq("id"), strat, now = now)
    val preState = state(whB)
    snapB.snapshot(src(v2), R, Seq("id"), strat, now = now)
    val postState = state(whB)
    assert(preState != postState)
    // enumerate points of the 2nd (read-modify-write) snapshot run
    val root0 = Files.createTempDirectory("graft_fi_snapt").toString
    val wh0 = mkWh(root0, CommitMode.Manifest)
    new Snapshotter(wh0).snapshot(src(v1), R, Seq("id"), strat, now = now)
    val points = trace {
      new Snapshotter(wh0).snapshot(src(v2), R, Seq("id"), strat, now = now)
    }
    assert(points.nonEmpty)
    info(s"snapshot RMW: ${points.length} points [${points.mkString(", ")}]")
    for (i <- points.indices) {
      val root = Files.createTempDirectory(s"graft_fi_snap_$i").toString
      val wh = mkWh(root, CommitMode.Manifest)
      new Snapshotter(wh).snapshot(src(v1), R, Seq("id"), strat, now = now)
      val at = crashAt(i, "snap")(
        new Snapshotter(wh).snapshot(src(v2), R, Seq("id"), strat, now = now))
      // torn-read: the SCD-2 table is a consistent snapshot at all times
      val cold = mkWh(root, CommitMode.Manifest)
      val seen = state(cold)
      assert(seen == preState || seen == postState,
        s"snap @$at#$i: torn SCD-2 state")
      // retry: idempotent re-run of the same source lands the post state
      val retry = mkWh(root, CommitMode.Manifest)
      new Snapshotter(retry).snapshot(src(v2), R, Seq("id"), strat, now = now)
      assert(state(retry) == postState, s"snap @$at#$i: retry diverged")
    }
  }
}
