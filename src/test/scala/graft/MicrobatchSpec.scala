package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.materialize.Materializer

/** dbt 1.9 microbatch incremental strategy: period slicing, lookback
  * reprocessing, per-batch failure isolation, empty-batch clearing, and
  * full refresh — the lifecycle semantics the o_microbatch oracle query
  * can't exercise one-by-one.
  */
class MicrobatchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def freshWh() =
    new Warehouse(spark, Files.createTempDirectory("graft_mb").toString)

  private val cfg = ModelConfig(materialized = "incremental",
    incrementalStrategy = IncrementalStrategy.Microbatch,
    eventTime = "day", batchSize = "day", lookback = 1,
    begin = "2024-01-01")

  private def rows(vals: (String, Long)*) =
    vals.toSeq.toDF("day", "v").withColumn("day", col("day").cast("date"))

  private def state(wh: Warehouse, rel: Relation): Set[(String, Long)] =
    wh.read(rel).select(col("day").cast("string"), col("v"))
      .as[(String, Long)].collect().toSet

  test("initial build covers begin..now; incremental run only lookback window") {
    val wh = freshWh(); val mat = new Materializer(wh)
    val rel = Relation("wh", "main", "t")
    spark.conf.set("graft.microbatch.now", "2024-01-04")
    try {
      mat.incremental(rows("2024-01-01" -> 1, "2024-01-02" -> 2,
        "2024-01-04" -> 4), rel, cfg)
      assert(state(wh, rel) == Set(("2024-01-01", 1L), ("2024-01-02", 2L),
        ("2024-01-04", 4L)))
      // batch label is the period start, a real DATE partition column
      assert(wh.read(rel).schema("event_batch").dataType ==
        org.apache.spark.sql.types.DateType)

      // incremental run: day-02 row changes (OUTSIDE lookback from 01-04:
      // window is 01-03..01-04) — must NOT be reprocessed; day-04 changes
      // are picked up
      mat.incremental(rows("2024-01-02" -> 99, "2024-01-04" -> 44), rel, cfg)
      assert(state(wh, rel) == Set(("2024-01-01", 1L), ("2024-01-02", 2L),
        ("2024-01-04", 44L)))
    } finally spark.conf.unset("graft.microbatch.now")
  }

  test("empty batch clears its period; lookback reprocesses late data") {
    val wh = freshWh(); val mat = new Materializer(wh)
    val rel = Relation("wh", "main", "t")
    spark.conf.set("graft.microbatch.now", "2024-01-03")
    try {
      mat.incremental(rows("2024-01-01" -> 1, "2024-01-02" -> 2,
        "2024-01-03" -> 3), rel, cfg)
      // next run: day-02 (inside lookback) now has NO rows → period
      // cleared; day-03 keeps its replacement
      mat.incremental(rows("2024-01-03" -> 33), rel, cfg)
      assert(state(wh, rel) == Set(("2024-01-01", 1L), ("2024-01-03", 33L)))
    } finally spark.conf.unset("graft.microbatch.now")
  }

  test("a failing batch does not abort the others; error names the period") {
    val wh = freshWh(); val mat = new Materializer(wh)
    val rel = Relation("wh", "main", "t")
    spark.conf.set("graft.microbatch.now", "2024-01-03")
    try {
      // the model reads a source PARTITIONED by day whose 2024-01-02 file
      // is corrupt: partition pruning keeps the other batches' scans away
      // from it, so exactly one batch fails while 01 and 03 commit
      val src = Files.createTempDirectory("graft_mb_src").toString
      rows("2024-01-01" -> 1, "2024-01-02" -> 2, "2024-01-03" -> 3)
        .write.mode("overwrite").partitionBy("day").parquet(src)
      val dayDir = new java.io.File(s"$src/day=2024-01-02")
      dayDir.listFiles().filter(_.getName.endsWith(".parquet"))
        .foreach(f => Files.write(f.toPath, "not a parquet file".getBytes))
      val poisoned = spark.read.schema("v LONG, day DATE").parquet(src)
      val e = intercept[IllegalStateException] {
        mat.incremental(poisoned, rel, cfg)
      }
      assert(e.getMessage.contains("1 of 3 batches failed"))
      assert(e.getMessage.contains("2024-01-02"))
      assert(state(wh, rel) == Set(("2024-01-01", 1L), ("2024-01-03", 3L)))
      // retry with healthy data heals only the window it covers
      mat.incremental(rows("2024-01-02" -> 2, "2024-01-03" -> 3), rel, cfg)
      assert(state(wh, rel) == Set(("2024-01-01", 1L), ("2024-01-02", 2L),
        ("2024-01-03", 3L)))
    } finally spark.conf.unset("graft.microbatch.now")
  }

  test("full refresh rebuilds from begin; begin clamps the window") {
    val wh = freshWh(); val mat = new Materializer(wh)
    val rel = Relation("wh", "main", "t")
    spark.conf.set("graft.microbatch.now", "2024-01-02")
    try {
      // rows BEFORE begin are never processed (their period is out of
      // every window)
      mat.incremental(rows("2023-12-31" -> 9, "2024-01-01" -> 1,
        "2024-01-02" -> 2), rel, cfg)
      assert(state(wh, rel) == Set(("2024-01-01", 1L), ("2024-01-02", 2L)))
      // full refresh reprocesses begin..now even when the target exists
      mat.incremental(rows("2024-01-01" -> 11, "2024-01-02" -> 22), rel,
        cfg, fullRefresh = true)
      assert(state(wh, rel) == Set(("2024-01-01", 11L), ("2024-01-02", 22L)))
    } finally spark.conf.unset("graft.microbatch.now")
  }

  test("schema drift is refused on incremental runs (no mixed-schema partitions)") {
    val wh = freshWh(); val mat = new Materializer(wh)
    val rel = Relation("wh", "main", "t")
    spark.conf.set("graft.microbatch.now", "2024-01-02")
    try {
      mat.incremental(rows("2024-01-01" -> 1), rel, cfg)
      val widened = rows("2024-01-01" -> 1)
        .withColumn("extra", lit("x"))
      val e = intercept[IllegalStateException] {
        mat.incremental(widened, rel, cfg)
      }
      assert(e.getMessage.contains("schema drifted"))
      assert(e.getMessage.contains("full-refresh"))
      // --full-refresh takes the new schema cleanly
      mat.incremental(widened, rel, cfg, fullRefresh = true)
      assert(wh.read(rel).columns.contains("extra"))
      // TYPE drift (same names, int v instead of long) is the same
      // mixed-parquet hazard and must refuse too, naming the column
      val typeDrift = widened.withColumn("v", col("v").cast("int"))
      val e2 = intercept[IllegalStateException] {
        mat.incremental(typeDrift, rel, cfg)
      }
      assert(e2.getMessage.contains("type drifted") &&
        e2.getMessage.contains("v("), e2.getMessage)
      mat.incremental(typeDrift, rel, cfg, fullRefresh = true)
      assert(wh.read(rel).schema("v").dataType.typeName == "integer")
    } finally spark.conf.unset("graft.microbatch.now")
  }

  test("a failed full refresh leaves the previous table intact") {
    val wh = freshWh(); val mat = new Materializer(wh)
    val rel = Relation("wh", "main", "t")
    spark.conf.set("graft.microbatch.now", "2024-01-02")
    try {
      mat.incremental(rows("2024-01-01" -> 1, "2024-01-02" -> 2), rel, cfg)
      // rebuild whose EVERY batch fails (corrupt source, partitioned so
      // pruning can't save any period)
      val src = Files.createTempDirectory("graft_mb_src2").toString
      rows("2024-01-01" -> 9, "2024-01-02" -> 9)
        .write.mode("overwrite").partitionBy("day").parquet(src)
      new java.io.File(src).listFiles().filter(_.getName.startsWith("day="))
        .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
        .foreach(f => Files.write(f.toPath, "garbage".getBytes))
      val poisoned = spark.read.schema("v LONG, day DATE").parquet(src)
      val e = intercept[IllegalStateException] {
        mat.incremental(poisoned, rel, cfg, fullRefresh = true)
      }
      assert(e.getMessage.contains("previous table is intact"))
      // the original data survives untouched
      assert(state(wh, rel) == Set(("2024-01-01", 1L), ("2024-01-02", 2L)))
    } finally spark.conf.unset("graft.microbatch.now")
  }

  test("explicit backfill window reprocesses periods older than the lookback") {
    val wh = freshWh(); val mat = new Materializer(wh)
    val rel = Relation("wh", "main", "t")
    spark.conf.set("graft.microbatch.now", "2024-01-10")
    try {
      mat.incremental(rows("2024-01-02" -> 2, "2024-01-10" -> 10), rel, cfg)
      // day-02 data changes, far outside lookback=1 from 01-10: a plain
      // incremental run must NOT touch it...
      mat.incremental(rows("2024-01-02" -> 99, "2024-01-10" -> 10), rel, cfg)
      assert(state(wh, rel) == Set(("2024-01-02", 2L), ("2024-01-10", 10L)))
      // ...the declared backfill window does (and leaves 01-10 alone)
      spark.conf.set("graft.microbatch.start", "2024-01-02")
      spark.conf.set("graft.microbatch.end", "2024-01-02")
      mat.incremental(rows("2024-01-02" -> 99, "2024-01-10" -> 77), rel, cfg)
      assert(state(wh, rel) == Set(("2024-01-02", 99L), ("2024-01-10", 10L)))
      // the window cannot combine with a full refresh (it would swap a
      // window-only table over the history)
      val e1 = intercept[IllegalArgumentException] {
        mat.incremental(rows("2024-01-02" -> 1), rel, cfg, fullRefresh = true)
      }
      assert(e1.getMessage.contains("cannot"))
      // an inverted window is a typo, not a silent no-op
      spark.conf.set("graft.microbatch.start", "2024-01-09")
      spark.conf.set("graft.microbatch.end", "2024-01-03")
      val e2 = intercept[IllegalArgumentException] {
        mat.incremental(rows("2024-01-02" -> 1), rel, cfg)
      }
      assert(e2.getMessage.contains("selects no periods"))
    } finally {
      spark.conf.unset("graft.microbatch.now")
      spark.conf.unset("graft.microbatch.start")
      spark.conf.unset("graft.microbatch.end")
    }
  }

  test("an all-empty refresh leaves a readable empty table; data later rebuilds from begin") {
    val wh = freshWh(); val mat = new Materializer(wh)
    val rel = Relation("wh", "main", "t")
    spark.conf.set("graft.microbatch.now", "2024-01-02")
    try {
      mat.incremental(rows("2024-01-01" -> 1), rel, cfg)
      // the source goes empty; full refresh → empty table, NOT a drop
      mat.incremental(rows("2024-01-01" -> 1).limit(0), rel, cfg,
        fullRefresh = true)
      assert(wh.exists(rel))
      assert(wh.read(rel).count() == 0)
      assert(wh.read(rel).columns.contains("day")) // schema survives
      // data returns: the shell (no period partitions) rebuilds from begin
      mat.incremental(rows("2024-01-01" -> 5, "2024-01-02" -> 6), rel, cfg)
      assert(state(wh, rel) == Set(("2024-01-01", 5L), ("2024-01-02", 6L)))
      // a FRESH target whose build is all-empty also leaves a shell
      val rel2 = Relation("wh", "main", "t2")
      mat.incremental(rows("2024-01-01" -> 1).limit(0), rel2, cfg)
      assert(wh.exists(rel2) && wh.read(rel2).count() == 0)
    } finally spark.conf.unset("graft.microbatch.now")
  }

  test("hour and month period arithmetic") {
    val wh = freshWh(); val mat = new Materializer(wh)
    val rel = Relation("wh", "main", "hourly")
    val hcfg = cfg.copy(eventTime = "ts", batchSize = "hour",
      begin = "2024-01-01 00:00:00")
    spark.conf.set("graft.microbatch.now", "2024-01-01 02:30:00")
    try {
      val df = Seq(("2024-01-01 00:10:00", 1L), ("2024-01-01 01:20:00", 2L),
        ("2024-01-01 02:05:00", 3L))
        .toDF("ts", "v").withColumn("ts", col("ts").cast("timestamp"))
      mat.incremental(df, rel, hcfg)
      val batches = wh.read(rel).select("event_batch").distinct()
        .as[String].collect().toSet
      assert(batches == Set("2024-01-01-00", "2024-01-01-01", "2024-01-01-02"))
    } finally spark.conf.unset("graft.microbatch.now")

    val mrel = Relation("wh", "main", "monthly")
    val mcfg = cfg.copy(batchSize = "month", begin = "2024-01-01", lookback = 2)
    spark.conf.set("graft.microbatch.now", "2024-04-15")
    try {
      mat.incremental(rows("2024-01-05" -> 1, "2024-02-05" -> 2,
        "2024-03-05" -> 3, "2024-04-05" -> 4), mrel, mcfg)
      // incremental with lookback=2 from April: Feb/Mar/Apr reprocess,
      // Jan (out of window) keeps its original row
      mat.incremental(rows("2024-01-05" -> 10, "2024-02-05" -> 20,
        "2024-04-05" -> 40), mrel, mcfg)
      assert(state(wh, mrel) == Set(("2024-01-05", 1L), ("2024-02-05", 20L),
        ("2024-04-05", 40L))) // March cleared: empty in its window
    } finally spark.conf.unset("graft.microbatch.now")
  }
}
