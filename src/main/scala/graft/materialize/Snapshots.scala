package graft.materialize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core._

/** SCD-2 snapshots (SURVEY §2.B B11–B17; reference
  * `materialization_snapshot_default` @108699, `snapshot_staging_table`
  * @102012, `build_snapshot_table` @105612, `default__snapshot_merge_sql`
  * @97630).
  *
  * Meta columns: `dbt_scd_id` (md5 surrogate of key+updated_at,
  * `snapshot_hash_arguments` @115609), `dbt_updated_at`, `dbt_valid_from`,
  * `dbt_valid_to` (NULL = current row), plus the engine-internal partition
  * column [[Snapshotter.BUCKET]].
  *
  * Scale: the history table is PARTITIONED by a derived bucket —
  * `current` for open rows, `yyyy-MM` of `dbt_valid_to` for closed rows.
  * A run reads ONLY the current partition for change detection (partition
  * pruning; closed history never enters the join), then swaps in the new
  * current slice plus the few month-buckets that received closures this
  * run via [[Warehouse.replacePartitions]]. Closed buckets from earlier
  * months are never opened — their files stay byte-identical, so a daily
  * snapshot over years of history rewrites only the live entity set and
  * at most a month of closures, not the whole table (the same economics
  * as the reference's MERGE, which touches only matched rows).
  */
final class Snapshotter(wh: Warehouse) {

  import Snapshotter.{BUCKET, CURRENT}

  private val META = Seq("dbt_scd_id", "dbt_updated_at", "dbt_valid_from", "dbt_valid_to")

  /** B17: surrogate key — md5 over pipe-joined key columns + updated_at. */
  private def scdId(keys: Seq[String], updatedAt: Column): Column =
    md5(concat_ws("|",
      keys.map(k => coalesce(col(k).cast("string"), lit(""))) :+
        coalesce(updatedAt.cast("string"), lit("")): _*))

  /** Partition bucket of a row given its validity end: open rows live in
    * the `current` partition, closed rows in the month of their close.
    * Month granularity bounds the rewrite amplification of a run (≤ the
    * closures of the touched months) while keeping the partition count
    * low (12/year — no small-file explosion over decades of history).
    */
  private def bucketOf(validTo: Column): Column =
    when(validTo.isNull, lit(CURRENT))
      .otherwise(date_format(validTo.cast("date"), "yyyy-MM"))

  /** Read a snapshot relation WITHOUT the internal bucket column — the
    * user-visible schema is source columns + the four dbt meta columns.
    */
  def read(rel: Relation): DataFrame = wh.read(rel).drop(BUCKET)

  /** Validity/change columns for the `check` strategy need a transaction
    * time; the engine passes the wall clock, tests/oracles pin a literal.
    */
  def snapshot(source: DataFrame, rel: Relation, keys: Seq[String],
               strategy: SnapshotStrategy, now: Column = current_timestamp(),
               invalidateHardDeletes: Boolean = false): Unit = {
    // Pin the transaction time to a literal: the run below executes more
    // than one Spark action (bucket discovery, then the write), and a raw
    // current_timestamp() would re-evaluate per action — closings and
    // insertions must carry the SAME stamp, as in dbt's run-start time.
    val nowLit: Column = {
      val v = source.sparkSession.range(1)
        .select(now.cast("timestamp")).head().getTimestamp(0)
      lit(v)
    }
    val updatedAt: Column = strategy match {
      case SnapshotStrategy.Timestamp(c) => col(c)
      case SnapshotStrategy.Check(_) => nowLit
    }
    if (!wh.exists(rel)) {
      // B12 build_snapshot_table: first run inserts everything as current
      val first = source
        .withColumn("dbt_updated_at", updatedAt)
        .withColumn("dbt_valid_from", updatedAt)
        .withColumn("dbt_valid_to", lit(null).cast("timestamp"))
        .withColumn("dbt_scd_id", scdId(keys, updatedAt))
        .withColumn(BUCKET, lit(CURRENT))
      wh.writeAtomic(first, rel, partitionCols = Seq(BUCKET))
      return
    }

    val all = wh.read(rel)
    // change detection reads ONLY the current partition (pruned scan) —
    // closed history never enters the join
    val current = all.filter(col(BUCKET) === CURRENT).drop(BUCKET)
    // presence markers, NOT key-nullability: with dbt's plain `=` key join
    // (snapshot_staging_table @102012 joins ON dbt_unique_key =, where a
    // NULL key matches NOTHING), a NULL-key source row must still be seen
    // as present-in-source — it INSERTS every run (dbt's documented
    // behavior), and a NULL-key current row counts as hard-deleted. A
    // null-safe `<=>` here would instead cross-match every NULL-key row
    // on both sides (m×n explosion) — same rationale as
    // Materializer.mergeUpdateSubset.
    val src = source.withColumn("__in_src", lit(1)).alias("s")
    val cur = current.withColumn("__in_cur", lit(1)).alias("c")
    val keyEq = keys.map(k => col(s"s.$k") === col(s"c.$k")).reduce(_ && _)

    // B14/B15 row_changed predicate
    val rowChanged: Column = strategy match {
      case SnapshotStrategy.Timestamp(c) =>
        col(s"c.dbt_valid_from") < col(s"s.$c")
      case SnapshotStrategy.Check(cols0) =>
        val dataCols = source.columns.filterNot(keys.contains)
        val checked = cols0.getOrElse(dataCols.toSeq)
        checked.map(c => !(col(s"s.$c") <=> col(s"c.$c"))).reduce(_ || _)
    }

    val joined = src.join(cur, keyEq, "full_outer")
    val inSrc = col("s.__in_src").isNotNull
    val inCur = col("c.__in_cur").isNotNull

    val srcCols = source.columns.toIndexedSeq
    // B13 staging: insertions (new key or changed row) + updates (close the
    // old version) + optional deletes
    val insertions = joined
      .filter(inSrc && (!inCur || rowChanged))
      .select(srcCols.map(c => col(s"s.$c").as(c)) ++ Seq(
        updatedAtOver("s", strategy, nowLit).as("dbt_updated_at"),
        updatedAtOver("s", strategy, nowLit).as("dbt_valid_from"),
        lit(null).cast("timestamp").as("dbt_valid_to"),
        scdId(keys.map("s." + _), updatedAtOver("s", strategy, nowLit)).as("dbt_scd_id")): _*)

    val updateScdIds = joined.filter(inSrc && inCur && rowChanged)
      .select(col("c.dbt_scd_id").as("dbt_scd_id"),
        updatedAtOver("s", strategy, nowLit).as("new_valid_to"))
    val deleteScdIds =
      if (!invalidateHardDeletes) updateScdIds.limit(0)
      else joined.filter(inCur && !inSrc)
        .select(col("c.dbt_scd_id").as("dbt_scd_id"), nowLit.as("new_valid_to"))
    // small frame (scd_id + close time of this run's changes): persisted so
    // bucket discovery and the write see ONE evaluation of the detection
    // join, and the collect below doesn't re-run it
    val closing = updateScdIds.unionByName(deleteScdIds)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    try {
      // B16 merge, partition-scoped: current rows get dbt_valid_to set
      // where matched (moving them to a closed bucket); staging rows are
      // inserted as current. `closing` is usually small relative to the
      // current slice — no forced broadcast hint: AQE broadcasts at
      // runtime when the actual size qualifies (a forced hint would OOM
      // on an upstream backfill that touches most rows).
      val rewrittenCurrent = current.alias("t")
        .join(closing.alias("u"),
          col("t.dbt_scd_id") === col("u.dbt_scd_id"), "left")
        .select(current.columns.toIndexedSeq.map {
          case "dbt_valid_to" =>
            // t.dbt_valid_to is NULL on every current row; a match closes it
            col("u.new_valid_to").as("dbt_valid_to")
          case c => col(s"t.$c").as(c)
        }: _*)
        .unionByName(insertions.select(current.columns.toIndexedSeq.map(col): _*))
        .withColumn(BUCKET, bucketOf(col("dbt_valid_to")))

      // the month-buckets receiving closures this run — a control-plane
      // scalar bounded by the distinct close months (1 for a steady daily
      // run; a handful on a backfill)
      val closedBuckets = closing
        .select(bucketOf(col("new_valid_to")).as(BUCKET))
        .distinct().collect().map(_.getString(0)).toIndexedSeq

      // a replaced closed bucket must carry its EXISTING rows too (the
      // partition swap replaces the whole directory); untouched buckets
      // never appear in the payload and their files stay byte-identical
      val payload =
        if (closedBuckets.isEmpty) rewrittenCurrent
        else rewrittenCurrent.unionByName(
          all.filter(col(BUCKET).isin(closedBuckets: _*))
            .select(rewrittenCurrent.columns.toIndexedSeq.map(col): _*))

      // alsoDropValues pins `current`: a run that closes every row and
      // inserts nothing must still drop the stale current partition
      wh.replacePartitions(payload, rel, Seq(BUCKET), alsoDropValues = Seq(CURRENT))
    } finally {
      closing.unpersist(); ()
    }
  }

  private def updatedAtOver(alias: String, strategy: SnapshotStrategy,
                            now: Column): Column = strategy match {
    case SnapshotStrategy.Timestamp(c) => col(s"$alias.$c")
    case SnapshotStrategy.Check(_) => now
  }
}

object Snapshotter {
  /** Engine-internal partition column of snapshot relations. */
  val BUCKET = "graft_scd_bucket"
  /** Bucket value of open rows (`dbt_valid_to IS NULL`). */
  val CURRENT = "current"
}
