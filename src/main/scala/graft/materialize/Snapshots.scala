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
  * `dbt_valid_to` (NULL = current row).
  *
  * Scale: each run is two shuffles — source⨝current-rows on the unique key
  * for change detection, then the merge rewrite keyed on `dbt_scd_id`. The
  * history table is only ever APPENDED to logically; physically we rewrite
  * via the warehouse's atomic swap (no transactional format available).
  */
final class Snapshotter(wh: Warehouse) {

  private val META = Seq("dbt_scd_id", "dbt_updated_at", "dbt_valid_from", "dbt_valid_to")

  /** B17: surrogate key — md5 over pipe-joined key columns + updated_at. */
  private def scdId(keys: Seq[String], updatedAt: Column): Column =
    md5(concat_ws("|",
      keys.map(k => coalesce(col(k).cast("string"), lit(""))) :+
        coalesce(updatedAt.cast("string"), lit("")): _*))

  /** Validity/change columns for the `check` strategy need a transaction
    * time; the engine passes the wall clock, tests/oracles pin a literal.
    */
  def snapshot(source: DataFrame, rel: Relation, keys: Seq[String],
               strategy: SnapshotStrategy, now: Column = current_timestamp(),
               invalidateHardDeletes: Boolean = false): Unit = {
    val updatedAt: Column = strategy match {
      case SnapshotStrategy.Timestamp(c) => col(c)
      case SnapshotStrategy.Check(_) => now
    }
    if (!wh.exists(rel)) {
      // B12 build_snapshot_table: first run inserts everything as current
      val first = source
        .withColumn("dbt_updated_at", updatedAt)
        .withColumn("dbt_valid_from", updatedAt)
        .withColumn("dbt_valid_to", lit(null).cast("timestamp"))
        .withColumn("dbt_scd_id", scdId(keys, updatedAt))
      wh.writeAtomic(first, rel)
      return
    }

    val snapped = wh.read(rel)
    val current = snapped.filter(col("dbt_valid_to").isNull)
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
        updatedAtOver("s", strategy, now).as("dbt_updated_at"),
        updatedAtOver("s", strategy, now).as("dbt_valid_from"),
        lit(null).cast("timestamp").as("dbt_valid_to"),
        scdId(keys.map("s." + _), updatedAtOver("s", strategy, now)).as("dbt_scd_id")): _*)

    val updateScdIds = joined.filter(inSrc && inCur && rowChanged)
      .select(col("c.dbt_scd_id").as("dbt_scd_id"),
        updatedAtOver("s", strategy, now).as("new_valid_to"))
    val deleteScdIds =
      if (!invalidateHardDeletes) updateScdIds.limit(0)
      else joined.filter(inCur && !inSrc)
        .select(col("c.dbt_scd_id").as("dbt_scd_id"), now.as("new_valid_to"))
    val closing = updateScdIds.unionByName(deleteScdIds)

    // B16 merge: matched current rows get dbt_valid_to set; staging rows
    // are inserted. `closing` is usually small relative to history, but an
    // upstream backfill can touch most rows — so no forced broadcast hint:
    // AQE broadcasts at runtime when the actual size qualifies and falls
    // back to a shuffle join when it doesn't (a forced hint would OOM).
    val merged = snapped.alias("t")
      .join(closing.alias("u"),
        col("t.dbt_scd_id") === col("u.dbt_scd_id"), "left")
      .select(snapped.columns.toIndexedSeq.map {
        case "dbt_valid_to" =>
          when(col("t.dbt_valid_to").isNull && col("u.new_valid_to").isNotNull,
            col("u.new_valid_to")).otherwise(col("t.dbt_valid_to")).as("dbt_valid_to")
        case c => col(s"t.$c").as(c)
      }: _*)
      .unionByName(insertions.select(snapped.columns.toIndexedSeq.map(col): _*))

    wh.writeAtomic(merged, rel)
  }

  private def updatedAtOver(alias: String, strategy: SnapshotStrategy,
                            now: Column): Column = strategy match {
    case SnapshotStrategy.Timestamp(c) => col(s"$alias.$c")
    case SnapshotStrategy.Check(_) => now
  }
}
