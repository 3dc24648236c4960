package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Path-addressed parquet warehouse with atomic-swap writes.
  *
  * Replaces the reference's BigQuery dataset catalog: a relation is a
  * parquet directory `root/database/schema/identifier`. Writes follow the
  * reference's table materialization protocol
  * (`materialization_table_default` @125935): write to `__dbt_tmp`, swap
  * the old target to `__dbt_backup`, rename tmp into place, drop backup.
  * Each Hadoop `FileSystem.rename` is atomic on HDFS/POSIX, so readers
  * never observe a HALF-WRITTEN table; there is, however, a brief window
  * between the two renames where the path is absent — a concurrent reader
  * retries, and a crash inside the window is repaired by [[writeAtomic]]'s
  * restore-from-backup preamble on the next write. True multi-writer
  * atomicity needs a manifest pointer (object stores) or a transactional
  * table format; the protocol is isolated in [[writeAtomic]] for that swap.
  *
  * Scale: all data movement is executor-side `DataFrameWriter` parquet IO;
  * the driver only issues metadata renames. `partitionBy`/`clusterBy`
  * map to directory partitioning + `sortWithinPartitions` so downstream
  * reads get partition pruning and row-group skipping.
  */
final class Warehouse(val spark: SparkSession, val root: String) {

  private def fs = new Path(root).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  def path(rel: Relation): String = rel.pathUnder(root)
  def exists(rel: Relation): Boolean = fs.exists(new Path(path(rel)))
  def read(rel: Relation): DataFrame = spark.read.parquet(path(rel))
  def schemaOf(rel: Relation): StructType = read(rel).schema

  def drop(rel: Relation): Unit = {
    val p = new Path(path(rel))
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  /** Reference `rename_relation` @183544. */
  def rename(from: Relation, to: Relation): Unit = {
    fs.mkdirs(new Path(path(to)).getParent)
    if (!fs.rename(new Path(path(from)), new Path(path(to))))
      throw new IllegalStateException(s"rename ${from.fqName} -> ${to.fqName} failed")
  }

  /** Reference `truncate_relation` @181945: keep schema, remove rows. */
  def truncate(rel: Relation): Unit = {
    val df = read(rel)
    writeAtomic(df.limit(0), rel)
  }

  /** CTAS + atomic swap (`materialization_table_default` @125935).
    *
    * The dataframe may READ FROM `rel` itself (incremental/snapshot
    * rewrites): the plan materializes fully into the tmp dir before the
    * target is touched, so read-modify-write on one relation is safe.
    */
  /** Shuffle rows to their partition value before a partitioned write:
    * without it every upstream task writes a file into EVERY partition dir
    * it touches — tasks × partitions small files, the classic partitioned-
    * write explosion at scale. After alignment each partition value lands
    * in one task → one file. (A pathologically huge single partition would
    * want an extra salt column for multiple writers; that's the caller's
    * skew decision, not the default.)
    */
  private def partitionAligned(df: DataFrame, partitionCols: Seq[String]): DataFrame =
    if (partitionCols.isEmpty) df
    else df.repartition(partitionCols.map(df.col): _*)

  /** Recovery preamble shared by every write path: restore any partition
    * caught between the two swap renames of a crashed [[replacePartitions]]
    * (its data sits under `__dbt_pbackup` with no live dir), then clear
    * the backup area. Running this from [[writeAtomic]] and the other
    * writers too — not just the next partitioned merge — means a full
    * refresh can't leave a stale pbackup behind that would later
    * "restore" (resurrect) a partition the refresh legitimately dropped.
    * A failed restore must ABORT: dropping the backup would delete the
    * only surviving copy of that partition.
    */
  private def restorePartitionBackup(rel: Relation): Unit = {
    val backup = rel.suffixed("__dbt_pbackup")
    if (!exists(backup)) return
    // walk the backup tree: a backed-up partition dir (at any nesting
    // level of a multi-column layout) whose live counterpart vanished is
    // renamed back wholesale; if the live dir exists, recurse — a deeper
    // sub-partition may still be missing
    def walk(sub: String): Unit = {
      val src = if (sub.isEmpty) new Path(path(backup)) else new Path(path(backup), sub)
      fs.listStatus(src).foreach { st =>
        if (st.isDirectory && st.getPath.getName.contains("=")) {
          val rsub = if (sub.isEmpty) st.getPath.getName
                     else sub + "/" + st.getPath.getName
          val tgtDir = new Path(path(rel), rsub)
          if (!fs.exists(tgtDir)) {
            fs.mkdirs(tgtDir.getParent)
            if (!fs.rename(st.getPath, tgtDir))
              throw new IllegalStateException(
                s"partition restore $rsub -> ${rel.fqName} failed; " +
                  s"backup left at ${path(backup)}")
          } else walk(rsub)
        }
      }
    }
    walk("")
    drop(backup)
  }

  def writeAtomic(df: DataFrame, rel: Relation,
                  partitionCols: Seq[String] = Nil,
                  clusterCols: Seq[String] = Nil): Unit = {
    val tmp = rel.suffixed("__dbt_tmp")
    val backup = rel.suffixed("__dbt_backup")
    // crash recovery: a previous run that died between the two swap
    // renames leaves the data under __dbt_backup and no live target —
    // restore it before doing anything else (likewise any partition left
    // in pbackup by a crashed partitioned merge: the df may read `rel`)
    if (!exists(rel) && exists(backup)) rename(backup, rel)
    restorePartitionBackup(rel)
    drop(tmp)
    val aligned = partitionAligned(df, partitionCols)
    val clustered =
      if (clusterCols.nonEmpty)
        aligned.sortWithinPartitions(clusterCols.map(aligned.col): _*)
      else aligned
    val writer = clustered.write.mode("overwrite")
    val w2 = if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer
    w2.parquet(path(tmp))
    drop(backup)
    if (exists(rel)) rename(rel, backup)
    rename(tmp, rel)
    drop(backup)
  }

  /** Partition-scoped replacement: only the partitions present in `df` are
    * rewritten (reference `bq_insert_overwrite` dynamic mode @34992 /
    * `default__get_insert_overwrite_merge_sql` @90709). Maps directly to
    * Spark's dynamic partitionOverwriteMode — the exact Spark-native
    * equivalent, no full-table rewrite.
    */
  def overwritePartitions(df: DataFrame, rel: Relation,
                          partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "insert_overwrite requires partition_by")
    restorePartitionBackup(rel)
    partitionAligned(df, partitionCols).write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path(rel))
  }

  /** Append without touching existing files (merge `ON FALSE` append-only
    * path, reference `default__get_merge_sql` @89014 when no unique_key).
    */
  def append(df: DataFrame, rel: Relation, partitionCols: Seq[String] = Nil): Unit = {
    restorePartitionBackup(rel)
    val writer = partitionAligned(df, partitionCols).write.mode("append")
    val w2 = if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer
    w2.parquet(path(rel))
  }

  /** Reference `list_relations_without_caching` @189819 over one schema. */
  def listRelations(database: String, schema: String): Seq[Relation] = {
    val p = new Path(s"$root/$database/$schema")
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.filter(_.isDirectory)
      .map(st => Relation(database, schema, st.getPath.getName))
      .filterNot(r => r.identifier.endsWith("__dbt_tmp") ||
        r.identifier.endsWith("__dbt_backup"))
  }

  // ------------------------------------------------------------- views
  /** Durable view catalog (reference `create_view_as` @84061: views are
    * persistent catalog objects). A path-addressed warehouse has no
    * metastore, so a view IS its compiled definition: stored as a sibling
    * FILE `<identifier>.view.sql` (never mistaken for a table directory by
    * [[listRelations]]), readable by ANY later session or external engine
    * — not just the one that registered the temp view.
    */
  def saveViewDef(rel: Relation, compiledSql: String): Unit = {
    val p = new Path(path(rel) + ".view.sql")
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(compiledSql.getBytes("UTF-8")) finally out.close()
  }

  def readViewDef(rel: Relation): Option[String] = {
    val p = new Path(path(rel) + ".view.sql")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8"))
      finally in.close()
    }
  }

  /** Reconstruct a durable view as a DataFrame (compiled SQL references
    * warehouse paths, so it resolves in any session).
    */
  def readView(rel: Relation): Option[DataFrame] =
    readViewDef(rel).map(spark.sql)

  def dropView(rel: Relation): Unit = {
    val p = new Path(path(rel) + ".view.sql")
    if (fs.exists(p)) { fs.delete(p, false); () }
  }

  def listViews(database: String, schema: String): Seq[Relation] = {
    val p = new Path(s"$root/$database/$schema")
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.filter(st =>
        st.isFile && st.getPath.getName.endsWith(".view.sql"))
      .map(st => Relation(database, schema,
        st.getPath.getName.stripSuffix(".view.sql")))
  }

  /** Reference `create_schema` @161298 / `drop_schema` @162682 /
    * `check_schema_exists` @188106.
    */
  def createSchema(database: String, schema: String): Unit = {
    fs.mkdirs(new Path(s"$root/$database/$schema")); ()
  }
  def dropSchema(database: String, schema: String): Unit = {
    val p = new Path(s"$root/$database/$schema")
    if (fs.exists(p)) { fs.delete(p, true); () }
  }
  def schemaExists(database: String, schema: String): Boolean =
    fs.exists(new Path(s"$root/$database/$schema"))

  /** Catalog stats (reference `bigquery__get_catalog` @3102: per-table
    * row counts, byte sizes, partition info from information_schema; here
    * from parquet footers + filesystem). Pure metadata reads — the row
    * count comes from each file's footer record count, so NO Spark job
    * scans table data (the reference reads `__TABLES__` stats for the
    * same reason: a catalog listing must not cost a full scan per table).
    */
  def catalogInfo(database: String, schema: String)
      : Seq[(Relation, Long, Long, Seq[String])] =
    listRelations(database, schema).map { rel =>
      val p = new Path(path(rel))
      val summary = fs.getContentSummary(p)
      (rel, footerRowCount(p), summary.getLength, listPartitions(rel))
    }

  /** Sum of parquet footer record counts under a directory (driver-side
    * metadata IO only; footers are O(KB) regardless of file size).
    */
  private def footerRowCount(dir: Path): Long = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sparkContext.hadoopConfiguration
    val it = fs.listFiles(dir, true)
    var rows = 0L
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet")) {
        val rd = ParquetFileReader.open(HadoopInputFile.fromStatus(st, conf))
        try rows += rd.getRecordCount finally rd.close()
      }
    }
    rows
  }

  /** Row count of a relation (or one of its partition subtrees) from
    * parquet footers — driver-side metadata IO, no Spark job. Sizing
    * decisions (e.g. the snapshot sub-bucket count) read this instead of
    * running a count() scan.
    */
  def footerRows(rel: Relation, subdir: String = ""): Long = {
    val p = if (subdir.isEmpty) new Path(path(rel)) else new Path(path(rel), subdir)
    if (!fs.exists(p)) 0L else footerRowCount(p)
  }

  /** True when the relation directory holds flat (non-partition-dir)
    * parquet data files — i.e. it was written unpartitioned.
    */
  def hasFlatFiles(rel: Relation): Boolean = {
    val p = new Path(path(rel))
    fs.exists(p) && fs.listStatus(p).exists(st =>
      st.isFile && st.getPath.getName.endsWith(".parquet"))
  }

  /** Drop the partition directories whose (unescaped) value is in
    * `values` — the delete half of static insert_overwrite: listed
    * partitions are replaced even when the increment holds no rows for
    * them. Matches on the PARSED value (Spark %-escapes special chars
    * in partition dir names, e.g. `:` → `%3A`), so callers pass plain
    * rendered values.
    */
  def dropPartitions(rel: Relation, partitionCol: String,
                     values: Seq[String]): Unit = {
    val want = values.toSet
    listPartitions(rel).foreach { dir =>
      val eq = dir.indexOf('=')
      if (eq > 0 && dir.substring(0, eq) == partitionCol) {
        val v = Warehouse.unescapePathName(dir.substring(eq + 1))
        if (want.contains(v)) {
          fs.delete(new Path(path(rel), dir), true); ()
        }
      }
    }
  }

  /** Per-partition atomic replacement: materialize `df` (partitioned by
    * `pcol`) into a tmp relation FIRST, then swap each written partition
    * directory into the target behind a backup rename; `alsoDropValues`
    * partitions are removed even when `df` holds no rows for them (static
    * insert_overwrite's pinned list). Partition directories not written by
    * `df` are never opened — their files stay byte-identical, which is the
    * whole point at scale: a daily merge must not rewrite years of
    * untouched history. Crash safety mirrors [[writeAtomic]]: new data is
    * fully on disk before any target mutation, and a partition caught
    * between its two renames is restored from `__dbt_pbackup` by the
    * recovery preamble of the next write.
    */
  def replacePartitions(df: DataFrame, rel: Relation, pcols: Seq[String],
                        alsoDropValues: Seq[String] = Nil,
                        clusterCols: Seq[String] = Nil,
                        alsoDropPaths: Seq[String] = Nil): Unit = {
    require(pcols.nonEmpty, "replacePartitions requires partition columns")
    require(alsoDropValues.isEmpty || pcols.size == 1,
      "alsoDropValues (static insert_overwrite) is single-column")
    val tmp = rel.suffixed("__dbt_tmp")
    val backup = rel.suffixed("__dbt_pbackup")
    restorePartitionBackup(rel)
    drop(tmp)
    val aligned = partitionAligned(df, pcols)
    val clustered =
      if (clusterCols.nonEmpty)
        aligned.sortWithinPartitions(clusterCols.map(aligned.col): _*)
      else aligned
    clustered.write.mode("overwrite").partitionBy(pcols: _*).parquet(path(tmp))
    fs.mkdirs(new Path(path(backup)))
    // swap at LEAF granularity: with a multi-column layout only the
    // deepest written dirs move, so sibling sub-partitions survive
    val written = listPartitionPaths(tmp, pcols.length)
    written.foreach { dir =>
      val tgtDir = new Path(path(rel), dir)
      // the backup rename must be CHECKED: if it fails and tgtDir still
      // exists, renaming tmp onto an existing dir would nest it inside
      // (POSIX-fs Hadoop rename moves INTO an existing directory)
      val bdir = new Path(path(backup), dir)
      fs.mkdirs(bdir.getParent)
      if (fs.exists(tgtDir) && !fs.rename(tgtDir, bdir))
        throw new IllegalStateException(
          s"partition backup $dir of ${rel.fqName} failed")
      fs.mkdirs(tgtDir.getParent)
      if (!fs.rename(new Path(path(tmp), dir), tgtDir))
        throw new IllegalStateException(
          s"partition swap $dir -> ${rel.fqName} failed")
    }
    // pinned partitions with NO replacement rows: deletion is the
    // SEMANTIC intent (the increment is already safe on disk above, so
    // this is not the drop-then-append data-loss window). Values just
    // swapped in must not be dropped again.
    val writtenVals = written
      .map(d => Warehouse.unescapePathName(d.substring(d.indexOf('=') + 1)))
      .toSet
    val toDrop = alsoDropValues.filterNot(writtenVals.contains)
    if (toDrop.nonEmpty) dropPartitions(rel, pcols.head, toDrop)
    // leaf dirs the caller KNOWS hold no surviving rows (e.g. a snapshot
    // sub-bucket whose every current row closed): the payload wrote
    // nothing there, so the swap never touched them — drop explicitly,
    // unless this run did write a replacement
    alsoDropPaths.filterNot(written.contains).foreach { dir =>
      val p = new Path(path(rel), dir)
      if (fs.exists(p)) { fs.delete(p, true); () }
    }
    drop(backup)
    drop(tmp)
  }

  /** Small-file compaction: leaf partition dirs holding more than
    * `maxFiles` parquet files are rewritten as one file each through the
    * same backup-protected leaf swap the merge family uses; leaves under
    * the threshold are never opened. Incremental merges/appends
    * accumulate a file per run in hot leaves — at scale the periodic
    * compaction pass is what keeps scan task counts and footer overhead
    * bounded (the OPTIMIZE of transactional formats, expressed over
    * plain parquet). File discovery is driver-side metadata listing; only
    * crowded leaves cost a read+write, proportional to THEIR size alone.
    */
  def compactPartitions(rel: Relation, pcols: Seq[String],
                        maxFiles: Int = 8): Seq[String] = {
    require(pcols.nonEmpty, "compactPartitions requires partition columns")
    val crowded = listPartitionPaths(rel, pcols.length).filter { dir =>
      var c = 0
      val it = fs.listFiles(new Path(path(rel), dir), false)
      while (it.hasNext && c <= maxFiles) {
        if (it.next().getPath.getName.endsWith(".parquet")) c += 1
      }
      c > maxFiles
    }
    if (crowded.nonEmpty) {
      val payload = crowded.map { dir =>
        // leaf files carry no partition columns; reattach them from the
        // dir name (a null partition lands in Hive's default dir)
        val kvs = dir.split("/").toIndexedSeq.map { seg =>
          val i = seg.indexOf('=')
          (seg.substring(0, i), Warehouse.unescapePathName(seg.substring(i + 1)))
        }
        kvs.foldLeft(spark.read.parquet(path(rel) + "/" + dir)) {
          case (df, (k, v)) =>
            df.withColumn(k,
              if (v == "__HIVE_DEFAULT_PARTITION__")
                org.apache.spark.sql.functions.lit(null)
              else org.apache.spark.sql.functions.lit(v))
        }
      }.reduce(_ unionByName _)
      replacePartitions(payload, rel, pcols)
    }
    crowded
  }

  /** Partition directory names of a partitioned relation (reference
    * `get_partitions_metadata` @12518).
    */
  def listPartitions(rel: Relation): Seq[String] = {
    val p = new Path(path(rel))
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.contains("="))
  }

  /** Relative `k=v[/k2=v2…]` paths of the partition dirs exactly `depth`
    * levels below a relation root — the leaf dirs of a `depth`-column
    * partitioned layout.
    */
  def listPartitionPaths(rel: Relation, depth: Int): Seq[String] = {
    def go(p: Path, d: Int): Seq[String] =
      if (!fs.exists(p)) Nil
      else fs.listStatus(p).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.contains("="))
        .flatMap { st =>
          if (d == 1) Seq(st.getPath.getName)
          else go(st.getPath, d - 1).map(st.getPath.getName + "/" + _)
        }
    go(new Path(path(rel)), depth)
  }
}

object Warehouse {
  /** Inverse of Spark's partition-path escaping (Hive convention,
    * re-derived from the observed dir format): ONLY `%XX` sequences
    * decode. `URLDecoder` is wrong here — it maps '+' to space, so a
    * value containing a literal '+' never matches its own directory and
    * a value "a b" would wrongly match dir "name=a+b".
    */
  def unescapePathName(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val code =
          try Integer.parseInt(s.substring(i + 1, i + 3), 16)
          catch { case _: NumberFormatException => -1 }
        if (code >= 0) { sb.append(code.toChar); i += 3 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
