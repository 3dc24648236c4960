package graft.run

import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** Date-range utilities for legacy date-sharded tables (SURVEY §2 B46/B47;
  * reference `dates_in_range` @149605, `partition_range` @151173,
  * `date_sharded_table` @11215): enumerate shard suffixes, then read the
  * union with `spark.read.parquet(paths: _*)`.
  */
object DateUtils {
  private val fmt = DateTimeFormatter.ofPattern("yyyyMMdd")

  def datesInRange(start: String, end: String): Seq[LocalDate] = {
    val s = LocalDate.parse(start, fmt)
    val e = LocalDate.parse(end, fmt)
    Iterator.iterate(s)(_.plusDays(1)).takeWhile(!_.isAfter(e)).toSeq
  }

  /** `events_20240101, events_20240102, …` shard names for a range. */
  def dateShardedTables(prefix: String, start: String, end: String): Seq[String] =
    datesInRange(start, end).map(d => s"$prefix${d.format(fmt)}")

  /** Parse a `start,end` partition_range spec (reference @151173). */
  def partitionRange(spec: String): (String, String) = {
    val parts = spec.split(",").map(_.trim)
    require(parts.length == 2, s"partition_range spec must be 'start,end': $spec")
    (parts(0), parts(1))
  }

  /** Expand a legacy `partitions` config into its date-decorator strings
    * (reference `partition_range` @151173 expands a `start,end` spec via
    * `dates_in_range` before `make_date_partitioned_table` loops). Plain
    * entries pass through; `start..end` entries expand to the inclusive
    * day range in `yyyyMMdd` form.
    */
  def expandPartitionDates(partitions: Seq[String]): Seq[String] =
    partitions.flatMap { p =>
      p.split("\\.\\.", 2) match {
        case Array(a, b) => datesInRange(a.trim, b.trim).map(_.format(fmt))
        case _ => Seq(p.trim)
      }
    }.distinct
}
