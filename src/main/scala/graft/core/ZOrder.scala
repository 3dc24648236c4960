package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multi-dimensional write clustering via Morton (Z-order) curves — the
  * layout lever behind Delta's `OPTIMIZE ZORDER BY` and Iceberg's sort
  * orders, built here from plain Spark expressions.
  *
  * Why it exists: [[FileStats]] sidecar skipping prunes files by
  * per-column min/max ranges, but ranges are only TIGHT for columns the
  * data is physically ordered by. A linear sort gives one column tight
  * ranges and leaves every other column's range spanning the whole
  * domain — a filter on the second column skips nothing. Interleaving
  * the bits of k quantized column ranks into one sort key makes files
  * contiguous REGIONS of the k-dim space, so every z-ordered column gets
  * usefully narrow ranges: at 100 TB a box query on (user, time) or
  * (partkey, suppkey) plans a handful of files instead of the table.
  *
  * Mechanics: each column is linearly quantized to a `bits`-wide rank
  * between its global min and max (one tiny control-plane agg — 2·k
  * doubles — over the input; the same extra pass Delta's OPTIMIZE pays),
  * ranks are bit-interleaved into a single long (`bits·k ≤ 62`), and the
  * frame is range-repartitioned + sorted within partitions on that key.
  * Everything is codegen'd `functions._` arithmetic — no UDF, no custom
  * expression — and the helper column is dropped before the write.
  *
  * Deliberate scope: supported dimension types are numeric, date and
  * timestamp. Linear quantization (not equi-depth quantiles) means a
  * heavy outlier compresses the useful rank range — degraded locality,
  * never wrong results; layout can NEVER change query results, only file
  * ranges (spec-pinned). Nulls rank 0, sorting with the low corner.
  */
object ZOrder {

  /** Bits per dimension: 16 for ≤3 dims, shrinking so k·bits ≤ 62 (the
    * interleaved key must stay a positive signed long).
    */
  def bitsFor(k: Int): Int =
    math.max(1, math.min(16, 62 / math.max(k, 1)))

  /** Numeric view of a dimension column for bounds + quantization.
    * Timestamps become epoch seconds (fractional), dates midnight epoch
    * seconds — both order-preserving.
    */
  private def numeric(c: Column, dt: DataType): Column = dt match {
    case DateType => c.cast(TimestampType).cast(DoubleType)
    case _: NumericType | TimestampType | TimestampNTZType =>
      c.cast(DoubleType)
    case other =>
      throw new IllegalArgumentException(
        s"z-order supports numeric/date/timestamp dimensions, not $other")
  }

  /** The interleaved z-value for pre-computed per-dimension bounds.
    * `dims` pairs each NUMERIC dimension column with its (min, max); a
    * degenerate range (min == max, NaN, or all-null) contributes rank 0.
    */
  def zvalue(dims: Seq[(Column, (Double, Double))], bits: Int): Column = {
    val k = dims.size
    require(k >= 1, "z-order needs at least one dimension")
    require(bits * k <= 62, s"$k dims × $bits bits overflows a long")
    val maxRank = (1L << bits) - 1
    val ranks: Seq[Column] = dims.map { case (c, (mn, mx)) =>
      if (mn.isNaN || mx.isNaN || !(mx > mn)) lit(0L)
      else {
        val scale = maxRank.toDouble / (mx - mn)
        val r = floor((c - lit(mn)) * lit(scale)).cast(LongType)
        when(c.isNull, lit(0L))
          .otherwise(least(greatest(r, lit(0L)), lit(maxRank)))
      }
    }
    val terms = for {
      (r, j) <- ranks.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(r, i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Reference interleave for spec cross-checks: the same mapping as
    * [[zvalue]] computed driver-side on already-quantized ranks.
    */
  private[graft] def interleaveRef(ranks: Seq[Long], bits: Int): Long = {
    val k = ranks.size
    var z = 0L
    for (j <- 0 until k; i <- 0 until bits)
      z |= ((ranks(j) >> i) & 1L) << (i * k + j)
    z
  }

  /** Lay `df` out along the z-curve of `cols`: one bounds agg, then a
    * range repartition and a partition-local sort on the z-value
    * (dropped before return). Rows are untouched — only their file
    * placement changes. With `numPartitions` unset the range exchange is
    * left AQE-coalescible, so the write-task count adapts to the DATA
    * SIZE (advisoryPartitionSizeInBytes) instead of a constant tuned for
    * one scale — a fixed count under-splits a 100 TB layout and shreds a
    * 10 MB one into empty files.
    */
  def layout(df: DataFrame, cols: Seq[String],
             numPartitions: Option[Int] = None): DataFrame = {
    val dims = dimsWithBounds(df, cols)
    val zc = "__graft_zvalue"
    val zdf = df.withColumn(zc, zvalue(dims, bitsFor(cols.size)))
    numPartitions.map(n => zdf.repartitionByRange(math.max(1, n), col(zc)))
      .getOrElse(zdf.repartitionByRange(col(zc)))
      .sortWithinPartitions(zc)
      .drop(zc)
  }

  /** Partition-local variant for directory-partitioned writes: rows are
    * already aligned to their partition dirs, so only the within-dir
    * order changes (row-group-level skipping inside each partition).
    */
  def sortOnly(df: DataFrame, cols: Seq[String],
               onlyWhen: Option[Column] = None): DataFrame = {
    // scoped layout (`onlyWhen`): bounds quantize over the rows that GET
    // the curve; excluded rows take a NULL key and group at the low end
    // untouched — the snapshot writer uses this to z-order closed history
    // while the hot current slice skips the layout work entirely
    val dims = dimsWithBounds(onlyWhen.map(df.filter).getOrElse(df), cols)
    val zc = "__graft_zvalue"
    val zv = zvalue(dims, bitsFor(cols.size))
    df.withColumn(zc, onlyWhen.map(p => when(p, zv)).getOrElse(zv))
      .sortWithinPartitions(zc)
      .drop(zc)
  }

  /** One control-plane agg for all dimension bounds (2·k doubles). */
  private def dimsWithBounds(df: DataFrame,
                             cols: Seq[String]): Seq[(Column, (Double, Double))] = {
    require(cols.nonEmpty, "z-order needs at least one dimension")
    val nums = cols.map(n => numeric(df.col(n), df.schema(n).dataType))
    val aggs = nums.flatMap(c => Seq(min(c), max(c)))
    val row = df.agg(aggs.head, aggs.drop(1): _*).head()
    nums.zipWithIndex.map { case (c, j) =>
      val mn = if (row.isNullAt(2 * j)) Double.NaN else row.getDouble(2 * j)
      val mx = if (row.isNullAt(2 * j + 1)) Double.NaN else row.getDouble(2 * j + 1)
      (c, (mn, mx))
    }
  }
}
