package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-provided testdata tables (FIXTURES.md §A).
  *
  * Every operator in `SparkEntry.queries` takes `(SparkSession, sfDir)` and
  * reads only these tables, so the driver's DuckDB oracle sees identical
  * inputs. Parquet scans are the engine's A1 "source scan" operator
  * (reference: /root/reference/models/aggr_repo_languages.sql:4 resolves a
  * declared source to a warehouse relation; here the warehouse is parquet).
  */
object TData {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  /** `events.ts` arrives in whatever physical shape the driver's writer
    * chose that round; normalize every shape to a session-timezone
    * TIMESTAMP so downstream epoch math (`cast("long")`) is legal and
    * agrees with DuckDB:
    *  - INT64 TIMESTAMP(NANOS): Spark 4 refuses outright
    *    ([PARQUET_TYPE_ILLEGAL]) — read as raw nanos (legacy conf) and
    *    floor-convert to microseconds, the same truncation DuckDB's
    *    `ts::TIMESTAMP` applies;
    *  - timestamp[us] WITHOUT timezone: Spark 4 infers TIMESTAMP_NTZ
    *    (`inferTimestampNTZ`), which cannot cast to BIGINT — cast to
    *    TIMESTAMP, which pins the naive wall-clock to the session
    *    timezone (UTC across this engine), exactly how DuckDB treats the
    *    same naive value when extracting epochs.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(s, d, "events")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      // integer DIV — a double-typed `/ 1000` loses ulps at 1e18 nanos
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
