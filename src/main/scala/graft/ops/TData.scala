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
  /** `events.ts` is INT64 TIMESTAMP(NANOS) parquet, which Spark 4 refuses
    * outright ([PARQUET_TYPE_ILLEGAL]). Read it as raw nanos (legacy conf)
    * and floor-convert to a microsecond timestamp — the same truncation
    * DuckDB's `ts::TIMESTAMP` applies, so oracle outputs agree.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(s, d, "events")
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      // integer DIV — a double-typed `/ 1000` loses ulps at 1e18 nanos
      raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
