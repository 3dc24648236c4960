package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Events, TData}
import graft.streaming.StreamingJobs

/** Streaming results must equal their batch counterparts on a finite
  * source — one logic definition, two execution modes.
  */
class StreamingSpec extends AnyFunSuite {
  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** readStream needs a directory; stage the single events parquet into one. */
  lazy val streamDir: String = {
    val dir = Files.createTempDirectory("graft_stream")
    Files.copy(Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  test("streaming hourly windows equal the batch tumbling-window result") {
    val stream = StreamingJobs.hourlyWindows(
      StreamingJobs.readEvents(spark, streamDir))
    val got = StreamingJobs.runToMemory(spark, stream, "hourly_out",
        OutputMode.Complete())
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val want = Events.hourlyWindows(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == want)
  }

  test("stateful user stats equal the batch per-user aggregate") {
    val stream = StreamingJobs.userRunningStats(spark,
      StreamingJobs.readEvents(spark, streamDir))
    val q = stream.toDF().writeStream.outputMode("update")
      .format("memory").queryName("user_stats").start()
    try q.processAllAvailable() finally q.stop()
    // update mode: keep the LAST emitted row per user
    val got = spark.table("user_stats")
      .groupBy("user_id").agg(max("n_events").as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = TData.events(spark, sf).groupBy("user_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
  }
}
