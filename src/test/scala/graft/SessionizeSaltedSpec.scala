package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Events

/** The skew-salted two-level sessionizer must be row-identical to the
  * plain single-window sessionizer — on real event data and on crafted
  * pathologies: sessions straddling chunk boundaries, a single session
  * chaining across MANY chunks (every intermediate chunk fully merged),
  * and a mega-user whose events would otherwise sort in one partition.
  */
class SessionizeSaltedSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def canon(df: DataFrame): Seq[String] =
    df.orderBy("user_id", "session_id").collect().map(_.toString).toSeq

  /** Plain sessionizer generalized to any event frame (same shape the
    * production [[Events.sessionize]] builds over the events table).
    */
  private def plain(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    ev.withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1
        ).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        unix_millis(min(col("ts"))).as("session_start_ms"),
        (sum(floor(col("value") * 100 + 0.5).cast("long")) / 100.0)
          .as("sum_value"))
  }

  private def mkEvents(rows: Seq[(String, Long, Long)]): DataFrame = {
    // (user, event_id, epoch_second)
    val s = spark
    import s.implicits._
    rows.toDF("user_id", "event_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withColumn("value", (col("event_id") % 7).cast("double") / 3.0)
      .drop("sec")
  }

  test("salted sessionize equals plain sessionize on the events table") {
    val d = "/root/testdata/sf0.001"
    assert(canon(Events.sessionizeSalted(spark, d)) ==
      canon(Events.sessionize(spark, d)))
  }

  test("sessions straddling chunk boundaries merge back") {
    // chunk = 1 hour; events 10 min apart crossing two boundaries, plus
    // a genuinely new session later in the second chunk
    val ev = mkEvents(Seq(
      ("u1", 1L, 3000L), ("u1", 2L, 3600L), ("u1", 3L, 4200L), // straddle @3600
      ("u1", 4L, 7100L), ("u1", 5L, 7300L),                    // straddle @7200
      ("u1", 6L, 11000L),                                      // new session
      ("u2", 7L, 3599L), ("u2", 8L, 3601L)))                   // 2 s across bound
    val salted = Events.sessionizeSaltedOver(ev, chunkSeconds = 3600)
    assert(canon(salted) == canon(plain(ev)))
    // structure check: u1 = sessions {1,2,3,4,5} then {6}; u2 = one session
    val u2 = salted.filter(col("user_id") === "u2").collect()
    assert(u2.length == 1 && u2.head.getAs[Long]("n_events") == 2L)
  }

  test("one session chaining across many chunks (full-merge chain)") {
    // 30 events 20 min apart: ~10 hours inside ONE session, spanning 10+
    // hourly chunks — every intermediate chunk is single-session and
    // fully merged, the prefix sum must carry the id through the chain
    val ev = mkEvents((0 until 30).map(i => ("u1", i.toLong, 1000L + i * 1200L)))
    val salted = Events.sessionizeSaltedOver(ev, chunkSeconds = 3600)
    assert(canon(salted) == canon(plain(ev)))
    val rows = salted.collect()
    assert(rows.length == 1, s"one chained session expected, got ${rows.length}")
    assert(rows.head.getAs[Long]("n_events") == 30L)
  }

  test("mega-user skew: many sessions, small chunks, ids stay consecutive") {
    // one user, 2000 events in bursts of 4 (5 min apart) separated by
    // 2-hour gaps → 500 sessions spread over many chunks; plus a second
    // normal user as a control
    val bursts = (0 until 500).flatMap { b =>
      (0 until 4).map { i =>
        ("mega", (b * 4 + i).toLong, b * 7200L + i * 300L)
      }
    } ++ Seq(("tiny", 9000L, 100L), ("tiny", 9001L, 200L))
    val ev = mkEvents(bursts)
    val salted = Events.sessionizeSaltedOver(ev, chunkSeconds = 3600)
    assert(canon(salted) == canon(plain(ev)))
    val mega = salted.filter(col("user_id") === "mega")
      .select("session_id").collect().map(_.getLong(0)).sorted
    assert(mega.length == 500 && mega.head == 1L && mega.last == 500L,
      s"session ids must stay consecutive 1..500, got ${mega.take(5).toSeq}…${mega.takeRight(2).toSeq}")
  }
}
