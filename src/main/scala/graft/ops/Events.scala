package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table (batch forms; the
  * Structured Streaming variants live in graft.streaming and share the same
  * transformation logic).
  *
  * Timestamp policy: the parquet `ts` is nanosecond-precision; Spark reads
  * it at microseconds, DuckDB at nanoseconds — so every query OUTPUT
  * canonicalizes to epoch milliseconds (`unix_millis` / `epoch_ms`), where
  * both truncations agree.
  */
object Events {
  import TData._

  /** Semi-structured extraction: pull the numeric `k` out of the JSON
    * `props` string with a shared-dialect regex (offline-safe in both
    * engines), aggregate per event type.
    */
  def propsExtract(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("k", regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1)
        .cast("int"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"),
        round(avg(col("k")), 4).as("avg_k"),
        round(sum(col("value")), 2).as("sum_value"))

  val propsExtractSql: String =
    """SELECT event_type,
      |  count(k) AS n_with_k,
      |  round(avg(k), 4) AS avg_k,
      |  round(sum(value), 2) AS sum_value
      |FROM (SELECT event_type, value,
      |        TRY_CAST(nullif(regexp_extract(props, '"k":\s*(\d+)', 1), '') AS INT) AS k
      |      FROM events)
      |GROUP BY event_type""".stripMargin

  /** Sessionization: per-user 30-minute-gap sessions via lag + cumulative
    * flag sum — one shuffle on user_id, then two window passes over the same
    * partitioning (Catalyst reuses the exchange). The same algorithm scales
    * to 100 TB because state is per-user-partition, never global.
    */
  def sessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1
        ).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        unix_millis(min(col("ts"))).as("session_start_ms"),
        // Exact-cents quantization BEFORE the sum: IEEE double addition is
        // non-associative, so Spark's partial-agg order vs DuckDB's scan
        // order can flip a `.xx5` rounding tie. Summing exact integers is
        // order-independent; /100.0 of the same int64 is the same double
        // in both engines. floor(x+0.5) rather than round(): the same
        // double maps to the same integer in every engine, while round()
        // splits `.5`-repr ties between Spark's HALF_UP-on-decimal and
        // DuckDB's binary rounding.
        (sum(floor(col("value") * 100 + 0.5).cast("long")) / 100.0)
          .as("sum_value"))
  }

  // session_id MUST be cast to BIGINT: DuckDB's sum(int) returns HUGEINT
  // (int128), and a dtype-sensitive comparator renders HUGEINT as float
  // ("1.0") vs Spark's int64 ("1") — identical values, different hash.
  // This was the only HUGEINT output column in the whole battery and the
  // cause of two rounds of e_sessionize hash FAILs.
  val sessionizeSql: String =
    """SELECT user_id, session_id, count(*) AS n_events,
      |  epoch_ms(min(ts)::TIMESTAMP) AS session_start_ms,
      |  sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_value
      |FROM (
      |  SELECT user_id, ts, value,
      |    CAST(sum(new_session) OVER (PARTITION BY user_id
      |      ORDER BY ts ASC, event_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS session_id
      |  FROM (
      |    SELECT user_id, event_id, ts, value,
      |      CASE WHEN prev_ts IS NULL
      |             OR date_diff('second', prev_ts, ts) > 1800
      |           THEN 1 ELSE 0 END AS new_session
      |    FROM (
      |      SELECT user_id, event_id, ts, value,
      |        lag(ts) OVER (PARTITION BY user_id
      |                      ORDER BY ts ASC, event_id ASC) AS prev_ts
      |      FROM events)))
      |GROUP BY user_id, session_id""".stripMargin

  /** Skew-salted two-level sessionization — the SCALE.md mitigation for
    * the pathological-key case (one user with 10^9 events), previously
    * documented but not implemented. The plain [[sessionize]] sorts each
    * user's ENTIRE history in one window partition; a mega-user makes
    * that partition a spilling straggler. Here the per-event work is
    * partitioned by `(user, time-chunk)` — the salt is the chunk index,
    * so a user's events spread across `timespan / chunkSeconds`
    * partitions — and sessions are stitched across chunk boundaries with
    * a second, SUMMARY-LEVEL pass whose per-user row count is the chunk
    * count (bounded by the time range, never by event volume):
    *
    *  1. local sessionize inside each `(user, chunk)` window;
    *  2. per-chunk summary (first/last ts, #local sessions);
    *  3. per-user prefix scan over summaries: a chunk whose first event
    *     is within `gap` of the previous chunk's last event MERGES its
    *     first local session backward; `cumBefore` = running
    *     Σ(n_sessions − merged) numbers the global sessions;
    *  4. join the summary back on `(user, chunk)` (skew-free: the salt
    *     is in the join key) — global id = cumBefore + local − merged.
    *
    * Merge chains (a session spanning many chunks) resolve because a
    * fully-merged single-session chunk contributes 0 new sessions to the
    * prefix sum. Result is row-identical to [[sessionize]] — the oracle
    * entry reuses the same SQL — while the widest window partition holds
    * one chunk of one user, not one user's lifetime.
    */
  def sessionizeSalted(s: SparkSession, d: String): DataFrame =
    sessionizeSaltedOver(events(s, d))

  /** @param chunkSeconds salt granularity — large vs the gap (so few
    *                      sessions straddle bounds) but small vs a mega
    *                      user's history (default: 1 day against a
    *                      30-minute gap)
    */
  def sessionizeSaltedOver(ev: DataFrame, chunkSeconds: Long = 86400,
                           gapSeconds: Long = 1800): DataFrame = {
    val tsec = col("ts").cast("long")
    val withChunk = ev.withColumn("chunk",
      floor(tsec / chunkSeconds).cast("long"))
    val byChunk = Window.partitionBy(col("user_id"), col("chunk"))
      .orderBy(col("ts").asc, col("event_id").asc)
    // level 1: sessionize inside each (user, chunk) salt partition
    val local = withChunk
      .withColumn("prev_ts", lag(col("ts"), 1).over(byChunk))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > gapSeconds, 1
        ).otherwise(0))
      .withColumn("local_sid", sum(col("new_session")).over(
        byChunk.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // level 2: per-chunk summaries — one row per (user, chunk), so the
    // per-user window below scales with the TIME RANGE, not event count
    val summary = local.groupBy(col("user_id"), col("chunk"))
      .agg(min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"),
        max(col("local_sid")).as("n_sessions"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("chunk").asc)
    val stitched = summary
      .withColumn("prev_last_ts", lag(col("last_ts"), 1).over(byUser))
      .withColumn("merged",
        when(col("prev_last_ts").isNotNull &&
          col("first_ts").cast("long") - col("prev_last_ts").cast("long")
            <= gapSeconds, 1L).otherwise(0L))
      .withColumn("cum_before",
        coalesce(sum(col("n_sessions") - col("merged")).over(
          byUser.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("user_id"), col("chunk"), col("cum_before"), col("merged"))
    local
      .join(stitched, Seq("user_id", "chunk"))
      .withColumn("session_id",
        col("cum_before") + col("local_sid") - col("merged"))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        unix_millis(min(col("ts"))).as("session_start_ms"),
        // same exact-cents quantization as [[sessionize]] (see there)
        (sum(floor(col("value") * 100 + 0.5).cast("long")) / 100.0)
          .as("sum_value"))
  }

  /** As-of join, Spark-first: "for each purchase, the value of the user's
    * latest click at-or-before it". Instead of a custom physical operator,
    * union both sides tagged and carry the click value forward with an
    * `ignoreNulls` last() window — ONE shuffle on (user), linear scan per
    * partition; the same plan an ASOF-JOIN strategy would produce. At
    * equal timestamps the click sorts first (matches ASOF `>=`).
    */
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("value"), col("event_type"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc,
        when(col("event_type") === "click", 0).otherwise(1).asc,
        col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("last_click_value",
        last(when(col("event_type") === "click", col("value")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("p_ts_ms"), col("last_click_value"))
  }

  val asofJoinSql: String =
    """WITH purchases AS (SELECT event_id, user_id, ts FROM events
      |                   WHERE event_type = 'purchase'),
      |     clicks AS (SELECT user_id, ts, value FROM events
      |                WHERE event_type = 'click')
      |SELECT p.event_id, p.user_id, epoch_ms(p.ts::TIMESTAMP) AS p_ts_ms,
      |       c.value AS last_click_value
      |FROM purchases p ASOF LEFT JOIN clicks c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin

  /** Tumbling-window aggregate (batch form of the streaming windowed agg):
    * 1-hour epoch-aligned windows per event type.
    */
  def hourlyWindows(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(unix_millis(col("w.start")).as("window_start_ms"),
        col("event_type"), col("n_events"), col("sum_value"))

  val hourlyWindowsSql: String =
    """SELECT epoch_ms(date_trunc('hour', ts)::TIMESTAMP) AS window_start_ms,
      |  event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
      |FROM events
      |GROUP BY 1, 2""".stripMargin

  /** KEYLESS interval join, bucketed: count events inside each of the 10
    * busiest hours' ±30-minute-extended windows. Without an equi key a
    * range join plans as a nested-loop (every event × every window —
    * O(N·W), the classic Spark interval-join trap); instead each window
    * EXPLODES into the hour buckets it spans (≤3 here) and events join
    * their single hour bucket — an equi-join on bucket with the range
    * predicate as a post-filter. An event lives in exactly one bucket,
    * so no dedup pass is needed. At 100 TB: shuffle keyed on
    * (bucket) — or broadcast of the window table when it is small, as
    * here — never a cartesian; bucket granularity trades fan-out
    * (windows × buckets spanned) against filter selectivity exactly like
    * any spatial grid join. PlanSpec pins the no-nested-loop shape.
    */
  def intervalJoin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("event_id"), unix_millis(col("ts")).as("ms"))
    // windows: the 10 busiest hours, extended ±30 min (overlapping,
    // keyless); deterministic tiebreak on the hour
    val windows = ev
      .groupBy(floor(col("ms") / 3600000L).as("hr"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("hr").asc).limit(10)
      .select((col("hr") * 3600000L - 1800000L).as("w_lo"),
        (col("hr") * 3600000L + 5400000L).as("w_hi"))
    val wBuckets = windows.select(col("w_lo"), col("w_hi"),
      explode(expr(
        "sequence(CAST(floor(w_lo / 3600000) AS BIGINT), " +
          "CAST(floor((w_hi - 1) / 3600000) AS BIGINT))")).as("bucket"))
    val evBuckets = ev.withColumn("bucket",
      floor(col("ms") / 3600000L).cast("bigint"))
    evBuckets.join(wBuckets, "bucket")
      .filter(col("ms") >= col("w_lo") && col("ms") < col("w_hi"))
      .groupBy(col("w_lo"), col("w_hi"))
      .agg(count(lit(1)).as("n_events"))
  }

  val intervalJoinSql: String =
    """WITH ev AS (SELECT event_id, epoch_ms(ts::TIMESTAMP) AS ms FROM events),
      |busy AS (
      |  SELECT hr FROM (
      |    SELECT ms // 3600000 AS hr, count(*) AS n FROM ev GROUP BY 1)
      |  ORDER BY n DESC, hr ASC LIMIT 10),
      |w AS (SELECT hr * 3600000 - 1800000 AS w_lo,
      |             hr * 3600000 + 5400000 AS w_hi FROM busy)
      |SELECT w_lo, w_hi, count(*) AS n_events
      |FROM w JOIN ev ON ev.ms >= w.w_lo AND ev.ms < w.w_hi
      |GROUP BY 1, 2""".stripMargin

  /** Mergeable HLL sketch table (Apache DataSketches via Spark's
    * `hll_sketch_agg`/`hll_union_agg`): one compact sketch per DAY of
    * distinct users — the persisted daily-build partial — then monthly
    * distinct-user counts answered by UNIONING the daily sketches,
    * never rescanning raw events. This is the warehouse pattern BigQuery
    * (HLL_COUNT.merge) and Snowflake ship for incremental
    * COUNT(DISTINCT): daily state is KB-sized and mergeable across any
    * ad-hoc grouping (weeks, months, campaign windows) at metadata cost.
    * Sketch bytes are engine-specific, so the oracle contract is the
    * [[Analytics.qApproxDistinct]] bound gate: exact counts + the 5%
    * bound boolean (lgConfigK=12 → rsd ≈ 1.6%).
    */
  def hllSketchUnion(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("user_id"),
      col("ts").cast("date").as("day"),
      date_format(col("ts"), "yyyy-MM").as("month"))
    val daily = ev.groupBy(col("month"), col("day"))
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
    val monthly = daily.groupBy(col("month"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    val exact = ev.groupBy(col("month"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    monthly.join(exact, "month")
      .select(col("month"), col("exact_users"),
        (abs(col("est") - col("exact_users")) <=
          col("exact_users") * lit(0.05)).as("within_bound"))
  }

  val hllSketchUnionSql: String =
    """SELECT strftime(ts::TIMESTAMP, '%Y-%m') AS month,
      |       count(DISTINCT user_id) AS exact_users,
      |       true AS within_bound
      |FROM events GROUP BY 1""".stripMargin

  /** Ordered conversion funnel (signup → view → click → purchase): each
    * step's timestamp is the user's EARLIEST qualifying event strictly
    * after the previous step — the standard product-analytics funnel,
    * not a mere per-type distinct count. Shape: one filtered per-user
    * min-agg per step plus a co-keyed join back (all four shuffles hash
    * on user_id — on a cluster one repartition co-locates the chain);
    * no windows, no event ordering beyond per-user minima, so the plan
    * is skew-safe (a hot user is one group). Emits the classic
    * step/n_users report rows.
    */
  def funnel(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("user_id"), col("event_type"), col("ts"))
    def step(prev: DataFrame, prevTs: String, tpe: String,
             outTs: String): DataFrame =
      ev.filter(col("event_type") === tpe)
        .join(prev, "user_id")
        .filter(col("ts") > col(prevTs))
        .groupBy(col("user_id")).agg(min(col("ts")).as(outTs))
    val u1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val u2 = step(u1, "t1", "view", "t2")
    val u3 = step(u2, "t2", "click", "t3")
    val u4 = step(u3, "t3", "purchase", "t4")
    val rows = Seq(("signup", u1), ("view", u2), ("click", u3),
      ("purchase", u4))
    rows.zipWithIndex.map { case ((name, df), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step"), lit(name).as("step_name"),
          col("n_users"))
    }.reduce(_ unionByName _)
  }

  val funnelSql: String =
    """WITH u1 AS (SELECT user_id, min(ts) AS t1 FROM events
      |            WHERE event_type = 'signup' GROUP BY user_id),
      |u2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      |       JOIN u1 USING (user_id)
      |       WHERE e.event_type = 'view' AND e.ts > u1.t1
      |       GROUP BY e.user_id),
      |u3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
      |       JOIN u2 USING (user_id)
      |       WHERE e.event_type = 'click' AND e.ts > u2.t2
      |       GROUP BY e.user_id),
      |u4 AS (SELECT e.user_id, min(e.ts) AS t4 FROM events e
      |       JOIN u3 USING (user_id)
      |       WHERE e.event_type = 'purchase' AND e.ts > u3.t3
      |       GROUP BY e.user_id)
      |SELECT 1 AS step, 'signup' AS step_name,
      |       CAST(count(*) AS BIGINT) AS n_users FROM u1
      |UNION ALL SELECT 2, 'view', CAST(count(*) AS BIGINT) FROM u2
      |UNION ALL SELECT 3, 'click', CAST(count(*) AS BIGINT) FROM u3
      |UNION ALL SELECT 4, 'purchase', CAST(count(*) AS BIGINT) FROM u4"""
      .stripMargin

  /** Weekly cohort retention: users grouped by first-activity week
    * (integer week index since 2024-01-01 — deliberately NOT an engine
    * week-truncation, so the bucketing is identical integer arithmetic
    * everywhere), counted distinct in each subsequent week offset. Two
    * user-keyed aggs and one co-keyed join — window-free, skew-safe, the
    * engagement matrix every growth dashboard draws.
    */
  def cohortRetention(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("user_id"),
      expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') DIV 7" +
        " AS BIGINT)").as("week"))
    val firstWeek = ev.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    ev.join(firstWeek, "user_id")
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  val cohortRetentionSql: String =
    """WITH ev AS (
      |  SELECT user_id,
      |    CAST(datediff('day', DATE '2024-01-01', ts::DATE) // 7
      |      AS BIGINT) AS week
      |  FROM events),
      |fw AS (SELECT user_id, min(week) AS cohort_week
      |       FROM ev GROUP BY user_id)
      |SELECT cohort_week, week - cohort_week AS week_offset,
      |       count(DISTINCT user_id) AS n_users
      |FROM ev JOIN fw USING (user_id)
      |GROUP BY 1, 2""".stripMargin
}
