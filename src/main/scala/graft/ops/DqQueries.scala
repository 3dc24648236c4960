package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dqtests.SchemaTests

/** Oracle-checked instantiations of the schema-test framework
  * (SURVEY §2 B19, B21–B25, B36) over the driver testdata.
  */
object DqQueries {
  import TData._

  /** B21: o_custkey is deliberately non-unique in orders → violations. */
  def b21Unique(s: SparkSession, d: String): DataFrame =
    SchemaTests.unique(orders(s, d), "o_custkey")
      .withColumnRenamed("unique_field", "o_custkey")

  val b21UniqueSql: String =
    """SELECT o_custkey, count(*) AS n_records FROM orders
      |WHERE o_custkey IS NOT NULL
      |GROUP BY 1 HAVING count(*) > 1""".stripMargin

  /** dbt-utils accepted_range: orders whose total price falls outside a
    * plausibility window — the everyday numeric sanity test.
    */
  def bTestAcceptedRange(s: SparkSession, d: String): DataFrame =
    SchemaTests.acceptedRange(orders(s, d), "o_totalprice",
      Some(1000.0), Some(400000.0))
      .select(col("o_orderkey"), col("o_totalprice"))

  val bTestAcceptedRangeSql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE o_totalprice IS NOT NULL
      |  AND (o_totalprice < 1000.0 OR o_totalprice > 400000.0)""".stripMargin

  /** dbt-utils unique_combination_of_columns: composite-key duplicates
    * over (custkey, orderdate) — multi-order days per customer.
    */
  def bTestUniqueCombination(s: SparkSession, d: String): DataFrame =
    SchemaTests.uniqueCombination(orders(s, d),
      Seq("o_custkey", "o_orderdate"))

  val bTestUniqueCombinationSql: String =
    """SELECT o_custkey, o_orderdate, count(*) AS n_records FROM orders
      |WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
      |GROUP BY 1, 2 HAVING count(*) > 1""".stripMargin

  /** B22: not_null over a derived nullable column (testdata has no raw
    * NULLs) — fails for every 'O'-status order.
    */
  def b22NotNull(s: SparkSession, d: String): DataFrame =
    SchemaTests.notNull(
      orders(s, d).select(col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("O")).as("status_or_null")),
      "status_or_null")
      .select(col("o_orderkey"))

  val b22NotNullSql: String =
    """SELECT o_orderkey FROM (
      |  SELECT o_orderkey, nullif(o_orderstatus, 'O') AS status_or_null
      |  FROM orders)
      |WHERE status_or_null IS NULL""".stripMargin

  /** B23: allowed set is a strict subset of real segments → 3 failing groups. */
  def b23AcceptedValues(s: SparkSession, d: String): DataFrame =
    SchemaTests.acceptedValues(customer(s, d), "c_mktsegment",
      Seq("BUILDING", "MACHINERY"))
      .withColumnRenamed("value_field", "c_mktsegment")

  val b23AcceptedValuesSql: String =
    """SELECT c_mktsegment, count(*) AS n_records FROM customer
      |GROUP BY 1 HAVING c_mktsegment NOT IN ('BUILDING', 'MACHINERY')""".stripMargin

  /** B24: referential integrity of orders.o_custkey against a deliberately
    * shrunk parent (customers with positive balance) → violations.
    */
  def b24Relationships(s: SparkSession, d: String): DataFrame =
    SchemaTests.relationships(
      orders(s, d).select(col("o_orderkey"), col("o_custkey")),
      "o_custkey",
      customer(s, d).filter(col("c_acctbal") > 0).select(col("c_custkey")),
      "c_custkey")

  val b24RelationshipsSql: String =
    """SELECT o_orderkey, o_custkey FROM orders
      |WHERE o_custkey IS NOT NULL
      |  AND NOT EXISTS (SELECT 1 FROM customer
      |                  WHERE c_acctbal > 0 AND c_custkey = o_custkey)""".stripMargin

  /** B25 + B19: where-filtered unique test evaluated to the engine's
    * failures/should_warn/should_error row.
    */
  def b19TestEval(s: SparkSession, d: String): DataFrame =
    SchemaTests.evaluate(
      SchemaTests.unique(
        SchemaTests.withWhere(lineitem(s, d), Some(col("l_quantity") > 25)),
        "l_orderkey"))

  val b19TestEvalSql: String =
    """SELECT failures, failures != 0 AS should_warn, failures != 0 AS should_error
      |FROM (SELECT count(*) AS failures FROM (
      |  SELECT l_orderkey, count(*) AS n FROM lineitem
      |  WHERE l_quantity > 25 AND l_orderkey IS NOT NULL
      |  GROUP BY 1 HAVING count(*) > 1))""".stripMargin

  /** B36: freshness of events.ts against a pinned as-of instant
    * (2024-03-01), thresholds warn 24h / error 72h → 'error' here.
    */
  def b36Freshness(s: SparkSession, d: String): DataFrame =
    SchemaTests.freshness(events(s, d), "ts",
      lit("2024-03-01 00:00:00").cast("timestamp"), 24, 72)

  val b36FreshnessSql: String =
    """SELECT max_loaded_at_ms, hours_late,
      |  CASE WHEN hours_late > 72 THEN 'error'
      |       WHEN hours_late > 24 THEN 'warn' ELSE 'pass' END AS status
      |FROM (SELECT epoch_ms(max(ts)::TIMESTAMP) AS max_loaded_at_ms,
      |        (epoch_ms(TIMESTAMP '2024-03-01 00:00:00')
      |         - epoch_ms(max(ts)::TIMESTAMP)) // 3600000 AS hours_late
      |      FROM events)""".stripMargin

  // ------------------------------------------------ dbt-utils battery

  /** dbt-utils expression_is_true: discounts must not exceed 5% — rows
    * breaking the business rule.
    */
  def bTestExpressionIsTrue(s: SparkSession, d: String): DataFrame =
    SchemaTests.expressionIsTrue(lineitem(s, d), col("l_discount") <= 0.05)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_discount"))

  val bTestExpressionIsTrueSql: String =
    """SELECT l_orderkey, l_linenumber, l_discount FROM lineitem
      |WHERE NOT (l_discount <= 0.05)""".stripMargin

  /** dbt-utils not_accepted_values: 'AUTOMOBILE' must never appear. */
  def bTestNotAcceptedValues(s: SparkSession, d: String): DataFrame =
    SchemaTests.notAcceptedValues(customer(s, d), "c_mktsegment",
      Seq("AUTOMOBILE"))
      .withColumnRenamed("value_field", "c_mktsegment")

  val bTestNotAcceptedValuesSql: String =
    """SELECT c_mktsegment, count(*) AS n_records FROM customer
      |GROUP BY 1 HAVING c_mktsegment IN ('AUTOMOBILE')""".stripMargin

  /** dbt-utils equal_rowcount: orders vs customer (15000 vs 1500 — fails
    * with both counts).
    */
  def bTestEqualRowcount(s: SparkSession, d: String): DataFrame =
    SchemaTests.equalRowcount(orders(s, d), customer(s, d))

  val bTestEqualRowcountSql: String =
    """SELECT count_a, count_b, count_a - count_b AS diff
      |FROM (SELECT count(*) AS count_a FROM orders)
      |CROSS JOIN (SELECT count(*) AS count_b FROM customer)
      |WHERE count_a - count_b != 0""".stripMargin

  /** dbt-utils fewer_rows_than: nation (25) is NOT fewer than region (5)
    * — fails with both counts.
    */
  def bTestFewerRowsThan(s: SparkSession, d: String): DataFrame =
    SchemaTests.fewerRowsThan(nation(s, d), region(s, d))

  val bTestFewerRowsThanSql: String =
    """SELECT count_model, count_comparison
      |FROM (SELECT count(*) AS count_model FROM nation)
      |CROSS JOIN (SELECT count(*) AS count_comparison FROM region)
      |WHERE count_model >= count_comparison""".stripMargin

  /** dbt-utils not_null_proportion over the b22-style derived nullable
    * column — non-null share (non-'O' statuses) is ~51%, under the 90%
    * floor, so the stats row fails out.
    */
  def bTestNotNullProportion(s: SparkSession, d: String): DataFrame =
    SchemaTests.notNullProportion(
      orders(s, d).select(
        nullif(col("o_orderstatus"), lit("O")).as("status_or_null")),
      "status_or_null", atLeastBp = 9000)

  val bTestNotNullProportionSql: String =
    """SELECT n_rows, n_not_null, n_not_null * 10000 // n_rows AS not_null_bp
      |FROM (SELECT count(*) AS n_rows,
      |             count(nullif(o_orderstatus, 'O')) AS n_not_null
      |      FROM orders)
      |WHERE n_not_null * 10000 // n_rows < 9000""".stripMargin

  /** dbt-utils sequential_values over distinct o_custkey (not every
    * customer ordered → gaps). Anti-join shape, not a global lag window —
    * see [[SchemaTests.sequentialValues]].
    */
  def bTestSequentialValues(s: SparkSession, d: String): DataFrame =
    SchemaTests.sequentialValues(orders(s, d), "o_custkey")

  val bTestSequentialValuesSql: String =
    """WITH vals AS (
      |  SELECT DISTINCT o_custkey::BIGINT AS v FROM orders
      |  WHERE o_custkey IS NOT NULL)
      |SELECT v AS gap_start FROM vals
      |WHERE v + 1 NOT IN (SELECT v FROM vals)
      |  AND v < (SELECT max(v) FROM vals)""".stripMargin

  /** dbt-utils mutually_exclusive_ranges: per-supplier
    * [shipdate, shipdate + quantity days) delivery windows overlap
    * heavily — the overlapping rows fail. Window partitioned by suppkey;
    * (suppkey, orderkey, linenumber) is a key, so the order-by is total
    * and the lag deterministic.
    */
  def bTestMutuallyExclusiveRanges(s: SparkSession, d: String): DataFrame =
    SchemaTests.mutuallyExclusiveRanges(
      lineitem(s, d).select(col("l_suppkey"), col("l_orderkey"),
        col("l_linenumber"), col("l_shipdate").cast("date").as("l_shipday"),
        date_add(col("l_shipdate").cast("date"),
          col("l_quantity").cast("int")).as("l_shipend")),
      lower = "l_shipday", upper = "l_shipend",
      partitionBy = Seq("l_suppkey"),
      tiebreak = Seq("l_orderkey", "l_linenumber"))

  val bTestMutuallyExclusiveRangesSql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber, l_shipday, l_shipend
      |FROM (
      |  SELECT l_suppkey, l_orderkey, l_linenumber, l_shipday, l_shipend,
      |    lag(l_shipend) OVER (PARTITION BY l_suppkey
      |      ORDER BY l_shipday, l_shipend, l_orderkey, l_linenumber)
      |      AS prev_upper
      |  FROM (SELECT l_suppkey, l_orderkey, l_linenumber,
      |          CAST(l_shipdate AS DATE) AS l_shipday,
      |          CAST(l_shipdate AS DATE) + CAST(l_quantity AS INT) AS l_shipend
      |        FROM lineitem))
      |WHERE prev_upper IS NOT NULL AND l_shipday < prev_upper""".stripMargin

  /** dbt-utils recency: events must have data newer than 24h before the
    * pinned as-of — the b36 fixture is >72h stale, so this fails with the
    * evidence row.
    */
  def bTestRecency(s: SparkSession, d: String): DataFrame =
    SchemaTests.recency(events(s, d), "ts",
      lit("2024-03-01 00:00:00").cast("timestamp"), thresholdH = 24)

  val bTestRecencySql: String =
    """SELECT most_recent_ms, as_of_ms
      |FROM (SELECT epoch_ms(max(ts)::TIMESTAMP) AS most_recent_ms,
      |             epoch_ms(TIMESTAMP '2024-03-01 00:00:00') AS as_of_ms
      |      FROM events)
      |WHERE most_recent_ms < as_of_ms - 24 * 3600000""".stripMargin

  /** dbt-utils cardinality_equality: o_custkey vs c_custkey — customers
    * who never ordered appear as in_b-only rows.
    */
  def bTestCardinalityEquality(s: SparkSession, d: String): DataFrame =
    SchemaTests.cardinalityEquality(
      orders(s, d), "o_custkey", customer(s, d), "c_custkey")

  val bTestCardinalityEqualitySql: String =
    """SELECT value_field, in_a, in_b FROM (
      |  SELECT coalesce(av.value_field, bv.value_field) AS value_field,
      |    CASE WHEN av.value_field IS NULL THEN 0 ELSE 1 END AS in_a,
      |    CASE WHEN bv.value_field IS NULL THEN 0 ELSE 1 END AS in_b
      |  FROM (SELECT DISTINCT o_custkey AS value_field FROM orders
      |        WHERE o_custkey IS NOT NULL) av
      |  FULL OUTER JOIN
      |       (SELECT DISTINCT c_custkey AS value_field FROM customer
      |        WHERE c_custkey IS NOT NULL) bv
      |  ON av.value_field = bv.value_field)
      |WHERE in_a = 0 OR in_b = 0""".stripMargin
}
