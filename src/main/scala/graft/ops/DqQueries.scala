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
}
