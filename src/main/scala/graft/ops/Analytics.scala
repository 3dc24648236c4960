package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational battery: the operator classes the engine's macro library
  * generates (SURVEY §2.B) plus the aggregate/join/window surface any dbt
  * project on this engine writes in model SQL. All plans are declarative
  * DataFrame ops → Catalyst does pushdown/pruning/join-selection; dims are
  * explicitly broadcast where small at every SF.
  *
  * Float policy: every derived double aggregate is `round(x, 2|4)` on BOTH
  * the Spark and oracle side so partial-aggregation summation order can't
  * flip the last ulp in the hash compare.
  */
object Analytics {
  import TData._

  /** TPC-H Q1-shaped pricing summary: filter → pushed-down scan → two-phase
    * hash aggregate (partial per partition, merged — no full shuffle of the
    * fact table, only of the tiny grouped state).
    */
  def q1PricingSummary(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  val q1PricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_extendedprice), 4) AS avg_price,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-shaped top-k: fact⨝fact shuffle join + broadcast dim filter +
    * agg + total-order top-10 (rank on the ROUNDED measure with a unique
    * tiebreak key so the limit cut is deterministic across engines).
    */
  def q3TopOrders(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = orders(s, d).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = lineitem(s, d).filter(col("l_shipdate") > lit("1996-06-30").cast("timestamp"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)
  }

  val q3TopOrdersSql: String =
    """SELECT o_orderkey, o_orderdate, o_orderpriority,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate > TIMESTAMP '1996-06-30'
      |GROUP BY 1, 2, 3
      |ORDER BY revenue DESC, o_orderkey ASC
      |LIMIT 10""".stripMargin

  /** TPC-H Q5-shaped star join: one big fact (lineitem⨝orders, shuffle) with
    * the whole dimension arm (customer⨝nation⨝region) broadcast — at 100 TB
    * the fact tables shuffle on orderkey once; dims never shuffle.
    */
  def q5RegionRevenue(s: SparkSession, d: String): DataFrame = {
    val dims = customer(s, d)
      .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .join(region(s, d), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("n_name"), col("r_name"))
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_lineitems"))
  }

  val q5RegionRevenueSql: String =
    """SELECT r_name, n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  count(*) AS n_lineitems
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY 1, 2""".stripMargin

  /** Window top-N per group: row_number with a total order (unique tiebreak). */
  def wTop3OrdersPerCust(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
  }

  val wTop3OrdersPerCustSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders)
      |WHERE rn <= 3""".stripMargin

  /** Running (cumulative) aggregate: ROWS UNBOUNDED PRECEDING over a total
    * per-partition order. The frame is deterministic, but HOW the frame is
    * summed is engine-specific (Spark accumulates sequentially, DuckDB with
    * a pairwise segment tree), so a cumulative DOUBLE sum differs in the
    * last ulp and `round(..,2)` flips on `.xx5` ties. Fix: quantize each
    * summand to exact integer cents first — integer window sums are
    * order-independent and /100.0 of the same int64 is the same double.
    *
    * The sort key must also be a TOTAL order up to the summed VALUE:
    * this synthetic lineitem does not enforce the TPC-H (orderkey,
    * linenumber) PK (118k duplicate keys at sf0.1), and when tied rows
    * carry different amounts the running-total MULTISET depends on
    * engine tie order — green at sf0.1 by luck, 3.5k flipped rows at
    * the sf1-shaped sweep. Adding the cents amount as the last key
    * makes remaining ties equal-amount, whose prefix sums are
    * order-invariant as a multiset.
    */
  def wRunningRevenue(s: SparkSession, d: String): DataFrame = {
    val cents = round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100, 0)
      .cast("long")
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate").asc, col("l_orderkey").asc,
        col("l_linenumber").asc, cents.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lineitem(s, d).select(
      col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
      (sum(cents).over(w) / 100.0)
        .as("running_rev"))
  }

  val wRunningRevenueSql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) OVER (
      |    PARTITION BY l_suppkey
      |    ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC,
      |      CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS running_rev
      |FROM lineitem""".stripMargin

  /** Set ops: INTERSECT (nations present on both customer and supplier side). */
  def sNationIntersect(s: SparkSession, d: String): DataFrame = {
    val cn = customer(s, d).join(broadcast(nation(s, d)),
      col("c_nationkey") === col("n_nationkey")).select(col("n_name"))
    val sn = supplier(s, d).join(broadcast(nation(s, d)),
      col("s_nationkey") === col("n_nationkey")).select(col("n_name"))
    cn.intersect(sn)
  }

  val sNationIntersectSql: String =
    """SELECT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
      |INTERSECT
      |SELECT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey""".stripMargin

  /** Set ops: EXCEPT (customer nations with no supplier). */
  def sNationExcept(s: SparkSession, d: String): DataFrame = {
    val cn = customer(s, d).join(broadcast(nation(s, d)),
      col("c_nationkey") === col("n_nationkey")).select(col("n_name"))
    val sn = supplier(s, d).join(broadcast(nation(s, d)),
      col("s_nationkey") === col("n_nationkey")).select(col("n_name"))
    cn.except(sn)
  }

  val sNationExceptSql: String =
    """SELECT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
      |EXCEPT
      |SELECT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey""".stripMargin

  /** ROLLUP: multi-level aggregate (grand total + per-status + per-pair). */
  def rRollupOrders(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_price"))

  val rRollupOrdersSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_price
      |FROM orders
      |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin

  /** LEFT SEMI join (EXISTS): customers that placed at least one 'F' order. */
  def jSemiCustomersWithOrders(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).filter(col("o_orderstatus") === "F")
    customer(s, d)
      .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
  }

  val jSemiCustomersWithOrdersSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin

  /** PIVOT: status columns from rows — Spark's relational pivot; the
    * oracle mirrors it as conditional aggregation (what pivot compiles to).
    */
  def rPivotStatus(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))

  val rPivotStatusSql: String =
    """SELECT o_orderpriority,
      |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
      |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
      |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  /** CUBE: all grouping-set combinations of (status, priority). */
  def rCubeOrders(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))

  val rCubeOrdersSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin

  /** Exact interpolated percentiles (not approx sketches — both engines
    * use the p·(n−1) linear-interpolation definition).
    */
  def qPercentiles(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("round(percentile(o_totalprice, 0.25), 4)").as("p25"),
        expr("round(percentile(o_totalprice, 0.5), 4)").as("p50"),
        expr("round(percentile(o_totalprice, 0.75), 4)").as("p75"))

  val qPercentilesSql: String =
    """SELECT o_orderstatus,
      |  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
      |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      |  round(quantile_cont(o_totalprice, 0.75), 4) AS p75
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  /** HLL++ estimate — the scale fallback for A4's exact COUNT(DISTINCT)
    * when the key space itself is huge: one pass, fixed-size sketch
    * state, no expand. Oracle-gated by BOUND rather than value: the sketch
    * itself is engine-specific, so the checkable contract is `|approx −
    * exact| ≤ 5·rsd·exact` (5 standard deviations of the rsd=0.01
    * sketch — deterministic for a fixed dataset). The oracle recomputes
    * the exact counts and asserts the same boolean as literal true, so a
    * drifting estimator breaks the hash gate instead of hiding behind a
    * rows-only check.
    */
  def qApproxDistinct(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey"), 0.01).as("a"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
      .select(col("l_returnflag"), col("exact_orders"),
        (abs(col("a") - col("exact_orders")) <=
          col("exact_orders") * lit(0.05)).as("within_bound"))

  val qApproxDistinctSql: String =
    """SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_orders,
      |       true AS within_bound
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Approximate percentiles (Greenwald-Khanna sketch) — the scale
    * fallback for [[qPercentiles]] when per-group exact percentile state
    * is too wide: one pass, bounded sketch state, mergeable partials.
    * Same bound-gated oracle pattern as [[qApproxDistinct]]: the sketch
    * value is engine-specific, so the checkable contract is that each
    * approximate quantile lies within the value range of exact quantiles
    * ±10 RANKS' worth of spread — here simplified to the robust bound
    * `p25_exact ≤ approx_p50 ≤ p75_exact` plus |approx_p50 − p50_exact|
    * ≤ 5% of the IQR-padded spread. The oracle recomputes the exact
    * percentiles and pins the booleans at literal true.
    */
  def qApproxPercentiles(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("approx_percentile(o_totalprice, 0.5, 10000)").as("a50"),
        expr("percentile(o_totalprice, 0.25)").as("e25"),
        expr("percentile(o_totalprice, 0.5)").as("e50"),
        expr("percentile(o_totalprice, 0.75)").as("e75"))
      .select(col("o_orderstatus"),
        round(col("e50"), 4).as("p50_exact"),
        (col("a50") >= col("e25") && col("a50") <= col("e75"))
          .as("within_iqr"),
        (abs(col("a50") - col("e50")) <=
          (col("e75") - col("e25")) * lit(0.05) + lit(1.0))
          .as("within_bound"))

  val qApproxPercentilesSql: String =
    """SELECT o_orderstatus,
      |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50_exact,
      |  true AS within_iqr, true AS within_bound
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  /** Exact COUNT(DISTINCT) companion to [[qApproxDistinct]]: the same
    * grouping with only the deterministic column, hash-checked against
    * DuckDB directly (the sketch query's bound check also derives from
    * these exact counts).
    */
  def qExactDistinct(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("exact_orders"))

  val qExactDistinctSql: String =
    """SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_orders
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Explicit GROUPING SETS (the general form behind rollup/cube):
    * single-pass expand + hash aggregate; grouping_id disambiguates the
    * NULL of "not grouped on" from a NULL data value.
    */
  def rGroupingSets(s: SparkSession, d: String): DataFrame =
    s.sql(
      s"""SELECT o_orderstatus, o_orderpriority,
         |  count(*) AS n_orders, grouping(o_orderstatus) AS g_status
         |FROM parquet.`$d/orders.parquet`
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""".stripMargin)

  val rGroupingSetsSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  count(*) AS n_orders, grouping(o_orderstatus) AS g_status
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""".stripMargin

  /** A6: literal projection (reference models/test_model.sql:1 `select 1 as a`). */
  def a6Literal(s: SparkSession, d: String): DataFrame =
    s.sql("SELECT 1 AS a")

  val a6LiteralSql: String = "SELECT 1 AS a"

  // -------------------------- correlated-subquery shapes (TPC-H Q4/13/17)
  // Deliberately written as SQL TEXT through spark.sql (path relations),
  // not hand-decorrelated DataFrame joins: the operator under test is
  // Catalyst's subquery decorrelation (RewriteCorrelatedScalarSubquery /
  // RewritePredicateSubquery), the one relational surface the suite
  // didn't exercise. Column set adapted to the generated schema (no
  // l_commitdate/o_comment); semantics are the classic shapes.

  /** Q4 shape: correlated EXISTS — orders in one quarter with at least
    * one line shipped >30 days after the order date, counted by
    * priority. Catalyst rewrites the EXISTS into a left-semi join.
    */
  def q4LateOrders(s: SparkSession, d: String): DataFrame =
    s.sql(
      s"""SELECT o_orderpriority, count(*) AS order_count
         |FROM parquet.`$d/orders.parquet` o
         |WHERE o.o_orderdate >= DATE '1996-01-01'
         |  AND o.o_orderdate < DATE '1996-04-01'
         |  AND EXISTS (SELECT 1 FROM parquet.`$d/lineitem.parquet` l
         |              WHERE l.l_orderkey = o.o_orderkey
         |                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
         |GROUP BY o_orderpriority""".stripMargin)

  val q4LateOrdersSql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders o
      |WHERE o.o_orderdate >= DATE '1996-01-01'
      |  AND o.o_orderdate < DATE '1996-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
      |GROUP BY o_orderpriority""".stripMargin

  /** Q13 shape: customer order-count distribution through a left outer
    * join with a join-side predicate — exercises null-preserving
    * count(col) over unmatched rows (customers with zero orders land in
    * the c_count=0 bucket, not dropped).
    */
  def q13Custdist(s: SparkSession, d: String): DataFrame =
    s.sql(
      s"""SELECT c_count, count(*) AS custdist FROM (
         |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
         |  FROM parquet.`$d/customer.parquet` c
         |  LEFT JOIN parquet.`$d/orders.parquet` o
         |    ON c.c_custkey = o.o_custkey AND o.o_orderstatus <> 'F'
         |  GROUP BY c.c_custkey)
         |GROUP BY c_count""".stripMargin)

  val q13CustdistSql: String =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      |  FROM customer c
      |  LEFT JOIN orders o
      |    ON c.c_custkey = o.o_custkey AND o.o_orderstatus <> 'F'
      |  GROUP BY c.c_custkey)
      |GROUP BY c_count""".stripMargin

  /** Q17 shape: correlated SCALAR subquery — revenue (exact cents) of
    * lines whose quantity is under 20% of their part's average quantity.
    * Quantities are small integers, so the per-part avg is exact in
    * double and the 0.2·avg threshold is bit-identical cross-engine;
    * revenue sums as integer cents (the w_running_revenue rule).
    */
  def q17SmallQty(s: SparkSession, d: String): DataFrame =
    s.sql(
      s"""SELECT CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))
         |    AS BIGINT) AS small_qty_cents,
         |  count(*) AS n_lines
         |FROM parquet.`$d/lineitem.parquet` l
         |WHERE l.l_quantity < (
         |  SELECT 0.2 * avg(l2.l_quantity)
         |  FROM parquet.`$d/lineitem.parquet` l2
         |  WHERE l2.l_partkey = l.l_partkey)""".stripMargin)

  val q17SmallQtySql: String =
    """SELECT CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))
      |    AS BIGINT) AS small_qty_cents,
      |  CAST(count(*) AS BIGINT) AS n_lines
      |FROM lineitem l
      |WHERE l.l_quantity < (
      |  SELECT 0.2 * avg(l2.l_quantity)
      |  FROM lineitem l2
      |  WHERE l2.l_partkey = l.l_partkey)""".stripMargin
}
