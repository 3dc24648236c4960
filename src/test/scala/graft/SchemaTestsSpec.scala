package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dqtests.SchemaTests

/** Unit cases for the dbt-utils generic-test battery — the edge semantics
  * the oracle queries can't pin (NULL handling, pass-paths that return
  * empty, the anti-join gap definition vs a naive lag).
  */
class SchemaTestsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("expression_is_true: NULL expression passes (dbt `WHERE NOT expr`)") {
    val df = Seq[(Long, java.lang.Double)]((1L, 1.0), (2L, null), (3L, -5.0))
      .toDF("id", "v")
    val failing = SchemaTests.expressionIsTrue(df, col("v") >= 0)
      .select("id").as[Long].collect().toSet
    assert(failing == Set(3L)) // the NULL row is not a failure
  }

  test("equal_rowcount / fewer_rows_than pass-paths return empty") {
    val a = Seq(1, 2, 3).toDF("x")
    val b = Seq(4, 5, 6).toDF("x")
    assert(SchemaTests.equalRowcount(a, b).count() == 0)
    assert(SchemaTests.fewerRowsThan(a.limit(2), b).count() == 0)
    // boundary: equal counts is NOT fewer — fails
    assert(SchemaTests.fewerRowsThan(a, b).count() == 1)
  }

  test("at_least_one and not_constant") {
    val allNull = Seq[java.lang.Integer](null, null).toDF("v")
    assert(SchemaTests.atLeastOne(allNull, "v").count() == 1)
    val constant = Seq(7, 7, 7).toDF("v")
    assert(SchemaTests.notConstant(constant, "v").count() == 1)
    val varied = Seq(7, 8).toDF("v")
    assert(SchemaTests.atLeastOne(varied, "v").count() == 0)
    assert(SchemaTests.notConstant(varied, "v").count() == 0)
  }

  test("not_null_proportion basis-point bounds") {
    val df = Seq[java.lang.Integer](1, 2, 3, null).toDF("v") // 7500 bp
    assert(SchemaTests.notNullProportion(df, "v", atLeastBp = 7500).count() == 0)
    assert(SchemaTests.notNullProportion(df, "v", atLeastBp = 7501).count() == 1)
    assert(SchemaTests.notNullProportion(df, "v", atLeastBp = 0, atMostBp = 7499)
      .count() == 1)
  }

  test("sequential_values: anti-join gaps ≡ lag-based gaps") {
    // values 1,2,3, 6,7, 10 → gap starts at 3 and 7 (next value absent)
    val df = Seq(1L, 2L, 3L, 6L, 7L, 10L, 3L).toDF("v") // dup is harmless
    val gaps = SchemaTests.sequentialValues(df, "v")
      .as[Long].collect().toSet
    assert(gaps == Set(3L, 7L))
    // fully sequential → empty
    val seqDf = Seq(5L, 6L, 7L).toDF("v")
    assert(SchemaTests.sequentialValues(seqDf, "v").count() == 0)
    // custom interval
    val byTwo = Seq(2L, 4L, 8L).toDF("v")
    assert(SchemaTests.sequentialValues(byTwo, "v", interval = 2L)
      .as[Long].collect().toSet == Set(4L))
  }

  test("mutually_exclusive_ranges: overlap flags the LATER range; touching passes") {
    val df = Seq(
      ("a", 0, 10, 1), // base
      ("a", 10, 20, 2), // touches — allowed ([lower, upper))
      ("a", 15, 30, 3), // overlaps row 2 — fails
      ("b", 0, 5, 4) // other partition — independent
    ).toDF("k", "lo", "hi", "id")
    val failing = SchemaTests.mutuallyExclusiveRanges(
      df, "lo", "hi", partitionBy = Seq("k"), tiebreak = Seq("id"))
      .select("id").as[Int].collect().toSet
    assert(failing == Set(3))
  }

  test("cardinality_equality: symmetric difference of the value sets") {
    val a = Seq(1, 2, 2, 3).toDF("x")
    val b = Seq(2, 3, 4).toDF("y")
    val diff = SchemaTests.cardinalityEquality(a, "x", b, "y")
      .select("value_field", "in_a", "in_b")
      .as[(Int, Int, Int)].collect().toSet
    assert(diff == Set((1, 1, 0), (4, 0, 1)))
  }

  test("recency: fresh data passes, stale fails") {
    val df = Seq("2024-01-01 00:00:00").toDF("ts")
    val asOf = lit("2024-01-01 12:00:00").cast("timestamp")
    assert(SchemaTests.recency(df, "ts", asOf, thresholdH = 24).count() == 0)
    assert(SchemaTests.recency(df, "ts", asOf, thresholdH = 6).count() == 1)
  }
}
