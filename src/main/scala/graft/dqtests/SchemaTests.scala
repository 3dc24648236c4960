package graft.dqtests

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic data-quality tests (SURVEY §2 B21–B25): each returns the rows
  * that FAIL the assertion (dbt semantics — empty result = pass).
  *
  * References (shape of the generated SQL): manifest.json:1
  * `default__test_unique` @201298, `default__test_not_null` @198167,
  * `default__test_accepted_values` @202767, `default__test_relationships`
  * @199544, `default__get_where_subquery` @146116.
  *
  * All are single-pass aggregates or anti-joins — at 100 TB: unique /
  * accepted_values shuffle only the grouped key, not_null is a pushed-down
  * filter scan, relationships broadcasts the parent key set when small.
  */
object SchemaTests {

  /** B21 `unique`: key values appearing more than once. */
  def unique(df: DataFrame, column: String): DataFrame =
    df.filter(col(column).isNotNull)
      .groupBy(col(column).as("unique_field"))
      .agg(count(lit(1)).as("n_records"))
      .filter(col("n_records") > 1)

  /** B22 `not_null`: rows whose column is NULL. */
  def notNull(df: DataFrame, column: String): DataFrame =
    df.filter(col(column).isNull)

  /** B23 `accepted_values`: distinct values outside the allowed set. */
  def acceptedValues(df: DataFrame, column: String, values: Seq[String]): DataFrame =
    df.groupBy(col(column).as("value_field"))
      .agg(count(lit(1)).as("n_records"))
      .filter(!col("value_field").isin(values: _*))

  /** B24 `relationships`: child FK values with no matching parent PK
    * (referential integrity, LEFT ANTI join).
    */
  def relationships(child: DataFrame, fk: String,
                    parent: DataFrame, pk: String): DataFrame = {
    // alias the parent key: fk and pk often share a name (self-named keys
    // in schema.yml), which would make the join condition ambiguous; the
    // anti-join output carries only child columns, so the alias never leaks
    val p = parent.select(col(pk).as("__graft_rel_pk"))
    child.filter(col(fk).isNotNull)
      .join(p, col(fk) === col("__graft_rel_pk"), "left_anti")
  }

  /** dbt-utils `accepted_range`: rows whose column falls outside
    * [minV, maxV] (either bound optional; NULLs never fail — pair with
    * not_null). The everyday numeric sanity test dbt projects layer on
    * top of the core four.
    */
  def acceptedRange(df: DataFrame, column: String,
                    minV: Option[Double], maxV: Option[Double]): DataFrame = {
    require(minV.isDefined || maxV.isDefined, "accepted_range needs a bound")
    val c = col(column)
    val breaches = Seq(
      minV.map(v => c < lit(v)),
      maxV.map(v => c > lit(v))).flatten.reduce(_ || _)
    df.filter(c.isNotNull && breaches)
  }

  /** dbt-utils `unique_combination_of_columns`: multi-column key tuples
    * appearing more than once (the composite-key sibling of B21; rows
    * with any NULL key column are exempt, matching B21's convention).
    */
  def uniqueCombination(df: DataFrame, columns: Seq[String]): DataFrame =
    df.filter(columns.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(columns.map(col): _*)
      .agg(count(lit(1)).as("n_records"))
      .filter(col("n_records") > 1)

  /** dbt-utils `expression_is_true`: rows where the expression does not
    * hold. dbt semantics: `WHERE NOT (expr)` — a NULL expression passes
    * (pair with not_null on its inputs to catch that). Pure filter scan:
    * pushed down, no shuffle.
    */
  def expressionIsTrue(df: DataFrame, expression: Column): DataFrame =
    df.filter(!expression)

  /** dbt-utils `not_accepted_values`: distinct values inside a FORBIDDEN
    * set (the inverse of B23 — "these must never appear").
    */
  def notAcceptedValues(df: DataFrame, column: String, values: Seq[String]): DataFrame =
    df.groupBy(col(column).as("value_field"))
      .agg(count(lit(1)).as("n_records"))
      .filter(col("value_field").isin(values: _*))

  /** dbt-utils `equal_rowcount`: one failing row carrying both counts when
    * the two relations' rowcounts differ; empty when equal. Two count
    * aggregates (metadata-cheap on parquet) + a 1×1 cross join.
    */
  def equalRowcount(a: DataFrame, b: DataFrame): DataFrame =
    a.agg(count(lit(1)).as("count_a"))
      .crossJoin(b.agg(count(lit(1)).as("count_b")))
      .select(col("count_a"), col("count_b"),
        (col("count_a") - col("count_b")).as("diff"))
      .filter(col("diff") =!= 0)

  /** dbt-utils `fewer_rows_than`: fails (one counts row) unless
    * count(df) < count(than).
    */
  def fewerRowsThan(df: DataFrame, than: DataFrame): DataFrame =
    df.agg(count(lit(1)).as("count_model"))
      .crossJoin(than.agg(count(lit(1)).as("count_comparison")))
      .filter(col("count_model") >= col("count_comparison"))

  /** dbt-utils `not_null_proportion`: fails (one stats row) when the
    * non-null fraction of `column` falls outside [atLeast, atMost].
    * The fraction is exposed as integer basis points so the failing row
    * hashes identically cross-engine (no float division in the output).
    */
  def notNullProportion(df: DataFrame, column: String,
                        atLeastBp: Int, atMostBp: Int = 10000): DataFrame =
    df.agg(
        count(lit(1)).as("n_rows"),
        count(col(column)).as("n_not_null"))
      .select(col("n_rows"), col("n_not_null"),
        // bp = 10000 * not_null DIV rows; integer DIV (not `/`, which is
        // double-typed on longs) keeps the emitted stat exact cross-engine
        expr("n_not_null * 10000 DIV n_rows").cast("long").as("not_null_bp"))
      .filter(col("not_null_bp") < atLeastBp || col("not_null_bp") > atMostBp)

  /** dbt-utils `at_least_one`: fails (one row) when `column` has no
    * non-null value at all.
    */
  def atLeastOne(df: DataFrame, column: String): DataFrame =
    df.agg(count(col(column)).as("n_values"))
      .filter(col("n_values") === 0)

  /** dbt-utils `not_constant`: fails (one row) when every non-null value
    * of `column` is identical. Exact distinct over one column — the
    * grouped key is the only thing shuffled.
    */
  def notConstant(df: DataFrame, column: String): DataFrame =
    df.agg(countDistinct(col(column)).as("n_distinct"))
      .filter(col("n_distinct") === 1)

  /** dbt-utils `cardinality_equality`: values present in exactly one of
    * the two columns (full-outer over the distinct value sets; empty =
    * same cardinality AND same values, the test's real intent). Shuffles
    * only distinct keys; at 100 TB both sides reduce to their key sets
    * before the join.
    */
  def cardinalityEquality(a: DataFrame, colA: String,
                          b: DataFrame, colB: String): DataFrame = {
    val av = a.select(col(colA).as("value_field")).where(col(colA).isNotNull).distinct()
      .withColumn("in_a", lit(1))
    val bv = b.select(col(colB).as("value_field")).where(col(colB).isNotNull).distinct()
      .withColumn("in_b", lit(1))
    av.join(bv, Seq("value_field"), "full_outer")
      .filter(col("in_a").isNull || col("in_b").isNull)
      .select(col("value_field"),
        coalesce(col("in_a"), lit(0)).as("in_a"),
        coalesce(col("in_b"), lit(0)).as("in_b"))
  }

  /** dbt-utils `sequential_values` re-expressed join-first: report each
    * distinct value v where `v + interval` is absent and v is not the
    * maximum — the gap STARTS. dbt-utils' macro computes the same gap set
    * with `lag()` over a global sort, which is a single-partition window
    * at scale; the anti-join shape below distributes (distinct-key
    * shuffle + hash anti-join) and returns the same gaps.
    */
  def sequentialValues(df: DataFrame, column: String, interval: Long = 1L): DataFrame = {
    val vals = df.select(col(column).cast("long").as("v"))
      .where(col(column).isNotNull).distinct()
    val next = vals.select((col("v") - lit(interval)).as("v")).withColumn("__has_next", lit(1))
    val maxV = vals.agg(max(col("v")).as("__max_v"))
    vals.join(next, Seq("v"), "left_outer")
      .crossJoin(maxV)
      .filter(col("__has_next").isNull && col("v") < col("__max_v"))
      .select(col("v").as("gap_start"))
  }

  /** dbt-utils `mutually_exclusive_ranges`: rows whose [lower, upper)
    * range overlaps the previous range in its partition (ordered by
    * lower, then upper, then the tiebreak columns — a total order, so the
    * lag comparison is deterministic). Window is PARTITIONED by
    * `partitionBy` — per-partition sorts, never a global one; the widest
    * window partition is one partition key's rows.
    */
  def mutuallyExclusiveRanges(df: DataFrame, lower: String, upper: String,
                              partitionBy: Seq[String],
                              tiebreak: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(partitionBy.nonEmpty,
      "mutually_exclusive_ranges without a partition is a global sort; pass partitionBy")
    val order = (Seq(lower, upper) ++ tiebreak).map(col)
    val w = Window.partitionBy(partitionBy.map(col): _*).orderBy(order: _*)
    df.withColumn("__prev_upper", lag(col(upper), 1).over(w))
      .filter(col("__prev_upper").isNotNull && col(lower) < col("__prev_upper"))
      .drop("__prev_upper")
  }

  /** dbt-utils `recency`: fails (one row) when `max(tsCol)` is older than
    * `asOf - thresholdH hours`. The freshness sibling with dbt-utils'
    * pass/fail shape instead of B36's status classification.
    */
  def recency(df: DataFrame, tsCol: String, asOf: Column, thresholdH: Int): DataFrame =
    df.agg(max(col(tsCol).cast("timestamp")).as("most_recent"))
      .select(unix_millis(col("most_recent")).as("most_recent_ms"),
        unix_millis(asOf).as("as_of_ms"))
      .filter(col("most_recent_ms") < col("as_of_ms") - lit(thresholdH * 3600000L))

  /** B25 `get_where_subquery`: per-test row filter applied before the test. */
  def withWhere(df: DataFrame, whereClause: Option[Column]): DataFrame =
    whereClause.fold(df)(df.filter)

  /** B19 test materialization wrapper: evaluate a test result into the
    * engine's failures/should_warn/should_error row
    * (`default__get_test_sql` @56739; defaults fail_calc=count(*),
    * warn_if/error_if = `!= 0`, limit optional).
    */
  def evaluate(failing: DataFrame, limit: Option[Int] = None,
               warnIf: Column => Column = _ =!= 0,
               errorIf: Column => Column = _ =!= 0): DataFrame = {
    val limited = limit.fold(failing)(failing.limit)
    limited.agg(count(lit(1)).as("failures"))
      .select(col("failures"),
        warnIf(col("failures")).as("should_warn"),
        errorIf(col("failures")).as("should_error"))
  }

  /** B36 `collect_freshness`: age of `max(loadedAt)` against an as-of
    * instant, classified by warn/error thresholds (source `freshness:`
    * config; `default__collect_freshness` @192559). `asOf` is a parameter —
    * the engine passes `current_timestamp`; oracle-checked queries pass a
    * pinned literal for determinism.
    */
  def freshness(df: DataFrame, loadedAt: String, asOf: Column,
                warnAfterH: Int, errorAfterH: Int): DataFrame =
    // cast: parquet sources read as TIMESTAMP_NTZ, which unix_millis
    // rejects; value-preserving under the UTC session timezone
    df.agg(max(col(loadedAt).cast("timestamp")).as("max_loaded_at"))
      .select(
        unix_millis(col("max_loaded_at")).as("max_loaded_at_ms"),
        // floor, not cast-truncation: a fresh-ahead source (max ts after
        // asOf) yields a negative fraction, where truncation gives 0 but
        // the DuckDB oracle's `//` floors to -1
        floor((unix_millis(asOf) - unix_millis(col("max_loaded_at"))) / lit(3600000L))
          .cast("long").as("hours_late"))
      .withColumn("status",
        when(col("hours_late") > errorAfterH, "error")
          .when(col("hours_late") > warnAfterH, "warn")
          .otherwise("pass"))
}
