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
