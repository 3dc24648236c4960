package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + BASELINE.md.
  *
  * Every implemented operator from SURVEY.md §2 gets a named entry in
  * [[queries]]; where the semantics are ANSI-SQL-expressible the matching
  * DuckDB oracle is in [[oracleSql]] (same result schema, same column
  * names — the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query (SURVEY §2.A A1–A7) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Flagship.aggrRepoLanguages(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a_flagship_languages" -> (Flagship.aggrRepoLanguages _),
    "a2_explode_drops_empty" -> (Flagship.explodeDropsEmpty _),
    "a2_explode_outer_keeps_empty" -> (Flagship.explodeOuterKeepsEmpty _)
  )

  /** DuckDB-runnable ANSI SQL per queries key (same parquet tables). */
  def oracleSql: Map[String, String] = Map(
    "a_flagship_languages" -> Flagship.aggrRepoLanguagesSql,
    "a2_explode_drops_empty" -> Flagship.explodeDropsEmptySql,
    "a2_explode_outer_keeps_empty" -> Flagship.explodeOuterKeepsEmptySql
  )
}
