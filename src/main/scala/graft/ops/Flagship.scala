package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The reference's flagship analytic model re-expressed Spark-first.
  *
  * Reference: /root/reference/models/aggr_repo_languages.sql:1-6 —
  * {{{
  *   select lang.name, count(distinct repo_name) as repositories_number
  *   from `src_github.languages`, unnest(language) as lang group by 1
  * }}}
  * over BigQuery's `github_repos.languages`
  * (`repo_name STRING, language ARRAY<STRUCT<name STRING, bytes INT64>>`).
  *
  * That table isn't shipped, so we synthesize an identically-shaped nested
  * table deterministically from the driver testdata (FIXTURES.md §B): each
  * order is a "repo", its lineitems' part types are its "languages".
  *
  * Operators exercised (SURVEY §2.A): A1 scan, A2 lateral array flatten
  * (BigQuery comma-`unnest` drops empty/NULL arrays == Spark `explode`),
  * A3 struct field projection, A4 hash aggregate + exact COUNT(DISTINCT),
  * A5 ordinal group-by, A7 aliasing.
  *
  * Scale note: the synthesis groupBy shuffles once on the repo key; the
  * aggregation is a two-phase HashAggregate (partial count-distinct per
  * partition, final merge) — no driver-side collection anywhere, so the
  * same plan runs unchanged on a 1000-executor cluster.
  */
object Flagship {

  /** `repo_name STRING, language ARRAY<STRUCT<name STRING, bytes INT64>>`.
    * Deterministic: one row per order; array elements from that order's
    * lineitems joined to part. Orders with no high-quantity lineitem get an
    * EMPTY array (via filtered collect_list) so comma-UNNEST semantics are
    * observable.
    */
  // memoize the synthesized nested table per (session, dir): three flagship
  // queries share it, and the synthesis groupBy is their dominant cost —
  // recomputing it per query tripled the work (a real pipeline would
  // materialize this staging table once)
  def languages(spark: SparkSession, dir: String): DataFrame =
    SessionCache.getOrElseUpdate(spark, s"flagship_languages:$dir") {
      val li = TData.lineitem(spark, dir)
      val p  = TData.part(spark, dir)
      // part is a small dim at every SF → broadcast join, no shuffle of lineitem
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .groupBy(col("l_orderkey"))
        .agg(
          collect_list(
            when(col("l_quantity") > 10,
              struct(col("p_type").as("name"), col("l_partkey").as("bytes")))
          ).as("language"))
        .select(
          concat(lit("repo_"), col("l_orderkey")).as("repo_name"),
          col("language"))
        .persist(StorageLevel.MEMORY_AND_DISK_SER)
    }

  /** A1–A7: scan → lateral explode → struct access → group-by ordinal →
    * exact count-distinct → alias. `explode` (not `explode_outer`) matches
    * BigQuery's correlated comma-`unnest`, which drops rows whose array is
    * empty or NULL (aggr_repo_languages.sql:5).
    */
  def aggrRepoLanguages(spark: SparkSession, dir: String): DataFrame =
    languages(spark, dir)
      .select(col("repo_name"), explode(col("language")).as("lang"))
      .groupBy(col("lang.name").as("name"))
      .agg(countDistinct(col("repo_name")).as("repositories_number"))

  /** Oracle: flattening `explode(collect_list(x))` is the identity on the
    * pre-grouped rows, so the DuckDB oracle is the flat join with the same
    * filter — empty arrays correspond exactly to the rows the filter drops.
    */
  val aggrRepoLanguagesSql: String =
    """SELECT p.p_type AS name,
      |       count(DISTINCT 'repo_' || CAST(l.l_orderkey AS VARCHAR)) AS repositories_number
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE l.l_quantity > 10
      |GROUP BY 1""".stripMargin

  /** A2 semantics pinning, explode side: rows with empty arrays are DROPPED
    * (BigQuery comma-unnest / CROSS JOIN UNNEST). Returns per-repo element
    * counts over only repos that survive the flatten.
    */
  def explodeDropsEmpty(spark: SparkSession, dir: String): DataFrame =
    languages(spark, dir)
      .select(col("repo_name"), explode(col("language")).as("lang"))
      .groupBy(col("repo_name"))
      .agg(count(lit(1)).as("n_langs"))

  val explodeDropsEmptySql: String =
    """SELECT 'repo_' || CAST(l_orderkey AS VARCHAR) AS repo_name,
      |       count(*) AS n_langs
      |FROM lineitem WHERE l_quantity > 10
      |GROUP BY 1""".stripMargin

  /** A2 semantics pinning, outer side: `explode_outer` keeps empty/NULL
    * arrays as one row with NULL element (SQL LEFT JOIN UNNEST). Count of
    * repos that would be lost by the BigQuery comma-unnest.
    */
  def explodeOuterKeepsEmpty(spark: SparkSession, dir: String): DataFrame =
    languages(spark, dir)
      .select(col("repo_name"), explode_outer(col("language")).as("lang"))
      .filter(col("lang").isNull)
      .agg(count(lit(1)).as("empty_repos"))

  val explodeOuterKeepsEmptySql: String =
    """SELECT count(*) AS empty_repos FROM (
      |  SELECT l_orderkey FROM lineitem
      |  GROUP BY l_orderkey
      |  HAVING count(CASE WHEN l_quantity > 10 THEN 1 END) = 0
      |)""".stripMargin
}
