package graft.compile

import java.security.MessageDigest
import scala.util.matching.Regex
import graft.core.{ModelConfig, Relation}

/** The Jinja-SQL surface the reference project actually uses (SURVEY §2
  * B49, §3.1): `ref()`, `source()`, `env_var()`, `config()`, `this`,
  * `is_incremental()`, and the canonical incremental guard block
  * `{% if is_incremental() %} … {% endif %}`
  * (/root/reference/models/aggr_repo_languages.sql:4 uses `source`;
  * test_profiles/profiles.yml:8,20 and models/sources.yml:5 use
  * `env_var`). Resolution is textual, exactly like dbt's compile phase:
  * the compiled artifact is plain Spark SQL.
  *
  * Relations resolve to `parquet.`/path/`` table syntax, so compiled SQL
  * runs directly against the path-addressed warehouse with full Catalyst
  * pushdown — no temp-view bookkeeping; view models resolve to their
  * registered temp-view name instead.
  */
object Compiler {

  private val refRe: Regex = """\{\{\s*ref\(\s*'([^']+)'\s*\)\s*\}\}""".r
  private val sourceRe: Regex = """\{\{\s*source\(\s*'([^']+)'\s*,\s*'([^']+)'\s*\)\s*\}\}""".r
  private val envVarRe: Regex = """\{\{\s*env_var\(\s*'([^']+)'(?:\s*,\s*'([^']*)')?\s*\)\s*\}\}""".r
  private val thisRe: Regex = """\{\{\s*this\s*\}\}""".r
  private val configRe: Regex = """(?s)\{\{\s*config\((.*?)\)\s*\}\}""".r
  private val incrBlockRe: Regex =
    """(?s)\{%\s*if\s+is_incremental\(\)\s*%\}(.*?)\{%\s*endif\s*%\}""".r
  // both the jinja form and the bare scripting-variable form the reference
  // uses in model SQL (`_dbt_max_partition` is a declared variable in
  // BigQuery scripts, not a jinja call)
  private val maxPartRe: Regex =
    """\{\{\s*_dbt_max_partition\s*\}\}|\b_dbt_max_partition\b""".r

  /** Dependency edges of a raw model SQL (parse phase — SURVEY §3.1 step 3:
    * `parent_map` is derived from ref/source calls before any execution).
    */
  def dependencies(rawSql: String): (Seq[String], Seq[(String, String)]) = {
    val refs = refRe.findAllMatchIn(rawSql).map(_.group(1)).toSeq.distinct
    val sources = sourceRe.findAllMatchIn(rawSql)
      .map(m => (m.group(1), m.group(2))).toSeq.distinct
    (refs, sources)
  }

  /** Inline `config(key=value, …)` overrides (reference `config()` context
    * fn; values are literal strings/idents/numbers — the subset dbt models
    * use in-file).
    */
  def parseInlineConfig(rawSql: String, base: ModelConfig): ModelConfig = {
    configRe.findFirstMatchIn(rawSql).map(_.group(1)) match {
      case None => base
      case Some(body) =>
        val kvs = body.split(",").iterator.map(_.trim).filter(_.nonEmpty)
          .flatMap { kv =>
            kv.split("=", 2) match {
              case Array(k, v) => Some(k.trim -> v.trim.stripPrefix("'").stripSuffix("'"))
              case _ => None
            }
          }.toMap
        var cfg = base
        kvs.get("materialized").foreach(v => cfg = cfg.copy(materialized = v))
        kvs.get("unique_key").foreach(v => cfg = cfg.copy(uniqueKey = Seq(v)))
        kvs.get("partition_by").foreach(v => cfg = cfg.copy(partitionBy =
          v.split(",").map(_.trim).filter(_.nonEmpty).toIndexedSeq))
        kvs.get("incremental_strategy").foreach { v =>
          import graft.core.IncrementalStrategy._
          cfg = cfg.copy(incrementalStrategy = v match {
            case "insert_overwrite" => InsertOverwrite
            case "delete+insert" => DeleteInsert
            case _ => Merge
          })
        }
        cfg
    }
  }

  final case class ResolveCtx(
      refTarget: String => String,      // model name → SQL relation text
      sourceTarget: (String, String) => String,
      thisTarget: String,               // the model's own relation text
      env: Map[String, String],
      isIncremental: Boolean,
      // `_dbt_max_partition` (reference bq_insert_overwrite @34992): the
      // target's current max partition value as a pre-rendered SQL literal,
      // substituted into the compiled text so Catalyst sees a constant and
      // can prune the source scan. None outside incremental runs → NULL
      // (harmless: references live inside is_incremental() blocks).
      maxPartition: Option[String] = None)

  /** Render raw model SQL to executable Spark SQL (SURVEY §3.1 step 2). */
  def compile(rawSql: String, ctx: ResolveCtx): String = {
    var sql = configRe.replaceAllIn(rawSql, "")
    sql = incrBlockRe.replaceAllIn(sql,
      m => if (ctx.isIncremental) Regex.quoteReplacement(m.group(1)) else " ")
    sql = refRe.replaceAllIn(sql,
      m => Regex.quoteReplacement(ctx.refTarget(m.group(1))))
    sql = sourceRe.replaceAllIn(sql,
      m => Regex.quoteReplacement(ctx.sourceTarget(m.group(1), m.group(2))))
    sql = envVarRe.replaceAllIn(sql, m =>
      Regex.quoteReplacement(ctx.env.getOrElse(m.group(1),
        Option(m.group(2)).getOrElse(
          throw new IllegalArgumentException(s"env_var ${m.group(1)} unset, no default")))))
    sql = thisRe.replaceAllIn(sql, Regex.quoteReplacement(ctx.thisTarget))
    sql = maxPartRe.replaceAllIn(sql,
      Regex.quoteReplacement(ctx.maxPartition.getOrElse("NULL")))
    sql.trim
  }

  /** Whether raw model SQL references `_dbt_max_partition` at all — lets
    * the engine skip the max-partition fetch job when unused.
    */
  def referencesMaxPartition(rawSql: String): Boolean =
    maxPartRe.findFirstIn(rawSql).isDefined

  /** `parquet.`/path/`` — Spark SQL's direct-path table syntax. */
  def pathRelation(path: String): String = s"parquet.`$path`"

  /** sha256 of the raw SQL — the reference's node checksum
    * (manifest.json:1 `checksum: {name: "sha256"}`), basis of
    * `state:modified` selection.
    */
  def checksum(rawSql: String): String =
    MessageDigest.getInstance("SHA-256").digest(rawSql.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
}
