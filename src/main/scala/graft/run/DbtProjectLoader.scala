package graft.run

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import scala.util.matching.Regex
import graft.compile.Compiler
import graft.core.{ModelConfig, SnapshotStrategy}
import graft.dqtests.SchemaTests
import MiniYaml.{Arr, Obj, Scalar}

/** dbt-NATIVE project ingestion: a directory with `dbt_project.yml` at
  * its root (the reference repo's own layout —
  * `/root/reference/dbt_project.yml`, `.sql` models under `models`,
  * `models/schema.yml`, `models/sources.yml`, reserved `data/`,
  * `snapshots/`, `tests/`, `analysis/`, `macros/` dirs) loads through
  * this path; the engine-native `.conf` layout stays on
  * [[ProjectLoader]]. A user of the reference project can point graft at
  * their checkout unchanged.
  *
  * Ingested surface:
  *   - `dbt_project.yml`: `name`, `vars:`, `on-run-start`/`on-run-end`,
  *     the path config keys (both dbt ≤0.x `source-paths`/`data-paths`
  *     and ≥1.0 `model-paths`/`seed-paths` spellings), the `models:`
  *     `+config` tree (deeper path wins; schema.yml `config:` wins over
  *     the tree; in-file `{{ config() }}` wins over both — dbt's
  *     precedence), and `seeds:` `+column_types`.
  *   - model-dir `.yml` docs (version 2): `sources:` (tables with
  *     `identifier`, `loaded_at_field`, `freshness:` warn/error_after,
  *     and a data path via `meta: external_location:` — the public
  *     dbt-duckdb convention — or `external: location:` with optional
  *     `file_format`, dbt-external-tables), `models:` (description,
  *     `config:`, columns with descriptions + tests
  *     unique / not_null / accepted_values / relationships, each with
  *     severity/where/limit/store_failures/warn_if/error_if config),
  *     and `exposures:`.
  *   - snapshot-dir `.sql` `{% snapshot %}` blocks (timestamp + check
  *     strategies, `check_cols` `'all'` or a list,
  *     `invalidate_hard_deletes`).
  *   - test-dir `.sql` SINGULAR tests: the compiled result set is the
  *     failure set; the first `ref()` anchors DAG ordering.
  *   - analysis-dir and macro-dir `.sql` files, `packages.yml` — same
  *     semantics as the `.conf` loader.
  */
object DbtProjectLoader {

  def load(rootDir: String): (Project, Map[String, String]) = {
    val root = Paths.get(rootDir)
    val py = MiniYaml.parse(Files.readString(root.resolve("dbt_project.yml")))
    val name = py.scalar("name").getOrElse(throw new IllegalArgumentException(
      s"$rootDir/dbt_project.yml: 'name' is required"))

    def dirList(defaults: Seq[String], keys: String*): Seq[Path] = {
      val declared = keys.flatMap(k => py.arr(k)).collect { case Scalar(v) => v }
      (if (declared.nonEmpty) declared else defaults)
        .map(root.resolve).filter(Files.isDirectory(_))
    }
    val modelDirs = dirList(Seq("models"), "model-paths", "source-paths")
    val seedDirs = dirList(Seq("seeds", "data"), "seed-paths", "data-paths")
    val snapDirs = dirList(Seq("snapshots"), "snapshot-paths")
    val testDirs = dirList(Seq("tests"), "test-paths")
    val analysisDirs =
      dirList(Seq("analyses", "analysis"), "analysis-paths")
    val macroDirs = dirList(Seq("macros"), "macro-paths")

    def listRec(dir: Path, suffix: String): Seq[Path] = {
      val walk = Files.walk(dir)
      try walk.iterator().asScala
        .filter(p => Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(suffix))
        .toIndexedSeq.sortBy(_.toString)
      finally walk.close()
    }
    def stem(p: Path): String = {
      val f = p.getFileName.toString
      f.substring(0, f.lastIndexOf('.'))
    }

    val vars: Map[String, String] = py.obj("vars")
      .map(_.entries.collect { case (k, Scalar(v)) => k -> v }.toMap)
      .getOrElse(Map.empty)
    def hookList(key: String): Seq[String] = py.get(key) match {
      case Some(Scalar(v)) if v.nonEmpty => Seq(v)
      case Some(n) => MiniYaml.scalars(n)
      case None => Nil
    }

    // ------------------------- models + the dbt_project.yml config tree
    def plusKv(o: Obj): Map[String, String] = o.entries.collect {
      case (k, Scalar(v)) if k.startsWith("+") => k.drop(1) -> v
      // hook configs may be yml LISTS of SQL statements — encode them
      // HookSep-joined, the multi-hook convention applyConfigKv decodes
      // (`|`/`,` occur in real SQL,  cannot)
      case (k, Arr(items)) if k.startsWith("+") &&
          Compiler.hookKeys.contains(k.drop(1)) =>
        k.drop(1) -> items.collect { case Scalar(v) => v }
          .mkString(Compiler.HookSep)
      // flow-mapping configs (e.g. +column_types: {id: bigint}) handled
      // by the dedicated seeds walk; scalar configs only here
    }.toMap
    def treeKv(tree: Option[Obj], steps: Seq[String]): Map[String, String] = {
      var acc = tree.map(plusKv).getOrElse(Map.empty)
      var node = tree
      steps.foreach { s =>
        node = node.flatMap(_.obj(s))
        node.foreach(o => acc = acc ++ plusKv(o))
      }
      acc
    }
    val modelTree = py.obj("models")
    val modelFiles = modelDirs.flatMap(d => listRec(d, ".sql").map(d -> _))
    val dupModels = modelFiles.groupBy(f => stem(f._2)).filter(_._2.size > 1)
    require(dupModels.isEmpty,
      s"duplicate model names: ${dupModels.keys.mkString(", ")}")
    // per-model config kv from the tree, refined below by schema.yml
    val treeCfg: Map[String, Map[String, String]] = modelFiles.map {
      case (dir, p) =>
        val rel = dir.relativize(p).getParent
        val subdirs =
          if (rel == null) Nil
          else rel.iterator().asScala.map(_.toString).toSeq
        stem(p) -> treeKv(modelTree, name +: subdirs)
    }.toMap

    // --------------------------------- model-dir .yml property files
    val ymlDocs: Seq[Obj] = modelDirs
      .flatMap(d => listRec(d, ".yml") ++ listRec(d, ".yaml"))
      .filterNot(_.getFileName.toString == "dbt_project.yml")
      .map(p => MiniYaml.parse(Files.readString(p)))

    def objScalar(o: Obj, keys: String*): Option[String] =
      keys.iterator.flatMap(o.scalar).nextOption()

    // freshness: {warn_after: {count: N, period: hour|day}, ...} → hours
    def freshnessH(o: Obj, key: String): Option[Int] =
      o.obj("freshness").flatMap(_.obj(key)).flatMap { f =>
        for {
          n <- f.scalar("count").flatMap(_.toIntOption)
          p <- f.scalar("period")
        } yield p match {
          case "hour" => n
          case "day" => n * 24
          case other => throw new IllegalArgumentException(
            s"freshness period '$other' unsupported (hour|day)")
        }
      }

    val sources: Seq[SourceDef] = ymlDocs.flatMap(_.arr("sources")).collect {
      case src: Obj =>
        val sName = src.scalar("name").getOrElse(throw new
            IllegalArgumentException("source entry needs a name"))
        val db = src.scalar("database").getOrElse("")
        val schema = src.scalar("schema").getOrElse(sName)
        src.arr("tables").collect { case tbl: Obj =>
          val tName = tbl.scalar("name").getOrElse(throw new
              IllegalArgumentException(s"source '$sName': table needs a name"))
          val ident = tbl.scalar("identifier").getOrElse(tName)
          val ext = tbl.obj("meta").flatMap(_.scalar("external_location"))
            .orElse(tbl.obj("external").flatMap(_.scalar("location")))
          // no declared location → the warehouse-style path text; a read
          // fails loudly there with the full coordinates in the message
          val path = ext match {
            case Some(l) if l.startsWith("/") || l.contains("{{") => l
            case Some(l) => root.resolve(l).toString
            case None => Seq(db, schema, ident).filter(_.nonEmpty)
              .mkString("/")
          }
          val fmt = tbl.obj("external").flatMap(_.scalar("file_format"))
            .getOrElse(if (path.endsWith(".csv")) "csv" else "parquet")
          SourceDef(sName, tName, path,
            loadedAtField = objScalar(tbl, "loaded_at_field")
              .orElse(objScalar(src, "loaded_at_field")),
            warnAfterH = freshnessH(tbl, "warn_after")
              .orElse(freshnessH(src, "warn_after")),
            errorAfterH = freshnessH(tbl, "error_after")
              .orElse(freshnessH(src, "error_after")),
            filter = tbl.obj("freshness").flatMap(_.scalar("filter")),
            format = fmt)
        }
    }.flatten

    // models: descriptions, config, column tests
    val descriptions = Map.newBuilder[String, String]
    val ymlCfg = Map.newBuilder[String, Map[String, String]]
    val tests = Seq.newBuilder[TestDef]
    val testConfigKeys = Set("severity", "where", "limit", "store_failures",
      "warn_if", "error_if")
    def testCfg(o: Obj): Map[String, String] = o.entries.collect {
      case (k, Scalar(v)) if testConfigKeys.contains(k) => k -> v
    }.toMap ++ o.obj("config").map(_.entries.collect {
      case (k, Scalar(v)) if testConfigKeys.contains(k) => k -> v
    }.toMap).getOrElse(Map.empty)
    def withCfg(base: TestDef, kv: Map[String, String]): TestDef = {
      kv.get("warn_if").foreach(TestDef.threshold)
      kv.get("error_if").foreach(TestDef.threshold)
      base.copy(
        severity = kv.getOrElse("severity", base.severity),
        where = kv.get("where").orElse(base.where),
        limit = kv.get("limit").flatMap(_.toIntOption).orElse(base.limit),
        storeFailures =
          kv.get("store_failures").fold(base.storeFailures)(_ == "true"),
        warnIf = kv.get("warn_if").orElse(base.warnIf),
        errorIf = kv.get("error_if").orElse(base.errorIf))
    }
    val refRe: Regex = """ref\(\s*'([^']+)'\s*\)""".r
    val srcRe: Regex = """source\(\s*'([^']+)'\s*,\s*'([^']+)'\s*\)""".r
    def columnTests(owner: String, col: String, items: Seq[MiniYaml.Node],
                    idx: Int): Unit = items.zipWithIndex.foreach {
      case (Scalar("unique"), i) =>
        tests += TestDef(s"unique_${owner}_$col", owner,
          df => SchemaTests.unique(df, col))
      case (Scalar("not_null"), i) =>
        tests += TestDef(s"not_null_${owner}_$col", owner,
          df => SchemaTests.notNull(df, col))
      case (o: Obj, i) if o.entries.nonEmpty =>
        val (kind, body0) = o.entries.head
        val body = body0 match { case b: Obj => b; case _ => Obj(Nil) }
        val base = kind match {
          case "unique" => TestDef(s"unique_${owner}_$col", owner,
            df => SchemaTests.unique(df, col))
          case "not_null" => TestDef(s"not_null_${owner}_$col", owner,
            df => SchemaTests.notNull(df, col))
          case "accepted_values" =>
            val values = body.get("values").map(MiniYaml.scalars)
              .getOrElse(Nil)
            require(values.nonEmpty,
              s"accepted_values on $owner.$col needs values")
            TestDef(s"accepted_values_${owner}_$col", owner,
              df => SchemaTests.acceptedValues(df, col, values))
          case "relationships" =>
            val to = body.scalar("to").getOrElse(throw new
                IllegalArgumentException(
                  s"relationships on $owner.$col needs to:"))
            val field = body.scalar("field").getOrElse(throw new
                IllegalArgumentException(
                  s"relationships on $owner.$col needs field:"))
            val parent = to.trim match {
              case refRe(m) => m
              case srcRe(s, t) => s"source:$s.$t"
              case other => throw new IllegalArgumentException(
                s"relationships to: must be ref('m') or source('s','t'), " +
                  s"got '$other'")
            }
            TestDef(s"relationships_${owner}_$col", owner, df => df,
              relationship = Some(RelationshipDef(parent, col, field)))
          case other => throw new IllegalArgumentException(
            s"unsupported schema test '$other' on $owner.$col")
        }
        tests += withCfg(base, testCfg(body))
      case (other, _) => throw new IllegalArgumentException(
        s"unsupported test entry on $owner.$col: $other")
    }
    ymlDocs.foreach { y =>
      y.arr("models").foreach {
        case m: Obj =>
          val mName = m.scalar("name").getOrElse(throw new
              IllegalArgumentException("model doc entry needs a name"))
          m.scalar("description").filter(_.nonEmpty)
            .foreach(d => descriptions += mName -> d)
          m.obj("config").foreach(c => ymlCfg += mName -> c.entries.collect {
            case (k, Scalar(v)) => k -> v
            // hook lists, HookSep-joined (see plusKv)
            case (k, Arr(items)) if Compiler.hookKeys.contains(k) =>
              k -> items.collect { case Scalar(v) => v }
                .mkString(Compiler.HookSep)
          }.toMap)
          m.arr("columns").zipWithIndex.foreach {
            case (c: Obj, i) =>
              val cName = c.scalar("name").getOrElse(throw new
                  IllegalArgumentException(s"$mName: column needs a name"))
              c.scalar("description").filter(_.nonEmpty)
                .foreach(d => descriptions += s"$mName.$cName" -> d)
              columnTests(mName, cName, c.arr("tests") ++
                c.arr("data_tests"), i)
            case _ => ()
          }
        case _ => ()
      }
      // tests declared under source tables bind to `source:<s>.<t>`
      y.arr("sources").foreach {
        case src: Obj =>
          val sName = src.scalar("name").getOrElse("")
          src.arr("tables").foreach {
            case tbl: Obj =>
              val owner = s"source:$sName.${tbl.scalar("name").getOrElse("")}"
              tbl.arr("columns").foreach {
                case c: Obj => columnTests(owner,
                  c.scalar("name").getOrElse(""),
                  c.arr("tests") ++ c.arr("data_tests"), 0)
                case _ => ()
              }
            case _ => ()
          }
        case _ => ()
      }
    }
    val ymlCfgMap = ymlCfg.result()

    val models = modelFiles.map { case (_, p) =>
      val kv = treeCfg(stem(p)) ++ ymlCfgMap.getOrElse(stem(p), Map.empty)
      ModelDef(stem(p), Files.readString(p),
        Compiler.applyConfigKv(kv, ModelConfig()))
    }

    // exposures: name, depends_on [ref('m')], owner {name,email}, url
    val exposures = ymlDocs.flatMap(_.arr("exposures")).collect {
      case e: Obj =>
        val deps = e.arr("depends_on").collect { case Scalar(v) =>
          v.trim match { case refRe(m) => m; case other => other }
        }
        ExposureDef(e.scalar("name").getOrElse("exposure"), deps,
          owner = e.obj("owner").flatMap(o =>
            o.scalar("name").orElse(o.scalar("email"))).getOrElse(""),
          url = e.scalar("url").getOrElse(""))
    }

    // ------------------------------------------------------------ seeds
    val seedTree = py.obj("seeds").flatMap(_.obj(name))
    def seedTypes(seed: String): Map[String, String] =
      seedTree.flatMap(_.obj(seed)).flatMap(_.get("+column_types")).map {
        case o: Obj => o.entries.collect { case (k, Scalar(v)) => k -> v }.toMap
        case _ => Map.empty[String, String]
      }.getOrElse(Map.empty)
    val seeds = seedDirs.flatMap(listRec(_, ".csv")).map(p =>
      SeedDef(stem(p), p.toString, seedTypes(stem(p))))

    // ------------------------------------------------- snapshot blocks
    val snapshotBlockRe: Regex =
      """(?s)\{%-?\s*snapshot\s+([A-Za-z_]\w*)\s*-?%\}(.*?)\{%-?\s*endsnapshot\s*-?%\}""".r
    val snapshots = snapDirs.flatMap(listRec(_, ".sql")).flatMap { p =>
      snapshotBlockRe.findAllMatchIn(Files.readString(p)).map { m =>
        val (snapName, body) = (m.group(1), m.group(2))
        val kv = Compiler.parseSnapshotConfig(body)
        val strategy = kv.get("strategy") match {
          case Some("check") => SnapshotStrategy.Check(
            kv.get("check_cols").map(_.split("\\|").toSeq)
              .filterNot(_ == Seq("all")))
          case _ => SnapshotStrategy.Timestamp(kv.getOrElse("updated_at",
            throw new IllegalArgumentException(
              s"snapshot $snapName: updated_at required")))
        }
        SnapshotDef(snapName, body,
          kv.get("unique_key").map(_.split("\\|").toSeq).getOrElse(
            throw new IllegalArgumentException(
              s"snapshot $snapName: unique_key required")),
          strategy,
          invalidateHardDeletes =
            kv.get("invalidate_hard_deletes").contains("true"))
      }
    }

    // ------------------------------------------------- singular tests
    val singular = testDirs.flatMap(listRec(_, ".sql")).map { p =>
      val sql = Files.readString(p)
      val (refs, srcs) = Compiler.dependencies(sql)
      val anchor = refs.headOption.orElse(
        srcs.headOption.map { case (s, t) => s"source:$s.$t" })
        .getOrElse(throw new IllegalArgumentException(
          s"singular test ${stem(p)} references no ref()/source() — " +
            "nothing to test"))
      TestDef(stem(p), anchor, df => df, sql = Some(sql))
    }

    // ------------------------------------- macros, packages, analyses
    val macroDefs = macroDirs.flatMap(d => listRec(d, ".sql"))
      .flatMap(p => Compiler.parseMacros(Files.readString(p)))
    val dupMacros = macroDefs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dupMacros.isEmpty,
      s"duplicate macro definitions: ${dupMacros.mkString(", ")}")
    val pkgMacros = ProjectLoader.packageMacros(root,
      macroDefs.map(_.name).toSet)
    val macros = pkgMacros ++ macroDefs.map(m => m.name -> m).toMap

    val analyses = analysisDirs.flatMap(listRec(_, ".sql"))
      .map(p => ModelDef(stem(p), Files.readString(p)))

    // selectors.yml: named selector compositions. The scalar
    // `definition:` form maps onto the engine's selector grammar
    // directly; the structured method/value tree is out of scope and
    // refuses loudly.
    val selectors = {
      val f = root.resolve("selectors.yml")
      if (!Files.exists(f)) Nil
      else MiniYaml.parse(Files.readString(f)).arr("selectors").collect {
        case s: Obj =>
          val n = s.scalar("name").getOrElse(throw new
              IllegalArgumentException("selectors.yml: entry needs a name"))
          val defn = s.scalar("definition").filter(_.nonEmpty)
            .getOrElse(throw new IllegalArgumentException(
              s"selectors.yml: selector '$n' needs a scalar definition " +
                "string (the structured method/value form is unsupported)"))
          SelectorDef(n, defn,
            exclude = s.scalar("exclude").getOrElse(""))
      }
    }

    // docs blocks land in descriptions via doc() — same as the .conf path
    val docsBlocks = (modelDirs.flatMap(d => listRec(d, ".md")) ++
      Option(root.resolve("docs")).filter(Files.isDirectory(_)).toSeq
        .flatMap(listRec(_, ".md")))
      .flatMap(p => Compiler.parseDocsBlocks(Files.readString(p))).toMap
    val resolvedDescriptions = descriptions.result().map { case (k, v) =>
      k -> Compiler.resolveDocRefs(v, docsBlocks)
    }

    (Project(name, sources, models, seeds, snapshots,
      tests.result() ++ singular,
      onRunStart = hookList("on-run-start"),
      onRunEnd = hookList("on-run-end"),
      macros = macros, vars = vars, exposures = exposures,
      selectors = selectors,
      analyses = analyses, descriptions = resolvedDescriptions),
      Map("name" -> name) ++ py.scalar("profile").map("profile" -> _))
  }
}
