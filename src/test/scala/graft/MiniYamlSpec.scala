package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.run.MiniYaml
import graft.run.MiniYaml.{Arr, Obj, Scalar}

/** The YAML-subset parser behind dbt-native project ingestion — pinned
  * against the reference project's own files (verbatim copies below) and
  * the block/flow shapes dbt docs use.
  */
class MiniYamlSpec extends AnyFunSuite {

  test("reference sources.yml: sources with jinja database and tables") {
    // verbatim from /root/reference/models/sources.yml (incl. the
    // trailing space after `sources:`)
    val y = MiniYaml.parse(
      """version: 2
        |
        |sources:
        |  - name: src_github
        |    database: "{{ env_var('DBT_CI_BIGQUERY_PROJECT_ID') }}"
        |    schema: github
        |    tables:
        |      - name: languages
        |""".stripMargin)
    assert(y.scalar("version").contains("2"))
    val Seq(src: Obj) = y.arr("sources"): @unchecked
    assert(src.scalar("name").contains("src_github"))
    assert(src.scalar("database")
      .contains("{{ env_var('DBT_CI_BIGQUERY_PROJECT_ID') }}"))
    assert(src.scalar("schema").contains("github"))
    val Seq(tbl: Obj) = src.arr("tables"): @unchecked
    assert(tbl.scalar("name").contains("languages"))
  }

  test("reference dbt_project.yml: paths, clean-targets, +config tree") {
    val y = MiniYaml.parse(
      """name: 'demo_ci'
        |version: '1.0.0'
        |config-version: 2
        |profile: 'demo_ci'
        |source-paths: ["models"]
        |analysis-paths: ["analysis"]
        |test-paths: ["tests"]
        |data-paths: ["data"]
        |macro-paths: ["macros"]
        |snapshot-paths: ["snapshots"]
        |target-path: "target"  # directory which will store compiled SQL files
        |clean-targets:         # directories to be removed by `dbt clean`
        |  - "target"
        |  - "dbt_modules"
        |models:
        |  demo_ci:
        |    +materialized: table
        |    # Config indicated by + and applies to all files under models/example/
        |""".stripMargin)
    assert(y.scalar("name").contains("demo_ci"))
    assert(y.arr("source-paths").map { case Scalar(v) => v } == Seq("models"))
    assert(y.arr("clean-targets").map { case Scalar(v) => v }
      == Seq("target", "dbt_modules"))
    val tree = y.obj("models").get.obj("demo_ci").get
    assert(tree.scalar("+materialized").contains("table"))
  }

  test("schema.yml: columns with scalar and mapping tests") {
    val y = MiniYaml.parse(
      """version: 2
        |models:
        |  - name: orders
        |    description: All orders
        |    config:
        |      materialized: view
        |    columns:
        |      - name: order_id
        |        description: PK
        |        tests:
        |          - unique
        |          - not_null
        |      - name: status
        |        tests:
        |          - accepted_values:
        |              values: ['placed', 'shipped']
        |          - relationships:
        |              to: ref('statuses')
        |              field: id
        |""".stripMargin)
    val Seq(m: Obj) = y.arr("models"): @unchecked
    assert(m.scalar("description").contains("All orders"))
    assert(m.obj("config").get.scalar("materialized").contains("view"))
    val cols = m.arr("columns").collect { case o: Obj => o }
    assert(cols.map(_.scalar("name").get) == Seq("order_id", "status"))
    assert(cols.head.arr("tests") == Seq(Scalar("unique"), Scalar("not_null")))
    val Seq(av: Obj, rel: Obj) = cols(1).arr("tests"): @unchecked
    assert(MiniYaml.scalars(av.obj("accepted_values").get.get("values").get)
      == Seq("placed", "shipped"))
    assert(rel.obj("relationships").get.scalar("to").contains("ref('statuses')"))
    assert(rel.obj("relationships").get.scalar("field").contains("id"))
  }

  test("flow mappings, empties, comments, and loud failures") {
    val y = MiniYaml.parse(
      """seeds:
        |  types: {id: bigint, name: string}
        |  none: {}
        |  empty_list: []
        |vars:
        |  url: https://example.com/x  # not a key split
        |""".stripMargin)
    val seeds = y.obj("seeds").get
    assert(seeds.obj("types").get.scalar("id").contains("bigint"))
    assert(seeds.obj("types").get.scalar("name").contains("string"))
    assert(seeds.get("none").contains(Obj(Nil)))
    assert(seeds.get("empty_list").contains(Arr(Nil)))
    assert(y.obj("vars").get.scalar("url").contains("https://example.com/x"))
    intercept[IllegalArgumentException](MiniYaml.parse("a:\n\tb: 1"))
    intercept[IllegalArgumentException](MiniYaml.parse("just a bare line"))
  }
}
