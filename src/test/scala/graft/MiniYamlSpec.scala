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

  test("anchors + merge keys: the profiles.yml shared-defaults idiom") {
    val y = MiniYaml.parse(
      """defaults: &defaults
        |  type: spark
        |  threads: 4
        |  schema: main
        |my_profile:
        |  outputs:
        |    dev:
        |      <<: *defaults
        |      schema: dev_schema
        |    prod:
        |      <<: *defaults
        |      threads: 16
        |""".stripMargin)
    val dev = y.obj("my_profile").get.obj("outputs").get.obj("dev").get
    assert(dev.scalar("type").contains("spark"))
    assert(dev.scalar("threads").contains("4"))
    assert(dev.scalar("schema").contains("dev_schema")) // own key wins
    val prod = y.obj("my_profile").get.obj("outputs").get.obj("prod").get
    assert(prod.scalar("threads").contains("16"))
    assert(prod.scalar("schema").contains("main"))
  }

  test("scalar anchors, aliases in values and flow lists, merge lists") {
    val y = MiniYaml.parse(
      """base_schema: &sch analytics
        |a: &one
        |  x: 1
        |b: &two
        |  x: 2
        |  y: 3
        |merged:
        |  <<: [*one, *two]
        |copy: *sch
        |lst: [*sch, other]
        |""".stripMargin)
    assert(y.scalar("copy").contains("analytics"))
    assert(MiniYaml.scalars(y.get("lst").get) == Seq("analytics", "other"))
    val m = y.obj("merged").get
    assert(m.scalar("x").contains("1")) // earlier merge source wins
    assert(m.scalar("y").contains("3"))
    // an alias with no preceding anchor fails loudly, naming it
    val e = intercept[IllegalArgumentException](
      MiniYaml.parse("a: *ghost"))
    assert(e.getMessage.contains("ghost"), e.getMessage)
  }

  test("anchored sequence items alias whole mappings") {
    val y = MiniYaml.parse(
      """shared:
        |  - &col
        |    name: id
        |    tests: [unique]
        |again: *col
        |""".stripMargin)
    assert(y.obj("again").get.scalar("name").contains("id"))
  }

  test("anchor on a dash-line head-field value registers and strips") {
    // `- name: &a foo` — the schema.yml idiom; the anchor must bind the
    // VALUE (not leak into the scalar text)
    val y = MiniYaml.parse(
      """cols:
        |  - name: &keycol order_id
        |    tests: [unique]
        |  - name: other
        |ref: *keycol
        |""".stripMargin)
    val first = y.arr("cols").head.asInstanceOf[MiniYaml.Obj]
    assert(first.scalar("name").contains("order_id"))
    assert(y.scalar("ref").contains("order_id"))
  }

  test("folded scalar: n blank lines fold to n newlines, not n+1") {
    val y = MiniYaml.parse(
      """one_blank: >
        |  a
        |  b
        |
        |  c
        |two_blanks: >
        |  a
        |
        |
        |  c
        |""".stripMargin)
    assert(y.scalar("one_blank").contains("a b\nc\n"))
    assert(y.scalar("two_blanks").contains("a\n\nc\n"))
  }

  test("literal | block scalars keep newlines; > folds; - chomps") {
    val y = MiniYaml.parse(
      """description: |
        |  line one
        |  line two
        |
        |  after blank
        |folded: >
        |  word one
        |  word two
        |chomped: |-
        |  no trailing
        |tail: 1
        |""".stripMargin)
    assert(y.scalar("description")
      .contains("line one\nline two\n\nafter blank\n"))
    assert(y.scalar("folded").contains("word one word two\n"))
    assert(y.scalar("chomped").contains("no trailing"))
    assert(y.scalar("tail").contains("1"))
    // a # inside a block scalar is CONTENT, not a comment
    val c = MiniYaml.parse("q: |\n  select 1 -- x\n  # not a comment\n")
    assert(c.scalar("q").contains("select 1 -- x\n# not a comment\n"))
    // |+ keep mode is refused loudly
    intercept[IllegalArgumentException](MiniYaml.parse("a: |+\n  x\n"))
  }

  test("block scalar on a sequence item's dash line") {
    val y = MiniYaml.parse(
      """models:
        |  - description: |
        |      first
        |      second
        |    name: m1
        |""".stripMargin)
    val Seq(m: Obj) = y.arr("models"): @unchecked
    assert(m.scalar("description").contains("first\nsecond\n"))
    assert(m.scalar("name").contains("m1"))
  }
}
