package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.compile.Compiler

/** Round-12 Jinja surface: `{% elif %}` chains (9 reference macros use
  * them, incl. partition_by — manifest.json:1 @13262),
  * `adapter.dispatch` (51 reference macros), `run_query` set bindings
  * (12 reference macros), and the dbt boundary-count `datediff` units.
  */
class JinjaCompilerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ctx(incr: Boolean = false,
      tables: Map[String, Compiler.QueryResult] = Map.empty) =
    Compiler.ResolveCtx(refTarget = identity, sourceTarget = (_, t) => t,
      thisTarget = "t", env = Map.empty, isIncremental = incr,
      queryResults = tables)

  // ------------------------------------------------------------- elif

  test("elif: 3-arm chain picks each arm like the Jinja interpreter") {
    def chain(v: String) =
      s"{% set x = '$v' %}{% if x == 'a' %}A{% elif x == 'b' %}B" +
        "{% elif x == 'c' %}C{% else %}D{% endif %}"
    assert(Compiler.expandControlFlow(chain("a")) == "A")
    assert(Compiler.expandControlFlow(chain("b")) == "B")
    assert(Compiler.expandControlFlow(chain("c")) == "C")
    assert(Compiler.expandControlFlow(chain("z")) == "D")
  }

  test("elif: chain without else yields empty on no match") {
    val t = "{% set x = 'q' %}{% if x == 'a' %}A{% elif x == 'b' %}B{% endif %}"
    assert(Compiler.expandControlFlow(t) == "")
  }

  test("elif: loop variables drive the chain (the partition_by shape)") {
    val t = "{% for dt in ['date', 'timestamp', 'int64'] %}" +
      "{% if dt == 'date' %}D{% elif dt == 'timestamp' %}T" +
      "{% else %}I{% endif %}{% endfor %}"
    assert(Compiler.expandControlFlow(t) == "DTI")
  }

  test("elif: nested if inside an arm keeps its own endif") {
    val t = "{% set x = 'b' %}{% set y = '1' %}" +
      "{% if x == 'a' %}A{% elif x == 'b' %}" +
      "{% if y == '1' %}B1{% else %}B2{% endif %}" +
      "{% else %}C{% endif %}"
    assert(Compiler.expandControlFlow(t) == "B1")
  }

  test("elif: whitespace-control dashes accepted") {
    val t = "{% set x = 'b' %}{%- if x == 'a' -%}A{%- elif x == 'b' -%}B{%- endif -%}"
    assert(Compiler.expandControlFlow(t) == "B")
  }

  test("elif: undecidable condition keeps the fail-loud stance") {
    // the rewrite produces a nested if on an unresolved name; it must
    // survive expansion (for the SQL parser to reject), never mis-decide
    val t = "{% if mystery == 'a' %}A{% elif mystery == 'b' %}B{% endif %}"
    val out = Compiler.expandControlFlow(t)
    assert(out.contains("mystery"))
  }

  test("elif: dangling elif fails loudly") {
    intercept[IllegalArgumentException] {
      Compiler.expandControlFlow("{% elif x == 'a' %}A{% endif %}")
    }
  }

  // -------------------------------------------------- adapter.dispatch

  private def macros(defs: String, pkg: Option[String] = None) =
    Compiler.parseMacros(defs).map(m =>
      (pkg.fold(m.name)(p => s"$p.${m.name}")) -> m).toMap

  test("dispatch: spark__ impl wins over default__") {
    val ms = macros(
      """{% macro spark__money(c) %}round({{ c }}, 2){% endmacro %}
        |{% macro default__money(c) %}cast({{ c }} as decimal){% endmacro %}
        |""".stripMargin)
    assert(Compiler.expandMacros(
      "SELECT {{ adapter.dispatch('money')(amt) }}", ms)
      == "SELECT round(amt, 2)")
  }

  test("dispatch: falls back to default__ when no spark__ exists") {
    val ms = macros(
      "{% macro default__money(c) %}cast({{ c }} as decimal){% endmacro %}")
    assert(Compiler.expandMacros(
      "SELECT {{ adapter.dispatch('money')(amt) }}", ms)
      == "SELECT cast(amt as decimal)")
  }

  test("dispatch: macro_namespace searches the package, project wins") {
    val pkgMs = macros(
      """{% macro spark__trim2(c) %}pkg_spark({{ c }}){% endmacro %}
        |{% macro default__trim2(c) %}pkg_default({{ c }}){% endmacro %}
        |""".stripMargin, pkg = Some("utils"))
    // project-level spark__ shadows the package's (dbt search order)
    val projMs = macros(
      "{% macro spark__trim2(c) %}proj_spark({{ c }}){% endmacro %}")
    assert(Compiler.expandMacros(
      "{{ adapter.dispatch('trim2', 'utils')(x) }}", pkgMs ++ projMs)
      == "proj_spark(x)")
    // package-only resolution through the namespace arg
    assert(Compiler.expandMacros(
      "{{ adapter.dispatch('trim2', 'utils')(x) }}", pkgMs)
      == "pkg_spark(x)")
    // kwarg spelling
    assert(Compiler.expandMacros(
      "{{ adapter.dispatch('trim2', macro_namespace='utils')(x) }}", pkgMs)
      == "pkg_spark(x)")
  }

  test("dispatch: missing implementation fails loudly with candidates") {
    val ms = macros("{% macro unrelated() %}1{% endmacro %}")
    val e = intercept[IllegalArgumentException] {
      Compiler.expandMacros("{{ adapter.dispatch('nope')(x) }}", ms)
    }
    assert(e.getMessage.contains("spark__nope") &&
      e.getMessage.contains("default__nope"))
    // ...even with zero macros loaded
    intercept[IllegalArgumentException] {
      Compiler.expandMacros("{{ adapter.dispatch('nope')(x) }}", Map.empty)
    }
  }

  test("dispatch: a dispatching macro body resolves on the next round") {
    val ms = macros(
      """{% macro money(c) %}{{ adapter.dispatch('money')({{ c }}) }}{% endmacro %}
        |{% macro spark__money(c) %}round({{ c }}, 2){% endmacro %}
        |""".stripMargin)
    assert(Compiler.expandMacros("SELECT {{ money(amt) }}", ms)
      == "SELECT round(amt, 2)")
  }

  // ------------------------------------------------------- run_query

  test("run_query: assembleRunQueryArg splices quotes and rel calls") {
    val rel = (k: String, a: String, b: Option[String]) =>
      s"<$k:$a${b.fold("")(t => s".$t")}>"
    assert(Compiler.assembleRunQueryArg(
      "'select * from ' ~ ref('m') ~ ' where x = 1'", rel)
      == "select * from <ref:m> where x = 1")
    assert(Compiler.assembleRunQueryArg(
      "\"select {{ ref('m') }} and {{ source('a', 'b') }}\"", rel)
      == "select <ref:m> and <source:a.b>")
    intercept[IllegalArgumentException] {
      Compiler.assembleRunQueryArg("some_python_expr()", rel)
    }
  }

  test("run_query: `this` resolves bare, jinja-site, and ~-concatenated") {
    val rel = (k: String, a: String, b: Option[String]) =>
      s"<$k:$a${b.fold("")(t => s".$t")}>"
    // the canonical incremental probe idiom
    assert(Compiler.assembleRunQueryArg(
      "'select max(ts) from ' ~ this", rel)
      == "select max(ts) from <this:>")
    assert(Compiler.assembleRunQueryArg(
      "'select max(ts) from {{ this }} where ts is not null'", rel)
      == "select max(ts) from <this:> where ts is not null")
    assert(Compiler.assembleRunQueryArg(
      "'select * from ' ~ this ~ ' limit 1'", rel)
      == "select * from <this:> limit 1")
  }

  test("run_query: SQL-escaped doubled quotes stay inside the string") {
    val rel = (k: String, a: String, b: Option[String]) => s"<$k:$a>"
    // the '' flips nothing: the ~ inside stays literal, the ~ after splits
    assert(Compiler.assembleRunQueryArg(
      "'select ''a~b'' as x from ' ~ ref('m')", rel)
      == "select ''a~b'' as x from <ref:m>")
  }

  test("run_query: row iteration with index/name/dot accessors") {
    val t = Map("rs" -> Compiler.QueryResult(Seq("st", "n"),
      Seq(Seq("O", "3"), Seq("F", "5"))))
    assert(Compiler.expandControlFlow(
      "{% for r in rs %}[{{ r[0] }}:{{ r['n'] }}:{{ r.st | lower }}]{% endfor %}",
      tables = t) == "[O:3:o][F:5:f]")
    // loop.* still applies to row loops
    assert(Compiler.expandControlFlow(
      "{% for r in rs %}{{ r.st }}{% if not loop.last %},{% endif %}{% endfor %}",
      tables = t) == "O,F")
    // unknown column fails loudly
    intercept[IllegalArgumentException] {
      Compiler.expandControlFlow(
        "{% for r in rs %}{{ r.nope }}{% endfor %}", tables = t)
    }
  }

  test("run_query: columns[i].values() iteration and reduction") {
    val t = Map("rs" -> Compiler.QueryResult(Seq("st", "n"),
      Seq(Seq("O", "3"), Seq("F", "5"))))
    assert(Compiler.expandControlFlow(
      "{% for v in rs.columns[0].values() %}{{ v }};{% endfor %}",
      tables = t) == "O;F;")
    assert(Compiler.expandControlFlow(
      "{{ rs.columns[1].values() | join(' + ') }}", tables = t) == "3 + 5")
    intercept[IllegalArgumentException] { // out-of-range column
      Compiler.expandControlFlow(
        "{% for v in rs.columns[7].values() %}{{ v }}{% endfor %}", tables = t)
    }
  }

  test("get_query_results_as_dict: column access iterates and reduces") {
    val t = Map("d" -> Compiler.QueryResult(Seq("pm", "n"),
      Seq(Seq("card", "3"), Seq("cash", "5")), dict = true))
    assert(Compiler.expandControlFlow(
      "{% for pm in d['pm'] %}[{{ pm }}]{% endfor %}", tables = t)
      == "[card][cash]")
    assert(Compiler.expandControlFlow(
      "{% for pm in d.pm %}{{ pm }};{% endfor %}", tables = t)
      == "card;cash;")
    assert(Compiler.expandControlFlow(
      "{{ d['n'] | join(' + ') }}", tables = t) == "3 + 5")
    // a dict binding is not row-iterable (dbt: iterating a dict gives
    // keys, never agate rows) — fail loudly pointing at column access
    val e = intercept[IllegalArgumentException] {
      Compiler.expandControlFlow(
        "{% for r in d %}{{ r.pm }}{% endfor %}", tables = t)
    }
    assert(e.getMessage.contains("d['pm']"), e.getMessage)
    intercept[IllegalArgumentException] {
      Compiler.expandControlFlow(
        "{% for x in d['nope'] %}{{ x }}{% endfor %}", tables = t)
    }
  }

  test("get_query_results_as_dict: resolveRunQueries binds dict-style") {
    val rel = (k: String, a: String, b: Option[String]) => s"tbl_$a"
    val (sql, tables) = Compiler.resolveRunQueries(
      "{% set d = dbt_utils.get_query_results_as_dict('select pm from ' ~ ref('m')) %}SELECT 1",
      rel, q => { assert(q == "select pm from tbl_m")
        Compiler.QueryResult(Seq("pm"), Seq(Seq("card"))) })
    assert(sql == "SELECT 1" && tables("d").dict)
    // run_query bindings stay row-style
    val (_, t2) = Compiler.resolveRunQueries(
      "{% set rs = run_query('select 1') %}x", rel,
      _ => Compiler.QueryResult(Seq("c"), Seq(Seq("1"))))
    assert(!t2("rs").dict)
  }

  test("run_query: resolveRunQueries strips statements and binds results") {
    val rel = (k: String, a: String, b: Option[String]) => s"tbl_$a"
    val (sql, tables) = Compiler.resolveRunQueries(
      "{% set rs = run_query('select x from ' ~ ref('m')) %}SELECT 1",
      rel, q => { assert(q == "select x from tbl_m")
        Compiler.QueryResult(Seq("x"), Seq(Seq("7"))) })
    assert(sql == "SELECT 1" && tables("rs").rows == Seq(Seq("7")))
  }

  test("run_query: compile() consumes ctx.queryResults end-to-end") {
    val t = Map("rs" -> Compiler.QueryResult(Seq("v"), Seq(Seq("1"), Seq("2"))))
    val out = Compiler.compile(
      "SELECT {% for r in rs %}c{{ r.v }}{% if not loop.last %}, {% endif %}{% endfor %} FROM x",
      ctx(tables = t))
    assert(out == "SELECT c1, c2 FROM x")
  }

  // ------------------------------------------------------ comma-UNNEST

  test("comma-UNNEST rewrites to LATERAL VIEW explode — the reference flagship SQL verbatim") {
    // byte-for-byte the reference model (models/aggr_repo_languages.sql)
    val raw =
      """SELECT
        |    lang.name
        |    , count(distinct repo_name) as repositories_number
        |FROM {{ source('src_github', 'languages') }}
        |, unnest(language) as lang
        |group by 1""".stripMargin
    val langs = graft.ops.Flagship.languages(spark, "/root/testdata/sf0.001")
    langs.createOrReplaceTempView("languages")
    val rendered = Compiler.compile(raw, ctx())
    assert(rendered.toUpperCase.contains("LATERAL VIEW EXPLODE"), rendered)
    val got = spark.sql(rendered).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // independent DataFrame-side recompute (the A2 flagship shape)
    import org.apache.spark.sql.functions._
    val want = langs
      .select(col("repo_name"), explode(col("language")).as("lang"))
      .groupBy(col("lang.name")).agg(countDistinct("repo_name").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want && got.nonEmpty, s"got ${got.size} want ${want.size}")
  }

  // ------------------------------------------- statement-call surface

  test("statement calls: return splices, log strips, raise throws, do fails loudly") {
    // return(expr): macros are textual here, so a quoted string returns
    // its content and an expression returns its SQL text
    assert(Compiler.compile("SELECT {{ return(round(c, 2)) }} FROM t", ctx())
      == "SELECT round(c, 2) FROM t")
    assert(Compiler.compile("SELECT {{ return('lit') }} FROM t", ctx())
      == "SELECT lit FROM t")
    assert(Compiler.compile("SELECT {% do return(x + 1) %} FROM t", ctx())
      == "SELECT x + 1 FROM t")
    // log renders empty in both call forms, kwargs ignored
    assert(Compiler.compile(
      "SELECT 1{{ log('hello') }}{% do log('world', info=true) %}", ctx())
      == "SELECT 1")
    // raise_compiler_error throws with the message
    val e = intercept[IllegalArgumentException] {
      Compiler.compile(
        "{{ exceptions.raise_compiler_error('bad model config') }}", ctx())
    }
    assert(e.getMessage.contains("bad model config"), e.getMessage)
    // ...but NOT from a non-taken branch (Jinja laziness)
    assert(Compiler.compile(
      "{% if false %}{{ exceptions.raise_compiler_error('dead') }}{% endif %}SELECT 1",
      ctx()) == "SELECT 1")
    // any other {% do %} is out of scope — loudly
    val e2 = intercept[IllegalArgumentException] {
      Compiler.compile("{% do my_list.append(1) %}SELECT 1", ctx())
    }
    assert(e2.getMessage.contains("my_list.append"), e2.getMessage)
  }

  test("statement calls: return through a user macro end-to-end") {
    val ms = macros(
      """{% macro money(c) %}{{ return(round({{ c }} * 1.0, 2)) }}{% endmacro %}
        |""".stripMargin)
    val out = Compiler.compile(
      Compiler.expandMacros("SELECT {{ money(amt) }} AS m FROM t", ms), ctx())
    assert(out == "SELECT round(amt * 1.0, 2) AS m FROM t", out)
  }

  // ------------------------------------------------- datediff units

  /** Boundary-count reference implementation on java.time. */
  private def boundaryDiff(unit: String, a: java.time.LocalDate,
      b: java.time.LocalDate): Long = unit match {
    case "day" => java.time.temporal.ChronoUnit.DAYS.between(a, b)
    case "month" =>
      (b.getYear - a.getYear) * 12L + (b.getMonthValue - a.getMonthValue)
    case "quarter" =>
      (b.getYear - a.getYear) * 4L +
        ((b.getMonthValue - 1) / 3 - (a.getMonthValue - 1) / 3)
    case "year" => (b.getYear - a.getYear).toLong
    case "week" => // ISO-Monday week starts crossed
      java.time.temporal.ChronoUnit.DAYS.between(
        a.`with`(java.time.DayOfWeek.MONDAY),
        b.`with`(java.time.DayOfWeek.MONDAY)) / 7
  }

  test("datediff: boundary-count semantics across month ends, leap day, year straddle") {
    import java.time.LocalDate
    val cases = Seq(
      // one day apart but a month boundary crossed → month diff 1
      ("2020-01-31", "2020-02-01"),
      // a full month minus a day, NO boundary crossed → month diff 0
      ("2020-01-01", "2020-01-31"),
      ("2020-02-28", "2020-02-29"), // leap day
      ("2020-02-29", "2021-02-28"), // leap day across a year
      ("2019-12-31", "2020-01-01"), // year straddle: every unit crosses
      ("1999-11-15", "2003-02-03"),
      ("2020-06-10", "2020-06-10"), // identical → all zero
      ("2020-03-31", "2020-06-30"))
    val units = Seq("day", "month", "quarter", "year", "week")
    cases.foreach { case (a, b) =>
      units.foreach { u =>
        val rendered = Compiler.compile(
          s"SELECT {{ datediff('$u', \"DATE'$a'\", \"DATE'$b'\") }} AS d",
          ctx())
        val got = spark.sql(rendered).collect().head.get(0).toString.toLong
        val want = boundaryDiff(u, LocalDate.parse(a), LocalDate.parse(b))
        assert(got == want, s"datediff('$u', $a, $b): got $got want $want")
      }
    }
  }

  test("datediff: dbt datepart-LAST argument order renders identically") {
    // dbt-core's cross-db signature is datediff(first_date, second_date,
    // datepart) — a ported model's call must render the same SQL as the
    // datepart-first spelling
    val units = Seq("day", "month", "quarter", "year", "week",
      "hour", "minute", "second")
    units.foreach { u =>
      val legacy = Compiler.compile(
        s"SELECT {{ datediff('$u', a, b) }} AS d FROM t", ctx())
      val ported = Compiler.compile(
        s"SELECT {{ datediff(a, b, '$u') }} AS d FROM t", ctx())
      assert(ported == legacy, s"order mismatch for unit '$u'")
    }
    // value check through Spark on the ported order
    val rendered = Compiler.compile(
      "SELECT {{ datediff(\"DATE'2020-01-31'\", \"DATE'2020-02-01'\", 'month') }} AS d",
      ctx())
    assert(spark.sql(rendered).collect().head.get(0).toString.toLong == 1L)
  }

  test("datediff: sub-day units count truncated boundaries") {
    val rendered = Compiler.compile(
      "SELECT {{ datediff('hour', \"TIMESTAMP'2020-01-01 10:59:59'\", " +
        "\"TIMESTAMP'2020-01-01 11:00:00'\") }} AS h, " +
        "{{ datediff('minute', \"TIMESTAMP'2020-01-01 10:00:59'\", " +
        "\"TIMESTAMP'2020-01-01 10:01:00'\") }} AS m, " +
        "{{ datediff('second', \"TIMESTAMP'2020-01-01 10:00:00'\", " +
        "\"TIMESTAMP'2020-01-01 10:00:05'\") }} AS s", ctx())
    val r = spark.sql(rendered).collect().head
    assert(r.get(0).toString.toLong == 1L) // 10:59:59→11:00:00 crosses one hour boundary
    assert(r.get(1).toString.toLong == 1L)
    assert(r.get(2).toString.toLong == 5L)
  }

  // ------------------------------------------------- date_spine fix

  test("date_spine: misaligned non-day spine emits every period strictly before end") {
    // dbt-utils contract: start + k*part for every value < end
    val rendered = Compiler.compile(
      """{{ date_spine('month', "'2020-01-15'", "'2020-03-01'") }}""", ctx())
    val got = spark.sql(rendered).collect().map(_.get(0).toString).sorted
    assert(got.toSeq == Seq("2020-01-15", "2020-02-15"), got.mkString(","))
    // aligned day spine unchanged: end-exclusive
    val days = Compiler.compile(
      """{{ date_spine('day', "'2020-01-01'", "'2020-01-04'") }}""", ctx())
    assert(spark.sql(days).count() == 3)
    // degenerate: start == end → empty spine
    val empty = Compiler.compile(
      """{{ date_spine('day', "'2020-01-01'", "'2020-01-01'") }}""", ctx())
    assert(spark.sql(empty).count() == 0)
  }

  // --------------------------------------- dbt_utils.-prefixed builtins

  test("dbt_utils. prefix accepted on star and get_column_values") {
    // star: regex must capture through the prefix (engine resolves)
    val m = Compiler.starRe.findFirstMatchIn(
      "SELECT {{ dbt_utils.star(ref('m'), except=['a']) }} FROM x")
    assert(m.exists(_.group(2) == "m"))
    val g = Compiler.getColValsRe.findFirstMatchIn(
      "{% set xs = dbt_utils.get_column_values(ref('m'), 'c', 5) %}")
    assert(g.exists(x => x.group(3) == "m" && x.group(5) == "c"))
    // and dependencies() sees the prefixed forms as DAG edges
    val (refs, _) = Compiler.dependencies(
      "{% set xs = dbt_utils.get_column_values(ref('up'), 'c') %} " +
        "SELECT {{ dbt_utils.star(ref('up2')) }} FROM {{ ref('up2') }}")
    assert(refs.toSet == Set("up", "up2"))
  }

  // -------------------------------- load_relation / adapter.get_relation

  test("load_relation: direct `is [not] none` conditions resolve to literals") {
    val lookup: (String, String, Option[String]) => Option[String] = {
      case ("ref", "built", None) => Some("wh.built")
      case _ => None
    }
    val t = "{% if load_relation(ref('built')) is not none %}A{% else %}B{% endif %}" +
      "{% if load_relation(ref('missing')) is none %}C{% endif %}" +
      "{% if adapter.get_relation(database=target.database, schema='s', identifier='missing') is not none %}D{% else %}E{% endif %}"
    val resolved = Compiler.resolveRelationLookups(t, lookup)
    assert(Compiler.expandControlFlow(resolved) == "ACE", resolved)
  }

  test("get_relation: set binding drives conditions and splices relation text") {
    val lookup: (String, String, Option[String]) => Option[String] = {
      case ("ref", "built", None) => Some("parquet.`/wh/built`")
      case _ => None
    }
    val t = "{% set rel = adapter.get_relation(identifier='built') %}" +
      "{% if rel is not none %}SELECT * FROM {{ rel }}{% else %}SELECT 1{% endif %}"
    val got = Compiler.expandControlFlow(Compiler.resolveRelationLookups(t, lookup))
    assert(got == "SELECT * FROM parquet.`/wh/built`", got)
    // the none case takes the else arm; the dead {{ rel }} site prunes
    val lookupNone: (String, String, Option[String]) => Option[String] =
      (_, _, _) => None
    val got2 = Compiler.expandControlFlow(Compiler.resolveRelationLookups(t, lookupNone))
    assert(got2 == "SELECT 1", got2)
  }

  test("load_relation: this and source forms parse; unsupported arg fails loudly") {
    var seen: Option[(String, String, Option[String])] = None
    val spy: (String, String, Option[String]) => Option[String] =
      (k, a, b) => { seen = Some((k, a, b)); None }
    Compiler.resolveRelationLookups(
      "{% if load_relation(this) is none %}A{% endif %}", spy)
    assert(seen.contains(("this", "", None)))
    Compiler.resolveRelationLookups(
      "{% if load_relation(source('s', 't')) is none %}A{% endif %}", spy)
    assert(seen.contains(("source", "s", Some("t"))))
    intercept[IllegalArgumentException] {
      Compiler.resolveRelationLookups(
        "{% set r = adapter.get_relation(some_python_expr) %} r is none", spy)
    }
  }

  // ------------------------------------------------ loop filters

  test("loop filter: {% for x in xs if cond %} numbers the survivors") {
    val t = "{% for s in ['O', 'F', 'P'] if s != 'F' %}" +
      "{{ s }}{{ loop.index }}{% if not loop.last %},{% endif %}{% endfor %}"
    // F filtered out BEFORE numbering: O is 1, P is 2 (and last)
    assert(Compiler.expandControlFlow(t) == "O1,P2")
  }

  test("loop filter: membership and compound conditions filter rows of a run_query binding") {
    val rs = Compiler.QueryResult(IndexedSeq("st", "n"),
      IndexedSeq(IndexedSeq("O", "10"), IndexedSeq("F", "3"),
        IndexedSeq("P", "7")))
    val t = "{% for r in rs if r.st in ['O', 'P'] and r.n != '7' %}" +
      "{{ r.st }}:{{ r.n }}{% endfor %}"
    assert(Compiler.expandControlFlow(t, tables = Map("rs" -> rs)) == "O:10")
  }

  test("loop filter: undecidable filter fails loudly") {
    val e = intercept[IllegalArgumentException] {
      Compiler.expandControlFlow(
        "{% for s in ['a'] if mystery(s) %}{{ s }}{% endfor %}")
    }
    assert(e.getMessage.contains("undecidable"), e.getMessage)
  }

  // ------------------------- this.* accessors and adapter.quote

  test("this.schema/this.name resolve coordinates; adapter.quote backticks") {
    val c = Compiler.ResolveCtx(refTarget = identity,
      sourceTarget = (_, t) => t, thisTarget = "parquet.`/wh/a/m/x`",
      thisVals = Map("database" -> "a", "schema" -> "m",
        "identifier" -> "x"),
      env = Map.empty, isIncremental = false)
    val got = Compiler.compile(
      "SELECT '{{ this.database }}.{{ this.schema }}.{{ this.name }}' AS fq, " +
        "{{ adapter.quote('from') }} FROM {{ this }}", c)
    assert(got == "SELECT 'a.m.x' AS fq, `from` FROM parquet.`/wh/a/m/x`",
      got)
    // an attr with no value in context fails loudly, naming what exists
    val bare = c.copy(thisVals = Map.empty)
    val e = intercept[IllegalArgumentException] {
      Compiler.compile("SELECT {{ this.schema }}", bare)
    }
    assert(e.getMessage.contains("this.schema"), e.getMessage)
  }

  // ------------------------- star kwargs + filtered columns

  test("star: relation_alias/prefix/suffix kwargs; unknown kwarg loud") {
    val cols = Seq("id", "name", "ts")
    val got = Compiler.resolveStar(
      "{{ star(ref('m'), except=['ts'], relation_alias='t', " +
        "prefix='src_', suffix='_raw') }}",
      (_, _, _) => cols)
    assert(got == "t.`id` AS `src_id_raw`, t.`name` AS `src_name_raw`", got)
    val plain = Compiler.resolveStar("{{ star(ref('m')) }}", (_, _, _) => cols)
    assert(plain == "`id`, `name`, `ts`", plain)
    val e = intercept[IllegalArgumentException](Compiler.resolveStar(
      "{{ star(ref('m'), wat=1) }}", (_, _, _) => cols))
    assert(e.getMessage.contains("unknown kwargs wat"), e.getMessage)
  }

  test("get_filtered_columns_in_relation binds a loopable column list; DAG edge") {
    val sql = "{% set cols = dbt_utils.get_filtered_columns_in_relation(" +
      "ref('m'), ['secret']) %}" +
      "SELECT {% for c in cols %}max({{ c }}) AS max_{{ c }}" +
      "{% if not loop.last %}, {% endif %}{% endfor %} FROM t"
    val resolved = Compiler.resolveFilteredColumns(sql,
      (k, n, _) => { assert(k == "ref" && n == "m")
        Seq("a", "secret", "b") })
    val got = Compiler.expandControlFlow(resolved)
    assert(got == "SELECT max(a) AS max_a, max(b) AS max_b FROM t", got)
    val (refs, _) = Compiler.dependencies(sql)
    assert(refs == Seq("m"), refs.toString)
    // parse phase: empty fetch binds [] (a for over it renders nothing)
    val parsePhase = Compiler.expandControlFlow(
      Compiler.resolveFilteredColumns(sql, (_, _, _) => Nil))
    assert(parsePhase.trim == "SELECT  FROM t", parsePhase)
  }

  // ------------------------- statement-position var()/env_var()

  test("var()/env_var() resolve in set RHS, if conditions, and for iterables") {
    val ctx = Compiler.ResolveCtx(refTarget = identity,
      sourceTarget = (_, t) => t, thisTarget = "T",
      env = Map("REGION" -> "eu"), isIncremental = false,
      vars = Map("min_price" -> "100", "flag" -> "yes",
        "cols" -> "['a', 'b']"))
    val got = Compiler.compile(
      "{% set t = var('min_price') %}" +
        "{% if var('flag') == 'yes' %}LIVE{% else %}DEAD{% endif %} " +
        "{% if env_var('REGION') == 'us' %}US{% else %}EU{% endif %} " +
        "{% for c in var('cols') %}{{ c }}{% endfor %} " +
        "WHERE p > {{ t }}", ctx)
    assert(got == "LIVE EU ab WHERE p > 100", got)
    // defaults apply; a quoted literal containing 'var(' is untouched
    val dflt = Compiler.compile(
      "{% set x = var('missing', 'fallback') %}" +
        "{% set q = 'var(nope)' %}{{ x }}/{{ q }}", ctx)
    assert(dflt == "fallback/var(nope)", dflt)
    val e = intercept[IllegalArgumentException](Compiler.compile(
      "{% set x = var('missing') %}", ctx))
    assert(e.getMessage.contains("var 'missing' unset"), e.getMessage)
  }

  test("static ifs decide var() conditions before probes execute") {
    val sql = Compiler.resolveStaticIfBlocks(
      "{% if var('mode') == 'full' %}" +
        "{% call statement('x') %}DELETE FROM t{% endcall %}{% endif %}OK",
      vars = Map("mode" -> "incr"))
    assert(!sql.contains("statement"), sql)
    // an unset var leaves the block for the later (loud) compile pass
    val kept = Compiler.resolveStaticIfBlocks(
      "{% if var('mode') == 'full' %}X{% endif %}OK")
    assert(kept.contains("{% if"), kept)
  }

  // --------------------------- static-if pruning + nested guards

  test("static ifs decide via set literals; undecidable and elif chains stay") {
    val got = Compiler.resolveStaticIfBlocks(
      "{% set env = 'dev' %}" +
        "{% if env == 'prod' %}DEAD{% else %}LIVE{% endif %}" +
        "{% if mystery %}STAY{% endif %}" +
        "{% if env == 'x' %}a{% elif env == 'dev' %}b{% endif %}")
    assert(got.contains("LIVE") && !got.contains("DEAD"), got)
    // the set binding itself stays for the later control-flow pass
    assert(got.contains("{% set env = 'dev' %}"), got)
    assert(got.contains("{% if mystery %}STAY{% endif %}"), got)
    // elif chains are left whole for the elif rewrite
    assert(got.contains("elif"), got)
  }

  test("{% call %} blocks bind the body at caller() sites (wrapper macros)") {
    val macros = Compiler.parseMacros(
      """{% macro wrap(alias) %}
        |SELECT * FROM ({{ caller() }}) AS {{ alias }}
        |{% endmacro %}""".stripMargin).map(m => m.name -> m).toMap
    val got = Compiler.expandMacros(
      "{% call wrap(w) %}SELECT 1 AS x{% endcall %}", macros)
    assert(got.contains("FROM (SELECT 1 AS x) AS w"), got)
    // call statement(...) is NOT a macro call — it survives expansion
    // for the introspection machinery even when macros are loaded
    val stmt = "{% call statement('probe') %}SELECT 2{% endcall %}"
    assert(Compiler.expandMacros(stmt, macros) == stmt)
    // a macro without caller() discards the body (Jinja semantics)
    val macros2 = Compiler.parseMacros(
      "{% macro fixed() %}SELECT 9 AS n{% endmacro %}")
      .map(m => m.name -> m).toMap
    val got2 = Compiler.expandMacros(
      "{% call fixed() %}ignored{% endcall %}", macros2)
    assert(got2.trim == "SELECT 9 AS n", got2)
    // a NESTED call block would split at the inner endcall and splice
    // corrupted text — refused loudly instead
    val e = intercept[IllegalArgumentException](Compiler.expandMacros(
      "{% call wrap(w) %}{% call statement('x') %}SELECT 2{% endcall %}" +
        " tail{% endcall %}", macros))
    assert(e.getMessage.contains("nested"), e.getMessage)
  }

  test("case-distinct probe columns make row accessors ambiguous (loud)") {
    val t = Compiler.QueryResult(Seq("st", "ST"), Seq(Seq("a", "b")))
    val e = intercept[IllegalArgumentException](Compiler.expandControlFlow(
      "{% for r in rs %}{{ r.st }}{% endfor %}", tables = Map("rs" -> t)))
    assert(e.getMessage.contains("ambiguous"), e.getMessage)
    // unambiguous case-insensitive lookup still resolves
    val ok = Compiler.expandControlFlow(
      "{% for r in rs2 %}{{ r.ST }}{% endfor %}",
      tables = Map("rs2" -> Compiler.QueryResult(Seq("st"), Seq(Seq("x")))))
    assert(ok == "x", ok)
  }

  test("static ifs only use set bindings that precede the if at top level") {
    // a set AFTER the if has no value at the if (Jinja is sequential) —
    // undecidable, the block stays for the full control-flow pass
    val after = Compiler.resolveStaticIfBlocks(
      "{% if env == 'prod' %}DEAD{% endif %}{% set env = 'prod' %}OK")
    assert(after.contains("{% if"), after)
    // a name bound more than once is refused outright — which binding is
    // live depends on control flow this static pass cannot see
    val dup = Compiler.resolveStaticIfBlocks(
      "{% set env = 'dev' %}{% set env = 'prod' %}" +
        "{% if env == 'prod' %}X{% endif %}")
    assert(dup.contains("{% if"), dup)
    // a set INSIDE an undecided branch (depth > 0) does not decide a
    // sibling if — the value may not exist at that point
    val nested = Compiler.resolveStaticIfBlocks(
      "{% if mystery %}{% set flag = 'on' %}{% endif %}" +
        "{% if flag == 'on' %}STAY{% endif %}")
    assert(nested.contains("{% if flag"), nested)
  }

  test("multi-line {% %} statements resolve bare var() calls (DOTALL)") {
    val ctx = Compiler.ResolveCtx(refTarget = (s: String) => s,
      sourceTarget = (_, t) => t, thisTarget = "T", env = Map.empty,
      isIncremental = false, vars = Map("mode" -> "full"))
    val got = Compiler.compile(
      "{% if var('mode')\n    == 'full' %}LIVE{% else %}DEAD{% endif %}", ctx)
    assert(got == "LIVE", got)
  }

  test("double-quoted inline config scalars strip their quotes") {
    val cfg = Compiler.parseInlineConfig(
      "{{ config(materialized=\"table\", " +
        "pre_hook=\"INSERT INTO audit VALUES (1, 2)\") }} SELECT 1",
      graft.core.ModelConfig())
    assert(cfg.materialized == "table", cfg.materialized)
    assert(cfg.preHooks == Seq("INSERT INTO audit VALUES (1, 2)"),
      cfg.preHooks.toString)
  }

  test("statements inside a dead set-literal branch never execute (lazy Jinja)") {
    val sql = Compiler.resolveStaticIfBlocks(
      "{% set env = 'dev' %}{% if env == 'prod' %}" +
        "{% call statement('purge') %}DELETE FROM t{% endcall %}" +
        "{% endif %}SELECT 1")
    var n = 0
    val (out, _) = Compiler.resolveRunQueries(sql, (_, _, _) => "X",
      _ => { n += 1; Compiler.QueryResult(IndexedSeq.empty, IndexedSeq.empty) })
    assert(n == 0, s"dead-branch statement executed: $out")
  }

  test("is_incremental blocks with NESTED ifs split at the balanced endif") {
    val t = "{% if is_incremental() %}WHERE ts > x " +
      "{% if keep %}AND y{% endif %} AND z{% endif %}TAIL"
    val incr = Compiler.resolveIncrementalBlocks(t, isIncremental = true)
    assert(incr == "WHERE ts > x {% if keep %}AND y{% endif %} AND zTAIL",
      incr)
    val full = Compiler.resolveIncrementalBlocks(t, isIncremental = false)
    assert(full == " TAIL", full)
  }

  test("load_relation set form accepts ref()/source() arguments") {
    val got = Compiler.expandControlFlow(Compiler.resolveRelationLookups(
      "{% set rel = load_relation(ref('m')) %}" +
        "{% if rel is not none %}HAVE{% else %}MISS{% endif %}",
      (k, a, _) => { assert(k == "ref" && a == "m"); Some("REL_M") }))
    assert(got.trim == "HAVE", got)
  }

  // ------------------------------- comments + raw blocks

  test("{# comments #} strip everywhere; commented-out refs are not dependencies") {
    val ctx = Compiler.ResolveCtx(refTarget = r => s"REL_$r",
      sourceTarget = (_, t) => t, thisTarget = "T",
      env = Map.empty, isIncremental = false)
    val got = Compiler.compile(
      "SELECT a {# the {{ ref('old') }} days\nare over #} FROM {{ ref('m') }}",
      ctx)
    assert(got == "SELECT a  FROM REL_m", got)
    val (refs, srcs) = Compiler.dependencies(
      "SELECT 1 FROM {{ ref('live') }} {# {{ ref('dead') }} " +
        "{{ source('s', 't') }} #}")
    assert(refs == Seq("live") && srcs.isEmpty, s"$refs $srcs")
    // a macro call inside a comment never expands
    val macros = Map("boom" -> Compiler.MacroDef("boom", Nil,
      "{{ undefined_thing() }}"))
    assert(Compiler.expandMacros("A {# {{ boom() }} #} B", macros)
      .trim == "A  B")
  }

  test("{% raw %} bodies pass through VERBATIM past every rewrite pass") {
    val ctx = Compiler.ResolveCtx(refTarget = r => s"REL_$r",
      sourceTarget = (_, t) => t, thisTarget = "T",
      env = Map.empty, isIncremental = false)
    val got = Compiler.compile(
      "SELECT '{% raw %}{{ ref(\"not_a_ref\") }} {% if x %}{% endraw %}' " +
        "AS template, b FROM {{ ref('m') }}", ctx)
    assert(got == "SELECT '{{ ref(\"not_a_ref\") }} {% if x %}' " +
      "AS template, b FROM REL_m", got)
    // raw contents are not dependencies and survive macro expansion
    val (refs, _) = Compiler.dependencies(
      "{% raw %}{{ ref('ghost') }}{% endraw %} {{ ref('real') }}")
    assert(refs == Seq("real"), refs.toString)
    val macros = Map("m" -> Compiler.MacroDef("m", Nil, "EXPANDED"))
    val viaMacros = Compiler.expandMacros(
      "{% raw %}{{ m() }}{% endraw %} {{ m() }}", macros)
    assert(viaMacros.contains("EXPANDED") &&
      viaMacros.contains("__GRAFT_RAW_"), viaMacros)
  }

  // ------------------------------- run context + deduplicate

  test("invocation_id / run_started_at render from context; loud when absent") {
    val inst = java.time.Instant.parse("2026-03-05T07:08:09Z")
    val ctx = Compiler.ResolveCtx(refTarget = identity,
      sourceTarget = (_, t) => t, thisTarget = "T",
      env = Map.empty, isIncremental = false,
      invocationId = Some("uuid-123"), runStartedAt = Some(inst))
    val got = Compiler.compile(
      "SELECT '{{ invocation_id }}' AS inv, " +
        "'{{ run_started_at }}' AS at, " +
        "'{{ run_started_at.strftime(\"%Y%m%d\") }}' AS ymd, " +
        "'{{ run_started_at.strftime(\"%H:%M:%S\") }}' AS hms", ctx)
    assert(got.contains("'uuid-123' AS inv"), got)
    assert(got.contains("'2026-03-05 07:08:09+00:00' AS at"), got)
    assert(got.contains("'20260305' AS ymd"), got)
    assert(got.contains("'07:08:09' AS hms"), got)
    val bare = ctx.copy(invocationId = None, runStartedAt = None)
    val e1 = intercept[IllegalArgumentException](
      Compiler.compile("SELECT {{ invocation_id }}", bare))
    assert(e1.getMessage.contains("invocation_id"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](Compiler.compile(
      "SELECT {{ run_started_at.strftime('%Q') }}", ctx))
    assert(e2.getMessage.contains("unsupported directive '%Q'"),
      e2.getMessage)
  }

  test("deduplicate renders the row_number subquery over the relation site") {
    val ctx = Compiler.ResolveCtx(
      refTarget = r => s"REL_$r", sourceTarget = (a, b) => s"SRC_${a}_$b",
      thisTarget = "THIS_T", env = Map.empty, isIncremental = false)
    val got = Compiler.compile(
      "SELECT * FROM {{ dbt_utils.deduplicate(ref('m'), " +
        "partition_by='user_id', order_by='ts DESC') }}", ctx)
    assert(got ==
      "SELECT * FROM (SELECT * EXCEPT(_graft_rn) FROM (SELECT *, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY ts DESC) " +
        "AS _graft_rn FROM REL_m) WHERE _graft_rn = 1)", got)
    // this-relation spelling + the DAG edge of the ref form
    val gotThis = Compiler.compile(
      "{{ deduplicate(this, partition_by='k', order_by='v') }}", ctx)
    assert(gotThis.contains("FROM THIS_T"), gotThis)
    val (refs, _) = Compiler.dependencies(
      "{{ dbt_utils.deduplicate(ref('up'), partition_by='k', order_by='v') }}")
    assert(refs == Seq("up"), refs.toString)
  }

  // ------------------------------------------- cross-database macros

  test("cross-db macros render Spark dialect; plain SQL names pass through") {
    val ctx = Compiler.ResolveCtx(refTarget = identity,
      sourceTarget = (_, t) => t, thisTarget = "T",
      env = Map.empty, isIncremental = false)
    val got = Compiler.compile(
      "SELECT CAST(a AS {{ dbt.type_numeric() }}), " +
        "{{ dbt_utils.group_by(3) }}, " +
        "{{ dbt.position(\"'x'\", 'col') }}, " +
        "{{ date_trunc('month', 'ts') }}, " +
        "{{ dbt.string_literal(abc) }}, " +
        "{{ dbt_utils.safe_subtract(['a', 'b', 'c']) }}, " +
        "{{ dbt.bool_or('f') }}, {{ dbt.any_value('g') }}, " +
        "{{ dbt.cast_bool_to_text('b') }}, {{ dbt.right('s', 2) }}, " +
        "{{ dbt.current_timestamp() }}, " +
        "date_trunc('day', plain) AS untouched", ctx)
    assert(got.contains("CAST(a AS decimal(28, 6))"), got)
    assert(got.contains("group by 1, 2, 3"), got)
    // dbt splices string args raw: a literal carries its own quotes
    assert(got.contains("position('x', col)"), got)
    assert(got.contains("date_trunc('month', ts)"), got)
    assert(got.contains("'abc'"), got)
    assert(got.contains(
      "coalesce(a, 0) - coalesce(b, 0) - coalesce(c, 0)"), got)
    assert(got.contains("bool_or(f)") && got.contains("any_value(g)"), got)
    assert(got.contains("cast(b as string)"), got)
    assert(got.contains("right(s, 2)"), got)
    assert(got.contains("current_timestamp()"), got)
    assert(got.contains("date_trunc('day', plain) AS untouched"), got)
    val e = intercept[IllegalArgumentException](Compiler.compile(
      "{{ dbt.length('a', 'b') }}", ctx))
    assert(e.getMessage.contains("length: expected 1"), e.getMessage)
  }

  // ----------------------------------------------- pivot / unpivot

  test("pivot: literal and bound value lists with kwargs; loud on unknowns") {
    val got = Compiler.expandControlFlow(
      "SELECT g, {{ dbt_utils.pivot('st', ['O', 'F'], prefix='n_', " +
        "agg='max', cmp='!=', then_value=9, else_value=-1, " +
        "quote_identifiers=false) }} FROM t GROUP BY g")
    assert(got.contains(
      "max(case when st != 'O' then 9 else -1 end) AS n_O, " +
        "max(case when st != 'F' then 9 else -1 end) AS n_F"), got)
    val bound = Compiler.expandControlFlow(
      "{% set vals = ['a'] %}SELECT {{ pivot('c', vals) }} FROM t")
    assert(bound.contains(
      "sum(case when `c` = 'a' then 1 else 0 end) AS `a`"), bound)
    val e = intercept[IllegalArgumentException](Compiler.expandControlFlow(
      "{{ pivot('c', ['a'], wat=1) }}"))
    assert(e.getMessage.contains("unknown kwargs wat"), e.getMessage)
  }

  test("pivot: nested get_column_values normalizes to the set-binding form") {
    val norm = Compiler.normalizeUtilCalls(
      "SELECT {{ dbt_utils.pivot('st', " +
        "dbt_utils.get_column_values(ref('m'), 'st'), prefix='p_') }} FROM t")
    assert(norm.contains(
      "{% set __pivot_vals_1 = dbt_utils.get_column_values(ref('m'), 'st') %}"),
      norm)
    assert(norm.contains("{{ dbt_utils.pivot('st', __pivot_vals_1, prefix='p_') }}"),
      norm)
    // and the normalized form carries the DAG edge
    val (refs, _) = Compiler.dependencies(
      "SELECT {{ pivot('st', get_column_values(ref('m'), 'st')) }} FROM t")
    assert(refs == Seq("m"), refs.toString)
  }

  test("unpivot: melt with exclude/remove, schema from fetch; loud on bad columns") {
    val schema = Seq("id" -> "bigint", "a" -> "string",
      "b" -> "int", "junk" -> "string")
    val got = Compiler.resolveUnpivot(
      "{{ dbt_utils.unpivot(ref('m'), exclude=['id'], remove=['junk'], " +
        "field_name='col', value_name='val') }}",
      (k, n, _) => { assert(k == "ref" && n == "m"); ("REL_M", schema) })
    assert(got ==
      """SELECT `id`, 'a' AS `col`, CAST(`a` AS string) AS `val` FROM REL_M
        |UNION ALL
        |SELECT `id`, 'b' AS `col`, CAST(`b` AS string) AS `val` FROM REL_M""".stripMargin,
      got)
    val e = intercept[IllegalArgumentException](Compiler.resolveUnpivot(
      "{{ unpivot(ref('m'), exclude=['nope']) }}",
      (_, _, _) => ("R", schema)))
    assert(e.getMessage.contains("'nope' not in"), e.getMessage)
  }

  // ----------------------------------------------- for…else

  test("for-else: else arm renders only for an empty (filtered) sequence") {
    assert(Compiler.expandControlFlow(
      "{% for x in [] %}{{ x }}{% else %}NONE{% endfor %}") == "NONE")
    assert(Compiler.expandControlFlow(
      "{% for x in ['a'] %}{{ x }}{% else %}NONE{% endfor %}") == "a")
    // a filter that empties the sequence takes the else arm
    assert(Compiler.expandControlFlow(
      "{% for x in ['a'] if x == 'b' %}{{ x }}{% else %}NONE{% endfor %}")
      == "NONE")
    // an else INSIDE a nested if belongs to the if, not the for
    assert(Compiler.expandControlFlow(
      "{% for x in ['a', 'b'] %}{% if x == 'a' %}A{% else %}B{% endif %}{% endfor %}")
      == "AB")
    // empty run_query row binding takes the else arm too
    val rs = Compiler.QueryResult(IndexedSeq("c"), IndexedSeq.empty)
    assert(Compiler.expandControlFlow(
      "{% for r in rs %}{{ r.c }}{% else %}EMPTY{% endfor %}",
      tables = Map("rs" -> rs)) == "EMPTY")
  }

  // ----------------------------------------------- namespace()

  test("namespace: counters, flags, and concat accumulate through loops") {
    val t =
      """{% set ns = namespace(total=0, seen='', found=false) %}
        |{% for x in [3, 5, 9] %}
        |{% set ns.total = ns.total + x %}
        |{% set ns.seen = ns.seen ~ 'i' %}
        |{% if x == 5 %}{% set ns.found = true %}{% endif %}
        |{% endfor %}
        |total={{ ns.total }} seen={{ ns.seen }}
        |{% if ns.found %}FOUND{% else %}MISSING{% endif %}""".stripMargin
    val got = Compiler.expandControlFlow(t).trim.replaceAll("\\s+", " ")
    assert(got == "total=17 seen=iii FOUND", got)
  }

  test("do-append: lists accumulate through loops and render via reducing filters") {
    val t =
      """{% set parts = [] %}
        |{% for c in ['a', 'b', 'c'] if c != 'b' %}
        |{% do parts.append(c ~ ' AS x_' ~ c) %}
        |{% endfor %}
        |SELECT {{ parts | join(', ') }} ({{ parts | length }} cols)""".stripMargin
    val got = Compiler.expandControlFlow(t).trim.replaceAll("\\s+", " ")
    assert(got == "SELECT a AS x_a, c AS x_c (2 cols)", got)
    // declaration with seed items; first/last reducers
    val seeded = Compiler.expandControlFlow(
      "{% set xs = ['z'] %}{% do xs.append('q') %}" +
        "{{ xs | first }}/{{ xs | last }}")
    assert(seeded == "z/q", seeded)
    // append before the declaration is loud
    val e1 = intercept[IllegalArgumentException](Compiler.expandControlFlow(
      "{% do nope.append('x') %}"))
    assert(e1.getMessage.contains("before its"), e1.getMessage)
    // bare interpolation of an appended list is loud
    val e2 = intercept[IllegalArgumentException](Compiler.expandControlFlow(
      "{% set xs = [] %}{% do xs.append('a') %}{{ xs }}"))
    assert(e2.getMessage.contains("reducing"), e2.getMessage)
    // a later for over an appended list fails the termination check
    val e3 = intercept[IllegalArgumentException](Compiler.expandControlFlow(
      "{% set xs = [] %}{% do xs.append('a') %}" +
        "{% for x in xs %}{{ x }}{% endfor %}"))
    assert(e3.getMessage.contains("did not terminate") ||
      e3.getMessage.contains("not a list literal"), e3.getMessage)
  }

  test("do-append: namespace values may append; loop filter composes") {
    val t = "{% set ns = namespace(sfx='_x') %}{% set cols = [] %}" +
      "{% for c in ['id', 'ts'] %}{% do cols.append(c ~ ns.sfx) %}{% endfor %}" +
      "{{ cols | join('|') }}"
    assert(Compiler.expandControlFlow(t) == "id_x|ts_x")
  }

  test("namespace: a quoted literal matching the loop var name is never clobbered") {
    val t = "{% set ns = namespace(s='') %}" +
      "{% for w in [1, 2] %}{% set ns.s = ns.s ~ 'w' %}{% endfor %}{{ ns.s }}"
    assert(Compiler.expandControlFlow(t) == "ww")
  }

  test("namespace: conditions read state at their position; loud failures") {
    val t = "{% set ns = namespace(n=0) %}" +
      "{% if ns.n == 0 %}ZERO{% endif %}" +
      "{% set ns.n = ns.n + 1 %}" +
      "{% if ns.n == 0 %}ZERO{% else %}ONE{% endif %}{{ ns.n }}"
    assert(Compiler.expandControlFlow(t) == "ZEROONE1")
    // read of an unassigned key is loud
    val e1 = intercept[IllegalArgumentException](Compiler.expandControlFlow(
      "{% set ns = namespace(a=1) %}{{ ns.b }}"))
    assert(e1.getMessage.contains("ns.b read before assignment"),
      e1.getMessage)
    // a dotted set with no namespace declaration is loud
    val e2 = intercept[IllegalArgumentException](Compiler.expandControlFlow(
      "{% set foo.bar = 1 %}"))
    assert(e2.getMessage.contains("namespace"), e2.getMessage)
    // non-numeric arithmetic is loud
    val e3 = intercept[IllegalArgumentException](Compiler.expandControlFlow(
      "{% set ns = namespace(a='x') %}{% set ns.a = ns.a + 1 %}"))
    assert(e3.getMessage.contains("numeric operands"), e3.getMessage)
  }

  // --------------------------------------- statement / load_result

  private def fakeExec(results: Map[String, Compiler.QueryResult])(
      q: String): Compiler.QueryResult =
    results.getOrElse(q.trim, Compiler.QueryResult(
      IndexedSeq("x"), IndexedSeq(IndexedSeq(q.trim))))

  test("statement blocks execute with rel resolution; load_result binds tables and cells") {
    val sql =
      """{% call statement('probe', fetch_result=true) %}
        |  SELECT a FROM {{ ref('m') }}
        |{% endcall %}
        |{% set rows = load_result('probe') %}
        |{% set first = load_result('probe')['data'][0][0] %}
        |SELECT '{{ first }}' AS f, {{ load_result('probe')['data'][1][0] }} AS g
        |{% for r in rows %}, '{{ r.a }}'{% endfor %}""".stripMargin
    val probed = Seq.newBuilder[String]
    val (out, tables) = Compiler.resolveRunQueries(sql,
      (kind, n, _) => { assert(kind == "ref" && n == "m"); "REL_M" },
      q => { probed += q
        Compiler.QueryResult(IndexedSeq("a"),
          IndexedSeq(IndexedSeq("u"), IndexedSeq("7"))) })
    assert(probed.result() == Seq("SELECT a FROM REL_M"))
    assert(tables("rows").rows.size == 2)
    val rendered = Compiler.expandControlFlow(out, tables = tables)
    assert(rendered.contains("'u' AS f") && rendered.contains("7 AS g"),
      rendered)
    assert(rendered.contains(", 'u'") && rendered.contains(", '7'"), rendered)
  }

  test("statement: fetchless blocks execute but bind nothing; bad load_result is loud") {
    var n = 0
    val (out, tables) = Compiler.resolveRunQueries(
      "{% call statement('fire') %}DELETE FROM t{% endcall %}SELECT 1",
      (_, _, _) => "X", _ => { n += 1
        Compiler.QueryResult(IndexedSeq.empty, IndexedSeq.empty) })
    assert(n == 1 && tables.isEmpty && out.trim == "SELECT 1")
    val e1 = intercept[IllegalArgumentException](Compiler.resolveRunQueries(
      "{% set x = load_result('never') %}", (_, _, _) => "X",
      _ => Compiler.QueryResult(IndexedSeq.empty, IndexedSeq.empty)))
    assert(e1.getMessage.contains("no statement('never'"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](Compiler.resolveRunQueries(
      "{% call statement('p', fetch_result=true) %}q{% endcall %}" +
        "{{ load_result('p').status }}", (_, _, _) => "X",
      _ => Compiler.QueryResult(IndexedSeq("c"), IndexedSeq(IndexedSeq("v")))))
    assert(e2.getMessage.contains("unsupported accessor"), e2.getMessage)
  }

  // ------------------------------------------------ generic test blocks

  test("generic tests: parse + render with defaults, kwargs, and filter chains") {
    val defs = Compiler.parseGenericTests(
      """{% macro unrelated(x) %}{{ x }}{% endmacro %}
        |{% test not_below(model, column_name, floor=0) %}
        |SELECT * FROM {{ model }}
        |WHERE {{ column_name }} < {{ floor }}
        |{% endtest %}""".stripMargin)
    assert(defs.map(_.name) == Seq("not_below"))
    val mac = defs.head
    // kwarg overrides the default; model text splices verbatim
    val got = Compiler.renderGenericTest(mac, Map(
      "model" -> "{{ ref('orders') }}", "column_name" -> "amount",
      "floor" -> "100"))
    assert(got ==
      "SELECT * FROM {{ ref('orders') }}\nWHERE amount < 100", got)
    // default applies when the kwarg is absent
    val dflt = Compiler.renderGenericTest(mac, Map(
      "model" -> "{{ ref('orders') }}", "column_name" -> "amount"))
    assert(dflt.endsWith("WHERE amount < 0"), dflt)
  }

  test("generic tests: list kwargs iterate in for-loops and reduce through join") {
    val Seq(mac) = Compiler.parseGenericTests(
      """{% test none_of(model, column_name, values) %}
        |SELECT * FROM {{ model }} WHERE {{ column_name }} IN (
        |{{ values | join(', ') }})
        |{%- for v in values %} -- bans {{ v }}{% endfor %}
        |{% endtest %}""".stripMargin)
    val got = Compiler.expandControlFlow(Compiler.renderGenericTest(mac, Map(
      "model" -> "{{ ref('m') }}", "column_name" -> "status",
      "values" -> "['X', 'Y']")))
    // Jinja's join renders the raw strings (Python str join) — the
    // canonical dbt idiom wraps the site in its own quotes
    assert(got.contains("status IN (\nX, Y)"), got)
    assert(got.contains("-- bans X -- bans Y"), got)
  }

  test("generic tests: unknown kwarg, missing arg, and a non-model first param fail loudly") {
    val Seq(mac) = Compiler.parseGenericTests(
      "{% test t(model, threshold) %}SELECT {{ threshold }}{% endtest %}")
    val e1 = intercept[IllegalArgumentException](
      Compiler.renderGenericTest(mac, Map("model" -> "x", "oops" -> "1")))
    assert(e1.getMessage.contains("unknown argument") &&
      e1.getMessage.contains("oops"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      Compiler.renderGenericTest(mac, Map("model" -> "x")))
    assert(e2.getMessage.contains("missing argument 'threshold'"),
      e2.getMessage)
    val e3 = intercept[IllegalArgumentException](Compiler.parseGenericTests(
      "{% test bad(column_name) %}SELECT 1{% endtest %}"))
    assert(e3.getMessage.contains("first parameter must be 'model'"),
      e3.getMessage)
  }

  // ------------------------------------ compound condition evaluation

  test("conditions: and/or with Jinja precedence (or loosest) and parens") {
    def e(cond: String): String = Compiler.expandControlFlow(
      s"{% if $cond %}Y{% else %}N{% endif %}")
    assert(e("'a' == 'a' and 'b' == 'b'") == "Y")
    assert(e("'a' == 'a' and 'b' == 'c'") == "N")
    assert(e("'a' == 'x' or 'b' == 'b'") == "Y")
    // precedence: a or (b and c), not (a or b) and c
    assert(e("'1' == '1' or '2' == '2' and '3' == '4'") == "Y")
    assert(e("('1' == '1' or '2' == '2') and '3' == '4'") == "N")
    assert(e("not ('a' == 'b')") == "Y")
    // a quoted ' and ' never splits
    assert(e("'x and y' == 'x and y'") == "Y")
  }

  test("conditions: short-circuit decides around undecidable arms, fail-loud otherwise") {
    def e(cond: String): String = Compiler.expandControlFlow(
      s"{% if $cond %}Y{% else %}N{% endif %}")
    // a decided-true arm decides the or even with an undecidable sibling
    assert(e("'a' == 'a' or some_python_thing()") == "Y")
    assert(e("some_python_thing() and 'a' == 'b'") == "N")
    // undecidable overall → block passes through for the loud downstream
    val t = "{% if mystery() or other() %}Y{% endif %}"
    assert(Compiler.expandControlFlow(t) == t)
  }

  test("conditions: membership `in` / `not in` over literal lists") {
    def e(cond: String): String = Compiler.expandControlFlow(
      s"{% if $cond %}Y{% else %}N{% endif %}")
    assert(e("'b' in ['a', 'b', 'c']") == "Y")
    assert(e("'z' in ['a', 'b']") == "N")
    assert(e("'z' not in ['a', 'b']") == "Y")
    // loop-variable membership — the everyday macro shape
    val t = "{% for s in ['O', 'F', 'X'] %}" +
      "{% if s in ['O', 'F'] %}{{ s }}{% endif %}{% endfor %}"
    assert(Compiler.expandControlFlow(t) == "OF")
  }

  // -------------------------------- adapter.get_columns_in_relation

  test("get_columns_in_relation: binds (name, dtype) rows the loop machinery iterates") {
    val fetch: (String, String, Option[String]) => Seq[(String, String)] = {
      case ("ref", "m", None) => Seq("id" -> "bigint", "name" -> "string")
      case x => fail(s"unexpected fetch $x")
    }
    val t = "{% set cols = adapter.get_columns_in_relation(ref('m')) %}" +
      "SELECT {% for c in cols %}{{ c.name }} /* {{ c.dtype }} */" +
      "{% if not loop.last %}, {% endif %}{% endfor %} FROM m"
    val (stripped, tables) = Compiler.resolveGetColumns(t, fetch)
    val got = Compiler.expandControlFlow(stripped, tables = tables)
    assert(got == "SELECT id /* bigint */, name /* string */ FROM m", got)
  }

  test("get_columns_in_relation: empty binding (parse phase) renders zero iterations") {
    val t = "{% set cols = adapter.get_columns_in_relation(this) %}" +
      "SELECT 1{% for c in cols %}, {{ c.name }}{% endfor %}"
    val (stripped, tables) =
      Compiler.resolveGetColumns(t, (_, _, _) => Nil)
    assert(Compiler.expandControlFlow(stripped, tables = tables) == "SELECT 1")
  }

  // ------------------------------------------ model hook config parsing

  test("config(): pre_hook/post_hook parse — quoted commas survive, lists bind in order") {
    val sql = "{{ config(materialized='table', " +
      "pre_hook='insert into audit values (1, 2)', " +
      "post_hook=['select 1', 'select 2, 3']) }}\nSELECT 1"
    val cfg = Compiler.parseInlineConfig(sql, graft.core.ModelConfig())
    assert(cfg.materialized == "table")
    assert(cfg.preHooks == Seq("insert into audit values (1, 2)"))
    assert(cfg.postHooks == Seq("select 1", "select 2, 3"))
  }

  test("config(): non-hook keys still parse through the splitArgs path") {
    val sql = "{{ config(materialized='incremental', unique_key='id', " +
      "partition_by='d', incremental_predicates='ts > 1') }}\nSELECT 1"
    val cfg = Compiler.parseInlineConfig(sql, graft.core.ModelConfig())
    assert(cfg.materialized == "incremental")
    assert(cfg.uniqueKey == Seq("id") && cfg.partitionBy == Seq("d"))
    assert(cfg.incrementalPredicates == Seq("ts > 1"))
  }

  // --------------------------------------------- block-form {% set %}

  test("endset: block captures text and splices at interpolation sites") {
    val t = "{% set frag %}o_orderkey, o_orderstatus{% endset %}" +
      "SELECT {{ frag }} FROM orders"
    assert(Compiler.expandControlFlow(t).trim ==
      "SELECT o_orderkey, o_orderstatus FROM orders")
  }

  test("endset: captured fragment's refs and control flow process in place") {
    // the dbt idiom: capture a reusable SQL fragment containing jinja,
    // splice it twice — refs resolve and loops expand AFTER splicing,
    // exactly as if written inline
    val t = """{% set cols %}{% for c in ['a', 'b'] %}{{ c }}{% if not loop.last %}, {% endif %}{% endfor %}{% endset %}
              |SELECT {{ cols }} FROM {{ ref('m1') }}
              |UNION ALL SELECT {{ cols }} FROM {{ ref('m2') }}""".stripMargin
    val got = Compiler.compile(t, ctx()).replaceAll("\\s+", " ")
    assert(got == "SELECT a, b FROM m1 UNION ALL SELECT a, b FROM m2", got)
  }

  test("endset: whitespace-control dashes and multi-line bodies") {
    val t = "{%- set w -%}\nWHERE x > 0\n{%- endset -%}" +
      "SELECT * FROM t {{ w }}"
    val got = Compiler.expandControlFlow(t)
    assert(got.contains("WHERE x > 0"), got)
  }

  test("endset: two independent blocks bind separately") {
    val t = "{% set a %}AA{% endset %}{% set b %}BB{% endset %}" +
      "{{ a }}-{{ b }}-{{ a }}"
    assert(Compiler.expandControlFlow(t) == "AA-BB-AA")
  }

  test("endset: nested block-form set fails loudly") {
    val t = "{% set outer %}{% set inner %}x{% endset %}{% endset %}{{ outer }}"
    val e = intercept[IllegalArgumentException] {
      Compiler.expandControlFlow(t)
    }
    assert(e.getMessage.contains("nested"), e.getMessage)
  }

  test("endset: scalar {% set x = ... %} inside a captured body still binds") {
    val t = "{% set frag %}{% set n = '3' %}LIMIT {{ n }}{% endset %}" +
      "SELECT * FROM t {{ frag }}"
    assert(Compiler.expandControlFlow(t).replaceAll("\\s+", " ").trim ==
      "SELECT * FROM t LIMIT 3")
  }
}
