package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.materialize._
import graft.run.DateUtils

/** Property tests (SURVEY §5): merge last-writer-wins/idempotence and the
  * SCD-2 invariants hold for arbitrary generated run-pairs, not just the
  * handcrafted fixtures. (Plain scalacheck generators with a fixed seed —
  * the scalatest bridge artifact isn't in the offline cache.)
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshWh() =
    new Warehouse(spark, Files.createTempDirectory("graft_prop").toString)

  /** Deterministic sample stream for a Gen. */
  private def samples[A](g: Gen[A], n: Int, seed0: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed0 + i)))

  private val rowsGen: Gen[List[(Long, String, Double)]] =
    Gen.listOf(for {
      id <- Gen.choose(0L, 30L)
      payload <- Gen.oneOf("a", "b", "c", "d")
      v <- Gen.choose(-100.0, 100.0)
    } yield (id, payload, v))

  private def dedupByKey(rows: List[(Long, String, Double)]) =
    rows.groupBy(_._1).map(_._2.last).toList

  test("property: warn_if/error_if threshold parser matches its comparator") {
    import graft.run.TestDef
    val cases = for {
      op <- Gen.oneOf(">", ">=", "<", "<=", "=", "!=")
      k <- Gen.choose(0L, 1000L)
      n <- Gen.choose(0L, 1200L)
      pad <- Gen.oneOf("", " ", "  ")
    } yield (op, k, n, pad)
    samples(cases, 300, 7L).foreach { case (op, k, n, pad) =>
      val want = op match {
        case ">" => n > k; case ">=" => n >= k; case "<" => n < k
        case "<=" => n <= k; case "=" => n == k; case "!=" => n != k
      }
      assert(TestDef.threshold(s"$pad$op$pad$k$pad")(n) == want,
        s"'$op$k' on $n")
    }
    assertThrows[IllegalArgumentException](TestDef.threshold("10"))
    assertThrows[IllegalArgumentException](TestDef.threshold("> -1"))
    assertThrows[IllegalArgumentException](TestDef.threshold("=> 3"))
  }

  test("property: unescapePathName decodes %XX only, never '+'") {
    assert(Warehouse.unescapePathName("a+b") == "a+b")
    assert(Warehouse.unescapePathName("a%20b") == "a b")
    assert(Warehouse.unescapePathName("14%3A30") == "14:30")
    assert(Warehouse.unescapePathName("100%") == "100%")   // dangling %
    assert(Warehouse.unescapePathName("%zz") == "%zz")     // bad hex
    assert(Warehouse.unescapePathName("%25%32%35") == "%25") // no double decode
  }

  test("property: type widening is lossless or refuses loudly across arbitrary numeric ladders") {
    // for ANY pair of numeric types on the int->long->double ladder, a
    // merge of an increment typed differently from the target must
    // either (a) produce the WIDER of the two types AND preserve every
    // value exactly, or (b) — when no provably lossless promotion exists
    // (long<->double: doubles hold integers exactly only to 2^53) —
    // refuse loudly with the full_refresh hint. Silent wrap/null/
    // precision-loss is structurally excluded either way.
    import org.apache.spark.sql.types._
    val s = spark; import s.implicits._
    val ladder: Seq[(DataType, Seq[Long])] = Seq(
      (IntegerType, Seq(7L, -3L, Int.MaxValue.toLong)),
      (LongType, Seq(7L, -3L, 5000000000L)),
      (DoubleType, Seq(7L, -3L, 1L << 53)))
    def rank(t: DataType) = ladder.indexWhere(_._1 == t)
    val pairs = for {
      (t1, _) <- ladder; (t2, vals) <- ladder
    } yield (t1, t2, vals)
    pairs.foreach { case (tgtT, incT, incVals) =>
      val wh = freshWh(); val m = new Materializer(wh)
      val r = Relation("db", "s", s"widen_${tgtT.typeName}_${incT.typeName}")
      val cfg = ModelConfig(materialized = "incremental", uniqueKey = Seq("id"))
      val base = Seq((0L, 1L)).toDF("id", "v")
        .select(col("id"), col("v").cast(tgtT).as("v"))
      m.incremental(base, r, cfg)
      val inc = incVals.zipWithIndex.map { case (v, i) => (i + 1L, v) }
        .toDF("id", "v")
        .select(col("id"), col("v").cast(incT).as("v"))
      // only the direction that would REWRITE stored history refuses: a
      // long target receiving a double increment has no lossless common
      // type. The reverse (double target, long increment) keeps the
      // author-declared double and casts the increment up on conform —
      // dbt's incremental contract (and these test values are < 2^53,
      // so the cast is exact here).
      val lossyCrossing = tgtT == LongType && incT == DoubleType
      if (lossyCrossing) {
        val ex = intercept[IllegalStateException](m.incremental(inc, r, cfg))
        assert(ex.getMessage.contains("full_refresh"),
          s"$tgtT<-$incT must refuse with the full_refresh hint: ${ex.getMessage}")
      } else {
        m.incremental(inc, r, cfg)
        val out = wh.read(r)
        val wider = if (rank(incT) >= rank(tgtT)) incT else tgtT
        assert(out.schema("v").dataType == wider,
          s"$tgtT target + $incT increment must store ${wider.sql}")
        val got = out.filter(col("id") >= 1)
          .select(col("id"), col("v").cast("double"))
          .as[(Long, Double)].collect().toMap
        incVals.zipWithIndex.foreach { case (v, i) =>
          assert(got(i + 1L) == v.toDouble,
            s"$tgtT<-$incT: value $v must survive exactly, got ${got(i + 1L)}")
        }
      }
    }
  }

  test("float/decimal rungs: widening takes only provably lossless promotions") {
    // the fractional half of the lattice, exercised through the same
    // public incremental path: float→double and decimal GROWTH are the
    // only automatic promotions; every integral↔fractional crossing that
    // could drop bits (long/int target ← float/double inc, float target ←
    // long inc, decimal shrink) refuses with the full_refresh hint.
    import org.apache.spark.sql.types._
    val s = spark; import s.implicits._
    def run(tgtT: DataType, incT: DataType): Either[String, DataType] = {
      val wh = freshWh(); val m = new Materializer(wh)
      val r = Relation("db", "s",
        s"fw_${tgtT.simpleString}_${incT.simpleString}"
          .replaceAll("[^a-z0-9_]", "_"))
      val cfg = ModelConfig(materialized = "incremental", uniqueKey = Seq("id"))
      m.incremental(Seq((0L, 1L)).toDF("id", "v")
        .select(col("id"), col("v").cast(tgtT).as("v")), r, cfg)
      val inc = Seq((1L, 2L)).toDF("id", "v")
        .select(col("id"), col("v").cast(incT).as("v"))
      try { m.incremental(inc, r, cfg); Right(wh.read(r).schema("v").dataType) }
      catch { case e: IllegalStateException => Left(e.getMessage) }
    }
    // automatic lossless promotions
    assert(run(FloatType, DoubleType) == Right(DoubleType))
    assert(run(DoubleType, FloatType) == Right(DoubleType)) // target covers
    assert(run(IntegerType, DoubleType) == Right(DoubleType)) // 32-bit < 53-bit mantissa
    assert(run(DecimalType(10, 2), DecimalType(12, 2)) == Right(DecimalType(12, 2))) // growth
    // declared-type-wins: the increment is NARROWER, history never moves —
    // conform casts incoming rows up to the stored type (standard insert
    // semantics; the author declared the column float/decimal)
    assert(run(FloatType, LongType) == Right(FloatType))
    assert(run(DecimalType(12, 2), DecimalType(10, 2)) == Right(DecimalType(12, 2)))
    // refusals: every bit-dropping HISTORY rewrite, with the hint
    Seq((LongType: DataType, FloatType: DataType),
        (LongType, DoubleType),
        (IntegerType, FloatType), // float holds ints exactly only to 2^24
        (DecimalType(10, 2), DecimalType(10, 4))) // more scale, less headroom
      .foreach { case (t, i) =>
        val got = run(t, i)
        assert(got.isLeft && got.swap.exists(_.contains("full_refresh")),
          s"$t<-$i must refuse with the full_refresh hint, got $got")
      }
  }

  test("property: merge result = last-writer-wins union of key spaces") {
    val cases = samples(Gen.zip(rowsGen, rowsGen), 8, 1000L)
    assert(cases.nonEmpty)
    cases.foreach { case (base0, inc0) =>
      val base = dedupByKey(base0)
      val inc = dedupByKey(inc0)
      if (base.nonEmpty || inc.nonEmpty) {
        val s = spark; import s.implicits._
        val wh = freshWh(); val m = new Materializer(wh)
        val r = Relation("db", "s", "t")
        val cfg = ModelConfig(materialized = "incremental", uniqueKey = Seq("id"))
        if (base.nonEmpty) m.incremental(base.toDF("id", "payload", "v"), r, cfg)
        if (inc.nonEmpty) m.incremental(inc.toDF("id", "payload", "v"), r, cfg)
        val got = wh.read(r).collect()
          .map(x => x.getLong(0) -> ((x.getString(1), x.getDouble(2)))).toMap
        val want = base.map(t => t._1 -> ((t._2, t._3))).toMap ++
          inc.map(t => t._1 -> ((t._2, t._3))).toMap
        assert(got == want, s"base=$base inc=$inc")
      }
    }
  }

  test("property: merge is idempotent (re-applying the increment is a no-op)") {
    var ran = 0
    samples(rowsGen, 8, 2000L).foreach { inc0 =>
      val inc = dedupByKey(inc0)
      if (inc.nonEmpty) {
        ran += 1
        val s = spark; import s.implicits._
        val wh = freshWh(); val m = new Materializer(wh)
        val r = Relation("db", "s", "t")
        val cfg = ModelConfig(materialized = "incremental", uniqueKey = Seq("id"))
        val df = inc.toDF("id", "payload", "v")
        m.incremental(df, r, cfg)
        val once = wh.read(r).collect().map(_.toString).sorted.toSeq
        m.incremental(df, r, cfg)
        val twice = wh.read(r).collect().map(_.toString).sorted.toSeq
        assert(once == twice)
      }
    }
    assert(ran > 0, "no generated case executed")
  }

  test("property: insert_overwrite replaces exactly the incoming partitions, idempotently") {
    var ran = 0
    samples(Gen.zip(rowsGen, rowsGen), 6, 4000L).foreach { case (base, inc) =>
      if (base.nonEmpty && inc.nonEmpty) {
        ran += 1
        val s = spark; import s.implicits._
        val wh = freshWh(); val m = new Materializer(wh)
        val r = Relation("db", "s", "t")
        val cfg = ModelConfig(materialized = "incremental",
          incrementalStrategy = IncrementalStrategy.InsertOverwrite,
          partitionBy = Seq("payload"))
        m.incremental(base.toDF("id", "payload", "v"), r, cfg)
        m.incremental(inc.toDF("id", "payload", "v"), r, cfg)
        def state() = wh.read(r).collect()
          .map(x => (x.getAs[Long]("id"), x.getAs[String]("payload"),
            x.getAs[Double]("v"))).sorted.toSeq
        val incParts = inc.map(_._2).toSet
        val want = (base.filterNot(t => incParts(t._2)) ++ inc)
          .map(t => (t._1, t._2, t._3)).sorted
        assert(state() == want, s"base=$base inc=$inc")
        // idempotent: re-applying the same increment changes nothing
        m.incremental(inc.toDF("id", "payload", "v"), r, cfg)
        assert(state() == want)
      }
    }
    assert(ran > 0, "no generated case executed")
  }

  test("property: delete+insert and merge agree for full-row upserts") {
    var ran = 0
    samples(Gen.zip(rowsGen, rowsGen), 6, 5000L).foreach { case (base0, inc0) =>
      val base = dedupByKey(base0); val inc = dedupByKey(inc0)
      if (base.nonEmpty && inc.nonEmpty) {
        ran += 1
        val s = spark; import s.implicits._
        def runWith(strategy: IncrementalStrategy): Seq[String] = {
          val wh = freshWh(); val m = new Materializer(wh)
          val r = Relation("db", "s", "t")
          val cfg = ModelConfig(materialized = "incremental",
            uniqueKey = Seq("id"), incrementalStrategy = strategy)
          m.incremental(base.toDF("id", "payload", "v"), r, cfg)
          m.incremental(inc.toDF("id", "payload", "v"), r, cfg)
          wh.read(r).collect().map(_.toString).sorted.toSeq
        }
        assert(runWith(IncrementalStrategy.Merge) ==
          runWith(IncrementalStrategy.DeleteInsert))
      }
    }
    assert(ran > 0, "no generated case executed")
  }

  test("property: merge result is independent of the partition layout") {
    // the partition-scoped fast path (with its moved-key guard) and the
    // multi-column leaf swap must be pure optimizations: same rows as the
    // flat full-table merge for ANY history, including keys whose payload
    // (= partition value) changes between runs
    var ran = 0
    samples(Gen.zip(rowsGen, rowsGen), 6, 7000L).foreach { case (base0, inc0) =>
      val base = dedupByKey(base0); val inc = dedupByKey(inc0)
      if (base.nonEmpty && inc.nonEmpty) {
        ran += 1
        val s = spark; import s.implicits._
        def runWith(pcols: Seq[String]): Seq[(String, String, String)] = {
          val wh = freshWh(); val m = new Materializer(wh)
          val r = Relation("db", "s", "t")
          val cfg = ModelConfig(materialized = "incremental",
            uniqueKey = Seq("id"),
            incrementalStrategy = IncrementalStrategy.DeleteInsert,
            partitionBy = pcols)
          m.incremental(base.toDF("id", "payload", "v"), r, cfg)
          m.incremental(inc.toDF("id", "payload", "v"), r, cfg)
          // string-normalized: partition-value inference narrows id to int
          wh.read(r).collect().map(x => (
            String.valueOf(x.getAs[Any]("id")),
            String.valueOf(x.getAs[Any]("payload")),
            String.valueOf(x.getAs[Any]("v")))).sorted.toSeq
        }
        val flat = runWith(Nil)
        assert(runWith(Seq("payload")) == flat,
          s"single-col layout diverged: base=$base inc=$inc")
        assert(runWith(Seq("payload", "id")) == flat,
          s"multi-col layout diverged: base=$base inc=$inc")
      }
    }
    assert(ran > 0, "no generated case executed")
  }

  test("property: SCD-2 invariants hold over arbitrary 3-run histories") {
    val runGen = Gen.listOf(for {
      id <- Gen.choose(0L, 10L)
      payload <- Gen.oneOf("a", "b", "c")
    } yield (id, payload))
    var ran = 0
    samples(Gen.zip(runGen, runGen, runGen), 6, 3000L).foreach {
      case (r1, r2, r3) =>
        val s = spark; import s.implicits._
        val wh = freshWh(); val snap = new Snapshotter(wh)
        val rel = Relation("db", "s", "snap")
        val runs = Seq(r1, r2, r3).map(dedup2).zipWithIndex
          .filter(_._1.nonEmpty)
        if (runs.nonEmpty) {
          ran += 1
          runs.foreach { case (rows, i) =>
            val t = lit(s"2024-0${i + 1}-01 00:00:00").cast("timestamp")
            snap.snapshot(rows.toDF("id", "payload"), rel, Seq("id"),
              SnapshotStrategy.Check(Some(Seq("payload"))), now = t)
          }
          val table = wh.read(rel).cache()
          val multiCurrent = table.filter(col("dbt_valid_to").isNull)
            .groupBy("id").count().filter(col("count") > 1).count()
          assert(multiCurrent == 0, "≤1 current row per key")
          val far = lit(Timestamp.valueOf("9999-01-01 00:00:00"))
          val overlaps = table.alias("a").join(table.alias("b"),
            col("a.id") === col("b.id") &&
              col("a.dbt_scd_id") =!= col("b.dbt_scd_id") &&
              col("a.dbt_valid_from") < coalesce(col("b.dbt_valid_to"), far) &&
              col("b.dbt_valid_from") < coalesce(col("a.dbt_valid_to"), far))
            .count()
          assert(overlaps == 0, "non-overlapping validity intervals")
          // storage invariant of the bucketed layout: every row lives in
          // the partition its dbt_valid_to derives — a drifted bucket
          // would break the pruned current-slice read of the next run
          val derived = when(col("dbt_valid_to").isNull,
              lit(graft.materialize.Snapshotter.CURRENT))
            .otherwise(date_format(col("dbt_valid_to").cast("date"), "yyyy-MM"))
          val badBucket = table.filter(
            !(col(graft.materialize.Snapshotter.BUCKET) <=> derived)).count()
          assert(badBucket == 0, "bucket column consistent with dbt_valid_to")
          val lastRun = runs.last._1.toMap
          val current = table.filter(col("dbt_valid_to").isNull).collect()
            .map(x => x.getAs[Long]("id") -> x.getAs[String]("payload")).toMap
          lastRun.foreach { case (k, v) =>
            assert(current.get(k).contains(v), s"key $k: current != last run")
          }
          table.unpersist(); ()
        }
    }
    assert(ran > 0, "no generated case executed")
  }

  private def dedup2(rows: List[(Long, String)]): List[(Long, String)] =
    rows.groupBy(_._1).map(_._2.last).toList

  test("property: macro expansion binds arbitrary args exactly once, in place") {
    import graft.compile.Compiler
    // arg values drawn from SQL-ish fragments incl. quotes, parens,
    // commas inside parens, regex metacharacters ($ \ etc.)
    val argGen: Gen[String] = Gen.oneOf(
      Gen.const("col_a"), Gen.const("'quoted literal'"),
      Gen.const("f(x, y)"), Gen.const("a + b * 2"),
      Gen.const("coalesce(v, 0)"), Gen.const("'it''s'"),
      Gen.const("cast($1 AS BIGINT)"), Gen.const("path\\seg"))
    val casesGen: Gen[(String, String, String)] = for {
      a1 <- argGen; a2 <- argGen; a3 <- argGen
    } yield (a1, a2, a3)
    val macros = Compiler.parseMacros(
      """{% macro tri(x, y, z='Z') %}
        |A={{ x }}|B={{ y }}|C={{ z }}|B2={{ y }}
        |{% endmacro %}""".stripMargin).map(m => m.name -> m).toMap
    samples(casesGen, 120, 0xC0FFEE).foreach { case (a1, a2, a3) =>
      // keyword + positional forms must bind identically
      val pos = Compiler.expandMacros(s"{{ tri($a1, $a2, $a3) }}", macros)
      val kw = Compiler.expandMacros(s"{{ tri($a1, z=$a3, y=$a2) }}", macros)
      val expected = s"A=$a1|B=$a2|C=$a3|B2=$a2"
      assert(pos == expected, s"positional: $pos")
      assert(kw == expected, s"keyword: $kw")
      // default fills the omitted param
      val dflt = Compiler.expandMacros(s"{{ tri($a1, $a2) }}", macros)
      assert(dflt == s"A=$a1|B=$a2|C=Z|B2=$a2")
      // surrounding SQL and non-macro calls pass through untouched
      val mixed = Compiler.expandMacros(
        s"SELECT {{ tri($a1, $a2, $a3) }} FROM {{ ref('t') }}", macros)
      assert(mixed == s"SELECT $expected FROM {{ ref('t') }}")
    }
    // missing required arg fails loudly
    intercept[IllegalArgumentException] {
      Compiler.expandMacros("{{ tri(only_one) }}", macros)
    }
  }

  test("property: control-flow expansion matches a reference interpreter on arbitrary loops") {
    import graft.compile.Compiler
    val tokGen: Gen[String] = Gen.oneOf("alpha", "b2", "col_x", "Z9", "n")
    val caseGen: Gen[(List[String], String)] = for {
      items <- Gen.nonEmptyListOf(tokGen).map(_.take(6))
      sep <- Gen.oneOf(", ", " | ", "+")
    } yield (items, sep)
    samples(caseGen, 150, 0xBEEF).foreach { case (items, sep) =>
      val list = items.map(i => s"'$i'").mkString("[", ", ", "]")
      // loop.last comma control — the pivot idiom
      val got = Compiler.expandControlFlow(
        s"{% for x in $list %}{{ x }}{% if not loop.last %}$sep{% endif %}{% endfor %}")
      assert(got == items.mkString(sep), s"items=$items sep='$sep' got='$got'")
      // loop.index enumerates 1..n
      val idx = Compiler.expandControlFlow(
        s"{% for x in $list %}{{ loop.index }}:{{ x }};{% endfor %}")
      assert(idx == items.zipWithIndex
        .map { case (it, i) => s"${i + 1}:$it;" }.mkString)
      // set-bound list behaves identically to the literal
      val viaSet = Compiler.expandControlFlow(
        s"{% set xs = $list %}{% for x in xs %}{{ x }}.{% endfor %}")
      assert(viaSet == items.map(_ + ".").mkString)
      // bare-variable condition selects exactly the matching items
      val first = items.head
      val filtered = Compiler.expandControlFlow(
        s"{% for x in $list %}{% if x == '$first' %}{{ x }} {% endif %}{% endfor %}")
      assert(filtered == items.filter(_ == first).map(_ + " ").mkString)
    }
  }

  test("property: Jinja filter subset matches a reference interpreter") {
    import graft.compile.Compiler
    // items include MiXeD case, padding, and QUOTED COMMAS — the list
    // parse must split only at commas outside quotes
    val itemGen: Gen[String] = Gen.oneOf(
      "Alpha", "b2", "Col_X", "z9", "MiXeD", "a,b", "x, y", " pad ")
    val caseGen: Gen[(List[String], String, Int)] = for {
      items <- Gen.nonEmptyListOf(itemGen).map(_.take(5))
      sep <- Gen.oneOf(", ", "|", " + ")
      n <- Gen.choose(0, 4)
    } yield (items, sep, n)
    samples(caseGen, 120, 0xF117E4L).foreach { case (items, sep, n) =>
      val list = items.map(i => s"'$i'").mkString("[", ", ", "]")
      // join over a set-bound list (quoted commas stay inside items)
      val joined = Compiler.expandControlFlow(
        s"{% set xs = $list %}{{ xs | join('$sep') }}")
      assert(joined == items.mkString(sep), s"items=$items sep='$sep'")
      // per-item filters inside a loop
      val lowered = Compiler.expandControlFlow(
        s"{% for x in $list %}{{ x | lower }};{% endfor %}")
      assert(lowered == items.map(i => i.toLowerCase + ";").mkString)
      val trimmed = Compiler.expandControlFlow(
        s"{% for x in $list %}{{ x | trim | upper }};{% endfor %}")
      assert(trimmed == items.map(i => i.trim.toUpperCase + ";").mkString)
      // length / first / last reduce the list
      assert(Compiler.expandControlFlow(
        s"{% set xs = $list %}{{ xs | length }}") == items.size.toString)
      assert(Compiler.expandControlFlow(
        s"{% set xs = $list %}{{ xs | first }}/{{ xs | last }}") ==
        s"${items.head}/${items.last}")
      // range(n) enumerates 0..n-1; range(a, b) is end-exclusive
      assert(Compiler.expandControlFlow(
        s"{% for i in range($n) %}{{ i }},{% endfor %}") ==
        (0 until n).map(i => s"$i,").mkString)
      assert(Compiler.expandControlFlow(
        s"{% for i in range(2, ${2 + n}) %}{{ i }}.{% endfor %}") ==
        (2 until 2 + n).map(i => s"$i.").mkString)
      // default: unbound takes the default (rest of chain applies);
      // bound ignores it
      assert(Compiler.expandControlFlow(
        s"{{ nope | default('${items.head}') | trim }}") == items.head.trim)
      assert(Compiler.expandControlFlow(
        s"{% set v = 'Bound' %}{{ v | default('zz') | lower }}") == "bound")
    }
    // fail-loud cases: unknown filter, bare list interpolation
    intercept[IllegalArgumentException] {
      Compiler.expandControlFlow("{% set v = 'x' %}{{ v | pony }}")
    }
    intercept[IllegalArgumentException] {
      Compiler.expandControlFlow("{% set xs = ['a'] %}SELECT {{ xs }}")
    }
    // elif chains render (round 12); a dangling elif still fails loudly
    assert(Compiler.expandControlFlow(
      "{% if true %}a{% elif false %}b{% endif %}") == "a")
    intercept[IllegalArgumentException] {
      Compiler.expandControlFlow("{% elif true %}a{% endif %}")
    }
  }

  test("property: sequential_values' anti-join gaps match a lag-based reference") {
    import spark.implicits._
    val setsGen: Gen[List[Long]] =
      Gen.nonEmptyListOf(Gen.choose(0L, 40L))
    samples(setsGen, 30, 1100L).foreach { vals =>
      val df = vals.toDF("v")
      val gaps = graft.dqtests.SchemaTests.sequentialValues(df, "v")
        .as[Long].collect().toSet
      // independent reference: sort distinct, lag-compare
      val sorted = vals.distinct.sorted
      val expected = sorted.zip(sorted.drop(1))
        .collect { case (a, b) if b != a + 1 => a }.toSet
      assert(gaps == expected, s"vals=$vals")
    }
  }

  test("property: Misra-Gries survival guarantee over random zipf streams and layouts") {
    import spark.implicits._
    val streamGen: Gen[List[String]] = Gen.listOfN(600, Gen.frequency(
      (8, Gen.const("hot")), (4, Gen.const("warm")),
      (2, Gen.oneOf("a", "b", "c")),
      (3, Gen.choose(0, 400).map(i => s"cold_$i"))))
    samples(streamGen, 8, 2200L).zipWithIndex.foreach { case (stream, i) =>
      val m = 9
      val parts = 1 + (i % 5)
      val (cands, n) = spark.createDataset(stream).repartition(parts)
        .select(new graft.functions.HeavyHittersAggregator(m).toColumn)
        .head()
      assert(n == stream.size)
      val counts = stream.groupBy(identity).view.mapValues(_.size).toMap
      val survivors = cands.map(_._1).toSet
      counts.foreach { case (w, c) =>
        if (c.toLong * (m + 1) > n) // above threshold ⇒ MUST survive
          assert(survivors.contains(w),
            s"parts=$parts lost $w (count $c of $n)")
      }
      // counters never overestimate
      cands.foreach { case (w, est) =>
        assert(est <= counts.getOrElse(w, 0).toLong, s"$w overcounted")
      }
    }
  }

  test("property: graph selector closures match an independent BFS on random DAGs") {
    import graft.run.{Engine, ModelDef, Project, Target}
    val dagGen: Gen[Seq[(Int, Seq[Int])]] = for {
      n <- Gen.choose(3, 12)
      edges <- Gen.sequence[Seq[Seq[Int]], Seq[Int]]((0 until n).map { i =>
        if (i == 0) Gen.const(Seq.empty[Int])
        else Gen.someOf(0 until i).map(_.toSeq)
      })
    } yield (0 until n).map(i => i -> edges(i))
    samples(dagGen, 25, 0xDA6).foreach { dag =>
      val models = dag.map { case (i, parents) =>
        val refs =
          if (parents.isEmpty) "" else
            parents.map(p => s"{{ ref('m$p') }}").mkString(" FROM ", ", ", "")
        ModelDef(s"m$i", s"SELECT 1 AS one$refs")
      }
      val e = new Engine(spark, Project(name = "sel", models = models),
        Target(Files.createTempDirectory("graft_selp").toString))
      val parentsOf = dag.map { case (i, ps) =>
        s"m$i" -> ps.map(p => s"m$p").toSet
      }.toMap
      val childrenOf = parentsOf.keys.map(n =>
        n -> parentsOf.collect { case (c, ps) if ps.contains(n) => c }.toSet).toMap
      def bfs(seed: String, edges: Map[String, Set[String]],
              depth: Int): Set[String] = {
        var acc = Set(seed); var frontier = Set(seed); var d = 0
        while (frontier.nonEmpty && d < depth) {
          frontier = frontier.flatMap(edges.getOrElse(_, Set.empty)) -- acc
          acc ++= frontier; d += 1
        }
        acc
      }
      dag.foreach { case (i, _) =>
        val m = s"m$i"
        assert(e.selectNodes(s"$m+") == bfs(m, childrenOf, Int.MaxValue))
        assert(e.selectNodes(s"+$m") == bfs(m, parentsOf, Int.MaxValue))
        assert(e.selectNodes(s"+$m+") ==
          bfs(m, parentsOf, Int.MaxValue) ++ bfs(m, childrenOf, Int.MaxValue))
        assert(e.selectNodes(s"$m+1") == bfs(m, childrenOf, 1))
        assert(e.selectNodes(s"1+$m") == bfs(m, parentsOf, 1))
        // union and intersection laws
        assert(e.selectNodes(s"$m+ +$m") ==
          e.selectNodes(s"$m+") ++ e.selectNodes(s"+$m"))
        assert(e.selectNodes(s"+$m+,$m") == Set(m))
      }
      assert(e.selectNodes("m*") == dag.map(d => s"m${d._1}").toSet)
    }
  }

  test("date shard enumeration matches the range (incl. leap day)") {
    assert(DateUtils.dateShardedTables("events_", "20240228", "20240302") ==
      Seq("events_20240228", "events_20240229", "events_20240301", "events_20240302"))
    assert(DateUtils.partitionRange("20240101, 20240131") == ("20240101", "20240131"))
  }

  test("events loader normalizes every driver ts shape to session-tz TIMESTAMP") {
    // The driver's writer has shipped events.ts as INT64 TIMESTAMP(NANOS)
    // (rounds <=7) and naive timestamp[us] / TIMESTAMP_NTZ (round 8); a
    // future round could plausibly ship tz'd micros. All three shapes
    // must load as a session-timezone TIMESTAMP with the same epoch
    // seconds, or every downstream cast("long") and the DuckDB oracle
    // epoch math silently diverge (or fail outright: NTZ cannot cast to
    // BIGINT).
    import org.apache.spark.sql.functions.{col, expr, lit, timestamp_micros}
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val s = spark
    import s.implicits._
    val epochUs = 1704067200000000L // 2024-01-01T00:00:00Z in micros
    def load(stage: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val dir = java.nio.file.Files.createTempDirectory("graft_ts_shape")
      stage.write.parquet(s"$dir/events.parquet")
      graft.ops.TData.events(spark, dir.toString)
    }
    val base = Seq((1L, 17L, "click", 1.0, "{}"))
      .toDF("event_id", "user_id", "event_type", "value", "props")
    val shapes = Seq(
      // raw nanos as INT64 (the legacy-conf long read of TIMESTAMP(NANOS))
      base.withColumn("ts", lit(epochUs * 1000L)),
      // naive micros -> TIMESTAMP_NTZ on read
      base.withColumn("ts",
        timestamp_micros(lit(epochUs)).cast(TimestampNTZType)),
      // tz'd micros -> plain TIMESTAMP on read
      base.withColumn("ts", timestamp_micros(lit(epochUs))))
    shapes.foreach { stage =>
      val got = load(stage.select("event_id", "ts", "user_id", "event_type",
        "value", "props"))
      assert(got.schema("ts").dataType == TimestampType,
        s"staged ${stage.schema("ts").dataType} must load as TIMESTAMP")
      assert(got.select(col("ts").cast("long")).head().getLong(0) ==
        epochUs / 1000000L)
    }
  }
}
