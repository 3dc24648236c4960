package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.ops._

/** Plan-quality regression net: the SCALE.md claims that matter at 100 TB,
  * asserted on the physical plans so a refactor that silently drops a
  * broadcast hint, breaks exchange reuse, or loses scan pushdown fails CI
  * — not just a benchmark three rounds later.
  *
  * AQE is disabled per-assertion (saved/restored): with it on, the
  * pre-execution plan is a single AdaptiveSparkPlan node whose children
  * aren't visible to collect/toString.
  */
class PlanSpec extends AnyFunSuite {
  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def plan(df: => DataFrame): String = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try df.queryExecution.executedPlan.toString
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  /** Shuffle exchanges only (not BroadcastExchange / ReusedExchange). */
  private def shuffles(p: String): Int =
    p.linesIterator.count(l => l.contains("Exchange ") &&
      !l.contains("BroadcastExchange") && !l.contains("ReusedExchange"))

  test("knn IVF: no Window anywhere — assignment and top-k are bounded partial aggs") {
    // the row_number assignment form shuffled all N·√N centroid-scored
    // rows (vector payloads included) on vec_id; the TopKAggregator form
    // carries ≤2 entries per vector through the exchange
    val p = plan(Similarity.knnIvf(spark, sf))
    assert(!p.contains("Window"), s"knnIvf plan must be window-free:\n$p")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"), p)
  }

  test("langId: no Window — profile top-20 and per-doc argmin are bounded aggs") {
    // the window form sorted each language's ENTIRE vocabulary in one
    // task; the TopStringsAggregator carries ≤20 entries per language
    // through the exchange, and best-language is a struct-min hash agg
    val p = plan(TextOps.langId(spark, sf))
    assert(!p.contains("Window"), s"langId plan must be window-free:\n$p")
  }

  test("tfidf: no Window — per-doc top-3 terms via bounded partial agg") {
    val p = plan(TextOps.tfidfTerms(spark, sf))
    assert(!p.contains("Window"), s"tfidf plan must be window-free:\n$p")
  }

  test("lm score: no Window; count models are keyed shuffles, never a broadcast of the corpus") {
    val p = plan(graft.ops.TextOps.lmScore(spark, sf))
    assert(!p.contains("Window"), s"lmScore plan must be window-free:\n$p")
    // bigram explode + uni/bi count aggs + 2 joins + final doc agg — the
    // shuffle count is bounded (key-partitioned aggs reuse exchanges
    // where co-keyed); a regression to per-doc windows or a global sort
    // would blow this bound
    assert(shuffles(p) <= 7, s"lmScore shuffle count grew:\n$p")
  }

  test("bpe encode: dictionary shape — interpreted folds only on the distinct vocab, corpus side keyed hash joins, never a nested loop") {
    val p = plan(graft.ops.TextOps.bpeEncode(
      graft.ops.TData.documents(spark, sf),
      Seq(("t", "h"), ("th", "e"), ("i", "n"))))
    // explode + vocab distinct + dict join + doc agg + zero-word left
    // join: the shuffle count is bounded; a regression to per-occurrence
    // folds (shuffle-free but interpreted over the corpus) or a
    // cartesian would change this shape
    assert(shuffles(p) <= 6, s"bpeEncode shuffle count grew:\n$p")
    assert(!p.contains("Window") && !p.contains("NestedLoop") &&
      !p.contains("Cartesian"), p)
  }

  test("gopher rules + rp sketch: pure per-row plans — no exchange") {
    val g = plan(graft.ops.TextOps.gopherRules(spark, sf))
    assert(shuffles(g) == 0 && !g.contains("Join"), g)
    val r = plan(graft.ops.Similarity.embeddingRp(spark, sf))
    assert(shuffles(r) == 0 && !r.contains("Join"), r)
  }

  test("chunking: pure per-row fan-out — no exchange anywhere") {
    val p = plan(TextOps.chunkOverlap(spark, sf))
    assert(shuffles(p) == 0, s"chunking must not shuffle:\n$p")
  }

  test("sequence packing: distributed prefix-sum, no single-partition exchange") {
    // the naive global-cumsum window is ONE partition sorting the corpus;
    // the packed plan must be range-partitioned with broadcast offsets
    val p = plan(TextOps.packSequences(spark, sf))
    assert(!p.contains("SinglePartition"),
      s"pack plan must not funnel through one partition:\n$p")
    assert(p.toLowerCase.contains("rangepartitioning"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("decontamination: eval shingle set is the broadcast side, corpus never shuffles for the join") {
    val p = plan(TextOps.decontaminate(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    // exactly two shuffles, both SMALL-side: the eval shingles' distinct
    // (bounded by the benchmark suite) and the final per-doc count — the
    // corpus-side shingle stream flows map-side into the broadcast join
    assert(shuffles(p) == 2, s"want 2 small shuffles, got:\n$p")
    // the eval-slice predicate reaches every corpus scan branch
    assert(p.contains("% 97"), p)
  }

  test("token-budget mix: distributed prefix-sum, no single-partition exchange") {
    val p = plan(TextOps.mixTokenBudget(spark, sf))
    assert(!p.contains("SinglePartition"), s"single-partition exchange:\n$p")
    assert(p.contains("BroadcastHashJoin"), p) // offsets + budgets joins
  }

  test("substr dedup: text never in an exchange — only hash triples and positions shuffle") {
    val p = plan(TextOps.exactSubstrDedup(spark, sf))
    // one hash-key agg exchange, the join back reusing its layout, the
    // doc-keyed drop-list agg, and the final doc join — all SMALL rows;
    // no cartesian/nested-loop anywhere
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(shuffles(p) <= 6, s"unexpected exchange count:\n$p")
    // no Exchange carries the token array or document text: hashpartitioning
    // keys are only the window hash m and doc_id
    val exchangeKeys = p.linesIterator
      .filter(_.contains("hashpartitioning")).mkString("\n")
    assert(!exchangeKeys.contains("text"), exchangeKeys)
  }

  test("PII redaction: pure per-row plan — no exchange, one codegen stage") {
    val p = plan(TextOps.piiRedact(spark, sf))
    assert(shuffles(p) == 0, s"redaction must not shuffle:\n$p")
    assert(p.contains("*(1)"), p) // single whole-stage-codegen span
  }

  test("q5 star join: dimension arm broadcast, no sort-merge join of dims") {
    val p = plan(Analytics.q5RegionRevenue(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("PushedFilters"), p)
  }

  test("sessionize: ONE shuffle feeds both windows and the final aggregate") {
    val p = plan(Events.sessionize(spark, sf))
    assert(shuffles(p) == 1, s"want exactly 1 shuffle exchange:\n$p")
    assert(p.linesIterator.count(_.contains("Window")) >= 2, p)
  }

  test("winnowing: ONE shuffle for both windows and the distinct") {
    val p = plan(TextOps.winnowFingerprint(spark, sf))
    assert(shuffles(p) == 1, s"want exactly 1 shuffle exchange:\n$p")
  }

  test("q1 pricing summary: scan pushes the shipdate filter and prunes columns") {
    val p = plan(Analytics.q1PricingSummary(spark, sf))
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"), p)
    // column pruning: the scan schema must not include untouched columns
    assert(!p.contains("l_comment"), s"scan reads pruned column:\n$p")
  }

  test("curation funnel: single shuffle (the dedup hash), filters fused into the scan side") {
    val p = plan(TextOps.curationPipeline(spark, sf))
    assert(shuffles(p) == 1, s"want exactly 1 shuffle exchange:\n$p")
  }

  test("kmeans assignment: literal centroids — no join, no window, no shuffle") {
    // the iterations' update aggs run as separate control-plane jobs; the
    // RETURNED assignment plan must be a pure scan+project (the shape
    // that costs one pass at 100 TB regardless of N)
    val p = plan(Similarity.kmeansAssign(spark, sf))
    assert(!p.contains("Window"), s"kmeans assignment must be window-free:\n$p")
    assert(shuffles(p) == 0, s"kmeans assignment must not shuffle:\n$p")
    assert(!p.contains("Join"), s"kmeans assignment must not join:\n$p")
  }

  test("epoch shuffle: one hash exchange, per-shard sort — never a global range sort") {
    // a global orderBy(rand()) form would plan an Exchange rangepartitioning
    // + full sort whose ordinal assignment funnels into one partition
    val p = plan(TextOps.epochShuffleOver(
      TData.documents(spark, sf), epoch = 7, numShards = 8))
    assert(shuffles(p) == 1, s"epoch shuffle must cost exactly one exchange:\n$p")
    assert(!p.contains("rangepartitioning"),
      s"per-shard sort must hash-partition, not range-sort globally:\n$p")
  }

  test("split assign: pure per-row projection — no exchange") {
    val p = plan(TextOps.splitAssign(spark, sf))
    assert(shuffles(p) == 0, s"split must be shuffle-free:\n$p")
  }

  test("temperature mixing: corpus side broadcast-joined, only the tiny rate agg shuffles") {
    val p = plan(TextOps.mixTemperature(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"rates must broadcast:\n$p")
    assert(shuffles(p) <= 1, s"only the per-source count agg may shuffle:\n$p")
  }

  test("boilerplate strip: inverted index — df agg + per-doc agg, boiler set broadcast") {
    val p = plan(TextOps.boilerplateStrip(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"boiler set must broadcast:\n$p")
    assert(shuffles(p) <= 2, s"df agg + doc agg only:\n$p")
  }

  test("DSIR: rate table broadcast (≤4096 buckets), no Window, corpus shuffles only for the per-doc mean") {
    val p = plan(TextOps.dsirSelect(spark, sf))
    assert(!p.contains("Window"), s"dsir plan must be window-free:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"bucket rates (≤4096 rows) must broadcast into the feature stream:\n$p")
  }

  test("heavy hitters sketch pass: partial object agg, single-row exchange") {
    import spark.implicits._
    val words = TData.documents(spark, sf)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " ")).as("word"))
      .as[String]
    val p = plan(words.select(
      new graft.functions.HeavyHittersAggregator(63).toColumn.name("hh")).toDF)
    // the sketch must partial-aggregate (ObjectHashAggregate partial →
    // merge), so each map task ships ≤ m counters, never its token stream
    assert(p.contains("ObjectHashAggregate"), s"sketch must partial-agg:\n$p")
    assert(!p.contains("Window"), p)
  }

  test("dbt-utils sequential_values: anti-join shape, no global Window") {
    val p = plan(graft.dqtests.SchemaTests.sequentialValues(
      TData.orders(spark, sf), "o_custkey"))
    assert(!p.contains("Window"),
      s"gap detection must not be a global lag window:\n$p")
  }

  test("mutually_exclusive_ranges: window is PARTITIONED (never a global sort)") {
    val p = plan(DqQueries.bTestMutuallyExclusiveRanges(spark, sf))
    // a Window with an empty partition spec plans Exchange SinglePartition
    assert(!p.contains("SinglePartition"),
      s"range-overlap window must be per-partition:\n$p")
  }

  test("interval join: bucketed equi shape — never a nested loop / cartesian") {
    val p = plan(Events.intervalJoin(spark, sf))
    assert(!p.contains("CartesianProduct"),
      s"keyless range join must bucket, not cross:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"the join must be an equi-join on the bucket key:\n$p")
  }

  test("PQ ADC: corpus side joins CODES (no vector payload) against a broadcast query table") {
    val p = plan(Similarity.knnPq(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query/table side must broadcast:\n$p")
    assert(!p.contains("Window"), s"top-k must be the bounded aggregator:\n$p")
  }

  test("domain cap: bounded partial topK agg — never a Window over the raw corpus") {
    val p = plan(TextOps.domainCap(spark, sf))
    assert(!p.contains("Window"),
      s"a row_number window on the skew-prone source key sorts a whole " +
        s"mega-domain in one task; must be the partial topK aggregator:\n$p")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"expected the typed aggregator's partial/final pair:\n$p")
  }

  test("require_partition_filter guard: a join-inferred isnotnull is NOT pruning") {
    import graft.plans.PartitionFilterGuard
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_guard").toString
    Seq((1, "a"), (2, "b")).toDF("v", "pk")
      .write.partitionBy("pk").mode("overwrite").parquet(dir)
    val base = spark.read.parquet(dir)
    val dim = Seq("a", "b").toDF("pk")
    val g = Seq(PartitionFilterGuard.Guard(dir, "t"))
    // an inner join on the partition column makes Catalyst infer
    // isnotnull(pk) into the scan's partitionFilters — but every non-null
    // partition still scans, so the guard must refuse
    val e = intercept[IllegalStateException] {
      PartitionFilterGuard.assertPruned(base.join(dim, "pk"), g)
    }
    assert(e.getMessage.contains("require_partition_filter"), e.getMessage)
    // genuinely selective predicates are accepted — directly and pushed
    // down through the same join
    PartitionFilterGuard.assertPruned(base.filter($"pk" === "a"), g)
    PartitionFilterGuard.assertPruned(
      base.filter($"pk".isin("a")).join(dim, "pk"), g)
    // an EXPLICIT user-written `pk IS NOT NULL` satisfies the guard
    // (BigQuery's documented read-everything idiom) — the analyzed plan
    // distinguishes it from the join-inferred constraint above
    PartitionFilterGuard.assertPruned(base.filter($"pk".isNotNull), g)
    // ...but a user filter on a NON-partition column plus the same join
    // still refuses: only the inferred isnotnull reaches the scan
    val e2 = intercept[IllegalStateException] {
      PartitionFilterGuard.assertPruned(base.filter($"v" > 0).join(dim, "pk"), g)
    }
    assert(e2.getMessage.contains("require_partition_filter"), e2.getMessage)
    // a user isNotNull on a SAME-NAMED column of the OTHER relation must
    // not satisfy this relation's guard (matching is by exprId, not
    // name): filtering dim.pk leaves base's scan with only the
    // join-inferred constraint — BigQuery requires the predicate on the
    // partitioned table itself
    val e3 = intercept[IllegalStateException] {
      PartitionFilterGuard.assertPruned(
        base.join(dim.filter(dim("pk").isNotNull), base("pk") === dim("pk"))
          .select(base("v"), base("pk")), g)
    }
    assert(e3.getMessage.contains("require_partition_filter"), e3.getMessage)
    // a CTE/projection ALIAS of the partition column still counts: the
    // guard chases alias chains back to base attributes before matching
    PartitionFilterGuard.assertPruned(
      base.select($"v", $"pk".as("p")).filter($"p".isNotNull), g)
    // an explicit predicate written ONCE inside a CTE the query reads
    // TWICE: CTE inlining re-instances the second copy's attributes with
    // fresh exprIds, so exprId matching alone would falsely refuse it —
    // the relation-scoped NAME complement must accept both scans
    base.createOrReplaceTempView("guarded_t")
    PartitionFilterGuard.assertPruned(spark.sql(
      """WITH c AS (SELECT * FROM guarded_t WHERE pk IS NOT NULL)
        |SELECT a.v FROM c a JOIN c b ON a.pk = b.pk""".stripMargin), g)
    // POST-JOIN filter on the OTHER table's same-named column: the
    // filter sits above the join, so its subtree contains the guarded
    // scan too — the name complement must NOT let it satisfy the guard
    // (it is scoped to filters whose subtree scans ONLY the guarded
    // path). This is the exprId false-accept re-opened in the post-join
    // position.
    val e4 = intercept[IllegalStateException] {
      PartitionFilterGuard.assertPruned(
        base.join(dim, base("pk") === dim("pk"))
          .filter(dim("pk").isNotNull)
          .select(base("v"), base("pk")), g)
    }
    assert(e4.getMessage.contains("require_partition_filter"), e4.getMessage)
    // ...while a post-join filter on the GUARDED table's own column is
    // still accepted via exprId matching (no regression from scoping)
    PartitionFilterGuard.assertPruned(
      base.join(dim, base("pk") === dim("pk"))
        .filter(base("pk").isNotNull)
        .select(base("v"), base("pk")), g)
  }
}
