package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops._
import graft.functions.VectorFunctions

/** Semantics the DuckDB-identity check can't express: the dedup family must
  * actually FIND the planted duplicates (recall), the LSH candidates must
  * be verified (precision), and the native cosine expression must agree
  * with a reference implementation.
  */
class ExtensionOpsSpec extends AnyFunSuite {
  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("DSIR selection concentrates on the target (English) slice") {
    val sel = TextOps.dsirSelect(spark, "/root/testdata/sf0.01")
      .join(TData.documents(spark, "/root/testdata/sf0.01")
        .select(col("doc_id"), col("lang")), "doc_id")
    val byLang = sel.groupBy(col("lang"))
      .agg(count(when(col("selected"), 1)).as("sel"), count(lit(1)).as("tot"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (enSel, enTot) = byLang("en")
    // the target slice is mostly kept...
    assert(enSel.toDouble / enTot >= 0.8, s"en recall ${enSel}/$enTot")
    // ...and every non-target language is mostly rejected
    byLang.filter(_._1 != "en").foreach { case (l, (s, t)) =>
      assert(s.toDouble / t <= 0.5, s"$l leaked $s/$t")
    }
  }

  test("CCNet buckets: per-language thirds (up to score ties), exhaustive and exclusive") {
    val b = TextOps.ccnetBuckets(spark, "/root/testdata/sf0.01")
    val byLang = b.groupBy(col("lang"), col("bucket")).count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val langs = byLang.keys.map(_._1).toSet
    langs.foreach { l =>
      val h = byLang.getOrElse((l, "head"), 0L)
      val m = byLang.getOrElse((l, "middle"), 0L)
      val t = byLang.getOrElse((l, "tail"), 0L)
      val n = h + m + t
      assert(n > 0)
      // threshold-on-score semantics: each bucket within ±35% of a third
      Seq(h, m, t).foreach(c =>
        assert(math.abs(c - n / 3.0) <= n * 0.35, s"$l: h=$h m=$m t=$t"))
    }
  }

  test("bloom gate: row-identical to the exact gate, and it actually prunes") {
    val exact = TextOps.dedupIncremental(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    val bloom = TextOps.dedupIncrementalBloom(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(bloom == exact) // transparency: fp's exact-checked, no fn's
    // the gate must reject most of the (mostly-new) batch outright —
    // otherwise it's not saving the probe
    val base = TData.documents(spark, sf)
      .select(md5(col("text")).as("h")).distinct()
    val bf = base.stat.bloomFilter("h", math.max(base.count(), 1L), 0.03)
    val batchHashes = TextOps.dedupIncremental(spark, sf)
      .select(col("text_md5")).collect().map(_.getString(0))
    val rejected = batchHashes.count(h => !bf.mightContainString(h))
    assert(rejected > batchHashes.length / 2,
      s"bloom rejected only $rejected of ${batchHashes.length}")
  }

  test("span decontamination: exact eval copies fully excised; unaligned overlap caught") {
    val out = TextOps.decontaminateSpans(spark, "/root/testdata/sf0.01")
      .filter(col("doc_id").isin(1000000L, 2000000L))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 2000000 is an EXACT copy of eval doc 0: every full chunk gone
    val (paras2m, exc2m) = out(2000000L)
    assert(exc2m == paras2m - 1, s"exact eval copy kept full chunks: $out")
    // doc 1000000 is the 'xx '-prefixed copy: its chunks are UNALIGNED
    // with eval doc 0, yet the stride-1 eval window set still catches
    // every chunk past the first (aligned-only matching would catch 0)
    val (_, exc1m) = out(1000000L)
    assert(exc1m >= 1, s"unaligned overlap missed: $out")
  }

  test("exact-substring dedup: exact copies gutted, prefixed copies gutted UNALIGNED, originals keep") {
    val out = TextOps.exactSubstrDedup(spark, sf)
      .select(col("doc_id"), col("n_tokens"), col("n_removed")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val planted = TData.documents(spark, sf)
      .filter(col("doc_id") % 20 === 0).select(col("doc_id")).collect()
      .map(_.getLong(0)).filter(id => out(id)._1 >= 12)
    // an exact copy (+2000000) shares every window with its original:
    // all its windowed tokens excise (the < 12-token tail survives)
    planted.foreach { id =>
      val (n, rm) = out(id + 2000000)
      assert(rm >= n - 11 && rm <= n,
        s"exact copy $id kept duplicated tokens: n=$n removed=$rm")
      // the original precedes its copy, so it can only lose runs shared
      // with LOWER-id docs (the corpus plants cross-doc phrases) — never
      // more than the copy loses
      assert(out(id)._2 <= rm, s"keeper $id lost more than its copy")
    }
    // most base-corpus windows are unique: some original keeps all text
    val base = out.filter { case (id, _) => id < 1000000L }
    assert(base.values.exists(_._2 == 0L), "every base doc was excised")
    assert(base.values.map(_._2).sum < base.values.map(_._1).sum,
      "base corpus fully excised — keeper selection is broken")
    // the 'xx '-prefixed copies (+1000000) match at SHIFTED positions:
    // everything past the prefix excises even though no aligned chunk
    // would match
    val prefixed = TData.documents(spark, sf)
      .filter(col("doc_id") % 10 === 0).select(col("doc_id")).collect()
      .map(_.getLong(0)).filter(id => out(id)._1 >= 12)
    prefixed.foreach { id =>
      val (n, rm) = out(id + 1000000)
      assert(rm >= n - 13, // 'xx' + the <win tail can survive
        s"prefixed copy $id under-excised: n=$n removed=$rm")
    }
    // docs shorter than one window are untouched
    out.values.filter(_._1 < 12).foreach { case (_, rm) => assert(rm == 0) }
  }

  test("token-budget mix: kept tokens land in [budget, budget + last doc); deterministic") {
    val out = TextOps.mixTokenBudget(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val totals = TData.documents(spark, sf)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy("source").agg(sum(col("n")).as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keptBySrc = out.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    totals.foreach { case (src, t) =>
      val budget = t * 4000 / 10000
      val kept = keptBySrc.getOrElse(src, 0L)
      // exclusive-prefix cut: meets the budget, overshoots by < one doc
      assert(kept >= budget, s"$src under budget: $kept < $budget")
      val maxDoc = out.filter(_._2 == src).map(_._3).max
      assert(kept < budget + maxDoc, s"$src overshot: $kept vs $budget")
    }
    // rerun is bit-identical (md5 order, no RNG)
    val again = TextOps.mixTokenBudget(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSet == again.toSet)
  }

  test("exact dedup collapses planted exact duplicates") {
    val dups = TextOps.dedupExact(spark, sf).filter(col("n_copies") > 1)
    val planted = TData.documents(spark, sf)
      .filter(col("doc_id") % 20 === 0).count()
    assert(dups.count() == planted)
    // keeper is always the original (lowest id)
    assert(dups.filter(col("keep_doc_id") >= 2000000).count() == 0)
  }

  test("ngram-jaccard finds every planted near-dup pair") {
    val pairs = TextOps.dedupNgramJaccard(spark, sf)
      .select(col("doc1"), col("doc2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val perturbed = TData.documents(spark, sf)
      .filter(col("doc_id") % 10 === 0).select(col("doc_id")).collect()
      .map(_.getLong(0))
    // every original→'xx '-prepended copy must pair up (jaccard ≈ (n-2)/(n+2))
    val missing = perturbed.filterNot(id => pairs.contains((id, id + 1000000)))
    assert(missing.isEmpty, s"missing near-dup pairs for: ${missing.take(5).mkString(",")}")
  }

  test("minhash-LSH recall ≥ 0.8 of the exhaustive jaccard pairs, precision = 1") {
    val exact = TextOps.dedupNgramJaccard(spark, sf)
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = TextOps.dedupMinhashLsh(spark, sf)
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH pairs are jaccard-verified → must be a subset")
    assert(exact.isEmpty || lsh.size.toDouble / exact.size >= 0.8,
      s"recall ${lsh.size}/${exact.size}")
  }

  test("cluster resolution converges on a planted diameter-5 chain") {
    // 1-2-3-4-5-6 chain: a fixed 3-round propagation would leave node 6
    // labeled > 1; the fixpoint loop must resolve the whole chain to one
    // cluster. Second component {10,11} and isolated node 20 as controls.
    // Conf forces the DISTRIBUTED path (tiny edge sets otherwise take the
    // driver union-find fast path, which this test is not about).
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L)).toDF("doc1", "doc2")
    val nodes = (Seq(1L, 2L, 3L, 4L, 5L, 6L, 10L, 11L, 20L)).toDF("doc_id")
    spark.conf.set("graft.cc.localSolveMaxEdges", "0")
    val (labels, rounds) =
      try TextOps.resolveClustersCounted(edges, nodes)
      finally spark.conf.unset("graft.cc.localSolveMaxEdges")
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 6L).forall(got(_) == 1L), s"chain not resolved: $got")
    assert(got(10L) == 10L && got(11L) == 10L)
    assert(got(20L) == 20L)
    // star contraction is O(log n) rounds — plain min-label propagation
    // would need ~5 rounds (one per hop) plus a no-change round on this
    // diameter-5 chain
    assert(rounds >= 1 && rounds <= 4,
      s"diameter-5 chain took $rounds contraction rounds")
  }

  test("small edge sets solve on the driver with labels identical to contraction") {
    // the size-adaptive fast path (union-find under
    // graft.cc.localSolveMaxEdges) must be label-equivalent to the
    // distributed star contraction on the same input
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L), (11L, 12L), (30L, 31L)).toDF("doc1", "doc2")
    val nodes = ((1L to 6L) ++ Seq(10L, 11L, 12L, 20L, 30L, 31L)).toDF("doc_id")
    val (localLabels, localRounds) = TextOps.resolveClustersCounted(edges, nodes)
    assert(localRounds == 0, "a 8-edge input must take the driver fast path")
    spark.conf.set("graft.cc.localSolveMaxEdges", "0")
    val (distLabels, distRounds) =
      try TextOps.resolveClustersCounted(edges, nodes)
      finally spark.conf.unset("graft.cc.localSolveMaxEdges")
    assert(distRounds >= 1)
    val l = localLabels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val d = distLabels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l == d, s"fast path diverged: local=$l dist=$d")
  }

  test("k-means++ init + convergence stop beats lowest-id seeding on cluster cost") {
    val e = Similarity.vecs(spark, sf)
    // within-cluster cost of an assignment: mean cosine distance of each
    // vector to its cluster's mean vector (computed from the assignment
    // itself, so both variants are scored identically)
    def cost(assign: Map[Long, Int]): Double = {
      val vs = e.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq).toMap
      val byC = assign.groupBy(_._2).view.mapValues(_.keys.toSeq)
      val dists = byC.values.flatMap { members =>
        val d = vs(members.head).length
        val mean = (0 until d).map(i => members.map(m => vs(m)(i)).sum / members.size)
        members.map { m =>
          val v = vs(m)
          val dot = (0 until d).map(i => v(i) * mean(i)).sum
          val nv = math.sqrt(v.map(x => x * x).sum)
          val nm = math.sqrt(mean.map(x => x * x).sum)
          1.0 - dot / (nv * nm + 1e-300)
        }
      }.toSeq
      dists.sum / dists.size
    }
    val (assignPP, _, iters) = Similarity.kmeansFit(e, k = 8, maxIters = 25)
    assert(iters < 25, "the movement-based stop must fire before the cap")
    val pp = assignPP.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val base = Similarity.kmeansAssign(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val (cPP, cBase) = (cost(pp), cost(base))
    assert(cPP < cBase,
      f"k-means++ cost $cPP%.6f must beat lowest-id-seed cost $cBase%.6f")
  }

  test("contraction rounds grow logarithmically, not with the diameter") {
    // a 64-node path (diameter 63): min-label propagation needs ~63
    // rounds; large-star/small-star must land well under 2·log2(64)+2
    import spark.implicits._
    val n = 64L
    val edges = (1L until n).map(i => (i, i + 1)).toDF("doc1", "doc2")
    val nodes = (1L to n).toDF("doc_id")
    spark.conf.set("graft.cc.localSolveMaxEdges", "0")
    val (labels, rounds) =
      try TextOps.resolveClustersCounted(edges, nodes)
      finally spark.conf.unset("graft.cc.localSolveMaxEdges")
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to n).forall(got(_) == 1L), "path must collapse to one cluster")
    assert(rounds >= 1 && rounds <= 14,
      s"64-path took $rounds rounds (diameter-bound loop?)")
  }

  test("cluster resolution with a reliable checkpoint dir matches localCheckpoint") {
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc1", "doc2")
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("doc_id")
    val ckDir = java.nio.file.Files.createTempDirectory("graft_cc_ck").toString
    // force the distributed path — checkpointing is a no-op on the
    // driver union-find fast path
    spark.conf.set("graft.cc.localSolveMaxEdges", "0")
    val (reliable, local) =
      try (
        TextOps.resolveClusters(edges, nodes, Some(ckDir))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap,
        TextOps.resolveClusters(edges, nodes)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
      finally spark.conf.unset("graft.cc.localSolveMaxEdges")
    assert(reliable == local)
    assert(reliable == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("4-band simhash candidates are a superset of top-16-bit bucketing") {
    val sh = TextOps.simhash(spark, sf).withColumn("bucket",
      expr("simhash DIV 65536")).cache()
    val oldPairs = sh.alias("a").join(sh.alias("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .filter(bit_count(expr("a.simhash ^ b.simhash")) <= 6)
      .select(col("a.doc_id"), col("b.doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val newPairs = TextOps.simhashPairs(spark, sf)
      .select(col("doc1"), col("doc2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(oldPairs.subsetOf(newPairs),
      s"lost ${(oldPairs -- newPairs).take(5)}")
    sh.unpersist()
  }

  test("simhash band width grows with log2(corpus size), clamped to [8,16]") {
    assert(TextOps.simhashBandBits(100) == 8)      // small corpus: floor
    assert(TextOps.simhashBandBits(575) == 10)     // ceil(log2 575)
    assert(TextOps.simhashBandBits(1L << 14) == 14)
    assert(TextOps.simhashBandBits((1L << 14) + 1) == 15)
    assert(TextOps.simhashBandBits(1L << 40) == 16) // 32-bit signature cap
    // exact at powers of two (floating log2 would flip the ceil here)
    assert(TextOps.simhashBandBits(1024) == 10)
    assert(TextOps.simhashBandBits(1025) == 11)
  }

  test("adaptive sign bands bound max bucket occupancy to a small fraction of N") {
    val e = Similarity.vecs(spark, sf)
    val bands = Similarity.signBands(e, TextOps.simhashBandBits(e.count()))
    val n = bands.select(col("vec_id")).distinct().count()
    val occ = bands.groupBy(col("band_idx"), col("band_val"))
      .agg(count(lit(1)).as("c"))
    val maxOcc = occ.agg(max(col("c"))).collect().head.getLong(0)
    // the old single 8-dim bucket held N/256 expected per bucket and the
    // planted near-dup cluster in ONE bucket; 16-dim bands must spread the
    // corpus thin enough that no bucket concentrates a large fraction
    assert(maxOcc.toDouble / n <= 0.15, s"max bucket occupancy $maxOcc of $n")
    val buckets = occ.count()
    assert(buckets > 64, s"only $buckets distinct (band, value) buckets")
  }

  test("simhash of exact copies is identical; near-dups within hamming 6") {
    val sh = TextOps.simhash(spark, sf)
    val copies = sh.alias("a").join(sh.alias("b"),
      col("a.doc_id") + 2000000 === col("b.doc_id"))
    assert(copies.filter(col("a.simhash") =!= col("b.simhash")).count() == 0)
    val pairs = TextOps.simhashPairs(spark, sf)
    assert(pairs.filter(col("doc2") === col("doc1") + 2000000)
      .agg(max(col("hamming"))).collect().head.getInt(0) == 0)
  }

  test("decontamination flags only training docs, never the eval slice") {
    val out = TextOps.decontaminate(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    assert(out.keys.forall(_ % 97 != 0), "eval docs must not be flagged")
    assert(out.values.forall(_ > 0))
    // a planted EXACT duplicate of an eval doc shares all its shingles —
    // it must be flagged (if the corpus contains one at this SF)
    val dupOfEval = TextOps.corpus(spark, sf)
      .filter(col("doc_id") >= 2000000 &&
        (col("doc_id") - 2000000) % 97 === 0 && col("doc_id") % 97 =!= 0)
      .collect().map(_.getLong(0))
    dupOfEval.foreach(id => assert(out.contains(id), s"exact dup $id of eval doc unflagged"))
  }

  test("repetition metrics match an independent scala reference") {
    val docs = TData.documents(spark, sf).limit(25).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toMap
    val got = TextOps.repetitionMetrics(spark, sf)
      .filter(col("doc_id").isin(docs.keys.toSeq: _*)).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    docs.foreach { case (id, text) =>
      val w = text.split(" ", -1)
      if (w.length >= 2) {
        val top = w.groupBy(identity).valuesIterator.map(_.length).max
        val twoGrams = w.sliding(2).map(_.mkString(" ")).toSeq
        val wantTop = math.floor(top * 10000.0 / w.length).toLong
        val wantDup = math.floor(
          (1.0 - twoGrams.distinct.size.toDouble / twoGrams.size) * 10000).toLong
        assert(got(id) == ((wantTop, wantDup)), s"doc $id")
      } else assert(!got.contains(id))
    }
  }

  test("PII redaction counts and scrubs the synthesized contact footers") {
    val out = TextOps.piiRedact(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    assert(out.nonEmpty)
    out.foreach { case (id, emails, phones) =>
      if (id % 7 == 0) assert(emails >= 1 && phones >= 1, s"doc $id not flagged")
      else assert(emails == 0 && phones == 0, s"false positive on doc $id")
    }
  }

  test("native cosine_sim matches a scala reference implementation") {
    val s = spark
    import s.implicits._
    // collect ONCE and rebuild the DataFrame from the collected rows: two
    // executions of an unordered limit(50) may pick different row sets
    val rows = TData.embeddings(spark, sf).limit(50)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def ref(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val df = rows.toSeq.toDF("vec_id", "v")
    val got = df.alias("a").crossJoin(df.alias("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        VectorFunctions.cosine_sim(col("a.v"), col("b.v")).as("c"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val byId = rows.toMap
    got.foreach { case ((i, j), c) =>
      assert(math.abs(c - ref(byId(i), byId(j))) < 1e-12, s"pair ($i,$j)")
    }
  }

  test("knn brute rank-1 matches an independent scala reference computation") {
    val all = TData.embeddings(spark, sf)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(x: Double): Double = // mirror the query's round(.., 6)
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = all.filter(_._1 % 50 == 0).map { case (qid, qv) =>
      val best = all.filter(_._1 != qid)
        .map { case (id, v) => (id, r6(cos(qv, v))) }
        .maxBy { case (id, c) => (c, -id) } // cos desc, id asc tiebreak
      qid -> best._1
    }.toMap
    val got = Similarity.knnBrute(spark, sf)
      .filter(col("knn_rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("IVF knn recall@5 vs brute-force baseline") {
    val brute = Similarity.knnBrute(spark, sf)
      .select(col("q_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.knnIvf(spark, sf)
      .select(col("q_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf intersect brute).size.toDouble / brute.size
    // √N cells with nprobe=2 probes ~2/√N of the corpus; on the synthetic
    // clustered embeddings that must recover a meaningful share of the
    // true top-5 — and, sanity: IVF never returns MORE than k per query.
    assert(recall >= 0.3, s"recall@5 = $recall")
    assert(ivf.groupBy(_._1).forall(_._2.size <= 5))
  }

  test("multi-probe LSH knn recall@5 vs brute-force baseline") {
    val lsh = Similarity.knnLshBucket(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.knnBrute(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty)
    val recall = (lsh intersect brute).size.toDouble / brute.size
    // the synthetic corpus is near-random — the WORST case for sign-LSH
    // (a random vector's "top-5" sit at ~70°, where W-sign agreement is
    // rare; genuinely close vectors are what LSH buckets catch, covered
    // by the near-dup/minhash recall specs). The multi-probe ring must
    // still recover a nonzero floor even here; single-probe wide bands
    // returned ~0 candidates on this corpus.
    assert(recall >= 0.15, s"recall@5 = $recall")
  }

  test("HLL approx_count_distinct is within 5×rsd of the exact count") {
    // rsd = 0.01 requested; 5 standard deviations is a safely non-flaky
    // bound while still proving the estimate tracks the exact count. The
    // query now emits the bound check itself (within_bound) — the oracle
    // pins it to true, this spec asserts the same from the typed side.
    val rows = Analytics.qApproxDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2),
        s"flag ${r.getString(0)}: estimate drifted past 5×rsd of ${r.getLong(1)}")
    }
  }

  test("stratified sample is reproducible and respects per-stratum rates") {
    val s1 = TextOps.stratifiedSample(spark, sf).collect()
      .map(_.getLong(0)).sorted.toSeq
    val s2 = TextOps.stratifiedSample(spark, sf).collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(s1 == s2, "hash sampling must be reproducible run-to-run")
    val byLang = TextOps.stratifiedSample(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = TData.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // iterate the POPULATION strata: a stratum dropped entirely by a
    // sampling bug must fail, not be silently skipped
    totals.foreach { case (lang, total) =>
      val rate = byLang.getOrElse(lang, 0L).toDouble / total
      val want = if (lang == "en") 0.5 else 0.9
      assert(math.abs(rate - want) < 0.2, s"$lang rate $rate, want ~$want")
    }
  }

  test("int8 quantization dequantizes within the per-vector error bound") {
    val rows = Similarity.embeddingQuantize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getDouble(1)
      val maxErrE4 = r.getLong(3)
      assert(scale > 0)
      // int8 max-abs quantization error is <= scale/254 per element
      assert(maxErrE4 <= math.ceil(scale / 254 * 10000).toLong + 1,
        s"vec ${r.getLong(0)}: err $maxErrE4 vs scale $scale")
    }
  }

  test("tfidf terms: exactly <=3 per doc, deterministic rank tie-break") {
    val terms = TextOps.tfidfTerms(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
    val byDoc = terms.groupBy(_._1)
    assert(byDoc.values.forall(_.length <= 3))
    byDoc.values.foreach { ts =>
      val sorted = ts.sortBy(_._4)
      // ranks are 1..n and scores non-increasing
      assert(sorted.map(_._4).toSeq == (1 to sorted.length))
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._3 >= b._3
        case _ => true
      })
    }
  }

  test("keep-best retains the max-quality doc of each cluster") {
    val labels = TextOps.dedupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val qkeys = TextOps.corpus(spark, sf).selectExpr("doc_id",
        "(size(array_distinct(split(text, ' '))) * 1000000L) div size(split(text, ' ')) AS qkey")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = labels.groupBy(_._2).map { case (cid, members) =>
      val best = members.keys.toSeq
        .sortBy(id => (-qkeys(id), id)).head // max qkey, min doc_id tie
      cid -> (best, members.size.toLong)
    }
    val got = TextOps.dedupKeepBest(spark, sf).collect()
      .map(r => r.getAs[Long]("cluster_id") ->
        (r.getAs[Long]("keep_doc"), r.getAs[Long]("n_members"))).toMap
    assert(got == want)
  }

  test("chunking covers every token, chunks bounded by the window width") {
    val n = TData.documents(spark, sf)
      .selectExpr("doc_id", "size(split(text, ' ')) AS n").collect()
      .map(r => r.getLong(0) -> r.getAs[Int]("n")).toMap
    val chunks = TextOps.chunkOverlap(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("start_tok"),
        r.getAs[Long]("n_chunk_tokens")))
    chunks.foreach { case (_, _, len) => assert(len >= 1 && len <= 32) }
    // stride-24 windows of width 32 from position 1 must tile 1..n
    chunks.groupBy(_._1).foreach { case (doc, cs) =>
      val covered = cs.flatMap(c => c._2 until (c._2 + c._3)).toSet
      assert(covered == (1L to n(doc).toLong).toSet, s"doc $doc gap")
    }
  }

  test("quality gate keeps at least half of every language, threshold tight") {
    val q = TData.documents(spark, sf).selectExpr("doc_id", "lang",
      "(size(array_distinct(split(text, ' '))) * 1000000L) div size(split(text, ' ')) AS qkey")
    val totals = q.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = TextOps.qualityGate(spark, sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("qkey"),
        r.getAs[Long]("thr")))
    kept.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.size >= (totals(lang) + 1) / 2, s"$lang kept too few")
      val thr = rows.head._3
      assert(rows.forall(_._2 >= thr))
      assert(rows.exists(_._2 == thr), s"$lang threshold not tight")
    }
    assert(kept.map(_._1).toSet == totals.keySet)
  }

  test("kmeans partitions the corpus deterministically into ≤k clusters") {
    val a = Similarity.kmeansAssign(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1))
    val n = TData.embeddings(spark, sf).count()
    assert(a.length == n, "every vector assigned exactly once")
    assert(a.map(_._1).distinct.length == a.length)
    val clusters = a.map(_._2).distinct
    assert(clusters.forall(c => c >= 0 && c < 8))
    assert(clusters.length >= 2, "degenerate single-cluster solution")
    // re-running the whole fit reproduces the identical assignment
    val b = Similarity.kmeansAssign(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1))
    assert(a.sortBy(_._1).sameElements(b.sortBy(_._1)))
  }

  test("split assign: stable 80/10/10-ish partition of the corpus") {
    val rows = TextOps.splitAssign(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val n = rows.length.toDouble
    assert(rows.forall { case (_, sp, b) =>
      b >= 0 && b < 100 &&
        sp == (if (b < 80) "train" else if (b < 90) "val" else "test")
    })
    val frac = rows.groupBy(_._2).view.mapValues(_.length / n).toMap
    assert(frac("train") > 0.6 && frac("train") < 0.95)
    assert(frac.getOrElse("val", 0.0) > 0.0 && frac.getOrElse("test", 0.0) > 0.0)
  }

  test("epoch shuffle: a reproducible permutation that changes across epochs") {
    val docs = TData.documents(spark, sf)
    val n = docs.count()
    val e7 = TextOps.epochShuffleOver(docs, epoch = 7, numShards = 8).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // a permutation: every doc exactly once, shard positions contiguous 1..n_s
    assert(e7.length == n && e7.map(_._1).distinct.length == e7.length)
    e7.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.sameElements(1L to rows.length))
    }
    // reproducible: a rerun of the same epoch is bit-identical
    val again = TextOps.epochShuffleOver(docs, epoch = 7, numShards = 8).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(e7.sortBy(_._1).sameElements(again.sortBy(_._1)))
    // a new epoch is a genuinely different permutation (docs move shards)
    val e8 = TextOps.epochShuffleOver(docs, epoch = 8, numShards = 8).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val moved = e7.sortBy(_._1).zip(e8.sortBy(_._1))
      .count { case ((_, s7, p7), (_, s8, p8)) => s7 != s8 || p7 != p8 }
    assert(moved > n / 2, s"epoch change must reshuffle most docs (moved=$moved)")
  }

  test("paragraph dedup: first-occurrence-wins, independent recompute agrees") {
    val out = TextOps.dedupParagraph(spark, sf)
    val docs = TData.documents(spark, sf).select(col("doc_id"), col("text"))
    // independent in-memory recomputation with a different formulation:
    // raw window text + lexicographic (doc_id, idx) first-occurrence, vs
    // the operator's md5 keys + encoded-integer min
    val wins = TextOps.corpus(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("w")).collect()
      .flatMap { r =>
        val id = r.getLong(0); val w = r.getSeq[String](1)
        (0 until w.size / 12).map(i => (id, i, w.slice(i * 12, i * 12 + 12).mkString(" ")))
      }
    val keepers = wins.groupBy(_._3)
      .map { case (_, occ) => occ.minBy(o => (o._1, o._2)) }.toSet
    val expDropped = wins.filterNot(keepers.contains)
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    // the corpus really contains repeated spans (planted boilerplate
    // phrases + the exact-copy docs) — the operator has work to do here
    assert(expDropped.nonEmpty)
    out.select("doc_id", "n_dropped").collect().foreach { r =>
      assert(r.getLong(1) == expDropped.getOrElse(r.getLong(0), 0L),
        s"doc ${r.getLong(0)}")
    }
    // exact copies (+2000000) lose every FULL window to the original's
    // first occurrence; only the short-tail exemption survives
    val copies = out.filter(col("doc_id") >= 2000000)
      .withColumn("doc_id", col("doc_id") - 2000000)
      .join(docs, Seq("doc_id"))
      .withColumn("toks", size(split(col("text"), " ")))
      .withColumn("expect_clean", expr(
        "CASE WHEN toks % 12 = 0 THEN '' " +
          "ELSE array_join(slice(split(text, ' '), (toks div 12)*12 + 1, 12), ' ') END"))
    assert(copies.count() > 0)
    assert(copies.filter(col("n_dropped") =!= expr("toks div 12")).count() == 0)
    assert(copies.filter(col("clean_text") =!= col("expect_clean")).count() == 0)
    // docs that lost nothing reassemble byte-exact
    assert(out.filter(col("n_dropped") === 0).join(docs, Seq("doc_id"))
      .filter(col("clean_text") =!= col("text")).count() == 0)
  }

  test("boilerplate strip: bounds hold and the hot grams really clear df>N/10") {
    val out = TextOps.boilerplateStrip(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.foreach { case (_, grams, boiler, kept) =>
      assert(boiler >= 0 && boiler <= grams)
      assert(kept == (grams - boiler) * 10000 / grams)
    }
    // independent df recomputation: flagged mass must exist iff some gram
    // clears the threshold (small vocab => boilerplate is expected here)
    val thresh = TextOps.corpus(spark, sf).count() / 10
    val hot = TextOps.corpus(spark, sf)
      .selectExpr("doc_id", "explode(array_distinct(transform(" +
        "sequence(1, greatest(size(split(text,' ')) - 2, 0)), i -> concat_ws(' ', " +
        "element_at(split(text,' '), i), element_at(split(text,' '), i+1), " +
        "element_at(split(text,' '), i+2))))) AS g")
      .groupBy("g").count().filter(col("count") > thresh).count()
    assert((out.map(_._3).sum > 0) == (hot > 0))
  }

  test("temperature mixing flattens the source distribution (α=0.5)") {
    val counts = TData.documents(spark, sf).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bp = TextOps.mixTemperature(spark, sf).select("source", "bp")
      .distinct().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bp.values.forall(v => v >= 0 && v <= 10000))
    // sqrt weighting: a rarer source never gets a LOWER acceptance rate
    for {
      (s1, n1) <- counts; (s2, n2) <- counts
      if n1 < n2 && bp.contains(s1) && bp.contains(s2)
    } assert(bp(s1) >= bp(s2),
      s"rarer $s1 (n=$n1, bp=${bp(s1)}) below $s2 (n=$n2, bp=${bp(s2)})")
  }

  test("sql registration of cosine_sim works") {
    VectorFunctions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").collect()
    assert(math.abs(r.head.getDouble(0) - 1.0) < 1e-15)
  }

  test("domain cap survives a mega-domain: bounded top-K, window-form parity") {
    // a CommonCrawl-shaped skew case: ONE domain holds 50k rows (the
    // window form would sort all of them in a single task), three small
    // domains around it, planted ties on n_chars to exercise the
    // doc_id tiebreak
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_domcap").toString
    val mega = spark.range(0, 50000).selectExpr(
      "id AS doc_id", "'x' AS text", "'en' AS lang",
      "'megadomain.com' AS source",
      "CAST(1000 + (id % 100) AS bigint) AS n_chars")
    val small = spark.range(0, 40).selectExpr(
      "id + 100000 AS doc_id", "'y' AS text", "'en' AS lang",
      "concat('small', CAST(id % 3 AS string), '.org') AS source",
      "CAST(10 + id AS bigint) AS n_chars")
    mega.unionByName(small).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = TextOps.domainCap(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_chars"), r.getAs[Int]("rn")))
    // exactly K=30 from the mega-domain, everything from domains under K
    val byDomain = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byDomain("megadomain.com") == 30, byDomain.toString)
    assert(byDomain.filter(_._1.startsWith("small")).values.forall(c => c == 13 || c == 14))
    // parity with the window-form definition computed independently
    import org.apache.spark.sql.expressions.Window
    val expected = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("rn", row_number().over(Window.partitionBy(col("source"))
        .orderBy(col("n_chars").desc, col("doc_id"))))
      .filter(col("rn") <= 30)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_chars"), r.getAs[Int]("rn"))).toSet
    assert(out.toSet == expected)
  }

  test("top-k aggregators reject a beaten candidate in O(1) — same buffer instance back, no re-sort") {
    // the dominant case on a large candidate stream is a candidate the
    // full buffer's worst entry already beats; a sort-per-insert there
    // wedged one task for 10+ CPU-minutes on an 8M-pair stream at the
    // sf1-shaped sweep. Pin the fast path by identity: reduce() must
    // hand back the SAME Seq instance, proving no allocation happened.
    val tk = new graft.functions.TopKAggregator(2)
    val full = tk.reduce(tk.reduce(tk.zero, (1L, 0.9)), (2L, 0.8))
    assert(tk.reduce(full, (3L, 0.5)) eq full)        // lower score
    assert(tk.reduce(full, (9L, 0.8)) eq full)        // tie score, higher id
    assert(tk.reduce(full, (0L, 0.95)) ne full)       // better: accepted
    assert(tk.reduce(full, (1L, 0.8)).map(_._2).contains(1L)) // tie, lower id wins
    val ts = new graft.functions.TopStringsAggregator(2)
    val fs = ts.reduce(ts.reduce(ts.zero, ("aa", 9L)), ("bb", 8L))
    assert(ts.reduce(fs, ("cc", 3L)) eq fs)           // lower score
    assert(ts.reduce(fs, ("zz", 8L)) eq fs)           // tie score, later string
    assert(ts.reduce(fs, ("ab", 9L)) ne fs)           // accepted
  }

  test("source mixing survives digitless source names (skew-sweep pin)") {
    // 'mega-host.example' has no digits: the weight derivation used to
    // ANSI-cast '' to BIGINT and crash. Digitless sources take the
    // default weight 1; digit-bearing names keep their derived weights.
    val dir = java.nio.file.Files.createTempDirectory("graft_mix").toString
    spark.range(0, 900).selectExpr(
        "id AS doc_id", "'t' AS text", "'en' AS lang",
        "CASE WHEN id % 3 = 0 THEN 'mega-host.example' " +
          "WHEN id % 3 = 1 THEN 'src1' ELSE 'src22' END AS source",
        "CAST(1 AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.mixSources(spark, dir)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("w")))
    val wBySource = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(wBySource("mega-host.example") == Set(1L), wBySource.toString)
    assert(wBySource("src1") == Set(2L))   // 1 % 3 + 1
    assert(wBySource("src22") == Set(2L))  // 22 % 3 + 1 = 2
    // every source is sampled, none oversampled past its own count
    val kept = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(kept.keySet == Set("mega-host.example", "src1", "src22"))
    assert(kept.values.forall(n => n > 0 && n <= 300), kept.toString)
  }

  test("fixed chunking: overlap, stable ids, tail rule, degenerate docs, no shuffle") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_chunk").toString
    def words(n: Int): String = (0 until n).map(i => s"w$i").mkString(" ")
    Seq(
      (1L, words(60)),  // 3 windows: [0,32) [24,56) [48,60)
      (2L, words(32)),  // exactly one window; the 24-start tail would add
                        // nothing new and must NOT be emitted
      (3L, words(33)),  // the 24-start tail adds one new token → emitted
      (4L, ""),         // degenerate: zero chunks
      (5L, "   ")       // whitespace-only: zero chunks
    ).toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    import org.apache.spark.sql.functions.col
    val out = TextOps.chunkFixed(spark, dir) // 32-token windows, overlap 8
    val rows = out.collect().map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("chunk_idx"), r.getAs[Long]("n_tokens"),
      r.getAs[String]("chunk_text"))).sortBy(t => (t._1, t._2))
    assert(rows.map(t => (t._1, t._2, t._3)).toSeq == Seq(
      (1L, 0L, 32L), (1L, 1L, 32L), (1L, 2L, 12L),
      (2L, 0L, 32L),
      (3L, 0L, 32L), (3L, 1L, 9L)), rows.mkString("\n"))
    // overlap: window i>0 begins with the previous window's last 8 tokens
    val d1 = rows.filter(_._1 == 1L).map(_._4.split(" ").toSeq)
    assert(d1(1).take(8) == d1(0).takeRight(8))
    assert(d1(2).take(8) == d1(1).takeRight(8))
    // coverage: window 0 plus each later window's NEW tokens rebuilds the doc
    assert((d1(0) ++ d1(1).drop(8) ++ d1(2).drop(8)).mkString(" ") == words(60))
    // stable ids: a recompute yields the identical chunk set
    val again = TextOps.chunkFixed(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet
    assert(again == rows.map(t => (t._1, t._2, t._4)).toSet)
    // embarrassingly parallel: the plan must carry NO exchange — chunking
    // a 100 TB corpus is a pure map over input splits
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
