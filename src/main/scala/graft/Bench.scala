package graft
import org.apache.spark.sql.SparkSession
import graft.ops.SessionCache

object Bench {
  /** Truncation-robust pass order for passes >= 2: families (the shared-
    * staging groups keyed by first letter — SessionCache pins live for
    * exactly one contiguous family) sorted by DESCENDING pass-1 total,
    * queries inside each family by descending pass-1 time. A
    * budget-truncated pass then under-samples only the cheapest tail —
    * with the alphabetical order, whichever family sorted last lost its
    * second sample no matter how expensive it was, and min-of-one on a
    * heavy entry is exactly how phantom tail regressions got printed.
    * Families stay contiguous, so the per-family pin release boundary
    * fires once per family, same as the alphabetical order.
    */
  def heavyFirstOrder(names: Seq[String],
                      pass1: Map[String, Double]): Seq[String] =
    names.groupBy(_.head).toSeq
      .sortBy { case (fam, qs) =>
        (-qs.map(q => pass1.getOrElse(q, 0.0)).sum, fam) }
      .flatMap { case (_, qs) =>
        qs.sortBy(q => (-pass1.getOrElse(q, 0.0), q)) }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional comma-separated filter (dev iteration / per-op scaling
    // measurements; the driver always benches the full suite)
    val queries = sys.env.get("SPARK_GRAFT_ONLY") match {
      case Some(names) =>
        SparkEntry.queries.view.filterKeys(names.split(",").toSet).toMap
      case None => SparkEntry.queries
    }
    // Family-grouped deterministic order (a Map's iteration order is
    // hash-scattered above 4 entries): sorting groups `a*`, `b*`, …, `x*`
    // so each SessionCache staging pin lives exactly as long as the query
    // family that shares it. The release at every family boundary stops
    // pins from accumulating across the whole 2×N-query run — holding all
    // of them at once squeezes execution memory/GC for every unrelated
    // query (the round-3 across-the-board regression).
    val names = queries.keys.toSeq.sorted
    // name -> error message for queries that threw in the TIMED pass: a
    // failed query must not silently score ~0 s and deflate the total —
    // the bench reports it and exits nonzero (it must not self-certify)
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val startNs = System.nanoTime()
    def elapsedS: Double = (System.nanoTime() - startNs) / 1e9
    // WALL-CLOCK BUDGET: the round-7 official bench was rc 124 / parsed
    // null because 6 unbounded passes collided with a host noise episode
    // (driver pass 2 alone: 1558.7 s) and the harness timeout killed the
    // JVM before any result line was printed. The budget bounds total
    // wall-clock so the driver's run ALWAYS finishes and prints: after
    // each completed timed pass — and, from pass 2 on, after each QUERY —
    // the bench stops if the budget is spent. Pass 1 always runs to
    // completion (every query needs ≥1 sample); min-of-passes scoring is
    // unaffected, it just sees however many samples fit the budget.
    val budgetS = sys.env.get("SPARK_GRAFT_BENCH_BUDGET_S")
      .flatMap(_.toDoubleOption).getOrElse(480.0)
    /** Run one pass over `order`; `mustComplete` ignores the budget
      * (pass-1 completeness — every query needs a first sample); returns
      * (samples, completed).
      */
    def runPass(order: Seq[String], timed: Boolean, mustComplete: Boolean,
                capS: Double,
                onSample: Seq[(String, Double)] => Unit = _ => (),
                onStaging: Seq[(String, Double)] => Unit = _ => ())
        : (Seq[(String, Double)], Boolean) = {
      val out = Seq.newBuilder[(String, Double)]
      var fam = ' ' // sentinel: no query name starts with a space
      var completed = true
      val it = order.iterator
      while (it.hasNext) {
        val n = it.next()
        if (!mustComplete && elapsedS > capS) {
          completed = false
          System.err.println(
            f"[bench] budget ${capS}%.0f s spent at ${elapsedS}%.1f s — " +
              s"abandoning pass before '$n'")
          return (out.result(), completed)
        }
        if (fam != ' ' && n.head != fam) {
          SessionCache.releaseAll(spark)
          System.err.println(f"[bench] family '$fam' done; storage now " +
            f"${spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum / 1048576L} MiB")
        }
        fam = n.head
        val t0 = System.nanoTime()
        try { queries(n)(spark, sfDir).count(); () }
        catch { case e: Throwable =>
          if (timed) {
            errors(n) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
            System.err.println(s"[bench] FAILED $n: $e")
          }
        }
        val rawS = (System.nanoTime() - t0) / 1e9
        // shared-staging attribution: SessionCache materializes pins
        // eagerly and logs their build time; the consuming query's sample
        // is reported NET of that one-time cost and the staging lines are
        // scored separately — so a query's cross-round ratio reflects the
        // query, not whichever entry happened to build the family's
        // shared index first (the round-9 x_tfidf_terms misread)
        val staged = ops.SessionCache.drainStaging(spark)
        if (timed) onStaging(staged)
        out += n -> math.max(0.0, rawS - staged.map(_._2).sum)
        if (timed) onSample(out.result())
      }
      // no trailing release: the last family's pins carry into the next
      // pass's first boundary (steady-state warm cache), and the final
      // releaseAll below reclaims everything before shutdown
      (out.result(), completed)
    }
    // Timed passes scored by per-query MINIMUM. Single-pass numbers
    // drifted 20%+ run-to-run on identical binaries (r5 51.1s vs r6
    // 62.6s), which makes any "within 2x of baseline" gate meaningless,
    // and a median doesn't survive this box either: host noise arrives in
    // multi-minute EPISODES (measured pass totals 135/204/482/77/65 s in
    // ONE 5-pass run of identical queries — three of five passes stolen,
    // one at 7x), so any rank statistic except the min still reports the
    // hypervisor, not the engine. VM noise is strictly ADDITIVE: the
    // fastest observation of a deterministic query is the one with the
    // least interference, so per-query min across passes estimates
    // intrinsic cost — the same steady-state quantity the single-pass
    // baseline measured on a calm run. The median and a noise ratio
    // (median per-query max/min spread) ship alongside so a reader can
    // see exactly how noisy the run was; per-pass totals go to stderr to
    // make an episode visible after the fact.
    //
    // TWO-SAMPLE GUARANTEE (bench_schema 4): the r15 driver window
    // completed only ONE timed pass inside the budget, so "min of passes"
    // had a single contended sample per query and the tail printed 5-10x
    // phantom regressions. min-of-one is not a minimum. The fix costs
    // nothing: the old standalone warmup pass (a full untimed suite run,
    // ~25% of the budget) is GONE — pass 1 is the warmup, its cold-start
    // residue discarded by the min — and the time it used to burn now
    // funds a second mustComplete-shaped pass. Pass 1 always completes;
    // pass 2 always STARTS and runs under a hard 1.6x-budget ceiling
    // (bounded worst case for the harness timeout) instead of the normal
    // budget; passes 3+ are budget-gated as before. A calm host still
    // fits 4-5 passes in the budget; a contended host now produces >=2
    // samples per query unless the episode is r7-catastrophic.
    val passCount = sys.env.get("SPARK_GRAFT_PASSES").map(_.toInt).getOrElse(5)
    // Scoreboard state shared with the shutdown hook: after every timed
    // SAMPLE (and, with final flags, after every completed pass) the
    // current cumulative JSON line is staged here, so a harness SIGTERM at
    // any point past the first timed query still emits the best available
    // scoreboard instead of discarding finished work (the r7 failure
    // mode: 2 complete passes discarded, parsed null).
    @volatile var latestJson: Option[(String, String)] = None
    @volatile var printedNormally = false
    def emit(lines: (String, String)): Unit = {
      val (big, compact) = lines
      println(big)
      println(compact) // last line a tail-bounded reader sees before sbt's
      // sbt prints "[success] Total time: …" after the forked JVM exits,
      // so a last-line parser can't rely on stdout alone; the file is the
      // durable channel (big line only — one parseable JSON document).
      // Filtered dev runs must not overwrite the full-suite snapshot.
      if (sys.env.get("SPARK_GRAFT_ONLY").isEmpty) {
        try {
          java.nio.file.Files.write(
            java.nio.file.Paths.get("bench_last.json"),
            (big + "\n").getBytes("UTF-8"))
        } catch { case e: Throwable =>
          // the metric line already went to stdout; losing the file copy
          // is survivable but must not be SILENT
          System.err.println(s"[bench] WARNING: could not write bench_last.json: $e")
        }
      }
    }
    val hook = new Thread(() => {
      if (!printedNormally) latestJson.foreach { j =>
        System.err.println("[bench] shutdown hook: emitting last complete scoreboard")
        emit(j)
        System.out.flush()
      }
    }, "bench-shutdown-emit")
    Runtime.getRuntime.addShutdownHook(hook)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // HOST-FACTOR CALIBRATION: every round since r8 carried a prose
    // host-speed caveat; this makes it data. Three code-frozen probe
    // queries with per-query-min anchors recorded from the committed
    // calm-window round-10 snapshot (bench_last.json @ a57e890, sf0.1,
    // 32 cpus). host_factor = median over probes of (this run's
    // per-query min / anchor): ~1.0 on a calm host, >1 when the
    // hypervisor is stealing cycles. Cross-round ratios should divide by
    // it before being read as engine regressions. Probes whose CODE
    // changes must be re-anchored (they are chosen as frozen shapes:
    // a lateral flatten, a partitioned overwrite, a winnowing scan).
    val hostAnchors: Map[String, Double] = Map(
      "a2_explode_drops_empty" -> 0.560451409,
      "b9_insert_overwrite" -> 1.014076683,
      "x_winnow_fingerprint" -> 1.012613146)
    def scoreboard(passes: Seq[Map[String, Double]],
                   stagingPasses: Seq[Map[String, Double]],
                   passesCompleted: Int, partialPass: Boolean)
        : (String, String) = {
      // A mid-pass-1 kill leaves some queries with zero samples; score the
      // benched prefix and report coverage, so the shutdown hook always
      // has SOMETHING parseable to emit (the r7 failure left nothing).
      val benched = names.filter(n => passes.exists(_.contains(n)))
      val perQuery = benched.map { n =>
        val samples = passes.flatMap(_.get(n))
        (n, median(samples), samples.min, samples.max)
      }
      // headline = per-query min (intrinsic cost; see the scoring note)
      val qs = perQuery.map { case (k, _, mn, _) => s"\"" + k + "\":" + mn }
        .mkString("{", ",", "}")
      val qsMedian = perQuery.map { case (k, med, _, _) => s"\"" + k + "\":" + med }
        .mkString("{", ",", "}")
      // staging pins scored like queries: per-key min across the passes
      // that (re)built them — a pass whose family kept a warm pin from
      // the previous pass simply contributes no sample for that key
      val stagedKeys = stagingPasses.flatMap(_.keys).distinct.sorted
      val stagingPer = stagedKeys.map { k =>
        (k, stagingPasses.flatMap(_.get(k)).min)
      }
      val stagingTotal = stagingPer.map(_._2).sum
      val stagingJson = stagingPer.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      // headline total still counts staging ONCE (the work is real and
      // cross-round totals must stay comparable) — it is just no longer
      // hidden inside an arbitrary first-consumer query
      val total = perQuery.map(_._3).sum + stagingTotal
      val totalMedian = perQuery.map(_._2).sum + stagingTotal
      // per-query spread = max/min across passes; the reported noise field
      // is the median spread (robust to a single pathological query)
      val noise = median(perQuery.map { case (_, _, mn, mx) =>
        if (mn > 0) mx / mn else 1.0 })
      // host factor from whichever probes have samples so far (all three
      // once pass 1 completes); null until the first probe lands
      // anchors were recorded at sf0.1/32cpu — a probe against another
      // scale factor would report data volume, not host speed
      val probeRatios =
        if (!sfDir.contains("sf0.1")) Seq.empty
        else hostAnchors.toSeq.sorted.flatMap { case (k, anchor) =>
          perQuery.find(_._1 == k).map { case (_, _, mn, _) => (k, mn, anchor) }
        }
      val hostFactor =
        if (probeRatios.isEmpty) "null"
        else median(probeRatios.map { case (_, mn, a) => mn / a }).toString
      val hostProbeJson = probeRatios.map { case (k, mn, a) =>
        "\"" + k + "\":{\"s\":" + mn + ",\"anchor\":" + a + "}"
      }.mkString("{", ",", "}")
      val errJson =
        if (errors.isEmpty) ""
        else errors.map { case (k, v) =>
          "\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"")
            .replaceAll("[\\x00-\\x1f]", " ") + "\""
        }.mkString(",\"errors\":{", ",", "}")
      // every query's sample count; the minimum is the honesty metric —
      // min_samples_per_query >= 2 means no score is a min-of-one
      val minSamples =
        if (benched.isEmpty) 0
        else benched.map(n => passes.count(_.contains(n))).min
      // bench_schema marks scoring-comparability breaks: 1 = single-pass
      // median (r1-6); 3 = min-of-passes net of staging with a separate
      // warmup pass (r7-15); 4 = same scoring, warmup folded into pass 1
      // and pass 2 guaranteed to start (two-sample guarantee). Min-based
      // totals stay comparable 3<->4; medians include pass 1's cold
      // samples from schema 4 on.
      val big =
        s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""bench_schema":4,"passes":$passCount,""" +
        s""""staging":$stagingJson,"staging_total":$stagingTotal,""" +
        s""""passes_completed":$passesCompleted,"partial_pass":$partialPass,""" +
        s""""queries_benched":${benched.size},"queries_total":${names.size},""" +
        s""""min_samples_per_query":$minSamples,""" +
        s""""budget_s":$budgetS,""" +
        s""""scoring":"per-query min of passes, net of shared staging",""" +
        s""""host_factor":$hostFactor,"host_probe":$hostProbeJson,""" +
        s""""host_anchor_ref":"bench_last.json@a57e890 (r10 calm window)",""" +
        s""""total_median":$totalMedian,"queries_median":$qsMedian,""" +
        s""""noise_spread_median":$noise,"sf":"$sfDir"$errJson}"""
      // COMPACT summary, printed LAST: the full line above runs ~15 KB
      // (189 queries x 2 objects) and every driver round so far captured
      // only the final ~2000 chars of stdout — the headline total,
      // passes_completed and host_factor all lived in the truncated-away
      // head. This line is self-contained, under ~1.5 KB (top-12 slowest
      // per-query mins only), and carries the same headline numbers; the
      // full per-query detail stays in the big line and bench_last.json.
      val top = perQuery.sortBy(-_._3).take(12)
        // Locale.ROOT: the f-interpolator uses the JVM default locale, so
        // a comma-decimal locale would render "q1":1,234 — invalid JSON
        // in the one line a tail-bounded reader must parse
        .map { case (k, _, mn, _) => "\"" + k + "\":" +
          String.format(java.util.Locale.ROOT, "%.3f", Double.box(mn)) }
        .mkString("{", ",", "}")
      val compact =
        s"""{"metric":"total","value":$total,"unit":"sec",""" +
        s""""bench_schema":4,"summary_of":"full line above / bench_last.json",""" +
        s""""passes_completed":$passesCompleted,"partial_pass":$partialPass,""" +
        s""""queries_benched":${benched.size},"queries_total":${names.size},""" +
        s""""min_samples_per_query":$minSamples,"errors":${errors.size},""" +
        s""""host_factor":$hostFactor,"noise_spread_median":$noise,""" +
        s""""staging_total":$stagingTotal,"total_median":$totalMedian,""" +
        s""""queries":$top,"queries_truncated":true,"sf":"$sfDir"}"""
      (big, compact)
    }
    // No standalone warmup pass (schema 4): pass 1 IS the warmup.
    // JVM/codegen/file-index cold costs land in pass-1 samples and the
    // per-query min over the guaranteed second pass discards them —
    // where the old untimed warmup spent ~25% of the budget producing
    // zero samples, the same wall-clock now funds the second sample
    // that makes min-of-passes an actual minimum.
    val passBuf = scala.collection.mutable.ArrayBuffer.empty[Map[String, Double]]
    val stagingBuf = scala.collection.mutable.ArrayBuffer.empty[Map[String, Double]]
    var passesCompleted = 0
    var partialPass = false
    var i = 1
    var stop = false
    while (i <= passCount && !stop) {
      System.err.println(
        f"[bench] timed pass $i/$passCount (elapsed ${elapsedS}%.1f s / budget ${budgetS}%.0f s)")
      // pass 1 must complete: every query needs at least one timed sample.
      // pass 2 always STARTS (even past budget) and runs under a hard
      // 1.6x ceiling — the two-sample guarantee that keeps a single
      // contended pass from publishing min-of-one tails — while passes 3+
      // obey the normal budget. Every timed sample refreshes the staged
      // scoreboard, so a harness kill at ANY point past the first timed
      // query still emits a parseable (partial-coverage) line via the
      // shutdown hook.
      val stagingPass =
        scala.collection.mutable.LinkedHashMap.empty[String, Double]
      val passCap = if (i == 2) budgetS * 1.6 else budgetS
      // pass 1 runs alphabetical (no cost data yet); passes >= 2 run
      // heaviest-first from pass-1 samples, so a truncated pass loses
      // second samples only for the cheapest entries
      val order =
        if (i == 1 || passBuf.isEmpty) names
        else heavyFirstOrder(names, passBuf.head)
      val (samples, completed) =
        runPass(order, timed = true, mustComplete = i == 1, capS = passCap,
          onSample = s => latestJson =
            Some(scoreboard(passBuf.toSeq :+ s.toMap,
              stagingBuf.toSeq :+ stagingPass.toMap, passesCompleted,
              partialPass = true)),
          onStaging = st => st.foreach { case (k, v) =>
            stagingPass(k) = stagingPass.getOrElse(k, 0.0) + v })
      passBuf += samples.toMap
      stagingBuf += stagingPass.toMap
      // per-pass totals expose monotone degradation (state/GC buildup)
      // that the median alone would mask as "noise"
      System.err.println(f"[bench] pass $i total ${samples.map(_._2).sum}%.1f s" +
        (if (completed) "" else " (partial)"))
      if (completed) passesCompleted += 1 else { partialPass = true; stop = true }
      latestJson = Some(scoreboard(passBuf.toSeq, stagingBuf.toSeq,
        passesCompleted, partialPass))
      if (elapsedS > budgetS && i >= 2) {
        System.err.println(
          f"[bench] budget spent (${elapsedS}%.1f s) after pass $i — stopping")
        stop = true
      }
      i += 1
    }
    val json = scoreboard(passBuf.toSeq, stagingBuf.toSeq,
      passesCompleted, partialPass)
    printedNormally = true
    emit(json)
    Runtime.getRuntime.removeShutdownHook(hook)
    SessionCache.releaseAll(spark)
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
