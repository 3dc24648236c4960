package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (not part of the library surface): derive a pathologically
  * SKEWED corpus from a driver scale factor, for the skew-shaped verify
  * sweep (`SCALE.md`). [[ScaleData]] answers "does the battery survive a
  * 10× decade"; this answers the orthogonal 100 TB question — "does it
  * survive the shape of a real web corpus", where the mass is never
  * uniform: one host owns half the crawl, one customer owns a quarter of
  * the orders, boilerplate text repeats in exact-duplicate clusters, and
  * a handful of documents are pathologically long.
  *
  * Same row counts as the source corpus — only the DISTRIBUTION changes:
  *   - documents: half the corpus reassigned to ONE mega-source (the
  *     domain-cap / per-source-health stressor); one exact-dup text
  *     cluster ABOVE the shingle df-cap (~312 docs — must fall out of
  *     the fuzzy families via the stop-shingle filter and be caught by
  *     exact dedup instead) plus eight clusters of ~17 below the cap
  *     (must surface as candidate pairs WITHOUT a quadratic band
  *     blow-up); a 0.1% tail of 30×-repeated long texts (per-row cost
  *     outliers). `n_chars` is recomputed so derived stats stay honest.
  *   - orders/lineitem: one hot customer takes 25% of orders, one hot
  *     (supplier, part) takes 25% of lineitem — every per-key shuffle,
  *     window partition, and FK join sees a heavy hitter. Hot keys are
  *     EXISTING dimension keys, so RI tests still hold.
  *   - events: one hot user owns 25% of events (sessionization skew).
  *   - embeddings: every 23rd vector is an exact copy of one donor —
  *     cosine-1.0 tie groups that any top-k must break deterministically
  *     on BOTH engines.
  *
  * Usage: runMain graft.SkewData [srcDir] [outDir]
  */
object SkewData {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_skew")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // events ship raw int64 nanos in some driver layouts (see ScaleData)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def read(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")

    // driver layout is one parquet FILE per table (Bench's streaming query
    // copies the file directly) — collapse each write to a single file
    def writeOne(df: DataFrame, name: String): Unit = {
      val stage = s"$out/_stage_$name"
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val fs = new Path(out).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val part = fs.listStatus(new Path(stage))
        .find(_.getPath.getName.endsWith(".parquet")).get
      val tgt = new Path(s"$out/$name.parquet")
      fs.delete(tgt, false)
      fs.rename(part.getPath, tgt)
      fs.delete(new Path(stage), true)
      println(s"[skew] wrote $name")
    }

    // dimensions unchanged: skew lives in the FACT distributions, and the
    // hot keys must stay valid dimension keys for the RI tests
    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(t => writeOne(read(t), t))

    def minKey(df: DataFrame, k: String): Long =
      df.agg(min(col(k))).head().getLong(0)
    val hotCust = minKey(read("customer"), "c_custkey")
    val hotSupp = minKey(read("supplier"), "s_suppkey")
    val hotPart = minKey(read("part"), "p_partkey")

    writeOne(read("orders").withColumn("o_custkey",
      when(col("o_orderkey") % 4 === 0, lit(hotCust))
        .otherwise(col("o_custkey"))), "orders")
    writeOne(read("lineitem")
      .withColumn("l_suppkey",
        when(col("l_orderkey") % 4 === 0, lit(hotSupp))
          .otherwise(col("l_suppkey")))
      .withColumn("l_partkey",
        when(col("l_orderkey") % 4 === 0, lit(hotPart))
          .otherwise(col("l_partkey"))), "lineitem")

    val events = read("events")
    val hotUser = minKey(events, "user_id")
    writeOne(events.withColumn("user_id",
      when(col("event_id") % 4 === 0, lit(hotUser))
        .otherwise(col("user_id"))), "events")

    // documents: donor texts are collected driver-side (KBs) and injected
    // as literals so the clusters are EXACT string duplicates
    val docs = read("documents")
    def textOf(id: Long): String =
      docs.filter(col("doc_id") === id).select(col("text")).head().getString(0)
    val giant = textOf(1L)                       // doc 1 ∈ (doc_id%16==1)
    val small = (0 until 8).map(i => textOf(2L + i)) // docs 2..9
    // cluster index varies across the %37 members (doc_id%37 is 0 for all
    // of them — the QUOTIENT distinguishes them)
    val clusterIdx = expr("(doc_id div 37) % 8")
    val smallLit = small.zipWithIndex.foldLeft(lit(small.head)) {
      case (acc, (t, i)) => when(clusterIdx === i, lit(t)).otherwise(acc)
    }
    val skewText =
      when(col("doc_id") % 16 === 1, lit(giant))          // ~312-doc cluster
        .when(col("doc_id") % 37 === 0, smallLit)          // 8 × ~17-doc clusters
        .when(col("doc_id") % 997 === 0,
          concat_ws(" ", (0 until 30).map(_ => col("text")): _*)) // 30× long tail
        // degenerate tail: a real crawl always carries empty, whitespace-
        // only, and single-token documents — every ratio/tokenize op must
        // agree with the oracle on them, not just on healthy text
        .when(col("doc_id") % 1009 === 3, lit(""))
        .when(col("doc_id") % 1009 === 7, lit("   "))
        .when(col("doc_id") % 1009 === 11, lit("word"))
        .otherwise(col("text"))
    writeOne(docs
      .withColumn("text", skewText)
      .withColumn("source",
        when(col("doc_id") % 2 === 0, lit("mega-host.example"))
          .otherwise(col("source")))
      .withColumn("n_chars", length(col("text")).cast("long")), "documents")

    val vecs = read("embeddings")
    val donor: Seq[Float] = vecs.filter(col("vec_id") === 46)
      .select(col("embedding")).head().getSeq[Float](0)
    writeOne(vecs.withColumn("embedding",
      when(col("vec_id") % 23 === 0, typedLit(donor))
        .otherwise(col("embedding"))), "embeddings")

    spark.stop()
  }
}
