package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (not part of the library surface): derive a larger benchmark
  * dataset from a driver-provided scale factor by key-offset replication,
  * for scaling measurements (`SCALE.md`). The driver ships sf0.1 as the
  * largest corpus; the 100 TB claims deserve at least one measured 10×
  * datapoint, so this builds an sf1-shaped directory from sf0.1.
  *
  * Replication preserves the statistical shape a REAL larger corpus would
  * have instead of naively duplicating rows:
  *   - every key domain is offset per replica (custkey, orderkey, …), so
  *     foreign-key joins keep their fan-out and uniqueness invariants;
  *   - document text gets a per-replica word prefix: texts are distinct
  *     ACROSS replicas, so dup-pair counts scale linearly like a real
  *     corpus (verbatim copies would make every doc a 10-way duplicate
  *     and blow the pair count up quadratically);
  *   - embedding vectors are dimension-ROTATED per replica: rotation
  *     preserves all pairwise cosines within a replica but decorrelates
  *     vectors across replicas, so near-dup structure also scales
  *     linearly (a verbatim copy would be a cosine-1.0 dup of its
  *     original).
  *
  * Usage: runMain graft.ScaleData [srcDir] [outDir] [replicas]
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_sf1")
    val rep = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")

    // the driver layout is one parquet FILE per table (Bench's streaming
    // query copies the file directly), so collapse each write to one file
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
      println(s"[scale] wrote $name")
    }

    def keySpan(df: DataFrame, k: String): Long =
      df.agg(max(col(k))).head().getLong(0) + 1

    def replicate(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until rep).map(i => f(df, i)).reduce(_ unionByName _)

    // fixed dimensions: a larger corpus has the same nations/regions
    writeOne(read("region"), "region")
    writeOne(read("nation"), "nation")

    val customer = read("customer"); val cSpan = keySpan(customer, "c_custkey")
    val supplier = read("supplier"); val sSpan = keySpan(supplier, "s_suppkey")
    val part = read("part"); val pSpan = keySpan(part, "p_partkey")
    val orders = read("orders"); val oSpan = keySpan(orders, "o_orderkey")

    writeOne(replicate(customer) { (d, i) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(i * cSpan)) }, "customer")
    writeOne(replicate(supplier) { (d, i) =>
      d.withColumn("s_suppkey", col("s_suppkey") + lit(i * sSpan)) }, "supplier")
    writeOne(replicate(part) { (d, i) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(i * pSpan)) }, "part")
    writeOne(replicate(orders) { (d, i) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(i * oSpan))
        .withColumn("o_custkey", col("o_custkey") + lit(i * cSpan)) }, "orders")
    writeOne(replicate(read("lineitem")) { (d, i) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(i * oSpan))
        .withColumn("l_partkey", col("l_partkey") + lit(i * pSpan))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * sSpan)) }, "lineitem")

    // events: ts kept verbatim (raw nanos int64 — read as long), ids and
    // users offset so per-user session structure repeats across replicas
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = read("events")
    val eSpan = keySpan(events, "event_id")
    val uSpan = keySpan(events, "user_id")
    writeOne(replicate(events) { (d, i) =>
      d.withColumn("event_id", col("event_id") + lit(i * eSpan))
        .withColumn("user_id", col("user_id") + lit(i * uSpan)) }, "events")

    val docs = read("documents")
    val dSpan = keySpan(docs, "doc_id")
    writeOne(replicate(docs) { (d, i) =>
      val text =
        if (i == 0) col("text")
        else expr(s"array_join(transform(split(text, ' '), x -> concat('r$i', x)), ' ')")
      d.withColumn("doc_id", col("doc_id") + lit(i * dSpan))
        .withColumn("text", text)
        .withColumn("n_chars", length(col("text")).cast("long")) }, "documents")

    val vecs = read("embeddings")
    val vSpan = keySpan(vecs, "vec_id")
    // replica transform must stay orthogonal (pairwise cosines within a
    // replica preserved) yet distinct per replica. Plain rotation by i
    // breaks past the dimension (slice length goes negative — found by
    // the 100-replica build): rotate by i mod dim and compose with a
    // sign-flip of the first (i div dim) coordinates — a diagonal ±1
    // matrix, also orthogonal — so every replica up to dim*(dim+1) gets
    // a distinct transform. i < dim keeps the historic pure rotation
    // (sf1/sf3 corpora reproduce bit-identically).
    val dim = vecs.select(size(col("embedding"))).head().getInt(0)
    writeOne(replicate(vecs) { (d, i) =>
      val r = i % dim
      val s = i / dim
      val rotated =
        if (r == 0) col("embedding")
        else expr(s"concat(slice(embedding, ${r + 1}, size(embedding) - $r), " +
          s"slice(embedding, 1, $r))")
      val base =
        if (s == 0) d.withColumn("embedding", rotated)
        else d.withColumn("__rot", rotated)
          .withColumn("embedding",
            expr(s"transform(__rot, (x, j) -> IF(j < $s, -x, x))"))
          .drop("__rot")
      base.withColumn("vec_id", col("vec_id") + lit(i * vSpan)) }, "embeddings")

    spark.stop()
  }
}
