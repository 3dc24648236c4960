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

  test("simhash of exact copies is identical; near-dups within hamming 6") {
    val sh = TextOps.simhash(spark, sf)
    val copies = sh.alias("a").join(sh.alias("b"),
      col("a.doc_id") + 2000000 === col("b.doc_id"))
    assert(copies.filter(col("a.simhash") =!= col("b.simhash")).count() == 0)
    val pairs = TextOps.simhashPairs(spark, sf)
    assert(pairs.filter(col("doc2") === col("doc1") + 2000000)
      .agg(max(col("hamming"))).collect().head.getInt(0) == 0)
  }

  test("native cosine_sim matches a scala reference implementation") {
    val rows = TData.embeddings(spark, sf).limit(50)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def ref(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val df = TData.embeddings(spark, sf).limit(50)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
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

  test("knn brute: rank-1 neighbor of an exact duplicate vector is itself") {
    // self-check: every query's neighbors are sorted by similarity
    val knn = Similarity.knnBrute(spark, sf).collect()
      .groupBy(_.getLong(0))
    knn.foreach { case (_, rows) =>
      val sims = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(sims.sameElements(sims.sortBy(-(_: Double))), "ranks ordered by cos")
    }
  }

  test("sql registration of cosine_sim works") {
    VectorFunctions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").collect()
    assert(math.abs(r.head.getDouble(0) - 1.0) < 1e-15)
  }
}
