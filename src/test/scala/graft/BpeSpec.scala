package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextOps

/** Distributed BPE training ([[TextOps.bpeTrain]]) vs an independent
  * in-memory reference implementation of classic BPE (word-frequency
  * dict → per-round argmax pair → greedy non-overlapping merge). The
  * merge SEQUENCE is the artifact, so the gate is exact equality of the
  * full ordered (step, left, right, pair_count) table — any divergence
  * in counting, tie-breaking, or overlap handling shows up as a first
  * differing row. Iterative argmax-per-round is not one SQL query, so
  * this spec is the correctness gate (FuzzyIndex/VectorIndex precedent).
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  /** Classic BPE over a word-frequency dict, one word at a time. */
  private def refBpe(words: Seq[(String, Long)], n: Int)
      : Seq[(Int, String, String, Long)] = {
    var vocab: Seq[(Vector[String], Long)] =
      words.map { case (w, f) => w.map(_.toString).toVector -> f }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var stop = false
    while (step <= n && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ => ()
        }
      }
      if (counts.isEmpty) stop = true
      else {
        val ((l, r), c) = counts.minBy { case ((a, b), cnt) => (-cnt, a, b) }
        out += ((step, l, r, c))
        vocab = vocab.map { case (syms, f) =>
          val merged = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              merged += (l + r); i += 2
            } else { merged += syms(i); i += 1 }
          }
          merged.result() -> f
        }
        step += 1
      }
    }
    out.result()
  }

  test("merge sequence equals the classic reference, exactly and in order") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val wordFreq = docs
      .select(explode(split(lower(col("text")), "[^a-z0-9]+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val expected = refBpe(wordFreq, 25)
    val got = TextOps.bpeTrain(docs, 25).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(expected.size == 25, "fixture corpus must sustain 25 merges")
    assert(got == expected)
    // merged tokens keep merging: at least one later merge consumes an
    // earlier merge's output (multi-char side)
    assert(got.exists { case (_, l, r, _) => l.length > 1 || r.length > 1 })
  }

  test("encode applies the merge chain exactly like the reference, per doc") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").limit(60)
    val wordFreq = docs
      .select(explode(split(lower(col("text")), "[^a-z0-9]+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val merges = refBpe(wordFreq, 15).map { case (_, l, r, _) => (l, r) }
    // reference encode: same greedy non-overlapping merge per word
    def refEncode(text: String): (Long, Long) = {
      val ws = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      val nSyms = ws.map(_.length.toLong).sum
      val nTok = ws.map { w =>
        var syms = w.map(_.toString).toVector
        merges.foreach { case (l, r) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              out += (l + r); i += 2
            } else { out += syms(i); i += 1 }
          }
          syms = out.result()
        }
        syms.length.toLong
      }.sum
      (nSyms, nTok)
    }
    val expected = docs.collect().map(r =>
      r.getAs[Long]("doc_id") -> refEncode(r.getAs[String]("text"))).toMap
    val got = TextOps.bpeEncode(docs, merges).collect().map(r =>
      r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_symbols"), r.getAs[Long]("n_bpe_tokens")))).toMap
    assert(got == expected)
    // merges genuinely compress: strictly fewer tokens than symbols
    assert(got.values.forall { case (s, t) => t < s })
    // zero merges = pure char split
    val id = TextOps.bpeEncode(docs, Nil).collect().map(r =>
      (r.getAs[Long]("n_symbols"), r.getAs[Long]("n_bpe_tokens")))
    assert(id.forall { case (s, t) => s == t })
  }

  test("merge loop stops early when no pairs remain") {
    val s = spark; import s.implicits._
    val tiny = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    // vocabulary {ab:2, cd:1} sustains exactly 2 merges (a+b, c+d),
    // then every word is a single symbol — requesting 10 returns 2
    val got = TextOps.bpeTrain(tiny, 10).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == Seq((1, "a", "b", 2L), (2, "c", "d", 1L)))
  }
}
