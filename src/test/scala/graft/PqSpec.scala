package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Similarity

/** Product quantization: recall of the ADC-shortlist + exact-re-rank path
  * against the exact brute-force baseline, plus the determinism and
  * code-compression contracts.
  */
class PqSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val d = "/root/testdata/sf0.01"

  test("recall@5 vs brute force; deterministic across runs") {
    import spark.implicits._
    val brute = Similarity.knnBrute(spark, d)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val pq1 = Similarity.knnPq(spark, d)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (pq1 intersect brute).size.toDouble / brute.size
    // ADC top-50 shortlist + exact re-rank on synthetic (near-random)
    // embeddings — the hardest PQ regime; the shortlist recovers most of
    // the misses the 4-byte codes alone would make (measured 0.86 at
    // sf0.01; 0.7 leaves margin for fixture regeneration)
    assert(recall >= 0.7, s"recall@5 = $recall")
    val pq2 = Similarity.knnPq(spark, d)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(pq1 == pq2) // sample, codebooks, ADC, re-rank all deterministic
  }

  test("IVF-PQ: recall@5 vs brute; deterministic") {
    import spark.implicits._
    val brute = Similarity.knnBrute(spark, d)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val a = Similarity.knnIvfPq(spark, d)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (a intersect brute).size.toDouble / brute.size
    // compounded approximation (IVF cell misses × PQ shortlist misses):
    // the floor mirrors knnIvf's own bound-setting philosophy
    assert(recall >= 0.3, s"IVF-PQ recall@5 = $recall")
    val b = Similarity.knnIvfPq(spark, d)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(a == b)
  }

  test("production codebooks (K=256, m=16): a CONSTANT shortlist holds recall@5 at sf0.1") {
    // the scale argument for flat-PQ's O(N)-tracking shortlist is that it
    // compensates the deliberately coarse K=16 demo books; with
    // production-sized codebooks the shortlist needed is CONSTANT in N.
    // Pin it: train K=256/m=16 books on the 10x corpus and require the
    // 0.8 floor with a FIXED 64-entry shortlist (vs the ~200 the
    // N-tracking rule would use here).
    import spark.implicits._
    val d1 = "/root/testdata/sf0.1"
    val e = Similarity.vecs(spark, d1)
    val books = Similarity.pqTrain(e, nSub = 16, subDim = 4, k = 256)
    assert(books.length == 16)
    assert(books.forall(b => b.length > 64 && b.length <= 256))
    assert(books.forall(_.forall(_.length == 4)))
    val brute = Similarity.knnBrute(spark, d1)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val pq = Similarity.knnPqWith(spark, d1, books, s"pqcodes256:$d1",
        _ => 64) // constant — must NOT track N
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (pq intersect brute).size.toDouble / brute.size
    assert(recall >= 0.8, s"K=256/m=16 constant-shortlist recall@5 = $recall")
  }

  test("codes are 8 nibbles: values in [0,16), 64x smaller than float32") {
    import spark.implicits._
    val e = Similarity.vecs(spark, d)
    val books = Similarity.pqTrain(e)
    assert(books.length == 8)
    assert(books.forall(_.length == 16))
    assert(books.forall(_.forall(_.length == 8)))
    // every centroid component is finite and grid-snapped
    books.flatten.flatten.foreach { x =>
      assert(!x.isNaN && !x.isInfinite)
      assert(math.abs(x * 1e9 - math.rint(x * 1e9)) < 1e-3)
    }
  }
}
