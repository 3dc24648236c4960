package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.HeavyHittersAggregator

/** Misra-Gries sketch: the survival guarantee (every item with frequency
  * > N/(m+1) is in the sketch) must hold under adversarial partition
  * layouts — that is exactly what the mergeable-summaries merge rule
  * buys over a naive top-k-of-partials trim.
  */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def sketch(items: Seq[String], m: Int, parts: Int) =
    spark.createDataset(items).repartition(parts)
      .select(new HeavyHittersAggregator(m).toColumn).head()

  test("every above-threshold item survives; N is exact") {
    // 3 heavies drowned in distinct singleton noise (the MG worst case:
    // each singleton tries to evict a heavy's counter)
    val heavies = Seq.fill(500)("alpha") ++ Seq.fill(300)("beta") ++
      Seq.fill(200)("gamma")
    val noise = (0 until 5000).map(i => s"noise_$i")
    val stream = new scala.util.Random(42).shuffle(heavies ++ noise)
    val m = 15
    for (parts <- Seq(1, 4, 13)) {
      val (cands, n) = sketch(stream, m, parts)
      assert(n == stream.size)
      val threshold = n / (m + 1) // 6000/16 = 375
      val survivors = cands.map(_._1).toSet
      // alpha(500) is above threshold — MUST survive whatever the layout
      assert(survivors.contains("alpha"), s"parts=$parts: $survivors")
      // counters underestimate by at most N/(m+1)
      cands.foreach { case (w, c) =>
        val exact = stream.count(_ == w).toLong
        assert(c <= exact && c >= exact - threshold,
          s"parts=$parts $w: sketch=$c exact=$exact")
      }
    }
  }

  test("two-pass recount reproduces the exact GROUP BY answer") {
    val rnd = new scala.util.Random(7)
    val vocab = ('a' to 'z').map(_.toString)
    // zipfish draw: item i with weight ~ 1/(i+1)
    val stream = (0 until 20000).map { _ =>
      val r = rnd.nextDouble()
      vocab(math.min(25, (1.0 / (r + 0.038) - 1).toInt))
    }
    val m = 7
    val ds = spark.createDataset(stream).repartition(5)
    val (cands, n) = ds.select(new HeavyHittersAggregator(m).toColumn).head()
    val result = ds.toDF("word")
      .filter(col("word").isin(cands.map(_._1): _*))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (m + 1) > lit(n))
      .as[(String, Long)].collect().toMap
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * (m + 1) > stream.size }.toMap
    assert(result == exact)
  }
}
