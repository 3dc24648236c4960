package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

/** The real-decoder contract of [[graft.ops.Multimodal]]: payloads are
  * genuine PNGs, every reported number comes from `ImageIO.read`, and
  * the decode stage runs partition-local (no exchange between the scan
  * and the mapPartitions decode — media bytes never cross the wire).
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("media payloads are real PNGs and decode losslessly") {
    val metas = Multimodal.mediaMeta(spark, sf).collect()
    assert(metas.nonEmpty)
    // fixture rule re-derived independently from the raw text
    val texts = graft.ops.TData.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    metas.foreach { r =>
      val t = texts(r.getAs[Long]("doc_id")).getBytes("UTF-8")
      val w = (t.length % 64) + 1
      val h = ((t.length.toLong * 7) % 48).toInt + 1
      assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h,
        s"decoded dims must equal the encoded dims for len ${t.length}")
      val expectedSum =
        t.take(w * h).map(b => (b & 0xff).toLong).sum
      assert(r.getAs[Long]("px_sum") == expectedSum,
        "decoded pixel sum must equal the painted text bytes (lossless)")
    }
  }

  test("frame container demuxes to every 2nd frame with decoded values") {
    val frames = Multimodal.frameSample(spark, sf).collect()
    val texts = graft.ops.TData.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byDoc = frames.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (id, rows) =>
      val t = texts(id).getBytes("UTF-8")
      val n = (t.length % 16) + 1
      val idxs = rows.map(_.getAs[Int]("frame_idx")).sorted
      assert(idxs.sameElements(0 until n by 2))
      rows.foreach { r =>
        val f = r.getAs[Int]("frame_idx")
        assert(r.getAs[Int]("px_val") == (t(f % t.length) & 0xff))
      }
    }
  }

  test("decode stage is partition-local: no exchange below mapPartitions") {
    val plan = Multimodal.mediaMeta(spark, sf).queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }
    assert(exchanges.isEmpty,
      s"media decode must not shuffle payload bytes, plan:\n$plan")
  }

  test("zero-length media demuxes to one pixel-0 frame (skew-sweep pin)") {
    // a real crawl always carries empty payloads; the container encodes
    // them as one blank frame and the decode must report pixel 0, not
    // crash or skip the document (the oracle mirrors this with an
    // explicit strlen=0 CASE — its i % strlen(text) is NULL at 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_mm0").toString
    spark.range(0, 2).selectExpr(
        "id AS doc_id",
        "CASE WHEN id = 0 THEN '' ELSE 'ab' END AS text",
        "'en' AS lang", "'s' AS source",
        "CASE WHEN id = 0 THEN CAST(0 AS BIGINT) ELSE CAST(2 AS BIGINT) END AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val frames = Multimodal.frameSample(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("frame_idx"),
        r.getAs[Int]("px_val")))
    assert(frames.filter(_._1 == 0L).toSeq == Seq((0L, 0, 0)),
      s"empty doc must yield exactly one pixel-0 frame: ${frames.toSeq}")
    // the non-empty doc still decodes its text bytes
    assert(frames.filter(_._1 == 1L).forall(f => f._3 == 'a'.toInt))
  }
}
