package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing (SURVEY §2 B28 cluster-by / co-located joins at scale):
  * writing both join sides bucketed+sorted on the key lets the join run
  * with ZERO exchanges — the physical proof of the SCALE.md claim that
  * repeated big⨝big joins should pre-bucket instead of re-shuffling.
  */
class BucketingSpec extends AnyFunSuite {
  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      Files.createTempDirectory("graft_bucket_wh").toString)
    .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("bucketed+sorted tables join with zero exchanges") {
    // suites share one JVM-wide session (getOrCreate): builder configs
    // no-op when another suite created it first, so force the SMJ path at
    // RUNTIME (broadcast would wrap the join in a BroadcastExchange and
    // break the zero-Exchange assertion), restoring the ambient value
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try runBucketedJoinCase()
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  private def runBucketedJoinCase(): Unit = {
    // clean both the catalog entry AND any stale managed location (the
    // warehouse.dir builder config is likewise ignored when shared)
    Seq("li_bucketed", "o_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        rm(loc)
      }
    }
    ops.TData.lineitem(spark, sf)
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    ops.TData.orders(spark, sf)
      .select("o_orderkey", "o_orderstatus")
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle, got:\n$plan")
    assert(joined.count() == ops.TData.lineitem(spark, sf).count())

    // contrast: the unbucketed join DOES shuffle both sides
    val unbucketed = ops.TData.lineitem(spark, sf)
      .join(ops.TData.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
    assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
