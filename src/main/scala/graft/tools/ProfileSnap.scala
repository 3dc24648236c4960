package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core._
import graft.materialize.Snapshotter

object ProfileSnap {
  private val traceJobs = new java.util.concurrent.atomic.AtomicBoolean(false)
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    // per-job trace: which Spark jobs one delta snapshot runs, and how
    // long each takes (find control-plane fan-out, not just total)
    val jobLog = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val desc = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(e.properties)
              .flatMap(p => Option(p.getProperty("callSite.short"))))
            .getOrElse("?")
          jobLog.put(e.jobId, (System.nanoTime(), desc))
        }
        override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(jobLog.get(e.jobId)).foreach { case (t0, desc) =>
            if (traceJobs.get())
              println(f"[job] #${e.jobId}%4d ${(System.nanoTime()-t0)/1e9}%6.3f s  $desc")
          }
        }
      })
    // warmup whole entry once, then timed; A/B the staging-persist
    // threshold (default = lazy below 8M rows vs 0 = always persist the
    // change-detection full-outer join) in the SAME window
    for (mode <- Seq("lazy", "persist", "lazy", "persist")) {
      if (mode == "persist")
        spark.conf.set("graft.snapshot.stagingPersistMinRows", "0")
      else spark.conf.unset("graft.snapshot.stagingPersistMinRows")
      for (pass <- 1 to 2) {
      val wh = new Warehouse(spark, java.nio.file.Files.createTempDirectory("psnap").toString)
      val snap = new Snapshotter(wh)
      val r = Relation("analytics","main","orders_snap")
      val o = spark.read.parquet(s"$d/orders.parquet").select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate").as("updated_at"))
      val cut97 = lit("1997-01-01").cast("timestamp")
      val cut99 = lit("1999-01-01").cast("timestamp")
      val strat = SnapshotStrategy.Timestamp("updated_at")
      t(s"$mode p$pass run1 (initial writeAtomic)") {
        snap.snapshot(o.filter(col("updated_at") < cut97), r, Seq("o_orderkey"), strat)
      }
      val changed = col("o_orderkey") % 10 === 0 && col("updated_at") < cut97
      val src2 = o.filter(col("updated_at") < cut99)
        .withColumn("o_totalprice", when(changed, col("o_totalprice") * 2).otherwise(col("o_totalprice")))
        .withColumn("updated_at", when(changed, col("updated_at") + expr("INTERVAL 30 DAYS")).otherwise(col("updated_at")))
      // trace the per-job breakdown of the LAST warm lazy delta run
      if (mode == "lazy" && pass == 2) traceJobs.set(true)
      t(s"$mode p$pass run2 (delta snapshot)") {
        snap.snapshot(src2, r, Seq("o_orderkey"), strat)
      }
      traceJobs.set(false)
      t(s"$mode p$pass readback") { wh.read(r).count() }
      }
    }
    spark.stop()
  }
}
