package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core._
import graft.materialize.Snapshotter

object ProfileSnap {
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
    // warmup whole entry once, then timed
    for (pass <- 1 to 3) {
      val wh = new Warehouse(spark, java.nio.file.Files.createTempDirectory("psnap").toString)
      val snap = new Snapshotter(wh)
      val r = Relation("analytics","main","orders_snap")
      val o = spark.read.parquet(s"$d/orders.parquet").select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate").as("updated_at"))
      val cut97 = lit("1997-01-01").cast("timestamp")
      val cut99 = lit("1999-01-01").cast("timestamp")
      val strat = SnapshotStrategy.Timestamp("updated_at")
      t(s"p$pass run1 (initial writeAtomic)") {
        snap.snapshot(o.filter(col("updated_at") < cut97), r, Seq("o_orderkey"), strat)
      }
      val changed = col("o_orderkey") % 10 === 0 && col("updated_at") < cut97
      val src2 = o.filter(col("updated_at") < cut99)
        .withColumn("o_totalprice", when(changed, col("o_totalprice") * 2).otherwise(col("o_totalprice")))
        .withColumn("updated_at", when(changed, col("updated_at") + expr("INTERVAL 30 DAYS")).otherwise(col("updated_at")))
      t(s"p$pass run2 (delta snapshot)") {
        snap.snapshot(src2, r, Seq("o_orderkey"), strat)
      }
      t(s"p$pass readback") { wh.read(r).count() }
    }
    spark.stop()
  }
}
