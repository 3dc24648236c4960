package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print formatted physical plans of selected queries so the
  * scan pushdown / broadcast / codegen structure can be reviewed.
  * Usage: runMain graft.tools.Explain <sfDir> <query1> [query2 ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { name =>
      println(s"\n========== $name ==========")
      graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
