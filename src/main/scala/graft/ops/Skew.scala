package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted joins. AQE's skew-join split handles most
  * cases automatically; explicit salting is the tool for EXTREME hot keys
  * (one key ≫ a partition) or for pre-AQE-style deterministic plans. The
  * skewed side's rows scatter across `nSalts` sub-keys; the dimension side
  * replicates once per salt — the hot key's work spreads over nSalts
  * tasks at the cost of dim×nSalts.
  */
object Skew {

  /** Inner-join `skewed` to `dim` on `keys`, scattering the skewed side by
    * `saltExpr % nSalts`. `saltExpr` must be deterministic per row (any
    * well-distributed column works; hash(...) of a unique column is
    * typical). Result is exactly the unsalted join.
    */
  def saltedJoin(skewed: DataFrame, dim: DataFrame, keys: Seq[String],
                 saltExpr: Column, nSalts: Int): DataFrame = {
    val salted = skewed.withColumn("_salt", pmod(saltExpr, lit(nSalts)))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    val out = salted.join(replicated, keys :+ "_salt")
    out.drop("_salt")
  }

  /** Demonstration query: lineitem⨝orders with an 8-way salt on the fact
    * side, aggregated — the result must equal the plain join (oracle).
    */
  def saltedRevenueByStatus(s: SparkSession, d: String): DataFrame = {
    val li = TData.lineitem(s, d)
    val o = TData.orders(s, d)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    saltedJoin(li, o, Seq("l_orderkey"),
      hash(col("l_orderkey"), col("l_linenumber")), nSalts = 8)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_lineitems"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
  }

  val saltedRevenueByStatusSql: String =
    """SELECT o_orderstatus, count(*) AS n_lineitems,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderstatus""".stripMargin
}
