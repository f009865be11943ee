package graft.queries

import graft.Catalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational surface (SURVEY.md §2b): scans, joins of every flavor,
  * aggregation, windows, set ops, top-k, scalar function families. The
  * reference only ever *emits* SQL for these through SQLAlchemy; here
  * they are first-class declarative DataFrame plans so Catalyst gets to
  * push filters/projections into the parquet scan, pick broadcast vs
  * sort-merge, and keep everything in whole-stage codegen.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.table(s, dir, name)

  // --- agg_pricing_summary: TPC-H Q1-style pricing summary ------------
  // filter -> groupBy -> decimal-exact sums -> sort. Partial (map-side)
  // aggregation + final merge is Spark's default hash aggregate; at
  // 100 TB this is one scan + one shuffle of ~|groups| rows.
  def aggPricingSummary(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
    val one = lit(1).cast("decimal(4,2)")
    val disc = Det.dec2(col("l_extendedprice")) * (one - Det.rate2(col("l_discount")))
    val charge = disc * (one + Det.rate2(col("l_tax")))
    l.filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Det.moneySum(col("l_quantity")).as("sum_qty"),
        Det.moneySum(col("l_extendedprice")).as("sum_base_price"),
        sum(disc).cast("double").as("sum_disc_price"),
        sum(charge).cast("double").as("sum_charge"),
        Det.moneyAvg(col("l_quantity")).as("avg_qty"),
        Det.moneyAvg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val aggPricingSummarySql: String = {
    import Det.sql._
    val disc = s"${dec2("l_extendedprice")} * (CAST(1 AS DECIMAL(4,2)) - ${rate2("l_discount")})"
    val charge = s"$disc * (CAST(1 AS DECIMAL(4,2)) + ${rate2("l_tax")})"
    s"""SELECT l_returnflag, l_linestatus,
       |  ${moneySum("l_quantity")} AS sum_qty,
       |  ${moneySum("l_extendedprice")} AS sum_base_price,
       |  CAST(SUM($disc) AS DOUBLE) AS sum_disc_price,
       |  CAST(SUM($charge) AS DOUBLE) AS sum_charge,
       |  ${moneyAvg("l_quantity")} AS avg_qty,
       |  ${moneyAvg("l_extendedprice")} AS avg_price,
       |  count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_pricing_summary" -> (aggPricingSummary _))

  def oracle: Map[String, String] = Map(
    "agg_pricing_summary" -> aggPricingSummarySql)
}
