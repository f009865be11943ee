package graft.queries

import graft.Catalog
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational surface (SURVEY.md §2b): scans, joins of every flavor,
  * aggregation, windows, set ops, top-k, scalar function families. The
  * reference only ever *emits* SQL for these through SQLAlchemy; here
  * they are first-class declarative DataFrame plans so Catalyst gets to
  * push filters/projections into the parquet scan, pick broadcast vs
  * sort-merge, and keep everything in whole-stage codegen.
  *
  * Scale notes are attached per query; the common themes: dims
  * (region/nation/customer/supplier/part at TPC-H ratios) broadcast,
  * facts (lineitem/orders/events) shuffle on their join/group keys at
  * most once, every filter/projection reaches the parquet scan.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.table(s, dir, name)

  // --- agg_pricing_summary: TPC-H Q1-style pricing summary ------------
  // One scan + partial hash agg + 6-group shuffle; at 100 TB this is
  // bandwidth-bound on the scan, which is the optimum for this shape.
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

  // --- proj_prune: projection + filter pushdown ------------------------
  // .explain shows ReadSchema with exactly 3 of lineitem's 11 columns
  // and PushedFilters for the modulus-free predicates.
  def projPrune(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") % 500 === 0)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  val projPruneSql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |WHERE l_orderkey % 500 = 0 ORDER BY l_orderkey, l_linenumber""".stripMargin

  // --- joins -----------------------------------------------------------

  /** Plain equi hash join fact->dim; AQE broadcasts customer when it
    * fits, else shuffle-hash on the key. */
  def joinOrdersCustomer(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").filter(col("o_orderkey") % 50 === 0)
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_custkey", "c_name", "o_totalprice")
      .orderBy("o_orderkey")

  val joinOrdersCustomerSql: String =
    """SELECT o_orderkey, c_custkey, c_name, o_totalprice
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE o_orderkey % 50 = 0 ORDER BY o_orderkey""".stripMargin

  /** Explicit broadcast hint — region is 5 rows at any scale factor;
    * a shuffle here would be malpractice at 100 TB. */
  def joinNationRegionBcast(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation")
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name", "r_name")
      .orderBy("n_nationkey")

  val joinNationRegionBcastSql: String =
    """SELECT n_nationkey, n_name, r_name
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |ORDER BY n_nationkey""".stripMargin

  /** Sort-merge join forced via merge hint — the right physical choice
    * when both sides are large and neither fits in memory; identical
    * results to the hash strategies (oracle-checked). */
  def joinLineitemOrdersSmj(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").hint("merge")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"), Det.moneySum(col("l_quantity")).as("sum_qty"))
      .orderBy("o_orderpriority")

  val joinLineitemOrdersSmjSql: String = {
    import Det.sql._
    s"""SELECT o_orderpriority, count(*) AS cnt, ${moneySum("l_quantity")} AS sum_qty
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
  }

  /** Left outer join — customers with zero orders surface as cnt=0;
    * aggregate output avoids NULL-ordering divergence across engines. */
  def joinLeftOuterOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").filter(col("o_orderkey") % 4 === 0),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(
        count(col("o_orderkey")).as("order_cnt"),
        coalesce(sum(Det.dec2(col("o_totalprice"))).cast("double"), lit(0.0)).as("total_spend"))
      .orderBy("c_custkey")

  val joinLeftOuterOrdersSql: String = {
    import Det.sql._
    s"""SELECT c_custkey, count(o_orderkey) AS order_cnt,
       |  COALESCE(CAST(SUM(${dec2("o_totalprice")}) AS DOUBLE), 0.0) AS total_spend
       |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_orderkey % 4 = 0) o
       |  ON c_custkey = o_custkey
       |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin
  }

  // --- aggregation variants -------------------------------------------

  def aggDistinctCustkeys(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").agg(
      countDistinct(col("o_custkey")).as("distinct_custs"),
      countDistinct(col("o_orderpriority")).as("distinct_prios"),
      count(lit(1)).as("total_orders"))

  val aggDistinctCustkeysSql: String =
    """SELECT count(DISTINCT o_custkey) AS distinct_custs,
      |  count(DISTINCT o_orderpriority) AS distinct_prios,
      |  count(*) AS total_orders
      |FROM orders""".stripMargin

  /** ROLLUP over the region->nation hierarchy; grouping-null slots are
    * coalesced to 'ALL' so the output carries no NULLs (engines order
    * NULLs differently). */
  def aggRollupNationRegion(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("cust_cnt"), Det.moneySum(col("c_acctbal")).as("sum_acctbal"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region_name"),
        coalesce(col("n_name"), lit("ALL")).as("nation_name"),
        col("cust_cnt"), col("sum_acctbal"))
      .orderBy("region_name", "nation_name")

  val aggRollupNationRegionSql: String = {
    import Det.sql._
    s"""SELECT COALESCE(r_name, 'ALL') AS region_name,
       |  COALESCE(n_name, 'ALL') AS nation_name,
       |  count(*) AS cust_cnt, ${moneySum("c_acctbal")} AS sum_acctbal
       |FROM customer
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY ROLLUP(r_name, n_name)
       |ORDER BY region_name, nation_name""".stripMargin
  }

  /** CUBE over two independent dimensions — all four grouping
    * combinations in one pass. */
  def aggCubeSegmentNation(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .cube(col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("cust_cnt"), Det.moneySum(col("c_acctbal")).as("sum_acctbal"))
      .select(
        coalesce(col("n_name"), lit("ALL")).as("nation_name"),
        coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
        col("cust_cnt"), col("sum_acctbal"))
      .orderBy("nation_name", "segment")

  val aggCubeSegmentNationSql: String = {
    import Det.sql._
    s"""SELECT COALESCE(n_name, 'ALL') AS nation_name,
       |  COALESCE(c_mktsegment, 'ALL') AS segment,
       |  count(*) AS cust_cnt, ${moneySum("c_acctbal")} AS sum_acctbal
       |FROM customer JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY CUBE(n_name, c_mktsegment)
       |ORDER BY nation_name, segment""".stripMargin
  }

  /** GROUPING SETS through the SQL front-end (temp views +
    * `spark.sql`) — the same engine surface a SQL-first user gets. */
  def aggGroupingSets(s: SparkSession, dir: String): DataFrame = {
    Catalog.registerViews(s, dir)
    s.sql(
      s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
         |  COALESCE(o_orderpriority, 'ALL') AS prio,
         |  count(*) AS cnt,
         |  ${Det.sql.moneySum("o_totalprice")} AS sum_price
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         |ORDER BY status, prio""".stripMargin)
  }

  val aggGroupingSetsSql: String = {
    import Det.sql._
    s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       |  COALESCE(o_orderpriority, 'ALL') AS prio,
       |  count(*) AS cnt,
       |  ${moneySum("o_totalprice")} AS sum_price
       |FROM orders
       |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
       |ORDER BY status, prio""".stripMargin
  }

  /** Approximate percentiles (t-digest-style sketch) next to exact
    * min/max — engine-specific sketch, so rows-only; sanity-checked in
    * scalatest range terms by the driver's row check. The quartiles are
    * projected as three SCALAR doubles (not one array column): the
    * driver's rows-only compare sorts rows in pandas and cannot hash
    * array cells. */
  def aggPercentileApprox(s: SparkSession, dir: String): DataFrame = {
    val q = percentile_approx(col("o_totalprice"),
      array(lit(0.25), lit(0.5), lit(0.75)), lit(10000))
    t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("cnt"),
        min(col("o_totalprice")).as("min_price"),
        q.as("__q"),
        max(col("o_totalprice")).as("max_price"))
      .select(col("o_orderstatus"), col("cnt"), col("min_price"),
        element_at(col("__q"), 1).as("p25"),
        element_at(col("__q"), 2).as("p50"),
        element_at(col("__q"), 3).as("p75"),
        col("max_price"))
      .orderBy("o_orderstatus")
  }

  /** EXACT percentiles (Spark `percentile`, a sort-based aggregate) —
    * the oracle-checkable twin of the approx sketch above: both engines
    * use the same linear-interpolation definition over identical
    * doubles, so the result hash-matches DuckDB's `quantile_cont`
    * (verified bitwise on this data). The approx variant stays
    * rows-only (sketch internals are engine-specific); this one is the
    * correctness anchor. */
  def aggPercentileExact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("cnt"),
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.9)").as("p90"))
      .orderBy("o_orderpriority")

  val aggPercentileExactSql: String =
    """SELECT o_orderpriority, count(*) AS cnt,
      |  quantile_cont(o_totalprice, 0.5) AS p50,
      |  quantile_cont(o_totalprice, 0.9) AS p90
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // --- window functions ------------------------------------------------

  /** Ranking window; the window ORDER BY carries a unique tiebreaker
    * (o_orderkey) per the determinism contract. */
  def winRankOrdersByCust(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders").filter(col("o_custkey") % 100 === 0)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        rank().over(w).as("rk"),
        dense_rank().over(w).as("drk"),
        row_number().over(w).as("rn"))
      .orderBy("o_custkey", "rn")
  }

  val winRankOrdersByCustSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  CAST(rank()       OVER w AS INTEGER) AS rk,
      |  CAST(dense_rank() OVER w AS INTEGER) AS drk,
      |  CAST(row_number() OVER w AS INTEGER) AS rn
      |FROM orders WHERE o_custkey % 100 = 0
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_custkey, rn""".stripMargin

  /** Running total with an explicit ROWS frame; decimal window sums are
    * exact so the exported doubles match bitwise. */
  def winRunningTotal(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders").filter(col("o_custkey") % 100 === 0)
      .select(col("o_custkey"), col("o_orderkey"),
        sum(Det.dec2(col("o_totalprice"))).over(w).cast("double").as("running_total"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val winRunningTotalSql: String = {
    import Det.sql._
    s"""SELECT o_custkey, o_orderkey,
       |  CAST(SUM(${dec2("o_totalprice")}) OVER (
       |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
       |FROM orders WHERE o_custkey % 100 = 0
       |ORDER BY o_custkey, o_orderkey""".stripMargin
  }

  /** Moving average over the trailing 3-row frame: decimal frame sum /
    * frame count, divided in double. */
  def winMovingAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-2, Window.currentRow)
    t(s, dir, "orders").filter(col("o_custkey") % 100 === 0)
      .select(col("o_custkey"), col("o_orderkey"),
        (sum(Det.dec2(col("o_totalprice"))).over(w).cast("double") /
          count(lit(1)).over(w).cast("double")).as("moving_avg"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val winMovingAvgSql: String = {
    import Det.sql._
    s"""SELECT o_custkey, o_orderkey,
       |  CAST(SUM(${dec2("o_totalprice")}) OVER w AS DOUBLE) /
       |    CAST(count(*) OVER w AS DOUBLE) AS moving_avg
       |FROM orders WHERE o_custkey % 100 = 0
       |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
       |ORDER BY o_custkey, o_orderkey""".stripMargin
  }

  /** Offset window functions: lead/lag/first_value/ntile over the
    * per-customer order timeline. Epoch-day ints keep outputs
    * engine-portable; COALESCE removes boundary NULLs. */
  def winLeadLag(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("day"), col("o_orderkey"))
    t(s, dir, "orders").filter(col("o_custkey") % 100 === 0)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("day"))
      .withColumn("prev_day", coalesce(lag(col("day"), 1).over(w), lit(-1)))
      .withColumn("next_day", coalesce(lead(col("day"), 1).over(w), lit(-1)))
      .withColumn("first_day", first(col("day")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("quartile", ntile(4).over(w))
      .orderBy("o_custkey", "day", "o_orderkey")
  }

  val winLeadLagSql: String =
    """SELECT o_custkey, o_orderkey, day,
      |  COALESCE(lag(day) OVER w, -1) AS prev_day,
      |  COALESCE(lead(day) OVER w, -1) AS next_day,
      |  first_value(day) OVER (PARTITION BY o_custkey ORDER BY day, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_day,
      |  CAST(ntile(4) OVER w AS INTEGER) AS quartile
      |FROM (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS day
      |  FROM orders WHERE o_custkey % 100 = 0)
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY day, o_orderkey)
      |ORDER BY o_custkey, day, o_orderkey""".stripMargin

  /** Relative-position window functions: percent_rank and cume_dist.
    * Both are pure integer-ratio doubles ((rank-1)/(n-1), rank/n), so
    * they hash-match with no rounding. */
  def winPercentCume(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    t(s, dir, "orders").filter(col("o_custkey") % 50 === 0)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy("o_orderpriority", "o_orderkey")
  }

  val winPercentCumeSql: String =
    """SELECT o_orderpriority, o_orderkey, o_totalprice,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume
      |FROM orders WHERE o_custkey % 50 = 0
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderpriority, o_orderkey""".stripMargin

  /** Statistical aggregates (corr / regression slope / stddev) computed
    * from EXACT decimal sufficient statistics — n, Σx, Σy, Σxy, Σx²,
    * Σy² accumulate in decimal (associative and exact, so any
    * partitioning / AQE merge order gives the same bits — unlike
    * streaming Welford merges, whose result depends on merge order),
    * and the final ratios are IEEE doubles of identical inputs. This is
    * how a distributed engine computes corr at scale anyway: one
    * map-side-combinable pass, no second pass over the data. */
  def aggStatsCorr(s: SparkSession, dir: String): DataFrame = {
    // Integer-cents sufficient statistics: BIGINT sums are exact and the
    // one int64->double cast per stat rounds identically in both engines
    // (a high-scale DECIMAL->DOUBLE cast does NOT: DuckDB double-rounds
    // int128*10^-s, Spark rounds the exact decimal once — they differ in
    // the last ulp). corr is scale-invariant; slope's 100s cancel; the
    // stddevs divide the cents back down at the end.
    val qc = (Det.dec2(col("l_quantity")) * lit(100)).cast("long")
    val pc = (Det.dec2(col("l_extendedprice")) * lit(100)).cast("long")
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(qc).cast("double").as("sq"),
        sum(pc).cast("double").as("sp"),
        sum(qc * qc).cast("double").as("sqq"),
        sum(pc * pc).cast("double").as("spp"),
        sum(qc * pc).cast("double").as("sqp"))
      .select(col("l_returnflag"), col("n"),
        ((col("n") * col("sqp") - col("sq") * col("sp")) /
          (sqrt(col("n") * col("sqq") - col("sq") * col("sq")) *
            sqrt(col("n") * col("spp") - col("sp") * col("sp")))).as("corr_qty_price"),
        ((col("n") * col("sqp") - col("sq") * col("sp")) /
          (col("n") * col("sqq") - col("sq") * col("sq"))).as("slope_price_per_qty"),
        (sqrt(col("n") * col("sqq") - col("sq") * col("sq")) / col("n") / lit(100.0)).as("std_qty"),
        (sqrt(col("n") * col("spp") - col("sp") * col("sp")) / col("n") / lit(100.0)).as("std_price"))
      .orderBy("l_returnflag")
  }

  val aggStatsCorrSql: String = {
    def cents(e: String) = s"CAST(CAST($e AS DECIMAL(12,2)) * 100 AS BIGINT)"
    s"""WITH g AS (
       |  SELECT l_returnflag, count(*) AS n,
       |    CAST(CAST(SUM(${cents("l_quantity")}) AS BIGINT) AS DOUBLE) AS sq,
       |    CAST(CAST(SUM(${cents("l_extendedprice")}) AS BIGINT) AS DOUBLE) AS sp,
       |    CAST(CAST(SUM(${cents("l_quantity")} * ${cents("l_quantity")}) AS BIGINT) AS DOUBLE) AS sqq,
       |    CAST(CAST(SUM(${cents("l_extendedprice")} * ${cents("l_extendedprice")}) AS BIGINT) AS DOUBLE) AS spp,
       |    CAST(CAST(SUM(${cents("l_quantity")} * ${cents("l_extendedprice")}) AS BIGINT) AS DOUBLE) AS sqp
       |  FROM lineitem GROUP BY l_returnflag)
       |SELECT l_returnflag, n,
       |  (n * sqp - sq * sp) /
       |    (sqrt(n * sqq - sq * sq) * sqrt(n * spp - sp * sp)) AS corr_qty_price,
       |  (n * sqp - sq * sp) / (n * sqq - sq * sq) AS slope_price_per_qty,
       |  sqrt(n * sqq - sq * sq) / n / 100.0 AS std_qty,
       |  sqrt(n * spp - sp * sp) / n / 100.0 AS std_price
       |FROM g ORDER BY l_returnflag""".stripMargin
  }

  /** Pivot: order counts per priority, statuses as columns. The oracle
    * mirror is portable conditional aggregation (identical semantics,
    * no dialect-specific PIVOT syntax). */
  def pivotOrdersStatus(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("o_orderpriority")

  val pivotOrdersStatusSql: String =
    """SELECT o_orderpriority,
      |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
      |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
      |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Unpivot (melt): part attributes to long form. */
  def unpivotPartAttrs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .filter(col("p_partkey") % 100 === 0)
      .select(col("p_partkey"),
        Det.dec2(col("p_retailprice")).cast("double").as("retailprice"),
        col("p_size").cast("double").as("size"))
      .unpivot(Array(col("p_partkey")), Array(col("retailprice"), col("size")),
        "metric", "value")
      .orderBy("p_partkey", "metric")

  val unpivotPartAttrsSql: String = {
    import Det.sql._
    s"""SELECT p_partkey, 'retailprice' AS metric,
       |  CAST(${dec2("p_retailprice")} AS DOUBLE) AS value
       |FROM part WHERE p_partkey % 100 = 0
       |UNION ALL
       |SELECT p_partkey, 'size', CAST(p_size AS DOUBLE)
       |FROM part WHERE p_partkey % 100 = 0
       |ORDER BY p_partkey, metric""".stripMargin
  }

  // --- sort / top-k ----------------------------------------------------

  /** orderBy+limit compiles to TakeOrderedAndProject — per-partition
    * heaps + driver merge of 100 rows, no global sort at any scale. */
  def topkExpensiveOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .limit(100)

  val topkExpensiveOrdersSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  // --- set operations --------------------------------------------------

  def setopUnionExcept(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val a = c.filter(col("c_custkey") % 2 === 0).select("c_custkey")
    val b = c.filter(col("c_custkey") % 3 === 0).select("c_custkey")
    val buyers = t(s, dir, "orders").filter(col("o_custkey") % 5 === 0)
      .select(col("o_custkey").as("c_custkey"))
    a.union(b).distinct().except(buyers).orderBy("c_custkey")
  }

  val setopUnionExceptSql: String =
    """SELECT c_custkey FROM (
      |  SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0
      |  UNION
      |  SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0
      |  EXCEPT
      |  SELECT o_custkey AS c_custkey FROM orders WHERE o_custkey % 5 = 0
      |) ORDER BY c_custkey""".stripMargin

  def setopIntersect(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").select("c_custkey")
    val evens = c.filter(col("c_custkey") % 2 === 0)
    val third = c.filter(col("c_custkey") % 3 === 0)
    evens.intersect(third).orderBy("c_custkey")
  }

  val setopIntersectSql: String =
    """SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0
      |INTERSECT
      |SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0
      |ORDER BY c_custkey""".stripMargin

  // --- scalar function families ---------------------------------------

  /** String functions over documents.text. */
  def strFuncsDocs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        length(col("text")).as("len_chars"),
        upper(substring(col("text"), 1, 10)).as("head10"),
        regexp_extract(col("text"), "^([a-z0-9]+)", 1).as("first_word"),
        size(split(col("text"), " ")).as("token_cnt"),
        concat(col("lang"), lit(":"), col("source")).as("lang_source"))
      .orderBy("doc_id")

  val strFuncsDocsSql: String =
    """SELECT doc_id,
      |  CAST(length(text) AS INTEGER) AS len_chars,
      |  upper(substr(text, 1, 10)) AS head10,
      |  regexp_extract(text, '^([a-z0-9]+)', 1) AS first_word,
      |  CAST(len(string_split(text, ' ')) AS INTEGER) AS token_cnt,
      |  lang || ':' || source AS lang_source
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Date/time functions over orders — outputs are DATE/INT only. */
  def dateFuncsOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("order_month"))
      .agg(
        count(lit(1)).as("cnt"),
        min(col("o_orderdate").cast("date")).as("first_day"),
        max(col("o_orderdate").cast("date")).as("last_day"),
        datediff(max(col("o_orderdate").cast("date")), min(col("o_orderdate").cast("date")))
          .as("span_days"))
      .withColumn("order_year", year(col("order_month")))
      .withColumn("order_moy", month(col("order_month")))
      .orderBy("order_month")

  val dateFuncsOrdersSql: String =
    """WITH g AS (
      |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
      |    count(*) AS cnt,
      |    min(CAST(o_orderdate AS DATE)) AS first_day,
      |    max(CAST(o_orderdate AS DATE)) AS last_day,
      |    CAST(datediff('day', min(CAST(o_orderdate AS DATE)),
      |                         max(CAST(o_orderdate AS DATE))) AS INTEGER) AS span_days
      |  FROM orders GROUP BY 1)
      |SELECT order_month, cnt, first_day, last_day, span_days,
      |  CAST(EXTRACT(year FROM order_month) AS INTEGER) AS order_year,
      |  CAST(EXTRACT(month FROM order_month) AS INTEGER) AS order_moy
      |FROM g ORDER BY order_month""".stripMargin

  /** Array higher-order functions over embeddings (multimodal vector
    * column). Sums are sequential left-folds in both engines (explicit
    * +-chain in SQL == aggregate() fold in Spark) — bitwise identical. */
  def arrayFuncsEmbeddings(s: SparkSession, dir: String): DataFrame = {
    val e = transform(col("embedding"), _.cast("double"))
    val sumSq = aggregate(e, lit(0.0), (acc, x) => acc + x * x)
    val head3 = aggregate(transform(slice(col("embedding"), 1, 3), _.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    t(s, dir, "embeddings")
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).cast("double").as("first_val"),
        sumSq.as("sum_sq"),
        sqrt(sumSq).as("l2_norm"),
        head3.as("head3_sum"),
        col("label"))
      .orderBy("vec_id")
  }

  val arrayFuncsEmbeddingsSql: String = {
    val sumSq = Det.sqlFoldChain(i => s"(e[$i] * e[$i])", 64)
    val head3 = Det.sqlFoldChain(i => s"e[$i]", 3)
    s"""WITH d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, label FROM embeddings)
       |SELECT vec_id,
       |  CAST(len(e) AS INTEGER) AS dim,
       |  e[1] AS first_val,
       |  $sumSq AS sum_sq,
       |  sqrt($sumSq) AS l2_norm,
       |  $head3 AS head3_sum,
       |  label
       |FROM d ORDER BY vec_id""".stripMargin
  }

  /** JSON extraction over events.props (semi-structured column). */
  def jsonPropsEvents(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  val jsonPropsEventsSql: String =
    """SELECT event_type, count(*) AS cnt,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
      |  min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
      |  max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Semi-structured props through Spark 4's native VARIANT type:
    * `parse_json` once into a variant column, then typed
    * `variant_get` extraction — the engine's open-schema path (binary
    * variant encoding, no per-row string re-parse per field, unlike
    * repeated `get_json_object`). Same aggregates as
    * `json_props_events`, so the same DuckDB oracle applies. */
  def variantPropsEvents(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type"), parse_json(col("props")).as("v"))
      .select(col("event_type"),
        expr("variant_get(v, '$.k', 'int')").as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** Typed-Aggregator UDAF over grouped data. Welford's (n, mean, m2/n)
    * is algebraically COUNT/AVG/VAR_POP, but its accumulation order
    * differs from the oracle's sum-based aggregates, so the doubles
    * agree only to ~1e-12 relative — the one place the bitwise contract
    * (Det) is unreachable and both sides round to 6 dp instead (the
    * values are O(10⁴)-scale with ~1e-7 absolute agreement, so the
    * rounded digits coincide). UdfSpec asserts the moments math itself. */
  def udafAcctbalMoments(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(graft.functions.Udfs.moments(col("c_acctbal")).as("m"))
      .select(col("n_name"), col("m._1").as("n"),
        round(col("m._2"), 6).as("mean"), round(col("m._3"), 6).as("variance"))
      .orderBy("n_name")

  val udafAcctbalMomentsSql: String =
    """SELECT n_name, count(*) AS n,
      |  round(avg(c_acctbal), 6) AS mean,
      |  round(var_pop(c_acctbal), 6) AS variance
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------------

  // --- tpch_q3_shipping: TPC-H Q3 adapted to the fixture schema --------
  // The classic 3-way join + top-k: customer(BUILDING) ⋈ orders ⋈
  // lineitem, revenue per order. The planner's job here IS the test:
  // customer filters to ~1/5 and broadcasts; lineitem never shuffles
  // until the final per-order aggregate; TakeOrderedAndProject caps the
  // sort at k. Fixture has no o_shippriority, so the output carries
  // o_orderdate instead.
  def tpchQ3Shipping(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-06-15")
    val revenue = Det.dec2(col("l_extendedprice")) *
      (lit(1).cast("decimal(4,2)") - Det.rate2(col("l_discount")))
    t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < cutoff)
      .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > cutoff)
      .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("orderdate"))
      .agg(sum(revenue).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val tpchQ3ShippingSql: String = {
    import Det.sql._
    val rev = s"${dec2("l_extendedprice")} * (CAST(1 AS DECIMAL(4,2)) - ${rate2("l_discount")})"
    s"""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
       |  CAST(SUM($rev) AS DOUBLE) AS revenue
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON o_orderkey = l_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-06-15'
       |  AND l_shipdate > TIMESTAMP '1998-06-15'
       |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
       |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin
  }

  // --- tpch_q5_local_supplier: TPC-H Q5 adapted ------------------------
  // Six-table snowflake: revenue by nation for ASIA where the supplier
  // and customer share a nation (the "local supplier" predicate). All
  // four dims broadcast; the two facts (orders, lineitem) each shuffle
  // once on orderkey; the local-supplier equality is a residual on the
  // supplier broadcast join, not an extra shuffle.
  def tpchQ5LocalSupplier(s: SparkSession, dir: String): DataFrame = {
    val revenue = Det.dec2(col("l_extendedprice")) *
      (lit(1).cast("decimal(4,2)") - Det.rate2(col("l_discount")))
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
      .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .filter(col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(revenue).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val tpchQ5LocalSupplierSql: String = {
    import Det.sql._
    val rev = s"${dec2("l_extendedprice")} * (CAST(1 AS DECIMAL(4,2)) - ${rate2("l_discount")})"
    s"""SELECT n_name, CAST(SUM($rev) AS DOUBLE) AS revenue
       |FROM customer
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON o_orderkey = l_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin
  }

  // --- tpch_q18_big_orders: TPC-H Q18 adapted ---------------------------
  // The HAVING-subquery top-k shape: the IN (... GROUP BY ... HAVING)
  // subquery must decorrelate to ONE aggregate over lineitem followed
  // by a semi join — not a per-row re-execution — and the final top-100
  // must compile to TakeOrderedAndProject, not a global sort. Shared
  // ANSI text runs unchanged in both engines; sum(l_quantity) is a
  // double sum of integer-valued quantities, so it is exact and
  // order-independent (Det §7).
  def tpchQ18BigOrders(s: SparkSession, dir: String): DataFrame = {
    Catalog.registerViews(s, dir)
    s.sql(tpchQ18BigOrdersSql)
  }

  val tpchQ18BigOrdersSql: String =
    """SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
      |  o_totalprice, SUM(l_quantity) AS sum_qty
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
      |GROUP BY c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin

  // --- tpch_q21_waiting_supplier: TPC-H Q21 adapted ---------------------
  // The multi-EXISTS decorrelation shape: EXISTS and NOT EXISTS against
  // the SAME fact table with different correlated predicates must
  // become one left-semi and one left-anti join on l_orderkey — never a
  // per-row subquery loop. The fixture has no commit/receipt dates, so
  // "waiting" is adapted to returns: a supplier whose line was returned
  // ('R') on a finished multi-supplier order where no OTHER supplier's
  // line was returned.
  def tpchQ21WaitingSupplier(s: SparkSession, dir: String): DataFrame = {
    Catalog.registerViews(s, dir)
    s.sql(tpchQ21WaitingSupplierSql)
  }

  val tpchQ21WaitingSupplierSql: String =
    """SELECT s_name, count(*) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 20""".stripMargin

  // --- tpch_q4_priority_exists: TPC-H Q4 adapted ------------------------
  // Correlated EXISTS whose inner predicate compares an INNER column to
  // an OUTER column (l_shipdate > o_orderdate): decorrelation must carry
  // the inequality as a residual on a single semi join keyed on
  // l_orderkey — the shape Q18/Q21 don't cover (their correlates are
  // pure equalities). Fixture has no commit/receipt dates, so "late
  // line" is adapted to shipped-after-order-date.
  def tpchQ4PriorityExists(s: SparkSession, dir: String): DataFrame = {
    Catalog.registerViews(s, dir)
    s.sql(tpchQ4PriorityExistsSql)
  }

  val tpchQ4PriorityExistsSql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // --- tpch_q7_volume_shipping: TPC-H Q7 adapted ------------------------
  // Nation self-aliased TWICE (supplier's vs customer's nation) with a
  // disjunctive pair predicate — the residual OR must ride the broadcast
  // joins, never force a cartesian. Facts shuffle once each on orderkey;
  // both nation copies broadcast. year() returns INT in Spark and BIGINT
  // in DuckDB, so the shared text pins CAST(... AS INTEGER).
  def tpchQ7VolumeShipping(s: SparkSession, dir: String): DataFrame = {
    Catalog.registerViews(s, dir)
    s.sql(tpchQ7VolumeShippingSql)
  }

  val tpchQ7VolumeShippingSql: String = {
    import Det.sql._
    val rev = s"${dec2("l_extendedprice")} * (CAST(1 AS DECIMAL(4,2)) - ${rate2("l_discount")})"
    s"""SELECT supp_nation, cust_nation, l_year,
       |  CAST(SUM(volume) AS DOUBLE) AS revenue
       |FROM (
       |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |    CAST(year(l_shipdate) AS INTEGER) AS l_year, $rev AS volume
       |  FROM supplier
       |  JOIN lineitem ON s_suppkey = l_suppkey
       |  JOIN orders ON o_orderkey = l_orderkey
       |  JOIN customer ON c_custkey = o_custkey
       |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |  WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
       |     OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
       |) shipping
       |GROUP BY supp_nation, cust_nation, l_year
       |ORDER BY supp_nation, cust_nation, l_year""".stripMargin
  }

  // --- tpch_q10_returned_items: TPC-H Q10 adapted -----------------------
  // Revenue lost to returns, per customer, top 20: the classic
  // fact-heavy join where the l_returnflag filter reaches the lineitem
  // scan (PushedFilters), customer/nation broadcast, and the top-k is a
  // heap (TakeOrderedAndProject), never a global sort.
  def tpchQ10ReturnedItems(s: SparkSession, dir: String): DataFrame = {
    val revenue = Det.dec2(col("l_extendedprice")) *
      (lit(1).cast("decimal(4,2)") - Det.rate2(col("l_discount")))
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") >= lit("1996-10-01") && col("o_orderdate") < lit("1997-01-01"))
      .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_returnflag") === "R")
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(revenue).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val tpchQ10ReturnedItemsSql: String = {
    import Det.sql._
    val rev = s"${dec2("l_extendedprice")} * (CAST(1 AS DECIMAL(4,2)) - ${rate2("l_discount")})"
    s"""SELECT c_custkey, c_name, n_name, CAST(SUM($rev) AS DOUBLE) AS revenue
       |FROM customer
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON o_orderkey = l_orderkey
       |WHERE o_orderdate >= TIMESTAMP '1996-10-01'
       |  AND o_orderdate < TIMESTAMP '1997-01-01'
       |  AND l_returnflag = 'R'
       |GROUP BY c_custkey, c_name, n_name
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin
  }

  // --- tpch_q13_custdist: TPC-H Q13 ------------------------------------
  // Distribution-of-counts: LEFT OUTER join with an extra ON-clause
  // predicate (which must NOT fall into WHERE — that would turn the
  // outer join inner), then a second aggregate OVER the first. Customers
  // with zero orders survive as c_count = 0 — the row the outer join
  // exists to keep.
  def tpchQ13Custdist(s: SparkSession, dir: String): DataFrame = {
    Catalog.registerViews(s, dir)
    s.sql(tpchQ13CustdistSql)
  }

  val tpchQ13CustdistSql: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer
      |  LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      |  GROUP BY c_custkey
      |) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // --- tpch_q14_promo_revenue: TPC-H Q14 -------------------------------
  // Conditional-ratio aggregate: CASE-gated decimal sum over a
  // fact⋈dim join, one output row. All money math is decimal-exact
  // until the final cast; the ratio divides two identical doubles, so
  // IEEE gives the same bits in both engines (Det §7 — no ROUND).
  def tpchQ14PromoRevenue(s: SparkSession, dir: String): DataFrame = {
    Catalog.registerViews(s, dir)
    s.sql(tpchQ14PromoRevenueSql)
  }

  val tpchQ14PromoRevenueSql: String = {
    import Det.sql._
    val rev = s"${dec2("l_extendedprice")} * (CAST(1 AS DECIMAL(4,2)) - ${rate2("l_discount")})"
    s"""SELECT promo_revenue, total_revenue,
       |  CAST(100 AS DOUBLE) * promo_revenue / total_revenue AS promo_pct
       |FROM (
       |  SELECT
       |    CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $rev
       |             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_revenue,
       |    CAST(SUM($rev) AS DOUBLE) AS total_revenue
       |  FROM lineitem
       |  JOIN part ON l_partkey = p_partkey
       |  WHERE l_shipdate >= TIMESTAMP '1997-03-01'
       |    AND l_shipdate < TIMESTAMP '1997-04-01'
       |) promo
       |ORDER BY promo_revenue""".stripMargin
  }

  // --- tpch_q16_supplier_cnt: TPC-H Q16 adapted ------------------------
  // The NOT IN shape: a null-aware anti join against the supplier
  // exclusion list (DISTINCT suppliers per part attribute triple
  // afterwards). NOT IN is semantically trickier than NOT EXISTS — one
  // NULL in the subquery empties the result — so Spark plans it as a
  // null-aware anti join, not a plain LeftAnti. Complaint filter adapted
  // to negative account balance (fixture has no s_comment).
  def tpchQ16SupplierCnt(s: SparkSession, dir: String): DataFrame = {
    Catalog.registerViews(s, dir)
    s.sql(tpchQ16SupplierCntSql)
  }

  val tpchQ16SupplierCntSql: String =
    """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#4'
      |  AND p_size IN (5, 10, 15, 20, 25, 30)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // --- tpch_q17_small_qty: TPC-H Q17 adapted ---------------------------
  // Correlated scalar AVG subquery per part: must decorrelate to ONE
  // aggregate over lineitem grouped by l_partkey joined back — never a
  // per-row re-execution. Determinism: l_quantity is integer-valued, so
  // the inner SUM is exact in any order; AVG is one IEEE division;
  // CAST(0.2 AS DOUBLE) pins the literal to the same double in both
  // engines (a bare 0.2 parses as DECIMAL with engine-specific scale
  // rules).
  def tpchQ17SmallQty(s: SparkSession, dir: String): DataFrame = {
    Catalog.registerViews(s, dir)
    s.sql(tpchQ17SmallQtySql)
  }

  val tpchQ17SmallQtySql: String = {
    import Det.sql._
    s"""SELECT ${moneySum("l_extendedprice")} AS small_qty_revenue,
       |  count(*) AS n_lines
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |WHERE p_brand = 'Brand#4'
       |  AND l_quantity < CAST(0.2 AS DOUBLE) *
       |    (SELECT avg(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
       |ORDER BY small_qty_revenue""".stripMargin
  }

  // --- tpch_q22_global_sales: TPC-H Q22 adapted ------------------------
  // Uncorrelated scalar aggregate subqueries + NOT EXISTS: customers
  // with above-average balance and no URGENT orders, grouped by nation
  // (the fixture's stand-in for Q22's phone country code; plain
  // "no orders" is vacuous here — the fixture gives nearly every
  // customer an order). The avg comparison is rewritten
  // multiplication-only (bal * n_pos > sum_pos) so every predicate
  // evaluates in exact decimal arithmetic — decimal DIVISION scale
  // rules differ between engines, multiplication doesn't.
  def tpchQ22GlobalSales(s: SparkSession, dir: String): DataFrame = {
    Catalog.registerViews(s, dir)
    s.sql(tpchQ22GlobalSalesSql)
  }

  val tpchQ22GlobalSalesSql: String = {
    import Det.sql._
    s"""SELECT c_nationkey, count(*) AS numcust,
       |  ${moneySum("c_acctbal")} AS totacctbal
       |FROM customer
       |WHERE ${dec2("c_acctbal")} *
       |    (SELECT count(*) FROM customer WHERE c_acctbal > 0.0)
       |  > (SELECT SUM(${dec2("c_acctbal")}) FROM customer WHERE c_acctbal > 0.0)
       |  AND NOT EXISTS (SELECT 1 FROM orders
       |                  WHERE o_custkey = c_custkey
       |                    AND o_orderpriority = '1-URGENT')
       |GROUP BY c_nationkey
       |ORDER BY c_nationkey""".stripMargin
  }

  // --- tpch_q2_min_cost_supp: TPC-H Q2 adapted --------------------------
  // The correlated scalar MIN shape over a 4-table snowflake: the
  // subquery re-joins supplier/nation/region per part, so decorrelation
  // must produce ONE per-partkey MIN aggregate over the same join tree,
  // joined back — never a per-row re-execution. Fixture has no partsupp,
  // so "min supply cost" is adapted to min sale price (l_extendedprice)
  // among EUROPE suppliers; the price equality compares exact decimals.
  def tpchQ2MinCostSupp(s: SparkSession, dir: String): DataFrame = {
    Catalog.registerViews(s, dir)
    s.sql(tpchQ2MinCostSuppSql)
  }

  val tpchQ2MinCostSuppSql: String = {
    import Det.sql._
    s"""SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name
       |FROM part JOIN lineitem ON p_partkey = l_partkey
       |JOIN supplier ON s_suppkey = l_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE p_size IN (5, 15, 25, 35, 45) AND r_name = 'EUROPE'
       |  AND ${dec2("l_extendedprice")} = (
       |    SELECT MIN(${dec2("l2.l_extendedprice")})
       |    FROM lineitem l2 JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
       |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
       |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
       |    WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
       |ORDER BY s_acctbal DESC, p_partkey, s_name LIMIT 100""".stripMargin
  }

  // --- tpch_q6_forecast_revenue: TPC-H Q6 -------------------------------
  // The pushdown benchmark: a single scan whose three predicates must
  // all reach the parquet reader (PushedFilters), one global aggregate,
  // zero joins, zero shuffles beyond the final single-row reduce. At
  // 100 TB this is THE bandwidth-bound query — any plan with more than
  // scan + partial agg + final agg is wrong. Discount bounds compare in
  // exact 2-dp decimal so both engines test the same values.
  def tpchQ6ForecastRevenue(s: SparkSession, dir: String): DataFrame = {
    val lo = lit(0.05).cast("decimal(4,2)")
    val hi = lit(0.07).cast("decimal(4,2)")
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01") &&
        Det.rate2(col("l_discount")).between(lo, hi) &&
        col("l_quantity") < 24.0)
      .agg(
        sum(Det.dec2(col("l_extendedprice")) * Det.rate2(col("l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("revenue")
  }

  val tpchQ6ForecastRevenueSql: String = {
    import Det.sql._
    s"""SELECT CAST(SUM(${dec2("l_extendedprice")} * ${rate2("l_discount")}) AS DOUBLE) AS revenue,
       |  count(*) AS n_lines
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
       |  AND ${rate2("l_discount")} BETWEEN CAST(0.05 AS DECIMAL(4,2)) AND CAST(0.07 AS DECIMAL(4,2))
       |  AND l_quantity < 24.0
       |ORDER BY revenue""".stripMargin
  }

  // --- tpch_q8_market_share: TPC-H Q8 adapted ----------------------------
  // Eight-table snowflake with nation joined TWICE (customer's region
  // gates the order, supplier's nation is the market-share numerator) and
  // a CASE-gated decimal ratio per year. The numerator/denominator sums
  // stay exact decimal; the single division per year is IEEE-identical
  // across engines (Det §7).
  def tpchQ8MarketShare(s: SparkSession, dir: String): DataFrame = {
    Catalog.registerViews(s, dir)
    s.sql(tpchQ8MarketShareSql)
  }

  val tpchQ8MarketShareSql: String = {
    import Det.sql._
    val rev = s"${dec2("l_extendedprice")} * (CAST(1 AS DECIMAL(4,2)) - ${rate2("l_discount")})"
    s"""SELECT o_year,
       |  CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
       |           ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
       |    / CAST(SUM(volume) AS DOUBLE) AS mkt_share
       |FROM (
       |  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       |    $rev AS volume, n2.n_name AS supp_nation
       |  FROM part JOIN lineitem ON p_partkey = l_partkey
       |  JOIN supplier ON s_suppkey = l_suppkey
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
       |  JOIN region ON n1.n_regionkey = r_regionkey
       |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
       |  WHERE r_name = 'ASIA' AND p_type = 'LARGE'
       |) all_nations
       |GROUP BY o_year
       |ORDER BY o_year""".stripMargin
  }

  // --- tpch_q9_product_profit: TPC-H Q9 adapted --------------------------
  // Profit by (supplier nation, order year) for a part-name LIKE family.
  // The LIKE filter prunes part BEFORE the fact join (it reaches the
  // part scan), supplier/nation broadcast, lineitem and orders each
  // shuffle once on orderkey. Fixture has no partsupp, so profit drops
  // the supplycost term: amount = extendedprice * (1 - discount).
  def tpchQ9ProductProfit(s: SparkSession, dir: String): DataFrame = {
    val amount = Det.dec2(col("l_extendedprice")) *
      (lit(1).cast("decimal(4,2)") - Det.rate2(col("l_discount")))
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part").filter(col("p_name").like("%widget%"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("int").as("o_year"))
      .agg(sum(amount).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val tpchQ9ProductProfitSql: String = {
    import Det.sql._
    val rev = s"${dec2("l_extendedprice")} * (CAST(1 AS DECIMAL(4,2)) - ${rate2("l_discount")})"
    s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       |  CAST(SUM($rev) AS DOUBLE) AS sum_profit
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN nation ON s_nationkey = n_nationkey
       |WHERE p_name LIKE '%widget%'
       |GROUP BY n_name, CAST(year(o_orderdate) AS INTEGER)
       |ORDER BY nation, o_year DESC""".stripMargin
  }

  // --- tpch_q11_important_parts: TPC-H Q11 adapted -----------------------
  // HAVING against a GLOBAL scalar: per-part value must exceed a fraction
  // of the whole (same-filtered) corpus value. The scalar subquery runs
  // ONCE (uncorrelated) and broadcasts into the HAVING filter; both the
  // per-group and global sums stay exact decimal, and the threshold is a
  // decimal MULTIPLICATION (division scale rules differ across engines).
  // Fixture has no partsupp, so "stock value" is adapted to revenue from
  // NATION_3's suppliers.
  def tpchQ11ImportantParts(s: SparkSession, dir: String): DataFrame = {
    Catalog.registerViews(s, dir)
    s.sql(tpchQ11ImportantPartsSql)
  }

  val tpchQ11ImportantPartsSql: String = {
    import Det.sql._
    s"""SELECT l_partkey AS ps_partkey,
       |  CAST(SUM(${dec2("l_extendedprice")}) AS DOUBLE) AS value
       |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |WHERE n_name = 'NATION_3'
       |GROUP BY l_partkey
       |HAVING SUM(${dec2("l_extendedprice")}) > (
       |  SELECT SUM(${dec2("l_extendedprice")}) * CAST(0.001 AS DECIMAL(6,4))
       |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  WHERE n_name = 'NATION_3')
       |ORDER BY value DESC, ps_partkey""".stripMargin
  }

  // --- tpch_q12_late_lines: TPC-H Q12 adapted -----------------------------
  // Priority-class line counts for late shipments: one fact-fact join on
  // orderkey, conditional counters inside a single hash agg (no extra
  // pass per CASE). Fixture has no commit/receipt dates or shipmode, so
  // "late" is shipped >30 days after order date, grouped by linestatus.
  def tpchQ12LateLines(s: SparkSession, dir: String): DataFrame = {
    val hiPri = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    t(s, dir, "orders")
      .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 30 DAY") &&
        col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01"))
      .groupBy("l_linestatus")
      .agg(
        count(when(hiPri, 1)).as("high_line_count"),
        count(when(!hiPri, 1)).as("low_line_count"))
      .orderBy("l_linestatus")
  }

  val tpchQ12LateLinesSql: String =
    """SELECT l_linestatus,
      |  count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) AS high_line_count,
      |  count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= o_orderdate + INTERVAL 30 DAY
      |  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  // --- tpch_q15_top_supplier: TPC-H Q15 ----------------------------------
  // The view-vs-its-own-MAX shape: a revenue aggregate referenced twice
  // (once as the join input, once inside the scalar MAX). The equality
  // compares the engine's OWN exact decimals, so ties are found exactly;
  // only the output casts to double.
  def tpchQ15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    Catalog.registerViews(s, dir)
    s.sql(tpchQ15TopSupplierSql)
  }

  val tpchQ15TopSupplierSql: String = {
    import Det.sql._
    val rev = s"${dec2("l_extendedprice")} * (CAST(1 AS DECIMAL(4,2)) - ${rate2("l_discount")})"
    s"""WITH revenue AS (
       |  SELECT l_suppkey AS supplier_no, SUM($rev) AS total_revenue_dec
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, CAST(total_revenue_dec AS DOUBLE) AS total_revenue
       |FROM supplier JOIN revenue ON s_suppkey = supplier_no
       |WHERE total_revenue_dec = (SELECT MAX(total_revenue_dec) FROM revenue)
       |ORDER BY s_suppkey""".stripMargin
  }

  // --- tpch_q19_disjunctive_rev: TPC-H Q19 adapted ------------------------
  // Three conjunctive brand/size/quantity branches OR'd together: the
  // disjunction must stay a residual on the ONE partkey hash join (the
  // rewritten-Q19 planner test — a naive planner cross-joins or runs the
  // join three times). Part broadcasts; lineitem never shuffles.
  def tpchQ19DisjunctiveRev(s: SparkSession, dir: String): DataFrame = {
    def branch(brand: String, szHi: Int, qLo: Double, qHi: Double): Column =
      col("p_brand") === brand && col("p_size").between(1, szHi) &&
        col("l_quantity").between(qLo, qHi)
    val rev = Det.dec2(col("l_extendedprice")) *
      (lit(1).cast("decimal(4,2)") - Det.rate2(col("l_discount")))
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .filter(branch("Brand#1", 10, 1.0, 11.0) ||
        branch("Brand#2", 15, 10.0, 20.0) ||
        branch("Brand#3", 20, 20.0, 30.0))
      .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("n_lines"))
      .orderBy("revenue")
  }

  val tpchQ19DisjunctiveRevSql: String = {
    import Det.sql._
    val rev = s"${dec2("l_extendedprice")} * (CAST(1 AS DECIMAL(4,2)) - ${rate2("l_discount")})"
    s"""SELECT CAST(SUM($rev) AS DOUBLE) AS revenue, count(*) AS n_lines
       |FROM lineitem JOIN part ON p_partkey = l_partkey
       |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1.0 AND 11.0)
       |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 10.0 AND 20.0)
       |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 20.0 AND 30.0)
       |ORDER BY revenue""".stripMargin
  }

  // --- tpch_q20_promotion_supp: TPC-H Q20 adapted -------------------------
  // Nested IN subqueries: suppliers (in a region) who moved >50 units of
  // some red part in 1997. The inner IN prunes part, the outer IN is a
  // grouped HAVING over lineitem — both must decorrelate to semi joins
  // feeding ONE aggregate, never a loop. sum(l_quantity) is exact
  // (integer-valued doubles).
  def tpchQ20PromotionSupp(s: SparkSession, dir: String): DataFrame = {
    Catalog.registerViews(s, dir)
    s.sql(tpchQ20PromotionSuppSql)
  }

  val tpchQ20PromotionSuppSql: String =
    """SELECT s_name, s_acctbal
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_regionkey = (SELECT r_regionkey FROM region WHERE r_name = 'EUROPE')
      |  AND s_suppkey IN (
      |    SELECT l_suppkey FROM lineitem
      |    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      |      AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |    GROUP BY l_suppkey, l_partkey
      |    HAVING SUM(l_quantity) > 50.0)
      |ORDER BY s_name""".stripMargin

  // --- subquery_correlated: EXISTS + correlated scalar subqueries ------
  // Through the SQL front-end on purpose: Catalyst DECORRELATES both the
  // EXISTS predicate and the two scalar subqueries into joins (a
  // left-semi for EXISTS, per-custkey aggregates + left joins for the
  // scalars), so the physical plan is three hash joins on c_custkey —
  // no per-row re-execution, which is what makes correlated subqueries
  // survive 100 TB. Upstream emits exactly this SQL shape through
  // SQLAlchemy for its existence checks.
  def subqueryCorrelated(s: SparkSession, dir: String): DataFrame = {
    Catalog.registerViews(s, dir)
    s.sql(subqueryCorrelatedSql)
  }

  val subqueryCorrelatedSql: String =
    """SELECT c_custkey, c_name,
      |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
      |  (SELECT max(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_price
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  // --- join_full_outer_days: FULL OUTER join of two daily aggregates ---
  // Days with orders but no shipments (and vice versa) survive from
  // either side. Both inputs pre-aggregate BEFORE the join — at 100 TB
  // the full-outer operates on ~2500 day rows, not the fact tables, so
  // the join cost is noise regardless of strategy.
  def joinFullOuterDays(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n_orders"))
    val l = t(s, dir, "lineitem")
      .groupBy(to_date(col("l_shipdate")).as("day"))
      .agg(count(lit(1)).as("n_ships"))
    o.join(l, Seq("day"), "full_outer")
      .select(
        col("day"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_ships"), lit(0L)).as("n_ships"))
      .orderBy("day")
  }

  val joinFullOuterDaysSql: String =
    """SELECT COALESCE(o.day, l.day) AS day,
      |  COALESCE(n_orders, 0) AS n_orders, COALESCE(n_ships, 0) AS n_ships
      |FROM (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders
      |      FROM orders GROUP BY 1) o
      |FULL OUTER JOIN
      |     (SELECT CAST(l_shipdate AS DATE) AS day, count(*) AS n_ships
      |      FROM lineitem GROUP BY 1) l
      |ON o.day = l.day
      |ORDER BY day""".stripMargin

  // --- agg_filter_conditional: FILTER-clause conditional aggregation ---
  // One scan, one 3-group shuffle; the three FILTER predicates become
  // branch-free conditional accumulators inside the same hash-agg
  // operator (no extra pass per condition). Double comparisons are safe
  // cross-engine: both sides parse the same literal to the same double
  // and compare identical stored doubles.
  def aggFilterConditional(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        count(when(col("l_discount") > 0.05, 1)).as("n_hi_disc"),
        count(when(col("l_tax") === 0.0, 1)).as("n_no_tax"),
        sum(when(col("l_linestatus") === "F", Det.dec2(col("l_quantity"))))
          .cast("double").as("qty_f"))
      .orderBy("l_returnflag")

  val aggFilterConditionalSql: String = {
    import Det.sql._
    s"""SELECT l_returnflag,
       |  count(*) FILTER (WHERE l_discount > 0.05) AS n_hi_disc,
       |  count(*) FILTER (WHERE l_tax = 0.0) AS n_no_tax,
       |  CAST(SUM(${dec2("l_quantity")}) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_f
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tpch_q3_shipping" -> (tpchQ3Shipping _),
    "tpch_q5_local_supplier" -> (tpchQ5LocalSupplier _),
    "tpch_q18_big_orders" -> (tpchQ18BigOrders _),
    "tpch_q21_waiting_supplier" -> (tpchQ21WaitingSupplier _),
    "tpch_q4_priority_exists" -> (tpchQ4PriorityExists _),
    "tpch_q7_volume_shipping" -> (tpchQ7VolumeShipping _),
    "tpch_q10_returned_items" -> (tpchQ10ReturnedItems _),
    "tpch_q13_custdist" -> (tpchQ13Custdist _),
    "tpch_q14_promo_revenue" -> (tpchQ14PromoRevenue _),
    "tpch_q16_supplier_cnt" -> (tpchQ16SupplierCnt _),
    "tpch_q17_small_qty" -> (tpchQ17SmallQty _),
    "tpch_q22_global_sales" -> (tpchQ22GlobalSales _),
    "tpch_q2_min_cost_supp" -> (tpchQ2MinCostSupp _),
    "tpch_q6_forecast_revenue" -> (tpchQ6ForecastRevenue _),
    "tpch_q8_market_share" -> (tpchQ8MarketShare _),
    "tpch_q9_product_profit" -> (tpchQ9ProductProfit _),
    "tpch_q11_important_parts" -> (tpchQ11ImportantParts _),
    "tpch_q12_late_lines" -> (tpchQ12LateLines _),
    "tpch_q15_top_supplier" -> (tpchQ15TopSupplier _),
    "tpch_q19_disjunctive_rev" -> (tpchQ19DisjunctiveRev _),
    "tpch_q20_promotion_supp" -> (tpchQ20PromotionSupp _),
    "subquery_correlated" -> (subqueryCorrelated _),
    "join_full_outer_days" -> (joinFullOuterDays _),
    "agg_filter_conditional" -> (aggFilterConditional _),
    "agg_pricing_summary" -> (aggPricingSummary _),
    "proj_prune" -> (projPrune _),
    "join_orders_customer" -> (joinOrdersCustomer _),
    "join_nation_region_bcast" -> (joinNationRegionBcast _),
    "join_lineitem_orders_smj" -> (joinLineitemOrdersSmj _),
    "join_left_outer_orders" -> (joinLeftOuterOrders _),
    "agg_distinct_custkeys" -> (aggDistinctCustkeys _),
    "agg_rollup_nation_region" -> (aggRollupNationRegion _),
    "agg_cube_segment_nation" -> (aggCubeSegmentNation _),
    "agg_grouping_sets" -> (aggGroupingSets _),
    "agg_percentile_approx" -> (aggPercentileApprox _),
    "agg_percentile_exact" -> (aggPercentileExact _),
    "win_rank_orders_by_cust" -> (winRankOrdersByCust _),
    "win_running_total" -> (winRunningTotal _),
    "win_moving_avg" -> (winMovingAvg _),
    "win_lead_lag" -> (winLeadLag _),
    "win_percent_cume" -> (winPercentCume _),
    "agg_stats_corr" -> (aggStatsCorr _),
    "pivot_orders_status" -> (pivotOrdersStatus _),
    "unpivot_part_attrs" -> (unpivotPartAttrs _),
    "topk_expensive_orders" -> (topkExpensiveOrders _),
    "setop_union_except" -> (setopUnionExcept _),
    "setop_intersect" -> (setopIntersect _),
    "str_funcs_docs" -> (strFuncsDocs _),
    "date_funcs_orders" -> (dateFuncsOrders _),
    "array_funcs_embeddings" -> (arrayFuncsEmbeddings _),
    "json_props_events" -> (jsonPropsEvents _),
    "variant_props_events" -> (variantPropsEvents _),
    "udaf_acctbal_moments" -> (udafAcctbalMoments _))

  def oracle: Map[String, String] = Map(
    "tpch_q3_shipping" -> tpchQ3ShippingSql,
    "tpch_q5_local_supplier" -> tpchQ5LocalSupplierSql,
    "tpch_q18_big_orders" -> tpchQ18BigOrdersSql,
    "tpch_q21_waiting_supplier" -> tpchQ21WaitingSupplierSql,
    "tpch_q4_priority_exists" -> tpchQ4PriorityExistsSql,
    "tpch_q7_volume_shipping" -> tpchQ7VolumeShippingSql,
    "tpch_q10_returned_items" -> tpchQ10ReturnedItemsSql,
    "tpch_q13_custdist" -> tpchQ13CustdistSql,
    "tpch_q14_promo_revenue" -> tpchQ14PromoRevenueSql,
    "tpch_q16_supplier_cnt" -> tpchQ16SupplierCntSql,
    "tpch_q17_small_qty" -> tpchQ17SmallQtySql,
    "tpch_q22_global_sales" -> tpchQ22GlobalSalesSql,
    "tpch_q2_min_cost_supp" -> tpchQ2MinCostSuppSql,
    "tpch_q6_forecast_revenue" -> tpchQ6ForecastRevenueSql,
    "tpch_q8_market_share" -> tpchQ8MarketShareSql,
    "tpch_q9_product_profit" -> tpchQ9ProductProfitSql,
    "tpch_q11_important_parts" -> tpchQ11ImportantPartsSql,
    "tpch_q12_late_lines" -> tpchQ12LateLinesSql,
    "tpch_q15_top_supplier" -> tpchQ15TopSupplierSql,
    "tpch_q19_disjunctive_rev" -> tpchQ19DisjunctiveRevSql,
    "tpch_q20_promotion_supp" -> tpchQ20PromotionSuppSql,
    "subquery_correlated" -> subqueryCorrelatedSql,
    "join_full_outer_days" -> joinFullOuterDaysSql,
    "agg_filter_conditional" -> aggFilterConditionalSql,
    "agg_pricing_summary" -> aggPricingSummarySql,
    "proj_prune" -> projPruneSql,
    "join_orders_customer" -> joinOrdersCustomerSql,
    "join_nation_region_bcast" -> joinNationRegionBcastSql,
    "join_lineitem_orders_smj" -> joinLineitemOrdersSmjSql,
    "join_left_outer_orders" -> joinLeftOuterOrdersSql,
    "agg_distinct_custkeys" -> aggDistinctCustkeysSql,
    "agg_rollup_nation_region" -> aggRollupNationRegionSql,
    "agg_cube_segment_nation" -> aggCubeSegmentNationSql,
    "agg_grouping_sets" -> aggGroupingSetsSql,
    // agg_percentile_approx: engine-specific sketch -> rows-only
    "agg_percentile_exact" -> aggPercentileExactSql,
    "win_rank_orders_by_cust" -> winRankOrdersByCustSql,
    "win_running_total" -> winRunningTotalSql,
    "win_moving_avg" -> winMovingAvgSql,
    "win_lead_lag" -> winLeadLagSql,
    "win_percent_cume" -> winPercentCumeSql,
    "agg_stats_corr" -> aggStatsCorrSql,
    "pivot_orders_status" -> pivotOrdersStatusSql,
    "unpivot_part_attrs" -> unpivotPartAttrsSql,
    "topk_expensive_orders" -> topkExpensiveOrdersSql,
    "setop_union_except" -> setopUnionExceptSql,
    "setop_intersect" -> setopIntersectSql,
    "str_funcs_docs" -> strFuncsDocsSql,
    "date_funcs_orders" -> dateFuncsOrdersSql,
    "array_funcs_embeddings" -> arrayFuncsEmbeddingsSql,
    "json_props_events" -> jsonPropsEventsSql,
    "variant_props_events" -> jsonPropsEventsSql, // same aggregates, same oracle
    "udaf_acctbal_moments" -> udafAcctbalMomentsSql)
}
