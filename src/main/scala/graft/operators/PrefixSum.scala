package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global running total — the scalable replacement for a
  * single-partition `Window.orderBy(key)` scan.
  *
  * Shape: range-shard the key domain (one broadcast max-key join, no
  * sort), compute per-shard prefix sums with an ordinary partitioned
  * window, then offset each shard by the total of all shards before it
  * (an nShards-row window — driver-scale, not data-scale). Every stage
  * is a hash shuffle or a broadcast; nothing funnels the data through
  * one task, so the plan survives a 100× scale-up where the naive
  * empty-`partitionBy` window dies on its single partition.
  *
  * All arithmetic is integer/exact, so results are engine-portable
  * (the DuckDB oracle mirrors the same shard math — see
  * `CoreQueries.sampleWeightedSql`).
  */
object PrefixSum {

  /** Adds `cum` = running total of `valueCol` (a BIGINT column) in
    * ascending `orderCol` (a non-negative integral key) order.
    * Requires distinct `orderCol` values for a deterministic total
    * order. */
  def runningSum(df: DataFrame, orderCol: String, valueCol: String,
      nShards: Int = 32): DataFrame = {
    val mx = df.agg(max(col(orderCol)).as("__mx"))
    // Integer shard math (`div`, not fp `/`) so the oracle reproduces it.
    val sharded = df.crossJoin(broadcast(mx))
      .withColumn("__shard",
        least(expr(s"($orderCol * $nShards) div (__mx + 1)"), lit(nShards - 1L)))
      .drop("__mx")
    val wIn = Window.partitionBy("__shard").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // The offset window ranges over nShards (≤32) aggregate rows — NOT
    // the data — so a single partition is correct by construction. The
    // constant partition key silences WindowExec's "no partition
    // defined" warning, which should stay reserved for real data-scale
    // single-partition regressions.
    val wOff = Window.partitionBy(lit(0)).orderBy("__shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sharded.groupBy("__shard")
      .agg(sum(col(valueCol)).as("__stot"))
      .withColumn("__off", coalesce(sum(col("__stot")).over(wOff), lit(0L)))
      .select("__shard", "__off")
    sharded
      .withColumn("__part", sum(col(valueCol)).over(wIn))
      .join(broadcast(offsets), "__shard")
      .withColumn("cum", col("__part") + col("__off"))
      .drop("__shard", "__part", "__off")
  }

  /** Adds `rnk` = 1-based dense position in (`valueCol` DESC, `tieCol`
    * ASC) order — a rank IS a running count in rank order, so this is
    * [[runningSum]]'s shape applied to the VALUE axis: range-shard the
    * value domain (one broadcast min/max join, no global sort),
    * per-shard `row_number` with an ordinary partitioned window, then
    * offset each shard by the row count of every higher-value shard
    * (an nShards-row window — driver-scale). Nothing funnels the data
    * through one task, unlike the naive empty-`partitionBy` rank
    * window. `valueCol` may be negative (shards are offset from the
    * broadcast min; width uses `div` BEFORE multiply so the math can't
    * overflow on wide domains); `tieCol` must be distinct for a
    * deterministic total order. Equal-width value shards assume a
    * non-degenerate weight spread — a pathological corpus where one
    * value carries most rows degrades to the single-partition window
    * (correct, just not parallel); quantile-based bounds are the
    * production escalation. The RESULT is shard-independent, so an
    * oracle can use a plain `row_number() OVER (ORDER BY ...)`. */
  def descRank(df: DataFrame, valueCol: String, tieCol: String,
      nShards: Int = 32): DataFrame = {
    val bounds = df.agg(min(col(valueCol)).as("__mn"), max(col(valueCol)).as("__mx"))
    val sharded = df.crossJoin(broadcast(bounds))
      .withColumn("__shard",
        expr(s"($valueCol - __mn) div ((__mx - __mn) div $nShards + 1)"))
      .drop("__mn", "__mx")
    val wIn = Window.partitionBy("__shard")
      .orderBy(col(valueCol).desc, col(tieCol))
    val wOff = Window.partitionBy(lit(0)).orderBy(col("__shard").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sharded.groupBy("__shard")
      .agg(count(lit(1)).as("__scnt"))
      .withColumn("__off", coalesce(sum(col("__scnt")).over(wOff), lit(0L)))
      .select("__shard", "__off")
    sharded
      .withColumn("__r", row_number().over(wIn).cast("long"))
      .join(broadcast(offsets), "__shard")
      .withColumn("rnk", col("__r") + col("__off"))
      .drop("__shard", "__r", "__off")
  }
}
