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
}
