package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    * [[runningSum]]'s shape applied to the VALUE axis: shard the key
    * space along the sort order, per-shard `row_number` with an
    * ordinary partitioned window, then offset each shard by the row
    * count of every earlier shard (an nShards-row window —
    * driver-scale). Nothing funnels the data through one task, unlike
    * the naive empty-`partitionBy` rank window.
    *
    * Shard bounds are QUANTILE-derived (r14 verdict item 5 — the
    * production escalation the equal-width version only named): one
    * map-side-combined `approx_percentile` pass yields nShards-1
    * value-axis cut points, so shard POPULATIONS are near-balanced on
    * any spread, not just a uniform one. The degenerate corpus the
    * equal-width math funnels — one value carrying most rows, which a
    * post-dedup DSIR weight column really produces — shows up as a
    * REPEATED quantile value; each such heavy value is sub-split by a
    * second conditional-quantile pass over `tieCol` restricted to that
    * value (one agg, one column per heavy value, ≤ nShards of them),
    * so even a 100%-constant column spreads across nShards tie-range
    * shards. Cut points are composite (value, tie) thresholds and
    * shard assignment is a ≤ nShards-term monotone comparison chain —
    * scan-local, codegen-friendly, exact integer compares.
    *
    * `valueCol` may be negative; `tieCol` must be distinct for a
    * deterministic total order; both BIGINT. The two boundary aggs
    * collect O(nShards) scalars to the driver (the bounded-collect
    * pattern the IVF centroids use). approx_percentile's merge is not
    * bitwise order-stable across runs, but the RESULT is
    * shard-independent — any monotone cut set yields identical ranks —
    * so an oracle can use a plain `row_number() OVER (ORDER BY ...)`. */
  def descRank(df: DataFrame, valueCol: String, tieCol: String,
      nShards: Int = 32): DataFrame =
    descRankSharded(df, valueCol, tieCol, nShards).drop("__shard")

  /** [[descRank]] with the internal `__shard` column retained, so the
    * no-funnel property (every heavy value spread over > 1 populated
    * shard) is spec-assertable — PrefixSumSpec reads it directly. */
  private[graft] def descRankSharded(df: DataFrame, valueCol: String,
      tieCol: String, nShards: Int): DataFrame = {
    val v = col(valueCol)
    val t = col(tieCol)
    // pass 1: value-axis quantiles (nShards-1 interior cut points)
    val probs = (1 until nShards).map(_.toDouble / nShards)
    val q0 = df.agg(
      percentile_approx(v, typedlit(probs), lit(10000)).as("q")).head()
    val qs: Seq[Long] =
      if (q0.isNullAt(0)) Seq.empty else q0.getSeq[Long](0)
    // a value swallowing >= 2 quantile slots carries >= 1/nShards of
    // the rows — sub-split its rows by tieCol into that many ranges
    val byVal: Seq[(Long, Int)] = qs.groupBy(identity).view
      .mapValues(_.size).toSeq.sortBy(-_._1) // distinct values, DESC
    val heavy: Map[Long, Seq[Long]] = {
      val hs = byVal.collect { case (hv, k) if k >= 2 => (hv, k) }
      if (hs.isEmpty) Map.empty
      else {
        val aggs = hs.map { case (hv, k) =>
          val tp = (1 until k).map(_.toDouble / k)
          percentile_approx(when(v === hv, t), typedlit(tp), lit(10000))
            .as(s"__t$hv")
        }
        val r = df.agg(aggs.head, aggs.tail: _*).head()
        hs.zipWithIndex.map { case ((hv, _), i) =>
          hv -> (if (r.isNullAt(i)) Seq.empty[Long] else r.getSeq[Long](i))
        }.toMap
      }
    }
    // composite cut points in SORT order (value desc, tie asc): a row
    // is AFTER pure cut (cv) iff v <= cv, and AFTER tie cut (cv, ct)
    // iff v < cv || (v == cv && t > ct). Shard = #cuts the row is
    // after — each predicate is monotone along the sort order, so the
    // count is too, which is all the offset math needs.
    val cuts: Seq[Column] = byVal.flatMap { case (cv, k) =>
      val enter = (v <= cv): Column
      enter +: heavy.getOrElse(cv, Seq.empty).sorted.reverseIterator
        .map(ct => (v < cv) || (v === cv && t > ct)).toSeq
    }
    val shardExpr =
      if (cuts.isEmpty) lit(0) // empty df / single-value quantile-free
      else cuts.map(c => when(c, 1).otherwise(0)).reduce(_ + _)
    val sharded = df.withColumn("__shard", shardExpr)
    val wIn = Window.partitionBy("__shard")
      .orderBy(v.desc, t)
    // shard 0 holds the TOP of the desc order, so offsets accumulate
    // ascending; the window ranges over <= nShards aggregate rows
    val wOff = Window.partitionBy(lit(0)).orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sharded.groupBy("__shard")
      .agg(count(lit(1)).as("__scnt"))
      .withColumn("__off", coalesce(sum(col("__scnt")).over(wOff), lit(0L)))
      .select("__shard", "__off")
    sharded
      .withColumn("__r", row_number().over(wIn).cast("long"))
      .join(broadcast(offsets), "__shard")
      .withColumn("rnk", col("__r") + col("__off"))
      .drop("__r", "__off")
  }
}
