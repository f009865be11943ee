package graft

import graft.operators.PrefixSum
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PrefixSumSpec extends SparkSpecBase {
  import spark.implicits._

  test("runningSum == single-partition window running sum") {
    // Sparse, uneven keys so shards get uneven populations (including
    // empty ones) — the offset join must still line up exactly.
    val df = Seq(3L -> 10L, 7L -> 5L, 20L -> 1L, 21L -> 7L, 90L -> 2L,
        91L -> 3L, 95L -> 4L, 200L -> 9L, 1000L -> 6L)
      .toDF("k", "v")
    val got = PrefixSum.runningSum(df, "k", "v", nShards = 4)
      .select("k", "cum").as[(Long, Long)].collect().toMap
    val w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("cum", sum($"v").over(w))
      .select("k", "cum").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("descRank == single-partition window rank, negative values and ties included") {
    // Negative weights (DSIR log-ratios are signed), duplicate values
    // (the tiebreak must decide), and a spread wide enough that the
    // div-before-multiply shard math sees several shards.
    val df = Seq(5L -> -300L, 9L -> 1200L, 11L -> 0L, 14L -> 1200L,
        20L -> -300L, 31L -> 999999L, 40L -> -1000000L, 55L -> 7L)
      .toDF("id", "w")
    val got = PrefixSum.descRank(df, "w", "id", nShards = 4)
      .select("id", "rnk").as[(Long, Long)].collect().toMap
    val win = Window.orderBy($"w".desc, $"id")
    val want = df.withColumn("rnk", row_number().over(win).cast("long"))
      .select("id", "rnk").as[(Long, Long)].collect().toMap
    assert(got == want)
    // degenerate spread (all values equal) stays correct: one shard,
    // rank = tiebreak order
    val flat = Seq(1L -> 5L, 2L -> 5L, 3L -> 5L).toDF("id", "w")
    val gotFlat = PrefixSum.descRank(flat, "w", "id")
      .select("id", "rnk").as[(Long, Long)].collect().toMap
    assert(gotFlat == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("runningSum spreads rows across shards (no single-partition funnel)") {
    val df = (1L to 1000L).map(i => (i, 1L)).toDF("k", "v")
    val out = PrefixSum.runningSum(df, "k", "v", nShards = 8)
    // The plan's data-bearing window partitions on the shard column:
    // rows really do land in 8 groups.
    val mx = df.agg(max($"k").as("__mx"))
    val shards = df.crossJoin(broadcast(mx))
      .select(least(expr("(k * 8) div (__mx + 1)"), lit(7L)).as("shard"))
      .distinct().count()
    assert(shards == 8L)
    // And the running total is still globally correct end-to-end.
    assert(out.agg(max($"cum")).as[Long].head() == 1000L)
  }
}
