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

  test("descRank: near-constant value column spreads across tie-range shards") {
    // r14 verdict item 5: equal-width value shards degrade to ONE
    // populated shard when one value carries most rows — the exact
    // shape a post-dedup DSIR weight column produces. The quantile
    // cut points must detect the heavy value (it swallows repeated
    // percentile slots) and sub-split it by tieCol, so the data-scale
    // window never sees the full relation in one partition. The RESULT
    // is shard-independent, so the plain-window oracle is unchanged.
    val n = 2000
    val df = (1 to n).map { i =>
      // 95% of rows at weight 7, the rest spread
      (i.toLong, if (i % 20 == 0) 1000L + i else 7L)
    }.toDF("id", "w")
    val sharded = PrefixSum.descRankSharded(df, "w", "id", nShards = 8)
    val got = sharded.select("id", "rnk").as[(Long, Long)].collect().toMap
    val win = Window.orderBy($"w".desc, $"id")
    val want = df.withColumn("rnk", row_number().over(win).cast("long"))
      .select("id", "rnk").as[(Long, Long)].collect().toMap
    assert(got == want, "ranks must equal the single-partition window oracle")
    // the no-funnel property itself: the constant-weight rows (95% of
    // the relation) must be spread over SEVERAL populated shards — the
    // conditional tie-quantile sub-split, not one data-scale window
    val heavyShards = sharded.filter($"w" === 7L)
      .select("__shard").distinct().count()
    assert(heavyShards > 1,
      s"heavy value funneled through $heavyShards shard(s)")
    // and shards are usefully balanced: no shard holds > half the rows
    val maxShard = sharded.groupBy("__shard").count()
      .agg(max($"count")).as[Long].head()
    assert(maxShard <= n / 2, s"largest shard holds $maxShard of $n rows")
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
