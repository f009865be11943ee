package graft

import graft.sources.Sources

/** Co-located joins via bucketing — the shuffle-elimination technique
  * the 100 TB deployment leans on: bucket the fact tables on their join
  * key ONCE at ingest, and every subsequent key-equi join or
  * aggregation runs with zero Exchange. */
class BucketedJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("same-bucketing equi join runs with ZERO Exchange; result matches shuffled join") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    Sources.writeBucketed(orders, "b_orders", 8, Seq("o_orderkey"))
    Sources.writeBucketed(lineitem, "b_lineitem", 8, Seq("l_orderkey"))

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the plan must prove bucket co-location,
      // not hide behind a broadcast of the small fixture
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("b_orders")
        .join(spark.table("b_lineitem"), $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderkey").count()
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$p")

      // same rows as the plain (shuffling) join
      val expect = orders.join(lineitem, $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderkey").count()
        .as[(Long, Long)].collect().toSet
      assert(j.as[(Long, Long)].collect().toSet == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
