package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("backward as-of: latest right row at-or-before, per key") {
    val trades = Seq( // (id, sym, t)
      (1L, "A", 100L), (2L, "A", 205L), (3L, "B", 150L), (4L, "A", 90L))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq( // (id, sym, t, px)
      (10L, "A", 95L, 1.0), (11L, "A", 100L, 2.0), (12L, "A", 200L, 3.0),
      (13L, "B", 160L, 9.0))
      .toDF("quote_id", "sym", "qt", "px")
    val out = AsofJoin.backward(trades, quotes,
        keys = Seq("sym"), leftTime = "t", leftId = "trade_id",
        rightTime = "qt", rightId = "quote_id", valueCol = "px")
      .select($"trade_id", $"asof_px", $"asof_time")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Double]), Option(r.get(2)).map(_.asInstanceOf[Long])))
      .toMap
    assert(out(1L) == ((Some(2.0), Some(100L))))  // equal time counts (at-or-before)
    assert(out(2L) == ((Some(3.0), Some(200L))))  // most recent earlier quote
    assert(out(3L) == ((None, None)))             // B has no quote <= 150
    assert(out(4L) == ((None, None)))             // before any A quote
  }

  test("backward as-of: deterministic tie-break on equal-time right rows") {
    val l = Seq((1L, "A", 100L)).toDF("lid", "k", "t")
    val r = Seq((10L, "A", 100L, 5.0), (11L, "A", 100L, 7.0)).toDF("rid", "k", "rt", "v")
    val got = AsofJoin.backward(l, r, Seq("k"), "t", "lid", "rt", "rid", "v")
      .select($"asof_v").as[Double].head()
    assert(got == 7.0) // highest rightId wins the tie
  }
}
