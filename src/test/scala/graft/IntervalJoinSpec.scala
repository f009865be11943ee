package graft

import graft.operators.IntervalJoin
import org.apache.spark.sql.functions._

/** Bin-join overlap semantics: the bucketed hash-join formulation must
  * equal the naive theta join exactly — no pair lost at any bucket
  * boundary, no pair emitted twice (the first-shared-bucket predicate
  * replaces a distinct). */
class IntervalJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def naive(l: Seq[(Long, Long, Long)], r: Seq[(Long, Long, Long)]) =
    (for {
      (lid, ls, le) <- l
      (rid, rs, re) <- r
      if ls <= re && rs <= le
    } yield (lid, rid)).sorted

  test("hand-picked boundary cases: touching endpoints, containment, bucket-spanning") {
    val l = Seq( // (id, start, end)
      (1L, 0L, 10L),       // inside bucket 0
      (2L, 95L, 205L),     // spans buckets 0..2 (bucket = 100)
      (3L, 300L, 300L),    // zero-length
      (4L, 400L, 999L))    // long interval
    val r = Seq(
      (10L, 10L, 20L),     // touches #1 at exactly 10 (closed -> overlap)
      (11L, 100L, 110L),   // inside #2
      (12L, 206L, 300L),   // touches #3, just misses #2 (205 < 206)
      (13L, 0L, 1000L))    // covers everything
    val out = IntervalJoin.overlapJoin(
        l.toDF("lid", "ls", "le"), r.toDF("rid", "rs", "re"),
        "ls", "le", "rs", "re", bucketSeconds = 100L)
      .select($"lid", $"rid").as[(Long, Long)].collect().toSeq.sorted
    assert(out == naive(l, r), s"binned=$out naive=${naive(l, r)}")
    // and exactly-once: no pair may appear twice
    assert(out.distinct == out)
  }

  test("equi keys restrict pairs to matching key groups") {
    val l = Seq((1L, 7L, 0L, 100L), (2L, 8L, 0L, 100L))
      .toDF("lid", "lk", "ls", "le")
    val r = Seq((10L, 7L, 50L, 60L), (11L, 8L, 50L, 60L), (12L, 9L, 50L, 60L))
      .toDF("rid", "rk", "rs", "re")
    val out = IntervalJoin.overlapJoin(l, r, "ls", "le", "rs", "re",
        bucketSeconds = 10L, keys = Seq("lk" -> "rk"))
      .select($"lid", $"rid").as[(Long, Long)].collect().toSeq.sorted
    // every interval pair overlaps in time; only same-key pairs emit
    assert(out == Seq((1L, 10L), (2L, 11L)))
  }

  test("property: binned == naive on random interval sets at several bucket widths") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { trial =>
      val l = (1 to 60).map { i =>
        val s = rnd.nextInt(2000).toLong
        (i.toLong, s, s + rnd.nextInt(300))
      }
      val r = (1 to 60).map { i =>
        val s = rnd.nextInt(2000).toLong
        (1000L + i, s, s + rnd.nextInt(300))
      }
      Seq(1L, 37L, 100L, 5000L).foreach { bucket =>
        val out = IntervalJoin.overlapJoin(
            l.toDF("lid", "ls", "le"), r.toDF("rid", "rs", "re"),
            "ls", "le", "rs", "re", bucket)
          .select($"lid", $"rid").as[(Long, Long)].collect().toSeq.sorted
        assert(out == naive(l, r), s"trial $trial bucket $bucket diverged")
        assert(out.distinct == out, s"trial $trial bucket $bucket emitted dups")
      }
    }
  }
}
