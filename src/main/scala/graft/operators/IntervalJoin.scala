package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Overlap join of two INTERVAL relations — the temporal-join shape
  * Spark has no native operator for (sessions x incident windows,
  * validity intervals x validity intervals, ...). A naive formulation
  * is a pure theta join (`l.start <= r.end AND r.start <= l.end`),
  * which Spark can only execute as a BroadcastNestedLoopJoin — |L|x|R|
  * comparisons, a non-starter when both sides are large.
  *
  * This is the classic BIN JOIN: each interval explodes into the
  * fixed-width time buckets it spans, the join runs as a HASH join on
  * the bucket id with the overlap predicate as a residual, and two
  * overlapping intervals are guaranteed to meet (they share every
  * bucket their intersection touches). Candidate volume is
  * sum-per-bucket |L_b| x |R_b| — locality-bounded instead of
  * quadratic, and both sides shuffle ONCE on the bucket key.
  *
  * Exactly-once emission without a distinct: a pair sharing k buckets
  * would surface k times, so each pair is emitted only in its FIRST
  * shared bucket — `bucket == max(bucketOf(l.start), bucketOf(r.start))`,
  * which both sides' exploded ranges contain whenever the intervals
  * overlap. That predicate is part of the join condition, so the
  * dedup costs zero extra shuffles (the `distinct()` a naive bin join
  * needs would re-shuffle the entire result).
  *
  * `bucketSeconds` trades fan-out for bucket occupancy: each interval
  * produces `ceil(len/bucket)+1` rows, while a bucket's candidate cost
  * grows with the number of intervals alive in it — pick it near the
  * typical interval length (the interval-join literature's rule).
  * Endpoints are CLOSED-interval epoch seconds (non-negative).
  */
object IntervalJoin {

  /** `keys` adds equi columns (leftCol, rightCol) to the join key next
    * to the bucket id — the usual production shape (sessions join the
    * SAME user's incident windows, not the whole fleet's). Besides
    * correctness this is the scale lever: with a global right side the
    * OUTPUT itself grows as |L_b| x |R_b| per bucket, while an equi key
    * keeps it linear in the keyed groups. */
  def overlapJoin(left: DataFrame, right: DataFrame,
                  lStart: String, lEnd: String,
                  rStart: String, rEnd: String,
                  bucketSeconds: Long,
                  keys: Seq[(String, String)] = Nil): DataFrame = {
    require(bucketSeconds > 0)
    // the internal bucket column must not shadow a caller column — a
    // pre-existing __b would be silently overwritten, then dropped from
    // the output (ADVICE r16)
    require(!left.columns.contains("__b") && !right.columns.contains("__b"),
      "overlapJoin reserves the internal column name __b; rename it on the input")
    val b = lit(bucketSeconds)
    def bucketOf(c: org.apache.spark.sql.Column) = floor(c / b).cast("long")
    def exploded(df: DataFrame, s: String, e: String) =
      df.withColumn("__b",
        explode(sequence(bucketOf(col(s)), bucketOf(col(e)))))
    val l = exploded(left, lStart, lEnd).as("l")
    val r = exploded(right, rStart, rEnd).as("r")
    val keyConds = keys.map { case (lc, rc) => col(s"l.$lc") === col(s"r.$rc") }
    l.join(r,
        (keyConds :+ (col("l.__b") === col("r.__b")) :+
          (col(s"l.$lStart") <= col(s"r.$rEnd")) :+
          (col(s"r.$rStart") <= col(s"l.$lEnd")) :+
          (col("l.__b") === greatest(bucketOf(col(s"l.$lStart")),
            bucketOf(col(s"r.$rStart"))))).reduce(_ && _))
      .drop("__b")
  }
}
