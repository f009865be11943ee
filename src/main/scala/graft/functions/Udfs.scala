package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** UDF / UDAF demonstrations — SURVEY.md §2b "UDF / UDAF / UDTF".
  *
  * Policy (and why most of the engine avoids these): built-in functions
  * and HOFs are codegen'd inside whole-stage codegen; a Scala UDF is an
  * opaque lambda that breaks codegen and forces ser/de per row. These
  * exist to cover the capability (and benchmark the gap) — the hot
  * paths use the HOF equivalents in SimilarityFunctions/TextFunctions.
  * UDTF-shaped work is covered by explode/posexplode/flatMap.
  */
object Udfs {

  /** Scala-UDF cosine — the slow path; SimilarityFunctions.cosine is
    * the codegen'd equivalent. Kept for the UDF-vs-HOF microbenchmark
    * in UdfSpec. */
  val cosineUdf = udf { (a: Seq[Float], b: Seq[Float]) =>
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Welford running moments — numerically stable mean/variance. */
  final case class Moments(n: Long, mean: Double, m2: Double) {
    def add(x: Double): Moments = {
      val n1 = n + 1
      val d = x - mean
      val mean1 = mean + d / n1
      Moments(n1, mean1, m2 + d * (x - mean1))
    }
    def merge(o: Moments): Moments =
      if (n == 0) o
      else if (o.n == 0) this
      else {
        val nT = n + o.n
        val d = o.mean - mean
        Moments(nT, mean + d * o.n / nT, m2 + o.m2 + d * d * n * o.n / nT)
      }
    def variance: Double = if (n < 2) 0.0 else m2 / n
  }

  /** Typed UDAF (Aggregator): per-group moments of a double column.
    * Partial aggregation (add) runs map-side; merge combines partials —
    * the same two-phase shape as built-in aggregates, so one shuffle of
    * O(groups) rows at any scale. */
  class MomentsAgg extends Aggregator[Double, Moments, (Long, Double, Double)] {
    def zero: Moments = Moments(0L, 0.0, 0.0)
    def reduce(b: Moments, a: Double): Moments = b.add(a)
    def merge(b1: Moments, b2: Moments): Moments = b1.merge(b2)
    def finish(r: Moments): (Long, Double, Double) = (r.n, r.mean, r.variance)
    def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
    def outputEncoder: Encoder[(Long, Double, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaDouble)
  }

  /** Column form of the moments UDAF. */
  def moments(c: Column): Column = udaf(new MomentsAgg).apply(c)
}
