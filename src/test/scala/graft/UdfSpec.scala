package graft

import graft.functions.{SimilarityFunctions, Udfs}
import org.apache.spark.sql.functions._

class UdfSpec extends SparkSpecBase {
  import spark.implicits._

  test("cosineUdf agrees with the codegen'd HOF cosine") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(0.5f, -1.0f, 2.0f)),
      (Array(0.1f, 0.2f, 0.3f), Array(0.1f, 0.2f, 0.3f))).toDF("a", "b")
    val rows = df.select(
      Udfs.cosineUdf($"a", $"b").as("u"),
      SimilarityFunctions.cosine(
        SimilarityFunctions.toDoubleArr($"a"),
        SimilarityFunctions.toDoubleArr($"b")).as("h"))
      .as[(Double, Double)].collect()
    rows.foreach { case (u, h) => assert(math.abs(u - h) < 1e-12) }
  }

  test("MomentsAgg: mean/variance match a manual computation, across partitions") {
    val xs = Seq(2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0)
    val df = xs.toDF("x").repartition(4) // force partial+merge path
    val (n, mean, variance) = df.agg(Udfs.moments($"x").as("m"))
      .select($"m._1", $"m._2", $"m._3").as[(Long, Double, Double)].head()
    assert(n == 8L)
    assert(math.abs(mean - 5.0) < 1e-12)
    assert(math.abs(variance - 4.0) < 1e-9) // population variance of the classic example
  }

  test("moments zero/one-element groups are well-defined") {
    val df = Seq((1, 3.5)).toDF("g", "x")
    val (n, mean, v) = df.groupBy("g").agg(Udfs.moments($"x").as("m"))
      .select($"m._1", $"m._2", $"m._3").as[(Long, Double, Double)].head()
    assert(n == 1L && mean == 3.5 && v == 0.0)
  }
}
