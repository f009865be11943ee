package graft

import org.apache.spark.sql.SparkSession

/** Quick dev check: dedup_cosine_pairs row counts per SF after plane
  * generator changes. `sbt "Test/runMain graft.CosCheck"`. */
object CosCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .appName("cos-check")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val n = graft.queries.SimilarityQueries
        .dedupCosinePairs(spark, s"/root/testdata/$sf").count()
      println(s"$sf dedup_cosine_pairs rows=$n")
    }
    spark.stop()
  }
}
