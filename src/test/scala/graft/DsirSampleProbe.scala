package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage-level timing of text_dsir_sample — training memo,
  * scored-relation checkpoint, descRank, full query. */
object DsirSampleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("target/gen/sf1")
    val spark = SparkSession.builder().master("local[32]").appName("dsir-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    t("train (dsirCountsCapped)") {
      graft.queries.TextQueries.dsirCountsCapped(spark, dir, 50000)
    }
    val (_, w) = graft.queries.TextQueries.dsirCols(spark, dir)
    val d = Catalog.table(spark, dir, "documents")
    val scored0 = d.select(col("doc_id"), w.as("dsir_q6"))
    t("score only (count)") { scored0.count() }
    val scored = t("checkpoint scored") { scored0.localCheckpoint(true) }
    t("descRank over checkpointed (count)") {
      graft.operators.PrefixSum.descRank(scored, "dsir_q6", "doc_id").count()
    }
    t("full dsirSample (count)") {
      graft.queries.TextQueries.dsirSample(spark, dir).count()
    }
    t("full dsirSample again") {
      graft.queries.TextQueries.dsirSample(spark, dir).count()
    }
    spark.stop()
  }
}
