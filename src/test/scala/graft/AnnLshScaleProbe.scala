package graft

import graft.functions.SimilarityFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: time (not recall) of the LSH ANN tier at a rung, fixed-8
  * planes vs the auto knob — quantifies what `annLshTopKAuto` buys back
  * when fixed-plane occupancy saturates (BENCH_sf10_r13 measured the
  * declared fixed-8 query at 19x its sf3 time). Recall ceilings for the
  * sharper planes are the AnnTune grid's result (0.995/0.845/0.47 at
  * 8/11/14 planes on isotropic geometry) — this probe adds the TIME
  * side of that trade at the saturated scale.
  *
  * Usage: `Test/runMain graft.AnnLshScaleProbe <dir>`.
  */
object AnnLshScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("target/gen/sf10")
    val spark = SparkSession.builder().master("local[32]").appName("ann-lsh-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Catalog.table(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") % 100 === 0)
    val n = graft.sources.Sources.footerRowCount(spark, s"$dir/embeddings.parquet")
    for (label <- Seq("auto", "fixed8")) {
      val t0 = System.nanoTime()
      val df =
        if (label == "auto")
          SimilarityFunctions.annLshTopKAuto(q, e, 10, knownN = Some(n))
        else SimilarityFunctions.annLshTopK(q, e, 10)
      val rows = df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"""{"dir":"$dir","n":$n,"variant":"$label","rows":$rows,"sec":$dt%.1f}""")
      graft.plans.Checkpoints.clearAll(spark)
    }
    spark.stop()
  }
}
