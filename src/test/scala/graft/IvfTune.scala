package graft

import graft.functions.SimilarityFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev sweep: IVF recall + mean scored-candidate budget per query. */
object IvfTune {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]").appName("ivf-tune")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Catalog.table(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") % 100 === 0)
    val brute = SimilarityFunctions.cosineTopK(q, e, 10)
      .select("qid", "cid").localCheckpoint(true)
    val brutePairs = brute.count()
    val nQ = q.count(); val nC = e.count()
    println(s"corpus=$nC queries=$nQ")
    for ((k, nprobe, iters) <- Seq((16,8,3), (16,10,3), (16,12,3), (8,5,3), (8,6,3), (32,20,3), (16,10,6))) {
      val t0 = System.nanoTime()
      val ivf = SimilarityFunctions.annIvfTopK(q, e, 10, k = k, nprobe = nprobe, iters = iters)
        .select("qid", "cid").localCheckpoint(true)
      val hits = ivf.join(brute, Seq("qid", "cid")).count()
      val dt = (System.nanoTime() - t0) / 1e9
      val budget = nC.toDouble * nprobe / k  // approx (uniform cells)
      println(f"ivf k=$k nprobe=$nprobe iters=$iters recall=${hits.toDouble / brutePairs}%.3f approx_budget=$budget%.0f t=$dt%.1fs")
    }
    spark.stop()
  }
}
