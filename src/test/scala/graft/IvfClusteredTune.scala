package graft

import graft.functions.SimilarityFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev sweep for the CLUSTERED ANN rung (r12 VERDICT item 3): measures
  * IVF recall@10 at a FIXED nprobe across clustered corpora of growing
  * n. On clustered geometry the claim under test is that the probed
  * fraction nprobe/k SHRINKS as n grows (k ≈ √n) while recall holds
  * ≥ 0.9 — i.e. k ≈ √n probing is genuinely sublinear AT recall, which
  * the isotropic driver fixture cannot show (there, candidate-gen
  * recall ≈ probed fraction by construction).
  *
  * Usage: `Test/runMain graft.IvfClusteredTune <dir1> <dir2> ...` where
  * each dir holds a clustered `embeddings.parquet`
  * (`runMain graft.GenData emb-clustered <n> <dir>`).
  * Prints one JSON line per (dir, nprobe) point.
  */
object IvfClusteredTune {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]").appName("ivf-clustered-tune")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      val e = Catalog.table(spark, dir, "embeddings")
      val q = e.filter(col("vec_id") % 100 === 0)
      val brute = SimilarityFunctions.cosineTopK(q, e, 10)
        .select("qid", "cid").localCheckpoint(true)
      val brutePairs = brute.count()
      val nC = e.count()
      val k = math.ceil(math.sqrt(nC.toDouble)).toInt
      for (nprobe <- Seq(8, 12)) {
        val t0 = System.nanoTime()
        val ivf = SimilarityFunctions
          .annIvfTopK(q, e, 10, k = k, nprobe = nprobe)
          .select("qid", "cid").localCheckpoint(true)
        val hits = ivf.join(brute, Seq("qid", "cid")).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"""{"dir":"$dir","n":$nC,"k":$k,"nprobe":$nprobe,""" +
          f""""probed_frac":${nprobe.toDouble / k}%.4f,""" +
          f""""recall_at_10":${hits.toDouble / brutePairs}%.4f,"sec":$dt%.1f}""")
      }
      graft.plans.Checkpoints.clearAll(spark)
    }
    spark.stop()
  }
}
