package graft

import graft.functions.SimilarityFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc parameter sweep for the hyperplane-LSH ANN tier: prints
  * recall@10 vs brute force and the mean per-query candidate count for
  * a grid of (nPlanes, nTables, probeHamming, maxCandidates) on real
  * driver testdata. Dev tool, not a spec — run with
  * `sbt "Test/runMain graft.AnnTune [sfDir]"`. */
object AnnTune {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("ann-tune")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Catalog.table(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") % 100 === 0)
    val nQ = q.count()
    val nC = e.count()
    val brute = SimilarityFunctions.cosineTopK(q, e, 10)
      .select("qid", "cid").localCheckpoint(true)
    val brutePairs = brute.count()
    println(s"corpus=$nC queries=$nQ brute_pairs=$brutePairs")
    val grid = Seq(
      (8, 12, 1, 1000000), (8, 12, 1, 256), (8, 12, 2, 1000000))
    for ((p, t, h, m) <- grid) {
      val ann = SimilarityFunctions.annLshTopK(q, e, 10,
        nPlanes = p, nTables = t, probeHamming = h, maxCandidates = m)
        .select("qid", "cid").localCheckpoint(true)
      val hits = ann.join(brute, Seq("qid", "cid")).count()
      // candidate count before the exact-verify cap: re-derive via hits cap = huge
      val recall = hits.toDouble / brutePairs
      println(f"planes=$p tables=$t probeH=$h maxCand=$m recall=$recall%.3f")
    }
    for ((k, nprobe) <- Seq((8, 2), (8, 3), (16, 4))) {
      val ivf = SimilarityFunctions.annIvfTopK(q, e, 10, k = k, nprobe = nprobe)
        .select("qid", "cid").localCheckpoint(true)
      val hits = ivf.join(brute, Seq("qid", "cid")).count()
      println(f"ivf k=$k nprobe=$nprobe recall=${hits.toDouble / brutePairs}%.3f")
    }
    spark.stop()
  }
}
