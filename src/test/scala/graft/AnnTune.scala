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
      // (planes, tables, probeH, maxCand, fpBits)
      (8, 12, 1, 1000000, 128),  // candidate-gen ceiling at current config
      (8, 12, 1, 256, 128),      // current production point
      (8, 12, 1, 256, 256),      // wider fingerprint, same budget
      (8, 12, 1, 512, 256),      // 2x budget
      (8, 12, 2, 1000000, 128),  // multiprobe-2 ceiling
      (8, 12, 2, 256, 256),
      (8, 12, 2, 512, 256),
      (8, 16, 2, 512, 256),
      (8, 16, 2, 512, 384),
      // r12 auto-plane points: autoPlanes(50k)=11, autoPlanes(500k)=14
      (11, 12, 2, 1000000, 256), // auto candidate-gen ceiling
      (11, 12, 2, 256, 256),     // auto @ production budget
      (11, 12, 2, 512, 256),
      (11, 12, 3, 256, 256),     // deeper multiprobe vs narrower buckets
      (14, 12, 2, 256, 256),
      (14, 12, 3, 512, 256))
    for ((p, t, h, m, fb) <- grid) {
      val t0 = System.nanoTime()
      val ann = SimilarityFunctions.annLshTopK(q, e, 10,
        nPlanes = p, nTables = t, probeHamming = h, maxCandidates = m,
        fpBits = fb)
        .select("qid", "cid").localCheckpoint(true)
      val hits = ann.join(brute, Seq("qid", "cid")).count()
      val dt = (System.nanoTime() - t0) / 1e9
      val recall = hits.toDouble / brutePairs
      println(f"planes=$p tables=$t probeH=$h maxCand=$m fpBits=$fb recall=$recall%.3f t=$dt%.1fs")
    }
    for ((k, nprobe, m, fb) <- Seq(
        (16, 10, 256, 128), (16, 10, 256, 256), (16, 10, 512, 256),
        (16, 12, 512, 256), (16, 12, 512, 384))) {
      val t0 = System.nanoTime()
      val ivf = SimilarityFunctions.annIvfTopK(q, e, 10, k = k,
        nprobe = nprobe, maxCandidates = m, fpBits = fb)
        .select("qid", "cid").localCheckpoint(true)
      val hits = ivf.join(brute, Seq("qid", "cid")).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"ivf k=$k nprobe=$nprobe maxCand=$m fpBits=$fb recall=${hits.toDouble / brutePairs}%.3f t=$dt%.1fs")
    }
    spark.stop()
  }
}
