package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r13 VERDICT item 2): ConnectedComponents' cost slope in
  * |E| on a SPARSE planted pair graph — the shape a real exact-deduped
  * corpus has — separated from pair GENERATION, which is what actually
  * grew ~quadratically on the dense-geometry sf10 fixture (the operator
  * itself is O(|E| log d) per round). Pairs are materialized (eager
  * localCheckpoint) before the CC timer starts, so `cc_sec` times label
  * propagation alone.
  *
  * Usage: `Test/runMain graft.ComponentsSparseProbe <dir1> [dir2 ...]`
  * where each dir holds a planted `documents.parquet`
  * (`runMain graft.GenData docs-planted <n> <dir> [dupEvery]`).
  */
object ComponentsSparseProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("target/gen/sparse50k")
    val spark = SparkSession.builder().master("local[32]").appName("cc-sparse-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- dirs) {
      graft.sources.Sources.calibrateScanSplit(spark, dir, tables = Seq("documents"))
      val d = Catalog.table(spark, dir, "documents")
      val n = graft.sources.Sources.footerRowCount(spark, s"$dir/documents.parquet")
      val t0 = System.nanoTime()
      val pairs = graft.functions.SimilarityFunctions.jaccardPairs(d, 0.5)
        .select(col("ida").as("src"), col("idb").as("dst"))
        .localCheckpoint(true)
      val nE = pairs.count()
      val pairsSec = (System.nanoTime() - t0) / 1e9
      val nodes = d.select(col("doc_id").as("id"))
      val t1 = System.nanoTime()
      val cc = graft.operators.ConnectedComponents.components(nodes, pairs)
        .localCheckpoint(true)
      val nRows = cc.count()
      val ccSec = (System.nanoTime() - t1) / 1e9
      val nGroups = cc.groupBy("component").count()
        .filter(col("count") > 1).count()
      println(f"""{"dir":"$dir","n_docs":$n,"edges":$nE,"pairs_sec":$pairsSec%.1f,"cc_sec":$ccSec%.1f,"rows":$nRows,"multi_groups":$nGroups}""")
      graft.plans.Checkpoints.clearAll(spark)
    }
    spark.stop()
  }
}
