package graft

// Throwaway dev probe (not part of the library, never committed):
// runs SparkEntry queries by name with a stage/task-metrics listener.
// Usage: tools/run_graft.sh graft.DevProbe <sfDir> <key> [key ...]
object DevProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val keys = args.tail.toSeq
    val s = GraftSession.local("dev-probe")
    graft.sources.Sources.calibrateScanSplit(s, dir)
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null && m.executorRunTime > 500)
          println(f"TASK stage=${e.stageId}%4d run=${m.executorRunTime}%6d ms cpu=${m.executorCpuTime / 1000000}%6d ms gc=${m.jvmGCTime}%5d ms")
      }
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val secs = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        if (secs > 0.5)
          println(f"STAGE ${si.stageId}%4d ${secs}%7.2f s  tasks=${si.numTasks}%4d  ${si.name.take(90)}%s")
      }
    })
    keys.foreach { k =>
      val t0 = System.nanoTime()
      val df =
        if (k == "sub:pretrain_gated") graft.queries.TextQueries.pretrainGatedDedup(s, dir)
        else if (k == "sub:cc_path") {
          import org.apache.spark.sql.functions._
          val n = 4096
          val nodes = s.range(1, n + 1).select(col("id"))
          val edges = s.range(1, n.toLong).select(col("id").as("src"),
            (col("id") + 1).as("dst"))
          graft.operators.ConnectedComponents.components(nodes, edges)
        }
        else SparkEntry.queries(k)(s, dir)
      val n = df.count()
      println(f"QUERY $k ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      // GRAFT_PROBE_PLAN=1: the EXECUTED plan (post-AQE — shows
      // ReusedExchange/AQEShuffleRead decisions explain() can't)
      if (sys.env.getOrElse("GRAFT_PROBE_PLAN", "0") == "1")
        println(df.queryExecution.executedPlan.toString)
    }
    s.stop()
  }
}
