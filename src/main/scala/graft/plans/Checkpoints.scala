package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Storage hygiene for `localCheckpoint`-materialized intermediates.
  *
  * Every `localCheckpoint` persists its partitions (MEMORY_AND_DISK) and
  * nothing ever frees them: a long-lived session accumulates the blocks
  * of every query it has run, and on a shared cluster those blocks crowd
  * out the working set of the CURRENT query (observed here as 2-5x
  * per-query bench variance between identical-code runs). Two remedies:
  *
  *   - [[unpersist]] — targeted: free the blocks of one superseded
  *     checkpoint (e.g. the previous round of an iterative loop) the
  *     moment its successor is materialized;
  *   - [[clearAll]] — scope-level: free every persisted RDD in the
  *     session, for harnesses (Bench/Verify) at query boundaries where
  *     no cross-query reuse exists by construction.
  *
  * Safety: unpersisting a local checkpoint removes its ONLY copy (the
  * lineage was truncated), so callers must guarantee the DataFrame is
  * dead — which is exactly the loop-supersession and query-boundary
  * cases above and nothing subtler.
  */
object Checkpoints {

  /** Free the persisted blocks behind `df`, which must be the direct
    * result of a `localCheckpoint` call (its analyzed plan is the
    * `LogicalRDD` wrapping the persisted partitions). No-op on plans
    * with no materialized RDD. Non-blocking. */
  def unpersist(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case r: LogicalRDD => r.rdd.unpersist(blocking = false)
      case _ =>
    }

  /** Free EVERY persisted RDD in the session — checkpoint blocks of
    * completed queries included. Call only at boundaries where nothing
    * persisted is live (between independent queries in Bench/Verify). */
  def clearAll(spark: SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
}
