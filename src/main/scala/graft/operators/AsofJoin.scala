package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of join: for every left row, the most recent right row
  * at-or-before it (backward direction) with matching keys.
  *
  * Implemented as the scalable union-merge rather than a per-row
  * subquery or an O(|L|*|R|) self-join: tag both inputs, ONE window
  * pass per key ordered by (time, tag, tiebreak) — right rows sort
  * before left rows at equal times, so a running `max(right time so
  * far)` (or any `last_value` of a carried payload) at a left row IS
  * the as-of match. Cost: one shuffle on the keys, state linear in the
  * partition — the same shape Flink/KDB-style asof joins use, and the
  * only shape that survives 100 TB event tables.
  *
  * Times are compared as given — pass whole-second epochs
  * (queries.Det.epochS) when oracle parity matters.
  */
object AsofJoin {

  /** Backward as-of: returns the left rows plus `asof_<valueCol>` (the
    * right row's value at-or-before, NULL when none) and
    * `asof_time` (the matched right time, NULL when none). Ties among
    * equal-time right rows break by highest `rightId` — deterministic.
    *
    * @param left      probe side; must contain `keys`, `leftTime`, and a
    *                  unique numeric `leftId` for deterministic ordering
    * @param right     reference side; must contain `keys`, `rightTime`,
    *                  `valueCol`, and a unique numeric `rightId`
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      leftId: String,
      rightTime: String,
      rightId: String,
      valueCol: String): DataFrame = {

    val lCols = left.columns
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(1))
      .withColumn("__rv", lit(null).cast(right.schema(valueCol).dataType))
      .withColumn("__rt", lit(null).cast(right.schema(rightTime).dataType))
      .withColumn("__ord", col(leftId).cast("long"))
    val r = right
      .select(keys.map(col) :+ col(rightTime).as("__t") :+ col(valueCol).as("__rv") :+
        col(rightId).cast("long").as("__ord"): _*)
      .withColumn("__tag", lit(0))
      .withColumn("__rt", col("__t"))
    // align schemas: left columns absent on the right become NULL
    val rAligned = lCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__tag"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(rAligned)
      .withColumn("__asof_v", last(when(col("__tag") === 0, col("__rv")), ignoreNulls = true).over(w))
      .withColumn("__asof_t", max(when(col("__tag") === 0, col("__rt"))).over(w))
      .filter(col("__tag") === 1)
      .select(lCols.map(col) :+ col("__asof_v").as(s"asof_$valueCol") :+
        col("__asof_t").as("asof_time"): _*)
  }
}
