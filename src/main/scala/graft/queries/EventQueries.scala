package graft.queries

import graft.Catalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-stream queries (batch equivalents of the streaming surface) —
  * range/as-of joins, tumbling windows, sessionization. */
object EventQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.table(s, dir, name)

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map.empty

  def oracle: Map[String, String] = Map.empty
}
