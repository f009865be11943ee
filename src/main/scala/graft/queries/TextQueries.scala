package graft.queries

import graft.Catalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis queries over `documents` — north_star extensions. */
object TextQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.table(s, dir, name)

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map.empty

  def oracle: Map[String, String] = Map.empty
}
