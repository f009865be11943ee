package graft.queries

import graft.{Catalog, FkGraph}
import graft.operators.Subsetter
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Subsetter-derived queries — SURVEY.md §2a, the reference's own
  * operator surface re-expressed set-at-a-time. */
object CoreQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.table(s, dir, name)

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map.empty

  def oracle: Map[String, String] = Map.empty
}
