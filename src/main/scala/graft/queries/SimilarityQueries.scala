package graft.queries

import graft.Catalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity / dedup queries over `documents` and `embeddings` —
  * north_star extensions. */
object SimilarityQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.table(s, dir, name)

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map.empty

  def oracle: Map[String, String] = Map.empty
}
