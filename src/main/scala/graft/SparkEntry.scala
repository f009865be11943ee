package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory of SURVEY.md §2 (one entry per
  * implemented operator); `oracleSql` carries the DuckDB-equivalent SQL
  * for every oracle-checkable query, obeying the §7 determinism
  * contract (total order, decimal-first money math, no timestamps in
  * outputs, no engine-specific hashes).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.aggPricingSummary(spark, "/root/testdata/sf0.001")

  private def modules = Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])](
    (RelationalQueries.defs, RelationalQueries.oracle),
    (CoreQueries.defs, CoreQueries.oracle),
    (TextQueries.defs, TextQueries.oracle),
    (SimilarityQueries.defs, SimilarityQueries.oracle),
    (EventQueries.defs, EventQueries.oracle),
    (MultimodalQueries.defs, MultimodalQueries.oracle),
    (ProfileQueries.defs, ProfileQueries.oracle),
    (GraphQueries.defs, GraphQueries.oracle))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (non-SQL-expressible ops) get
    * the driver's weaker rows-only check. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
