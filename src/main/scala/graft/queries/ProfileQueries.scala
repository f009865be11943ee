package graft.queries

import graft.Catalog
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table/column profiling — the ANALYZE-style statistics pass a
  * curation pipeline runs before planning anything else (target sizes,
  * dedup keys, shard counts all start from row/null/distinct counts).
  * Upstream exposes per-table row counts and PK/FK shape through its
  * catalog; this is the generalized, column-level version.
  *
  * One row per (table, column): exact row/null/distinct counts,
  * min/max rendered to strings through the Det contract (ints as
  * digits, money through DECIMAL(12,2), timestamps as epoch seconds —
  * so the DuckDB oracle reproduces every byte), and mean string length
  * for text columns (exact BIGINT length sum → one IEEE division).
  *
  * 100 TB shape: two parallel scan-bound aggregates per table, ZERO
  * sorts (see profileOne's scaladoc for why they must not fuse).
  * count/min/max/sum are map-side-combinable aggregates; the
  * multi-column exact `count(DISTINCT …)` rides Catalyst's standard
  * Expand rewrite (k row-projections of the digests, hash-aggregated
  * before the single shuffle) — exact-by-role here, matching the
  * oracle; at corpus scale the sketch tier (`hll_distinct_tokens`,
  * approx_count_distinct) is the declared approximate path. String
  * distincts hash to 32-hex md5 digests BEFORE the Expand, so the
  * distinct shuffle ships 32 bytes per text, never whole documents
  * (sf10 measured: 74.4 → see SCALE.md r15; DuckDB computes the
  * identical md5, so the count stays hash-checked). The final
  * aggregate is ONE row; the per-column explode is arithmetic on it.
  */
object ProfileQueries {

  /** kind ∈ str | int | money | ts — picks the Det rendering. */
  private final case class ColSpec(name: String, kind: String)

  private val docCols = Seq(
    ColSpec("doc_id", "int"), ColSpec("lang", "str"),
    ColSpec("n_chars", "int"), ColSpec("source", "str"),
    ColSpec("text", "str"))
  private val orderCols = Seq(
    ColSpec("o_custkey", "int"), ColSpec("o_orderdate", "ts"),
    ColSpec("o_orderkey", "int"), ColSpec("o_orderpriority", "str"),
    ColSpec("o_orderstatus", "str"), ColSpec("o_totalprice", "money"))

  private def detView(c: ColSpec): Column = c.kind match {
    case "money" => Det.dec2(col(c.name))
    case "ts"    => Det.epochS(col(c.name))
    case _       => col(c.name)
  }

  /** Profile one table in two parallel aggregates over the same scan,
    * then attach the 1-row results and explode into per-column rows.
    * Package-visible for ProfileSpec's null-handling fixture.
    *
    * Why two aggregates (r17 optimization): a single `agg` mixing
    * min/max(string) with multi-column `count(DISTINCT …)` forces the
    * WHOLE Expand rewrite into SortAggregate — min/max carry var-length
    * string buffers, which HashAggregate's mutable-buffer row cannot
    * hold — so the plan sorted the k+1-times-Expanded corpus THREE
    * times (partial, post-exchange merge, second distinct level), with
    * the gid=0 arm dragging the full `text` payload through every
    * sort (measured at sf0.1: the orders arm ran 4.2 s over 2 tasks;
    * plans/r17/profile_tables_before.txt has the Sort+SortAggregate
    * chains). Split, each arm gets its cheap shape:
    *  - stats arm: ONE global aggregate, no grouping keys — a global
    *    SortAggregate needs NO Sort (empty ordering), so min/max/count/
    *    sum stay map-side-combined scan work;
    *  - distinct arm: count-only functions — long (exact) or HLL
    *    register (approx) buffers — so the Expand rewrite runs as
    *    HashAggregate over (digest, gid) with NO sorts, and the Expand
    *    projections carry only the k digest columns, never `text`.
    * The two 1-row results re-attach by broadcast cross join (scalar
    * attach, the profile_histogram precedent). Values are bit-identical
    * to the fused form — same aggregate functions over the same rows —
    * so the DuckDB oracle is unchanged. At corpus scale this removes
    * the only sorts in the profiler; the cost is a second scan of the
    * profiled columns, strictly cheaper than sorting the (k+1)×
    * expanded corpus. */
  private[graft] def profileOne(df: DataFrame, tbl: String,
                                cols: Seq[(String, String)],
                                approxDistinct: Boolean = false): DataFrame = {
    val specs = cols.map { case (n, k) => ColSpec(n, k) }
    val statAggs: Seq[Column] = count(lit(1)).as("__rows") +: specs.flatMap { c =>
      val v = detView(c)
      Seq(count(v).as(s"${c.name}__nn"),
        min(v).cast("string").as(s"${c.name}__min"),
        max(v).cast("string").as(s"${c.name}__max")) ++
        (if (c.kind == "str") Seq(sum(length(col(c.name))).as(s"${c.name}__len"))
         else Nil)
    }
    val ndAggs: Seq[Column] = specs.map { c =>
      val v = detView(c)
      // string distincts run over the 32-hex md5 DIGEST, not the value:
      // the Expand copy and the distinct shuffle carry 32 bytes per
      // text instead of whole documents (the dedup_exact_digest
      // precedent — DuckDB computes the identical md5)
      val dv = if (c.kind == "str") md5(col(c.name).cast("binary")) else v
      // sketch tier: HLL++ registers instead of the Expand rewrite's
      // exact distinct — the per-column shuffle payload becomes a
      // CONSTANT-size sketch, so the whole profile is scan-bound
      val nd = if (approxDistinct) approx_count_distinct(dv) else countDistinct(dv)
      nd.as(s"${c.name}__nd")
    }
    // The sketch tier FUSES both arms back into one global aggregate:
    // approx_count_distinct is not a DISTINCT rewrite, so there is no
    // Expand and no grouping keys — a single global SortAggregate with
    // string + HLL-register buffers needs no Sort and reads the table
    // ONCE, which beats the exact tier's two scans.
    val one =
      if (approxDistinct) df.agg((statAggs ++ ndAggs).head, (statAggs ++ ndAggs).tail: _*)
      else df.agg(statAggs.head, statAggs.tail: _*)
        .crossJoin(broadcast(df.agg(ndAggs.head, ndAggs.tail: _*)))
    val rows = specs.map { c =>
      struct(
        lit(tbl).as("tbl"), lit(c.name).as("col_name"),
        col("__rows").as("n_rows"),
        (col("__rows") - col(s"${c.name}__nn")).as("n_null"),
        col(s"${c.name}__nd").as("n_distinct"),
        col(s"${c.name}__min").as("min_str"),
        col(s"${c.name}__max").as("max_str"),
        (if (c.kind == "str")
          col(s"${c.name}__len").cast("double") /
            col(s"${c.name}__nn").cast("double")
        else lit(null).cast("double")).as("avg_len"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  def profileTables(s: SparkSession, dir: String): DataFrame =
    profileOne(Catalog.table(s, dir, "documents"), "documents",
        docCols.map(c => (c.name, c.kind)))
      .union(profileOne(Catalog.table(s, dir, "orders"), "orders",
        orderCols.map(c => (c.name, c.kind))))
      .orderBy("tbl", "col_name")

  /** The SKETCH tier of the profiler — the declared 100 TB path the
    * exact tier's doc points at (r15 verdict item 5): the identical
    * one-scan-per-table shape with approx_count_distinct (HLL++) over
    * the same md5 digests, so the multi-distinct Expand's per-column
    * shuffle payload collapses from one row per distinct digest to a
    * constant-size register set and the profile stays scan-bound at
    * any corpus size. Rows-only by nature (HLL register merges are
    * engine-specific); ProfileSpec pins every estimate within 10% of
    * the exact tier's oracle-checked counts at the gate SF. */
  def profileTablesApprox(s: SparkSession, dir: String): DataFrame =
    profileOne(Catalog.table(s, dir, "documents"), "documents",
        docCols.map(c => (c.name, c.kind)), approxDistinct = true)
      .union(profileOne(Catalog.table(s, dir, "orders"), "orders",
        orderCols.map(c => (c.name, c.kind)), approxDistinct = true))
      .orderBy("tbl", "col_name")

  private def armSql(tbl: String, c: ColSpec): String = {
    val v = c.kind match {
      case "money" => Det.sql.dec2(c.name)
      case "ts"    => Det.sql.epochS(c.name)
      case _       => c.name
    }
    val avg =
      if (c.kind == "str")
        s"CAST(sum(length(${c.name})) AS DOUBLE) / CAST(count(${c.name}) AS DOUBLE)"
      else "CAST(NULL AS DOUBLE)"
    val dv = if (c.kind == "str") s"md5(${c.name})" else v
    s"""SELECT '$tbl' AS tbl, '${c.name}' AS col_name,
       |  count(*) AS n_rows,
       |  count(*) - count($v) AS n_null,
       |  count(DISTINCT $dv) AS n_distinct,
       |  CAST(min($v) AS VARCHAR) AS min_str,
       |  CAST(max($v) AS VARCHAR) AS max_str,
       |  $avg AS avg_len
       |FROM $tbl""".stripMargin
  }

  val profileTablesSql: String =
    (docCols.map(armSql("documents", _)) ++ orderCols.map(armSql("orders", _)))
      .mkString("", "\nUNION ALL\n", "\nORDER BY tbl, col_name")

  // --- profile_histogram: equi-width value histograms -----------------
  // The second half of an ANALYZE pass: per-column equi-width
  // histograms drive selectivity estimates, skew detection, and shard
  // planning. Float binning is boundary-hazardous (an IEEE rounding
  // difference flips a row across a bin edge), so every profiled column
  // maps to exact integer units first — ints as-is, money as cents via
  // the Det DECIMAL(12,2) contract — and the bin index is pure BIGINT
  // arithmetic both engines replay identically:
  //   bin = least(B-1, ((v - vmin) * B) div (vmax - vmin + 1)).
  // Output carries each bin's OBSERVED lo/hi (min/max within the bin)
  // rather than re-deriving closed-form edges, so the contract stays
  // one formula.
  //
  // 100 TB shape: two scans per column — a 1-row min/max aggregate
  // (map-side combined, broadcast back) and the bin rollup (map-side
  // combined, ≤B rows out). No window, no join on data-scale rows;
  // lineitem's arm is the corpus-scale proof.
  private val HistBins = 16

  private[graft] def histOne(df: DataFrame, tbl: String, colName: String,
                             cents: Column): DataFrame = {
    val base = df.select(cents.cast("long").as("v")).filter(col("v").isNotNull)
    val mm = base.agg(min(col("v")).as("vmin"), max(col("v")).as("vmax"))
    base.crossJoin(broadcast(mm))
      .select(col("v"),
        expr(s"least(CAST(${HistBins - 1} AS BIGINT), " +
          s"((v - vmin) * $HistBins) div greatest(vmax - vmin + 1, CAST(1 AS BIGINT)))").as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_rows"), min(col("v")).as("lo"), max(col("v")).as("hi"))
      .select(lit(tbl).as("tbl"), lit(colName).as("col_name"),
        col("bin"), col("n_rows"), col("lo"), col("hi"))
  }

  def profileHistogram(s: SparkSession, dir: String): DataFrame =
    histOne(Catalog.table(s, dir, "documents"), "documents", "n_chars",
        col("n_chars"))
      .union(histOne(Catalog.table(s, dir, "orders"), "orders", "o_totalprice",
        Det.dec2(col("o_totalprice")) * 100))
      .union(histOne(Catalog.table(s, dir, "lineitem"), "lineitem", "l_extendedprice",
        Det.dec2(col("l_extendedprice")) * 100))
      .orderBy("tbl", "col_name", "bin")

  private def histArmSql(tbl: String, colName: String, centsSql: String): String =
    s"""SELECT '$tbl' AS tbl, '$colName' AS col_name, bin,
       |  count(*) AS n_rows, min(v) AS lo, max(v) AS hi
       |FROM (
       |  SELECT v, least(CAST(${HistBins - 1} AS BIGINT),
       |           ((v - vmin) * $HistBins) // greatest(vmax - vmin + 1, 1)) AS bin
       |  FROM (SELECT CAST($centsSql AS BIGINT) AS v FROM $tbl
       |        WHERE $centsSql IS NOT NULL) b
       |  CROSS JOIN (SELECT min(CAST($centsSql AS BIGINT)) AS vmin,
       |                     max(CAST($centsSql AS BIGINT)) AS vmax
       |              FROM $tbl) mm)
       |GROUP BY bin""".stripMargin

  val profileHistogramSql: String = Seq(
    histArmSql("documents", "n_chars", "n_chars"),
    histArmSql("orders", "o_totalprice", s"${Det.sql.dec2("o_totalprice")} * 100"),
    histArmSql("lineitem", "l_extendedprice", s"${Det.sql.dec2("l_extendedprice")} * 100"))
    .mkString("", "\nUNION ALL\n", "\nORDER BY tbl, col_name, bin")

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "profile_tables" -> (profileTables _),
    "profile_tables_approx" -> (profileTablesApprox _),
    "profile_histogram" -> (profileHistogram _))
    // profile_tables_approx: HLL sketch counts -> rows-only; the 10%
    // bound vs the exact tier is pinned in ProfileSpec

  def oracle: Map[String, String] = Map(
    "profile_tables" -> profileTablesSql,
    "profile_histogram" -> profileHistogramSql)
}
