package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers for the DuckDB-oracle contract (SURVEY.md §7).
  *
  * The whole strategy: make every computed value **bitwise identical** in
  * Spark and DuckDB instead of rounding after the fact.
  *
  *   - Money math is decimal-FIRST: cast each `double` *factor* to
  *     DECIMAL(18,2) (testdata money columns are 2-dp-valued, so the cast
  *     is exact in both engines), do all +|*|- in decimal (exact), and
  *     cast to DOUBLE only at the very end (exact decimal -> nearest
  *     double is the same double everywhere).
  *   - Averages are `CAST(sum_dec AS DOUBLE) / count` — IEEE division of
  *     identical inputs; never decimal division (scale rules differ
  *     between engines) and never ROUND (half-way semantics differ).
  *   - Timestamps never appear in outputs: dates become DATE, instants
  *     become epoch-second BIGINTs (events.ts is µs-precision in the
  *     testdata, so Spark's µs read is lossless).
  *   - Every query ends with ORDER BY on a unique key.
  */
object Det {

  /** Exact 2-dp decimal view of a money double (values < 1e10). Widths
    * are kept narrow on purpose: decimal multiplication precision grows
    * as p1+p2(+1), and past 38 digits Spark and DuckDB diverge on
    * overflow handling — (12,2)x(4,2) chains stay comfortably exact in
    * both engines. */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Exact 2-dp decimal view of a small rate (discount/tax in [0,1]). */
  def rate2(c: Column): Column = c.cast(DecimalType(4, 2))

  /** SUM over exact decimals, exported as double. */
  def moneySum(c: Column): Column = sum(dec2(c)).cast("double")

  /** Deterministic average: decimal sum -> double, / count. */
  def moneyAvg(c: Column): Column =
    sum(dec2(c)).cast("double") / count(lit(1)).cast("double")

  /** Epoch seconds of a timestamp truncated to whole seconds — the only
    * form in which event times reach an output or a comparison. */
  def epochS(c: Column): Column =
    unix_timestamp(date_trunc("second", c))

  /** Matching DuckDB SQL fragments (kept adjacent so the two dialects
    * stay in lock-step). */
  object sql {
    def dec2(e: String): String = s"CAST($e AS DECIMAL(12,2))"
    def rate2(e: String): String = s"CAST($e AS DECIMAL(4,2))"
    def moneySum(e: String): String = s"CAST(SUM(${dec2(e)}) AS DOUBLE)"
    def moneyAvg(e: String): String =
      s"CAST(SUM(${dec2(e)}) AS DOUBLE) / CAST(count(*) AS DOUBLE)"
    def epochS(e: String): String =
      s"CAST(epoch(date_trunc('second', $e)) AS BIGINT)"
  }

  /** Left-associated `((0.0 + t1) + t2) + …` chain — the SQL mirror of
    * Spark's `aggregate(…, lit(0.0), _ + _)` sequential fold, so double
    * summation order (and hence every bit) matches across engines. */
  def sqlFoldChain(term: Int => String, n: Int): String =
    (1 to n).map(term).foldLeft("0.0")((acc, t) => s"($acc + $t)")

  /** Double literal for oracle SQL, routed through a string cast:
    * DuckDB parses a bare `0.35` as DECIMAL and its decimal→double
    * arithmetic is not always correctly rounded (measured r16, the
    * sim_topk_projected pitfall) — `CAST('0.35' AS DOUBLE)` is the
    * same IEEE value `0.35` is in Scala. */
  def dlit(d: Double): String = s"CAST('$d' AS DOUBLE)"
}
