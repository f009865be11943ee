package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * skew-join splitting isn't enough (e.g. one user_id holding 1% of a
  * 100 TB events table would pin a single reducer).
  *
  * Standard shape: the BIG side gains a deterministic salt in
  * [0, factor) derived from its whole row spread (xxhash64 of the PK),
  * the SMALL side is replicated `factor` times with every salt value;
  * the join key becomes (key, salt), fanning one hot key across
  * `factor` reducers. Result set is provably identical to the unsalted
  * join (SkewJoinSpec asserts it).
  *
  * Prefer AQE (`spark.sql.adaptive.skewJoin.enabled`, on by default)
  * first; reach for this when the skew is known and extreme, or the
  * small side is replicable-cheap.
  */
object SkewJoin {

  /** Inner equi-join `big.keys == small.keys`, salted `factor` ways.
    * `bigSaltSource` should be a column (or tuple via struct) that
    * varies WITHIN a join key on the big side — usually its PK — so the
    * hot key's rows spread across salts. */
  def saltedEquiJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[(String, String)], // (bigCol, smallCol)
      bigSaltSource: Column,
      factor: Int): DataFrame = {
    require(factor > 0)
    val saltedBig = big.withColumn("__salt", pmod(xxhash64(bigSaltSource), lit(factor.toLong)))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(factor.toLong - 1))))
    val cond = (keys.map { case (b, s) => saltedBig(b) === saltedSmall(s) } :+
      (saltedBig("__salt") === saltedSmall("__salt"))).reduce(_ && _)
    saltedBig.join(saltedSmall, cond, "inner")
      .drop(saltedBig("__salt")).drop(saltedSmall("__salt"))
  }
}
