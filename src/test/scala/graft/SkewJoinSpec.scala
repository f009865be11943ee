package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("salted join == plain join on a skewed key distribution") {
    // 90% of big rows share user 7 (the hot key)
    val big = (1L to 500L).map(i => (i, if (i % 10 == 0) i % 7 else 7L)).toDF("id", "uid")
    val small = (0L to 9L).map(u => (u, s"user$u")).toDF("uid", "name")
    val plain = big.join(small, "uid").select("id", "uid", "name")
      .collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedEquiJoin(big, small, Seq("uid" -> "uid"), col("id"), 8)
      .select(col("id"), big("uid"), col("name"))
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("hot key actually spreads across salts") {
    val big = (1L to 400L).map(i => (i, 7L)).toDF("id", "uid")
    val salts = big
      .withColumn("salt", pmod(xxhash64(col("id")), lit(8L)))
      .select(countDistinct("salt")).as[Long].head()
    assert(salts == 8L) // all 8 reducers get a share of the hot key
  }
}
