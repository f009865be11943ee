package graft

import org.apache.spark.sql.functions._

/** Dev-only probe (test scope): where does dedup_editdist_pairs spend
  * time at sf0.1 — candidate generation or the banded verify? */
object EditDistProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("editdist-probe")
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val d = Catalog.table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"), col("n_chars"))
    val planted = d.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
      .withColumn("text", concat(lit("x"), expr("substring(text, 2)")))
    val c = d.union(planted)
    val a = c.select(col("doc_id").as("ida"), col("lang").as("la"),
      col("text").as("ta"), col("n_chars").as("na"))
    val b = c.select(col("doc_id").as("idb"), col("lang").as("lb"),
      col("text").as("tb"), col("n_chars").as("nb"))
    val joined = a.join(b, col("la") === col("lb") && col("na") === col("nb") &&
      col("ida") < col("idb"))
    timed("warm read")(c.count())
    timed("candidates only")(joined.count())
    timed("candidates only 2nd")(joined.count())
    timed("lev3 full")(joined.withColumn("dist", levenshtein(col("ta"), col("tb"), 2))
      .filter(col("dist") >= 0).count())
    timed("lev3 full 2nd")(joined.withColumn("dist", levenshtein(col("ta"), col("tb"), 2))
      .filter(col("dist") >= 0).count())
    timed("lev unbounded")(joined.withColumn("dist", levenshtein(col("ta"), col("tb")))
      .filter(col("dist") <= 2).count())
    timed("lev thr=1")(joined.withColumn("dist", levenshtein(col("ta"), col("tb"), 1))
      .filter(col("dist") >= 0).count())
    val full = joined.withColumn("dist", levenshtein(col("ta"), col("tb"), 2))
      .filter(col("dist") >= 0).select("ida", "idb", "dist").orderBy("ida", "idb")
    timed("with orderBy")(full.count())
    full.explain("formatted")
    spark.stop()
  }
}
