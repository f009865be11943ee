package graft.queries

import graft.Catalog
import graft.functions.SimilarityFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dedup + similarity-search queries over `documents` and `embeddings`
  * — north_star extensions. Exact tiers are oracle-checked; LSH/sketch
  * tiers (minhash, simhash, hyperplane ANN, HLL) are rows-only here and
  * accuracy-verified against the exact tiers in scalatest. */
object SimilarityQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Catalog.table(s, dir, "documents")
  private def emb(s: SparkSession, dir: String): DataFrame =
    Catalog.table(s, dir, "embeddings")

  // --- exact dedup -----------------------------------------------------

  /** Duplicate groups by exact text: group key count + deterministic
    * keeper (min doc_id). Hash-groupBy — one shuffle on text at scale
    * (or on a text digest; same plan shape). */
  def dedupExactDocs(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy("text")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_cnt"))
      .filter(col("dup_cnt") > 1)
      .select("keep_id", "dup_cnt")
      .orderBy("keep_id")

  val dedupExactDocsSql: String =
    """SELECT min(doc_id) AS keep_id, count(*) AS dup_cnt
      |FROM documents GROUP BY text HAVING count(*) > 1
      |ORDER BY keep_id""".stripMargin

  /** Survivor set after exact dedup: first doc_id per distinct text. */
  def dedupExactSurvivors(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("text")).orderBy(col("doc_id"))
    docs(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("doc_id")
      .orderBy("doc_id")
  }

  val dedupExactSurvivorsSql: String =
    """SELECT doc_id FROM (
      |  SELECT doc_id, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
      |  FROM documents)
      |WHERE rn = 1 ORDER BY doc_id""".stripMargin

  // --- exact token-set Jaccard near-dup (oracle tier) ------------------
  def dedupJaccardDocs(s: SparkSession, dir: String): DataFrame =
    SimilarityFunctions.jaccardPairs(
        docs(s, dir).filter(col("doc_id") % 25 === 0), 0.5)
      .orderBy("ida", "idb")

  val dedupJaccardDocsSql: String =
    """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id % 25 = 0),
      |tok AS (SELECT DISTINCT doc_id, tok FROM
      |        (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM d)),
      |sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS c
      |          FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2)
      |SELECT ida, idb,
      |  CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) AS jaccard
      |FROM inter
      |JOIN sizes sa ON ida = sa.doc_id
      |JOIN sizes sb ON idb = sb.doc_id
      |WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= 0.5
      |ORDER BY ida, idb""".stripMargin

  // --- brute-force cosine top-k (oracle tier) --------------------------
  def simTopkEmbeddings(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    SimilarityFunctions.cosineTopK(e.filter(col("vec_id") % 100 === 0), e, 10)
      .orderBy("qid", "rnk")
  }

  val simTopkEmbeddingsSql: String = {
    val dot = Det.sqlFoldChain(i => s"(qe[$i] * ce[$i])", 64)
    val nq = Det.sqlFoldChain(i => s"(qe[$i] * qe[$i])", 64)
    val nc = Det.sqlFoldChain(i => s"(ce[$i] * ce[$i])", 64)
    s"""WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
       |           FROM embeddings WHERE vec_id % 100 = 0),
       |c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings),
       |s AS (SELECT qid, cid,
       |        $dot / (sqrt($nq) * sqrt($nc)) AS score
       |      FROM q CROSS JOIN c WHERE qid <> cid)
       |SELECT qid, cid, score, CAST(rn AS INTEGER) AS rnk FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rn
       |  FROM s)
       |WHERE rn <= 10 ORDER BY qid, rnk""".stripMargin
  }

  // --- embedding-cosine near-dup pairs (oracle tier) -------------------
  /** Vector near-duplicates: sampled probe set against the full corpus,
    * pairs above a cosine threshold. Probe side broadcasts; candidates
    * stream — same scan-bound shape as cosineTopK. */
  def dedupCosinePairs(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val a = e.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("ida"), SimilarityFunctions.toDoubleArr(col("embedding")).as("ea"))
      .withColumn("an", sqrt(SimilarityFunctions.dot(col("ea"), col("ea"))))
    val b = e.select(col("vec_id").as("idb"), SimilarityFunctions.toDoubleArr(col("embedding")).as("eb"))
      .withColumn("bn", sqrt(SimilarityFunctions.dot(col("eb"), col("eb"))))
    b.join(broadcast(a), col("ida") < col("idb"))
      .withColumn("score",
        SimilarityFunctions.dot(col("ea"), col("eb")) / (col("an") * col("bn")))
      .filter(col("score") >= 0.9)
      .select("ida", "idb", "score")
      .orderBy("ida", "idb")
  }

  val dedupCosinePairsSql: String = {
    val dot = Det.sqlFoldChain(i => s"(ea[$i] * eb[$i])", 64)
    val na = Det.sqlFoldChain(i => s"(ea[$i] * ea[$i])", 64)
    val nb = Det.sqlFoldChain(i => s"(eb[$i] * eb[$i])", 64)
    s"""WITH a AS (SELECT vec_id AS ida, CAST(embedding AS DOUBLE[]) AS ea
       |           FROM embeddings WHERE vec_id % 20 = 0),
       |b AS (SELECT vec_id AS idb, CAST(embedding AS DOUBLE[]) AS eb FROM embeddings),
       |s AS (SELECT ida, idb, $dot / (sqrt($na) * sqrt($nb)) AS score
       |      FROM a JOIN b ON ida < idb)
       |SELECT ida, idb, score FROM s WHERE score >= 0.9
       |ORDER BY ida, idb""".stripMargin
  }

  /** Same top-k as sim_topk_embeddings but through the native Catalyst
    * `graft_cosine` expression (fused single-loop codegen — see
    * graft.plans.CosineSimilarity). Bitwise-identical accumulation
    * order, so it hash-matches the same oracle SQL. */
  def simTopkNative(s: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftExtensions.register(s)
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), SimilarityFunctions.toDoubleArr(col("embedding")).as("qe"))
    val c = e.select(col("vec_id").as("cid"), SimilarityFunctions.toDoubleArr(col("embedding")).as("ce"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score").desc, col("cid"))
    c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("score", call_function("graft_cosine", col("qe"), col("ce")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select(col("qid"), col("cid"), col("score"), col("rnk"))
      .orderBy("qid", "rnk")
  }

  // --- scale tiers (rows-only checks; accuracy verified in scalatest) --

  /** MinHash+LSH near-dup candidates: 3-token shingle -> minhash ->
    * band -> bucket-join. */
  def dedupMinhashDocs(s: SparkSession, dir: String): DataFrame = {
    val sigs = SimilarityFunctions.minhashSignatures(docs(s, dir), "text", 32, nShingle = 3)
    SimilarityFunctions.minhashLshPairs(sigs, bands = 8)
      .filter(col("est_jaccard") >= 0.5)
      .orderBy("ida", "idb")
  }

  /** SimHash near-dup: 64-bit fingerprints, candidate pairs within
    * hamming distance 3 over a modulus-sampled subset. */
  def dedupSimhashDocs(s: SparkSession, dir: String): DataFrame = {
    val h = SimilarityFunctions.simhash(docs(s, dir).filter(col("doc_id") % 25 === 0), "text")
    val a = h.select(col("doc_id").as("ida"), col("simhash").as("ha"))
    val b = h.select(col("doc_id").as("idb"), col("simhash").as("hb"))
    a.join(b, col("ida") < col("idb"))
      .withColumn("dist", SimilarityFunctions.hamming(col("ha"), col("hb")))
      .filter(col("dist") <= 3)
      .select("ida", "idb", "dist")
      .orderBy("ida", "idb")
  }

  /** Hyperplane-LSH bucketed ANN — the scale path for similarity
    * search; compares only within sign-bit buckets. */
  def annLshTopk(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    SimilarityFunctions.annLshTopK(e.filter(col("vec_id") % 100 === 0), e, 10)
      .orderBy("qid", "rnk")
  }

  /** IVF ANN — k-means coarse quantizer + nprobe search (the other
    * scale path for similarity search; see SimilarityFunctions). */
  def annIvfTopk(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    SimilarityFunctions.annIvfTopK(e.filter(col("vec_id") % 100 === 0), e, 10)
      .orderBy("qid", "rnk")
  }

  /** HLL / exact distinct side-by-side (approx_count_distinct is
    * engine-specific → rows-only). */
  def hllDistinctTokens(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .agg(
        countDistinct(col("tok")).as("exact_distinct"),
        approx_count_distinct(col("tok"), 0.02).as("approx_distinct"))

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact_docs" -> (dedupExactDocs _),
    "dedup_exact_survivors" -> (dedupExactSurvivors _),
    "dedup_jaccard_docs" -> (dedupJaccardDocs _),
    "dedup_cosine_pairs" -> (dedupCosinePairs _),
    "sim_topk_embeddings" -> (simTopkEmbeddings _),
    "sim_topk_native" -> (simTopkNative _),
    "dedup_minhash_docs" -> (dedupMinhashDocs _),
    "dedup_simhash_docs" -> (dedupSimhashDocs _),
    "ann_lsh_topk" -> (annLshTopk _),
    "ann_ivf_topk" -> (annIvfTopk _),
    "hll_distinct_tokens" -> (hllDistinctTokens _))

  def oracle: Map[String, String] = Map(
    "dedup_exact_docs" -> dedupExactDocsSql,
    "dedup_exact_survivors" -> dedupExactSurvivorsSql,
    "dedup_jaccard_docs" -> dedupJaccardDocsSql,
    "dedup_cosine_pairs" -> dedupCosinePairsSql,
    "sim_topk_embeddings" -> simTopkEmbeddingsSql,
    "sim_topk_native" -> simTopkEmbeddingsSql) // same oracle: bitwise-equal path
    // minhash/simhash/ann/hll: engine-specific hashes or sketches ->
    // rows-only here, accuracy asserted in SimilaritySpec
}
