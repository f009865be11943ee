package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity-search and near-duplicate operators — north_star
  * extensions: exact/LSH dedup families and embedding ANN.
  *
  * Two tiers everywhere:
  *   - an EXACT variant whose math is oracle-reproducible (sequential
  *     folds, integer set arithmetic);
  *   - a SCALE variant (MinHash/LSH, SimHash, hyperplane-bucketed ANN)
  *     that avoids the quadratic pair space; engine-internal hashes
  *     (xxhash64) are fine here because these are scalatest-verified
  *     against the exact tier, not hash-compared to DuckDB.
  */
object SimilarityFunctions {

  /** float[] -> double[] elementwise (exact in both engines). */
  def toDoubleArr(a: Column): Column = transform(a, _.cast("double"))

  /** Sequential left-fold dot product — bitwise equal to the oracle's
    * explicit +-chain (queries.Det.sqlFoldChain). Interpreted (HOFs do
    * not codegen); prefer [[dotN]] wherever the width is a schema
    * constant — every pair-scale scoring site is (r17). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  /** Codegen'd dot product — the native [[graft.plans.DotProduct]]
    * kernel (one fused loop, whole-stage codegen), bitwise [[dot]]
    * (same 0.0 seed, same left association, same IEEE ops per element;
    * common-prefix on unequal lengths). Every PAIR-scale scoring site
    * uses this instead of the interpreted HOF evaluator (optimization
    * guide §4: no non-codegen expressions in the hot path — Spark HOFs
    * are CodegenFallback). Constructed through the graftshim bridge, so
    * no registry round-trip is needed. */
  def dotN(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.GraftColumn.of(graft.plans.DotProduct(
      org.apache.spark.sql.graftshim.GraftColumn.expr(a),
      org.apache.spark.sql.graftshim.GraftColumn.expr(b)))

  /** [[dotN]] for int-quantized vectors: int multiply, long widen, long
    * adds — bitwise the aggregate(zip_with((x,y) => (x*y).cast(long)),
    * 0L, _+_) HOF. graft_dot_int8(v, v) is the quantized squared norm. */
  def dotLongN(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.GraftColumn.of(graft.plans.DotProductInt8(
      org.apache.spark.sql.graftshim.GraftColumn.expr(a),
      org.apache.spark.sql.graftshim.GraftColumn.expr(b)))

  /** Codegen'd positional equality count — bitwise
    * size(filter(zip_with(a, b, _ === _), identity)) for equal-length
    * inputs (the MinHash signature estimator). */
  def matchCountN(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.GraftColumn.of(graft.plans.MatchCount(
      org.apache.spark.sql.graftshim.GraftColumn.expr(a),
      org.apache.spark.sql.graftshim.GraftColumn.expr(b)))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Brute-force cosine top-k: every query vector against every
    * candidate. The query side is broadcast (it is the small side by
    * construction); candidates stream through — at 100 TB this is one
    * scan of the candidate table per batch of queries, no shuffle. */
  def cosineTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    // Norms are per-vector, so compute them once per ROW before the
    // pair join, not once per PAIR inside it — same doubles (identical
    // fold), |Q|+|C| norm folds instead of 2*|Q|*|C|.
    val q = queries.select(col("vec_id").as("qid"), toDoubleArr(col("embedding")).as("qe"))
      .withColumn("qn", sqrt(dotN(col("qe"), col("qe"))))
    val c = candidates.select(col("vec_id").as("cid"), toDoubleArr(col("embedding")).as("ce"))
      .withColumn("cn", sqrt(dotN(col("ce"), col("ce"))))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("cid"))
    c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("score", dotN(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("cid"), col("score"), col("rnk"))
  }

  // --- exact n-gram/token Jaccard (oracle tier) ------------------------

  /** Exact pairwise token-set Jaccard via inverted index: explode
    * distinct tokens, self-join on token, count intersections. Scales as
    * sum over tokens of df(token)^2 — the standard candidate-generation
    * shape; switch to the LSH tier when even capped df² is too much.
    *
    * `maxDf` is the hot-token safety valve (same window cap as the
    * minhash/simhash tiers): one stopword-grade token with df=d costs
    * d² intersection rows and can dwarf the rest of the job, while
    * contributing nothing to discrimination — tokens past the cap are
    * dropped from the INDEX side whole. NOTE this makes the reported
    * jaccard approximate for pairs containing capped tokens (their
    * intersection and union both shrink), so callers that need the
    * exact value (the oracle-checked queries) must choose a cap above
    * their corpus's max df. */
  def jaccardPairs(docs: DataFrame, minJaccard: Double,
                   maxDf: Int = 100000): DataFrame =
    // r18: gated widen — the salted-token callers (sparse components /
    // split_leakage_safe) otherwise run the distinct+explode scan at
    // the raw scan width (3 tasks at sf1, measured); no-op at cluster
    // scan widths and on in-memory relations
    jaccardPairsOver(
      widenTextScan(docs).select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("tok")),
      minJaccard, maxDf)

  /** Distinct n-token shingles ("n-grams") of a text, space-joined —
    * the set basis the training-data dedup literature scores Jaccard
    * on: shingles capture local word ORDER, so topically-similar-but-
    * differently-worded docs score near 0 while true near-dups stay
    * near 1 (measured on this corpus: noise floor 0.03 vs near-dup
    * 0.8+, against 0.5+ unigram scores for mere topic overlap).
    * Scan-local HOF; docs shorter than n tokens yield an empty set. */
  def shingles(text: Column, n: Int): Column =
    // r17 (guide §4): native distinct-shingle-string kernel — ONE
    // codegen'd pass per row replaces the interpreted transform HOF
    // (one lambda eval per position; and before r15's array-binding
    // trick, O(words²) re-splits — see git history for the measured
    // ladder: 45 CPU-s → sub-second → this, which removes the
    // remaining per-position interpreted dispatch). Output
    // bit-identical: same strings, same first-seen order as
    // array_distinct (UTF8String equality is byte equality);
    // SimilaritySpec pins kernel == HOF on the real corpus.
    org.apache.spark.sql.graftshim.GraftColumn.of(graft.plans.ShingleStrings(
      org.apache.spark.sql.graftshim.GraftColumn.expr(split(text, " ")), n))

  /** Exact pairwise n-gram-shingle Jaccard — same inverted-index
    * machinery as [[jaccardPairs]] on the [[shingles]] basis. Shingling
    * also DEFUSES the df² blowup structurally: n-gram df falls
    * geometrically with n, so the index is near-uniform even where the
    * unigram vocabulary is stopword-heavy.
    *
    * The index carries 8-byte shingle HASHES (native
    * `graft_shingle_hashes` kernel — one codegen'd concat+hash pass,
    * replacing an interpreted transform HOF + string explode), not the
    * shingle strings: set arithmetic over the hashes is identical
    * absent an intra-pair collision (full 64-bit XXH64 basis —
    * vanishing at ~|union|²/2⁶⁴; a
    * collision would surface as a DuckDB hash mismatch), and the
    * self-join shuffles and compares longs instead of 20-40 byte
    * strings — measured ~3x on this tier at sf0.1. */
  def jaccardPairsNgram(docs: DataFrame, n: Int, minJaccard: Double,
                        maxDf: Int = 100000): DataFrame = {
    graft.plans.GraftExtensions.register(docs.sparkSession)
    // r18: gated widen of the shingle-kernel scan (the dedup_shingle_lsh
    // rationale, applied inside the tier so every consumer gets it) —
    // no-op at cluster scan widths and on in-memory relations
    jaccardPairsOver(
      widenTextScan(docs).select(col("doc_id"),
        explode(call_function("graft_shingle_hashes",
          split(col("text"), " "), lit(n))).as("tok")),
      minJaccard, maxDf)
  }

  /** The 100 TB tier for exact n-gram Jaccard: MinHash-banded candidate
    * generation followed by EXACT per-pair verification over the
    * per-doc shingle-hash sets.
    *
    * [[jaccardPairsNgram]] self-joins the full inverted index — the
    * candidate space is Σ df² over every shingle, which is corpus-
    * quadratic in the worst case and makes its cost non-scan-shaped no
    * matter how flat trigram df is in practice. Here the candidate
    * space is the banded-LSH collision set (ids only through one
    * (band, key) shuffle, hot buckets capped), and each candidate pair
    * is then scored EXACTLY: `array_intersect` over the two docs'
    * distinct shingle-hash arrays — a pair-local computation, no
    * inverted index, no corpus self-join. Emitted (ida, idb, jaccard)
    * rows are bit-identical to the exact tier's; the only
    * approximation is recall. A pair at Jaccard j collides in ≥1 of b
    * bands of r rows with p = 1-(1-j^r)^b — at the defaults (128
    * hashes, 32 bands, r=4) a true near-dup at j=0.8 is missed with
    * p < 5e-8, and this corpus's qualifying pairs all sit at j ≥ 0.8
    * (measured sf0.01/sf0.1), so the tier reproduces the exact tier's
    * output and shares its DuckDB oracle. */
  def jaccardPairsNgramLsh(docs: DataFrame, n: Int, minJaccard: Double,
                           numHashes: Int = 128, bands: Int = 32,
                           maxBucket: Int = 10000): DataFrame = {
    graft.plans.GraftExtensions.register(docs.sparkSession)
    val toks = split(col("text"), " ")
    // one scan computes both per-doc set representations; the
    // checkpoint is read by the banding pass + both verify joins.
    // r18: the shingle + 128-permutation minhash projection is the
    // CPU-densest scan in the tier and ran at the RAW scan width for
    // un-widened callers (dedup_keeper_quality at sf1: 14.7 s across
    // 3-task stages, 29 cores idle — the W3/pretrain trap); the gated
    // widen ships the sub-10 MB (doc_id, text) rows once and is a
    // no-op at cluster scan widths and on in-memory relations.
    // r18: the signature folds over the ALREADY-computed distinct
    // shingle-hash array instead of re-hashing every position —
    // min over a multiset == min over its distinct set, so the
    // signature is bit-identical (PlansSpec pin) and the row pays ONE
    // shingle concat+hash pass instead of two.
    val base = widenTextScan(docs).select(col("doc_id"),
        call_function("graft_shingle_hashes", toks, lit(n)).as("sh"))
      .withColumn("sig",
        call_function("graft_minhash_hashes", col("sh"), lit(numHashes)))
      .filter(size(col("sig")) > 0)
      .localCheckpoint(false)
    val banded = capHotKeys(
      base.select(col("doc_id"),
        posexplode(bandKeys(col("sig"), bands)).as(Seq("band", "band_key"))),
      Seq("band", "band_key"), maxBucket)
    val pairs = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
      .distinct()
    pairs
      .join(base.select(col("doc_id").as("ida"), col("sh").as("sha")), "ida")
      .join(base.select(col("doc_id").as("idb"), col("sh").as("shb")), "idb")
      // r18 (guide §4): graft_intersect_count == size(array_intersect)
      // (PlansSpec pin) without materializing the intersection array
      // per candidate pair
      .withColumn("c", call_function("graft_intersect_count",
        col("sha"), col("shb")))
      .withColumn("jaccard", col("c").cast("double") /
        (size(col("sha")) + size(col("shb")) - col("c")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("ida", "idb", "jaccard")
  }

  /** EXACT n-gram Jaccard pairs via prefix filtering (the AllPairs /
    * PPJoin candidate principle — Bayardo, Ma & Srikant, WWW'07; Xiao
    * et al., WWW'08): identical output to [[jaccardPairsNgram]] — no
    * recall loss, same DuckDB oracle — at a fraction of its candidate
    * cost.
    *
    * Why it's exact: order the shingle universe globally (ascending
    * document frequency, ties by hash). For Jaccard(A,B) >= t we have
    * |A∩B| >= t*|A∪B| >= t*max(|A|,|B|), so the overlap is at least
    * ceil(t*|A|) AND at least ceil(t*|B|). Two sets that overlap in
    * alpha elements must share an element within the first
    * |x| - alpha + 1 elements of EACH (pigeonhole on the sorted
    * order), so indexing only each doc's first
    * p(x) = |x| - ceil(t*|x|) + 1 shingles generates every qualifying
    * pair. A length filter (t*|A| <= |B| <= |A|/t is necessary for
    * Jaccard >= t) prunes the join further. Candidates are then scored
    * EXACTLY — pair-local `array_intersect` over the full per-doc
    * shingle-hash arrays, same verify as the LSH tier.
    *
    * Scale shape vs the inverted-index tier: [[jaccardPairsNgram]]
    * shuffles sum(df²) intersection rows over ALL shingles;
    * here the self-join runs over sum(df_short × df_p) of PREFIX
    * postings only (probe prefix one side, PPJoin's shorter INDEXING
    * prefix on the smaller-set side — see the inline derivation) —
    * and because the global order is df-ASCENDING, prefixes
    * concentrate on each doc's RAREST shingles, so df_p is small by
    * construction. At t=0.4 the prefix is ~60% of each set, but those
    * are the low-df 60%: measured on the adversarial 31-word-vocab
    * fixture (where trigram df grows linearly with the corpus) this
    * cuts the candidate space by an order of magnitude while staying
    * exact. The df ranking costs one extra map-side-combined groupBy;
    * the (hash, df) relation is corpus-sized, so it re-attaches by
    * hash join, and a per-doc row_number window (partition = one
    * document, bounded by doc length) picks the prefix. No window
    * ever sees more than one doc.
    *
    * `maxDf` is the same hot-shingle valve as [[jaccardPairsNgram]]'s
    * (df-capped tokens dropped from BOTH the ranking and the verify
    * arrays would change the score, so here over-cap shingles are only
    * excluded from the INDEX — never from the verify arrays — which
    * keeps scores exact; but because the prefix length is computed
    * from the FULL |x| while row_number ranks only under-cap postings,
    * a pair can be missed whenever its under-cap shared shingles alone
    * cannot satisfy the prefix/overlap bounds — a strictly broader
    * miss condition than the exact tier's "every shared shingle
    * over-cap". Oracle-checked queries choose a cap above the
    * corpus max df, where both tiers are fully exact.) */
  def jaccardPairsNgramPrefix(docs: DataFrame, n: Int, minJaccard: Double,
                              maxDf: Int = 100000): DataFrame = {
    graft.plans.GraftExtensions.register(docs.sparkSession)
    // r18: widen decision read from the RAW scan (before the base
    // widen below, which would mask it) — it drives BOTH the base
    // kernel scan's width and the prefix window's repartition
    val width = docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val widen = shouldWiden(docs.rdd.getNumPartitions, width,
      inputBytes(docs), TextMinPartBytes)
    // one scan computes the per-doc distinct shingle-hash set; feeds
    // the df ranking, the prefix index, and both verify joins.
    // r18: the shingle-kernel scan itself is widened (gated) — for
    // un-widened callers it ran at the raw scan width (the
    // jaccardPairsNgramLsh finding, same trap)
    val base = (if (widen) docs.repartition(width) else docs)
      .select(col("doc_id"),
        call_function("graft_shingle_hashes",
          split(col("text"), " "), lit(n)).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sz", size(col("sh")))
      .localCheckpoint(false)
    val postings = base.select(col("doc_id"), col("sz"),
      explode(col("sh")).as("tok"))
    val df = postings.groupBy("tok")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    // global rarity order (df asc, tok asc) -> per-doc prefix of the
    // first sz - ceil(t*sz) + 1 rarest shingles
    val perDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("df"), col("tok"))
    // Bound arithmetic is slackened by EPS: t*sz can land a hair ABOVE
    // the exact rational product in IEEE (0.4*5 = 2.0000000000000004,
    // so ceil jumps 2 -> 3), which would shorten the prefix below the
    // pigeonhole guarantee and silently drop exact-boundary pairs —
    // the verify filter's own j >= t test compares the same nearest
    // doubles and KEEPS them. Subtracting EPS before ceil (and adding
    // it to the length bound) over-approximates by at most one prefix
    // slot; over-long prefixes cost candidates, never correctness.
    val EPS = 1e-6
    // Two prefix lengths (PPJoin's INDEXING-prefix asymmetry, Xiao et
    // al. §3.2): for a qualifying pair order the sets by size, A the
    // smaller. The length filter gives |B| >= |A|, so the overlap
    // alpha = ceil(t/(1+t)(|A|+|B|)) >= ceil(2t/(1+t)|A|) — A only
    // needs the SHORT prefix |A| - ceil(2t/(1+t)|A|) + 1 (~43% of the
    // set at t=0.4 vs the probe prefix's ~60%), while B keeps the
    // standard bound (|A| >= t|B| gives alpha >= ceil(t|B|)). The
    // minimal shared token — the pigeonhole witness — therefore sits
    // inside A's short prefix AND B's standard prefix, so joining
    // short-side x standard-side under a strict (sz, doc_id) total
    // order loses nothing and each unordered pair matches in exactly
    // one orientation. Candidate volume drops from sum df_p² to
    // sum df_short x df_p (~0.71x at t=0.4; measured below).
    // r17 optimization, two parts (plans/r17/dedup_ngram_prefix_*.txt):
    // (1) the ranked-prefix relation feeds BOTH sides of the candidate
    // self-join, and AQE does not reuse the stage — explode + df join +
    // window all executed twice (task-metrics-verified). localCheckpoint
    // materializes it once (the `base` precedent above).
    // (2) at gate SFs AQE coalesces the window's doc_id exchange to ONE
    // task (tiny bytes, dense CPU — 2.6 s single-task stage measured at
    // sf0.1, and the broadcast self-join inherits that width). A gated
    // repartition(width, doc_id) satisfies the window's required
    // distribution — same exchange count, user-specified so AQE keeps
    // it wide; [[shouldWiden]] on the docs scan makes it a no-op at
    // cluster widths and on in-memory fixtures.
    val joined0 = postings.join(df, "tok")
    val joined = if (widen) joined0.repartition(width, col("doc_id")) else joined0
    val prefix = joined
      .withColumn("r", row_number().over(perDoc))
      .filter(col("r") <=
        col("sz") - ceil(lit(minJaccard) * col("sz") - lit(EPS)) + 1)
      .withColumn("short", col("r") <=
        col("sz") - ceil(lit(2 * minJaccard / (1 + minJaccard)) * col("sz")
          - lit(EPS)) + 1)
      .select(col("doc_id"), col("sz"), col("tok"), col("r"), col("short"))
      .localCheckpoint(false)
    // PPJoin positional filter (Xiao et al.): J(A,B) >= t forces
    // |A∩B| >= ceil(t(|A|+|B|)/(1+t)), and for the globally-MINIMAL
    // shared token x (which both prefixes contain — the pigeonhole
    // witness) every A-element ranked before x is outside A∩B, so
    // |A∩B| <= 1 + min(|A|-r_A(x), |B|-r_B(x)). The join can't single
    // out x, but applying the bound to EVERY shared token and keeping
    // the pair if ANY passes is exact: x has the smallest ranks, hence
    // the LOOSEST bound, so a qualifying pair always survives via x —
    // while pairs whose shared tokens all sit deep in both prefixes
    // are pruned BEFORE the distinct, which is where the candidate
    // volume lives on adversarial (small-vocab) corpora.
    val alphaPair =
      ceil(lit(minJaccard / (1 + minJaccard)) *
        (col("a.sz") + col("b.sz")) - lit(EPS))
    val cand = prefix.filter(col("short")).as("a")
      .join(prefix.as("b"),
        col("a.tok") === col("b.tok") &&
          // strict (sz, doc_id) total order: side a is the SMALLER set
          // (its short indexing prefix is valid), each unordered pair
          // matches in exactly one orientation
          (col("a.sz") < col("b.sz") ||
            (col("a.sz") === col("b.sz") && col("a.doc_id") < col("b.doc_id"))) &&
          // length filter: Jaccard >= t forces t <= |A|/|B| <= 1/t
          col("a.sz") * minJaccard - EPS <= col("b.sz") &&
          col("b.sz") * minJaccard - EPS <= col("a.sz") &&
          lit(1) + least(col("a.sz") - col("a.r"), col("b.sz") - col("b.r"))
            >= alphaPair)
      .select(least(col("a.doc_id"), col("b.doc_id")).as("ida"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("idb"))
      .distinct()
    cand
      .join(base.select(col("doc_id").as("ida"), col("sh").as("sha")), "ida")
      .join(base.select(col("doc_id").as("idb"), col("sh").as("shb")), "idb")
      // r18 (guide §4): same fused intersect-count kernel as the LSH
      // tier's verify — see there
      .withColumn("c", call_function("graft_intersect_count",
        col("sha"), col("shb")))
      .withColumn("jaccard", col("c").cast("double") /
        (size(col("sha")) + size(col("shb")) - col("c")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("ida", "idb", "jaccard")
  }

  /** Drop every row whose `keyCols` group exceeds `cap` members.
    *
    * Shape matters at 100 TB: the old formulation (`count(*) over
    * (partition by key)` then filter) shuffled the ENTIRE exploded
    * relation into a window just to learn per-key counts. This one
    * aggregates counts first — map-side-combined, so the shuffle
    * carries one (key, count) row per key per partition — keeps only
    * the (rare, by construction) hot keys, and removes them with a
    * broadcast ANTI join against the unshuffled input. The big
    * relation never shuffles at all.
    *
    * Used for token-DF pruning (`jaccardPairsOver`), where dropping a
    * ubiquitous shingle ENTIRELY is the intended semantic (stopword
    * removal: a token in >maxDf docs carries no dedup signal). LSH
    * band buckets use [[capHotKeys]] instead — see there. */
  private def dropHotKeys(rel: DataFrame, keyCols: Seq[String],
                          cap: Int): DataFrame = {
    val hot = rel.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > cap)
      .select(keyCols.map(col): _*)
    rel.join(broadcast(hot), keyCols, "left_anti")
  }

  /** Cap every `keyCols` group at its `cap` LOWEST-`doc_id` members
    * (keep-first-N), instead of dropping over-cap groups whole.
    *
    * This is the BATCH half of the unified hot-bucket semantic: the
    * streaming near-dup comparator (`EventStreams.nearDupBucket`)
    * freezes a bucket once `cap` members enrolled — an append-mode
    * stream cannot retract pairs it already emitted — so its bucket
    * membership is the first `cap` doc_ids to arrive. Keeping the
    * `cap` lowest doc_ids here makes batch emit pairs among exactly
    * the same members (under AvailableNow/backfill, where arrival
    * order is doc_id order), so stream==batch parity holds even ON
    * over-cap degenerate buckets — StreamingSpec pins it with a
    * deliberately over-cap fixture. Keep-first-N is also the better
    * production trade than drop-whole: the first N of a boilerplate
    * bucket still yield their (boilerplate) duplicate pairs instead
    * of silently keeping every copy.
    *
    * Scale shape: same hot-key probe as [[dropHotKeys]] (map-side
    * combined count, broadcast). The rank window runs ONLY over rows
    * of hot buckets — rare by construction — semi-joined out by
    * broadcast; the big cold relation never shuffles. A single
    * degenerate bucket ranks in one window partition, bounded by that
    * bucket's size, not the corpus. */
  private[graft] def capHotKeys(rel: DataFrame, keyCols: Seq[String],
                                cap: Int): DataFrame = {
    val keys = keyCols.map(col)
    val hot = rel.groupBy(keys: _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > cap)
      .select(keys: _*)
    val cold = rel.join(broadcast(hot), keyCols, "left_anti")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys: _*).orderBy(col("doc_id"))
    val cappedHot = rel.join(broadcast(hot), keyCols, "left_semi")
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= cap)
      .drop("__r")
    cold.unionByName(cappedHot)
  }

  private[graft] def jaccardPairsOver(tok: DataFrame, minJaccard: Double,
                                      maxDf: Int): DataFrame = {
    // Materialize the capped index ONCE: it feeds three consumers (both
    // self-join sides + the doc-size aggregate), and the token relation
    // is an EXPLODE of per-doc shingle arrays — an interpreted HOF pass
    // that measured 2-5 s alone at sf0.1. Without the checkpoint every
    // consumer re-runs the explode (6 scans: 3 consumers x (rel + its
    // hot-key probe)); with it the explode runs once and the self-join
    // shuffles the materialized rows.
    val capped = dropHotKeys(tok, Seq("tok"), maxDf).localCheckpoint(false)
    val sizes = capped.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = capped.as("a")
      .join(capped.as("b"), col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.select(col("doc_id").as("ida"), col("n").as("na")), "ida")
      .join(sizes.select(col("doc_id").as("idb"), col("n").as("nb")), "idb")
      .withColumn("jaccard",
        col("c").cast("double") / (col("na") + col("nb") - col("c")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("ida", "idb", "jaccard")
  }

  // --- MinHash + LSH (scale tier) --------------------------------------

  /** MinHash signature over `nShingle`-token shingles: numHashes
    * permutations approximated by `(a_i * h + b_i) mod p` over xxhash64
    * shingle hashes (engine-internal; verified against exact Jaccard in
    * tests). Returns (doc_id, sig array).
    *
    * Computed by the native `graft_minhash` Catalyst expression
    * (plans.TextHashes): one fused pass over the shingles computes all
    * permutation minima — a pure scan-local projection, no explode, no
    * shuffle. The earlier HOF formulation (`array_min(transform(...))`
    * × numHashes) evaluated numHashes interpreted lambda passes per row
    * (higher-order functions are a codegen barrier) and measured ~10x
    * slower at sf0.1.
    *
    * Shingling matters at scale: with a small vocabulary, unigram
    * signatures collide corpus-wide and banded LSH degenerates to the
    * quadratic pair space (measured: 176 s -> ~2 s at sf0.1). */
  def minhashSignatures(docs: DataFrame, textCol: String, numHashes: Int,
                        nShingle: Int = 1): DataFrame = {
    graft.plans.GraftExtensions.register(docs.sparkSession)
    docs
      .select(col("doc_id"),
        call_function("graft_minhash", split(col(textCol), " "),
          lit(nShingle), lit(numHashes)).as("sig"))
      .filter(size(col("sig")) > 0) // docs with fewer than nShingle tokens
  }

  /** The banded-signature relation (doc_id, sig, band, band_key) that
    * both the batch LSH tier and the streaming near-dup twin key their
    * bucket joins / keyed state on. Pure scan-local projections (native
    * minhash kernel + band slicing) — legal inside a streaming plan. */
  def bandedSignatures(docs: DataFrame, textCol: String, numHashes: Int,
                       nShingle: Int, bands: Int): DataFrame =
    minhashSignatures(docs, textCol, numHashes, nShingle)
      .select(col("doc_id"), col("sig"),
        posexplode(bandKeys(col("sig"), bands)).as(Seq("band", "band_key")))

  /** Split a signature into `bands` equal chunks, each rendered as a
    * joinable string key. */
  private def bandKeys(sig: Column, bands: Int): Column = {
    val rows = floor(size(sig).cast("double") / lit(bands.toDouble)).cast("int")
    transform(sequence(lit(0), lit(bands - 1)),
      b => concat_ws(",", slice(sig, b * rows + lit(1), rows)))
  }

  /** Banded LSH over minhash signatures: docs sharing any band bucket
    * become candidate pairs; estimate Jaccard as the matching-signature
    * fraction. One shuffle on (band, band-key) — never quadratic in the
    * corpus, which is the whole point at 100 TB.
    *
    * `maxBucket` is the hot-bucket safety valve: a degenerate band key
    * (boilerplate shingles, near-constant docs) holds b docs and emits
    * b² candidate pairs — one pathological bucket can dwarf the rest of
    * the job. Buckets past the cap keep their `maxBucket` lowest
    * doc_ids ([[capHotKeys]]) — the exact membership the streaming
    * twin's freeze-at-cap state holds, so stream==batch parity covers
    * over-cap buckets too; a dropped TRUE near-dup pair still has
    * bands-1 more chances to collide in a healthy bucket. */
  def minhashLshPairs(sigsIn: DataFrame, bands: Int,
                      maxBucket: Int = 10000): DataFrame = {
    // The signature relation appears 4x in this plan (both sides of the
    // band self-join + both estimate joins) and Spark re-executes each
    // occurrence — materialize it once (it is small: docs x numHashes).
    val sigs = sigsIn.localCheckpoint(false)
    val bandedAll = sigs.select(col("doc_id"),
      posexplode(bandKeys(col("sig"), bands)).as(Seq("band", "band_key")))
    val banded = capHotKeys(bandedAll, Seq("band", "band_key"), maxBucket)
    // Candidate pairs carry only ids through the shuffle+distinct; the
    // signatures (small: docs x numHashes longs) re-join afterwards —
    // broadcast when they fit, one pair-keyed shuffle when not.
    val pairs = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
      .distinct()
    pairs
      .join(sigs.select(col("doc_id").as("ida"), col("sig").as("siga")), "ida")
      .join(sigs.select(col("doc_id").as("idb"), col("sig").as("sigb")), "idb")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("siga"), col("sigb"), (x, y) => x === y), x => x))
          .cast("double") / size(col("siga")).cast("double"))
      .select("ida", "idb", "est_jaccard")
  }

  // --- SimHash (scale tier) --------------------------------------------

  /** 64-bit SimHash per document: per-bit ±1 votes over distinct token
    * hashes. Computed by the native `graft_simhash` Catalyst expression
    * (plans.TextHashes) — a scan-local projection, ZERO shuffles. The
    * earlier formulation (explode tokens + groupBy(doc_id) with 64 vote
    * aggregates) shuffled the exploded token relation for every corpus
    * pass; same fingerprints (identical hash + vote scheme), one less
    * shuffle, ~2x faster at sf0.1. */
  def simhash(docs: DataFrame, textCol: String): DataFrame = {
    graft.plans.GraftExtensions.register(docs.sparkSession)
    docs.select(col("doc_id"),
      call_function("graft_simhash", split(col(textCol), " ")).as("simhash"))
  }

  /** Hamming distance between two 64-bit hashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Banded simhash near-dup pairs. Pigeonhole: a pair within hamming
    * distance `maxHamming` <= 3 differs in at most 3 of the 4 16-bit
    * words of its fingerprint, so it must agree on at least one word —
    * candidates join on (word index, word value), a hash JOIN, never
    * the O(n²) all-pairs space (which would defeat the point of
    * simhash). Exact hamming verifies within candidates.
    *
    * `maxBucket` defaults LOWER than the minhash tier's (1000 vs
    * 10000) because the band space is structurally smaller: each of
    * the 4 words has only 2^16 values, so word-bucket occupancy grows
    * LINEARLY with the corpus once n >> 2^16 (minhash band keys are
    * 16 concatenated 64-bit minima — effectively unbounded key
    * space). A capped bucket still verifies cap²/2 candidate pairs,
    * so the cap IS the per-bucket verify budget: 10000 allowed 50M
    * pairs per degenerate bucket, which the first 6M-row-lineitem
    * rung measured as a 276 s query (~400x its sf0.1 cost); at 1000
    * the same corpus verifies in seconds. Past ~10^6 docs the honest
    * scale path is the wider parameterized fingerprint —
    * [[simhashPairsWide]], whose 64-bit band words never saturate —
    * not a deeper bucket budget. */
  def simhashPairs(docs: DataFrame, textCol: String, maxHamming: Int = 3,
                   maxBucket: Int = 1000): DataFrame = {
    require(maxHamming <= 3, s"4-word banding only covers hamming <= 3, got $maxHamming")
    // fingerprints feed both sides of the band join and both verify
    // joins — materialize once (id + one long per doc).
    val h = simhash(docs, textCol).localCheckpoint(false)
    val wordsAll = h.select(col("doc_id"),
      posexplode(array((0 until 4).map(w =>
        shiftright(col("simhash"), 16 * w).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("w", "word")))
    // hot-word cap: same quadratic-bucket safety valve as minhash LSH
    // (keep-first-N — unified with the streaming freeze-at-cap)
    val words = capHotKeys(wordsAll, Seq("w", "word"), maxBucket)
    val cand = words.as("a")
      .join(words.as("b"),
        col("a.w") === col("b.w") && col("a.word") === col("b.word") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
      .distinct()
    cand
      .join(h.select(col("doc_id").as("ida"), col("simhash").as("ha")), "ida")
      .join(h.select(col("doc_id").as("idb"), col("simhash").as("hb")), "idb")
      .withColumn("dist", hamming(col("ha"), col("hb")))
      .filter(col("dist") <= maxHamming)
      .select("ida", "idb", "dist")
  }

  /** Corpus-size ceiling for the 4×16-bit banding of [[simhashPairs]]:
    * above it the declared `dedup_simhash_docs` key switches to
    * [[simhashPairsWide]] (the autoPlanes rule applied to band width —
    * r15 verdict item 1). The 16-bit tier's band-key space is 2^16 per
    * word, so word-bucket occupancy grows linearly with the corpus and
    * real-text skew drives hot buckets into the cap well before the
    * uniform 2^16 crossover: the sf1 rung (50k docs) already measured
    * the narrow tier at 2.4× the wide tier (12.4 s vs 5.2), and sf10
    * (500k docs) at 2.8–4.3× (119–250 s vs 43–58, bucket-skew
    * variance). 2^14 keeps every measured saturation point on the wide
    * tier while the gate-SF corpora (≤ 5000 docs) stay on the 16-bit
    * tier the rows-only ledger pins. */
  private[graft] val SimhashNarrowMax: Long = 1L << 14

  /** Tier selector for the declared simhash key — split out so the spec
    * can pin the crossover without a 16k-doc fixture. */
  private[graft] def simhashUseWide(nDocs: Long): Boolean =
    nDocs > SimhashNarrowMax

  /** Corpus-size ceiling for the full inverted-index exact n-gram
    * Jaccard tier of the declared `dedup_ngram_jaccard` key: above it
    * the key switches to [[jaccardPairsNgramPrefix]] — the SAME exact
    * relation (prefix filtering is complete by the pigeonhole theorem;
    * SimilaritySpec pins equality on the real corpus AND on 60
    * property-random corpora), so unlike the simhash crossover this
    * auto-tier cannot change even one output row. The index tier's
    * candidate space is Σ df² over ALL shingles, corpus-quadratic on
    * small-vocab (adversarial) text: the sf1 rung (50k docs) measured
    * it at 96–191 s across rounds vs 76 s for the prefix tier on the
    * same data, and the gap widens with n. 2^13 keeps the gate-SF
    * corpora (≤ 5000 docs) on the bit-identical index-tier anchor the
    * ledger has pinned since r5, while every rung above runs the
    * provably-equal prefix plan. */
  private[graft] val NgramIndexMax: Long = 1L << 13

  /** Tier selector for the declared exact-Jaccard key — split out so
    * the spec can pin the crossover without a 8k-doc fixture. */
  private[graft] def ngramUsePrefix(nDocs: Long): Boolean =
    nDocs > NgramIndexMax

  /** Parameterized WIDE simhash fingerprint: `words` independent
    * 64-bit simhash words per document (native `graft_simhash_wide`
    * kernel — one scan-local pass; word w votes with hashes under
    * XXH64 seed 42+w, and word 0 is bit-identical to [[simhash]]'s
    * fingerprint, which anchors the wide tier to the 64-bit one in
    * PlansSpec). Returns (doc_id, fps array<long>). */
  def simhashWide(docs: DataFrame, textCol: String, words: Int): DataFrame = {
    graft.plans.GraftExtensions.register(docs.sparkSession)
    docs.select(col("doc_id"),
      call_function("graft_simhash_wide",
        split(col(textCol), " "), lit(words)).as("fps"))
  }

  /** The >10⁶-doc simhash near-dup tier (VERDICT r11 item 1b): banded
    * candidates over the WIDE fingerprint. Pigeonhole: a pair within
    * hamming `maxHamming <= words-1` across the whole words×64-bit
    * fingerprint differs in at most `words-1` of its 64-bit words, so
    * it must agree EXACTLY on at least one word — candidates join on
    * (word index, word value), then exact hamming over the full
    * fingerprint verifies.
    *
    * Why this is the scale path where [[simhashPairs]] stops: the
    * 4×16-bit banding's key space is 2^16 per word, so word-bucket
    * occupancy grows LINEARLY once n >> 2^16 and the hot-bucket cap
    * becomes the operative budget (the sf1 rung measured exactly that
    * blowup). Here each band key ranges over the full 2^64 space —
    * two docs share a band key only when 64 simhash bits agree
    * exactly, which for non-near-dup pairs is vanishingly rare at any
    * corpus size, so occupancy stays O(near-dup group size) and the
    * cap reverts to a true safety valve. The trade is semantic width:
    * hamming ≤ 3 over 256 bits is a proportionally TIGHTER near-dup
    * criterion than over 64 bits (votes per bit are the same, bits
    * 4× more) — the threshold is a knob calibrated per corpus, and
    * the banded==all-pairs equivalence is spec-proven at the wide
    * setting itself (SimilaritySpec), not inherited from the 64-bit
    * tier. */
  def simhashPairsWide(docs: DataFrame, textCol: String,
                       maxHamming: Int = 3, words: Int = 4,
                       maxBucket: Int = 1000): DataFrame = {
    require(maxHamming < words,
      s"$words-word banding only covers hamming <= ${words - 1}, got $maxHamming")
    val h = simhashWide(docs, textCol, words).localCheckpoint(false)
    val wordsAll = h.select(col("doc_id"),
      posexplode(col("fps")).as(Seq("w", "word")))
    val banded = capHotKeys(wordsAll, Seq("w", "word"), maxBucket)
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.w") === col("b.w") && col("a.word") === col("b.word") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
      .distinct()
    cand
      .join(h.select(col("doc_id").as("ida"), col("fps").as("fa")), "ida")
      .join(h.select(col("doc_id").as("idb"), col("fps").as("fb")), "idb")
      .withColumn("dist", fpHamming(col("fa"), col("fb")))
      .filter(col("dist") <= maxHamming)
      .select("ida", "idb", "dist")
  }

  // --- edit-distance near-dup: pigeonhole banding (scale tier) ---------

  /** Exact edit-distance pairs within (lang, n_chars) blocks — the
    * all-pairs-in-block candidate shape the declared
    * `dedup_editdist_pairs` query uses. Input contract: (doc_id, lang,
    * text, n_chars). Correct at any size, but candidates grow as
    * n²/|blocks| with a FIXED block space — the sf10 rung measured the
    * drift (7.7 → 61.2 s on 3.3× docs). [[editdistBandedPairs]] is the
    * same relation with sub-quadratic candidates. */
  def editdistBlockPairs(c: DataFrame, maxDist: Int): DataFrame = {
    graft.plans.GraftExtensions.register(c.sparkSession)
    val a = c.select(col("doc_id").as("ida"), col("lang").as("la"),
      col("text").as("ta"), col("n_chars").as("na"))
    val b = c.select(col("doc_id").as("idb"), col("lang").as("lb"),
      col("text").as("tb"), col("n_chars").as("nb"))
    a.join(b, col("la") === col("lb") && col("na") === col("nb") &&
        col("ida") < col("idb"))
      .withColumn("dist", call_function("graft_editdist",
        col("ta"), col("tb"), lit(maxDist)))
      .filter(col("dist") >= 0)
      .select("ida", "idb", "dist")
  }

  /** The SAME relation as [[editdistBlockPairs]] with PIGEONHOLE-banded
    * candidates (PartEnum-style): split each text into `maxDist + 1`
    * contiguous segments at integer thirds — at most `maxDist` edits
    * must leave ≥ 1 segment untouched, and that segment's image in the
    * partner string (equal length, by the block key) sits at a shift
    * bounded by the net insertions before it, i.e. within
    * ±maxDist. So candidates are a hash JOIN on (lang, n_chars, seg_no,
    * segment text), with the higher-id side emitting each segment
    * window at every shift in [-maxDist, maxDist] — a superset of the
    * true pairs by the pigeonhole argument, then the native Ukkonen
    * `graft_editdist` kernel verifies. Segment keys are ~n/3 chars, so
    * bucket population is driven by actual near-duplicate text, not by
    * the (lang, length) block's corpus-linear occupancy: candidates
    * scale with TRUE pair count. Docs shorter than `maxDist + 1` chars
    * cannot be 3-partitioned and take the block-local all-pairs path
    * (bounded: equal-length sub-3-char strings).
    *
    * Everything here is raw substring arithmetic on literal offsets —
    * a DuckDB oracle reproduces candidates and verification exactly,
    * so the banded tier carries a FULL oracle, not a rows-only pin. */
  def editdistBandedPairs(c: DataFrame, maxDist: Int): DataFrame = {
    graft.plans.GraftExtensions.register(c.sparkSession)
    val nSeg = maxDist + 1
    val base = c.selectExpr("doc_id AS id", "lang AS l", "n_chars AS n", "text AS t")
    // stack(nSeg, segNo, start, len, ...): boundaries at integer
    // fractions — segment i covers (((i-1)*n) div nSeg, (i*n) div nSeg]
    val stackExpr = (1 to nSeg).map { i =>
      s"$i, CAST(((${i - 1} * n) div $nSeg) + 1 AS INT), " +
        s"CAST((($i * n) div $nSeg) - ((${i - 1} * n) div $nSeg) AS INT)"
    }.mkString(s"stack($nSeg, ", ", ", ") AS (seg, st, ln)")
    val segged = base.selectExpr("id", "l", "n", "t", stackExpr).where("ln > 0")
    val ka = segged.selectExpr("id", "l", "n", "seg", "substring(t, st, ln) AS k")
    val shifts = (-maxDist to maxDist).mkString("array(", ",", ")")
    val kb = segged
      .selectExpr("id", "l", "n", "t", "seg", "st", "ln", s"explode($shifts) AS d")
      .where("st + d >= 1 AND st + d + ln - 1 <= n")
      .selectExpr("id", "l", "n", "seg", "substring(t, st + d, ln) AS k")
    val banded = ka.as("x").join(kb.as("y"),
        col("x.l") === col("y.l") && col("x.n") === col("y.n") &&
          col("x.seg") === col("y.seg") && col("x.k") === col("y.k") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("ida"), col("y.id").as("idb"))
    val shortDocs = base.filter(col("n") < nSeg)
    val shortPairs = shortDocs.select(col("id").as("ida"), col("l").as("la"), col("n").as("na"))
      .join(shortDocs.select(col("id").as("idb"), col("l").as("lb"), col("n").as("nb")),
        col("la") === col("lb") && col("na") === col("nb") && col("ida") < col("idb"))
      .select("ida", "idb")
    val cand = banded.union(shortPairs).distinct()
    cand
      .join(c.select(col("doc_id").as("ida"), col("text").as("ta")), "ida")
      .join(c.select(col("doc_id").as("idb"), col("text").as("tb")), "idb")
      .withColumn("dist", call_function("graft_editdist",
        col("ta"), col("tb"), lit(maxDist)))
      .filter(col("dist") >= 0)
      .select("ida", "idb", "dist")
  }

  // --- hyperplane-LSH ANN (scale tier) ---------------------------------

  /** Deterministic pseudo-random hyperplane component for plane j,
    * dim i — splitmix64-style bit mixing of (j, i) (no RNG state,
    * reproducible on any cluster — and on the DuckDB oracle, which
    * embeds these exact double literals).
    *
    * The mixing matters: the previous Weyl-style generator
    * `(a*(j*64+i+1)) % p` is affine in i with the same stride for
    * every j, so distinct "hyperplanes" were near-copies of each other
    * (measured pairwise |cos| up to 1.0) — collapsing every LSH table
    * onto a handful of effective planes and capping ANN recall at
    * ~0.28 no matter how many tables were added. Splitmix-mixed
    * planes are decorrelated (pairwise cos std ≈ 1/√64), restoring
    * the textbook `1-(1-p^b)^L` amplification. */
  private[graft] def planeComponent(j: Int, i: Int): Double = {
    var z = j.toLong * 0x9E3779B97F4A7C15L + i.toLong * 0xC2B2AE3D27D4EB4FL +
      0x165667B19E3779F9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= (z >>> 31)
    (z >>> 11).toDouble / 9007199254740992.0 - 0.5 // high 53 bits -> [0,1)
  }

  /** Sign-bit bucket of an embedding under `nPlanes` hyperplanes
    * starting at plane index `planeOffset` (offsets give independent
    * hash tables for LSH amplification). */
  def lshBucket(embedding: Column, nPlanes: Int, dim: Int,
                planeOffset: Int = 0): Column = {
    val e = toDoubleArr(embedding)
    (0 until nPlanes).map { j =>
      val plane = array((0 until dim).map(i => lit(planeComponent(planeOffset + j, i))): _*)
      when(dot(e, plane) > 0.0, shiftleft(lit(1L), j)).otherwise(0L)
    }.reduce(_ + _)
  }

  /** Embedding near-dup pairs, candidate-then-verify: `nTables`
    * independent hyperplane-LSH tables generate candidates (pairs
    * sharing any table's bucket — a hash JOIN on (table, bucket), never
    * the quadratic pair space), then exact cosine verifies within
    * candidates. The 100 TB shape: one (table,bucket) shuffle of
    * id+bucket keys, one distinct over candidate ids, two id-equi joins
    * to re-attach vectors. Recall is the standard LSH OR-amplification
    * `1-(1-p^b)^L`; measured against the brute-force tier in tests.
    *
    * Every arithmetic step (plane dots, sign buckets, cosine) is a
    * sequential fold over deterministic literals, so a DuckDB oracle
    * reproduces the result bitwise — this is the oracle-checked dedup
    * path, not just a scale tier. */
  def cosineLshPairs(emb: DataFrame, nTables: Int, planesPerTable: Int,
                     dim: Int, minCos: Double): DataFrame =
    cosineLshPairsOver(cosinePrep(emb), nTables, planesPerTable, minCos)

  /** Plane count for a constant per-table bucket occupancy: with
    * `planes` sign bits a table has 2^planes buckets, so occupancy is
    * n / 2^planes — choosing `planes = ceil(log2(n / targetBucket))`
    * pins occupancy into [targetBucket/2, targetBucket] at ANY corpus
    * size, which is what keeps the candidate join's per-bucket b²/2
    * term (and hence the whole tier's cost) scaling linearly instead
    * of the fixed-plane quadratic drift the sf1 rung measured (10.3×
    * on 10× data at literal 8 planes). `base` is the floor: below
    * n = targetBucket · 2^base the formula would under-bucket tiny
    * corpora, and the gate-SF corpora (≤ 2000 vectors) all sit under
    * the default floor (8 planes, n ≤ 8192), so the auto tier is
    * bit-identical to the literal-8 oracle SQL exactly where the
    * DuckDB gate runs. */
  private[graft] def autoPlanes(n: Long, base: Int = 8,
                                targetBucket: Int = 32): Int = {
    val needed = math.ceil(math.log(math.max(1L, n).toDouble / targetBucket)
      / math.log(2.0)).toInt
    math.max(base, needed)
  }

  /** [[cosineLshPairs]] with the plane count WIRED to the corpus size
    * (VERDICT r11 item 1a): one count over the already-checkpointed
    * projection picks `autoPlanes(n)`, then the identical
    * candidate-then-verify plan runs at that width. At the gate SFs
    * the floor makes this the literal-8 operator (spec-pinned); at
    * 10×+ corpora the extra planes hold bucket occupancy constant. */
  def cosineLshPairsAuto(emb: DataFrame, nTables: Int, dim: Int,
                         minCos: Double, basePlanes: Int = 8,
                         targetBucket: Int = 32,
                         knownN: Option[Long] = None): DataFrame = {
    val v0 = cosinePrep(emb)
    // knownN (typically the parquet footer row count — a metadata read)
    // keeps plan construction pure; without it an eager count() runs a
    // Spark job just to BUILD the DataFrame (r12 ADVICE). Same planes
    // either way — spec-pinned.
    val planes = autoPlanes(knownN.getOrElse(v0.count()), basePlanes, targetBucket)
    cosineLshPairsOver(v0, nTables, planes, minCos)
  }

  /** Gate for the widen-before-checkpoint shuffle (r12 VERDICT weak 1):
    * widening to full shuffle width pays off only when (a) the scan is
    * materially NARROWER than the target — `scanParts * 2 <= width`,
    * i.e. the shuffle at least doubles parallelism — and (b) the corpus
    * is big enough that per-core work dominates the shuffle's own cost
    * (`bytes >= width * minPartBytes`). The gate-SF corpora (≤ a few MB
    * of vectors) fail (b), so the sub-second ANN queries skip the
    * repartition they never needed (BENCH_r12 measured it as the only
    * per-query regression of the round, +0.2-0.3 s at sf0.1); the sf10
    * rung's 55 MB corpus passes both and keeps the full-width fix. */
  private[graft] def shouldWiden(scanParts: Int, width: Int, bytes: Long,
                                 minPartBytes: Long): Boolean =
    scanParts * 2 <= width && bytes >= width * minPartBytes

  /** Per-partition byte floor under which a corpus is "small" for
    * [[shouldWiden]] (compressed input bytes; env-tunable). */
  private[graft] val PrepMinPartBytes: Long =
    sys.env.getOrElse("GRAFT_PREP_MIN_PART_BYTES", (256L * 1024).toString).toLong

  /** Total compressed bytes behind a DataFrame's file scan (0 for
    * in-memory relations — those never need the widen shuffle). Driver
    * metadata listing only, no job. */
  private[graft] def inputBytes(df: DataFrame): Long = {
    val files = df.inputFiles
    if (files.isEmpty) 0L
    else {
      val conf = df.sparkSession.sessionState.newHadoopConf()
      files.map { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        try p.getFileSystem(conf).getFileStatus(p).getLen
        catch { case _: Exception => 0L }
      }.sum
    }
  }

  /** Repartition `df` to full shuffle width iff [[shouldWiden]] says the
    * shuffle buys real parallelism — the raw scan's partition count
    * (file bytes / maxPartitionBytes) is what localCheckpoint freezes,
    * so a narrow scan would serialize every downstream corpus pass (2
    * partitions at the sf10 rung pre-fix). Values are unchanged either
    * way: all kernels are deterministic per-row and the caps are
    * window-ordered. */
  private[graft] def widenForCheckpoint(
      df: DataFrame, minPartBytes: Long = PrepMinPartBytes): DataFrame = {
    val width = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    if (shouldWiden(df.rdd.getNumPartitions, width, inputBytes(df), minPartBytes))
      df.repartition(width)
    else df
  }

  /** Text-table variant of [[widenForCheckpoint]] with a far lower
    * byte floor: per-byte CPU on the documents table (shingle
    * explodes, per-shingle digests, span kernels) is ~100× a
    * relational scan's, so a corpus that is tiny in BYTES still
    * carries multi-second scan-stage work — measured at sf0.1 every
    * text key ran its dense scan stage on ONE task (0.59 MB file vs
    * the 2.2 MB calibrated split) while 31 cores idled. The widen
    * shuffle ships the raw (doc_id, text) rows once (sub-MB at the
    * gate SFs, ~100 ms) and buys full-width parallelism for
    * everything scan-local above it. At cluster scale the
    * [[shouldWiden]] partition-count arm keeps this a no-op: a real
    * corpus scans wider than the session's shuffle width, so the plan
    * is unchanged exactly where an extra shuffle would hurt; literal
    * in-memory fixtures (inputBytes 0) are never widened, keeping
    * spec plans clean. */
  private[graft] def widenTextScan(df: DataFrame): DataFrame =
    widenForCheckpoint(df, TextMinPartBytes)

  private[graft] val TextMinPartBytes: Long =
    sys.env.getOrElse("GRAFT_TEXT_MIN_PART_BYTES", (8L * 1024).toString).toLong

  /** (id, vec, norm) projection, materialized once — it is reused on
    * both sides of the candidate join and both verify joins (and the
    * auto variant's count reads it for free). */
  private def cosinePrep(emb: DataFrame): DataFrame = {
    graft.plans.GraftExtensions.register(emb.sparkSession)
    widenForCheckpoint(emb
      .select(col("vec_id"), toDoubleArr(col("embedding")).as("e"))
      .withColumn("n", sqrt(dotN(col("e"), col("e")))))
      .localCheckpoint(false)
  }

  private def cosineLshPairsOver(v: DataFrame, nTables: Int,
                                 planesPerTable: Int, minCos: Double): DataFrame = {
    // Buckets via the native graft_lsh_buckets kernel (codegen'd single
    // pass; bitwise equal to the lshBucket HOF and the DuckDB oracle).
    // The bucket projection sits ABOVE the checkpoint: only the keyed
    // branch computes it; the verify joins read (id, e, n) alone.
    val keyed = v
      .withColumn("bks", call_function("graft_lsh_buckets",
        col("e"), lit(0), lit(planesPerTable), lit(nTables)))
      .select(col("vec_id"), posexplode(col("bks")).as(Seq("tbl", "bucket")))
    val cand = keyed.as("a")
      .join(keyed.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("ida"), col("b.vec_id").as("idb"))
      .distinct()
    cand
      .join(v.select(col("vec_id").as("ida"), col("e").as("ea"), col("n").as("an")), "ida")
      .join(v.select(col("vec_id").as("idb"), col("e").as("eb"), col("n").as("bn")), "idb")
      .withColumn("score", dotN(col("ea"), col("eb")) / (col("an") * col("bn")))
      .filter(col("score") >= minCos)
      .select("ida", "idb", "score")
  }

  // --- IVF ANN (scale tier) --------------------------------------------

  /** IVF coarse quantizer: Lloyd's k-means with DETERMINISTIC seeding
    * (the k vectors with the lowest xxhash64(vec_id) — no RNG state)
    * and a fixed number of iterations. Returns the centroids as a
    * DRIVER-side array (k x dim doubles — the same payload a broadcast
    * would ship; MLlib's k-means keeps exactly this driver loop).
    *
    * Each Lloyd pass is ONE corpus scan: nearest-centroid assignment
    * happens in the projection ([[assign]] — one fused
    * `graft_cosine_argmax` kernel against the flattened centroid
    * matrix literal, no crossJoin, no window),
    * and the new means reduce through per-dimension partial-sum
    * aggregates, so the shuffle per pass is k rows x (dim+1) columns
    * PER PARTITION (map-side combine) — corpus rows never shuffle and
    * nothing explodes. The previous posexplode + per-(centroid,dim)
    * groupBy + collect_list shape shuffled corpus x dim exploded rows
    * every pass — the round-4 verdict's one named scale-killer. */
  def ivfCentroids(candidates: DataFrame, k: Int,
                   iters: Int = 3): Array[(Int, Array[Double])] = {
    val vecs = widenForCheckpoint(candidates
      .select(col("vec_id"), toDoubleArr(col("embedding")).as("v")))
      .localCheckpoint(false)
    val cent = lloyd(vecs, k, iters)
    // every Lloyd pass materialized via collect(); nothing downstream
    // reads the checkpoint — free its blocks now.
    graft.plans.Checkpoints.unpersist(vecs)
    cent
  }

  /** Lloyd iterations over an already-projected, already-materialized
    * (vec_id, v) relation — see [[ivfCentroids]] for the shape. */
  private def lloyd(vecs: DataFrame, k: Int,
                    iters: Int): Array[(Int, Array[Double])] = {
    var cent: Array[(Int, Array[Double])] = vecs
      .withColumn("__h", xxhash64(col("vec_id")))
      .orderBy("__h").limit(k)
      .select(col("v")).collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](0).toArray) }
    for (_ <- 1 to iters) {
      val dim = cent.head._2.length
      val sums = assign(vecs, cent)
        .groupBy("centroid_id")
        .agg(count(lit(1)).as("__n"),
          (0 until dim).map(i => sum(element_at(col("v"), i + 1)).as(s"__s$i")): _*)
        .collect()
      val moved = sums.map { r =>
        val n = r.getLong(1).toDouble
        r.getInt(0) -> Array.tabulate(dim)(i => r.getDouble(i + 2) / n)
      }.toMap
      // a centroid that captured no vectors keeps its position (the
      // standard empty-cluster rule; deterministic)
      cent = cent.map { case (id, c) => (id, moved.getOrElse(id, c)) }
    }
    cent
  }

  /** Centroid matrix flattened row-major in id order — the ONE literal
    * the fused kernels take, so the expression tree stays
    * constant-size no matter how large the auto-scaled k grows. */
  private def flatCentroids(cent: Array[(Int, Array[Double])]): Seq[Double] =
    cent.sortBy(_._1).flatMap(_._2).toSeq

  /** Nearest-centroid assignment as a PURE PROJECTION: ONE fused
    * `graft_cosine_argmax` kernel against the flattened centroid
    * matrix literal (internal loop = the exact graft_cosine fold per
    * centroid; ties -> lowest centroid id, matching the old
    * struct-max rule). Zero joins, zero shuffles, zero windows — and,
    * unlike the previous k-struct array expression, constant codegen
    * size: at the auto-scaled k ≈ √n (142 at the sf1 rung) the
    * k-literal formulation's generated code dwarfed the probe savings
    * (measured 68 s vs 57 s fixed at sf1); the fused kernel makes k
    * a data dimension, not an expression dimension. */
  private def assign(vecs: DataFrame,
                     cent: Array[(Int, Array[Double])]): DataFrame = {
    graft.plans.GraftExtensions.register(vecs.sparkSession)
    val dim = cent.head._2.length
    vecs.withColumn("centroid_id",
      call_function("graft_cosine_argmax", col("v"),
        typedlit(flatCentroids(cent)), lit(dim)))
  }

  /** IVF search, candidate-then-rank-then-verify: assign candidates to
    * their nearest centroid once (the "index" — a projection over one
    * candidate scan), each query probes its `nprobe` closest centroid
    * lists (chosen by sorting the per-centroid cosine structs in the
    * projection — no crossJoin, no window), and the probed candidates
    * are RANKED by 128-bit sign-fingerprint hamming (the same unbiased
    * angle estimator the LSH tier uses, σ(θ) ≈ 8°) so only the top
    * `maxCandidates` per query reach exact cosine scoring. Probing can
    * therefore cast a wide net (high recall) while per-query verify
    * cost stays corpus-independent — on this fixture's worst-case
    * near-orthogonal geometry, cell membership alone caps recall ~0.5,
    * while the default wide probe (12/16 cells) + 256-bit fp-rank +
    * 512 budget measures recall@10 ≈ 0.93 at sf0.1.
    *
    * 100 TB shape: ids + two fingerprint longs travel through the
    * candidate join and both ranking shuffles; the 64-double vectors
    * re-attach by id-equi join only for the ≤ maxCandidates survivors.
    * Recall is measured against cosineTopK in tests AND surfaced as
    * `ann_ivf_recall`. */
  def annIvfTopK(queries: DataFrame, candidates: DataFrame, topK: Int,
                 k: Int = 16, nprobe: Int = 12, iters: Int = 3,
                 maxCandidates: Int = 512, fpBits: Int = 256,
                 trained: Option[Array[(Int, Array[Double])]] = None): DataFrame =
    annIvfTopKOver(queries, ivfPrep(candidates), topK, k, nprobe, iters,
      maxCandidates, fpBits, trained)

  /** (k, nprobe) for a corpus of n vectors (VERDICT r11 item 1c): the
    * textbook IVF sizing k ≈ √n (cell size √n, centroid scan k — the
    * balance point of the two terms), probing `probeFrac` of the cells
    * so per-query candidate volume is probeFrac·n/√n·√n = probeFrac·n
    * of the INDEX but only nprobe·(n/k) ≈ probeFrac·n fingerprints
    * actually ranked — at probeFrac = 0.2 that is 3.75× less scan
    * than the fixed k=16/nprobe=12 config's 75%. Below
    * `autoThreshold` the fixed gate-SF config is returned unchanged,
    * so the recall ≥ 0.9 pins at sf0.01/sf0.1 (n ≤ 2000) bind the
    * identical operator. NOTE the recall trade is corpus-geometry-
    * dependent: on THIS fixture's clusterless isotropic vectors,
    * candidate-gen recall ≈ the probed fraction (no sublinear index
    * does better on clusterless data — r11 scaladoc); on real
    * (clustered) embeddings nprobe cells capture the true neighbors
    * and the same sizing is genuinely sublinear AT recall. The sf1
    * recall artifact measures the trade instead of hiding it. */
  private[graft] def autoIvfParams(n: Long, autoThreshold: Long = 8192,
                                   probeFrac: Double = 0.2): (Int, Int) =
    if (n <= autoThreshold) (16, 12)
    else {
      val k = math.ceil(math.sqrt(n.toDouble)).toInt
      (k, math.max(12, math.ceil(k * probeFrac).toInt))
    }

  /** [[annIvfTopK]] with (k, nprobe) WIRED to the corpus size via
    * [[autoIvfParams]] — one count over the already-checkpointed
    * projection, then the identical index-probe-rank-verify plan. */
  def annIvfTopKAuto(queries: DataFrame, candidates: DataFrame, topK: Int,
                     iters: Int = 3, maxCandidates: Int = 512,
                     fpBits: Int = 256, autoThreshold: Long = 8192,
                     probeFrac: Double = 0.2,
                     knownN: Option[Long] = None,
                     trained: Option[Array[(Int, Array[Double])]] = None): DataFrame = {
    val cv = ivfPrep(candidates)
    // knownN: see cosineLshPairsAuto — footer-sourced corpus size keeps
    // DataFrame construction job-free.
    val (k, nprobe) = autoIvfParams(knownN.getOrElse(cv.count()),
      autoThreshold, probeFrac)
    annIvfTopKOver(queries, cv, topK, k, nprobe, iters, maxCandidates, fpBits,
      trained)
  }

  /** (id, vec) projection, materialized once — it feeds the Lloyd
    * passes, the index projection and the final verify join (and the
    * auto variant's count reads it for free). */
  private def ivfPrep(candidates: DataFrame): DataFrame = {
    graft.plans.GraftExtensions.register(candidates.sparkSession)
    // widen BEFORE the checkpoint when the gate says the scan is narrow
    // relative to the corpus: localCheckpoint freezes the scan's
    // partitioning, serializing every downstream corpus pass
    // (assignment argmax, fingerprints) onto it — 2 cores at the sf10
    // rung. [[widenForCheckpoint]] skips the shuffle for gate-SF
    // corpora where it cost more than it bought.
    widenForCheckpoint(candidates
      .select(col("vec_id"), toDoubleArr(col("embedding")).as("v")))
      .localCheckpoint(false)
  }

  private def annIvfTopKOver(queries: DataFrame, cv: DataFrame, topK: Int,
                             k: Int, nprobe: Int, iters: Int,
                             maxCandidates: Int, fpBits: Int,
                             trained: Option[Array[(Int, Array[Double])]] = None): DataFrame = {
    graft.plans.GraftExtensions.register(queries.sparkSession)
    val nWords = (fpBits + 63) / 64
    def fps(df: DataFrame, vec: String): DataFrame = df
      .withColumn("fp", fpWords(col(vec), 4096, nWords))
    // `trained`: a caller-held coarse quantizer (the query layer's
    // fingerprint-keyed store — training is once-per-corpus, like the
    // LM/DSIR literal maps); absent, train in place. Its size must
    // match the k this plan is sized for — autoIvfParams is computed
    // independently at each call layer, so a future threshold drift
    // would otherwise silently misalign nprobe sizing and cell
    // assignment instead of failing (r15 ADVICE).
    trained.foreach(t => require(t.length == k,
      s"trained quantizer has ${t.length} cells, expected $k"))
    val cent = trained.getOrElse(lloyd(cv, k, iters))
    // materialize the index ONCE (ids + centroid + fingerprint — a few
    // longs per corpus row). Without the barrier, codegen collapses the
    // fingerprint projection past the broadcast probe join and
    // re-evaluates the 256-bit lshBits kernel PER JOINED ROW — a
    // multiplicity of ~queries*nprobe/k that grows with the corpus
    // (the sf10 rung measured a single 940 s task doing exactly that).
    val index = fps(assign(cv, cent), "v")
      .select(col("vec_id").as("cid"), col("centroid_id"),
        col("fp").as("cf"))
      .localCheckpoint(false)
    // query -> its nprobe nearest centroids: ONE fused
    // graft_cosine_many kernel gives the per-centroid sims array,
    // then an array_sort over (-sim, id) structs BUILT FROM that
    // array (ascending => best sim first, ties lowest id). The HOF
    // runs over k elements of the tiny query relation only — the
    // constant-size-expression rule matters on the corpus-sized
    // assignment, not here, but sharing the kernel keeps one code
    // path. Same fold, same tie rule as the old k-struct literal.
    val dim = cent.head._2.length
    val qv = fps(queries.select(col("vec_id").as("qid"),
        toDoubleArr(col("embedding")).as("qe")), "qe")
      .localCheckpoint(false) // small by construction; feeds 3 branches
    val probes = qv
      .withColumn("__sims", call_function("graft_cosine_many",
        col("qe"), typedlit(flatCentroids(cent)), lit(dim)))
      .withColumn("__ranked", array_sort(
        transform(sequence(lit(0), lit(cent.length - 1)),
          i => struct((-element_at(col("__sims"), i + 1)).as("ns"),
            i.cast("int").as("cid")))))
      .withColumn("__p", explode(slice(col("__ranked"), 1, nprobe)))
      .select(col("qid"), col("fp").as("qf"),
        col("__p").getField("cid").as("centroid_id"))
    val wHam = Window.partitionBy(col("qid")).orderBy(col("ham").asc, col("cid"))
    val cand = index
      .join(broadcast(probes), Seq("centroid_id"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("ham", fpHamming(col("qf"), col("cf")))
      .select(col("qid"), col("cid"), col("ham"))
      .withColumn("hr", row_number().over(wHam))
      .filter(col("hr") <= maxCandidates)
      .select("qid", "cid")
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("cid"))
    cand
      .join(broadcast(qv.select("qid", "qe")), "qid")
      .join(cv.select(col("vec_id").as("cid"), col("v").as("ce")), "cid")
      .withColumn("score", call_function("graft_cosine", col("qe"), col("ce")))
      .select(col("qid"), col("cid"), col("score"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("qid"), col("cid"), col("score"), col("rnk"))
  }

  /** Bucketed ANN with multi-table OR-amplification plus MULTIPROBE
    * (the standard LSH index shape): `nTables` independent hyperplane
    * tables; each query probes its own bucket and, when `probeHamming`
    * > 0, every bucket within that hamming distance of it (sign-bit
    * flips of the least-confident planes are where near neighbors
    * land — probing them buys the recall of ~(1+nPlanes) extra tables
    * for zero extra index size). A candidate is compared iff it shares
    * ANY probed bucket in ANY table.
    *
    * `maxCandidates` caps the per-query verify budget: candidates are
    * ranked by the hamming distance between 128-bit sign FINGERPRINTS
    * (sign bits under 128 extra hyperplanes — an unbiased angle
    * estimator with σ(θ) ≈ π/√(4·fpBits) — ≈ 5.6° at the 256-bit
    * default, far tighter than bucket collision counts) and only the
    * top `maxCandidates` reach exact scoring. This makes per-query
    * cost corpus-independent even when multiprobe widens the net: the
    * default probeHamming=2 lifts candidate-generation recall to
    * ~0.995 at sf0.1, and the ranked 256 budget keeps 0.965 of it —
    * measured against brute force in SimilaritySpec and surfaced as
    * `ann_lsh_recall`.
    *
    * 100 TB shape (mirrors cosineLshPairs): only ids + bucket keys
    * travel through the candidate join and dedup; the ranking join
    * re-attaches two longs per side (the fingerprint), and the two
    * 64-double vectors re-attach by id-equi join only for the capped
    * survivors. Recall is measured against cosineTopK in tests AND
    * surfaced as the `ann_lsh_recall` query. */
  /** 64-bit sign-fingerprint words under planes starting at `base` —
    * an array so the estimator width (`fpBits`) is tunable: σ(θ) ≈
    * π/√(4·bits), so 256 bits halve the 128-bit ranking noise for two
    * extra longs per row. */
  private def fpWords(vec: Column, base: Int, nWords: Int): Column =
    array((0 until nWords).map(w =>
      call_function("graft_lsh_bits", vec, lit(base + 64 * w), lit(64))): _*)

  /** Hamming distance between two fingerprint-word arrays. */
  private def fpHamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y))),
      lit(0), (acc, x) => acc + x)

  def annLshTopK(queries: DataFrame, candidates: DataFrame, k: Int,
                 nPlanes: Int = 8, dim: Int = 64, nTables: Int = 12,
                 probeHamming: Int = 2, maxCandidates: Int = 256,
                 fpBits: Int = 256): DataFrame = {
    graft.plans.GraftExtensions.register(queries.sparkSession)
    val nWords = (fpBits + 63) / 64
    // fingerprint planes start far past the bucket planes (offset 4096)
    // so the estimator is independent of candidate generation. All sign
    // bits via the native graft_lsh_bits/graft_lsh_buckets kernels —
    // the plane dots are a codegen'd tight loop, not interpreted HOF
    // passes.
    def withKeys(df: DataFrame, idName: String, vecName: String): DataFrame =
      // full-width before the checkpoint freezes a narrow scan's
      // partitioning — gated like cosinePrep. Caveat (r13 ADVICE):
      // inputBytes sees the TABLE's files, not the filter's
      // selectivity, so at rung scale the 1%-of-corpus query side
      // passes the byte gate and widens too. That is acceptable by
      // construction: the widen exists to unfreeze checkpoint
      // parallelism, and a too-wide tiny relation costs one small
      // shuffle (the pre-gate behavior everywhere) while a too-narrow
      // big one serializes every downstream pass — the asymmetric
      // failure the gate guards. Only the gate-SF corpora, where the
      // byte floor fails for BOTH sides, needed the skip
      // (BENCH_r12's only per-query regression).
      widenForCheckpoint(df.select(col("vec_id").as(idName),
          toDoubleArr(col("embedding")).as(vecName))
        .withColumn("fp", fpWords(col(vecName), 4096, nWords)))
    // vectors + norms + fingerprints are computed once per side and
    // re-attached by id; each relation feeds 2-3 plan branches.
    val qv = withKeys(queries, "qid", "qe")
      .withColumn("qn", sqrt(dotN(col("qe"), col("qe"))))
      .localCheckpoint(false)
    val cv = withKeys(candidates, "cid", "ce")
      .withColumn("cn", sqrt(dotN(col("ce"), col("ce"))))
      .localCheckpoint(false)
    def tableBuckets(vec: Column): Column =
      call_function("graft_lsh_buckets", vec, lit(0), lit(nPlanes), lit(nTables))
    val cKeyed = cv.select(col("cid"),
      posexplode(tableBuckets(col("ce"))).as(Seq("tbl", "bucket")))
    val qKeyed = qv.select(col("qid"),
      posexplode(tableBuckets(col("qe"))).as(Seq("tbl", "bucket")))
    // multiprobe: all bucket perturbations with <= probeHamming bit
    // flips, generated combinatorially (C(p,0..h) masks) — the earlier
    // 0..2^p enumeration was fine at the literal 8 planes but is
    // 2^16+ scans once the auto knob widens the bucket space
    val masks: Seq[Long] = (0 to probeHamming).flatMap(h =>
      (0 until nPlanes).combinations(h).map(_.foldLeft(0L)((m, i) => m | (1L << i))))
    val probes = qKeyed.select(col("qid"), col("tbl"),
      explode(array(masks.map(m => col("bucket").bitwiseXOR(lit(m))): _*)).as("bucket"))
    // candidate generation: hash join on (table, bucket); ids only
    // through the join + distinct (VERDICT r2: never shuffle vectors
    // into the dedup). Then rank by fingerprint hamming and cap.
    val wHam = Window.partitionBy(col("qid"))
      .orderBy(col("ham").asc, col("cid"))
    val cand = cKeyed.join(broadcast(probes), Seq("tbl", "bucket"))
      .filter(col("qid") =!= col("cid"))
      .select("qid", "cid")
      .distinct()
      .join(broadcast(qv.select(col("qid"), col("fp").as("qf"))), "qid")
      .join(cv.select(col("cid"), col("fp").as("cf")), "cid")
      .withColumn("ham", fpHamming(col("qf"), col("cf")))
      .withColumn("hr", row_number().over(wHam))
      .filter(col("hr") <= maxCandidates)
      .select("qid", "cid")
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("cid"))
    cand
      .join(broadcast(qv.select("qid", "qe", "qn")), "qid")
      .join(cv.select("cid", "ce", "cn"), "cid")
      .withColumn("score", dotN(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("cid"), col("score"), col("rnk"))
  }

  /** PORTABLE-oracle ANN top-k (r15 verdict item 3): the same
    * multi-table + multiprobe candidate generation as [[annLshTopK]],
    * with every engine-side shortcut that a DuckDB oracle cannot
    * replay REMOVED — no fingerprint-ranked candidate cap (every
    * candidate is exact-scored), buckets from the deterministic
    * literal-plane family ([[planeComponent]], the generator
    * `dedup_cosine_pairs` already hash-matches through), cosine as the
    * same sequential fold both engines replay bitwise. Candidates are
    * a hash JOIN on (table, probed bucket) — the probe relation is
    * queries × tables × C(planes, ≤probeHamming) masks, broadcast —
    * then exact cosine + a per-query row_number. This is the
    * ORACLE-GATE tier of the ANN family: the first end-to-end
    * hash-checked ANN top-k (candidate generation AND ranking), with
    * the capped/auto/IVF tiers as the declared scale paths (the cap is
    * precisely what makes per-query cost corpus-independent, and
    * precisely what an oracle can't see — here the per-bucket verify
    * budget is bounded by occupancy × tables × probes instead). */
  def annLshTopKPortable(queries: DataFrame, candidates: DataFrame, k: Int,
                         nTables: Int, planesPerTable: Int,
                         probeHamming: Int,
                         maxCos: Option[Double] = None,
                         maxBucket: Option[Int] = None): DataFrame = {
    val cv = cosinePrep(candidates)
    val qv = cosinePrep(queries)
    def keyed(v: DataFrame, id: String): DataFrame = v
      .withColumn("bks", call_function("graft_lsh_buckets",
        col("e"), lit(0), lit(planesPerTable), lit(nTables)))
      .select(col("vec_id").as(id), posexplode(col("bks")).as(Seq("tbl", "bucket")))
    // candidate-side occupancy cap (hard-negative tier): each
    // (table, bucket) enrolls only its `maxBucket` lowest vec_ids —
    // deterministic, so a SQL twin replays it with one QUALIFY
    // row_number(); bounds the candidate relation at tables × probes ×
    // cap per query REGARDLESS of corpus occupancy (the cap-free
    // distinct measured OOM at the sf10 rung: ~350k candidate rows per
    // query at 780/bucket occupancy). The portable top-k anchor stays
    // cap-free — its recall contract is completeness at the gate SFs.
    def capped(kdf: DataFrame, id: String): DataFrame = maxBucket.fold(kdf) { cap =>
      val w = Window.partitionBy(col("tbl"), col("bucket")).orderBy(col(id))
      kdf.withColumn("__r", row_number().over(w))
        .filter(col("__r") <= cap).drop("__r")
    }
    // C(planes, 0..h) flip masks — the annLshTopK multiprobe, mirrored
    // literally in the oracle SQL (each mask is an integer literal)
    val masks: Seq[Long] = (0 to probeHamming).flatMap(h =>
      (0 until planesPerTable).combinations(h)
        .map(_.foldLeft(0L)((m, i) => m | (1L << i))))
    val probes = keyed(qv, "qid").select(col("qid"), col("tbl"),
      explode(array(masks.map(m => col("bucket").bitwiseXOR(lit(m))): _*)).as("bucket"))
    val cand = capped(keyed(cv, "cid"), "cid").join(broadcast(probes), Seq("tbl", "bucket"))
      .filter(col("qid") =!= col("cid"))
      .select("qid", "cid")
      .distinct()
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("cid"))
    cand
      .join(broadcast(qv.select(col("vec_id").as("qid"),
        col("e").as("qe"), col("n").as("qn"))), "qid")
      .join(cv.select(col("vec_id").as("cid"),
        col("e").as("ce"), col("n").as("cn")), "cid")
      .withColumn("score", dotN(col("qe"), col("ce")) / (col("qn") * col("cn")))
      // hard-negative mode: drop probable POSITIVES (near-identical
      // vectors — an exact/near dup is not a negative) BEFORE ranking,
      // so the k slots fill with the closest surviving negatives
      .filter(maxCos.map(t => col("score") < t).getOrElse(lit(true)))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("cid"), col("score"), col("rnk"))
  }

  /** The PRODUCTION ANN configuration: portable literal-plane LSH
    * candidate generation (the [[annLshTopKPortable]] bucket/probe/cap
    * machinery) + int8-quantized exact-integer scoring (the
    * `sim_topk_quantized` arithmetic) — the two bandwidth levers a
    * 100 TB similarity pass composes. The verify join re-attaches
    * 64 ints + one double per side instead of 64 doubles (4× less
    * shuffle on the scoring join, the same cut the quantized brute
    * tier measures on the scan), and every step stays
    * DuckDB-replayable: buckets are sign folds over literal planes,
    * the bucket cap is one QUALIFY row_number, the global scale
    * m = max |component| is an exact max-agg, quantized components are
    * small integers, dots/norms are exact BIGINT sums, and the only
    * float steps are sqrt/divide of exact values. Zero-norm vectors
    * (fully quantized away) are excluded on BOTH sides, as in the
    * quantized brute tier. The scale is computed over `candidates`
    * (the corpus); pass queries drawn from the same corpus so both
    * engines quantize under the identical m. */
  def annLshTopKInt8(queries: DataFrame, candidates: DataFrame, k: Int,
                     nTables: Int, planesPerTable: Int,
                     probeHamming: Int,
                     maxBucket: Option[Int] = None): DataFrame = {
    graft.plans.GraftExtensions.register(queries.sparkSession)
    val cvd = candidates.select(col("vec_id"), toDoubleArr(col("embedding")).as("e"))
    val qvd = queries.select(col("vec_id"), toDoubleArr(col("embedding")).as("e"))
    // one exact map-side max-agg; broadcast as a 1-row scalar attach
    val scale = cvd.agg(max(aggregate(col("e"), lit(0.0),
      (acc, x) => greatest(acc, abs(x)))).as("m"))
    def quant(v: DataFrame): DataFrame = v.crossJoin(broadcast(scale))
      .select(col("vec_id"),
        transform(col("e"), x => round(x / col("m") * 127, 0).cast("int")).as("qv"))
      .withColumn("nrm", sqrt(dotLongN(col("qv"), col("qv")).cast("double")))
      .filter(col("nrm") > 0.0)
    def keyed(v: DataFrame, id: String): DataFrame = v
      .withColumn("bks", call_function("graft_lsh_buckets",
        col("e"), lit(0), lit(planesPerTable), lit(nTables)))
      .select(col("vec_id").as(id), posexplode(col("bks")).as(Seq("tbl", "bucket")))
    def capped(kdf: DataFrame, id: String): DataFrame = maxBucket.fold(kdf) { cap =>
      val w = Window.partitionBy(col("tbl"), col("bucket")).orderBy(col(id))
      kdf.withColumn("__r", row_number().over(w))
        .filter(col("__r") <= cap).drop("__r")
    }
    val masks: Seq[Long] = (0 to probeHamming).flatMap(h =>
      (0 until planesPerTable).combinations(h)
        .map(_.foldLeft(0L)((m, i) => m | (1L << i))))
    val probes = keyed(qvd, "qid").select(col("qid"), col("tbl"),
      explode(array(masks.map(m => col("bucket").bitwiseXOR(lit(m))): _*)).as("bucket"))
    val cand = capped(keyed(cvd, "cid"), "cid").join(broadcast(probes), Seq("tbl", "bucket"))
      .filter(col("qid") =!= col("cid"))
      .select("qid", "cid")
      .distinct()
    val cq = quant(cvd)
    val qq = quant(qvd)
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("cid"))
    cand
      .join(broadcast(qq.select(col("vec_id").as("qid"),
        col("qv").as("qe"), col("nrm").as("qn"))), "qid")
      .join(cq.select(col("vec_id").as("cid"),
        col("qv").as("ce"), col("nrm").as("cn")), "cid")
      .withColumn("dot", dotLongN(col("qe"), col("ce")))
      .withColumn("score", col("dot").cast("double") / (col("qn") * col("cn")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("cid"), col("score"), col("rnk"))
  }

  /** [[annLshTopK]] with the per-table plane count wired to the corpus
    * size via [[autoPlanes]] — declared as `ann_lsh_topk_auto` (the
    * scale tier; the literal-8 key stays as the gate-SF anchor, which
    * this equals bit-for-bit below n = 8192). The sf3 rung showed
    * the fixed-8 tier's candidate-generation join growing linearly per
    * query (bucket occupancy n/256), and this knob does hold occupancy
    * at `targetBucket`; but on the fixture's near-orthogonal geometry
    * (10th-neighbor cosine ~0.32, i.e. ~71°, per-plane collision
    * ~0.6) the AnnTune grid measured the candidate-generation recall
    * CEILING collapsing as planes sharpen: 0.995 at 8 planes /
    * hamming-2 multiprobe, 0.845 at 11, 0.47 at 14. Hamming-3 probing
    * recovers 0.97 at 11 planes but the probe relation (C(p,<=h)
    * masks x tables x queries) is broadcast into the candidate join,
    * and at the depths 14+ planes need it stops being
    * broadcast-sized. Unlike IVF's gentle probe-fraction trade
    * ([[autoIvfParams]]), plane sharpening on clusterless geometry
    * buys its occupancy bound with recall the budget can't win back —
    * so the IVF tier is the designated 10^6+ scale path for THIS
    * geometry, and this knob is for corpora whose neighbors are
    * actually close (where per-plane collision stays near 1 and
    * sharpening is benign). Gate SFs (n <= 8192) sit at the 8-plane
    * floor either way. */
  def annLshTopKAuto(queries: DataFrame, candidates: DataFrame, k: Int,
                     dim: Int = 64, nTables: Int = 12,
                     probeHamming: Int = 2, maxCandidates: Int = 256,
                     fpBits: Int = 256, targetBucket: Int = 32,
                     knownN: Option[Long] = None): DataFrame = {
    val planes = autoPlanes(knownN.getOrElse(candidates.count()), 8, targetBucket)
    annLshTopK(queries, candidates, k, planes, dim, nTables,
      probeHamming, maxCandidates, fpBits)
  }

  // --- SemDeDup-style cluster-scoped semantic dedup --------------------

  /** Plane family reserved for semantic-cluster seeding — disjoint
    * from the cosine-LSH tables (offsets 0..~200) and fingerprint
    * planes (4096+), so the cluster geometry is independent of the
    * candidate tiers' hash tables. */
  private[graft] val SemPlaneOffset = 256

  /** Deterministic cluster seeds ("leaders"): sign-bucket every vector
    * under `planes` hyperplanes from the [[SemPlaneOffset]] family and
    * take the MINIMUM-vec_id member of each occupied bucket as that
    * bucket's leader. Exact set arithmetic end to end (bucket = integer
    * sign fold over literal planes, leader = integer min), so a DuckDB
    * oracle re-derives the identical leaders from the data — unlike
    * k-means centroids, whose float-mean accumulation is partition-
    * order sensitive. Returns (bucket, leaderVec) sorted by bucket;
    * driver-held by construction: ≤ 2^planes rows × dim doubles — the
    * same bounded payload the IVF centroid matrix ships.
    *
    * Input `v` must be a (vec_id, e: array<double>) projection. */
  private[graft] def semanticLeaders(v: DataFrame,
                                     planes: Int): Array[(Long, Array[Double])] = {
    graft.plans.GraftExtensions.register(v.sparkSession)
    val withB = v.withColumn("__bks", call_function("graft_lsh_buckets",
        col("e"), lit(SemPlaneOffset), lit(planes), lit(1)))
      .select(col("vec_id"), element_at(col("__bks"), 1).as("bucket"))
    // fetch the ≤2^planes leader vectors with a BROADCAST of the tiny
    // (bucket, vec_id) side — the corpus streams, nothing reshuffles
    v.join(broadcast(withB.groupBy("bucket").agg(min("vec_id").as("vec_id"))),
        "vec_id")
      .select(col("bucket"), col("e"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
  }

  /** Semantic (embedding-space) deduplication, SemDeDup-style
    * [Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"]: partition the corpus
    * into clusters, find cosine-τ duplicate pairs ONLY within
    * clusters, group them transitively, and in each group KEEP the
    * member LEAST similar to its cluster centre (the most "marginal"
    * copy — SemDeDup's keeper rule; ties → lowest vec_id). Returns one
    * row per multi-member duplicate group:
    * (component, cluster, keeper, n_vecs, keeper_csim).
    *
    * This is the published curation path for web-scale embedding
    * dedup, and the 100 TB shape is what makes it one: pair search is
    * confined to clusters, so after ONE shuffle keyed by cluster the
    * candidate space is Σ|c|² — with the plane count auto-scaled for
    * constant occupancy ([[autoPlanes]] with `targetCluster`) that is
    * n·occupancy ≈ LINEAR in the corpus, embarrassingly parallel per
    * cluster, vs the global τ-graph's fixture-quadratic |E|
    * (`dedup_components` at the sf10 rung: 405k pairs, 1451 s). The
    * cluster assignment itself is a pure scan-local projection (one
    * fused `graft_cosine_many` kernel against the flattened leader
    * matrix literal — k is a data dimension, not an expression
    * dimension), and components/keeper ship ids + one double.
    *
    * The declared tier seeds clusters with [[semanticLeaders]] (exact,
    * SQL-reproducible — the full pipeline carries a DuckDB oracle);
    * [[semanticDedupRefined]] swaps in Lloyd-refined k-means centroids
    * for real clustered corpora, pinned by spec on the clustered
    * fixture instead (float means are not oracle-expressible). */
  def semanticDedup(emb: DataFrame, tau: Double, basePlanes: Int = 4,
                    targetCluster: Int = 128,
                    knownN: Option[Long] = None): DataFrame = {
    val v = cosinePrep(emb)
    val planes = autoPlanes(knownN.getOrElse(v.count()), basePlanes, targetCluster)
    semanticDedupOver(v, tau, semanticLeaders(v, planes))
  }

  /** [[semanticDedup]] over Lloyd-refined spherical k-means centroids
    * ([[ivfCentroids]]' deterministic seeding + fixed iterations) —
    * the tier for REAL corpora, whose embedding geometry is clustered:
    * there the refined centres track the true modes and nearly every
    * near-dup pair co-clusters. Cluster scoping is approximate BY
    * DESIGN (SemDeDup's own contract): a τ-pair split across two
    * cells is missed, but no false pair is ever emitted (within-cell
    * pairs are exact-cosine verified). SemanticDedupSpec pins pair
    * recall ≥ 0.9 + the zero-false-pair side on the planted clustered
    * fixture. `cluster` in the output is the centroid index (0..k-1). */
  def semanticDedupRefined(emb: DataFrame, tau: Double, k: Int,
                           iters: Int = 3): DataFrame = {
    val cent = ivfCentroids(emb, k, iters)
    semanticDedupOver(cosinePrep(emb), tau,
      cent.map { case (id, c) => (id.toLong, c) }.sortBy(_._1))
  }

  /** Assignment + centre-similarity in ONE scan-local projection:
    * graft_cosine_many gives the per-leader score array; argmax =
    * first index of the max (ties → lowest bucket, since leaders are
    * sorted by bucket) — bitwise the oracle's (csim DESC, bucket)
    * rule. No shuffle, no join: k is a data dimension inside the fused
    * kernel, not an expression dimension. Package-visible so
    * PlanQualitySpec can pin the shuffle-free shape. */
  private[graft] def semanticScored(v: DataFrame,
      leaders: Array[(Long, Array[Double])]): DataFrame = {
    graft.plans.GraftExtensions.register(v.sparkSession)
    val dim = leaders.head._2.length
    val flat = typedlit(leaders.flatMap(_._2).toSeq)
    val buckets = typedlit(leaders.map(_._1).toSeq)
    v.withColumn("__sims", call_function("graft_cosine_many",
        col("e"), flat, lit(dim)))
      .withColumn("__idx",
        array_position(col("__sims"), array_max(col("__sims"))).cast("int"))
      .select(col("vec_id"), col("e"), col("n"),
        element_at(buckets, col("__idx")).as("cluster"),
        element_at(col("__sims"), col("__idx")).as("csim"))
  }

  /** Within-cluster pairs: hash join on cluster, exact cosine ≥ τ via
    * the proven (dot / (na·nb)) fold — never a global pair space. */
  private[graft] def semanticPairs(scored: DataFrame, tau: Double): DataFrame = {
    val a = scored.select(col("cluster"), col("vec_id").as("ida"),
      col("e").as("ea"), col("n").as("an"))
    val b = scored.select(col("cluster"), col("vec_id").as("idb"),
      col("e").as("eb"), col("n").as("bn"))
    a.join(b, "cluster")
      .filter(col("ida") < col("idb"))
      .filter(dotN(col("ea"), col("eb")) / (col("an") * col("bn")) >= tau)
      .select(col("ida").as("src"), col("idb").as("dst"))
  }

  private def semanticDedupOver(v: DataFrame, tau: Double,
      leaders: Array[(Long, Array[Double])]): DataFrame = {
    val scored = semanticScored(v, leaders)
      .localCheckpoint(false) // feeds both pair-join sides + the keeper
    val pairs = semanticPairs(scored, tau)
    val comp = graft.operators.ConnectedComponents.components(
      scored.select(col("vec_id").as("id")), pairs)
    val byComp = Window.partitionBy("component")
    val pick = Window.partitionBy("component")
      .orderBy(col("csim").asc, col("id"))
    comp
      .join(scored.select(col("vec_id").as("id"), col("cluster"), col("csim")), "id")
      .withColumn("n_vecs", count(lit(1)).over(byComp))
      .withColumn("rn", row_number().over(pick))
      .filter(col("n_vecs") >= 2 && col("rn") === 1)
      .select(col("component"), col("cluster"), col("id").as("keeper"),
        col("n_vecs"), col("csim").as("keeper_csim"))
  }
}
