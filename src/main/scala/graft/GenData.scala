package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic-testdata generator for scale-ladder rungs the
  * driver did not pre-generate (TESTDATA.md ships sf0.001/0.01/0.1; the
  * scale grade needs an sf1 rung ≈ 6M-row lineitem — VERDICT r10 item 1).
  *
  * Matches the driver tables exactly in schema (names, types, timestamp
  * unit) and closely in value domains / cardinality ratios, re-measured
  * from `/root/testdata/sf0.01` and `sf0.1`:
  *   - per-sf1 row counts are 10× sf0.1 (customer 150k, orders 1.5M,
  *     lineitem ≈ 4.07×orders, events 1M with |user_id| = events/66.7,
  *     part 200k, supplier 10k, documents 50k, embeddings 20k);
  *   - domains: returnflag {A,N,R}, linestatus {O,F}, orderstatus
  *     {F,O,P}, priorities 1-URGENT…5-LOW, mktsegments ×5, Brand#1..25,
  *     p_retailprice = 900 + (partkey%1000)/10, event_type ×5,
  *     props = {"k": 0..99}, documents drawn from the same 31-word
  *     vocab with 10..99 words and a ~0.5% exact-duplicate rate
  *     (sf0.1 measures 8/5000), embeddings 64-dim ≈ N(0, 0.13).
  *
  * Generation is FULLY distributed and order-independent: every column
  * is a pure function of the row id via seed-tagged `xxhash64`, built
  * from `spark.range(n)` — no driver loops, no rand() (partitioning-
  * dependent), no collect. The same (sf, seed) always produces the same
  * bytes regardless of parallelism, which is what lets a DuckDB oracle
  * and a Spark run read identical inputs.
  *
  * Layout mirrors the driver's: ONE parquet FILE per table named
  * `<outDir>/<table>.parquet` (not a directory), so `Catalog.load`,
  * `Sources.footerRowCount` and `tools/compare.py`'s DuckDB views all
  * work unchanged at the new rung. Single-file is not a scale smell
  * here: parquet is row-group-splittable and Spark parallelizes the
  * scan by `files.maxPartitionBytes`, not file count.
  *
  * Usage: `runMain graft.GenData <sf> <outDir>` (e.g. `1.0 target/sf1`).
  */
object GenData {
  val seed = 42L

  /** Seed-tagged 64-bit hash of the row id — the per-column PRNG. */
  private def h(tag: String): Column =
    xxhash64(lit(seed), lit(tag), col("id"))
  /** Uniform [0,1) from a tagged hash, 6 decimal digits of resolution. */
  private def frac(tag: String): Column =
    pmod(h(tag), lit(1000000L)).cast("double") / 1000000.0
  /** Uniform integer in [0, n). */
  private def uint(tag: String, n: Long): Column = pmod(h(tag), lit(n))
  private def pick(tag: String, vs: Seq[String]): Column =
    element_at(array(vs.map(lit): _*), (uint(tag, vs.size.toLong) + 1).cast("int"))
  private def r2(c: Column): Column = round(c, 2)

  /** Days added to a base date, as a timestamp column. The driver's
    * tables are TIMESTAMP(MICROS) WITHOUT timezone (NTZ,
    * isAdjustedToUTC=false) — cast through timestamp_ntz so the written
    * parquet schema matches byte-for-byte (session tz is UTC, so the
    * values are identical either way). */
  private def datePlusDays(base: String, days: Column): Column =
    (unix_timestamp(lit(base).cast("timestamp")) + days * 86400L)
      .cast("timestamp").cast("timestamp_ntz")

  // 31-word vocabulary measured from the driver's documents table.
  private val vocab = Seq(
    "a", "agg", "batch", "bolt", "column", "customer", "data", "fast", "gear",
    "hash", "join", "key", "line", "merge", "nut", "order", "part", "plan",
    "query", "ring", "row", "scan", "shuffle", "slow", "small", "spark",
    "table", "value", "wide", "widget", "window")

  /** Document text as a pure function of a seed id: 10..99 words drawn
    * from the vocab by per-position hash. Exact duplicates arise by
    * giving ~0.5% of docs a COPIED text seed (another doc's id), so
    * dedup queries have real work at every rung. */
  private def docText(textSeed: Column): Column = {
    val n = (pmod(xxhash64(lit(seed), lit("doc_n"), textSeed), lit(90L)) + 10L).cast("int")
    val vocabArr = array(vocab.map(lit): _*)
    array_join(
      transform(sequence(lit(1), n), i =>
        element_at(vocabArr,
          (pmod(xxhash64(lit(seed), lit("doc_w"), textSeed, i), lit(vocab.size.toLong)) + 1)
            .cast("int"))),
      " ")
  }

  def region(s: SparkSession): DataFrame =
    s.range(5).select(
      col("id").cast("int").as("r_regionkey"),
      element_at(array(Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST").map(lit): _*),
        col("id").cast("int") + 1).as("r_name"))

  def nation(s: SparkSession): DataFrame =
    s.range(25).select(
      col("id").cast("int").as("n_nationkey"),
      concat(lit("NATION_"), col("id")).as("n_name"),
      (col("id") % 5).cast("int").as("n_regionkey"))

  def customer(s: SparkSession, n: Long): DataFrame =
    s.range(n).select(
      col("id").as("c_custkey"),
      format_string("Customer#%09d", col("id")).as("c_name"),
      uint("c_nat", 25).cast("int").as("c_nationkey"),
      r2(lit(-999.99) + frac("c_bal") * 10999.97).as("c_acctbal"),
      pick("c_seg", Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"))
        .as("c_mktsegment"))

  def supplier(s: SparkSession, n: Long): DataFrame =
    s.range(n).select(
      col("id").as("s_suppkey"),
      format_string("Supplier#%09d", col("id")).as("s_name"),
      uint("s_nat", 25).cast("int").as("s_nationkey"),
      r2(lit(-999.99) + frac("s_bal") * 10999.97).as("s_acctbal"))

  def part(s: SparkSession, n: Long): DataFrame =
    s.range(n).select(
      col("id").as("p_partkey"),
      concat_ws(" ",
        pick("p_adj", Seq("small", "large", "red", "blue", "green", "wide", "slim")),
        pick("p_noun", Seq("ring", "widget", "bolt", "gear", "nut", "washer"))).as("p_name"),
      concat(lit("Brand#"), uint("p_brand", 25) + 1).as("p_brand"),
      pick("p_type", Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"))
        .as("p_type"),
      (uint("p_size", 50) + 1).cast("int").as("p_size"),
      r2(lit(900.0) + pmod(col("id"), lit(1000L)).cast("double") / 10.0).as("p_retailprice"))

  /** o_orderdate is a pure function of the orderkey so lineitem can
    * recompute it WITHOUT a join (shipdate = orderdate + 1..120d). */
  private def orderDateDays(orderkey: Column): Column =
    pmod(xxhash64(lit(seed), lit("o_date"), orderkey), lit(2400L))

  def orders(s: SparkSession, n: Long, nCust: Long): DataFrame =
    s.range(n).select(
      col("id").as("o_orderkey"),
      uint("o_cust", nCust).as("o_custkey"),
      pick("o_status", Seq("F", "O", "P")).as("o_orderstatus"),
      r2(lit(1000.0) + frac("o_total") * 498999.0).as("o_totalprice"),
      datePlusDays("1995-01-01", orderDateDays(col("id"))).as("o_orderdate"),
      pick("o_prio", Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .as("o_orderpriority"))

  /** ≈4.07 lines/order like the driver data: ~1.7% of orders get zero
    * lines, the rest 1..7. Built as range(orders×7) → derive
    * (orderkey, linenumber) arithmetically → filter to the per-order
    * line count — distributed, joinless, deterministic. */
  def lineitem(s: SparkSession, nOrders: Long, nPart: Long, nSupp: Long): DataFrame = {
    val okey = (col("id") / 7).cast("long")
    val lnum = (col("id") % 7 + 1).cast("int")
    val nLines = when(
      pmod(xxhash64(lit(seed), lit("l_zero"), okey), lit(58L)) === 0, lit(0))
      .otherwise(pmod(xxhash64(lit(seed), lit("l_n"), okey), lit(7L)).cast("int") + 1)
    val qty = (uint("l_qty", 50) + 1).cast("double")
    s.range(nOrders * 7)
      .select(okey.as("l_orderkey"), lnum.as("l_linenumber"), col("id"))
      .where(lnum <= nLines)
      .select(
        col("l_orderkey"),
        uint("l_part", nPart).as("l_partkey"),
        uint("l_supp", nSupp).as("l_suppkey"),
        col("l_linenumber"),
        qty.as("l_quantity"),
        r2(qty * (lit(900.0) + frac("l_price") * 1200.0)).as("l_extendedprice"),
        (uint("l_disc", 11).cast("double") / 100.0).as("l_discount"),
        (uint("l_tax", 9).cast("double") / 100.0).as("l_tax"),
        pick("l_rflag", Seq("A", "N", "R")).as("l_returnflag"),
        pick("l_lstat", Seq("O", "F")).as("l_linestatus"),
        datePlusDays("1995-01-01",
          orderDateDays(col("l_orderkey")) + uint("l_ship", 120) + 1).as("l_shipdate"))
  }

  def events(s: SparkSession, n: Long, nUsers: Long): DataFrame =
    s.range(n).select(
      col("id").as("event_id"),
      // 30 days of µs-resolution timestamps from 2024-01-01 (TIMESTAMP
      // MICROS like the driver's events table; timestamp_micros — a
      // long→timestamp CAST would read the long as seconds)
      timestamp_micros(
        unix_timestamp(lit("2024-01-01").cast("timestamp")) * 1000000L +
          pmod(h("e_ts"), lit(30L * 86400L * 1000000L)))
        .cast("timestamp_ntz").as("ts"),
      uint("e_user", nUsers).as("user_id"),
      pick("e_type", Seq("click", "error", "purchase", "signup", "view")).as("event_type"),
      r2(lit(0.01) + frac("e_val") * 499.99).as("value"),
      format_string("{\"k\": %d}", uint("e_k", 100)).as("props"))

  def documents(s: SparkSession, n: Long): DataFrame = {
    // ~0.5% duplicate docs copy the text of doc id/2 (a valid earlier id)
    val textSeed = when(uint("doc_dup", 200) === 0, (col("id") / 2).cast("long"))
      .otherwise(col("id"))
    val text = docText(textSeed)
    s.range(n).select(
      col("id").as("doc_id"),
      text.as("text"),
      pick("doc_lang", Seq("de", "en", "es", "fr", "zh")).as("lang"),
      concat(lit("src"), uint("doc_src", 20)).as("source"),
      length(text).cast("long").as("n_chars"))
  }

  /** CLUSTERED embeddings (r12 VERDICT item 3): `nClusters` Gaussian
    * centers with per-vector Gaussian noise, all seed-deterministic
    * pure functions of the row id — the fixture the isotropic
    * [[embeddings]] table cannot be: real text/image embeddings are
    * strongly clustered, and on clusterless data NO sublinear ANN
    * index can beat the probed fraction at recall (the repo's standing
    * IVF analysis). This table lets the rung MEASURE the claim
    * "k ≈ √n probing is genuinely sublinear at recall on clustered
    * data" instead of arguing it.
    *
    * Geometry: center components ~ N(0,1) per dim (norm ≈ √64 = 8),
    * noise sd 0.5 per dim (norm ≈ 4) → within-cluster cosine ≈ 0.89,
    * cross-cluster ≈ 0 ± 0.12 — separable but not trivially so.
    * Gaussians are sums of 3 uniforms (same device as [[embeddings]]);
    * `label` carries the TRUE cluster id, so recall probes can also
    * diagnose cell purity. Schema matches the driver table (vec_id
    * long, embedding array<float>, label int). */
  def embeddingsClustered(s: SparkSession, n: Long, nClusters: Int = 100,
                          noiseSd: Double = 0.5): DataFrame = {
    def gauss(tag: String, key1: Column, key2: Column): Column = {
      def u(t: Int) =
        pmod(xxhash64(lit(seed), lit(s"$tag$t"), key1, key2), lit(1000000L))
          .cast("double") / 1000000.0
      (u(1) + u(2) + u(3) - 1.5) * 2.0 // sd 1.0
    }
    val cluster = pmod(xxhash64(lit(seed), lit("cemb_c"), col("id")), lit(nClusters.toLong))
    s.range(n).select(
      col("id").as("vec_id"),
      transform(sequence(lit(1), lit(64)), i =>
        (gauss("cemb_ctr", cluster, i) +
          gauss("cemb_noise", col("id"), i) * noiseSd).cast("float"))
        .as("embedding"),
      cluster.cast("int").as("label"))
  }

  /** SPARSE planted near-dup corpus (r13 VERDICT item 2): a documents
    * table whose token-set Jaccard (>= 0.5) pair graph is
    * ~n-PROPORTIONAL by construction, so a rung can measure
    * ConnectedComponents' slope in |E| separated from the pair-
    * GENERATION cost that dominated the dense-geometry sf10 run. Base
    * docs draw 10..99 words from a 4,194,304-word synthetic vocabulary
    * — two random docs share ≈ 0 tokens, so no accidental J >= 0.5
    * edge exists, AND per-token document frequency stays ~constant in
    * n, so the candidate tier's Σdf² cost is ~linear at every rung
    * this generator can emit (a 65k vocab measured quadratic: its df
    * grows with n, 47 s at 50k docs and ~100x that at 500k); every
    * `dupEvery`-th doc gets
    * exactly ONE planted twin at doc_id + n whose text is the base
    * minus its last word (set Jaccard >= (k-1)/k >= 0.9 — an edge by
    * any threshold <= 0.9). |E| == n/dupEvery exactly (n divisible by
    * dupEvery), and components are all size-2 — the shape a REAL
    * deduplicated web corpus has after exact-dedup, where near-dup
    * graphs are sparse and shallow. Schema == documents. */
  def documentsPlanted(s: SparkSession, n: Long, dupEvery: Long = 50): DataFrame = {
    val nWords = (pmod(xxhash64(lit(seed), lit("pd_n"), col("id")), lit(90L)) + 10L).cast("int")
    val words = transform(sequence(lit(1), nWords), i =>
      concat(lit("w"), pmod(xxhash64(lit(seed), lit("pd_w"), col("id"), i), lit(4194304L))))
    def row(docId: Column, text: Column) = Seq(
      docId.as("doc_id"), text.as("text"),
      pick("doc_lang", Seq("de", "en", "es", "fr", "zh")).as("lang"),
      concat(lit("src"), uint("doc_src", 20)).as("source"),
      length(text).cast("long").as("n_chars"))
    val base = s.range(n).select(row(col("id"), array_join(words, " ")): _*)
    val twins = s.range(n).filter(col("id") % dupEvery === 0)
      .select(row(col("id") + n,
        array_join(slice(words, lit(1), nWords - lit(1)), " ")): _*)
    base.union(twins)
  }

  def embeddings(s: SparkSession, n: Long): DataFrame = {
    // sum of 3 uniforms, centered+scaled → bell-shaped in ±0.54 like the
    // driver's vectors; per-dimension tag keeps dimensions independent
    def dim(i: Column): Column = {
      def u(t: Int) =
        pmod(xxhash64(lit(seed), lit(s"emb$t"), col("id"), i), lit(1000000L))
          .cast("double") / 1000000.0
      ((u(1) + u(2) + u(3) - 1.5) * 0.36).cast("float")
    }
    s.range(n).select(
      col("id").as("vec_id"),
      transform(sequence(lit(1), lit(64)), i => dim(i)).as("embedding"),
      uint("emb_label", 10).cast("int").as("label"))
  }

  /** Write `df` as a single parquet FILE at `<outDir>/<name>.parquet`,
    * the driver's testdata layout. Coalesce(1) only serializes the
    * WRITE; the generating plan upstream stays parallel. Row groups are
    * written at 2 MB: Spark's scan splits cannot cross row-group
    * boundaries, so the 128 MB writer default made a single-file sf10
    * table effectively 4-6-way parallel no matter what
    * `files.maxPartitionBytes` asked for — read parallelism of a
    * single-file rung is decided HERE, at write time. 2 MB (not 16)
    * because the fixture's 31-word vocabulary compresses text ~20x:
    * split size is FILE bytes, but the scan-local work (split /
    * shingle / digest / LM) tracks UNCOMPRESSED rows, so a 14 MB text
    * row group is ~125k documents of CPU on one core. On a real
    * cluster the same reasoning sizes row groups by decompressed
    * compute, not just IO. */
  private def writeTable(df: DataFrame, outDir: String, name: String): Unit = {
    val tmp = s"$outDir/_gen_$name"
    df.coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", 2L * 1024 * 1024)
      .parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      df.sparkSession.sessionState.newHadoopConf())
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .map(_.getPath).find(_.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(s"no parquet part in $tmp"))
    val dest = new org.apache.hadoop.fs.Path(s"$outDir/$name.parquet")
    fs.delete(dest, false)
    fs.rename(part, dest)
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
  }

  def generate(s: SparkSession, sf: Double, outDir: String): Unit = {
    def n(perSf1: Long): Long = math.max(1L, math.round(perSf1 * sf))
    val nCust = n(150000); val nSupp = n(10000); val nPart = n(200000)
    val nOrders = n(1500000); val nEvents = n(1000000)
    // embeddings have a 500-row floor in the driver data (500 @ sf0.01,
    // 2000 @ sf0.1 — linear above, floored below)
    val nDocs = n(50000); val nEmb = math.max(500L, n(20000))
    // Several dedup/multimodal fixtures plant duplicate rows at
    // doc_id + 1_000_000 (a literal BOTH engines can splice into SQL —
    // a max(doc_id)-derived offset could not be a plan constant). Keep
    // the id spaces disjoint at every rung this generator can emit
    // (r13 ADVICE: sf >= 20 would collide).
    require(nDocs < 1000000L,
      s"sf=$sf gives nDocs=$nDocs >= 1,000,000: planted-duplicate ids would collide with real doc_ids")
    // driver tables are TIMESTAMP(MICROS); Spark's default INT96 output
    // reads back as ns in pyarrow/duckdb and would skew the oracle
    s.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    new java.io.File(outDir).mkdirs()
    writeTable(region(s), outDir, "region")
    writeTable(nation(s), outDir, "nation")
    writeTable(customer(s, nCust), outDir, "customer")
    writeTable(supplier(s, nSupp), outDir, "supplier")
    writeTable(part(s, nPart), outDir, "part")
    writeTable(orders(s, nOrders, nCust), outDir, "orders")
    writeTable(lineitem(s, nOrders, nPart, nSupp), outDir, "lineitem")
    writeTable(events(s, nEvents, math.max(1L, nEvents / 67)), outDir, "events")
    writeTable(documents(s, nDocs), outDir, "documents")
    writeTable(embeddings(s, nEmb), outDir, "embeddings")
  }

  /** `runMain graft.GenData <sf> <outDir>` — the full table set;
    * `runMain graft.GenData emb-clustered <n> <outDir> [nClusters]` —
    * just a clustered `embeddings.parquet` (the ANN rung fixture);
    * `runMain graft.GenData docs-planted <n> <outDir> [dupEvery]` —
    * just the sparse planted-near-dup `documents.parquet` (the
    * connected-components rung fixture). Either single-table dir is
    * consumable by anything that reads that table. */
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-gendata")
    spark.sparkContext.setLogLevel("WARN")
    args(0) match {
      case "emb-clustered" =>
        val n = args(1).toLong; val outDir = args(2)
        val k = args.lift(3).map(_.toInt).getOrElse(100)
        new java.io.File(outDir).mkdirs()
        writeTable(embeddingsClustered(spark, n, k), outDir, "embeddings")
      case "docs-planted" =>
        val n = args(1).toLong; val outDir = args(2)
        val dupEvery = args.lift(3).map(_.toLong).getOrElse(50L)
        new java.io.File(outDir).mkdirs()
        writeTable(documentsPlanted(spark, n, dupEvery), outDir, "documents")
      case sfStr =>
        generate(spark, sfStr.toDouble, args(1))
    }
    spark.stop()
  }
}
