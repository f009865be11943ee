package graft.queries

import graft.Catalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond connected components: PageRank-style
  * link centrality over the domain-transition graph a web corpus
  * implies. Crawl-prioritization and quality-weighting pipelines rank
  * hosts by navigational centrality (the classic power-iteration
  * PageRank of Page et al. 1999); this module re-expresses the power
  * iteration as K unrolled join+aggregate stages so the whole
  * computation stays declarative and — unlike float PageRank, whose
  * sums are partition-order-sensitive — EXACT: ranks live in integer
  * mass units (1e9 total), every per-edge contribution is a BIGINT
  * `div`, and sums of integers are order-independent, so a DuckDB
  * oracle can replay the identical arithmetic CTE-for-CTE.
  *
  * Graph derivation (the only corpus-scale stage): events are keyed to
  * the 13 planted hosts (the `text_domain_stats` plant — floor(sqrt(
  * event_id % 169)) has a skewed (2k+1) size profile), and each user's
  * consecutive events in event_id order yield one src→dst transition
  * (`lead` over the user window — the sessionize shuffle shape). Edges
  * aggregate to (src, dst, weight) with one map-side-combined groupBy;
  * from there every iteration touches only |V|+|E| aggregated rows.
  *
  * 100 TB shape: the events scan shuffles ONCE by user for the lead
  * window and once more into the (src, dst) edge rollup — both
  * map-side combined. The K iterations are joins keyed on src and
  * aggregates keyed on dst over the edge relation (web-scale: vertex-
  * partitioned Pregel-as-joins, AQE-planned; here |V| = 13 so every
  * iteration broadcasts). Rank state is |V| rows — never corpus rows.
  *
  * Semantics pinned (both engines identically):
  *  - r0(v)   = SCALE div n
  *  - c_i(u→v)= (r_{i-1}(u) * w(u,v)) div W(u)   summed over u
  *  - r_i(v)  = (15*(SCALE div n)) div 100 + (85 * Σc) div 100
  *  - no dangling-mass redistribution (a sink vertex's mass leaks; the
  *    transition graph has none by construction, and the operator's
  *    contract documents the choice rather than hiding a float
  *    renormalization the oracle could not replay).
  * Overflow bound: rank ≤ 1e9 and w ≤ |events|, so rank*w ≤ 1e9·|E|
  * stays under 2^63 through ~10^9 events per edge key; ANSI mode would
  * fail loudly beyond it.
  */
object GraphQueries {

  private val PrScale = 1000000000L // total rank mass, integer units
  private val PrIters = 5

  /** Power iteration over an explicit (src, dst, w) edge list.
    * Package-visible so GraphSpec can replay a hand-computed graph.
    *
    * The edge relation is materialized ONCE (localCheckpoint): the K
    * unrolled iterations COMPOSE over it, and without the barrier each
    * iteration's plan re-derives the whole corpus-scale edge rollup —
    * the composed tree re-ran the events window O(K²) times (234
    * exchanges at K=5 in the first plan dump). After the barrier every
    * iteration is a join+agg over |E| frozen rows. */
  private[graft] def pageRankEdges(edgesIn: DataFrame): DataFrame = {
    val edges = edgesIn.localCheckpoint(false)
    val outW = edges.groupBy("src").agg(sum(col("w")).as("out_w"))
    val e = edges.join(outW, "src") // src, dst, w, out_w
    val verts = edges.select(col("src").as("domain"))
      .union(edges.select(col("dst").as("domain"))).distinct()
    val nDf = verts.agg(count(lit(1)).as("n"))
    // base/r0 depend only on |V|: one broadcast 1-row cross join.
    // vb and each iteration's rank are checkpointed |V|-row relations
    // (the ConnectedComponents loop pattern): the composed K-deep plan
    // would otherwise re-derive every prior iteration's joins per
    // reference. Loop-round checkpoints are EAGER so the unpersist of
    // the superseded round below matches the Checkpoints contract (the
    // successor is materialized before its input's only copy is freed
    // — r15 ADVICE; with lazy checkpoints the frees were inert until
    // the single final action and a second consumer of a rank relation
    // would have recomputed it).
    val vb = verts.crossJoin(broadcast(nDf))
      .select(col("domain"),
        expr(s"$PrScale div n").as("r0"),
        expr(s"(15 * ($PrScale div n)) div 100").as("base"))
      .localCheckpoint(false)
    // the initial rank is its own checkpoint so every loop round's
    // `prev` is a standalone LogicalRDD — unpersisting it can never
    // free vb's blocks (Checkpoints.unpersist walks the whole tree)
    var rank = vb.select(col("domain"), col("r0").as("rank"))
      .localCheckpoint(false)
    for (_ <- 1 to PrIters) {
      val contrib = e.join(rank.withColumnRenamed("domain", "src"), "src")
        .select(col("dst").as("domain"),
          expr("(rank * w) div out_w").as("c"))
        .groupBy("domain").agg(sum(col("c")).as("sc"))
      val prev = rank
      rank = vb.join(contrib, Seq("domain"), "left")
        .select(col("domain"),
          (col("base") + expr("(85 * coalesce(sc, CAST(0 AS BIGINT))) div 100"))
            .as("rank"))
        .localCheckpoint(true)
      graft.plans.Checkpoints.unpersist(prev)
    }
    rank.join(outW.withColumnRenamed("src", "domain"), Seq("domain"), "left")
      .select(col("domain"), col("rank"),
        coalesce(col("out_w"), lit(0L)).as("out_w"))
      .orderBy(col("rank").desc, col("domain"))
  }

  def pageRank(s: SparkSession, dir: String): DataFrame = {
    val ev = Catalog.table(s, dir, "events")
    val host = concat(lit("site-"),
      floor(sqrt(pmod(col("event_id"), lit(169L)).cast("double"))).cast("long").cast("string"),
      lit(".example.com"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val trans = ev.select(col("user_id"), col("event_id"), host.as("src"))
      .withColumn("dst", lead(col("src"), 1).over(w))
      .filter(col("dst").isNotNull)
    val edges = trans.groupBy("src", "dst").agg(count(lit(1)).as("w"))
    pageRankEdges(edges)
  }

  /** The identical arithmetic, CTE-for-CTE, with the K iterations
    * unrolled (DuckDB's recursive CTEs reject aggregates in the
    * recursive term; a fixed K unrolls exactly). Every quantity is
    * BIGINT; `//` is DuckDB's integer division, equal to Spark's `div`
    * on the all-positive operands here. */
  val pageRankSql: String = {
    val head =
      s"""WITH h AS (SELECT user_id, event_id,
         |    'site-' || CAST(CAST(floor(sqrt(event_id % 169)) AS BIGINT) AS VARCHAR)
         |      || '.example.com' AS d
         |  FROM events),
         |t AS (SELECT d AS src,
         |        lead(d) OVER (PARTITION BY user_id ORDER BY event_id) AS dst
         |      FROM h),
         |e0 AS (SELECT src, dst, count(*) AS w FROM t
         |       WHERE dst IS NOT NULL GROUP BY src, dst),
         |ow AS (SELECT src, CAST(sum(w) AS BIGINT) AS out_w FROM e0 GROUP BY src),
         |e AS (SELECT e0.src, e0.dst, e0.w, ow.out_w
         |      FROM e0 JOIN ow ON ow.src = e0.src),
         |v AS (SELECT DISTINCT domain FROM
         |        (SELECT src AS domain FROM e0 UNION ALL SELECT dst FROM e0)),
         |nn AS (SELECT count(*) AS n FROM v),
         |vb AS (SELECT v.domain,
         |         CAST($PrScale // n AS BIGINT) AS r0,
         |         CAST((15 * ($PrScale // n)) // 100 AS BIGINT) AS base
         |       FROM v CROSS JOIN nn),
         |r0 AS (SELECT domain, r0 AS rank FROM vb)""".stripMargin
    val iters = (1 to PrIters).map { i =>
      s"""c$i AS (SELECT e.dst AS domain,
         |        CAST(sum((r.rank * e.w) // e.out_w) AS BIGINT) AS sc
         |      FROM e JOIN r${i - 1} r ON r.domain = e.src GROUP BY e.dst),
         |r$i AS (SELECT vb.domain,
         |        CAST(vb.base + (85 * coalesce(c$i.sc, 0)) // 100 AS BIGINT) AS rank
         |      FROM vb LEFT JOIN c$i ON c$i.domain = vb.domain)""".stripMargin
    }
    val tail =
      s"""SELECT r.domain, r.rank, coalesce(ow.out_w, 0) AS out_w
         |FROM r$PrIters r LEFT JOIN ow ON ow.src = r.domain
         |ORDER BY r.rank DESC, r.domain""".stripMargin
    (head +: iters).mkString("", ",\n", "\n") + tail
  }

  // --- graph_triangles: triangle counting ------------------------------
  // The standard local-clustering signal (spam/mirror-farm detection
  // ranks hosts by triangle participation — a link farm is triangle-
  // dense, an organic hub is not). Compact-forward shape: orient every
  // undirected edge low-id -> high-id, so each triangle a<b<c is
  // enumerated exactly once as the two-path (a,b)+(b,c) closed by the
  // semi join on (a,c). At web scale the two-path join is THE shuffle
  // (keyed on the middle vertex). Orientation here is BY DOMAIN ID
  // (least/greatest) — enough for the count-each-once guarantee; the
  // classic sum-of-min-degree² fan-out bound additionally requires
  // orienting by (degree, id), a degree-compute + re-key this fixed
  // 169-host graph doesn't need (r15 ADVICE: the bound was previously
  // overclaimed for id ordering). The closure check is a semi join on
  // the oriented edge list — no row explosion survives past it. Per-vertex participation comes from one explode
  // over the closed triangles (3 rows each) + a map-side-combined
  // count; vertices in no triangle report 0 via the left join.
  /** Package-visible core over an explicit (src, dst) transition list. */
  private[graft] def trianglesEdges(trans: DataFrame): DataFrame = {
    val und = trans
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(false)
    val paths = und.join(und.toDF("b2", "c"),
        col("b") === col("b2") && col("c") > col("b"))
      .select(col("a"), col("b"), col("c"))
    val tris = paths.join(und.toDF("a2", "c2"),
        col("a") === col("a2") && col("c") === col("c2"), "left_semi")
    val perVertex = tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("domain"))
      .groupBy("domain").agg(count(lit(1)).as("n_tri"))
    val verts = und.select(col("a").as("domain"))
      .union(und.select(col("b").as("domain"))).distinct()
    verts.join(perVertex, Seq("domain"), "left")
      .select(col("domain"), coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .orderBy("domain")
  }

  def triangles(s: SparkSession, dir: String): DataFrame = {
    val ev = Catalog.table(s, dir, "events")
    val host = concat(lit("site-"),
      floor(sqrt(pmod(col("event_id"), lit(169L)).cast("double"))).cast("long").cast("string"),
      lit(".example.com"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val trans = ev.select(col("user_id"), col("event_id"), host.as("src"))
      .withColumn("dst", lead(col("src"), 1).over(w))
      .filter(col("dst").isNotNull)
    trianglesEdges(trans)
  }

  val trianglesSql: String =
    """WITH h AS (SELECT user_id, event_id,
      |    'site-' || CAST(CAST(floor(sqrt(event_id % 169)) AS BIGINT) AS VARCHAR)
      |      || '.example.com' AS d
      |  FROM events),
      |t AS (SELECT d AS src,
      |        lead(d) OVER (PARTITION BY user_id ORDER BY event_id) AS dst
      |      FROM h),
      |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      |        FROM t WHERE dst IS NOT NULL AND src <> dst),
      |tri AS (SELECT e1.a, e1.b, e2.b AS c
      |        FROM und e1
      |        JOIN und e2 ON e2.a = e1.b AND e2.b > e1.b
      |        WHERE EXISTS (SELECT 1 FROM und e3
      |                      WHERE e3.a = e1.a AND e3.b = e2.b)),
      |pv AS (SELECT domain, count(*) AS n_tri FROM (
      |         SELECT a AS domain FROM tri
      |         UNION ALL SELECT b FROM tri
      |         UNION ALL SELECT c FROM tri)
      |       GROUP BY domain),
      |v AS (SELECT DISTINCT domain FROM
      |        (SELECT a AS domain FROM und UNION ALL SELECT b FROM und))
      |SELECT v.domain, coalesce(pv.n_tri, 0) AS n_tri
      |FROM v LEFT JOIN pv ON pv.domain = v.domain
      |ORDER BY v.domain""".stripMargin

  // --- graph_label_propagation: community detection ---------------------
  // Synchronous weighted label propagation (Raghavan et al.) over the
  // same undirected host-transition graph: every vertex starts as its
  // own label; each round it adopts the label with the LARGEST summed
  // edge weight among its neighbors (ties to the lexicographically
  // smallest label — fully deterministic, so the oracle unrolls the
  // same K rounds CTE-for-CTE). Communities differ from connected
  // components (dedup_components family): LPA splits a connected graph
  // along weak cuts, the host-clustering signal a crawler uses to
  // group mirror farms. Scale shape: per round ONE neighbor-label
  // hash join + a map-side-combined (dst, label) weight agg + a
  // per-vertex window bounded by the vertex's distinct neighbor-label
  // count — all keyed on vertex ids; K is fixed, relations are frozen
  // with localCheckpoint like the PageRank loop.
  private val LpaIters = 4

  /** Package-visible core over an explicit (src, dst) transition list —
    * the DECLARED key's path: K rounds unconditionally, mirroring the
    * oracle's unrolled CTEs round for round. */
  private[graft] def labelPropEdges(trans: DataFrame): DataFrame =
    labelPropEdgesProbed(trans, LpaIters, stopAtFixpoint = false)._1

  /** [[labelPropEdges]] plus the CONVERGENCE PROBE (r16 verdict item
    * 8): after each round, one count over the V-row label relation
    * measures how many vertices changed label; zero changes is a true
    * fixpoint of synchronous LPA (the next round recomputes the same
    * votes from the same labels), so stopping there cannot change the
    * output — GraphSpec pins probed == unrolled. On real graphs
    * (diameter-bounded community structure) this is the knob that
    * keeps a fixed iteration budget from running long after the labels
    * freeze; the declared key keeps the unconditional unroll its
    * oracle replays. The probe's cost is one keyed join per round over
    * labels only (ids, never edges). Returns (labels, rounds actually
    * executed). */
  private[graft] def labelPropEdgesProbed(trans: DataFrame, maxIters: Int,
      stopAtFixpoint: Boolean = true): (DataFrame, Int) = {
    val und = trans
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("w"))
    // symmetric view: each undirected edge votes in both directions
    val e = und.select(col("a").as("src"), col("b").as("dst"), col("w"))
      .union(und.select(col("b").as("src"), col("a").as("dst"), col("w")))
      .localCheckpoint(false)
    val verts = e.select(col("dst").as("domain")).distinct()
    var lbl = verts.select(col("domain"), col("domain").as("label"))
      .localCheckpoint(true)
    val w = Window.partitionBy(col("domain"))
      .orderBy(col("wsum").desc, col("label"))
    var rounds = 0
    var converged = false
    while (rounds < maxIters && !converged) {
      val prev = lbl
      lbl = e.join(prev, e("src") === prev("domain"))
        .groupBy(e("dst").as("domain"), prev("label"))
        .agg(sum(col("w")).as("wsum"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("domain"), col("label"))
        .localCheckpoint(true)
      rounds += 1
      if (stopAtFixpoint) {
        val changed = lbl.as("n")
          .join(prev.as("p"), col("n.domain") === col("p.domain"))
          .filter(col("n.label") =!= col("p.label"))
          .count()
        converged = changed == 0L
      }
      graft.plans.Checkpoints.unpersist(prev)
    }
    (lbl.orderBy("domain"), rounds)
  }

  /** LPA runs on a BLOCKED host graph, not the dense 13-host one the
    * centrality queries use (on a near-complete graph every LPA run
    * collapses to one community — measured, and then the query proves
    * nothing). Each user browses inside their own 12-block
    * neighborhood (`h<user_id%12>_<event_id%7>`), and every 50th event
    * detours through one shared `hub` host — so the graph is CONNECTED
    * (connected components would report a single group) while the
    * strong intra-block weights vastly outvote the weak hub bridges,
    * and LPA recovers the blocks. GraphSpec pins that structure. */
  def labelPropagation(s: SparkSession, dir: String): DataFrame = {
    val ev = Catalog.table(s, dir, "events")
    val host = when(col("event_id") % 50 === 0, lit("hub"))
      .otherwise(concat(lit("h"), (col("user_id") % 12).cast("string"),
        lit("_"), (col("event_id") % 7).cast("string")))
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val trans = ev.select(col("user_id"), col("event_id"), host.as("src"))
      .withColumn("dst", lead(col("src"), 1).over(w))
      .filter(col("dst").isNotNull)
    labelPropEdges(trans)
  }

  val labelPropagationSql: String = {
    val head =
      """WITH h AS (SELECT user_id, event_id,
        |    CASE WHEN event_id % 50 = 0 THEN 'hub'
        |         ELSE 'h' || CAST(user_id % 12 AS VARCHAR)
        |              || '_' || CAST(event_id % 7 AS VARCHAR) END AS d
        |  FROM events),
        |t AS (SELECT d AS src,
        |        lead(d) OVER (PARTITION BY user_id ORDER BY event_id) AS dst
        |      FROM h),
        |und AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b,
        |          count(*) AS w
        |        FROM t WHERE dst IS NOT NULL AND src <> dst GROUP BY 1, 2),
        |e AS (SELECT a AS src, b AS dst, w FROM und
        |      UNION ALL SELECT b, a, w FROM und),
        |l0 AS (SELECT DISTINCT dst AS domain, dst AS label FROM e)""".stripMargin
    val iters = (1 to LpaIters).map { i =>
      s"""c$i AS (SELECT e.dst AS domain, l.label,
         |          CAST(sum(e.w) AS BIGINT) AS wsum
         |        FROM e JOIN l${i - 1} l ON l.domain = e.src
         |        GROUP BY e.dst, l.label),
         |l$i AS (SELECT domain, label FROM (
         |          SELECT domain, label, row_number() OVER (
         |            PARTITION BY domain ORDER BY wsum DESC, label) AS rn
         |          FROM c$i) WHERE rn = 1)""".stripMargin
    }
    val tail = s"SELECT domain, label FROM l$LpaIters ORDER BY domain"
    (head +: iters).mkString("", ",\n", "\n") + tail
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> (pageRank _),
    "graph_triangles" -> (triangles _),
    "graph_label_propagation" -> (labelPropagation _))

  def oracle: Map[String, String] = Map(
    "graph_pagerank" -> pageRankSql,
    "graph_triangles" -> trianglesSql,
    "graph_label_propagation" -> labelPropagationSql)
}
