package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair graph — the step that turns
  * near-duplicate PAIRS (minhash/simhash/cosine candidates) into dedup
  * GROUPS: every node labeled with the minimum node id reachable through
  * the pair edges, so `label` is the canonical survivor and everything
  * else in the component is a duplicate of it. A pair list alone cannot
  * express this: duplicates are transitive (a~b, b~c => one group
  * {a,b,c}) and any per-pair keep/drop rule double-drops or double-keeps
  * chains.
  *
  * Algorithm: min-label propagation with POINTER JUMPING. Each round
  * every node takes the min of its own label and its neighbors' labels
  * (edge join + union + groupBy-min), then labels shortcut through
  * themselves (`label := label(label)` — the label is itself a node
  * id, so one self-join doubles the distance a minimum has traveled).
  * Propagation alone needs O(diameter) rounds and a 10⁶-node chain
  * would run 10⁶ shuffles; with the jump the round count is
  * O(log diameter) — the hash-to-min bound from the map-reduce CC
  * literature. At 100 TB each round is two shuffles of the
  * (node, label) relation keyed by node/label — never materializing
  * the transitive closure, never quadratic. Labels are ids, so the
  * result is deterministic regardless of partitioning or round count.
  *
  * Convergence probe: `sum(label)` is strictly monotone decreasing
  * until fixpoint, so one aggregate job per round both materializes the
  * round (lazy localCheckpoint) and decides termination — no separate
  * isEmpty/subtract pass. The sum accumulates as DECIMAL(38,0): a Long
  * sum could overflow at ~10¹² nodes with 64-bit ids and in principle
  * alias two distinct label states across rounds.
  */
object ConnectedComponents {

  /** `edges`: (src, dst) long pairs, treated as undirected. `nodes`:
    * one long id per row (isolated nodes keep their own label). Returns
    * (id, component) with component = min id in the node's component. */
  def components(nodes: DataFrame, edges: DataFrame,
                 maxIters: Int = 25): DataFrame = {
    val spark = nodes.sparkSession
    val bidir = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(false)
    var comp = nodes.select(col("id"), col("id").as("component"))
      .localCheckpoint(false)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("component").cast("decimal(38,0)"))).head().getDecimal(0)
    var lastSum = labelSum(comp)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      iter += 1
      // neighbor labels flow along edges; groupBy-min folds them with
      // the node's own label. One shuffle keyed by node id.
      val viaEdges = bidir.join(comp, bidir("src") === comp("id"))
        .select(bidir("dst").as("id"), col("component"))
      val prop0 = comp.union(viaEdges)
        .groupBy("id").agg(min("component").as("component"))
      // r18 — the parent update is skipped in ROUND 1, where it is a
      // provable no-op: comp is still the identity labeling
      // (component = id), so toParent = (c.id, p.component) — exactly
      // prop0's own rows — and the union + second groupBy fold exact
      // duplicates. Skipping it removes one join + union + groupBy from
      // the round with the LARGEST label relation, with round counts
      // unchanged by construction (round-2+ behavior identical; an r18
      // iter>2 gate of the whole deep machinery was also measured —
      // wall-time parity at sf0.1 but +1 round on the sparse/leakage
      // graphs — and rejected; this variant has the win without the
      // round risk). Fixpoint-neutral as ever: both update rules only
      // replace labels with smaller same-component ids.
      val deep = iter > 1
      // hash-to-min parent update (Rastogi et al.): each node also
      // tells its PREVIOUS label about the smaller label it just
      // learned. Plain min-propagation + self-jump degrades toward O(d)
      // rounds on graphs whose ids are uncorrelated with topology —
      // label chains collapse at local-minimum plateaus where
      // label(u) = u, and the true min then crosses each plateau one
      // edge per round (measured: the sf1 cosine near-dup graph took 19
      // improving rounds; a 4096-path with aligned ids takes 8). The
      // parent update makes plateau minima learn directly from every
      // node pointing at them, restoring the O(log d) bound. Labels
      // stay ids of same-component nodes (both halves of the suggestion
      // are reachable), so the fixpoint — min id per component — and
      // the output are unchanged.
      val propagated = if (!deep) prop0 else {
        val toParent = comp.as("c")
          .join(prop0.as("p"), col("c.id") === col("p.id"))
          .select(col("c.component").as("id"), col("p.component").as("component"))
        prop0.union(toParent)
          .groupBy("id").agg(min("component").as("component"))
      }
      // pointer jump: a label is a node id, so re-labeling through the
      // label's own (smaller-or-equal, still-reachable) label shortcuts
      // the hop distance a minimum covers per round. r17: jump through
      // the GRANDPARENT (label(label(label)) — one extra self-join of
      // the small (id,label) relation): depth shrinks ~3x per round
      // instead of 2x, so round count drops from log2(d) to ~log3(d)
      // while each round gains only one comp-sized shuffle. Measured on
      // the sf1 cosine near-dup chain (r17): 20 -> 13 rounds from the
      // grandparent jump alone, 20 -> 6 with the parent update; every
      // round is a fixed scheduling cost at gate SFs, so CC-heavy keys
      // win ~30%. The fixpoint is unchanged (shortcuts never alter
      // reachability), so outputs are bit-identical.
      val parents = propagated
        .select(col("id").as("pid"), col("component").as("pcomp"))
      val jump = parents.as("x")
        .join(parents.select(col("pid").as("gpid"), col("pcomp").as("gcomp")),
          col("x.pcomp") === col("gpid"))
        .select(col("x.pid").as("pid"), col("gcomp").as("pcomp"))
      val prev = comp
      comp = propagated.join(jump, propagated("component") === col("pid"))
        .select(propagated("id"), col("pcomp").as("component"))
        .localCheckpoint(false)
      val s = labelSum(comp)
      if (sys.env.get("GRAFT_CC_DEBUG").contains("1"))
        System.err.println(s"cc: round $iter sum=$s")
      // labelSum materialized the new round's checkpoint, so the
      // previous round's blocks are dead — free them now instead of
      // holding O(rounds) copies of the label relation in storage.
      graft.plans.Checkpoints.unpersist(prev)
      converged = s.compareTo(lastSum) == 0
      lastSum = s
    }
    if (sys.env.get("GRAFT_CC_DEBUG").contains("1"))
      System.err.println(s"cc: converged after $iter rounds")
    graft.plans.Checkpoints.unpersist(bidir)
    comp
  }

  /** Dedup-group view over components: only nodes whose component has
    * more than one member, with the canonical keeper and group size —
    * the relation a dedup pipeline joins against to drop duplicates. */
  def dupGroups(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val comp = components(nodes, edges)
    val sizes = comp.groupBy("component").agg(count(lit(1)).as("group_size"))
      .filter(col("group_size") > 1)
    comp.join(sizes, "component")
      .select(col("id"), col("component").as("keep_id"), col("group_size"))
  }
}
