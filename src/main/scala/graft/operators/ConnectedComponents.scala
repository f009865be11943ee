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
      val propagated = comp.union(viaEdges)
        .groupBy("id").agg(min("component").as("component"))
      // pointer jump: a label is a node id, so re-labeling through the
      // label's own (smaller-or-equal, still-reachable) label doubles
      // the hop distance a minimum covers per round.
      val parents = propagated
        .select(col("id").as("pid"), col("component").as("pcomp"))
      val prev = comp
      comp = propagated.join(parents, propagated("component") === col("pid"))
        .select(propagated("id"), col("pcomp").as("component"))
        .localCheckpoint(false)
      val s = labelSum(comp)
      // labelSum materialized the new round's checkpoint, so the
      // previous round's blocks are dead — free them now instead of
      // holding O(rounds) copies of the label relation in storage.
      graft.plans.Checkpoints.unpersist(prev)
      converged = s.compareTo(lastSum) == 0
      lastSum = s
    }
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
