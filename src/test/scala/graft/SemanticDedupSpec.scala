package graft

import graft.functions.SimilarityFunctions
import graft.queries.SimilarityQueries
import org.apache.spark.sql.functions._

/** Pins for the SemDeDup-style cluster-scoped semantic dedup
  * (`dedup_semantic`). The DECLARED tier is hash-checked end to end by
  * the DuckDB oracle at the gate SFs; this spec covers what the oracle
  * cannot: (1) the rung path (`dedupSemanticMod`) is the identical
  * operator at mod=1/pinned planes, (2) the Lloyd-refined tier's
  * recall vs the global τ-graph on clustered geometry — the corpus
  * shape real embedding stores have, where float-mean centroids are
  * not SQL-reproducible, and (3) structural invariants of the output
  * (group sizes, cluster scoping, keeper marginality).
  */
class SemanticDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private val sfDir = Catalog.testdataSfDirs.head // sf0.001

  test("rung path at mod=1 / pinned planes is the declared operator at the floor") {
    // Verify swaps in dedupSemanticMod at rungs (GRAFT_ORACLE_SEM_*);
    // at mod=1 with planes pinned to the gate floor it must be the
    // SAME query, or the rung sweep verifies a different operator.
    val declared = SimilarityQueries.defs("dedup_semantic")(spark, sfDir)
      .collect().toSeq
    val rung = SimilarityQueries.dedupSemanticMod(1, SimilarityQueries.SemPlanes)(
      spark, sfDir).collect().toSeq
    assert(declared.nonEmpty && declared == rung)
  }

  test("declared tier output invariants: group sizes, keeper marginality") {
    val out = SimilarityQueries.defs("dedup_semantic")(spark, sfDir)
      .select($"component", $"keeper", $"n_vecs", $"keeper_csim")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.nonEmpty, "fixture must produce duplicate groups")
    assert(out.forall(_._3 >= 2), "every emitted group is a multi-member one")
    // component label is the min member id (ConnectedComponents
    // contract) and the keeper belongs to the group: keeper >= component
    assert(out.forall { case (comp, keeper, _, _) => keeper >= comp })
    assert(out.forall { case (_, _, _, csim) => csim >= -1.0 && csim <= 1.0 + 1e-12 })
  }

  test("refined tier on clustered geometry: pair recall >= 0.9, scoped edges a subset of the global τ-graph") {
    // The tier for REAL corpora: Lloyd-refined spherical centroids on
    // the planted clustered fixture (100 Gaussian centers, noise sd
    // 0.5). At τ=0.7 the global cosine pair graph is essentially the
    // planted co-cluster graph (center norm ~ 8 vs noise ~ 4 → same-
    // center cos ~ 0.8, cross-center ~ 0). SemDeDup's cluster scoping
    // is approximate BY DESIGN (a τ-pair split across two cells is
    // missed — measured here: Lloyd at k=100 splits a few planted
    // clusters, so exact group equality does NOT hold); the published
    // method's contract on this geometry is (a) high pair recall and
    // (b) zero false pairs (every scoped pair is exact-cosine
    // verified). Pin both.
    val n = 1000L
    val tau = 0.7
    val e = GenData.embeddingsClustered(spark, n)
      .select($"vec_id", $"embedding").localCheckpoint(true)
    // global (unscoped) τ-pair graph: brute all-pairs exact cosine
    // (n=1000 → 500k candidate pairs, fine for a spec)
    val v = e.select($"vec_id", SimilarityFunctions.toDoubleArr($"embedding").as("d"))
    val globalPairs = v.toDF("ida", "da")
      .join(v.toDF("idb", "db"), $"ida" < $"idb")
      .filter(SimilarityFunctions.cosine($"da", $"db") >= tau)
      .select($"ida", $"idb").localCheckpoint(true)
    val nGlobal = globalPairs.count()
    assert(nGlobal > 0, "fixture must contain global τ-pairs")
    // recompute the refined tier's assignment independently: argmax
    // cosine against the SAME deterministic centroids (cosineTopK k=1)
    val cent = SimilarityFunctions.ivfCentroids(e, k = 100)
    // offset centroid ids past the vec_id range: cosineTopK excludes
    // qid==cid self-pairs, which would otherwise drop one candidate
    // cell for vecs 0..99 (the offset preserves the tie order)
    val centDf = cent.toSeq.map { case (i, c) => (i + 1000000L, c) }
      .toDF("vec_id", "c")
      .select($"vec_id", transform($"c", _.cast("float")).as("embedding"))
    val asg = SimilarityFunctions.cosineTopK(e, centDf, 1)
      .select($"qid".as("id"), $"cid".as("cell"))
    val scoped = globalPairs
      .join(asg.toDF("ida", "ca"), "ida").join(asg.toDF("idb", "cb"), "idb")
      .filter($"ca" === $"cb").count()
    val recall = scoped.toDouble / nGlobal
    assert(recall >= 0.9, f"pair recall $recall%.3f < 0.9 on clustered geometry")
    // precision side: every vec the operator groups has a genuine
    // global τ-neighbor (scoped edges ⊆ global edges ⇒ keepers are
    // members of global multi-member components)
    val globalDupIds = globalPairs.select($"ida".as("id"))
      .union(globalPairs.select($"idb".as("id")))
      .distinct().as[Long].collect().toSet
    val refined = SimilarityFunctions.semanticDedupRefined(e, tau, k = 100)
      .select($"keeper", $"n_vecs").as[(Long, Long)].collect()
    assert(refined.nonEmpty && refined.forall(_._2 >= 2))
    assert(refined.forall(r => globalDupIds.contains(r._1)),
      "a grouped keeper lacks any global τ-neighbor (false pair)")
  }
}
