package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = GraftSession.local("graft-verify")
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Sources.calibrateScanSplit(spark, sfDir)
    new java.io.File(outDir).mkdirs()
    // dev-only: GRAFT_VERIFY_ONLY=q1,q2 restricts the dump while
    // iterating on a query; the driver sets nothing and gets them all.
    val only = sys.env.get("GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty) // set-but-empty == unset (sbt envVars can't remove a key)
    // dev-only rung support (r12): the components oracle's recursive
    // reach set is ~n² on the fixture's dense unigram pair graph —
    // GRAFT_ORACLE_COMPONENTS_MOD thins the slice on BOTH ends (same
    // operator, same oracle generator, same modulus) so the rung sweep
    // can verify it. The driver sets nothing → the declared mod=25.
    // set-but-empty == unset, like GRAFT_VERIFY_ONLY (sbt envVars can't
    // remove a key once set in a session)
    val componentsMod = sys.env.get("GRAFT_ORACLE_COMPONENTS_MOD")
      .filter(_.nonEmpty).map(_.toInt)
    // same pattern for the shingle-LSH tier (r13 VERDICT item 3): the
    // EXACT trigram oracle relation spills DuckDB past rung disk
    // budgets (55 GB at sf10) — thin the slice identically on both ends
    val shingleMod = sys.env.get("GRAFT_ORACLE_SHINGLE_MOD")
      .filter(_.nonEmpty).map(_.toInt)
    // dedup_semantic rung knobs: SEM_PLANES regenerates the oracle at
    // the rung's auto-selected plane width (matching the declared
    // query's autoPlanes choice there); SEM_MOD additionally thins the
    // corpus on BOTH ends where the oracle's n×k assignment join
    // outgrows DuckDB. The driver sets neither → gate oracle at the
    // 4-plane floor.
    val semPlanes = sys.env.get("GRAFT_ORACLE_SEM_PLANES")
      .filter(_.nonEmpty).map(_.toInt)
    val semMod = sys.env.get("GRAFT_ORACLE_SEM_MOD")
      .filter(_.nonEmpty).map(_.toInt)
    // sim_topk_projected rung knob (r16 verdict item 3): DuckDB cannot
    // evaluate the 16×64-literal projection over a rung corpus —
    // PROJ_MOD thins the embeddings identically on both ends so the
    // rung sweep keeps a true hash gate on the slice
    val projMod = sys.env.get("GRAFT_ORACLE_PROJ_MOD")
      .filter(_.nonEmpty).map(_.toInt)
    // dedup_minhash_portable rung knob: the exact trigram verify join
    // in the oracle outgrows DuckDB at rung corpora — thin BOTH ends
    val minhashMod = sys.env.get("GRAFT_ORACLE_MINHASH_MOD")
      .filter(_.nonEmpty).map(_.toInt)
    val queries = SparkEntry.queries ++
      componentsMod.map(m =>
        "dedup_components" -> ((s: SparkSession, d: String) =>
          graft.queries.SimilarityQueries.dedupComponentsMod(m)(s, d))).toMap ++
      shingleMod.map(m =>
        "dedup_shingle_lsh" -> ((s: SparkSession, d: String) =>
          graft.queries.SimilarityQueries.dedupShingleLshMod(m)(s, d))).toMap ++
      semMod.map(m =>
        "dedup_semantic" -> ((s: SparkSession, d: String) =>
          graft.queries.SimilarityQueries.dedupSemanticMod(m,
            semPlanes.getOrElse(graft.queries.SimilarityQueries.SemPlanes))(s, d))).toMap ++
      projMod.map(m =>
        "sim_topk_projected" -> ((s: SparkSession, d: String) =>
          graft.queries.SimilarityQueries.simTopkProjectedMod(m)(s, d))).toMap ++
      minhashMod.map(m =>
        "dedup_minhash_portable" -> ((s: SparkSession, d: String) =>
          graft.queries.SimilarityQueries.dedupMinhashPortableMod(m)(s, d))).toMap
    queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // queries are independent — drop their checkpoint blocks so a
      // 90-query run's storage footprint stays one query, not the sum.
      graft.plans.Checkpoints.clearAll(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // dev-only rung support: the cosine tier's auto plane knob means a
    // rung-sized corpus runs at more planes than the gate SFs' literal
    // 8; GRAFT_ORACLE_PLANES regenerates the two cosine oracles from
    // the same CTE generator at that width so the sweep's DuckDB side
    // matches the operator. The driver sets nothing → gate oracles.
    val oracles = (sys.env.get("GRAFT_ORACLE_PLANES").filter(_.nonEmpty).map(_.toInt) match {
      case Some(p) => SparkEntry.oracleSql ++ Map(
        "dedup_cosine_pairs" -> graft.queries.SimilarityQueries.dedupCosinePairsSqlFor(p),
        "dedup_cosine_keeper" -> graft.queries.SimilarityQueries.dedupCosineKeeperSqlFor(p))
      case None => SparkEntry.oracleSql
    }) ++ componentsMod.map(m =>
      "dedup_components" -> graft.queries.SimilarityQueries.dedupComponentsSqlFor(m)) ++
      shingleMod.map(m =>
        "dedup_shingle_lsh" -> graft.queries.SimilarityQueries.dedupNgramJaccardSqlFor(m)) ++
      (if (semPlanes.isDefined || semMod.isDefined)
        Map("dedup_semantic" -> graft.queries.SimilarityQueries.dedupSemanticSqlFor(
          semPlanes.getOrElse(graft.queries.SimilarityQueries.SemPlanes),
          semMod.getOrElse(1)))
      else Map.empty[String, String]) ++
      projMod.map(m =>
        "sim_topk_projected" -> graft.queries.SimilarityQueries.simTopkProjectedSqlFor(m)).toMap ++
      minhashMod.map(m =>
        "dedup_minhash_portable" -> graft.queries.SimilarityQueries.dedupMinhashPortableSqlFor(m)).toMap
    val json = oracles
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
