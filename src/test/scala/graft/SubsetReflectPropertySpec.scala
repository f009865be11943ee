package graft

import graft.operators.Subsetter

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import java.sql.DriverManager
import java.util.concurrent.atomic.AtomicInteger

/** End-to-end generalization of FkReflectPropertySpec (VERDICT r10
  * item 6): reflection round-tripping EDGES is necessary but not
  * sufficient — the reference's contract is that a subset of a live,
  * FK-ENFORCED source database lands in an equally-enforced destination
  * with zero orphans and every table at target. This property generates
  * random DAG schemas (same envelope as FkReflectPropertySpec: DAG
  * edges child→lower-indexed parent, single/composite PKs, ≤1 edge per
  * (child,parent)), materializes each as real enforced Derby DDL in a
  * SOURCE and an identical empty DESTINATION database, loads FK-valid
  * random data parents-first, and drives the real CLI path:
  * `SubsetCli.run` with ZERO declared edges — the graph comes entirely
  * from `FkGraph.reflect` over the live catalog — writing over JDBC
  * into the enforcing destination. Asserted postconditions per case:
  *
  *  - the destination's enforced FKs ACCEPTED every insert (run did
  *    not throw — insertionOrder was a valid topological order);
  *  - `SubsetCli.validateDest` recounts zero orphans per edge over the
  *    data read BACK from the destination;
  *  - completeness: every table's destination count ≥
  *    `Subsetter.targetSize(n, fraction)` (the source always suffices
  *    here) and ≤ its source count.
  */
class SubsetReflectPropertySpec extends SparkSpecBase {

  private case class TableShape(compositePk: Boolean, parents: Seq[Int], rows: Int)
  private case class Schema(tables: Seq[TableShape])

  /** Smaller table count than the pure-reflection property (each case
    * runs a full Spark-over-JDBC subset pipeline): 2..4 tables,
    * 8..30 rows each. */
  private val schemaGen: Gen[Schema] = for {
    n <- Gen.choose(2, 4)
    shapes <- Gen.sequence[Seq[TableShape], TableShape]((0 until n).map { i =>
      for {
        comp <- Gen.oneOf(true, false)
        k <- Gen.choose(0, math.min(i, 2))
        parents <- Gen.pick(k, 0 until i)
        rows <- Gen.choose(8, 30)
      } yield TableShape(comp, parents.toSeq.sorted, rows)
    })
  } yield Schema(shapes)

  private def pkCols(i: Int, comp: Boolean): Seq[String] =
    if (comp) Seq(s"id${i}a", s"id${i}b") else Seq(s"id$i")

  private def ddl(s: Schema): Seq[String] =
    s.tables.zipWithIndex.map { case (t, i) =>
      val pk = pkCols(i, t.compositePk)
      val fkColDefs = t.parents.flatMap { p =>
        pkCols(p, s.tables(p).compositePk).map(c => s"fk${p}_$c INT")
      }
      val fkConstraints = t.parents.map { p =>
        val pcols = pkCols(p, s.tables(p).compositePk)
        s"FOREIGN KEY (${pcols.map(c => s"fk${p}_$c").mkString(", ")}) " +
          s"REFERENCES t$p (${pcols.mkString(", ")})"
      }
      (s"CREATE TABLE t$i (" +
        (pk.map(c => s"$c INT NOT NULL") ++ fkColDefs).mkString(", ") +
        s", PRIMARY KEY (${pk.mkString(", ")})" +
        (if (fkConstraints.nonEmpty) fkConstraints.mkString(", ", ", ", "") else "") +
        ")")
    }

  /** FK-valid random rows, parents-first. PK of row k is k (composite:
    * (k, k)); each FK picks a uniform parent row, so the closure has
    * real fan-in to chase. Deterministic per (schema, caseSeed). */
  private def populate(conn: java.sql.Connection, s: Schema, caseSeed: Long): Unit = {
    val rnd = new scala.util.Random(caseSeed)
    s.tables.zipWithIndex.foreach { case (t, i) =>
      val pk = pkCols(i, t.compositePk)
      val fkCols = t.parents.flatMap { p =>
        pkCols(p, s.tables(p).compositePk).map(c => s"fk${p}_$c")
      }
      val cols = pk ++ fkCols
      val ps = conn.prepareStatement(
        s"INSERT INTO t$i (${cols.mkString(", ")}) VALUES " +
          s"(${cols.map(_ => "?").mkString(", ")})")
      try (0 until t.rows).foreach { k =>
        pk.indices.foreach(j => ps.setInt(j + 1, k))
        var col = pk.size
        t.parents.foreach { p =>
          val ref = rnd.nextInt(s.tables(p).rows)
          val width = pkCols(p, s.tables(p).compositePk).size
          (0 until width).foreach { _ => col += 1; ps.setInt(col, ref) }
        }
        ps.executeUpdate()
      } finally ps.close()
    }
  }

  private val dbSeq = new AtomicInteger(0)

  test("reflected random schemas subset end-to-end over the CLI path with RI + targets") {
    val fraction = 0.5
    val prop = Prop.forAll(schemaGen) { s =>
      val id = dbSeq.incrementAndGet()
      val srcUrl = s"jdbc:derby:memory:subprop_src$id;create=true"
      val dstUrl = s"jdbc:derby:memory:subprop_dst$id;create=true"
      try {
        for (url <- Seq(srcUrl, dstUrl)) {
          val conn = DriverManager.getConnection(url)
          try {
            val st = conn.createStatement()
            try ddl(s).foreach(st.execute) finally st.close()
          } finally conn.close()
        }
        val srcConn = DriverManager.getConnection(srcUrl)
        try populate(srcConn, s, caseSeed = id * 7919L) finally srcConn.close()

        // zero declared edges: graph discovery is reflection's job
        val args = SubsetCli.CliArgs(srcUrl, dstUrl,
          Subsetter.Config(fraction = fraction), yes = true)
        val written = SubsetCli.run(spark, args)
        val graph = SubsetCli.sourceGraph(args)

        val orphanRows = SubsetCli
          .validateDest(spark, dstUrl, written.keySet, graph)
          .select("edge", "orphans").collect()
          .map(r => r.getString(0) -> r.getLong(1))
        val targetsOk = s.tables.zipWithIndex.map { case (t, i) =>
          val n = t.rows.toLong
          val got = written(s"t$i")
          val want = Subsetter.targetSize(n, fraction)
          (s"t$i", got, want, n)
        }
        (orphanRows.forall(_._2 == 0L) :|
          s"orphans: ${orphanRows.filter(_._2 != 0L).mkString(",")}") &&
          (targetsOk.forall { case (_, got, want, n) => got >= want && got <= n } :|
            s"targets violated: $targetsOk") &&
          ((written.keySet == s.tables.indices.map(i => s"t$i").toSet) :|
            s"tables written ${written.keySet}")
      } finally {
        for (url <- Seq(srcUrl, dstUrl)) {
          try DriverManager.getConnection(url.replace(";create=true", ";drop=true"))
          catch { case _: java.sql.SQLException => () } // 08006 on drop by design
        }
      }
    }
    val params = SCTest.Parameters.default.withMinSuccessfulTests(10)
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }
}
