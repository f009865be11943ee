package graft

import graft.operators.Subsetter
import graft.sources.Sources
import java.util.Properties

/** Grounds the real-DB parity claim: the upstream tool's entire habitat
  * is a live RDBMS reached over a DB-API connection. Embedded Apache
  * Derby (in the Spark distribution's jars — pure JVM, in-memory) plays
  * that role here: parquet fixtures go INTO Derby over JDBC, the
  * subsetter reads its sources back OVER JDBC, and the subset is written
  * and re-read over JDBC before the RI postcondition is checked. */
class JdbcRoundTripSpec extends SparkSpecBase {

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private def props: Properties = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    p
  }

  private val graph = FkGraph(
    pks = Map("region" -> Seq("r_regionkey"), "nation" -> Seq("n_nationkey"),
      "customer" -> Seq("c_custkey")),
    fks = Seq(
      Fk("nation", Seq("n_regionkey"), "region", Seq("r_regionkey")),
      Fk("customer", Seq("c_nationkey"), "nation", Seq("n_nationkey"))))

  test("JDBC round-trip: parquet -> Derby -> subset over JDBC -> Derby -> RI") {
    val src = "/root/testdata/sf0.001"
    val tables = Seq("region", "nation", "customer")

    // load the DB like a reference user's source database
    tables.foreach { t =>
      Sources.writeJdbc(spark.read.parquet(s"$src/$t.parquet"), url, t, props)
    }

    // sources read over JDBC, not parquet
    val jdbcTables = tables.map(t => t -> Sources.readJdbc(spark, url, t, props)).toMap
    assert(jdbcTables("region").count() == 5L)
    assert(jdbcTables("nation").count() == 25L)
    assert(jdbcTables("customer").count() == 150L)

    // children = 0 isolates sampling+closure+top-up so the leaf count
    // is exact (the bounded child pull legitimately adds rows past it)
    val out = Subsetter.subset(jdbcTables, graph,
      Subsetter.Config(fraction = 0.4, children = 0))

    // subset written back over JDBC (the reference writes into a dest DB)
    out.foreach { case (t, df) => Sources.writeJdbc(df, url, s"sub_$t", props) }
    val reloaded = tables.map(t =>
      t -> Sources.readJdbc(spark, url, s"sub_$t", props)).toMap

    // targets met exactly on the sampled leaves; RI holds on the copy
    assert(reloaded("customer").count() == 60L) // ceil(150*0.4)
    assert(reloaded("nation").count() >= 10L)   // target; closure may add
    assert(reloaded("region").count() >= 2L)
    val orphans = Subsetter.validateRI(reloaded, graph)
      .select("orphans").collect().map(_.getLong(0))
    assert(orphans.forall(_ == 0L))
  }
}
