package graft

import graft.queries.ProfileQueries

/** Pins for the column profiler's per-kind semantics on a fixture with
  * the edge cases the real tables don't have (nulls in every kind,
  * duplicate values) — the DuckDB oracle covers the declared tables. */
class ProfileSpec extends SparkSpecBase {

  test("profileOne: nulls, distincts and Det renderings across all four kinds") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, 'ab',   CAST(12.34 AS DOUBLE), TIMESTAMP'2020-01-01 00:00:00'),
        |  (2L, NULL,   CAST(56.78 AS DOUBLE), NULL),
        |  (2L, 'cdef', CAST(12.34 AS DOUBLE), TIMESTAMP'2020-01-02 00:00:01')
        |AS t(k, s, m, ts)""".stripMargin)
    val got = ProfileQueries.profileOne(df, "t",
        Seq(("k", "int"), ("s", "str"), ("m", "money"), ("ts", "ts")))
      .collect()
      .map(r => r.getString(1) -> r).toMap

    val k = got("k")
    assert(k.getLong(2) == 3 && k.getLong(3) == 0 && k.getLong(4) == 2)
    assert(k.getString(5) == "1" && k.getString(6) == "2" && k.isNullAt(7))

    val s = got("s")
    assert(s.getLong(3) == 1 && s.getLong(4) == 2)
    assert(s.getString(5) == "ab" && s.getString(6) == "cdef")
    assert(s.getDouble(7) == 3.0) // (2 + 4) / 2 non-null strings

    val m = got("m")
    assert(m.getLong(3) == 0 && m.getLong(4) == 2)
    assert(m.getString(5) == "12.34" && m.getString(6) == "56.78")

    val ts = got("ts")
    assert(ts.getLong(3) == 1 && ts.getLong(4) == 2)
    assert(ts.getString(5) == "1577836800" && ts.getString(6) == "1577923201")
  }

  test("declared query: one row per profiled column, total order") {
    val out = ProfileQueries.profileTables(spark, Catalog.testdataSfDirs.head)
      .collect()
    assert(out.length == 11) // 5 documents + 6 orders columns
    val keys = out.map(r => (r.getString(0), r.getString(1))).toSeq
    assert(keys == keys.sorted, "output carries its total order")
    assert(out.forall(_.getLong(2) > 0))
  }

  test("sketch tier: every approx distinct within 10% of the exact tier") {
    val dir = Catalog.testdataSfDirs.head
    val exact = ProfileQueries.profileTables(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    val approx = ProfileQueries.profileTablesApprox(spark, dir).collect()
    assert(approx.length == exact.size) // same rows, same total order
    approx.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val e = exact(key).toDouble
      val a = r.getLong(4).toDouble
      // HLL++ at the default rsd 0.05 — 10% is a 2-sigma-ish bound the
      // fixture's cardinalities (3..9549) clear with margin
      assert(math.abs(a - e) <= 0.10 * math.max(e, 1.0),
        s"approx distinct off at $key: exact=$e approx=$a")
    }
    // the non-sketch metrics are IDENTICAL to the exact tier
    val exactRest = ProfileQueries.profileTables(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getString(5), r.getString(6))).toSeq
    val approxRest = approx.map(r => (r.getString(0), r.getString(1),
      r.getLong(2), r.getLong(3), r.getString(5), r.getString(6))).toSeq
    assert(approxRest == exactRest)
  }

  test("histOne: exact bin edges, constant column, and count conservation") {
    import org.apache.spark.sql.functions.col
    // range 0..31, B=16 → bins of width exactly 2: v=0,1→bin 0; 30,31→bin 15
    val df = spark.range(0, 32).toDF("x")
    val got = ProfileQueries.histOne(df, "t", "x", col("x")).collect()
      .map(r => r.getLong(2) -> (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet == (0L to 15L).toSet)
    for (b <- 0L to 15L) assert(got(b) == ((2L, 2 * b, 2 * b + 1)), s"bin $b")

    // constant column: range collapses, greatest() guard keeps div defined,
    // every row lands in bin 0
    val const = spark.range(0, 7).selectExpr("CAST(42 AS BIGINT) AS x")
    val g2 = ProfileQueries.histOne(const, "t", "x", col("x")).collect()
    assert(g2.length == 1 && g2(0).getLong(2) == 0L && g2(0).getLong(3) == 7L)
    assert(g2(0).getLong(4) == 42L && g2(0).getLong(5) == 42L)

    // declared query conserves row counts per arm
    val out = ProfileQueries.profileHistogram(spark, Catalog.testdataSfDirs.head)
      .collect()
    val byArm = out.groupBy(r => (r.getString(0), r.getString(1)))
      .view.mapValues(_.map(_.getLong(3)).sum).toMap
    assert(byArm.keySet ==
      Set(("documents", "n_chars"), ("orders", "o_totalprice"),
        ("lineitem", "l_extendedprice")))
    assert(byArm.values.forall(_ > 0))
  }
}
