package graft

/** One foreign-key edge: `childTable.childCols` references
  * `parentTable.parentCols`. `pseudo` marks config-declared edges the
  * schema itself would not carry — the reference's `--config`
  * "constraints" JSON (`rdbms_subsetter.py :: Db.__init__` config merge;
  * SURVEY.md §2 row 17).
  */
final case class Fk(
    childTable: String,
    childCols: Seq[String],
    parentTable: String,
    parentCols: Seq[String],
    pseudo: Boolean = false) {
  def name: String = s"$childTable->$parentTable(${childCols.mkString(",")})"
}

/** Declared PK/FK metadata for a catalog of tables.
  *
  * The reference reflects constraints from the DB
  * (`Inspector.get_foreign_keys` / `get_pk_constraint`) and wires the
  * inverse `child_fks` edges in a second pass; parquet has no constraint
  * metadata, so the whole graph is configuration (SURVEY.md §1, §3c).
  */
final case class FkGraph(pks: Map[String, Seq[String]], fks: Seq[Fk]) {
  /** Outgoing edges — the reference's `table.fks` (to parents). */
  def parentEdges(table: String): Seq[Fk] = fks.filter(_.childTable == table)
  /** Incoming edges — the reference's `table.child_fks`. */
  def childEdges(table: String): Seq[Fk] = fks.filter(_.parentTable == table)
  def tables: Seq[String] = pks.keys.toSeq.sorted

  /** Tables in dependency order, parents before children — the
    * reference's `meta.sorted_tables` insert order, required when
    * appending into a destination whose DDL enforces the FKs. Pseudo
    * (config-declared) edges don't constrain any catalog and are
    * ignored; a cycle (mutual/self FKs) breaks at the alphabetically
    * first remaining table, deterministically. */
  def insertionOrder: Seq[String] = {
    val real = fks.filterNot(_.pseudo).filter(f => f.childTable != f.parentTable)
    val remaining = scala.collection.mutable.SortedSet(tables: _*)
    val out = Seq.newBuilder[String]
    while (remaining.nonEmpty) {
      val ready = remaining.toSeq.filter(t => !real.exists(f =>
        f.childTable == t && remaining.contains(f.parentTable)))
      val batch = if (ready.nonEmpty) ready else Seq(remaining.head)
      out ++= batch
      remaining --= batch
    }
    out.result()
  }
}

object FkGraph {

  /** Reflect the PK/FK graph from a live database catalog over JDBC —
    * the reference's core UX: `rdbms-subsetter <src_url> <dest_url>
    * <fraction>` discovers its edges from the source catalog
    * (`rdbms_subsetter.py :: Db.__init__` — SQLAlchemy
    * `MetaData.reflect` + `Inspector.get_foreign_keys` /
    * `get_pk_constraint`; SURVEY.md §1, §3c). Here
    * `java.sql.DatabaseMetaData` supplies the same catalog facts:
    * `getPrimaryKeys` (PK columns in KEY_SEQ order) and
    * `getImportedKeys` (FK edges to parents, composite keys grouped
    * by KEY_SEQ runs), so pointing the engine at a JDBC URL needs
    * ZERO declared edges.
    *
    * Identifier case: unquoted names are stored upper-case by
    * Derby/DB2/Oracle-family catalogs; they normalize to lower case
    * here, matching both SQLAlchemy's reflection convention and this
    * engine's lower-case maps. System schemas (Derby `SYS*`/`SQLJ`,
    * `INFORMATION_SCHEMA`) are skipped. Driver-side JDBC metadata
    * calls only — a few rows per table, no data movement. */
  def reflect(url: String,
              props: java.util.Properties = new java.util.Properties(),
              schemaPattern: String = null): FkGraph = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try reflect(conn, schemaPattern) finally conn.close()
  }

  def reflect(conn: java.sql.Connection, schemaPattern: String): FkGraph = {
    val md = conn.getMetaData
    val sysSchemas = (s: String) =>
      s != null && (s.startsWith("SYS") || s == "SQLJ" || s == "INFORMATION_SCHEMA")
    val tabs = {
      val rs = md.getTables(null, schemaPattern, "%", Array("TABLE"))
      val b = Seq.newBuilder[(String, String)]
      while (rs.next()) {
        val sch = rs.getString("TABLE_SCHEM")
        if (!sysSchemas(sch)) b += ((sch, rs.getString("TABLE_NAME")))
      }
      rs.close()
      b.result()
    }
    val pks = tabs.map { case (sch, t) =>
      val rs = md.getPrimaryKeys(null, sch, t)
      val cols = Seq.newBuilder[(Int, String)]
      while (rs.next()) cols += ((rs.getShort("KEY_SEQ").toInt,
        rs.getString("COLUMN_NAME")))
      rs.close()
      t.toLowerCase -> cols.result().sortBy(_._1).map(_._2.toLowerCase)
    }.toMap
    val fks = tabs.flatMap { case (sch, t) =>
      val rs = md.getImportedKeys(null, sch, t)
      // one row per FK COLUMN; KEY_SEQ==1 starts a new edge (robust
      // even when FK_NAME is null, which some drivers permit)
      val rows = Seq.newBuilder[(Int, String, String, String)]
      while (rs.next()) rows += ((rs.getShort("KEY_SEQ").toInt,
        rs.getString("FKCOLUMN_NAME"), rs.getString("PKTABLE_NAME"),
        rs.getString("PKCOLUMN_NAME")))
      rs.close()
      val edges = Seq.newBuilder[Fk]
      var cur: List[(Int, String, String, String)] = Nil
      def flush(): Unit = if (cur.nonEmpty) {
        val g = cur.reverse
        edges += Fk(t.toLowerCase, g.map(_._2.toLowerCase),
          g.head._3.toLowerCase, g.map(_._4.toLowerCase))
        cur = Nil
      }
      rows.result().foreach { r =>
        if (r._1 == 1) flush()
        cur = r :: cur
      }
      flush()
      edges.result()
    }
    FkGraph(pks, fks)
  }

  /** Star schema of the driver testdata (FIXTURES.md) plus the
    * config-declared pseudo-FK `events.user_id -> customer.c_custkey`. */
  val default: FkGraph = FkGraph(
    pks = Map(
      "region" -> Seq("r_regionkey"),
      "nation" -> Seq("n_nationkey"),
      "customer" -> Seq("c_custkey"),
      "supplier" -> Seq("s_suppkey"),
      "part" -> Seq("p_partkey"),
      "orders" -> Seq("o_orderkey"),
      "lineitem" -> Seq("l_orderkey", "l_linenumber"),
      "events" -> Seq("event_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id")),
    fks = Seq(
      Fk("lineitem", Seq("l_orderkey"), "orders", Seq("o_orderkey")),
      Fk("lineitem", Seq("l_partkey"), "part", Seq("p_partkey")),
      Fk("lineitem", Seq("l_suppkey"), "supplier", Seq("s_suppkey")),
      Fk("orders", Seq("o_custkey"), "customer", Seq("c_custkey")),
      Fk("customer", Seq("c_nationkey"), "nation", Seq("n_nationkey")),
      Fk("supplier", Seq("s_nationkey"), "nation", Seq("n_nationkey")),
      Fk("nation", Seq("n_regionkey"), "region", Seq("r_regionkey")),
      Fk("events", Seq("user_id"), "customer", Seq("c_custkey"), pseudo = true)))
}
