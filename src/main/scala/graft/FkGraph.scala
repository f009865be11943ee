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
}

object FkGraph {

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
