package graft

import graft.operators.Subsetter
import graft.sources.Sources
import org.apache.spark.sql.{DataFrame, SparkSession}

/** CLI parity with the reference's console entry point
  * (`rdbms-subsetter <source> <dest> <fraction> [flags]` —
  * `rdbms_subsetter.py :: generate()`): subset a directory of parquet
  * tables into a destination directory, preserving referential
  * integrity, then print the per-table summary the reference prints
  * around its run.
  *
  *   runMain graft.SubsetCli <srcDir> <destDir> <fraction> \
  *     [--yes] [--logarithmic] [--children N] [--full-tables glob,glob] \
  *     [--exclude-tables glob,glob] [--config fks.json] \
  *     [--force table:pk[,table:v1+v2...]]   (+-joined = composite PK tuple)
  *
  * Like the reference, the CLI prints the per-table target plan and
  * asks for confirmation before touching the destination; `--yes`
  * (upstream's `--yes`) skips the prompt for scripted runs.
  */
object SubsetCli {

  final case class CliArgs(
      src: String,
      dest: String,
      cfg: Subsetter.Config,
      yes: Boolean = false,
      extraFks: Seq[Fk] = Nil,
      validateOnly: Boolean = false)

  /** Parse a `--config` JSON file of extra (pseudo-)FK edges — the
    * reference's `--config` constraints JSON (`Db.__init__` config
    * merge). Shape: `[{"childTable": "...", "childCols": ["..."],
    * "parentTable": "...", "parentCols": ["..."]}]`. */
  def parseConfigFks(path: String): Seq[Fk] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(new java.io.File(path))
    require(root.isArray, s"--config $path: expected a JSON array of FK edges")
    import scala.jdk.CollectionConverters._
    root.elements().asScala.map { n =>
      def strs(field: String): Seq[String] = {
        val f = n.get(field)
        require(f != null, s"--config $path: edge missing '$field'")
        if (f.isArray) f.elements().asScala.map(_.asText()).toSeq
        else Seq(f.asText())
      }
      Fk(strs("childTable").head, strs("childCols"),
        strs("parentTable").head, strs("parentCols"), pseudo = true)
    }.toSeq
  }

  def parse(argv: Seq[String]): CliArgs = {
    require(argv.length >= 3, "usage: SubsetCli <srcDir> <destDir> <fraction> [flags]")
    val Seq(src, dest, fractionS) = argv.take(3)
    var cfg = Subsetter.Config(fraction = fractionS.toDouble)
    var yes = false
    var validateOnly = false
    var extraFks: Seq[Fk] = Nil
    var rest = argv.drop(3).toList
    while (rest.nonEmpty) rest = rest match {
      case "--yes" :: tl => yes = true; tl
      case "--validate" :: tl => validateOnly = true; tl
      case "--config" :: path :: tl => extraFks = parseConfigFks(path); tl
      case "--logarithmic" :: tl => cfg = cfg.copy(logarithmic = true); tl
      case "--children" :: n :: tl => cfg = cfg.copy(children = n.toInt); tl
      case "--full-tables" :: globs :: tl =>
        cfg = cfg.copy(fullTables = globs.split(',').toSeq); tl
      case "--exclude-tables" :: globs :: tl =>
        cfg = cfg.copy(excludeTables = globs.split(',').toSeq); tl
      case "--force" :: specs :: tl =>
        // table:pk for single-column PKs; table:v1+v2 for composite PKs
        // (values in FkGraph.pks column order)
        val (comp, single) = specs.split(',').toSeq
          .map(_.split(':')).map(a => a(0) -> a(1))
          .partition(_._2.contains('+'))
        val forced = single.map { case (t, v) => t -> v.toLong }
          .groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2) }
        val forcedComp = comp
          .map { case (t, v) => t -> v.split('+').toSeq.map(_.toLong: Any) }
          .groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2) }
        cfg = cfg.copy(force = forced, forceComposite = forcedComp); tl
      case other :: _ => throw new IllegalArgumentException(s"unknown flag: $other")
    }
    CliArgs(src, dest, cfg, yes, extraFks, validateOnly)
  }

  /** `--validate` mode: audit an EXISTING destination without touching
    * it — the reference's postcondition check as a standalone command
    * (e.g. after an interrupted run, before trusting a dest for delta
    * mode). Prints per-edge orphan counts for the tables present and
    * returns (orphan total, missing tables). A PARTIAL dest can never
    * audit as trustworthy: edges into the missing tables were never
    * checked, so `main` exits non-zero even at 0 counted orphans —
    * "0 orphans among what exists" is not "closed". */
  def validateOnly(spark: SparkSession, dest: String): (Long, Seq[String]) = {
    val present = Catalog.tableNames
      .filter(t => new java.io.File(s"$dest/$t.parquet").exists()).toSet
    val missing = Catalog.tableNames.filterNot(present).sorted
    if (missing.nonEmpty)
      println(s"missing tables (dest is PARTIAL — edges into these were NOT audited): ${missing.mkString(", ")}")
    if (present.isEmpty) { println("empty destination"); return (0L, missing) }
    val byEdge = validateDest(spark, dest, present)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    byEdge.sortBy(_._1).foreach { case (e, n) => println(f"$e%-40s $n%8d orphans") }
    (byEdge.map(_._2).sum, missing)
  }

  /** Pre-run plan: (table, source rows, target rows) for every included
    * table — footer counts only, no Spark job. This is what the
    * reference's `generate()` prints before asking to proceed. */
  def plan(spark: SparkSession, args: CliArgs): Seq[(String, Long, Long)] =
    Catalog.tableNames.sorted
      .filterNot(t => Subsetter.globMatch(args.cfg.excludeTables, t))
      .map { t =>
        val n = Sources.footerRowCount(spark, s"${args.src}/$t.parquet")
        val tgt = Subsetter.targetSize(n, args.cfg.fraction, args.cfg.logarithmic,
          full = Subsetter.globMatch(args.cfg.fullTables, t))
        (t, n, tgt)
      }

  /** Render the plan the way the summary prints (stable format the
    * spec asserts on). */
  def renderPlan(rows: Seq[(String, Long, Long)]): String =
    rows.map { case (t, n, tgt) => f"$t%-12s $n%10d -> $tgt%10d rows" }
      .mkString("\n")

  /** Run the subset and write each table to `<dest>/<table>.parquet`.
    * Returns per-table written row counts (totals, incl. pre-existing).
    *
    * Reference parity on a NON-EMPTY destination: rdbms-subsetter run
    * twice keeps what dest already has and inserts only missing rows
    * (its per-row existence check). Here that is detected by dest
    * table files being present → `subsetDelta` computes the disjoint,
    * referentially-closed gap and APPENDS it; an empty dest gets the
    * full first-run subset. */
  def run(spark: SparkSession, args: CliArgs): Map[String, Long] = {
    val tables = Catalog.load(spark, args.src)
    val counts = Catalog.tableNames.map(t =>
      t -> Sources.footerRowCount(spark, s"${args.src}/$t.parquet")).toMap
    val graph = FkGraph.default.copy(
      fks = FkGraph.default.fks ++ args.extraFks)
    val destExisting: Map[String, DataFrame] = Catalog.tableNames
      .filter(t => new java.io.File(s"${args.dest}/$t.parquet").exists())
      .map(t => t -> spark.read.parquet(s"${args.dest}/$t.parquet")).toMap
    // A PARTIAL dest (some tables' files missing — a crashed or
    // interrupted first run; tables are written sequentially) is NOT
    // referentially closed: present tables' keys demand parents in the
    // missing tables. Assuming closure there would skip the wave-0
    // parent walk and the merged dest could silently carry orphans —
    // so closure is only assumed when EVERY table's file exists, and a
    // partial dest runs the full closure over its keys (correct, just
    // not the fast path) with a loud warning.
    val destComplete = destExisting.size == Catalog.tableNames.size
    if (destExisting.nonEmpty && !destComplete)
      System.err.println(
        s"[subset] WARNING: partial destination (${destExisting.size}/" +
          s"${Catalog.tableNames.size} tables present — interrupted run?); " +
          "treating existing rows as UNCLOSED and re-walking parent closure")
    val out =
      if (destExisting.isEmpty)
        Subsetter.subset(tables, graph, args.cfg, rowCounts = counts)
      else
        Subsetter.subsetDelta(tables, graph, args.cfg, destExisting,
          rowCounts = counts, assumeDestClosed = destComplete)
    // Materialize every delta BEFORE the first append: the lazy plans
    // anti-join against the same dest directory being appended to (safe
    // only because the file listing was snapshotted at read time), and
    // a crash mid-loop must not leave later tables' plans reading
    // earlier tables' fresh appends. localCheckpoint (eager) pins every
    // delta to its pre-write snapshot; a crash between writes then
    // leaves a partially-APPLIED delta, which the partial-dest guard
    // above handles on the next run by re-walking closure.
    val materialized = out.toSeq.sortBy(_._1).map { case (t, df) =>
      t -> (if (destExisting.contains(t)) df.localCheckpoint() else df)
    }
    materialized.map { case (t, df) =>
      if (destExisting.contains(t))
        df.write.mode("append").parquet(s"${args.dest}/$t.parquet")
      else Sources.writeParquet(df, s"${args.dest}/$t.parquet")
      t -> Sources.footerRowCount(spark, s"${args.dest}/$t.parquet")
    }.toMap
  }

  /** Reload the written destination and verify the RI postcondition —
    * the check the reference's own tests perform on its output. */
  def validateDest(spark: SparkSession, dest: String,
                   writtenTables: Set[String]): DataFrame = {
    val reloaded = writtenTables.map(t =>
      t -> spark.read.parquet(s"$dest/$t.parquet")).toMap
    Subsetter.validateRI(reloaded, FkGraph.default)
  }

  def main(argv: Array[String]): Unit = {
    val args = parse(argv.toSeq)
    val spark = GraftSession.local("graft-subset")
    spark.sparkContext.setLogLevel("WARN")
    try {
      if (args.validateOnly) {
        val (orphans, missing) = validateOnly(spark, args.dest)
        println(s"referential integrity: $orphans orphans")
        if (orphans != 0L) sys.exit(2)
        else if (missing.nonEmpty) sys.exit(3) // partial: NOT certified clean
        else return
      }
      // reference parity: show the per-table plan, then confirm unless
      // --yes. A non-interactive stdin (null readLine) aborts rather
      // than assuming consent.
      println(renderPlan(plan(spark, args)))
      if (!args.yes) {
        print("proceed? [y/N] ")
        val answer = scala.io.StdIn.readLine()
        if (answer == null || !answer.trim.toLowerCase.startsWith("y")) {
          println("aborted")
          spark.stop()
          sys.exit(1)
        }
      }
      val written = run(spark, args)
      written.toSeq.sortBy(_._1).foreach { case (t, n) =>
        println(f"$t%-12s $n%10d rows")
      }
      val orphanTotal = validateDest(spark, args.dest, written.keySet)
        .agg(org.apache.spark.sql.functions.sum("orphans")).head().getLong(0)
      println(s"referential integrity: $orphanTotal orphans")
      if (orphanTotal != 0L) sys.exit(2)
    } finally spark.stop()
  }
}
