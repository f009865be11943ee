package graft

import graft.operators.Subsetter
import graft.sources.Sources
import org.apache.spark.sql.{DataFrame, SparkSession}

/** CLI parity with the reference's console entry point
  * (`rdbms-subsetter <source> <dest> <fraction> [flags]` —
  * `rdbms_subsetter.py :: generate()`): subset a source into a
  * destination, preserving referential integrity, then print the
  * per-table summary the reference prints around its run.
  *
  * Source/dest may each be a parquet DIRECTORY or a JDBC URL
  * (`jdbc:...`). A JDBC source is the reference's native UX: the
  * PK/FK graph is REFLECTED from the live catalog
  * (`FkGraph.reflect`), no declared edges needed; a JDBC dest must be
  * the upstream's contract — an identical, empty, pre-created schema.
  *
  *   runMain graft.SubsetCli <srcDirOrJdbcUrl> <destDirOrJdbcUrl> <fraction> \
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

  private def isJdbc(path: String): Boolean = path.startsWith("jdbc:")

  /** Driver-side row count over JDBC — the catalog-shaped peek the
    * plan needs (one COUNT(*) per table; the DB aggregates, nothing
    * moves). The parquet analogue is [[Sources.footerRowCount]]. */
  private def jdbcRowCount(url: String, table: String): Long = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(s"SELECT COUNT(*) FROM $table")
      rs.next()
      rs.getLong(1)
    } finally conn.close()
  }

  /** Unquoted identifiers come back UPPER-cased from Derby-family
    * catalogs; the engine (and the reflected graph) is lower-case, and
    * Subsetter's struct-field lookups are case-sensitive. */
  private def lowerCols(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.toLowerCase).toIndexedSeq: _*)

  /** The constraint graph for this run: REFLECTED from the source DB
    * catalog when the source is a JDBC URL (`FkGraph.reflect` — zero
    * declared edges, the reference's `Db.__init__` reflection UX),
    * the declared testdata graph for parquet directories. `--config`
    * pseudo-edges merge into either. */
  def sourceGraph(args: CliArgs): FkGraph = {
    val base = if (isJdbc(args.src)) FkGraph.reflect(args.src) else FkGraph.default
    base.copy(fks = base.fks ++ args.extraFks)
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
    if (new java.io.File(dest, PendingDirName).exists())
      println(s"warning: $PendingDirName exists — a delta run is in flight " +
        "or crashed; a plain run will recover it before judging this audit")
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
  def plan(spark: SparkSession, args: CliArgs): Seq[(String, Long, Long)] = {
    val names =
      if (isJdbc(args.src)) sourceGraph(args).tables else Catalog.tableNames.sorted
    names
      .filterNot(t => Subsetter.globMatch(args.cfg.excludeTables, t))
      .map { t =>
        val n =
          if (isJdbc(args.src)) jdbcRowCount(args.src, t)
          else Sources.footerRowCount(spark, s"${args.src}/$t.parquet")
        val tgt = Subsetter.targetSize(n, args.cfg.fraction, args.cfg.logarithmic,
          full = Subsetter.globMatch(args.cfg.fullTables, t))
        (t, n, tgt)
      }
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
    val graph = sourceGraph(args)
    if (isJdbc(args.src)) runJdbc(spark, args, graph)
    else runParquet(spark, args, graph)
  }

  /** JDBC-source run — the reference's native UX: edges reflected from
    * the source catalog, tables read over JDBC, the subset appended
    * into the destination. A JDBC dest mirrors the upstream contract
    * exactly (identical EMPTY schema pre-created by the user; the tool
    * never issues DDL) and inserts in parent-before-child
    * [[FkGraph.insertionOrder]] so enforced FKs accept every batch; a
    * directory dest lands the subset as parquet — a DB→lake snapshot.
    * Delta/append detection remains a parquet-to-parquet feature. */
  private def runJdbc(spark: SparkSession, args: CliArgs,
                      graph: FkGraph): Map[String, Long] = {
    val props = new java.util.Properties()
    val names = graph.tables
      .filterNot(t => Subsetter.globMatch(args.cfg.excludeTables, t))
    val tables = names.map(t =>
      t -> lowerCols(Sources.readJdbc(spark, args.src, t, props))).toMap
    val counts = names.map(t => t -> jdbcRowCount(args.src, t)).toMap
    val out = Subsetter.subset(tables, graph, args.cfg, rowCounts = counts)
    graph.insertionOrder.filter(out.contains).map { t =>
      val df = out(t)
      if (isJdbc(args.dest)) {
        Sources.appendJdbc(df, args.dest, t, props)
        t -> jdbcRowCount(args.dest, t)
      } else {
        Sources.writeParquet(df, s"${args.dest}/$t.parquet")
        t -> Sources.footerRowCount(spark, s"${args.dest}/$t.parquet")
      }
    }.toMap
  }

  private def runParquet(spark: SparkSession, args: CliArgs,
                         graph: FkGraph): Map[String, Long] = {
    recoverPendingDelta(args.dest)
    val tables = Catalog.load(spark, args.src)
    val counts = Catalog.tableNames.map(t =>
      t -> Sources.footerRowCount(spark, s"${args.src}/$t.parquet")).toMap
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
    // Crash-atomic delta apply — the upstream's whole-run transaction
    // (`create_subset_in` commits once at the end) re-expressed for
    // files. Appending table-by-table into live dest dirs would leave
    // a partially-APPLIED delta on a crash, with no marker saying how
    // far it got. Instead:
    //   1. STAGE: every append-table's delta is written under
    //      <dest>/_delta_pending/<t>.parquet. Staging also materializes
    //      each delta before any dest table mutates (the lazy plans
    //      anti-join the same dest dirs being appended to), replacing
    //      the former eager localCheckpoint.
    //   2. COMMIT: MANIFEST.json lands by atomic rename. Its presence
    //      IS the commit point — no manifest, nothing applied.
    //   3. APPLY: staged part files MOVE (atomic, unique names) into
    //      the dest table dirs, then the staging dir is removed.
    // A crash before (2) discards cleanly (dest untouched); after (2),
    // [[recoverPendingDelta]] — run first on every invocation — simply
    // finishes the remaining moves: moves are idempotent because a
    // moved file no longer exists in staging. Fresh tables (partial
    // dest) keep direct writes — the partial-dest guard re-walks
    // closure for those.
    val (appends, fresh) = out.toSeq.sortBy(_._1)
      .partition { case (t, _) => destExisting.contains(t) }
    fresh.foreach { case (t, df) =>
      Sources.writeParquet(df, s"${args.dest}/$t.parquet")
    }
    if (appends.nonEmpty) {
      val pending = new java.io.File(args.dest, PendingDirName)
      if (pending.exists()) deleteRecursive(pending)
      appends.foreach { case (t, df) =>
        df.write.parquet(new java.io.File(pending, s"$t.parquet").getPath)
      }
      val tmp = new java.io.File(pending, "MANIFEST.json.tmp")
      java.nio.file.Files.writeString(tmp.toPath,
        appends.map { case (t, _) => "\"" + t + "\"" }
          .mkString("[", ",", "]"))
      java.nio.file.Files.move(tmp.toPath,
        new java.io.File(pending, "MANIFEST.json").toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      applyStagedDelta(args.dest)
    }
    out.keys.map(t =>
      t -> Sources.footerRowCount(spark, s"${args.dest}/$t.parquet")).toMap
  }

  private val PendingDirName = "_delta_pending"

  private def deleteRecursive(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(deleteRecursive)
    f.delete()
  }

  /** Test seam for crash simulation: invoked before each staged-file
    * move with (table, global move index). Production no-op. */
  private[graft] var moveHook: (String, Int) => Unit = (_, _) => ()

  /** Finish a committed delta: move every staged part file into its
    * dest table dir (atomic renames; unique spark part-file names make
    * a resumed apply collision-free) and drop the staging dir. */
  private def applyStagedDelta(dest: String): Unit = {
    val pending = new java.io.File(dest, PendingDirName)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val tables = {
      import scala.jdk.CollectionConverters._
      mapper.readTree(new java.io.File(pending, "MANIFEST.json"))
        .elements().asScala.map(_.asText()).toSeq
    }
    var moved = 0
    tables.foreach { t =>
      val staged = new java.io.File(pending, s"$t.parquet")
      val destDir = new java.io.File(dest, s"$t.parquet")
      Option(staged.listFiles()).toSeq.flatten
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .foreach { f =>
          moveHook(t, moved)
          java.nio.file.Files.move(f.toPath,
            destDir.toPath.resolve(f.getName),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          moved += 1
        }
    }
    deleteRecursive(pending)
  }

  /** Recover a crashed delta apply; run FIRST on every parquet-dest
    * invocation, before any dest read. Staging without a manifest =
    * uncommitted (nothing applied) → discard, dest is clean. Staging
    * WITH a manifest = committed but unfinished → finish the
    * idempotent moves. Returns true if a committed delta was
    * completed. */
  def recoverPendingDelta(dest: String): Boolean = {
    val pending = new java.io.File(dest, PendingDirName)
    if (!pending.exists()) return false
    if (new java.io.File(pending, "MANIFEST.json").exists()) {
      System.err.println(
        s"[subset] recovering committed-but-unfinished delta in $dest")
      applyStagedDelta(dest)
      true
    } else {
      System.err.println(
        s"[subset] discarding uncommitted delta staging in $dest")
      deleteRecursive(pending)
      false
    }
  }

  /** Reload the written destination and verify the RI postcondition —
    * the check the reference's own tests perform on its output. */
  def validateDest(spark: SparkSession, dest: String,
                   writtenTables: Set[String],
                   graph: FkGraph = FkGraph.default): DataFrame = {
    val props = new java.util.Properties()
    val reloaded = writtenTables.map(t =>
      t -> (if (isJdbc(dest)) lowerCols(Sources.readJdbc(spark, dest, t, props))
            else spark.read.parquet(s"$dest/$t.parquet"))).toMap
    Subsetter.validateRI(reloaded, graph)
  }

  def main(argv: Array[String]): Unit = {
    val args = parse(argv.toSeq)
    val spark = GraftSession.local("graft-subset")
    spark.sparkContext.setLogLevel("WARN")
    // parquet-dir sources carry footers to calibrate from; JDBC has none
    if (!isJdbc(args.src))
      graft.sources.Sources.calibrateScanSplit(spark, args.src)
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
      val orphanTotal = validateDest(spark, args.dest, written.keySet,
          sourceGraph(args))
        .agg(org.apache.spark.sql.functions.sum("orphans")).head().getLong(0)
      println(s"referential integrity: $orphanTotal orphans")
      if (orphanTotal != 0L) sys.exit(2)
    } finally spark.stop()
  }
}
