package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface beyond the parquet catalog — SURVEY.md §2b
  * "Scans / sources" + "Sinks". The reference reads/writes any
  * SQLAlchemy-reachable DBMS; here every format is a declarative
  * DataFrame reader/writer, so pushdown/pruning and parallel IO come
  * from the planner. `jdbc` is exposed for real-DB parity (untestable in
  * this container — no database — but the call shape is the public
  * Spark API and needs no custom code).
  */
object Sources {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** CSV with explicit schema (never infer at scale — inference is an
    * extra full scan). */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  /** JSON-lines with explicit schema (same no-inference rule). */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC — the other self-describing columnar format Spark ships
    * natively; same pushdown/pruning machinery as parquet. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Raw binary ingestion for the multimodal pipeline: one row per file
    * — (path, modificationTime, length, content BINARY) — feeding the
    * decode/feature stages in `operators.Multimodal`. Listing and reads
    * parallelize across executors like any file source;
    * `pathGlobFilter` bounds the scan to the wanted extension, and
    * predicates on path/length prune before content is ever read. */
  def readBinaryFiles(spark: SparkSession, path: String,
                      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)

  /** Line-per-row text ingestion (raw corpus files → one `value` STRING
    * column; `wholetext` flips to file-per-row). The upstream shape for
    * documents that arrive as plain text rather than parquet. */
  def readText(spark: SparkSession, path: String,
               wholeFile: Boolean = false): DataFrame =
    spark.read.option("wholetext", wholeFile.toString).text(path)

  /** JDBC passthrough — partitioned reads via (column, bounds,
    * numPartitions) keep a real-DB scan parallel. Exercised end-to-end
    * against embedded Derby in JdbcRoundTripSpec. */
  def readJdbc(spark: SparkSession, url: String, table: String,
               props: java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, props)

  /** JDBC sink (overwrite = drop + recreate, the reference's
    * create-then-insert shape; each partition writes its own batch of
    * INSERTs in parallel — the buffered-write analogue). */
  def writeJdbc(df: DataFrame, url: String, table: String,
                props: java.util.Properties): Unit =
    df.write.mode("overwrite").jdbc(url, table, props)

  /** JDBC append into an EXISTING table — the reference's actual write
    * mode: destination DDL (with its PK/FK constraints) must pre-exist
    * and is never created by the tool (`rdbms_subsetter.py` docs: "the
    * destination database must have an identical schema"). Overwrite
    * would drop those constraints with the table. */
  def appendJdbc(df: DataFrame, url: String, table: String,
                 props: java.util.Properties): Unit =
    df.write.mode("append").jdbc(url, table, props)

  /** Hive-style partitioned parquet: one subdirectory per distinct value
    * of `cols`. Reads with predicates on those columns prune whole
    * directories at PLANNING time (`PartitionFilters` in the scan —
    * zero IO for pruned partitions), the other co-location axis next to
    * bucketing: partition by the low-cardinality scan predicate
    * (date, source, lang), bucket by the high-cardinality join key.
    * SourcesSpec proves the pruned file count. */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Bucketed managed table: rows hash-partitioned into `buckets` files
    * per partition by `cols` and sorted within each bucket. Joins and
    * aggregations keyed on `cols` between tables bucketed the same way
    * run WITHOUT an Exchange — the decisive co-location technique at
    * 100 TB, where re-shuffling a fact table per join dominates cost
    * (BucketedJoinSpec proves the exchange-free plan). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    cols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, cols.head, cols.tail: _*)
      .sortBy(cols.head, cols.tail: _*)
      .saveAsTable(table)

  /** Row count from parquet footers only — the analogue of the
    * reference's catalog-stats estimate (`_find_n_rows(estimate=True)`),
    * except parquet footers are exact. No data pages are read. */
  /** Z-order-clustered parquet: range-partition + sort by the Morton
    * key of (colA, colB) so parquet min/max footer stats become
    * selective on BOTH columns — scans filtered on either one skip most
    * row groups (a single-column sort skips on one dimension only).
    * `numFiles` sizes the output files; at 100 TB pick it so each file
    * is ~the row-group budget. Inputs are cast to long (callers
    * pre-rank/bucket wider-than-32-bit domains). ZOrderSpec measures
    * the skip counts against single-column layouts. */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    numFiles: Int): Unit = {
    import org.apache.spark.sql.functions.{call_function, col, lit, max, min}
    graft.plans.GraftExtensions.register(df.sparkSession)
    // Min-max-normalize both dimensions to a common 20-bit resolution
    // before interleaving: raw domains of unequal width would otherwise
    // leave the wider column's high bits alone at the top of the key
    // and the curve degenerates to a single-column sort (measured:
    // 14-bit user_id vs 5-bit day gave no day locality at all). One
    // 1-row agg job; exact integer arithmetic.
    val b = df.agg(
      min(col(colA).cast("long")), max(col(colA).cast("long")),
      min(col(colB).cast("long")), max(col(colB).cast("long"))).head()
    val bits = 1L << 20
    def norm(c: String, mn: Long, mx: Long) =
      (col(c).cast("long") - lit(mn)) * lit(bits) / lit(mx - mn + 1)
    df.withColumn("__z",
        call_function("graft_zorder",
          norm(colA, b.getLong(0), b.getLong(1)),
          norm(colB, b.getLong(2), b.getLong(3))))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file [min,max] footer statistics of a long-valued column —
    * the planner-visible skipping metadata ZOrderSpec asserts on. */
  def footerLongStats(spark: SparkSession, path: String,
                      column: String): Seq[(Long, Long)] = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files = fs.listStatus(p)
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getPath)
    files.toSeq.map { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        val blocks = r.getFooter.getBlocks
        var mn = Long.MaxValue
        var mx = Long.MinValue
        blocks.forEach { b =>
          b.getColumns.forEach { c =>
            if (c.getPath.toDotString == column) {
              val st = c.getStatistics
              mn = math.min(mn, st.genericGetMin.asInstanceOf[Number].longValue)
              mx = math.max(mx, st.genericGetMax.asInstanceOf[Number].longValue)
            }
          }
        }
        (mn, mx)
      } finally r.close()
    }
  }

  def footerRowCount(spark: SparkSession, path: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet")).map(_.getPath)
      else Array(p)
    files.map { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try r.getRecordCount finally r.close()
    }.sum
  }

  /** (compressed, uncompressed) column-chunk byte totals of a parquet
    * file or dir — the footer metadata Spark's scan splitter never
    * looks at. Driver metadata read only (footers, no data pages). */
  def footerByteSizes(spark: SparkSession, path: String): (Long, Long) = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet")).map(_.getPath)
      else Array(p)
    files.foldLeft((0L, 0L)) { case ((c, u), f) =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        val cols = r.getFooter.getBlocks.asScala.flatMap(_.getColumns.asScala)
        (c + cols.map(_.getTotalSize).sum,
         u + cols.map(_.getTotalUncompressedSize).sum)
      } finally r.close()
    }
  }

  /** Scan-split size (`spark.sql.files.maxPartitionBytes`) derived from
    * what a split COSTS to process, not what it costs to read: Spark
    * splits by FILE bytes, but scan-stage CPU tracks DECOMPRESSED
    * pages, so a fixed byte constant is off by the corpus's
    * compression ratio. `targetDecompressed × (compressed/uncompressed)`
    * lands every corpus at roughly the same decompressed bytes (≈ CPU)
    * per task (SourcesSpec pins high- and low-compression dirs within
    * 2× of each other), replacing the fixture-tuned 2 MB constant the
    * r12 verdict flagged as not scale-safe.
    *
    * Calibration of the default (measured r13, parquet footers of the
    * driver + GenData tables): footer "uncompressed" is the ENCODED
    * page size — post dictionary/RLE, pre codec — so ratios are far
    * milder than raw-text intuition suggests: documents 0.374 (2.7×),
    * events ~0.7, lineitem 0.6-0.8, embeddings 0.97 (floats don't
    * compress), stable across sf0.01 → sf10. 6 MB decompressed per
    * split reproduces the empirically-good 2.2 MB file split on the
    * text table (the r12 rung calibration) while giving low-compression
    * relational/vector scans 2-3× fewer tasks (the r12 ADVICE note on
    * scheduler overhead). Clamped to [1 MB, 128 MB] — the floor keeps
    * task startup amortized, the ceiling is Spark's own default. */
  def scanSplitBytes(spark: SparkSession, path: String,
                     targetDecompressed: Long = DefaultSplitDecompressed): Long = {
    val (c, u) = footerByteSizes(spark, path)
    val ratio = if (u <= 0L) 1.0 else c.toDouble / u
    val raw = (targetDecompressed * ratio).toLong
    math.max(1L * 1024 * 1024, math.min(128L * 1024 * 1024, raw))
  }

  /** Decompressed-bytes-per-split target (see [[scanSplitBytes]];
    * env-tunable like the old flat byte knob). */
  val DefaultSplitDecompressed: Long =
    sys.env.get("GRAFT_SCAN_SPLIT_DECOMPRESSED")
      .map(org.apache.spark.network.util.JavaUtils.byteStringAsBytes)
      .getOrElse(6L * 1024 * 1024)

  /** Set the session's `maxPartitionBytes` from the footer-derived
    * split size of a testdata dir's scan-CPU-dominant tables (the MIN
    * across them: a too-small split costs ~ms of task startup, a
    * too-large one serializes the scan stage — asymmetric risk, so the
    * most-parallel table wins). The `SPARK_GRAFT_MAX_PARTITION_BYTES`
    * env override is preserved: when set, calibration is a no-op.
    * Called by the mains (Bench/Verify/SubsetCli) that know their SF
    * dir; library users on a real cluster call [[scanSplitBytes]] per
    * table and size their own session. */
  def calibrateScanSplit(spark: SparkSession, dir: String,
                         tables: Seq[String] = Seq("documents", "lineitem"),
                         targetDecompressed: Long = DefaultSplitDecompressed): Long = {
    val existing = sys.env.get("SPARK_GRAFT_MAX_PARTITION_BYTES")
    val chosen = existing match {
      case Some(v) => org.apache.spark.network.util.JavaUtils.byteStringAsBytes(v)
      case None =>
        // existence via the same Hadoop FileSystem the footer readers
        // use — a java.io.File probe is always false for non-local URIs
        // (e.g. a SubsetCli --src), silently skipping calibration
        // (r13 ADVICE)
        val conf = spark.sessionState.newHadoopConf()
        val vals = tables.flatMap { t =>
          val p = new Path(s"$dir/$t.parquet")
          if (p.getFileSystem(conf).exists(p))
            Some(scanSplitBytes(spark, p.toString, targetDecompressed))
          else None
        }
        if (vals.isEmpty) {
          System.err.println(
            s"calibrateScanSplit: no calibration table (${tables.mkString(",")}) under $dir — keeping session default")
          spark.sessionState.conf.filesMaxPartitionBytes
        } else vals.min
    }
    spark.conf.set("spark.sql.files.maxPartitionBytes", chosen)
    chosen
  }
}
