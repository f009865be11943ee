package graft.streaming

import graft.queries.Det
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the events table: the same logic
  * as the batch `EventQueries` (which carry the oracle checks), run
  * under `readStream` with watermarks — SURVEY.md §2b "Streaming".
  *
  * Scale: stateful operators key by user_id/window, so state shards
  * across executors; watermarks bound state size; `Trigger.AvailableNow`
  * gives exactly-once batch-backfill semantics over the same files.
  */
object EventStreams {

  /** events streaming schema for a given on-disk `ts` type. Streaming
    * readers need an explicit schema; everything except `ts` is fixed,
    * while `ts` must match what the parquet footer actually declares —
    * TIMESTAMP(MICROS) reads as TimestampType, TIMESTAMP(NANOS) only
    * reads (as a raw Long) under `parquet.nanosAsLong` (see
    * [[graft.GraftSession.local]]). */
  def rawSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming source over the events parquet, ts normalized to µs
    * TimestampType via the SAME [[graft.Catalog.normalizeTs]] the
    * batch reader uses (one shared definition — batch and stream
    * cannot diverge on event-time type): a footer-only batch read
    * probes what `ts` physically is, and the ns→µs division applies
    * ONLY when the column reads as a raw Long (nanos under the legacy
    * flag). A fixture regenerated at a different timestamp unit
    * therefore changes the probe result, not the semantics — the
    * round-8 failure mode (µs fixture divided by 1000 → every window
    * in January 1970) cannot recur. The probe is one metadata-only
    * read per stream construction, never per batch.
    *
    * Live-arrival caveat: when `dir` holds no events.parquet YET (a
    * landing directory the stream should watch), there is no footer to
    * probe, so the reader assumes the modern driver fixture unit —
    * TIMESTAMP(MICROS), declared with-local-tz, identical on-wire
    * under the UTC session — rather than refusing to start. Files of
    * a different unit must exist at construction time to be detected;
    * unexpected probed types still fail loudly inside normalizeTs. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val batchTs =
      try spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
      catch {
        // ONLY the two "nothing landed yet" conditions take the
        // live-arrival default; any other analysis failure (e.g. a
        // malformed events.parquet that fails at probe time) must
        // surface HERE, not resurface later as a confusing runtime
        // schema mismatch (ADVICE r10).
        case e: org.apache.spark.sql.AnalysisException
            if Option(e.getCondition).exists(c =>
              c.startsWith("PATH_NOT_FOUND") ||
                c.startsWith("UNABLE_TO_INFER_SCHEMA")) =>
          TimestampType
      }
    val raw = spark.readStream
      .schema(rawSchema(batchTs))
      // file streaming sources demand a directory; select the events
      // table out of the sf dir with a glob filter
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    graft.Catalog.normalizeTs(raw, batchTs)
  }

  /** Tumbling 1-hour counts with a 10-minute watermark — identical
    * grouping to the batch `stream_tumbling_counts` oracle query. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_timestamp(col("window.start")).as("hour_start_s"),
        col("event_type"), col("cnt"))

  /** Run the tumbling aggregation over all currently-available files
    * into an in-memory table; returns the query (caller awaits). */
  def startTumblingToMemory(spark: SparkSession, dir: String,
                            name: String): StreamingQuery =
    tumblingCounts(readEvents(spark, dir))
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()

  /** Sliding 2-hour/1-hour counts with a watermark — the streaming twin
    * of the oracle-checked batch `stream_sliding_counts`. Each event
    * feeds two window states; the watermark closes windows once late
    * data can no longer arrive. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_timestamp(col("window.start")).as("win_start_s"),
        col("event_type"), col("cnt"))

  def startSlidingToMemory(spark: SparkSession, dir: String,
                           name: String): StreamingQuery =
    slidingCounts(readEvents(spark, dir))
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()

  /** Stream-stream range join under watermarks: errors joined to the
    * same user's purchases within the next 60 seconds — the streaming
    * twin of the oracle-checked batch `range_join_events`. Both sides
    * carry watermarks and the time-range condition bounds join state,
    * so state stays finite at any stream length. Times are truncated to
    * whole seconds BEFORE the join so semantics match the batch/oracle
    * epoch-second comparison exactly. */
  def streamRangeJoin(spark: SparkSession, dir: String,
                      windowSeconds: Long = 60): DataFrame = {
    val base = readEvents(spark, dir).withColumn("ts_s", date_trunc("second", col("ts")))
    val err = base.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"), col("ts_s").as("err_ts"))
      .withWatermark("err_ts", "10 minutes")
    val pur = readEvents(spark, dir).withColumn("ts_s", date_trunc("second", col("ts")))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user_id"),
        col("ts_s").as("pur_ts"))
      .withWatermark("pur_ts", "10 minutes")
    err.join(pur, expr(
      s"""user_id = p_user_id AND
         |pur_ts >= err_ts AND pur_ts <= err_ts + interval $windowSeconds seconds""".stripMargin))
      .select(col("error_id"), col("purchase_id"), col("user_id"),
        unix_timestamp(col("err_ts")).as("err_s"),
        unix_timestamp(col("pur_ts")).as("pur_s"))
  }

  def startRangeJoinToMemory(spark: SparkSession, dir: String, name: String,
                             windowSeconds: Long = 60): StreamingQuery =
    streamRangeJoin(spark, dir, windowSeconds)
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()

  /** documents parquet physical schema (for the streaming dedup twin). */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Streaming exact dedup: `dropDuplicates` keyed on the text — the
    * streaming twin of `dedup_exact_survivors`. In production the key
    * would be paired with a watermark column to bound state
    * (`dropDuplicatesWithinWatermark`); AvailableNow backfill keeps full
    * state for exact parity with the batch query. */
  def streamDedupDocs(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(documentsSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
      .dropDuplicates("text")
      .select(col("doc_id"), col("text"))

  def startDedupToMemory(spark: SparkSession, dir: String,
                         name: String): StreamingQuery =
    streamDedupDocs(spark, dir)
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()

  /** Stream-STATIC enrichment join — the canonical streaming dimension
    * lookup: the event stream hash-joins a static customer dimension on
    * the config pseudo-FK (events.user_id → customer.c_custkey,
    * FIXTURES.md) and aggregates per market segment. The static side is
    * broadcast and re-planned per micro-batch (no join state kept, no
    * watermark needed on the dim) — at 100 TB the stream side never
    * shuffles for the join at all. */
  def enrichedSegmentCounts(spark: SparkSession, dir: String,
                            events: DataFrame): DataFrame = {
    val dim = graft.Catalog.table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    events
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"))
  }

  def startEnrichedToMemory(spark: SparkSession, dir: String,
                            name: String): StreamingQuery =
    enrichedSegmentCounts(spark, dir, readEvents(spark, dir))
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()

  /** NATIVE session-window streaming twin of the oracle-checked batch
    * `session_window_native`: the built-in merge-on-overlap session
    * operator under a watermark. Timestamps truncate to whole seconds
    * BEFORE the operator so session boundaries match the batch/oracle
    * epoch-second semantics exactly; `sw.end - gap` recovers the last
    * event time, as in the batch query. */
  def sessionWindowCounts(events: DataFrame): DataFrame =
    events
      .withColumn("tss", timestamp_seconds(Det.epochS(col("ts"))))
      .withWatermark("tss", "10 minutes")
      .groupBy(col("user_id"), session_window(col("tss"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_timestamp(col("sw.start")).as("session_start_s"),
        (unix_timestamp(col("sw.end")) - 1800L).as("session_end_s"),
        col("n_events"))

  def startSessionWindowToMemory(spark: SparkSession, dir: String,
                                 name: String): StreamingQuery =
    sessionWindowCounts(readEvents(spark, dir))
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()

  // --- custom state: streaming sessionization --------------------------

  final case class Ev(event_id: Long, user_id: Long, s: Long)
  final case class SessionState(start: Long, end: Long, n: Long)
  final case class SessionOut(user_id: Long, session_start_s: Long,
                              session_end_s: Long, n_events: Long)

  val gapSeconds = 1800L

  /** Per-user sessionizer for `flatMapGroupsWithState`: replays the
    * group's events in time order, closing a session whenever the gap
    * exceeds 30 minutes. Emits closed sessions; the trailing open
    * session flushes on state timeout (or end-of-group for AvailableNow
    * runs, where we emit it eagerly — same totals as the batch query). */
  def sessionizeGroup(userId: Long, events: Iterator[Ev],
                      state: GroupState[SessionState]): Iterator[SessionOut] = {
    val sorted = events.toSeq.sortBy(e => (e.s, e.event_id))
    var cur = state.getOption
    val out = Seq.newBuilder[SessionOut]
    sorted.foreach { e =>
      cur match {
        case Some(st) if e.s - st.end <= gapSeconds =>
          cur = Some(SessionState(st.start, e.s, st.n + 1))
        case Some(st) =>
          out += SessionOut(userId, st.start, st.end, st.n)
          cur = Some(SessionState(e.s, e.s, 1))
        case None =>
          cur = Some(SessionState(e.s, e.s, 1))
      }
    }
    cur match {
      case Some(st) => out += SessionOut(userId, st.start, st.end, st.n)
      case None =>
    }
    state.remove() // AvailableNow single-pass: nothing to carry over
    out.result().iterator
  }

  /** Streaming sessionization via custom keyed state. */
  def sessionize(events: Dataset[Ev]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        sessionizeGroup)
  }

  def startSessionizeToMemory(spark: SparkSession, dir: String,
                              name: String): StreamingQuery = {
    import spark.implicits._
    val evs = readEvents(spark, dir)
      .select(col("event_id"), col("user_id"), Det.epochS(col("ts")).as("s"))
      .as[Ev]
    sessionize(evs)
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming parquet sink with checkpointed exactly-once semantics:
    * the dedup stream lands files under `outPath` with its offset WAL +
    * file-sink manifest in `checkpointPath`. A restart from the same
    * checkpoint re-reads nothing and re-emits nothing — the production
    * path for landing a cleaned corpus incrementally (readers see only
    * manifest-committed files, so a mid-batch crash never exposes
    * partial output). */
  def startDedupToParquet(spark: SparkSession, dir: String, outPath: String,
                          checkpointPath: String): StreamingQuery =
    streamDedupDocs(spark, dir)
      .writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpointPath)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()

  // --- streaming NEAR-dup: MinHash-LSH with keyed bucket state ---------

  final case class BandDoc(bkey: String, doc_id: Long, sig: Seq[Long])
  final case class BucketMembers(members: Seq[(Long, Seq[Long])])
  final case class NearDupPair(ida: Long, idb: Long, est_jaccard: Double)

  /** Per-LSH-bucket comparator for `flatMapGroupsWithState`: state holds
    * the (doc_id, signature) of every doc seen in this (band, band_key)
    * bucket; each arriving doc emits a candidate pair against each
    * existing member with the matching-signature-fraction estimate.
    * Dedup-on-INGEST — the streaming twin of the batch LSH tier: a new
    * document learns its near-duplicates the moment it lands, without
    * re-scanning the corpus, and state is sharded by bucket key so it
    * scales out like any keyed aggregation. `maxBucket` caps state per
    * degenerate bucket (boilerplate shingles): past the cap, arrivals
    * stop enrolling AND stop comparing — nothing further is emitted
    * from that bucket (freeze-at-cap; an append-mode stream cannot
    * retract pairs it already emitted). The batch tier's `capHotKeys`
    * implements the SAME semantic — each over-cap bucket keeps its
    * `maxBucket` lowest doc_ids — so stream==batch parity holds even
    * on degenerate over-cap buckets whenever arrival order is doc_id
    * order (AvailableNow backfill, which reads everything in one
    * sorted-within-group batch; a live multi-batch stream freezes on
    * ARRIVAL order instead, the only order it can see). StreamingSpec
    * pins the over-cap parity with a deliberately degenerate fixture.
    * Production would pair this with a state TTL (GroupStateTimeout). */
  def nearDupBucket(maxBucket: Int)(key: String, docs: Iterator[BandDoc],
                    state: GroupState[BucketMembers]): Iterator[NearDupPair] = {
    var members = state.getOption.map(_.members).getOrElse(Seq.empty)
    val out = Seq.newBuilder[NearDupPair]
    docs.toSeq.sortBy(_.doc_id).foreach { d =>
      if (members.size < maxBucket) {
        members.foreach { case (id0, sig0) =>
          if (id0 != d.doc_id) {
            var m = 0
            var i = 0
            val n = sig0.length
            while (i < n) { if (sig0(i) == d.sig(i)) m += 1; i += 1 }
            out += NearDupPair(math.min(id0, d.doc_id),
              math.max(id0, d.doc_id), m.toDouble / n.toDouble)
          }
        }
        members = members :+ ((d.doc_id, d.sig))
      }
    }
    state.update(BucketMembers(members))
    out.result().iterator
  }

  /** Streaming near-dup pairs over the documents stream: the SAME
    * signature + banding projections as the batch tier
    * (`SimilarityFunctions.bandedSignatures` — scan-local native
    * kernels), keyed state per bucket, then the estimate threshold. A
    * pair colliding in several bands is emitted once per band
    * (at-least-once candidate semantics — the estimate is identical in
    * each, so downstream `dropDuplicates` or any idempotent sink
    * absorbs them); the parity spec distincts both sides. */
  def streamNearDupPairs(spark: SparkSession, dir: String,
                         minEst: Double = 0.5,
                         maxBucket: Int = 10000): DataFrame = {
    import spark.implicits._
    val docs = spark.readStream
      .schema(documentsSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
    graft.functions.SimilarityFunctions
      .bandedSignatures(docs, "text", numHashes = 32, nShingle = 3, bands = 8)
      .select(concat_ws("|", col("band"), col("band_key")).as("bkey"),
        col("doc_id"), col("sig"))
      .as[BandDoc]
      .groupByKey(_.bkey)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(nearDupBucket(maxBucket))
      .toDF()
      .filter(col("est_jaccard") >= minEst)
  }

  // --- streaming PARAGRAPH dedup: boilerplate dies on ingest -----------

  final case class ParaOcc(para_md5: String, doc_id: Long, para_no: Int)

  /** Per-digest first-occurrence keeper for `flatMapGroupsWithState`:
    * state is one Boolean per paragraph digest — the first arrival
    * (min (doc_id, para_no) within the incoming group, deterministic
    * under AvailableNow where a whole group arrives in one batch)
    * emits, everything later is boilerplate and dies on ingest. The
    * streaming twin of `text_paragraph_clean`'s global-first window:
    * state is 1 bit + key per DISTINCT paragraph, not per occurrence,
    * so a 100 TB/day ingest holds state proportional to the unique
    * paragraph count — and a production deployment would bound even
    * that with a state TTL. */
  def paraFirstOccurrence(key: String, occs: Iterator[ParaOcc],
                          state: GroupState[Boolean]): Iterator[ParaOcc] = {
    if (state.exists) Iterator.empty
    else {
      val first = occs.minBy(o => (o.doc_id, o.para_no))
      state.update(true)
      Iterator.single(first)
    }
  }

  /** Streaming paragraph survivors over the documents stream: the SAME
    * deterministic paragraph synthesis + digest as the batch operators
    * (`SimilarityQueries.paragraphedText`), keyed state per digest.
    * StreamingSpec proves the survivor (digest, doc, para) set equals
    * the batch global-first window's. */
  def streamParagraphSurvivors(spark: SparkSession, dir: String): Dataset[ParaOcc] = {
    import spark.implicits._
    // Global-first parity precondition, asserted at CONSTRUCTION: the
    // keeper is the min (doc_id, para_no) WITHIN the micro-batch that
    // first delivers a digest, which equals the batch window's global
    // first only when the whole corpus arrives in one batch —
    // AvailableNow over a single source file (the driver fixture
    // layout). A multi-file dir (or a maxFilesPerTrigger setting)
    // would silently crown a non-global keeper per digest; fail loudly
    // here instead, until the comparator tracks best-seen-so-far in
    // state (which an append-mode sink cannot retract anyway).
    require(new java.io.File(dir, "documents.parquet").isFile,
      s"$dir/documents.parquet must be a single file: the paragraph " +
        "stream's global-first keeper needs whole-corpus single-batch " +
        "delivery under AvailableNow")
    spark.readStream
      .schema(documentsSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
      .select(col("doc_id"),
        posexplode(split(graft.queries.SimilarityQueries.paragraphedText, "\n\n"))
          .as(Seq("para_no", "para")))
      .select(md5(col("para")).as("para_md5"), col("doc_id"),
        col("para_no").cast("int").as("para_no"))
      .as[ParaOcc]
      .groupByKey(_.para_md5)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(paraFirstOccurrence)
  }

  def startParagraphSurvivorsToMemory(spark: SparkSession, dir: String,
                                      name: String): StreamingQuery =
    streamParagraphSurvivors(spark, dir)
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming corpus cleanup — the north-star pipeline ON INGEST: the
    * exact gate chain of the batch `pipeline_corpus_clean`
    * (`TextQueries.cleanKept`: token floor, uniq ratio, langid
    * agreement — scan-local projections, unchanged under readStream)
    * followed by streaming exact dedup. The batch pipeline keeps the
    * MIN-doc_id row per text; a stream necessarily keeps the FIRST
    * ARRIVAL — same kept-TEXT set, keeper id may differ — so the
    * parity spec compares text sets. At scale the gates drop most rows
    * before the only stateful operator, which is exactly where you
    * want the knife at 100 TB/day ingest. */
  def streamCorpusClean(spark: SparkSession, dir: String): DataFrame =
    graft.queries.TextQueries.cleanKept(
      spark.readStream
        .schema(documentsSchema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(dir))
      .dropDuplicates("text")
      .select("doc_id", "lang", "text", "n_tokens", "uniq_ratio")

  /** Streaming twin of pipeline_corpus_clean2's GATE CHAIN — stages 1–4
    * on ingest: canonicalize (scan-local, shared messyVariants/
    * canonicalText so the plant and normalization are the batch
    * pipeline's own), normalized exact dedup (stateful dropDuplicates
    * on the 16-byte digest), quality gates (scan-local), and the
    * bigram-LM perplexity gate (the literal count maps are built once,
    * batch-side, at plan construction — streaming rows score
    * scan-locally with zero state). The TEXT-ONLY gates (token floor,
    * uniq ratio — pure functions of the dedup key's text, identical for
    * every row of a digest group) run BEFORE the stateful dedup, so
    * state holds one entry per distinct SURVIVING digest, not per
    * distinct raw digest — gates-before-state, the streamCorpusClean
    * design point. The langid gate must stay post-dedup (it reads the
    * keeper's `lang` label). Keeper caveat: batch keeps the MIN doc_id
    * per digest, a stream keeps the FIRST ARRIVAL — same survivor
    * TEXT set PROVIDED `lang` is constant within each digest group
    * (else the post-dedup lang gate becomes keeper-dependent); that
    * fixture property is pinned in the parity spec, and the spec
    * compares norm_md5 sets (the streamCorpusClean precedent). The
    * paragraph stage is the separate streamParagraphSurvivors twin:
    * its global-first window is the keyed digest state there. */
  def streamCorpusClean2(spark: SparkSession, dir: String): DataFrame = {
    import graft.queries.{SimilarityQueries, TextQueries}
    val docs = spark.readStream
      .schema(documentsSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
    val canon = docs.union(SimilarityQueries.messyVariants(docs))
      .select(col("doc_id"), col("lang"),
        SimilarityQueries.canonicalText.as("text"))
      .filter(
        graft.functions.TextFunctions.tokenCount(col("text")) >= TextQueries.CleanMinTokens &&
        graft.functions.TextFunctions.uniqRatio(col("text")) >= TextQueries.CleanMinUniq)
      .withColumn("norm_md5", md5(col("text")))
      .dropDuplicates("norm_md5")
    val (nPairs, nll) = TextQueries.perplexityCols(spark, dir)
    TextQueries.cleanKept(canon)
      .withColumn("n_pairs", nPairs)
      .withColumn("nll_q6", nll)
      .filter(col("nll_q6") <= lit(TextQueries.PplGateQ6) * col("n_pairs"))
      .select(col("doc_id"), col("lang"), md5(col("text")).as("norm_md5"),
        col("n_tokens"), col("nll_q6"))
  }

  /** Streaming twin of `text_dsir_weights` — DSIR importance scoring on
    * ingest. The trained target/raw bigram distributions are LITERAL
    * maps baked into the plan at construction (batch-side, once — the
    * perplexity-gate pattern), so every arriving document scores
    * scan-locally with ZERO streaming state: no watermark, no keyed
    * state store, trivially exactly-once under retries. This is the
    * deployment shape for weight-on-ingest at 100 TB: train offline on
    * the frozen target slice, ship the literal maps with the query. */
  def streamDsirWeights(spark: SparkSession, dir: String): DataFrame = {
    import graft.queries.TextQueries
    val (nFeats, w) = TextQueries.dsirCols(spark, dir)
    spark.readStream
      .schema(documentsSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
      .select(col("doc_id"), nFeats.as("n_feats"), w.as("dsir_q6"))
  }

  def startDsirWeightsToMemory(spark: SparkSession, dir: String,
                               name: String): StreamingQuery =
    streamDsirWeights(spark, dir)
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()

  def startCorpusClean2ToMemory(spark: SparkSession, dir: String,
                                name: String): StreamingQuery =
    streamCorpusClean2(spark, dir)
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()

  def startCorpusCleanToMemory(spark: SparkSession, dir: String,
                               name: String): StreamingQuery =
    streamCorpusClean(spark, dir)
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()

  def startNearDupToMemory(spark: SparkSession, dir: String,
                           name: String): StreamingQuery =
    streamNearDupPairs(spark, dir)
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()

  // --- streaming URL-frontier dedup (parity twin #14) -------------------

  final case class UrlOcc(canon_url: String, event_id: Long)

  /** Per-canonical-URL first-occurrence keeper: state is one Boolean
    * per canonical key; the first delivering batch emits its min
    * event_id, later arrivals die on ingest. 100 TB/day shape: state
    * is key+1 bit per DISTINCT canonical URL — the crawl frontier's
    * seen-set — and a production deployment bounds it with a state
    * TTL (re-crawl horizon). */
  def urlFirstOccurrence(key: String, occs: Iterator[UrlOcc],
                         state: GroupState[Boolean]): Iterator[UrlOcc] = {
    if (state.exists) Iterator.empty
    else {
      val first = occs.minBy(_.event_id)
      state.update(true)
      Iterator.single(first)
    }
  }

  /** Streaming twin of `dedup_url_canonical`: the SAME planted raw URL
    * and the SAME shared `TextFunctions.canonicalUrl` expression
    * (scan-local, stateless) feed a keyed first-occurrence state — the
    * frontier dedup running on ingest rather than as a batch pass.
    * Same single-file single-batch global-first precondition as the
    * paragraph stream (min-event keeper == batch `min(event_id)` only
    * under whole-corpus one-batch delivery), asserted loudly at
    * construction. */
  def streamUrlDedup(spark: SparkSession, dir: String): Dataset[UrlOcc] = {
    import spark.implicits._
    require(new java.io.File(dir, "events.parquet").isFile,
      s"$dir/events.parquet must be a single file: the URL stream's " +
        "global-first keeper needs whole-corpus single-batch delivery " +
        "under AvailableNow")
    readEvents(spark, dir)
      .select(col("event_id"),
        graft.queries.TextQueries.plantedRawUrl(col("event_id")).as("raw_url"))
      .select(graft.functions.TextFunctions.canonicalUrl(col("raw_url"))
        .as("canon_url"), col("event_id"))
      .as[UrlOcc]
      .groupByKey(_.canon_url)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(urlFirstOccurrence)
  }

  def startUrlDedupToMemory(spark: SparkSession, dir: String,
                            name: String): StreamingQuery =
    streamUrlDedup(spark, dir)
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
}
