package graft.queries

import graft.Catalog
import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column queries — binary media plumbing exercised over a
  * deterministic binary column derived from documents.text (the
  * testdata ships no real media; the decode step is a documented stub —
  * see operators.Multimodal). All five queries are oracle-checked end
  * to end: on this corpus every blob takes the deterministic fallback
  * path, whose byte arithmetic DuckDB reproduces bitwise (see each
  * *Sql twin); the real-codec paths are MultimodalSpec-proven. */
object MultimodalQueries {

  /** Featurize "images": text -> utf8 bytes -> per-partition decode ->
    * typed feature columns.
    *
    * Oracle-checked end to end (the multimodal_dedup precedent): every
    * fixture blob is utf8 text, none starts with an image magic
    * number, so every row takes [[Multimodal.fallbackFeatures]] —
    * whose arithmetic (n = clamped byte length, width = floor(sqrt n),
    * height = n / width, mean = byte sum / n) is plain SQL over the
    * text. MultimodalSpec pins BOTH fixture properties the mapping
    * rests on (pure-ASCII bytes, decoded=false for every row), so
    * drift fails loudly in scalatest, not in the oracle hash compare;
    * the decoded path stays MultimodalSpec-proven. */
  def multimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    val withBin = Catalog.table(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media_bytes"))
    Multimodal.imageFeatures(withBin, "doc_id", "media_bytes").toDF()
      .select("media_id", "width", "height", "channels", "mean_intensity")
      .orderBy("media_id")
  }

  /** Frame-sample "videos": every 4th 64-byte frame. */
  def multimodalFrames(s: SparkSession, dir: String): DataFrame = {
    val withBin = Catalog.table(s, dir, "documents")
      .filter(col("doc_id") % 50 === 0)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media_bytes"))
    Multimodal.frameSample(withBin, "doc_id", "media_bytes", frameSize = 64, stride = 4)
      .select(col("media_id"), col("frame_no"), length(col("frame_bytes")).as("frame_len"))
      .orderBy("media_id", "frame_no")
  }

  /** Thumbnail the "images" to 8x8: real bilinear resize on decodable
    * bytes, deterministic byte-stride downsample otherwise. */
  def multimodalThumbs(s: SparkSession, dir: String): DataFrame = {
    val withBin = Catalog.table(s, dir, "documents")
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media_bytes"))
    Multimodal.resizeColumn(withBin, "doc_id", "media_bytes", w = 8, h = 8)
      .select(col("media_id"), length(col("thumb")).as("thumb_len"))
      .orderBy("media_id")
  }

  /** Audio features: real RIFF/WAV parse where the bytes are 16-bit
    * PCM WAV, deterministic raw-PCM stand-in otherwise (the fixture's
    * text-derived bytes all take the fallback; MultimodalSpec
    * round-trips generated WAVs through the parser).
    *
    * Oracle-checked end to end despite the floating-point outputs:
    * on the fallback path every sample is an int16, so sum-of-squares
    * ≤ n·2³⁰ stays far below 2⁵³ — the accumulation is EXACT in
    * double on both engines regardless of order, and rms/zcr are then
    * one IEEE division (+sqrt) each. The DuckDB twin rebuilds the
    * little-endian PCM16 view from per-char codepoints (== bytes on
    * the spec-pinned ASCII corpus) and lag() for zero crossings. */
  def multimodalAudio(s: SparkSession, dir: String): DataFrame = {
    val withBin = Catalog.table(s, dir, "documents")
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media_bytes"))
    Multimodal.audioFeatures(withBin, "doc_id", "media_bytes").toDF()
      .select("media_id", "n_samples", "n_windows", "rms", "zcr", "peak",
        "sample_rate", "codec")
      .orderBy("media_id")
  }

  /** Media dedup by CONTENT digest: the binary column groups on the
    * decoded-raster md5 (raw-byte md5 for non-decodable blobs), so the
    * same picture dedups across containers — the multimodal member of
    * the dedup family. The fixture's text-derived blobs all take the
    * raw-byte path, which equals DuckDB's `md5(text)` — so unlike the
    * other multimodal queries this one IS oracle-checked end to end;
    * the decoded path (PNG vs BMP of one raster → same digest) is
    * MultimodalSpec-proven. Dups are planted (every 25th doc's bytes
    * re-enter under a shifted id — the dedup_exact_docs pattern).
    * Scale: digest is scan-local mapPartitions; the groupBy shuffles
    * 16-byte digests, never the media bytes. */
  def multimodalDedup(s: SparkSession, dir: String): DataFrame = {
    val d = Catalog.table(s, dir, "documents")
    def bin(df: DataFrame) =
      df.select(col("doc_id"), encode(col("text"), "UTF-8").as("media_bytes"))
    val planted = bin(d.filter(col("doc_id") % 25 === 0))
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
    Multimodal.contentDigests(bin(d).union(planted), "doc_id", "media_bytes").toDF()
      .groupBy("content_md5")
      .agg(min(col("media_id")).as("keep_id"), count(lit(1)).as("dup_cnt"),
        max(col("decoded")).as("any_decoded"))
      .filter(col("dup_cnt") > 1)
      .select("content_md5", "keep_id", "dup_cnt", "any_decoded")
      .orderBy("keep_id")
  }

  /** DuckDB twin of [[Multimodal.fallbackFeatures]] over utf8 bytes:
    * byte length via octet_length(encode(..)), byte sum via per-char
    * codepoints (== bytes on the spec-pinned ASCII corpus). The double
    * division is one exact-int-to-double divide on both engines —
    * bitwise equal. */
  val multimodalFeaturesSql: String =
    """WITH b AS (
      |  SELECT doc_id AS media_id,
      |         GREATEST(octet_length(encode(text)), 1) AS n,
      |         (SELECT COALESCE(sum(unicode(ch)), 0)
      |          FROM unnest(string_split(text, '')) AS t(ch)) AS s
      |  FROM documents),
      |w AS (SELECT media_id, n, s,
      |        GREATEST(1, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS INTEGER)) AS width
      |      FROM b)
      |SELECT media_id, CAST(width AS INTEGER) AS width,
      |  CAST(GREATEST(1, n // width) AS INTEGER) AS height,
      |  CAST(1 AS INTEGER) AS channels,
      |  CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_intensity
      |FROM w ORDER BY media_id""".stripMargin

  /** DuckDB twin of [[Multimodal.frameSample]] over utf8 bytes: the
    * frame chop is pure byte arithmetic (ceil(n/64) frames, every 4th
    * kept, last frame ragged), so the whole query is SQL-expressible —
    * frame CONTENT is projected to its length, which the arithmetic
    * reconstructs exactly. unnest(range(..)) expands one row per
    * frame; octet_length(encode(..)) is the exact byte count for any
    * utf8 text (no ASCII assumption needed — only length matters). */
  val multimodalFramesSql: String =
    """WITH d AS (
      |  SELECT doc_id AS media_id, octet_length(encode(text)) AS n
      |  FROM documents WHERE doc_id % 50 = 0),
      |f AS (
      |  SELECT media_id, n,
      |         unnest(range(0, CAST(ceil(n / 64.0) AS BIGINT))) AS i
      |  FROM d)
      |SELECT media_id, CAST(i AS INTEGER) AS frame_no,
      |  CAST(LEAST(64, n - 64 * i) AS INTEGER) AS frame_len
      |FROM f WHERE i % 4 = 0
      |ORDER BY media_id, frame_no""".stripMargin

  /** DuckDB twin of [[Multimodal.resizeColumn]]'s deterministic
    * non-image path: bytes <= w*h pass through whole, longer blobs
    * stride-sample to exactly w*h bytes — so thumb_len = least(n, 64).
    * Rests on the same MultimodalSpec-pinned fixture property as the
    * features/dedup oracles (no blob decodes as a real image; a text
    * that merely STARTS with an image magic still falls back when
    * ImageIO rejects it). */
  val multimodalThumbsSql: String =
    """SELECT doc_id AS media_id,
      |  CAST(LEAST(octet_length(encode(text)), 64) AS INTEGER) AS thumb_len
      |FROM documents WHERE doc_id % 10 = 0
      |ORDER BY media_id""".stripMargin

  /** DuckDB twin of [[Multimodal.audioFeaturesOf]]'s raw-pcm16
    * fallback (see [[multimodalAudio]]'s scaladoc for why the double
    * math is bitwise-reproducible): bytes → LE int16 pairs (trailing
    * odd byte dropped), then n/rms/zcr/peak/window-count with the
    * exact Scala edge semantics (n=0 → all-zero row via LEFT JOIN;
    * n=1 → zcr 0). */
  val multimodalAudioSql: String =
    """WITH b AS (
      |  SELECT doc_id AS media_id,
      |         list_transform(string_split(text, ''), x -> unicode(x)) AS bytes
      |  FROM documents WHERE doc_id % 10 = 0),
      |s AS (
      |  SELECT media_id, len(bytes) // 2 AS n,
      |         unnest(range(0, len(bytes) // 2)) AS i, bytes
      |  FROM b),
      |v AS (
      |  SELECT media_id, n, i,
      |    CASE WHEN bytes[CAST(2*i+2 AS INTEGER)] >= 128
      |         THEN bytes[CAST(2*i+1 AS INTEGER)] + 256*bytes[CAST(2*i+2 AS INTEGER)] - 65536
      |         ELSE bytes[CAST(2*i+1 AS INTEGER)] + 256*bytes[CAST(2*i+2 AS INTEGER)] END AS smp
      |  FROM s),
      |w AS (
      |  SELECT media_id, n, i, smp,
      |         lag(smp) OVER (PARTITION BY media_id ORDER BY i) AS prev
      |  FROM v),
      |agg AS (
      |  SELECT media_id, max(n) AS n, sum(smp*smp) AS sumsq, max(abs(smp)) AS peak,
      |         sum(CASE WHEN prev IS NOT NULL AND
      |                  ((prev < 0 AND smp >= 0) OR (prev >= 0 AND smp < 0))
      |             THEN 1 ELSE 0 END) AS crossings
      |  FROM w GROUP BY media_id)
      |SELECT b.media_id,
      |  CAST(COALESCE(a.n, 0) AS BIGINT) AS n_samples,
      |  CAST(CASE WHEN COALESCE(a.n,0) = 0 THEN 0 ELSE (a.n + 255) // 256 END AS INTEGER) AS n_windows,
      |  CASE WHEN COALESCE(a.n,0) = 0 THEN 0.0 ELSE sqrt(CAST(a.sumsq AS DOUBLE) / CAST(a.n AS DOUBLE)) END AS rms,
      |  CASE WHEN COALESCE(a.n,0) <= 1 THEN 0.0 ELSE CAST(a.crossings AS DOUBLE) / CAST(a.n - 1 AS DOUBLE) END AS zcr,
      |  CAST(COALESCE(a.peak, 0) AS INTEGER) AS peak,
      |  CAST(0 AS INTEGER) AS sample_rate,
      |  'raw-pcm16' AS codec
      |FROM b LEFT JOIN agg a USING (media_id)
      |ORDER BY media_id""".stripMargin

  val multimodalDedupSql: String =
    """WITH d AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 25 = 0)
      |SELECT md5(text) AS content_md5, min(doc_id) AS keep_id,
      |  count(*) AS dup_cnt, FALSE AS any_decoded
      |FROM d GROUP BY 1 HAVING count(*) > 1
      |ORDER BY keep_id""".stripMargin

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_dedup" -> (multimodalDedup _),
    "multimodal_audio" -> (multimodalAudio _),
    "multimodal_features" -> (multimodalFeatures _),
    "multimodal_frames" -> (multimodalFrames _),
    "multimodal_thumbs" -> (multimodalThumbs _))

  // ALL five Dataset pipelines are oracle-checked end to end on the
  // fixture corpus: raw-byte digests / fallback arithmetic of
  // utf8-derived blobs are SQL-expressible (md5(text), byte
  // arithmetic, even the PCM16 sample math — integer-valued in
  // double-exact range), and the decode/real-codec paths stay
  // MultimodalSpec-proven.
  def oracle: Map[String, String] = Map(
    "multimodal_dedup" -> multimodalDedupSql,
    "multimodal_features" -> multimodalFeaturesSql,
    "multimodal_frames" -> multimodalFramesSql,
    "multimodal_thumbs" -> multimodalThumbsSql,
    "multimodal_audio" -> multimodalAudioSql)
}
