package graft.queries

import graft.Catalog
import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column queries — binary media plumbing exercised over a
  * deterministic binary column derived from documents.text (the
  * testdata ships no real media; the decode step is a documented stub —
  * see operators.Multimodal). Rows-only checks: the per-partition
  * Dataset pipeline is not SQL-expressible. */
object MultimodalQueries {

  /** Featurize "images": text -> utf8 bytes -> per-partition decode ->
    * typed feature columns. */
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
    * round-trips generated WAVs through the parser). */
  def multimodalAudio(s: SparkSession, dir: String): DataFrame = {
    val withBin = Catalog.table(s, dir, "documents")
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media_bytes"))
    Multimodal.audioFeatures(withBin, "doc_id", "media_bytes").toDF()
      .select("media_id", "n_samples", "n_windows", "rms", "zcr", "peak",
        "sample_rate", "codec")
      .orderBy("media_id")
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_audio" -> (multimodalAudio _),
    "multimodal_features" -> (multimodalFeatures _),
    "multimodal_frames" -> (multimodalFrames _),
    "multimodal_thumbs" -> (multimodalThumbs _))

  def oracle: Map[String, String] = Map.empty // Dataset pipeline: rows-only
}
