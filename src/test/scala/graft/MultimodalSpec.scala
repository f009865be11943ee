package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  test("decodeImage: real PNG decode via javax.imageio, end-to-end through Spark") {
    // deterministic 4x2 grayscale gradient PNG, generated in-memory
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (x + y * w) * 255 / math.max(1, w * h - 1)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val bytes = png(4, 2)
    // direct decode: exact dimensions, exact mean of the gradient
    val f = Multimodal.decodeImage(bytes)
    assert(f.width == 4 && f.height == 2 && f.channels == 3)
    val expectedMean = (0 until 8).map(i => i * 255 / 7).sum.toDouble / 8.0
    assert(f.mean_intensity == expectedMean)
    assert(f.histogram.sum == 8)
    // same decode through the distributed pipeline
    val df = Seq((42L, bytes)).toDF("id", "bin")
    val viaSpark = Multimodal.imageFeatures(df, "id", "bin").collect().head
    assert(viaSpark.media_id == 42L && viaSpark.width == 4 && viaSpark.height == 2)
    assert(viaSpark.mean_intensity == expectedMean)
  }

  test("pixelDigest: same raster dedups across PNG/BMP containers; raw bytes don't") {
    def raster(w: Int, h: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (x * 37 + y * 101) % 256
        img.setRGB(x, y, (v << 16) | ((255 - v) << 8) | v)
      }
      img
    }
    def enc(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val img = raster(6, 4)
    val pngB = enc(img, "png")
    val bmpB = enc(img, "bmp")
    assert(!java.util.Arrays.equals(pngB, bmpB), "containers differ on disk")
    val (dPng, okPng) = Multimodal.pixelDigest(pngB)
    val (dBmp, okBmp) = Multimodal.pixelDigest(bmpB)
    assert(okPng && okBmp, "both containers decode")
    assert(dPng == dBmp, "content digest sees the raster, not the container")
    // a different raster gets a different digest
    val (dOther, _) = Multimodal.pixelDigest(enc(raster(6, 5), "png"))
    assert(dOther != dPng)
    // non-image bytes digest raw — equals MessageDigest md5 of the blob
    val raw = "not an image".getBytes("UTF-8")
    val (dRaw, okRaw) = Multimodal.pixelDigest(raw)
    assert(!okRaw)
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest(raw).map(b => f"$b%02x").mkString
    assert(dRaw == expect)
    // through the distributed pipeline: PNG and BMP of one raster group
    val df = Seq((1L, pngB), (2L, bmpB), (3L, raw)).toDF("id", "bin")
    val got = Multimodal.contentDigests(df, "id", "bin").collect()
      .groupBy(_.content_md5).view.mapValues(_.map(_.media_id).sorted.toSeq).toMap
    assert(got(dPng) == Seq(1L, 2L))
    assert(got(dRaw) == Seq(3L))
  }

  test("aHash: near-dup rasters land within a few bits; re-encode is hamming 0; exact digest can't pair either") {
    def raster(w: Int, h: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (x * 37 + y * 101) % 256
        img.setRGB(x, y, (v << 16) | ((255 - v) << 8) | v)
      }
      img
    }
    def enc(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    def hamming(a: Multimodal.MediaHash, b: Multimodal.MediaHash): Int =
      java.lang.Long.bitCount(a.w0 ^ b.w0) + java.lang.Long.bitCount(a.w1 ^ b.w1) +
        java.lang.Long.bitCount(a.w2 ^ b.w2) + java.lang.Long.bitCount(a.w3 ^ b.w3)
    val base = raster(32, 24)
    val png = enc(base, "png")
    val bmp = enc(base, "bmp")
    val edited = raster(32, 24)
    edited.setRGB(5, 5, 0xffffff) // one-pixel edit
    val editedPng = enc(edited, "png")
    val hPng = Multimodal.aHashWords(png)
    val hBmp = Multimodal.aHashWords(bmp)
    val hEdit = Multimodal.aHashWords(editedPng)
    assert(hPng.decoded && hBmp.decoded && hEdit.decoded)
    // a container re-encode keeps the raster -> identical hash; the
    // exact pixel digest also pairs it (established above) — fine
    assert(hamming(hPng, hBmp) == 0)
    // a one-pixel edit stays within banding reach (<= 3) but CHANGES
    // the raster, so the exact content digest can no longer pair it
    assert(hamming(hPng, hEdit) <= 3, s"got ${hamming(hPng, hEdit)}")
    assert(Multimodal.pixelDigest(png)._1 != Multimodal.pixelDigest(editedPng)._1)
    // an unrelated raster is far away — the hash discriminates
    val hOther = Multimodal.aHashWords(enc(raster(24, 32), "png"))
    assert(hamming(hPng, hOther) > 3)
    // words stay in their 16-bit lanes
    Seq(hPng, hBmp, hEdit, hOther).foreach { hh =>
      Seq(hh.w0, hh.w1, hh.w2, hh.w3).foreach(w =>
        assert(w >= 0L && w < 65536L))
    }
  }

  test("imageFeatures: deterministic fallback decode for non-image bytes") {
    val df = Seq((1L, "abcd"), (2L, "a" * 100)).toDF("id", "txt")
      .select($"id", encode($"txt", "UTF-8").as("bin"))
    val feats = Multimodal.imageFeatures(df, "id", "bin").collect().sortBy(_.media_id)
    assert(feats.length == 2)
    val f1 = feats(0)
    assert(f1.media_id == 1L && f1.width == 2 && f1.height == 2 && f1.channels == 1)
    assert(f1.mean_intensity == ('a' + 'b' + 'c' + 'd').toDouble / 4.0)
    assert(f1.histogram.sum == 4)
    val f2 = feats(1)
    assert(f2.width == 10 && f2.height == 10)
    assert(f2.mean_intensity == 'a'.toDouble)
  }

  test("resizeImage: real bilinear PNG resize; byte-stride fallback; via Spark") {
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((x * 31) << 16) | ((y * 31) << 8) | 128)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // real image path: 8x8 -> 4x4 PNG, decodable, right dimensions
    val thumb = Multimodal.resizeImage(png(8, 8), 4, 4)
    assert(Multimodal.looksLikeImage(thumb))
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(thumb))
    assert(back.getWidth == 4 && back.getHeight == 4)
    // fallback path: 100 non-image bytes -> exactly w*h strided bytes
    val blob = Array.tabulate[Byte](100)(_.toByte)
    val small = Multimodal.resizeImage(blob, 3, 3)
    assert(small.length == 9 && small(0) == 0.toByte)
    // distributed: one image row + one blob row
    val df = Seq((1L, png(8, 8)), (2L, blob)).toDF("id", "bin")
    val rows = Multimodal.resizeColumn(df, "id", "bin", 4, 4)
      .select($"media_id", length($"thumb")).as[(Long, Int)].collect().toMap
    assert(rows(2L) == 16) // blob -> 4*4 strided bytes
    assert(rows(1L) > 16)  // real PNG re-encode
  }

  test("audioFeatures: PCM16 square wave and silence have closed-form features") {
    def pcm(samples: Seq[Int]): Array[Byte] =
      samples.flatMap(v => Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)).toArray
    // square wave alternating +/-1000: every adjacent pair crosses zero
    val square = pcm(Seq.tabulate(512)(i => if (i % 2 == 0) 1000 else -1000))
    val silence = pcm(Seq.fill(100)(0))
    val df = Seq((1L, square), (2L, silence)).toDF("media_id", "media_bytes")
    val got = Multimodal.audioFeatures(df, "media_id", "media_bytes", window = 256)
      .collect().map(f => f.media_id -> f).toMap
    val sq = got(1L)
    assert(sq.n_samples == 512 && sq.n_windows == 2)
    assert(math.abs(sq.rms - 1000.0) < 1e-9)
    assert(math.abs(sq.zcr - 1.0) < 1e-9)
    assert(sq.peak == 1000)
    val si = got(2L)
    assert(si.rms == 0.0 && si.zcr == 0.0 && si.peak == 0 && si.n_windows == 1)
  }

  test("WAV round-trip: javax.sound-written PCM16 WAV parses to the same samples") {
    // generate a WAV with the JDK's own writer (independent of our
    // parser): 16-bit signed PCM little-endian, mono, 8 kHz
    def wav(samples: Array[Short], channels: Int, rate: Float): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels, true, false)
      val bytes = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        bytes(2 * i) = (s & 0xff).toByte
        bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, samples.length / channels)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val mono = Array.tabulate[Short](512)(i => if (i % 2 == 0) 1000 else -1000)
    val monoWav = wav(mono, 1, 8000f)
    assert(Multimodal.looksLikeWav(monoWav))
    val info = Multimodal.parseWav(monoWav).get
    assert(info.channels == 1 && info.sampleRate == 8000)
    assert(Multimodal.wavSamples(monoWav, info).toSeq == mono.toSeq)
    // stereo: channel-0 extraction skips the interleaved right channel
    val stereo = Array.tabulate[Short](64)(i => if (i % 2 == 0) 300 else 9999)
    val stInfo = Multimodal.parseWav(wav(stereo, 2, 44100f)).get
    assert(stInfo.channels == 2 && stInfo.sampleRate == 44100)
    assert(Multimodal.wavSamples(wav(stereo, 2, 44100f), stInfo).forall(_ == 300))
    // end to end: features carry the header's rate + codec tag; raw
    // blobs keep the stand-in path
    val df = Seq((1L, monoWav), (2L, Array.tabulate[Byte](100)(_.toByte)))
      .toDF("media_id", "media_bytes")
    val got = Multimodal.audioFeatures(df, "media_id", "media_bytes", window = 256)
      .collect().map(f => f.media_id -> f).toMap
    assert(got(1L).codec == "wav-pcm16" && got(1L).sample_rate == 8000)
    assert(got(1L).n_samples == 512 && math.abs(got(1L).rms - 1000.0) < 1e-9)
    assert(got(2L).codec == "raw-pcm16" && got(2L).sample_rate == 0)
  }

  test("wide aHash (256-bit): one-pixel edit within banding reach, re-encode hamming 0, unrelated far") {
    def raster(w: Int, h: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (x * 37 + y * 101) % 256
        img.setRGB(x, y, (v << 16) | ((255 - v) << 8) | v)
      }
      img
    }
    def enc(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    def hamming(a: Multimodal.MediaHash, b: Multimodal.MediaHash): Int =
      java.lang.Long.bitCount(a.w0 ^ b.w0) + java.lang.Long.bitCount(a.w1 ^ b.w1) +
        java.lang.Long.bitCount(a.w2 ^ b.w2) + java.lang.Long.bitCount(a.w3 ^ b.w3)
    // realistic raster size: a 16x16 cell grid needs cells much larger
    // than one pixel for a one-pixel edit to stay in banding reach (on
    // a 32x24 toy raster a single pixel is half its 2x1.5-px cell and
    // the edit measured hamming 4)
    val base = raster(128, 96)
    val edited = raster(128, 96)
    edited.setRGB(5, 5, 0xffffff)
    val hPng = Multimodal.aHashWideWords(enc(base, "png"))
    val hBmp = Multimodal.aHashWideWords(enc(base, "bmp"))
    val hEdit = Multimodal.aHashWideWords(enc(edited, "png"))
    val hOther = Multimodal.aHashWideWords(enc(raster(96, 128), "png"))
    assert(hPng.decoded && hBmp.decoded && hEdit.decoded && hOther.decoded)
    assert(hamming(hPng, hBmp) == 0)
    assert(hamming(hPng, hEdit) <= 3, s"got ${hamming(hPng, hEdit)}")
    assert(hamming(hPng, hOther) > 3)
  }

  test("wide-tier banding == all-pairs at hamming <= 3 (pigeonhole completeness on the 4x64-bit words)") {
    // deterministic blob corpus with planted 1-2 byte edits — the
    // banded candidate join must recover EXACTLY the brute-force
    // hamming <= 3 relation over the wide fingerprints
    val rnd = new scala.util.Random(1742)
    val blobs = (0 until 240).map { i =>
      val b = new Array[Byte](200 + rnd.nextInt(600))
      rnd.nextBytes(b)
      (i.toLong, b)
    }
    val edits = blobs.filter(_._1 % 5 == 0).map { case (id, b) =>
      val c = b.clone()
      c(3) = (c(3) + 1).toByte
      if (id % 10 == 0) c(c.length / 2) = (c(c.length / 2) ^ 0x11).toByte
      (id + 10000L, c)
    }
    val all = (blobs ++ edits).map { case (id, b) =>
      Multimodal.aHashWideWords(b).copy(media_id = id)
    }
    def ham(a: Multimodal.MediaHash, b: Multimodal.MediaHash): Int =
      java.lang.Long.bitCount(a.w0 ^ b.w0) + java.lang.Long.bitCount(a.w1 ^ b.w1) +
        java.lang.Long.bitCount(a.w2 ^ b.w2) + java.lang.Long.bitCount(a.w3 ^ b.w3)
    val brute = (for {
      a <- all; b <- all
      if a.media_id < b.media_id && ham(a, b) <= 3
    } yield (a.media_id, b.media_id, ham(a, b).toLong)).toSet
    assert(brute.nonEmpty, "fixture must plant wide near-dups")
    val h = all.toDF()
    val banded = graft.queries.MultimodalQueries.phashBandedPairs(h, Some(1000))
      .as[(Long, Long, Long)].collect().toSet
    assert(banded == brute,
      s"banded candidates missed ${(brute -- banded).size} / added ${(banded -- brute).size}")
  }

  test("phash tier crossover: gate SFs stay on the bit-unchanged narrow anchor; selector flips at PhashNarrowMax") {
    assert(!Multimodal.phashUseWide(Multimodal.PhashNarrowMax))
    assert(Multimodal.phashUseWide(Multimodal.PhashNarrowMax + 1))
    // every oracle-gated SF dir sits below the crossover, so the
    // declared key's gate output is bit-identical to the r16 narrow
    // plan AND the tiered oracle takes its narrow branch there
    for (dir <- Catalog.testdataSfDirs) {
      val n = graft.sources.Sources.footerRowCount(spark, s"$dir/documents.parquet")
      assert(!Multimodal.phashUseWide(n),
        s"$dir has $n docs — gate SF crossed the phash narrow ceiling")
    }
  }

  test("prodGreater: exact 128-bit cross-multiply compare (no Long-overflow bit flips)") {
    def ref(a: Long, b: Long, c: Long, d: Long): Boolean =
      BigInt(a) * BigInt(b) > BigInt(c) * BigInt(d)
    // the ADVICE r16 case: ~1.5 GB blob makes 255*len^2/64 cross 2^63
    val len = 1600000000L
    val cases = Seq(
      (255L * len / 64 + 1, len, 255L * len / 64, len),
      (255L * len / 64, len, 255L * len / 64, len),
      (Long.MaxValue / 3, 7L, Long.MaxValue / 7, 3L))
    val rnd = new scala.util.Random(99)
    val rand = (0 until 2000).map { _ =>
      val m = 1L << (rnd.nextInt(32) + 31)
      (math.abs(rnd.nextLong()) % m, math.abs(rnd.nextLong()) % m,
        math.abs(rnd.nextLong()) % m, math.abs(rnd.nextLong()) % m)
    }
    for ((a, b, c, d) <- cases ++ rand)
      assert(Multimodal.prodGreater(a, b, c, d) == ref(a, b, c, d),
        s"($a,$b,$c,$d)")
  }

  test("frameSample: strided fixed-size frames") {
    val df = Seq((7L, "x" * 300)).toDF("id", "txt")
      .select($"id", encode($"txt", "UTF-8").as("bin"))
    // 300 bytes -> frames of 64: [64,64,64,64,44]; stride 2 -> frames 0,2,4
    val frames = Multimodal.frameSample(df, "id", "bin", frameSize = 64, stride = 2)
      .select($"frame_no", length($"frame_bytes")).as[(Int, Int)].collect().sorted
    assert(frames.toSeq == Seq((0, 64), (2, 64), (4, 44)))
  }

  test("fixture properties the multimodal oracles rely on: no decodable blob, pure ASCII") {
    // multimodal_dedup's oracle hardcodes any_decoded=FALSE + md5(text),
    // and multimodal_features' oracle equates byte sums with per-char
    // codepoint sums — both hold only while (a) no document's utf8
    // bytes begin with an image magic number (every row takes the
    // raw-byte/fallback path) and (b) the corpus is pure ASCII (bytes
    // == codepoints). Pin both at every SF the gates run on, so corpus
    // drift fails HERE deterministically instead of in the driver's
    // oracle hash compare.
    for (dir <- Catalog.testdataSfDirs) {
      val d = Catalog.table(spark, dir, "documents")
        .select($"doc_id", $"text", encode($"text", "UTF-8").as("bin"))
      val decoded = Multimodal.contentDigests(d, "doc_id", "bin")
        .filter(_.decoded).count()
      assert(decoded == 0L,
        s"$dir: a document's bytes decode as an image — the raw-byte " +
          "oracle mapping for multimodal_dedup/features no longer holds")
      val nonAscii = d.filter(length($"text") =!= org.apache.spark.sql
        .functions.octet_length($"text")).count()
      assert(nonAscii == 0L,
        s"$dir: non-ASCII text — byte sums diverge from codepoint sums")
      // (c) multimodal_audio's oracle hardcodes codec='raw-pcm16' /
      // sample_rate=0 — true only while NO fixture text parses as a
      // RIFF/WAVE container (ADVICE r10: this third leg of the
      // fixture property was unpinned; a pathological fixture would
      // have surfaced only as an opaque oracle hash mismatch)
      val wavParsed = d.select($"bin").as[Array[Byte]]
        .mapPartitions(_.map(b => if (Multimodal.parseWav(b).isDefined) 1L else 0L))
        .reduce(_ + _)
      assert(wavParsed == 0L,
        s"$dir: a document's bytes parse as WAV — the raw-pcm16 " +
          "fallback mapping for multimodal_audio no longer holds")
    }
  }
}
