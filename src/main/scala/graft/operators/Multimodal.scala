package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.PageSynth.mix2

/** One media row: opaque payload bytes + stable id (the 100 TB layout: media
  * as `binary` columns co-stored with typed metadata, never decoded at rest). */
final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

/** Decoded media metadata. Field mapping per kind: image → (width, height)
  * are raster pixel dims, duration 0; audio → width = sample rate in Hz,
  * height = channel count, duration from the decoded frame count; video
  * (stub) → header-declared frame dims + duration. */
final case class MediaMeta(
    media_id: Long, kind: String, width: Int, height: Int,
    duration_ms: Long, payload_bytes: Long)

/**
 * Multimodal-column operators. Image payloads are REAL PNGs (synthesized
 * pixel-by-pixel, encoded and decoded by the JDK's own ImageIO codec) and
 * audio payloads are REAL RIFF/WAV PCM (synthesized sample-by-sample,
 * decoded by the JDK's own `javax.sound.sampled.AudioSystem`) — zero
 * external dependencies in both cases. Only video genuinely has no JDK
 * codec; those payloads remain a deterministic, clearly-labeled
 * self-describing header STUB. The Spark-side plumbing is identical for all
 * three and is what matters at scale:
 *
 *  - media travels as an opaque `binary` column (never materialized on the
 *    driver, column-pruned away unless asked for);
 *  - decode runs batched in `mapPartitions` with the codec initialized ONCE
 *    per partition (the mapInPandas/model-server shape: init amortized over
 *    the partition, not paid per row);
 *  - derived features (frame-sample offsets, thumbnail dims, fake embedding)
 *    are pure functions of the bytes → deterministic, shuffle-free.
 */
object Multimodal {

  val Magic: Int = 0x47524654 // "GRFT" (video stub header)
  val Kinds: Array[String] = Array("image", "audio", "video")

  /** WAV sample rates the synthesizer draws from (all JDK-decodable). */
  val WavRates: Array[Int] = Array(8000, 16000, 22050, 44100)

  /** PNG file signature (first 4 of the 8 signature bytes — RFC 2083). */
  private val PngMagic: Array[Byte] =
    Array(0x89.toByte, 0x50.toByte, 0x4E.toByte, 0x47.toByte)

  def isPng(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 8 &&
      PngMagic.indices.forall(i => bytes(i) == PngMagic(i))

  /** Deterministic REAL PNG: w×h RGB whose pixel (x,y) is a pure function of
    * (id, x, y), encoded by `javax.imageio`. Dims stay small (≤ 79×63) so a
    * test-scale corpus encodes in milliseconds; the decode path is identical
    * at any size. */
  def synthPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (mix2(id, (y.toLong << 20) | x.toLong) & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic REAL RIFF/WAV: 16-bit signed PCM mono, little-endian,
    * sample i of media `id` = low 16 bits of `mix2(id, i)` — a pure function
    * of (id, i), so the decode side can re-derive every sample exactly. */
  def synthWav(id: Long, sampleRate: Int, nFrames: Int): Array[Byte] = {
    val ascii   = java.nio.charset.StandardCharsets.US_ASCII
    val dataLen = nFrames * 2 // mono, 2 bytes/frame
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(ascii)).putInt(36 + dataLen).put("WAVE".getBytes(ascii))
      .put("fmt ".getBytes(ascii)).putInt(16)
      .putShort(1)                 // PCM
      .putShort(1)                 // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)      // byte rate
      .putShort(2)                 // block align
      .putShort(16)                // bits/sample
      .put("data".getBytes(ascii)).putInt(dataLen)
    var i = 0
    while (i < nFrames) { buf.putShort((mix2(id, i.toLong) & 0xFFFF).toShort); i += 1 }
    buf.array()
  }

  def isWav(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 44 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

  /** Deterministic synthetic media: REAL PNG bytes for images, REAL RIFF/WAV
    * PCM for audio; for video a self-describing fake header + hash payload
    * (the one kind with no JDK codec). */
  def synthMedia(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism).map { id =>
      val kind = Kinds(((mix2(seed, id * 7 + 1) & Long.MaxValue) % 3).toInt)
      if (kind == "image") {
        val w = 16 + ((mix2(seed, id * 7 + 2) & Long.MaxValue) % 64).toInt
        val h = 16 + ((mix2(seed, id * 7 + 3) & Long.MaxValue) % 48).toInt
        MediaRow(id, kind, synthPng(id, w, h))
      } else if (kind == "audio") {
        val rate    = WavRates(((mix2(seed, id * 7 + 2) & Long.MaxValue) % WavRates.length).toInt)
        val nFrames = 64 + ((mix2(seed, id * 7 + 3) & Long.MaxValue) % 1984).toInt
        MediaRow(id, kind, synthWav(id, rate, nFrames))
      } else {
        val w    = 16 + ((mix2(seed, id * 7 + 2) & Long.MaxValue) % 4096).toInt
        val h    = 16 + ((mix2(seed, id * 7 + 3) & Long.MaxValue) % 2160).toInt
        val dur  = (mix2(seed, id * 7 + 4) & Long.MaxValue) % 600000L
        val payloadLen = 64 + ((mix2(seed, id * 7 + 5) & Long.MaxValue) % 192).toInt
        val buf = ByteBuffer.allocate(21 + payloadLen).order(ByteOrder.BIG_ENDIAN)
        buf.putInt(Magic).put(Kinds.indexOf(kind).toByte)
          .putInt(w).putInt(h).putLong(dur)
        var i = 0
        while (i < payloadLen) { buf.put((mix2(id, i.toLong) & 0xFF).toByte); i += 1 }
        MediaRow(id, kind, buf.array())
      }
    }
  }

  /** STUB decode for the one kind with no JDK codec (video): parses the
    * deterministic fake header. A real build swaps this one function for an
    * actual codec call; everything around it stays. */
  def parseHeader(id: Long, bytes: Array[Byte]): Option[MediaMeta] = {
    if (bytes == null || bytes.length < 21) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    if (buf.getInt() != Magic) return None
    val kind = Kinds(buf.get().toInt & 0xFF match { case k if k < 3 => k; case _ => return None })
    Some(MediaMeta(id, kind, buf.getInt(), buf.getInt(), buf.getLong(), bytes.length.toLong))
  }

  /**
   * Batched decode: one codec init per partition, then a streaming pass over
   * the rows. PNG payloads go through a REAL `javax.imageio` pixel decode
   * (width/height read from the decoded raster, not from our own metadata);
   * WAV payloads through a REAL `AudioSystem` decode (sample rate, channels
   * and frame count from the audio stream, not the header we wrote);
   * stub-header payloads (video) through [[parseHeader]]. MALFORMED payloads
   * are dropped (never fail the partition) — but a MISSING codec is an
   * environment defect and throws: silently routing every image to the
   * malformed-drop path would read as "no media" instead of an error.
   */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // the expensive per-partition codec handle: ONE ImageReader, re-set
      // per row — never constructed per row, disposed when the task ends.
      // (AudioSystem's provider registry is JVM-cached; there is no per-reader
      // handle to hold for WAV.)
      val readers = javax.imageio.ImageIO.getImageReadersByFormatName("png")
      if (!readers.hasNext)
        throw new IllegalStateException(
          "no PNG ImageReader registered in this JVM — refusing to silently drop images")
      val png = readers.next()
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) tc.addTaskCompletionListener[Unit](_ => png.dispose())
      rows.flatMap { r =>
        if (isPng(r.payload)) {
          try {
            val in = new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(r.payload))
            try {
              png.setInput(in)
              val img = png.read(0) // full pixel decode, not just the IHDR header
              Some(MediaMeta(r.media_id, "image", img.getWidth, img.getHeight,
                0L, r.payload.length.toLong))
            } finally in.close()
          } catch { case scala.util.control.NonFatal(_) => None }
        } else if (isWav(r.payload)) {
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(r.payload))
            try {
              val f = ais.getFormat
              val rate = f.getSampleRate.toLong
              Some(MediaMeta(r.media_id, "audio", f.getSampleRate.toInt, f.getChannels,
                if (rate > 0) ais.getFrameLength * 1000L / rate else 0L,
                r.payload.length.toLong))
            } finally ais.close()
          } catch { case scala.util.control.NonFatal(_) => None }
        } else parseHeader(r.media_id, r.payload)
      }
    }
  }

  /** Frame-sample offsets (ms) for timed media: every `everyMs`, max 32 frames. */
  def frameOffsets(meta: DataFrame, everyMs: Long = 10000L): DataFrame =
    meta.filter(col("duration_ms") > 0)
      .select(col("media_id"),
        sequence(lit(0L), least(col("duration_ms"), lit(everyMs * 31)), lit(everyMs))
          .as("frame_offsets_ms"))

  /** Thumbnail dims preserving aspect ratio, max side `maxSide` (pure arithmetic). */
  def thumbnailDims(meta: DataFrame, maxSide: Int = 256): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide.toDouble) / greatest(col("width"), col("height")).cast("double"))
    meta.select(col("media_id"),
      greatest(lit(1), round(col("width") * scale)).cast("int").as("thumb_w"),
      greatest(lit(1), round(col("height") * scale)).cast("int").as("thumb_h"))
  }

  /** STUB feature extractor: deterministic 8-dim pseudo-embedding of the payload. */
  def embedStub(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.map { r =>
      val base = graft.sources.PageSynth.mix(r.media_id * 31 + r.payload.length)
      (r.media_id,
        Array.tabulate(8)(i => (mix2(base, i.toLong).toDouble / Long.MaxValue).toFloat))
    }.toDF("media_id", "embedding")
  }
}
