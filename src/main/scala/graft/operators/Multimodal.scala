package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.PageSynth.mix2

/** One media row: opaque payload bytes + stable id (the 100 TB layout: media
  * as `binary` columns co-stored with typed metadata, never decoded at rest). */
final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

final case class MediaMeta(
    media_id: Long, kind: String, width: Int, height: Int,
    duration_ms: Long, payload_bytes: Long)

/**
 * Multimodal-column operators. Image payloads are REAL PNGs (synthesized
 * pixel-by-pixel, encoded and decoded by the JDK's own ImageIO codec — zero
 * external dependencies); audio/video codecs genuinely don't exist in this
 * container, so those payloads remain a deterministic, clearly-labeled
 * self-describing header STUB. The Spark-side plumbing is identical for both
 * and is what matters at scale:
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

  val Magic: Int = 0x47524654 // "GRFT" (audio/video stub header)
  val Kinds: Array[String] = Array("image", "audio", "video")

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

  /** Deterministic synthetic media: REAL PNG bytes for images; for audio and
    * video a self-describing fake header + hash payload (no codec available
    * to produce real containers offline). */
  def synthMedia(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism).map { id =>
      val kind = Kinds(((mix2(seed, id * 7 + 1) & Long.MaxValue) % 3).toInt)
      if (kind == "image") {
        val w = 16 + ((mix2(seed, id * 7 + 2) & Long.MaxValue) % 64).toInt
        val h = 16 + ((mix2(seed, id * 7 + 3) & Long.MaxValue) % 48).toInt
        MediaRow(id, kind, synthPng(id, w, h))
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

  /** STUB decode for the kinds with no offline codec (audio/video): parses
    * the deterministic fake header. A real build swaps this one function for
    * an actual codec call; everything around it stays. */
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
   * stub-header payloads go through [[parseHeader]]. Malformed payloads of
   * either sort are dropped (never fail the partition).
   */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // the expensive per-partition codec handle: ONE ImageReader, re-set
      // per row — never constructed per row
      val readers = javax.imageio.ImageIO.getImageReadersByFormatName("png")
      val png = if (readers.hasNext) readers.next() else null
      rows.flatMap { r =>
        if (isPng(r.payload) && png != null) {
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
