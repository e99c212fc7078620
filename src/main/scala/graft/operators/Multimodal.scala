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
 * Multimodal-column operators. Real decode/resize/transcode needs codec
 * libraries this container doesn't ship, so the byte-level decode is a
 * deterministic STUB (`parseHeader` on a self-describing fake header) — but
 * the Spark-side plumbing is the real pattern and is what's tested:
 *
 *  - media travels as an opaque `binary` column (never materialized on the
 *    driver, column-pruned away unless asked for);
 *  - decode runs batched in `mapPartitions` with the expensive "codec"
 *    initialized ONCE per partition (the mapInPandas/model-server shape:
 *    per-batch init amortized over the partition, not paid per row);
 *  - derived features (frame-sample offsets, thumbnail dims, fake embedding)
 *    are pure functions of the bytes → deterministic, shuffle-free.
 */
object Multimodal {

  val Magic: Int = 0x47524654 // "GRFT"
  val Kinds: Array[String] = Array("image", "audio", "video")

  /** Deterministic synthetic media: self-describing header + hash payload. */
  def synthMedia(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism).map { id =>
      val kind = Kinds(((mix2(seed, id * 7 + 1) & Long.MaxValue) % 3).toInt)
      val w    = 16 + ((mix2(seed, id * 7 + 2) & Long.MaxValue) % 4096).toInt
      val h    = 16 + ((mix2(seed, id * 7 + 3) & Long.MaxValue) % 2160).toInt
      val dur  = if (kind == "image") 0L else (mix2(seed, id * 7 + 4) & Long.MaxValue) % 600000L
      val payloadLen = 64 + ((mix2(seed, id * 7 + 5) & Long.MaxValue) % 192).toInt
      val buf = ByteBuffer.allocate(21 + payloadLen).order(ByteOrder.BIG_ENDIAN)
      buf.putInt(Magic).put(Kinds.indexOf(kind).toByte)
        .putInt(w).putInt(h).putLong(dur)
      var i = 0
      while (i < payloadLen) { buf.put((mix2(id, i.toLong) & 0xFF).toByte); i += 1 }
      MediaRow(id, kind, buf.array())
    }
  }

  /** STUB decode — parses the deterministic fake header. A real build swaps
    * this one function for an actual codec call; everything around it stays. */
  def parseHeader(id: Long, bytes: Array[Byte]): Option[MediaMeta] = {
    if (bytes == null || bytes.length < 21) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    if (buf.getInt() != Magic) return None
    val kind = Kinds(buf.get().toInt & 0xFF match { case k if k < 3 => k; case _ => return None })
    Some(MediaMeta(id, kind, buf.getInt(), buf.getInt(), buf.getLong(), bytes.length.toLong))
  }

  /**
   * Batched decode: one simulated codec init per partition, then a streaming
   * pass over the rows — the batch shape a real decoder/model needs.
   * Malformed payloads are dropped (never fail the partition).
   */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition "codec" init — deliberate stand-in for an expensive
      // library/model handle that must NOT be constructed per row
      val codecHandle = new java.util.concurrent.atomic.AtomicLong(0L)
      rows.flatMap { r =>
        codecHandle.incrementAndGet()
        parseHeader(r.media_id, r.payload)
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
