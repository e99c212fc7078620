package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.PageSynth.mix2

/** Multimodal binary-column plumbing: batched decode (REAL ImageIO PNG for
  * images, REAL AudioSystem WAV for audio, labeled stub for video), frame
  * sampling, thumbs. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = Multimodal.synthMedia(spark, 300).cache()
  lazy val meta  = Multimodal.decodeMeta(media).cache()

  test("batched decode recovers metadata for every well-formed payload") {
    assert(meta.count() == 300)
    val m = meta.collect()
    assert(m.forall(_.payload_bytes >= 85))
    m.foreach { r => r.kind match {
      case "image" => assert(r.width >= 16 && r.height >= 16 && r.duration_ms == 0L)
      case "audio" => // width = sample rate, height = channels (see MediaMeta)
        assert(Multimodal.WavRates.contains(r.width) && r.height == 1 && r.duration_ms > 0L)
      case "video" => assert(r.width >= 16 && r.height >= 16 && r.duration_ms > 0L)
    }}
    assert(m.map(_.kind).toSet == Set("image", "audio", "video"))
  }

  test("audio payloads are real WAVs; decode recovers rate, frames and exact samples") {
    val auds = media.filter(_.kind == "audio").collect()
    assert(auds.nonEmpty)
    auds.take(20).foreach { r =>
      assert(Multimodal.isWav(r.payload))
      // independent decode (plain AudioSystem, not the engine path)
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      val f = ais.getFormat
      // rate/frames the generator chose, re-derived from the seed formula
      val rate    = Multimodal.WavRates(((mix2(42L, r.media_id * 7 + 2) & Long.MaxValue)
        % Multimodal.WavRates.length).toInt)
      val nFrames = 64 + ((mix2(42L, r.media_id * 7 + 3) & Long.MaxValue) % 1984).toInt
      assert(f.getSampleRate.toInt == rate && f.getChannels == 1 &&
        f.getSampleSizeInBits == 16 && ais.getFrameLength == nFrames)
      // decoded-vs-synthesized sample equality: the PCM byte stream must be
      // exactly the mix2-derived samples (16-bit little-endian)
      val pcm = ais.readAllBytes()
      assert(pcm.length == nFrames * 2)
      (0 until nFrames).foreach { i =>
        val s = ((pcm(2 * i) & 0xFF) | ((pcm(2 * i + 1) & 0xFF) << 8)).toShort
        assert(s == (mix2(r.media_id, i.toLong) & 0xFFFF).toShort,
          s"sample $i of media ${r.media_id}")
      }
      ais.close()
    }
    // the engine's batched decode agrees with the independent decode
    val viaEngine = meta.filter(_.kind == "audio").collect()
      .map(m => m.media_id -> m).toMap
    auds.foreach { r =>
      val rate    = Multimodal.WavRates(((mix2(42L, r.media_id * 7 + 2) & Long.MaxValue)
        % Multimodal.WavRates.length).toInt)
      val nFrames = 64 + ((mix2(42L, r.media_id * 7 + 3) & Long.MaxValue) % 1984).toInt
      val e = viaEngine(r.media_id)
      assert(e.width == rate && e.height == 1 &&
        e.duration_ms == nFrames * 1000L / rate)
    }
  }

  test("image payloads are real PNGs; decode reads true raster dims and pixels") {
    val imgs = media.filter(_.kind == "image").collect()
    assert(imgs.nonEmpty)
    imgs.take(20).foreach { r =>
      assert(Multimodal.isPng(r.payload))
      // independent decode (plain ImageIO, not the engine path)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      // dims the generator chose, re-derived from the seed formula
      val w = 16 + ((mix2(42L, r.media_id * 7 + 2) & Long.MaxValue) % 64).toInt
      val h = 16 + ((mix2(42L, r.media_id * 7 + 3) & Long.MaxValue) % 48).toInt
      assert(img.getWidth == w && img.getHeight == h)
      // pixel round-trip: RGB PNG encode→decode is lossless
      assert((img.getRGB(0, 0) & 0xFFFFFF) == (mix2(r.media_id, 0L) & 0xFFFFFF).toInt)
      assert((img.getRGB(1, 2) & 0xFFFFFF) ==
        (mix2(r.media_id, (2L << 20) | 1L) & 0xFFFFFF).toInt)
    }
    // the engine's batched decodeMeta agrees with the independent decode
    val viaEngine = meta.filter(_.kind == "image").collect()
      .map(m => m.media_id -> ((m.width, m.height))).toMap
    imgs.foreach { r =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      assert(viaEngine(r.media_id) == ((img.getWidth, img.getHeight)))
    }
  }

  test("decode is deterministic across partitionings") {
    val a = meta.orderBy("media_id").collect().toSeq
    val b = Multimodal.decodeMeta(media.repartition(7)).orderBy("media_id").collect().toSeq
    assert(a == b)
  }

  test("malformed payloads are dropped, not fatal") {
    val corrupt = media.map(r => if (r.media_id % 3 == 0)
      r.copy(payload = Array[Byte](1, 2, 3)) else r)
    val n = Multimodal.decodeMeta(corrupt).count()
    assert(n == 200)
  }

  test("frame sampling: images excluded, offsets bounded and stepped") {
    val fo = Multimodal.frameOffsets(meta.toDF(), 10000L).collect()
    assert(fo.nonEmpty)
    fo.foreach { r =>
      val offs = r.getSeq[Long](1)
      assert(offs.head == 0L && offs.length <= 32)
      assert(offs.sliding(2).forall(p => p.length < 2 || p(1) - p(0) == 10000L))
    }
  }

  test("thumbnail dims preserve aspect, max side 256") {
    val joined = Multimodal.thumbnailDims(meta.toDF()).join(meta, "media_id").collect()
    joined.foreach { r =>
      val (tw, th) = (r.getAs[Int]("thumb_w"), r.getAs[Int]("thumb_h"))
      val (w, h)   = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      assert(tw <= 256 && th <= 256 && tw >= 1 && th >= 1)
      // each side is the rounded ideal (±0.5 px), clamped to ≥1
      val scale = math.min(1.0, 256.0 / math.max(w, h))
      assert(math.abs(tw - math.max(1.0, math.round(w * scale).toDouble)) <= 1.0, s"w=$w h=$h tw=$tw")
      assert(math.abs(th - math.max(1.0, math.round(h * scale).toDouble)) <= 1.0, s"w=$w h=$h th=$th")
    }
  }

  test("stub embeddings are deterministic and well-shaped") {
    val e1 = Multimodal.embedStub(media).orderBy("media_id").collect()
    val e2 = Multimodal.embedStub(media).orderBy("media_id").collect()
    assert(e1.length == 300)
    assert(e1.map(_.getSeq[Float](1)).zip(e2.map(_.getSeq[Float](1))).forall(p => p._1 == p._2))
    assert(e1.forall(_.getSeq[Float](1).length == 8))
  }
}
