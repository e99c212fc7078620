package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal binary-column plumbing: batched decode, frame sampling, thumbs. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = Multimodal.synthMedia(spark, 300).cache()
  lazy val meta  = Multimodal.decodeMeta(media).cache()

  test("batched decode recovers metadata for every well-formed payload") {
    assert(meta.count() == 300)
    val m = meta.collect()
    assert(m.forall(r => r.width >= 16 && r.height >= 16 && r.payload_bytes >= 85))
    assert(m.forall(r => (r.kind == "image") == (r.duration_ms == 0L)))
    assert(m.map(_.kind).toSet == Set("image", "audio", "video"))
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
