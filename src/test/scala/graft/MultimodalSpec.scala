package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

class MultimodalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("FakeCodec is deterministic and fixed-width") {
    val bytes = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10)
    val a = Multimodal.FakeCodec.decode(bytes)
    val b = Multimodal.FakeCodec.decode(bytes)
    assert(a.toSeq === b.toSeq)
    assert(a.length === 8)
    assert(a(0) === (1 + 9).toFloat) // slot 0 = bytes 0 and 8, exact integers
  }

  test("extractFeatures skips null and undecodable payloads instead of NPE") {
    import spark.implicits._
    val media = Seq(
      // audio goes through FakeCodec: any bytes decode
      Multimodal.MediaRow(1L, "audio", "wav", 8, 8, 1, Array[Byte](1, 2)),
      // null payload: skipped for any kind
      Multimodal.MediaRow(2L, "image", "png", 8, 8, 1, null),
      // image with non-PNG garbage: real codec can't decode -> skipped like NULL
      Multimodal.MediaRow(3L, "image", "png", 8, 8, 1, Array[Byte](1, 2)))
      .toDF()
    val feats = Multimodal.extractFeatures(spark, media).collect()
    assert(feats.map(_.media_id).toSeq === Seq(1L))
  }

  test("media table: image payloads are real decodable PNGs, deterministic") {
    val media = Multimodal.mediaTable(spark, dir)
    assert(media.schema("payload").dataType.typeName === "binary")
    val row = media.filter(col("media_id") === 0).collect()(0)
    assert(row.getAs[String]("kind") === "image")
    val payload = row.getAs[Array[Byte]]("payload")
    // PNG magic bytes
    assert(payload.take(4).toSeq === Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    // round-trips through ImageIO at the metadata dims
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    assert(img != null)
    assert((img.getWidth, img.getHeight) === Multimodal.PngCodec.dims(0))
    // encoder determinism: same id -> bit-identical bytes
    assert(Multimodal.PngCodec.encode(0).toSeq === Multimodal.PngCodec.encode(0).toSeq)
    assert(payload.toSeq === Multimodal.PngCodec.encode(0).toSeq)
    assert(media.count() === 500)
  }

  test("extractFeatures runs partition-wise and keeps row count") {
    val media = Multimodal.mediaTable(spark, dir).repartition(4)
    val feats = Multimodal.extractFeatures(spark, media)
    assert(feats.count() === 500)
    val f = feats.filter(col("media_id") === 1).collect()(0)
    assert(f.feature.length === 8)
    assert(f.n_bytes === 32)
  }

  test("resize updates dims and shrinks payload deterministically") {
    val media = Multimodal.mediaTable(spark, dir).filter(col("media_id") < 10)
    val resized = Multimodal.resize(spark, media, 160, 90)
    val rows = resized.collect()
    assert(rows.forall(r => r.getAs[Int]("width") === 160))
    assert(rows.forall(r => r.getAs[Int]("height") === 90))
    val again = Multimodal.resize(spark, media, 160, 90).collect()
    assert(rows.map(_.getAs[Array[Byte]]("payload").toSeq).toSeq ===
      again.map(_.getAs[Array[Byte]]("payload").toSeq).toSeq)
  }

  test("dHash: resized/re-encoded copies collide, distinct images differ") {
    import spark.implicits._
    def mk(id: Long, w: Int, h: Int): Array[Byte] =
      Multimodal.PngCodec.encodeWith(w, h,
        i => Multimodal.phashPixel(id, i))
    val a = mk(1L, 12, 6)
    val b = mk(2L, 12, 6) // different content, same dims
    val aUp = Multimodal.PngCodec.resize(a, 24, 12).get // 2× upscale of a
    val aRe = { // decode→re-encode roundtrip of a (same pixels)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val ha = Multimodal.PngCodec.dHash(a).get
    assert(Multimodal.PngCodec.dHash(aUp).get === ha,
      "2x nearest-neighbor upscale must sample the same source pixels")
    assert(Multimodal.PngCodec.dHash(aRe).get === ha)
    val hb = Multimodal.PngCodec.dHash(b).get
    assert(java.lang.Long.bitCount(ha ^ hb) > 6,
      s"distinct pseudo-random images must hash apart, got ${ha ^ hb}")
    // end-to-end: only the planted (original, copy) pair survives
    val media = Seq((1L, 12, 6, a), (2L, 12, 6, b), (100001L, 24, 12, aUp))
      .toDF("media_id", "width", "height", "payload")
    val pairs = Multimodal.phashDedup(spark, media, maxHamming = 6)
      .select("a", "b", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(pairs === Set((1L, 100001L, 0)))
  }

  test("phashTable plants decodable copies that pair with their originals") {
    val tbl = Multimodal.phashTable(spark, dir)
    val nOrig = tbl.filter(col("media_id") < 1000000L).count()
    val nCopy = tbl.filter(col("media_id") >= 1000000L).count()
    assert(nOrig > 0 && nCopy > 0)
    val pairs = Multimodal.phashDedup(spark, tbl, maxHamming = 6)
    // every copy pairs with its original at Hamming 0
    val exact = pairs.filter(col("hamming") === 0)
      .filter(col("b") - col("a") === 1000000L).count()
    assert(exact === nCopy)
  }

  test("sampleFrames: every step-th frame, only for video") {
    val media = Multimodal.mediaTable(spark, dir)
    val sampled = Multimodal.sampleFrames(media, 4)
    // media_id=2 → n_frames = 2%24+1 = 3 → frames 0 (step 4 → just 0)
    val m2 = sampled.filter(col("media_id") === 2)
      .select("frame_idx").collect().map(_.getInt(0)).sorted
    assert(m2.toSeq === Seq(0))
    // media_id=23 → video (23%3=2), n_frames=24 → 0,4,8,12,16,20
    val m23 = sampled.filter(col("media_id") === 23)
      .select("frame_idx").collect().map(_.getInt(0)).sorted
    assert(m23.toSeq === Seq(0, 4, 8, 12, 16, 20))
    assert(sampled.filter(col("media_id") === 1).count() === 0) // audio row
  }
}
