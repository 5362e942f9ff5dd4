package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Tables.t

/** Multimodal column handling: media as opaque `binary` payloads with a
  * typed metadata struct, plus decode / feature-extract / frame-sample
  * stages.
  *
  * The Spark-side plumbing is real — schema, partition-preserving typed
  * `mapPartitions` (the Scala analogue of `mapInPandas` batch processing),
  * deterministic batch shapes. The IMAGE path is a real codec:
  * `javax.imageio.ImageIO` (JDK java.desktop, headless-safe) encodes and
  * decodes actual PNG bytes, and the decode gates are oracled against the
  * pixel-generator formula — DuckDB never sees the payload, so a matching
  * result proves the decoder ran. Audio/video remain a declared STUB
  * (`FakeCodec`): this container has no audio/video codec libraries, so
  * decode produces deterministic fake features from the payload bytes.
  * Swapping in a real codec changes one function, none of the plumbing.
  */
object Multimodal {

  /** Typed media row: payload + metadata, as a case class for Dataset ops. */
  final case class MediaRow(
      media_id: Long, kind: String, format: String,
      width: Int, height: Int, n_frames: Int,
      payload: Array[Byte])

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int,
      feature: Array[Float])

  /** Real PNG codec on the JDK's built-in ImageIO (no external deps,
    * headless-safe — BufferedImage raster ops never touch a display).
    * Fixture images are 8-bit grayscale with pixel i (row-major) =
    * `(id + i) % 256` at dims `(8 + id%8) × (4 + id%4)` — small enough
    * that a DuckDB oracle can re-derive every pixel from the formula,
    * while the bytes on the wire are genuine deflate-compressed PNG. */
  object PngCodec {
    // ImageIO's default scratch-file cache would do a disk write per
    // encode/decode call inside executor tasks — keep it in memory
    javax.imageio.ImageIO.setUseCache(false)

    def dims(id: Long): (Int, Int) =
      ((8 + (id % 8)).toInt, (4 + (id % 4)).toInt)

    /** Deterministic PNG bytes for a media id (same JVM → same bytes:
      * the encoder is the JDK's, with no timestamps or ancillary chunks
      * that could vary run to run — pinned by MultimodalSpec). */
    def encode(id: Long): Array[Byte] = {
      val (w, h) = dims(id)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var i = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, ((id + i) % 256).toInt)
          x += 1; i += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Real pixel decode → fixed 8-slot feature vector
      * [pixel_sum, width, height, min, max, 0, 0, 0] — all whole numbers
      * (exact in Float far beyond these magnitudes), so downstream sums
      * are order-independent and DuckDB-oracle-able. None when the bytes
      * aren't a decodable image (ImageIO returns null / throws on
      * garbage) — the caller skips the row like a SQL NULL. */
    def decodeFeatures(payload: Array[Byte]): Option[Array[Float]] =
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          val raster = img.getRaster
          var sum = 0L
          var mn = Int.MaxValue
          var mx = Int.MinValue
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = raster.getSample(x, y, 0)
              sum += v
              if (v < mn) mn = v
              if (v > mx) mx = v
              x += 1
            }
            y += 1
          }
          Some(Array(sum.toFloat, w.toFloat, h.toFloat,
            mn.toFloat, mx.toFloat, 0f, 0f, 0f))
        }
      // ImageIO throws RuntimeExceptions (IAE, CMMException, ...) on some
      // malformed byte streams, not just IOException — any failure means
      // "undecodable", which the caller treats as SQL NULL
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Encode a grayscale PNG whose row-major pixel i is `f(i)` — the
      * generator for gate fixtures whose content a DuckDB oracle can
      * re-derive arithmetically. */
    def encodeWith(w: Int, h: Int, f: Int => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var i = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { raster.setSample(x, y, 0, f(i) & 0xFF); x += 1; i += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** 64-bit difference hash (dHash — the standard perceptual image
      * fingerprint): REAL decode, nearest-neighbor sample onto a 9×8
      * grid with the SAME integer-grid mapping as [[resize]]
      * (sx = x·sw/9, sy = y·sh/8 — so a codec-resized copy samples the
      * exact source pixels of its original: floor(floor(k·t)/k) =
      * floor(t)), bit y·8+x set iff sample(x,y) > sample(x+1,y).
      * Near-identical images land within a few bits; None when the
      * payload is undecodable. */
    def dHash(payload: Array[Byte]): Option[Long] =
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        if (img == null) None
        else {
          val sw = img.getWidth
          val sh = img.getHeight
          val r = img.getRaster
          def s(x: Int, y: Int): Int =
            r.getSample((x.toLong * sw / 9).toInt, (y.toLong * sh / 8).toInt, 0)
          var hash = 0L
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              if (s(x, y) > s(x + 1, y)) hash |= (1L << (y * 8 + x))
              x += 1
            }
            y += 1
          }
          Some(hash)
        }
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Real nearest-neighbor resize: decode, sample source pixels on the
      * integer grid (no AWT rendering pipeline — bit-deterministic on any
      * JVM), re-encode as grayscale PNG. None when undecodable. */
    def resize(payload: Array[Byte], newW: Int, newH: Int): Option[Array[Byte]] =
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        if (img == null) None
        else {
          val sw = img.getWidth
          val sh = img.getHeight
          val src = img.getRaster
          val out = new java.awt.image.BufferedImage(
            newW, newH, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val dst = out.getRaster
          var y = 0
          while (y < newH) {
            val sy = (y.toLong * sh / newH).toInt
            var x = 0
            while (x < newW) {
              dst.setSample(x, y, 0, src.getSample((x.toLong * sw / newW).toInt, sy, 0))
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          Some(bos.toByteArray)
        }
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** STUB codec for audio/video (no codec libraries in this container):
    * deterministic 8-dim "features" from payload bytes — the contract
    * (bytes in, fixed-width float vector out) is the real one. Slots
    * accumulate RAW byte values (whole numbers, exact in float up to
    * 2^24 — far above any payload here), so every downstream sum is
    * order-independent and the feature gate is DuckDB-oracle-able. */
  object FakeCodec {
    def decode(payload: Array[Byte]): Array[Float] = {
      val out = new Array[Float](8)
      var i = 0
      while (i < payload.length) {
        out(i % 8) += (payload(i) & 0xFF)
        i += 1
      }
      out
    }
  }

  /** Resize stage: images go through the REAL decode → nearest-neighbor →
    * re-encode path ([[PngCodec.resize]]); audio/video keep the
    * deterministic fake (payload derived from (payload, target dims)) so
    * the pipeline shape — new payload + updated metadata — is uniform. */
  def resize(spark: SparkSession, media: DataFrame,
      newW: Int, newH: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        val realResized =
          if (m.kind == "image" && m.payload != null)
            PngCodec.resize(m.payload, newW, newH)
          else None
        realResized match {
          case Some(bytes) => m.copy(width = newW, height = newH, payload = bytes)
          case None =>
            val scale = math.max(1,
              (m.width.toLong * m.height) / (newW.toLong * newH)).toInt
            val out = new Array[Byte](math.max(1, m.payload.length / scale))
            var i = 0
            while (i < out.length) { out(i) = m.payload(i % m.payload.length); i += 1 }
            m.copy(width = newW, height = newH, payload = out)
        }
      }
    }.toDF()
  }

  /** Synthesize a deterministic media table from `documents`. Image rows
    * carry REAL PNG payloads (encoded per-partition — no driver loop)
    * whose metadata width/height match the actual encoded dims; audio and
    * video payloads are sha256 bytes of the text (opaque, fixed 32
    * bytes). Stands in for a real parquet-with-binary source. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val isImg = col("doc_id") % 3 === 0
    val base = t(spark, dir, "documents").select(
      col("doc_id").as("media_id"),
      when(isImg, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
      when(isImg, "png")
        .when(col("doc_id") % 3 === 1, "wav").otherwise("mp4").as("format"),
      when(isImg, col("doc_id") % 8 + 8)
        .otherwise(col("doc_id") % 4 * 160 + 320).cast(IntegerType).as("width"),
      when(isImg, col("doc_id") % 4 + 4)
        .otherwise(col("doc_id") % 4 * 90 + 180).cast(IntegerType).as("height"),
      (col("doc_id") % 24 + 1).cast(IntegerType).as("n_frames"),
      when(!isImg, to_binary(sha2(col("text"), 256), lit("hex"))).as("payload"))
    base.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        if (m.kind == "image") m.copy(payload = PngCodec.encode(m.media_id))
        else m
      }
    }.toDF()
  }

  /** Decode/feature-extract via typed mapPartitions — batch-shaped like
    * mapInPandas: one iterator per partition, no per-row driver calls.
    * Images decode for real (ImageIO); audio/video go through the stub.
    * Rows with a null or undecodable payload are skipped — the same rows
    * a SQL aggregate would skip as NULLs. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.filter(col("payload").isNotNull).as[MediaRow].mapPartitions { it =>
      it.flatMap { m =>
        val feats =
          if (m.kind == "image") PngCodec.decodeFeatures(m.payload)
          else Some(FakeCodec.decode(m.payload))
        feats.map(f => MediaFeatures(m.media_id, m.kind, m.payload.length, f))
      }
    }
  }

  /** Frame sampling for "video" rows: every `step`-th frame index, as a
    * lazy generated column (sequence+explode — no driver loop). */
  def sampleFrames(media: DataFrame, step: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(step))).as("frame_idx"))

  // ---- perceptual-hash image dedup -------------------------------------------

  /** Pixel generator for the perceptual-hash gate: a QUADRATIC-in-i
    * product `((s0+i+7)·(s0+2i+13)) mod 256` with `s0 = id mod 4096 + 1`
    * — pseudo-random per image (so distinct images get diverse dHashes
    * where [[mediaTable]]'s gradient ramp would make every image look
    * alike) and BOUNDED: every intermediate stays far below 2^63, so the
    * DuckDB oracle computes it at ANY doc_id scale (a raw
    * `(id+1)·(i+7)·2654435761` overflowed INT64 the moment a 10× corpus
    * shifted ids past 3.5e9 — caught by the round-8 scale sweep). */
  private[graft] def phashPixel(id: Long, i: Int): Int = {
    val s0 = id % 4096 + 1
    (((s0 + i + 7) * (s0 + 2L * i + 13)) % 256).toInt
  }

  /** Gate-specific image corpus for perceptual-hash dedup. Pixels come
    * from [[phashPixel]]. Every 9th image also appears as a PLANTED
    * near-duplicate: its real PNG 2×-upscaled through the REAL codec path
    * ([[PngCodec.resize]]), re-encoded, under media_id + 1,000,000 — a
    * decode→resize→re-encode roundtrip whose dHash must collide with the
    * original's (the 9×8 sampling grid maps through the 2× upscale to the
    * exact same source pixels). */
  def phashTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "documents").filter(col("doc_id") % 3 === 0)
      .select(col("doc_id")).as[Long].mapPartitions { it =>
        it.flatMap { id =>
          val w = (8 + id % 8).toInt
          val h = (4 + id % 4).toInt
          val orig = PngCodec.encodeWith(w, h, i => phashPixel(id, i))
          val base = (id, w, h, orig)
          if (id % 9 == 0)
            Seq(base, (id + 1000000L, 2 * w, 2 * h,
              PngCodec.resize(orig, 2 * w, 2 * h).get))
          else Seq(base)
        }
      }.toDF("media_id", "width", "height", "payload")
  }

  /** Perceptual near-duplicate image pairs: dHash each payload through
    * the REAL codec, then Hamming-LSH pairing via the SAME 16-bit-chunk
    * band machinery the SimHash text near-dup uses
    * ([[Dedup.hammingPairs]]). The hash is one map-side pass per image
    * (decode cost ∝ bytes); candidates shuffle 16 bytes per image per
    * band — never pixels, never payloads. Keep rule downstream: `a` of
    * each pair is the lower (canonical) media_id. */
  def phashDedup(spark: SparkSession, media: DataFrame,
      maxHamming: Int = 6): DataFrame = {
    import spark.implicits._
    val sigs = media.filter(col("payload").isNotNull)
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        PngCodec.dHash(p).map(hh => (id, hh))
      }).toDF("doc_id", "sig")
    Dedup.hammingPairs(sigs, maxHamming)
  }

  // ---- registered queries --------------------------------------------------

  /** Metadata/partition plumbing with a DuckDB oracle. PNG byte lengths
    * depend on the encoder's deflate stream, so the byte-sum column covers
    * the sha-payload kinds only (NULL for the image group on both
    * engines); pixels/frames come from metadata and oracle exactly. */
  private def mmMetadata(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .groupBy("kind", "format")
      .agg(count(lit(1)).as("n"),
        sum(when(col("kind") =!= "image", length(col("payload")))).as("sha_bytes"),
        sum(col("width").cast(LongType) * col("height")).as("total_pixels"),
        sum("n_frames").as("total_frames"))
      .orderBy("kind", "format")

  private val mmMetadataSql =
    """SELECT kind, format, COUNT(*) AS n,
      | CAST(SUM(CASE WHEN kind <> 'image' THEN OCTET_LENGTH(payload) END) AS BIGINT) AS sha_bytes,
      | CAST(SUM(CAST(width AS BIGINT) * height) AS BIGINT) AS total_pixels,
      | CAST(SUM(n_frames) AS BIGINT) AS total_frames
      |FROM (
      | SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
      |  CASE WHEN doc_id % 3 = 0 THEN 'png' WHEN doc_id % 3 = 1 THEN 'wav' ELSE 'mp4' END AS format,
      |  CAST(CASE WHEN doc_id % 3 = 0 THEN doc_id % 8 + 8 ELSE doc_id % 4 * 160 + 320 END AS INT) AS width,
      |  CAST(CASE WHEN doc_id % 3 = 0 THEN doc_id % 4 + 4 ELSE doc_id % 4 * 90 + 180 END AS INT) AS height,
      |  CAST(doc_id % 24 + 1 AS INT) AS n_frames,
      |  CASE WHEN doc_id % 3 <> 0 THEN FROM_HEX(SHA256(text)) END AS payload
      | FROM documents)
      |GROUP BY kind, format ORDER BY kind, format""".stripMargin

  /** Feature extraction: REAL ImageIO decode for images, stub for
    * audio/video. Per-row feature mass is a whole number (image: pixel
    * sum + dims + min/max; audio/video: Σ payload bytes), summed as LONG
    * so the total is exact at any scale. The oracle re-derives the image
    * mass from the pixel-generator formula and the audio/video mass from
    * the sha256 hex digest — neither path sees Spark's bytes. */
  private def mmFeatures(spark: SparkSession, dir: String): DataFrame = {
    val feats = extractFeatures(spark, mediaTable(spark, dir))
    feats.toDF()
      .groupBy("kind")
      .agg(count(lit(1)).as("n"),
        sum(when(col("kind") =!= "image", col("n_bytes"))).as("sha_bytes"),
        sum(aggregate(col("feature"), lit(0L),
          (acc, x) => acc + x.cast(LongType))).as("sum_feature_mass"))
      .orderBy("kind")
  }

  private val mmFeaturesSql =
    """SELECT kind, COUNT(*) AS n,
      | CAST(SUM(CASE WHEN kind <> 'image' THEN OCTET_LENGTH(FROM_HEX(h)) END) AS BIGINT) AS sha_bytes,
      | CAST(SUM(mass) AS BIGINT) AS sum_feature_mass
      |FROM (
      | SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
      |             WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
      |        SHA256(text) AS h,
      |        CAST(CASE WHEN doc_id % 3 = 0 THEN
      |          LIST_SUM(px) + (8 + doc_id % 8) + (4 + doc_id % 4)
      |            + LIST_MIN(px) + LIST_MAX(px)
      |        ELSE
      |          LIST_SUM(LIST_TRANSFORM(RANGE(0, 32),
      |            i -> CAST(('0x' || SUBSTR(SHA256(text), 2*i + 1, 2)) AS BIGINT)))
      |        END AS BIGINT) AS mass
      | FROM (
      |  SELECT doc_id, text,
      |   LIST_TRANSFORM(RANGE(0, (8 + doc_id % 8) * (4 + doc_id % 4)),
      |     i -> (doc_id + i) % 256) AS px
      |  FROM documents
      |  WHERE doc_id % 3 = 0 OR text IS NOT NULL))
      |GROUP BY kind ORDER BY kind""".stripMargin

  /** Feature vector → per-image dims + pixel stats projection (shared by
    * the decode and resize proofs). */
  private def pixelStats(feats: DataFrame): DataFrame =
    feats.select(col("media_id"),
      element_at(col("feature"), 2).cast(IntegerType).as("w"),
      element_at(col("feature"), 3).cast(IntegerType).as("h"),
      element_at(col("feature"), 1).cast(LongType).as("pixel_sum"),
      element_at(col("feature"), 4).cast(IntegerType).as("px_min"),
      element_at(col("feature"), 5).cast(IntegerType).as("px_max"))
    .orderBy("media_id")

  /** Per-image decode proof: dims and pixel stats read back from the REAL
    * PNG bytes. The oracle never touches the payload — it recomputes the
    * same stats from the generator formula, so a row-for-row match is
    * direct evidence the ImageIO decode ran correctly on every image. */
  private def mmImageDecode(spark: SparkSession, dir: String): DataFrame =
    pixelStats(extractFeatures(spark,
      mediaTable(spark, dir).filter(col("kind") === "image")).toDF())

  private val mmImageDecodeSql =
    """SELECT media_id,
      | CAST(8 + media_id % 8 AS INT) AS w,
      | CAST(4 + media_id % 4 AS INT) AS h,
      | CAST(LIST_SUM(px) AS BIGINT) AS pixel_sum,
      | CAST(LIST_MIN(px) AS INT) AS px_min,
      | CAST(LIST_MAX(px) AS INT) AS px_max
      |FROM (
      | SELECT doc_id AS media_id,
      |  LIST_TRANSFORM(RANGE(0, (8 + doc_id % 8) * (4 + doc_id % 4)),
      |    i -> (doc_id + i) % 256) AS px
      | FROM documents WHERE doc_id % 3 = 0)
      |ORDER BY media_id""".stripMargin

  /** Resize proof: decode → nearest-neighbor sample → re-encode → decode
    * again, all through the REAL PNG codec; the oracle re-derives every
    * resized pixel from the generator formula and the integer-grid mapping
    * sx = x*sw/W, sy = y*sh/H (floor) — a match proves the whole resize
    * pipeline bit-exactly, not just that dims changed. */
  private def mmResize(spark: SparkSession, dir: String): DataFrame =
    pixelStats(extractFeatures(spark,
      resize(spark, mediaTable(spark, dir).filter(col("kind") === "image"),
        4, 3)).toDF())

  private val mmResizeSql =
    """SELECT media_id,
      | CAST(4 AS INT) AS w,
      | CAST(3 AS INT) AS h,
      | CAST(LIST_SUM(px) AS BIGINT) AS pixel_sum,
      | CAST(LIST_MIN(px) AS INT) AS px_min,
      | CAST(LIST_MAX(px) AS INT) AS px_max
      |FROM (
      | SELECT doc_id AS media_id,
      |  LIST_TRANSFORM(RANGE(0, 12), i ->
      |   (doc_id
      |    + (((i // 4) * (4 + doc_id % 4)) // 3) * (8 + doc_id % 8)
      |    + ((i % 4) * (8 + doc_id % 8)) // 4) % 256) AS px
      | FROM documents WHERE doc_id % 3 = 0)
      |ORDER BY media_id""".stripMargin

  /** Frame sampling plumbing with oracle (pure integer generate+agg). */
  private def mmFrameSample(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(mediaTable(spark, dir), 4)
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_sampled"), max("frame_idx").as("last_idx"))
      .orderBy("media_id")

  private val mmFrameSampleSql =
    """SELECT media_id, COUNT(*) AS n_sampled, MAX(frame_idx) AS last_idx
      |FROM (
      | SELECT doc_id AS media_id, UNNEST(RANGE(0, (doc_id % 24 + 1), 4)) AS frame_idx
      | FROM documents WHERE doc_id % 3 = 2)
      |GROUP BY media_id ORDER BY media_id""".stripMargin

  /** Image near-dup proof: every planted 2×-resized copy must pair with
    * its original at Hamming 0; pseudo-random distinct images stay apart.
    * The oracle re-derives each dHash from the pixel formula and the two
    * integer-grid maps (copy: 9×8 grid → 2× dims → original pixels), then
    * replays the chunk-bucket/cap/pair machinery — DuckDB never sees a
    * byte of PNG, so a match proves the real decode+resize+hash ran. */
  private def mmPhashDedup(spark: SparkSession, dir: String): DataFrame =
    phashDedup(spark, phashTable(spark, dir), maxHamming = 6)
      .orderBy("a", "b")

  private def mmPhashDedupSql: String = {
    val sigBits = (0 until 64).map { b =>
      val p1 = (b / 8) * 9 + (b % 8) + 1
      s"(CASE WHEN px[$p1] > px[${p1 + 1}] THEN ${1L << b} ELSE 0 END)::BIGINT"
    }.mkString(" | ")
    val chunkList = (0 until 4).map(j =>
      s"($j::BIGINT * 4294967296 + ((sig >> ${j * 16}) & 65535))").mkString(", ")
    s"""WITH imgs AS (
       | SELECT doc_id AS media_id, doc_id AS src, 1 AS s FROM documents
       | WHERE doc_id % 3 = 0
       | UNION ALL
       | SELECT doc_id + 1000000, doc_id, 2 FROM documents
       | WHERE doc_id % 3 = 0 AND doc_id % 9 = 0),
       |samp AS (SELECT media_id,
       |  LIST_TRANSFORM(
       |   LIST_TRANSFORM(RANGE(0, 72), g ->
       |    (((((g // 9) * s * (4 + src % 4)) // 8) // s) * (8 + src % 8)
       |     + ((((g % 9) * s * (8 + src % 8)) // 9) // s))),
       |   i -> ((src % 4096 + 1 + i + 7) * (src % 4096 + 1 + 2*i + 13))
       |          % 256) AS px
       | FROM imgs),
       |sg AS (SELECT media_id AS doc_id, ($sigBits) AS sig FROM samp),
       |ck AS (SELECT doc_id, sig, UNNEST([$chunkList]) AS bucket FROM sg),
       |caps AS (SELECT bucket FROM ck GROUP BY bucket
       |         HAVING COUNT(*) BETWEEN 2 AND ${Dedup.MaxBucket}),
       |ckc AS (SELECT ck.doc_id, ck.sig, ck.bucket FROM ck
       |        JOIN caps USING (bucket))
       |SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
       | CAST(bit_count(xor(l.sig, r.sig)) AS INT) AS hamming
       |FROM ckc l JOIN ckc r USING (bucket)
       |WHERE l.doc_id < r.doc_id AND bit_count(xor(l.sig, r.sig)) <= 6
       |ORDER BY a, b""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("mm_metadata", mmMetadata, Some(mmMetadataSql)),
    Q("mm_features", mmFeatures, Some(mmFeaturesSql)),
    Q("mm_image_decode", mmImageDecode, Some(mmImageDecodeSql)),
    Q("mm_resize", mmResize, Some(mmResizeSql)),
    Q("mm_frame_sample", mmFrameSample, Some(mmFrameSampleSql)),
    Q("mm_phash_dedup", mmPhashDedup, Some(mmPhashDedupSql)))
}
