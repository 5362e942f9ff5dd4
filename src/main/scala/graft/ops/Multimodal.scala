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
  * deterministic batch shapes — while the actual image/audio codec is a
  * STUB (`FakeCodec`): this container has no media libraries, so decode
  * produces deterministic fake features from the payload bytes. Swapping in
  * a real codec changes one function, none of the plumbing.
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

  /** STUB codec: a real implementation would decode image/audio bytes.
    * Here: deterministic 8-dim "features" from payload bytes — the
    * contract (bytes in, fixed-width float vector out) is the real one.
    * Slots accumulate RAW byte values (whole numbers, exact in float up
    * to 2^24 — far above any payload here), so every downstream sum is
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

  /** STUB resize: a real implementation decodes, scales, re-encodes. The
    * deterministic fake derives output bytes from (payload, target dims) so
    * the pipeline shape — new payload + updated metadata — is real. */
  def resize(spark: SparkSession, media: DataFrame,
      newW: Int, newH: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        val scale = math.max(1, (m.width.toLong * m.height) / (newW.toLong * newH)).toInt
        val out = new Array[Byte](math.max(1, m.payload.length / scale))
        var i = 0
        while (i < out.length) { out(i) = m.payload(i % m.payload.length); i += 1 }
        m.copy(width = newW, height = newH, payload = out)
      }
    }.toDF()
  }

  /** Synthesize a deterministic media table from `documents`: payload =
    * sha256 bytes of the text (opaque, fixed 32 bytes), metadata derived
    * from doc_id. Stands in for a real parquet-with-binary source. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents").select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
      when(col("doc_id") % 3 === 0, "png")
        .when(col("doc_id") % 3 === 1, "wav").otherwise("mp4").as("format"),
      (col("doc_id") % 4 * 160 + 320).cast(IntegerType).as("width"),
      (col("doc_id") % 4 * 90 + 180).cast(IntegerType).as("height"),
      (col("doc_id") % 24 + 1).cast(IntegerType).as("n_frames"),
      to_binary(sha2(col("text"), 256), lit("hex")).as("payload"))

  /** Decode/feature-extract via typed mapPartitions — batch-shaped like
    * mapInPandas: one iterator per partition, no per-row driver calls.
    * Rows with a null payload (undecodable media) are skipped — the same
    * rows a SQL aggregate would skip as NULLs. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.filter(col("payload").isNotNull).as[MediaRow].mapPartitions { it =>
      it.map { m =>
        MediaFeatures(m.media_id, m.kind, m.payload.length,
          FakeCodec.decode(m.payload))
      }
    }
  }

  /** Frame sampling for "video" rows: every `step`-th frame index, as a
    * lazy generated column (sequence+explode — no driver loop). */
  def sampleFrames(media: DataFrame, step: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(step))).as("frame_idx"))

  // ---- registered queries --------------------------------------------------

  /** Metadata/partition plumbing with a DuckDB oracle: the payload is
    * reproducible SQL (sha256 of text), so even the binary length path is
    * hash-checked cross-engine. */
  private def mmMetadata(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .groupBy("kind", "format")
      .agg(count(lit(1)).as("n"),
        sum(length(col("payload"))).as("total_bytes"),
        sum(col("width").cast(LongType) * col("height")).as("total_pixels"),
        sum("n_frames").as("total_frames"))
      .orderBy("kind", "format")

  private val mmMetadataSql =
    """SELECT kind, format, COUNT(*) AS n,
      | CAST(SUM(OCTET_LENGTH(payload)) AS BIGINT) AS total_bytes,
      | CAST(SUM(CAST(width AS BIGINT) * height) AS BIGINT) AS total_pixels,
      | CAST(SUM(n_frames) AS BIGINT) AS total_frames
      |FROM (
      | SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
      |  CASE WHEN doc_id % 3 = 0 THEN 'png' WHEN doc_id % 3 = 1 THEN 'wav' ELSE 'mp4' END AS format,
      |  CAST(doc_id % 4 * 160 + 320 AS INT) AS width,
      |  CAST(doc_id % 4 * 90 + 180 AS INT) AS height,
      |  CAST(doc_id % 24 + 1 AS INT) AS n_frames,
      |  FROM_HEX(SHA256(text)) AS payload
      | FROM documents)
      |GROUP BY kind, format ORDER BY kind, format""".stripMargin

  /** Feature extraction through the stubbed codec. The fake features are
    * integer byte accumulations, so the per-kind mass is an exact sum the
    * oracle reproduces from the sha256 hex digest (Σ slots = Σ payload
    * bytes); exact per-slot values are asserted in ScalaTest. */
  private def mmFeatures(spark: SparkSession, dir: String): DataFrame = {
    val feats = extractFeatures(spark, mediaTable(spark, dir))
    feats.toDF()
      .groupBy("kind")
      .agg(count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(aggregate(col("feature"), lit(0.0),
          (acc, x) => acc + x.cast(DoubleType))).as("sum_feature_mass"))
      .orderBy("kind")
  }

  /** The payload is FROM_HEX(SHA256(text)); its byte values are read back
    * out of the hex string two digits at a time. */
  private val mmFeaturesSql =
    """SELECT kind, COUNT(*) AS n,
      | CAST(SUM(OCTET_LENGTH(FROM_HEX(h))) AS BIGINT) AS total_bytes,
      | CAST(SUM(LIST_SUM(LIST_TRANSFORM(RANGE(0, 32),
      |   i -> CAST(('0x' || SUBSTR(h, 2*i + 1, 2)) AS BIGINT)))) AS DOUBLE)
      |   AS sum_feature_mass
      |FROM (
      | SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
      |             WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
      |        SHA256(text) AS h
      | FROM documents WHERE text IS NOT NULL)
      |GROUP BY kind ORDER BY kind""".stripMargin

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

  val all: Seq[Q] = Seq(
    Q("mm_metadata", mmMetadata, Some(mmMetadataSql)),
    Q("mm_features", mmFeatures, Some(mmFeaturesSql)),
    Q("mm_frame_sample", mmFrameSample, Some(mmFrameSampleSql)))
}
