package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal + semi-structured column operators for a training-data
  * pipeline. Media bytes are opaque `binary` columns with typed
  * metadata (the standard lakehouse layout for image/audio/video at
  * 100 TB: parquet binary + struct metadata, partitioned by source).
  *
  * The image/audio codecs are NOT in this environment, so the decode
  * step is a DETERMINISTIC FAKE (clearly marked): byte-level hashing
  * over the hex representation stands in for pixel decoding. The
  * Spark-side plumbing — binary column synthesis, metadata struct,
  * per-frame sampling explode, per-row feature extraction, JSON
  * parsing — is real and oracle-checked.
  */
object MultimodalOps {

  val NumFrames = 4

  /** The synthesized media column: documents.text encoded as bytes
    * stands in for an image payload (real pipelines read these bytes
    * from object storage; the schema/plumbing is identical). */
  private def binCol = encode(col("text"), "UTF-8")

  // ------------------------------------------------------ image meta
  /** Typed metadata + content hash for each media object: byte
    * length, deterministic width/height/format (the shape a real
    * decoder's header probe returns), and a content hash for
    * dedup/caching — all per-row, shuffle-free. */
  def mmImageMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, sfDir, "documents")
      .select(
        $"doc_id",
        length(binCol).cast("long").as("n_bytes"),
        (lit(64) + pmod($"doc_id", lit(10)).cast("int") * 32).as("width"),
        (lit(64) + pmod($"doc_id", lit(7)).cast("int") * 32).as("height"),
        element_at(array(lit("png"), lit("jpg"), lit("webp")),
          pmod($"doc_id", lit(3)).cast("int") + 1).as("format"),
        md5(hex(binCol)).as("content_hash"))
      .orderBy($"doc_id")
  }

  val mmImageMetaSql: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(64 + (doc_id % 10) * 32 AS INT) AS width,
      |  CAST(64 + (doc_id % 7) * 32 AS INT) AS height,
      |  (['png', 'jpg', 'webp'])[CAST(doc_id % 3 AS INT) + 1] AS format,
      |  md5(hex(encode(text))) AS content_hash
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------ frame sample
  /** Frame sampling: take `NumFrames` evenly-spaced 16-byte windows
    * of the payload (a video pipeline's keyframe sampling shape) and
    * "decode" each to features — DETERMINISTIC FAKE decode: md5 of
    * the window's hex plus a fake brightness in [0,1). The explode is
    * the real distributed pattern: one row per (object, frame). */
  def mmFrameSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val hexStr = hex(binCol)
    Tables.load(spark, sfDir, "documents")
      .select($"doc_id", hexStr.as("payload_hex"),
        length(binCol).cast("long").as("n_bytes"))
      .select($"doc_id", $"n_bytes",
        explode(sequence(lit(0), lit(NumFrames - 1))).as("frame_no"),
        $"payload_hex")
      // byte stride between frames; hex has 2 chars per byte
      .withColumn("stride",
        greatest(lit(16L), floor($"n_bytes" / NumFrames).cast("long")))
      .withColumn("frame_hex",
        substring(col("payload_hex"),
          (col("frame_no") * col("stride") * 2 + 1).cast("int"), lit(32)))
      .filter(length($"frame_hex") > 0)
      .select($"doc_id", $"frame_no".cast("long").as("frame_no"),
        md5($"frame_hex").as("frame_hash"),
        ((conv(substring(md5($"frame_hex"), 1, 4), 16, 10).cast("long") % 256)
          .cast("double") / 256.0).as("fake_brightness"))
      .orderBy($"doc_id", $"frame_no")
  }

  val mmFrameSampleSql: String =
    s"""WITH base AS (
       |  SELECT doc_id, hex(encode(text)) AS payload_hex,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
       |  FROM documents
       |), frames AS (
       |  SELECT doc_id, n_bytes, unnest(range($NumFrames)) AS frame_no, payload_hex
       |  FROM base
       |), cut AS (
       |  SELECT doc_id, frame_no,
       |    substring(payload_hex,
       |      CAST(frame_no * greatest(16, n_bytes // $NumFrames) * 2 + 1 AS INT), 32) AS frame_hex
       |  FROM frames
       |)
       |SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no,
       |  md5(frame_hex) AS frame_hash,
       |  (CAST(CAST(('0x' || substring(md5(frame_hex), 1, 4)) AS BIGINT) % 256 AS DOUBLE) / 256.0) AS fake_brightness
       |FROM cut WHERE length(frame_hex) > 0
       |ORDER BY doc_id, frame_no""".stripMargin

  // -------------------------------------------------- resize + features
  /** Resize + feature extraction — the remaining two stages of the
    * decode / extract / resize / sample quartet: every image is
    * normalized to a fixed 32×32 target (the real pipeline's bilinear
    * resize before a vision encoder) and reduced to a
    * [[FeatureCells]]-dim feature vector. DETERMINISTIC FAKE decode
    * like the other media ops: cell k's value is a hash of
    * (payload, k) in [0,1) — standing in for the average-pooled pixel
    * block a real resize produces. One row per (doc, cell), scalar
    * features (the flat layout that joins/aggregates cleanly at
    * 100 TB and avoids engine-specific array encodings); per-row
    * compute then explode — no shuffle until the presentation sort. */
  val FeatureCells = 8

  def mmImageFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, sfDir, "documents")
      .select($"doc_id", hex(binCol).as("px"))
      .select($"doc_id",
        explode(sequence(lit(0L), lit(FeatureCells - 1L))).as("cell"), $"px")
      .select($"doc_id",
        lit(32).as("resized_w"), lit(32).as("resized_h"), $"cell",
        ((conv(substring(md5(concat($"px", lit("-"), $"cell".cast("string"))), 1, 4), 16, 10)
          .cast("long") % 1000L).cast("double") / 1000.0).as("feature"))
      .orderBy($"doc_id", $"cell")
  }

  val mmImageFeaturesSql: String =
    s"""SELECT doc_id, CAST(32 AS INT) AS resized_w, CAST(32 AS INT) AS resized_h,
       |  CAST(k AS BIGINT) AS cell,
       |  (CAST(CAST(('0x' || substring(md5(hex(encode(text)) || '-' || CAST(k AS VARCHAR)), 1, 4)) AS BIGINT) % 1000 AS DOUBLE) / 1000.0) AS feature
       |FROM documents, (SELECT unnest(range($FeatureCells)) AS k)
       |ORDER BY doc_id, cell""".stripMargin

  // ------------------------------------------------------ audio segments
  /** Audio segmentation: split each payload into per-doc VARIABLE
    * length segments (segment size derived from the object's fake
    * "sample rate" metadata — the shape of real audio windowing,
    * where segment count depends on duration), then "decode" each
    * segment to features. DETERMINISTIC FAKE decode like the image
    * path: md5 of the byte window plus a hash-derived energy in
    * [0,1). The data-dependent `sequence` explode is the real
    * distributed pattern — contrast the fixed-NumFrames video
    * sampler. Everything is per-row then explode; no shuffle until
    * the final presentation sort. */
  def mmAudioSegments(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, sfDir, "documents")
      .select($"doc_id", hex(binCol).as("payload_hex"),
        length(binCol).cast("long").as("n_bytes"),
        // fake per-object segment size (stands in for rate × width)
        (lit(64L) + pmod($"doc_id", lit(3)).cast("long") * 32L).as("seg_bytes"))
      .withColumn("n_segments",
        expr("(n_bytes + seg_bytes - 1) div seg_bytes"))
      .select($"doc_id", $"seg_bytes", $"n_segments",
        explode(sequence(lit(0L), $"n_segments" - 1L)).as("seg_no"),
        $"payload_hex")
      .select($"doc_id", $"seg_no", $"n_segments",
        md5(expr("substring(payload_hex, CAST(seg_no * seg_bytes * 2 + 1 AS INT), CAST(seg_bytes * 2 AS INT))"))
          .as("seg_hash"))
      .withColumn("fake_energy",
        (conv(substring($"seg_hash", 1, 4), 16, 10).cast("long") % 256)
          .cast("double") / 256.0)
      .orderBy($"doc_id", $"seg_no")
  }

  val mmAudioSegmentsSql: String =
    """WITH base AS (
      |  SELECT doc_id, hex(encode(text)) AS payload_hex,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |    CAST(64 + (doc_id % 3) * 32 AS BIGINT) AS seg_bytes
      |  FROM documents
      |), segs AS (
      |  SELECT doc_id, seg_bytes,
      |    (n_bytes + seg_bytes - 1) // seg_bytes AS n_segments, payload_hex
      |  FROM base
      |), cut AS (
      |  SELECT doc_id, unnest(range(n_segments)) AS seg_no, n_segments,
      |    seg_bytes, payload_hex
      |  FROM segs
      |)
      |SELECT doc_id, seg_no, n_segments,
      |  md5(substring(payload_hex, CAST(seg_no * seg_bytes * 2 + 1 AS INT),
      |    CAST(seg_bytes * 2 AS INT))) AS seg_hash,
      |  (CAST(CAST(('0x' || substring(md5(substring(payload_hex,
      |    CAST(seg_no * seg_bytes * 2 + 1 AS INT), CAST(seg_bytes * 2 AS INT))), 1, 4)) AS BIGINT) % 256 AS DOUBLE) / 256.0) AS fake_energy
      |FROM cut ORDER BY doc_id, seg_no""".stripMargin

  // ------------------------------------------------------ JSON props
  /** Semi-structured column: parse events.props with a DECLARED
    * schema (`from_json` — schema-on-read with explicit contract, not
    * inference) and aggregate over the extracted field. */
  def propsJsonExtract(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, sfDir, "events")
      .withColumn("p", from_json($"props",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType)))))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        sum($"p.k").as("sum_k"),
        min($"p.k").as("min_k"),
        max($"p.k").as("max_k"))
      .orderBy($"event_type")
  }

  val propsJsonExtractSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k
      |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_image_meta" -> (mmImageMeta _),
    "mm_frame_sample" -> (mmFrameSample _),
    "mm_image_features" -> (mmImageFeatures _),
    "mm_audio_segments" -> (mmAudioSegments _),
    "props_json_extract" -> (propsJsonExtract _))

  val oracles: Map[String, String] = Map(
    "mm_image_meta" -> mmImageMetaSql,
    "mm_frame_sample" -> mmFrameSampleSql,
    "mm_image_features" -> mmImageFeaturesSql,
    "mm_audio_segments" -> mmAudioSegmentsSql,
    "props_json_extract" -> propsJsonExtractSql)
}
