package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus a feature-extraction pass shaped
  * like a production decode pipeline.
  *
  * The actual codec step is a clearly-marked STUB (no image/audio libs
  * in this container): `stubDecode` derives deterministic pseudo
  * features from the bytes. Everything around it — the binary schema,
  * the partition-wise batched iteration (the Scala analog of
  * `mapInPandas`), the feature schema — is real and tested, so swapping
  * the stub for an actual decoder is a one-function change.
  */
object Multimodal {

  final case class MediaRecord(media_id: Long, content: Array[Byte],
      mime: String, meta_lang: String, meta_chars: Long)

  final case class MediaFeatures(media_id: Long, n_bytes: Long,
      checksum: String, n_frames: Int, frame_digest: String)

  /** Media-shaped view over `documents`: text bytes stand in for an
    * encoded payload; metadata rides along as typed columns. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    graft.Tables(spark, dir, "documents").select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("content"),
      lit("application/octet-stream").as("mime"),
      col("lang").as("meta_lang"),
      col("n_chars").as("meta_chars"))

  /** STUB decoder: deterministic fake features from raw bytes. A real
    * deployment replaces ONLY this function with e.g. a JNI image
    * decoder; the signature (bytes -> features) is the contract. */
  def stubDecode(id: Long, bytes: Array[Byte]): MediaFeatures = {
    val frameSize = 256 // "frame sample": fixed-stride chunks of the payload
    val frames = bytes.grouped(frameSize).toSeq
    val digest = java.security.MessageDigest.getInstance("MD5")
    MediaFeatures(
      media_id = id,
      n_bytes = bytes.length.toLong,
      checksum = digest.digest(bytes).map("%02x".format(_)).mkString,
      n_frames = frames.length,
      frame_digest = frames.headOption
        .map(f => java.security.MessageDigest.getInstance("MD5")
          .digest(f).map("%02x".format(_)).mkString).getOrElse(""))
  }

  /** Partition-parallel feature extraction — the Scala analog of
    * `mapInPandas`: one decoder instance per partition, records
    * streamed through it (no per-row setup cost, no driver collect). */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder setup would go here (codec contexts etc.)
        it.map { case (id, bytes) => stubDecode(id, bytes) }
      }
  }

  /** Oracle-checked query: byte-level metadata of the media table.
    * n_bytes/checksum are computable by DuckDB over the same text
    * payload, proving the binary plumbing preserves content. */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(spark, mediaTable(spark, dir)).toDF()
      .select("media_id", "n_bytes", "checksum", "n_frames")

  /** q47 — frame sampling as a pure Column pipeline (no UDF): the
    * payload splits into fixed-size frames, every `stride`-th frame
    * becomes its own row with a content digest — the video-keyframe /
    * audio-window sampling shape, on the same opaque payloads the
    * decoder stub consumes. The explode produces rows proportional to
    * payload size ÷ frameSize, each row carrying one frame, never the
    * whole payload — the memory shape that matters when a "frame" is
    * megabytes at production scale. */
  def sampleFrames(spark: SparkSession, dir: String, frameSize: Int = 256,
      stride: Int = 4): DataFrame =
    sampleFramesOf(
      graft.Tables(spark, dir, "documents")
        .select(col("doc_id").as("media_id"), col("text")),
      frameSize, stride)

  /** [[sampleFrames]] over an arbitrary `(media_id, text)` frame — the
    * unit-testable core (the parquet fixture has no empty payloads, so
    * the nf=0 guard is only exercisable through this entry). */
  def sampleFramesOf(media: DataFrame, frameSize: Int = 256,
      stride: Int = 4): DataFrame = {
    val docs = media.select(
      col("media_id"), col("text"),
      ceil(length(col("text")) / frameSize.toDouble).cast("int").as("nf"))
    docs
      // nf=0 (empty payload) must yield zero frames; without the guard
      // `sequence(0, -1)` is Spark's descending sequence [0, -1] and the
      // explode emits a spurious frame row the oracle's range(0, 0) lacks.
      .filter(col("nf") > 0)
      .select(col("media_id"), col("text"),
        explode(sequence(lit(0), col("nf") - 1)).as("frame_idx"))
      .filter(col("frame_idx") % stride === 0)
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        md5(col("text").substr(col("frame_idx") * frameSize + 1, lit(frameSize)))
          .as("frame_md5"))
  }

  /** Cross-media duplicate frames: a sampled-frame hash appearing in
    * ≥2 distinct media is shared footage — the multimodal face of
    * [[TextOps.chunkDedup]] (intros, watermark cards, re-uploads).
    * One shuffle keyed by frame hash (cardinality ∝ total frames, no
    * hot key), counts map-side combined; at 100 TB this is exactly
    * the chunk-dedup shape with a perceptual hash swapped in for md5. */
  def frameDedup(spark: SparkSession, dir: String, frameSize: Int = 256,
      stride: Int = 4): DataFrame =
    sampleFrames(spark, dir, frameSize, stride)
      .groupBy(col("frame_md5"))
      .agg(count_distinct(col("media_id")).as("n_media"),
        count(lit(1)).as("n_occ"), min(col("media_id")).as("first_media"))
      .filter(col("n_media") >= 2)
}
