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

  /** PERCEPTUAL FRAME SIGNATURES — each sampled frame reduced to its
    * [[graft.functions.DHash60 dhash60]] gradient signature plus the
    * Hamming distance to the previous sampled frame of the same
    * medium (`delta_bits`, NULL on the first frame — no predecessor,
    * no evidence). This is the signature table every perceptual
    * consumer reads: [[sceneChangesOf]] thresholds `delta_bits` for
    * shot boundaries, [[frameDedup]] groups on `frame_dhash` for
    * cross-media near-dup footage. Near-identical payloads land
    * within a few bits (usually 0 — small edits rarely cross a
    * cell-sum comparison); unrelated payloads sit near the 30/60-bit
    * random expectation.
    *
    * Scale: row-per-frame explode (never whole-payload rows), the
    * signature kernel is one codegen'd primitive loop per row, and
    * the lag window partitions by medium — payload-bounded
    * partitions, shuffled once on media_id. */
  def frameSignatures(spark: SparkSession, dir: String,
      frameSize: Int = 256, stride: Int = 4): DataFrame =
    frameSignaturesOf(
      graft.Tables(spark, dir, "documents")
        .select(col("doc_id").as("media_id"), col("text")),
      frameSize, stride)

  /** [[frameSignatures]] over an arbitrary `(media_id, text)` frame —
    * the unit-testable core (the [[sampleFramesOf]] convention). */
  def frameSignaturesOf(media: DataFrame, frameSize: Int = 256,
      stride: Int = 4): DataFrame = {
    val docs = media.select(
      col("media_id"), col("text"),
      ceil(length(col("text")) / frameSize.toDouble).cast("int").as("nf"))
    val byFrame = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("frame_idx"))
    docs
      .filter(col("nf") > 0) // the sampleFramesOf nf=0 guard
      .select(col("media_id"), col("text"),
        explode(sequence(lit(0), col("nf") - 1)).as("frame_idx"))
      .filter(col("frame_idx") % stride === 0)
      // project the slice first, hash second: a Generate under a
      // fused projection re-runs the kernel per exploded row (the
      // q79 lesson) — here the explode is already separated, but the
      // two-step select keeps the kernel out of the Generate anyway
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        graft.functions.DHash.dhash60(
          col("text").substr(col("frame_idx") * frameSize + 1,
            lit(frameSize))).as("frame_dhash"))
      .withColumn("delta_bits",
        bit_count(col("frame_dhash")
          .bitwiseXOR(lag(col("frame_dhash"), 1).over(byFrame)))
          .cast("long"))
  }

  /** SCENE SEGMENTATION over the sampled frame stream — the TEMPORAL
    * structure face the per-frame ops miss: [[frameDedup]] asks "is
    * this frame shared ACROSS media", this asks "where does the
    * content CHANGE within one medium" (shot boundaries, silence/
    * speech transitions, chapter cards). Each frame carries its
    * [[frameSignaturesOf dhash60]] perceptual signature, and a scene
    * boundary is any consecutive pair whose signatures disagree in
    * more than `tauBits` of 60 gradient bits — small in-scene motion
    * (a few flipped comparisons) survives, a content change (~30-bit
    * random distance) cuts. Per medium: frames sampled, scene count,
    * longest scene run (in frames), and boundary density in micro
    * (boundaries per consecutive pair — 10⁶ = every frame a cut,
    * 0 = one still shot).
    *
    * Scale: the explode is row-per-frame (never whole-payload rows),
    * the lag window partitions BY MEDIUM (payload-bounded partitions,
    * shuffled once on media_id), and the rollup is media-sized. The
    * scene-run length re-uses the gap-sessionization prefix-sum
    * idiom (q60) on the frame axis. */
  def sceneChanges(spark: SparkSession, dir: String, frameSize: Int = 256,
      stride: Int = 1, tauBits: Int = 16): DataFrame =
    sceneChangesOf(
      graft.Tables(spark, dir, "documents")
        .select(col("doc_id").as("media_id"), col("text")),
      frameSize, stride, tauBits)

  /** [[sceneChanges]] over an arbitrary `(media_id, text)` frame —
    * the unit-testable core (the [[sampleFramesOf]] convention). */
  def sceneChangesOf(media: DataFrame, frameSize: Int = 256,
      stride: Int = 1, tauBits: Int = 16): DataFrame =
    sceneRunsOf(media, frameSize, stride, tauBits)
      .groupBy(col("media_id"))
      .agg(sum(col("run_len")).as("n_frames"),
        count(lit(1)).as("n_scenes"),
        max(col("run_len")).as("longest_scene"))
      .select(col("media_id"), col("n_frames"), col("n_scenes"),
        col("longest_scene"),
        // boundaries = scenes − 1 over n_frames − 1 pairs; one-frame
        // media have no pairs and read NULL, not 0 — no cut evidence
        when(col("n_frames") > 1,
          expr("(n_scenes - 1) * 1000000 div (n_frames - 1)"))
          .as("cut_density_micro"))
      .orderBy(col("media_id").asc)

  /** One (media_id, scene_seq, run_len) row per scene — the cut +
    * prefix-sum run derivation shared by [[sceneChangesOf]] and
    * [[sceneLengths]]. */
  private def sceneRunsOf(media: DataFrame, frameSize: Int,
      stride: Int, tauBits: Int): DataFrame = {
    val byFrame = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("frame_idx"))
    frameSignaturesOf(media, frameSize, stride)
      .withColumn("cut",
        when(col("delta_bits").isNull ||
          col("delta_bits") > tauBits, 1L)
          .otherwise(0L))
      .withColumn("scene_seq",
        sum(col("cut")).over(byFrame.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("media_id"), col("scene_seq"))
      .agg(count(lit(1)).as("run_len"))
  }

  /** SCENE-LENGTH DISTRIBUTION per source — the corpus-level readout
    * over [[sceneChanges]]' per-medium runs: how long does content
    * HOLD before it changes, per source (an encoder's chunking and a
    * sampler's stride are tuned against exactly this curve). House
    * ceil-rank percentiles over (run_len, media, scene) — exact,
    * tie-stable cross-engine — plus the max run.
    *
    * Scale: the runs frame is scenes-sized (≤ frames); the rank
    * window partitions by source. */
  def sceneLengths(spark: SparkSession, dir: String, frameSize: Int = 256,
      stride: Int = 1, tauBits: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.Tables(spark, dir, "documents")
    val runs = sceneRunsOf(
        docs.select(col("doc_id").as("media_id"), col("text")),
        frameSize, stride, tauBits)
      .join(docs.select(col("doc_id").as("media_id"), col("source")),
        Seq("media_id"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("run_len").asc, col("media_id").asc, col("scene_seq").asc)
    runs
      .withColumn("rn", row_number().over(w))
      .withColumn("n",
        count(lit(1)).over(Window.partitionBy(col("source"))))
      .groupBy(col("source"))
      .agg(max(col("n")).as("n_scenes"),
        max(when(col("rn") === expr("(50 * n + 99) div 100"),
          col("run_len"))).as("p50_len"),
        max(when(col("rn") === expr("(90 * n + 99) div 100"),
          col("run_len"))).as("p90_len"),
        max(col("run_len")).as("max_len"))
      .orderBy(col("source").asc)
  }

  /** Cross-media duplicate frames: a sampled-frame PERCEPTUAL
    * signature ([[frameSignatures dhash60]]) appearing in ≥2 distinct
    * media is shared footage — the multimodal face of
    * [[TextOps.chunkDedup]] (intros, watermark cards, re-uploads),
    * upgraded from byte-exact md5 to the gradient hash: re-encoded or
    * lightly-retouched frames whose edits don't cross a cell-sum
    * comparison collapse into one group, which md5 could never see.
    * One shuffle keyed by signature (cardinality ∝ total frames, no
    * hot key), counts map-side combined — the exact chunk-dedup shape
    * at 100 TB, now with the production hash in place. */
  def frameDedup(spark: SparkSession, dir: String, frameSize: Int = 256,
      stride: Int = 4): DataFrame =
    frameSignatures(spark, dir, frameSize, stride)
      .groupBy(col("frame_dhash"))
      .agg(count_distinct(col("media_id")).as("n_media"),
        count(lit(1)).as("n_occ"), min(col("media_id")).as("first_media"))
      .filter(col("n_media") >= 2)
}
