package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import graft.functions.Text
import graft.operators.Dedup

/** Online near-duplicate detection — the STREAMING face of
  * [[graft.operators.Dedup.incrementalPairs]]: documents arrive on a
  * stream and each is checked against everything seen so far, with the
  * LSH band state maintained by Structured Streaming instead of a
  * persisted batch index.
  *
  * Shape: per-document MinHash signature (identical expressions to the
  * batch path, so buckets line up with a batch-built index) → explode
  * to (band, bucket) rows → `flatMapGroupsWithState` keyed by the
  * bucket. Each group's state holds the element-hash sets of its
  * members; a new arrival merge-walks against them (the same
  * sorted-intersect the batch verify uses) and emits verified pairs.
  *
  * Scale: state is per (band, bucket) — the same key the batch join
  * shuffles on, uniformly distributed by construction — and holds only
  * that bucket's doc hash-sets, so state partitions like the data and
  * no task holds the corpus. A pair can surface from several buckets;
  * emission is at-least-once per pair and [[currentPairs]] dedupes at
  * the read face (exactly how the batch path dropDuplicates after its
  * candidate join). In production the state would carry an event-time
  * timeout (docs past the dedup horizon age out); the contract here is
  * unbounded-history dedup, matching the batch oracle.
  */
object StreamingDedup {

  /** One (band, bucket) observation of a document. */
  final case class BandedDoc(band: Int, bucket: String, docId: Long, hs: Seq[Long])

  /** Bucket state: members' doc ids + sorted-distinct element hashes. */
  final case class BucketMembers(docs: Seq[BandedDoc])

  final case class DupPair(doc_a: Long, doc_b: Long, jaccard: Double)

  /** Sorted-long merge-walk intersection cardinality — the Scala twin
    * of [[graft.functions.SetCard.sortedIntersectCard]] for use inside
    * the state function. */
  private[graft] def intersectCard(a: Seq[Long], b: Seq[Long]): Int = {
    var i = 0; var j = 0; var n = 0
    while (i < a.length && j < b.length) {
      val c = java.lang.Long.compare(a(i), b(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  private[graft] def jaccard(a: Seq[Long], b: Seq[Long]): Double = {
    val inter = intersectCard(a, b).toDouble
    val j = inter / (a.length + b.length - inter)
    BigDecimal(j).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** The per-bucket state transition: verify each arrival against the
    * members already in the bucket (and earlier arrivals of the same
    * batch), emit pairs ≥ threshold, append to state. The size-ratio
    * prefilter mirrors the batch join's `sizeRatioOk`. */
  private def dedupeBucket(threshold: Double)(
      key: (Int, String), docs: Iterator[BandedDoc],
      state: GroupState[BucketMembers]): Iterator[DupPair] = {
    var members = state.getOption.map(_.docs).getOrElse(Seq.empty)
    val out = Seq.newBuilder[DupPair]
    docs.foreach { d =>
      if (!members.exists(_.docId == d.docId)) { // replayed batch: idempotent
        members.foreach { m =>
          val (small, big) = if (d.hs.length < m.hs.length) (d.hs, m.hs) else (m.hs, d.hs)
          // rounded-down threshold: jaccard() below rounds HALF_UP to 4
          // decimals before the >= compare, so raw J slightly under the
          // threshold can still pass — the prefilter must not drop it
          if (small.length >= (threshold - Dedup.RoundSlack) * big.length) {
            val j = jaccard(d.hs, m.hs)
            if (j >= threshold)
              out += DupPair(math.min(d.docId, m.docId), math.max(d.docId, m.docId), j)
          }
        }
        members = members :+ d
      }
    }
    state.update(BucketMembers(members))
    out.result().iterator
  }

  /** Banded per-document rows from a (doc_id, text) frame — batch or
    * streaming — with the exact banding expressions of the batch path. */
  def bandedDocs(docs: DataFrame, k: Int = 3): DataFrame = {
    val hashed = docs.select(col("doc_id"),
      Dedup.elementHashes(array_distinct(Text.shingles(col("text"), k))).as("hs"))
    val sigs = hashed.select(col("doc_id"), col("hs"),
      Dedup.minhashFromHashes(col("hs")).as("mh"))
    Dedup.explodeBands(sigs, carry = Seq("hs"))
  }

  /** Wire the stateful dedup over banded rows; exposed for batch-mode
    * unit tests of the state function via the same code path. */
  def pairStream(banded: DataFrame, threshold: Double): Dataset[DupPair] = {
    val spark = banded.sparkSession
    import spark.implicits._
    banded
      .select(col("band"), col("bucket"), col("doc_id"), col("hs"))
      .as[(Int, String, Long, Seq[Long])]
      .map { case (band, bucket, id, hs) => BandedDoc(band, bucket, id, hs) }
      .groupByKey(d => (d.band, d.bucket))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        dedupeBucket(threshold))
  }

  /** Start online dedup over a JSONL document stream (`doc_id`, `text`)
    * into a parquet pair log at `outDir` — a FILE sink, so the query
    * restarts from its checkpoint (the memory sink cannot recover) and
    * emissions are exactly-once through the sink's `_spark_metadata`
    * commit log. Read results through [[currentPairs]]. */
  def start(spark: SparkSession, sourceDir: String, outDir: String,
      checkpoint: String, threshold: Double = 0.8,
      availableNow: Boolean = true): StreamingQuery = {
    val schema = "doc_id LONG, text STRING"
    val stream = spark.readStream.schema(schema).json(sourceDir)
    pairStream(bandedDocs(stream), threshold)
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(if (availableNow) Trigger.AvailableNow() else Trigger.ProcessingTime("1 second"))
      .start()
  }

  /** Read face over the pair log: emissions are at-least-once per PAIR
    * (one per agreeing band); the distinct is the read-side analogue of
    * the batch path's post-candidate dropDuplicates. */
  def currentPairs(spark: SparkSession, outDir: String): DataFrame =
    spark.read.schema("doc_a LONG, doc_b LONG, jaccard DOUBLE").parquet(outDir)
      .dropDuplicates("doc_a", "doc_b")
}
