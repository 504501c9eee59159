package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/
  * video carried as opaque `binary` columns with typed metadata, processed
  * per-partition in batches (the Scala analogue of `mapInPandas` — a typed
  * `Dataset.mapPartitions` whose iterator is the batch stream).
  *
  * The actual media decode is STUBBED (no image/audio codecs in this
  * environment): [[StubDecoder]] derives deterministic fake features from
  * the bytes. Everything *around* the stub is the real production shape —
  * schema, encoders, partition-batched iteration, size-aware
  * repartitioning — so swapping in a real decoder is a one-function
  * change.
  *
  * Scale notes: media blobs are large and skewed; [[repartitionBySize]]
  * rebalances partitions by cumulative byte size (range partition on a
  * size-bucketed key) so one partition never holds all the 4K video. The
  * decode itself is embarrassingly parallel (mapPartitions, zero shuffle).
  */
object MultimodalOps {

  /** One media item: opaque bytes + routing metadata. */
  final case class MediaRow(doc_id: Long, media_type: String,
      content: Array[Byte])

  /** Extracted features (what a real decoder would emit). */
  final case class MediaFeatures(doc_id: Long, media_type: String,
      n_bytes: Long, sha256: String, width: Int, height: Int,
      n_frames: Int)

  /** ======== STUB ========
    * Deterministic fake decode: real decoders (JPEG/PNG/ffmpeg) are not
    * available offline. Features are pure functions of the bytes so tests
    * and oracles are exact. Replace `decode` with a codec call to go live.
    */
  object StubDecoder {
    def decode(r: MediaRow): MediaFeatures = {
      val n = r.content.length.toLong
      MediaFeatures(
        doc_id = r.doc_id,
        media_type = r.media_type,
        n_bytes = n,
        sha256 = java.security.MessageDigest.getInstance("SHA-256")
          .digest(r.content).map("%02x".format(_)).mkString,
        width = (n % 640L).toInt,      // fake: a real decoder reads headers
        height = ((n / 7L) % 480L).toInt,
        n_frames = (n / 100L).toInt + 1)
    }
  }

  /** Batched per-partition feature extraction — the mapInPandas-shaped
    * seam: one iterator per partition, features emitted in bulk.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(StubDecoder.decode))
  }

  /** Frame sampling: every `stride`-th fixed-size chunk of the byte stream
    * (real byte-slicing plumbing; with a codec this is keyframe
    * extraction). Emits (doc_id, frame_no, frame bytes).
    */
  def sampleFrames(media: Dataset[MediaRow], frameSize: Int, stride: Int)
      : DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.content.grouped(frameSize).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (chunk, i) => (r.doc_id, i, chunk) }
    }.toDF("doc_id", "frame_no", "frame")
  }

  /** Resize/resample plumbing: deterministic byte-stride downsample to at
    * most `targetBytes` (stride k = ceil(n / target), keep every k-th
    * byte). With a codec this seam is image resize / audio resample: the
    * production shape — per-row narrow map, binary in/binary out, size
    * metadata carried — is real; only the kernel is the byte fake.
    */
  def resize(media: Dataset[MediaRow], targetBytes: Int): DataFrame = {
    import media.sparkSession.implicits._
    require(targetBytes > 0, "targetBytes must be positive")
    media.map { r =>
      val n = r.content.length
      val k = math.max(1, (n + targetBytes - 1) / targetBytes)
      val out = Iterator.range(0, n, k).map(r.content(_)).toArray
      (r.doc_id, r.media_type, n.toLong, out.length.toLong, out)
    }.toDF("doc_id", "media_type", "orig_bytes", "new_bytes", "content")
  }

  /** Rebalance partitions by cumulative blob size: bucket each row by its
    * size class, then range-repartition so large blobs spread evenly.
    * At 100 TB this is the difference between a straggler-free decode
    * stage and one task holding every feature-length movie.
    */
  def repartitionBySize(df: DataFrame, partitions: Int,
      contentCol: String = "content"): DataFrame =
    df.withColumn("__size_key",
        concat(length(col(contentCol)), lit(":"), col("doc_id")))
      .repartitionByRange(partitions, col("__size_key"))
      .drop("__size_key")

  /** Wrap the documents table as fake media (UTF-8 bytes of the text) —
    * fixture for the offline harness, exercising the full plumbing.
    */
  def documentsAsMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"),
      when(col("doc_id") % 3 === 0, lit("image"))
        .when(col("doc_id") % 3 === 1, lit("audio"))
        .otherwise(lit("video")).as("media_type"),
      encode(col("text"), "UTF-8").as("content")).as[MediaRow]
  }
}
