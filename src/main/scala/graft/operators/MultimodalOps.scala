package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/
  * video carried as opaque `binary` columns with typed metadata, processed
  * per-partition in batches (the Scala analogue of `mapInPandas` — a typed
  * `Dataset.mapPartitions` whose iterator is the batch stream).
  *
  * Container HEADERS are parsed for real at byte offsets ([[MediaHeaders]]:
  * PNG IHDR, JPEG SOF0, WAV fmt) — no codec library needed for
  * width/height/sample-rate. Only the pixel/sample decode is STUBBED (no
  * image/audio codecs in this environment): [[StubDecoder.decode]]'s
  * `n_frames` for raw video payloads is a deterministic stand-in.
  * Everything else — schema, encoders, partition-batched iteration,
  * size-aware repartitioning — is the real production shape, so swapping
  * in a real codec is a one-function change.
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

  /** Extracted features. Container-level fields (width/height for
    * PNG/JPEG, channels/sample-rate for WAV) come from REAL byte-offset
    * header parsing ([[MediaHeaders]]); `payload_sha256` hashes the bytes
    * after the recognized header (0 for unrecognized blobs, so the whole
    * content). Zero means "not this modality / no header recognized".
    */
  final case class MediaFeatures(doc_id: Long, media_type: String,
      n_bytes: Long, payload_sha256: String, width: Int, height: Int,
      sample_rate: Int, channels: Int, n_frames: Int)

  /** Header fields are parsed for real; ONLY the pixel/sample decode
    * (`n_frames` for headerless video payloads) remains the deterministic
    * stand-in — actual frame decoding needs a codec library this
    * environment doesn't ship. Swapping it in is this one function.
    */
  object StubDecoder {
    def decode(r: MediaRow): MediaFeatures = {
      val b = r.content
      val img = MediaHeaders.png(b).orElse(MediaHeaders.jpeg(b))
      val aud = if (img.isEmpty) MediaHeaders.wav(b) else None
      val headerLen = img.map(_._3).orElse(aud.map(_._3)).getOrElse(0)
      val payload =
        if (headerLen == 0) b
        else java.util.Arrays.copyOfRange(b, headerLen, b.length)
      MediaFeatures(
        doc_id = r.doc_id,
        media_type = r.media_type,
        n_bytes = b.length.toLong,
        payload_sha256 = java.security.MessageDigest.getInstance("SHA-256")
          .digest(payload).map("%02x".format(_)).mkString,
        width = img.map(_._1).getOrElse(0),
        height = img.map(_._2).getOrElse(0),
        channels = aud.map(_._1).getOrElse(0),
        sample_rate = aud.map(_._2).getOrElse(0),
        // ======== STUB ======== a real codec would count decoded frames;
        // images are single-frame, audio has none, video is the fake
        n_frames =
          if (img.isDefined) 1
          else if (aud.isDefined) 0
          else (payload.length / 100) + 1)
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

  /** Rebalance partitions by cumulative blob BYTES, not row counts: each
    * input partition deals its rows onto `partitions` buckets with an
    * online least-loaded greedy over running byte totals (start offset
    * rotated by the input partition id so co-arriving large blobs from
    * different inputs don't all open on bucket 0), and bucket i maps to
    * output partition i EXACTLY via a direct partitioner — hashing the
    * bucket id would fold several buckets together and re-skew. Every
    * output partition receives one ≈byte-equal share from every input
    * partition, so a handful of feature-length movies can never pile onto
    * one decode task. One exchange, no range-sampling pass.
    *
    * (The r6 version range-partitioned on a STRING `"<size>:<doc_id>"`
    * key — lexicographic, so "1000" < "999" interleaved size classes by
    * leading digit — and equal-ROW range bounds concentrate the biggest
    * blobs in the top partition anyway. Byte-aware dealing is the shape
    * that actually survives skewed media at 100 TB.)
    *
    * RDD mapPartitions is deliberate: per-partition mutable byte counters
    * are genuine imperative partition state no Column expression carries.
    */
  def repartitionBySize(df: DataFrame, partitions: Int,
      contentCol: String = "content"): DataFrame = {
    require(partitions > 0, "partitions must be positive")
    val spark = df.sparkSession
    val schema = df.schema
    val idx = schema.fieldIndex(contentCol)
    val dealt = df.rdd.mapPartitions { it =>
      val off = org.apache.spark.TaskContext.getPartitionId()
      val loads = new Array[Long](partitions)
      it.map { row =>
        val n = row.get(idx) match {
          case b: Array[Byte] => b.length.toLong
          case s: String => s.length.toLong
          case _ => 1L
        }
        var best = off % partitions
        var j = 1
        while (j < partitions) {
          val cand = (off + j) % partitions
          if (loads(cand) < loads(best)) best = cand
          j += 1
        }
        loads(best) += n
        (best, row)
      }
    }
    val placed = dealt.partitionBy(new org.apache.spark.Partitioner {
      override def numPartitions: Int = partitions
      override def getPartition(key: Any): Int = key.asInstanceOf[Int]
    }).values
    spark.createDataFrame(placed, schema)
  }

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

  /** Documents as media with REAL container headers prepended (the
    * producer dual of [[MediaHeaders]]): images alternate PNG/JPEG with
    * doc_id-derived dimensions, audio gets a canonical WAV preamble with
    * doc_id-derived channels/rate, video stays a raw payload (real video
    * containers need a codec to even index). The decode stage must read
    * every field back from the BYTES — the oracle recomputes the same
    * values from doc_id closed-form, so a parser reading the wrong offset
    * hash-mismatches immediately.
    */
  def documentsAsEncodedMedia(spark: SparkSession, docs: DataFrame)
      : Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map {
      case (id, text) =>
        val payload = text.getBytes("UTF-8")
        (id % 3) match {
          case 0 =>
            val w = 16 + (id % 624).toInt
            val h = 16 + (id % 464).toInt
            val hdr = if (id % 6 == 0) MediaHeaders.pngBytes(w, h)
                      else MediaHeaders.jpegBytes(w, h)
            MediaRow(id, "image", hdr ++ payload)
          case 1 =>
            val hdr = MediaHeaders.wavBytes(
              channels = 1 + (id % 2).toInt,
              sampleRate = 8000 + (id % 8).toInt * 4000,
              dataLen = payload.length)
            MediaRow(id, "audio", hdr ++ payload)
          case _ => MediaRow(id, "video", payload)
        }
    }
  }
}
