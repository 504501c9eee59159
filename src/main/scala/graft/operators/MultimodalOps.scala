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

  /** PCM sample statistics over WAV payloads — a REAL decode, not a
    * stub: 16-bit little-endian PCM needs no codec library. Per audio
    * row: interleaved sample count, integer-floor duration, energy
    * Σs² and peak |s| — all exact BIGINT arithmetic (the loudness /
    * clipping screen of an audio curation pass). Rows whose bytes do
    * not parse as WAV are absent (the honest contract); a trailing odd
    * byte is ignored (an incomplete sample). Pure narrow flatMap over
    * the media scan — no exchange, no row amplification.
    */
  def wavStats(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      MediaHeaders.wav(r.content).map { case (channels, rate, hdrLen) =>
        val payload =
          java.util.Arrays.copyOfRange(r.content, hdrLen, r.content.length)
        val n = payload.length / 2
        var sumSq = 0L
        var peak = 0L
        var i = 0
        while (i < n) {
          val lo = payload(2 * i) & 0xff
          val s = ((payload(2 * i + 1).toInt << 8) | lo).toLong
          sumSq += s * s
          if (math.abs(s) > peak) peak = math.abs(s)
          i += 1
        }
        (r.doc_id, channels, rate, n.toLong,
          n.toLong * 1000L / (rate.toLong * channels.toLong), sumSq, peak)
      }
    }.toDF("doc_id", "channels", "sample_rate", "n_samples",
      "duration_ms", "sum_sq", "peak")
  }

  /** Energy-based voice-activity detection over the REAL 16-bit PCM
    * decode (no codec needed — the wavStats sample loop, framed): the
    * audio splits into `frame`-sample windows (full frames only), a
    * frame is active when its Σs² energy exceeds `thrEnergy`, and
    * consecutive active frames merge into segments (the
    * gaps-and-islands count, tracked inline by the same loop). Audio
    * shorter than one frame reports 0/0/0 honestly. Per-row narrow
    * kernel — zero shuffles, the production VAD shape; only a learned
    * model would replace the energy gate.
    */
  def wavVad(frame: Int, thrEnergy: Long)(
      media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      MediaHeaders.wav(r.content).map { case (_, _, hdrLen) =>
        val payload =
          java.util.Arrays.copyOfRange(r.content, hdrLen, r.content.length)
        val n = payload.length / 2
        val nf = n / frame
        var act = 0L
        var segs = 0L
        var prev = false
        var f = 0
        while (f < nf) {
          var e = 0L
          var i = f * frame
          while (i < (f + 1) * frame) {
            val lo = payload(2 * i) & 0xff
            val s = ((payload(2 * i + 1).toInt << 8) | lo).toLong
            e += s * s
            i += 1
          }
          val a = e > thrEnergy
          if (a) { act += 1; if (!prev) segs += 1 }
          prev = a
          f += 1
        }
        (r.doc_id, nf.toLong, act, segs,
          if (nf > 0) act.toDouble / nf.toDouble else 0.0)
      }
    }.toDF("doc_id", "n_frames", "n_active", "n_segments",
      "active_ratio")
  }

  /** Corpus-level intensity histogram over the image docs' decoded
    * payload: headers stripped by the REAL PNG/JPEG byte parse, then
    * every payload byte buckets into 16 intensity bands (value >> 4 —
    * the byte values stand in for pixel intensities under the
    * documented stub decode). Per bucket: total bytes and the number
    * of images that touch it — the exposure/contrast distribution a
    * vision-data pipeline reads before normalization. Per-row narrow
    * kernel + one 16-key exchange.
    */
  def imageByteHistogram(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      MediaHeaders.png(r.content)
        .orElse(MediaHeaders.jpeg(r.content)).toSeq
        .flatMap { case (_, _, hdrLen) =>
          val counts = new Array[Long](16)
          var i = hdrLen
          while (i < r.content.length) {
            counts((r.content(i) & 0xff) >> 4) += 1
            i += 1
          }
          counts.zipWithIndex.collect {
            case (c, b) if c > 0 => (b.toLong, c)
          }
        }
    }.toDF("bucket", "n")
      .groupBy(col("bucket"))
      .agg(sum(col("n")).as("n_bytes"), count(lit(1)).as("n_images"))
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

  /** Quantized 8×8 DCT-II basis row: cos((2x+1)uπ/16)·10⁶ rounded to a
    * Long — the ONE cosine table both engines share as literals (no
    * runtime transcendentals, so the whole pHash is exact integer).
    */
  def dctBasis: Seq[(Int, Int, Long)] =
    for (u <- 0 until 8; x <- 0 until 8)
      yield (u, x, math.round(math.cos((2 * x + 1) * u * math.Pi / 16)
        * 1000000.0))

  /** 60-bit perceptual hash (pHash) of the image documents: the classic
    * resize → DCT → low-frequency sign sketch, with the RESIZE/DECODE
    * step stubbed deterministically (like [[StubDecoder]] — no codecs
    * here): the 8×8 grayscale stand-in is a feature-hash texture,
    * pixel(cell) = (Σ h(shingle)÷64 over shingles hashing to the cell)
    * mod 256 — content-derived and ALIGNMENT-ROBUST (an edit only
    * perturbs the buckets its shingles touch), so near-duplicate
    * payloads yield near-equal pixels, which is the property a real
    * decoder feeds this pipeline. Everything downstream is the real
    * production shape:
    *
    *  - separable 2-D DCT as two 1-D passes (G = P·Cᵀ then F = C·G) —
    *    8× fewer terms than the naive double sum, each pass one
    *    broadcast join against the 64-row literal basis + one bounded
    *    aggregate;
    *  - bits = sign of each of the 60 lowest-frequency AC coefficients
    *    against the AC mean, divisionless (63·F > ΣAC);
    *  - the 60-bit word feeds the SAME Manku banding/verify machinery
    *    as SimHash ([[DedupOps.simhashPairsFromSketch]]).
    *
    * Integer end to end (pixel ≤ 255 ⇒ |F| ≤ 1.63e16, ΣAC ≤ 1.04e18 —
    * inside Long at ANY corpus size; bounds are per-image, not
    * per-corpus). Scale shape: one corpus explode + (doc, cell)
    * aggregate; the DCT joins broadcast the basis; every frame after
    * the shingle aggregate is 64-512 rows per doc.
    */
  def phashSketch(docs: DataFrame): DataFrame = {
    import graft.functions.PortableHash.h15
    val spark = docs.sparkSession
    import spark.implicits._
    val d = docs.filter(col("text").isNotNull &&
      pmod(col("doc_id"), lit(3)) === 0)
    val cells = d
      .select(col("doc_id"),
        explode(DedupOps.shingleSet(col("text"), 8)).as("s"))
      .select(col("doc_id"), h15(concat(lit("px:"), col("s"))).as("h"))
      .groupBy(col("doc_id"), (col("h") % 64).as("cell"))
      .agg(sum(expr("h div 64")).as("hs"))
    val grid = d.select(col("doc_id"))
      .select(col("doc_id"), explode(sequence(lit(0L), lit(63L))).as("cell"))
      .join(cells, Seq("doc_id", "cell"), "left_outer")
      .select(col("doc_id"),
        expr("cell div 8").as("x"), (col("cell") % 8).as("y"),
        (coalesce(col("hs"), lit(0L)) % 256).as("p"))
    val cq = broadcast(dctBasis.toDF("u", "x", "c"))
    val g = grid
      .join(cq.select(col("u").as("v"), col("x").as("yy"),
        col("c").as("cy")), col("y") === col("yy"))
      .groupBy(col("doc_id"), col("x"), col("v"))
      .agg(sum(col("p") * col("cy")).as("gv"))
    val f = DedupOps.materialize(g
      .join(cq.select(col("u"), col("x").as("xx"), col("c").as("cx")),
        col("x") === col("xx"))
      .groupBy(col("doc_id"), col("u"), col("v"))
      .agg(sum(col("gv") * col("cx")).as("fv")))
    val st = f.groupBy(col("doc_id"))
      .agg((sum(col("fv")) -
        max(when(col("u") === 0 && col("v") === 0, col("fv")))).as("sac"))
    f.join(st, Seq("doc_id"))
      .groupBy(col("doc_id"))
      .agg(sum(when(expr("u * 8 + v between 1 and 60") &&
        lit(63L) * col("fv") > col("sac"),
        expr("shiftleft(CAST(1 AS BIGINT), u * 8 + v - 1)"))
        .otherwise(lit(0L))).as("ph"))
  }
}
