package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/
  * video carried as opaque `binary` columns with typed metadata, processed
  * per-partition in batches (the Scala analogue of `mapInPandas` — a typed
  * `Dataset.mapPartitions` whose iterator is the batch stream).
  *
  * Images and animations decode to REAL pixels ([[ImageCodec]]: PNG, JPEG
  * and animated GIF over the JDK's `javax.imageio`, zero extra
  * dependencies); WAV audio decodes to real 16-bit PCM samples
  * ([[wavStats]]/[[wavVad]]); container headers parse at byte offsets
  * ([[MediaHeaders]]) as the fallback for blobs whose payload is
  * unreadable. Nothing in the decode path is stubbed.
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

  /** Extracted features. `format` names what the decode found: a REAL
    * pixel decode ("png"/"jpeg"/"gif" — width/height/n_frames are from
    * the decoded raster, and for the lossless formats `px_sum`/`px_sq`
    * are exact pixel-intensity moments), a recognized audio container
    * ("wav" — channels/sample-rate from the fmt chunk, samples decoded
    * downstream by [[wavStats]]), a bare image header on an unreadable
    * payload ("png-header"/"jpeg-header" — dims only), or "unknown".
    * `px_sum`/`px_sq` are None unless pixels decoded losslessly (JPEG
    * pixel values are encoder/decoder-pair dependent — never pinned);
    * `payload_sha256` hashes the un-decoded payload where that is the
    * content's identity (audio data chunk / raw blob) and is None for
    * pixel-decoded rows (their identity is the pixels, not the
    * encoder-specific container bytes).
    */
  final case class MediaFeatures(doc_id: Long, media_type: String,
      format: String, n_bytes: Long, width: Int, height: Int,
      sample_rate: Int, channels: Int, n_frames: Int,
      px_sum: Option[Long], px_sq: Option[Long],
      payload_sha256: Option[String])

  /** The per-row decode kernel: real pixel decode first, container
    * fallbacks second, total on poison input (a malformed blob yields
    * an all-zero "unknown" row, never a throw — one bad blob in a
    * 100 TB scan costs one row, not the job).
    */
  object Decoder {
    private def sha256hex(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(b).map("%02x".format(_)).mkString

    def decode(r: MediaRow): MediaFeatures = {
      val b = r.content
      ImageCodec.decodeGray(b) match {
        case Some(img) =>
          // real pixels: exact intensity moments for the lossless
          // formats (PNG/GIF round-trip bit-exactly; JPEG does not)
          val lossless = img.format != "jpeg"
          var sum = 0L
          var sq = 0L
          if (lossless) img.frames.foreach { fr =>
            var i = 0
            while (i < fr.length) {
              val v = fr(i).toLong; sum += v; sq += v * v; i += 1
            }
          }
          MediaFeatures(r.doc_id, r.media_type, img.format, b.length.toLong,
            img.width, img.height, 0, 0, img.frames.length,
            if (lossless) Some(sum) else None,
            if (lossless) Some(sq) else None, None)
        case None =>
          val img = MediaHeaders.png(b).map(("png-header", _))
            .orElse(MediaHeaders.jpeg(b).map(("jpeg-header", _)))
          val aud = if (img.isEmpty) MediaHeaders.wav(b) else None
          val headerLen =
            img.map(_._2._3).orElse(aud.map(_._3)).getOrElse(0)
          val payload =
            if (headerLen == 0) b
            else java.util.Arrays.copyOfRange(b, headerLen, b.length)
          MediaFeatures(r.doc_id, r.media_type,
            img.map(_._1)
              .orElse(aud.map(_ => "wav")).getOrElse("unknown"),
            b.length.toLong,
            img.map(_._2._1).getOrElse(0), img.map(_._2._2).getOrElse(0),
            aud.map(_._2).getOrElse(0), aud.map(_._1).getOrElse(0), 0,
            None, None, Some(sha256hex(payload)))
      }
    }
  }

  /** Batched per-partition feature extraction — the mapInPandas-shaped
    * seam: one iterator per partition, features emitted in bulk.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(Decoder.decode))
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

  /** Corpus-level pixel-intensity histogram over the REAL decodes: every
    * losslessly-decoded pixel (PNG stills + every animated-GIF frame;
    * JPEG is excluded because its pixel values are decoder-pair
    * dependent) buckets into 16 intensity bands (value >> 4). Per
    * bucket: total pixels and the number of images that touch it — the
    * exposure/contrast distribution a vision-data pipeline reads before
    * normalization. Per-row narrow decode kernel + one 16-key exchange.
    */
  def imagePixelHistogram(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      ImageCodec.decodeGray(r.content).toSeq
        .filter(_.format != "jpeg")
        .flatMap { img =>
          val counts = new Array[Long](16)
          img.frames.foreach { fr =>
            var i = 0
            while (i < fr.length) { counts(fr(i) >> 4) += 1; i += 1 }
          }
          counts.zipWithIndex.collect {
            case (c, b) if c > 0 => (b.toLong, c)
          }
        }
    }.toDF("bucket", "n")
      .groupBy(col("bucket"))
      .agg(sum(col("n")).as("n_pixels"), count(lit(1)).as("n_images"))
  }

  /** REAL image resize: box-filter resample of the decoded frame-0
    * raster to a `tw`×`th` grid — output cell (ox, oy) averages the
    * exact source block [ox·w/tw, (ox+1)·w/tw) × [oy·h/th, (oy+1)·h/th)
    * (floor division, the classic area-average downscale), all in
    * integer arithmetic so an external oracle reproduces it bit-exactly.
    * Lossless decodes only (PNG + GIF; JPEG pixels can't be pinned) and
    * downscale only (w ≥ tw, h ≥ th — every output cell has sources).
    * Emits one row per output pixel: the thumbnail a vision pipeline
    * feeds its embedding model. Per-row narrow kernel, zero shuffles.
    */
  def resizeBox(media: Dataset[MediaRow], tw: Int, th: Int): DataFrame = {
    import media.sparkSession.implicits._
    require(tw > 0 && th > 0, "target dims must be positive")
    media.flatMap { r =>
      ImageCodec.decodeGray(r.content).toSeq
        .filter(i => i.format != "jpeg" && i.width >= tw && i.height >= th)
        .flatMap { img =>
          val p = img.frames.head
          val w = img.width
          val h = img.height
          for (oy <- 0 until th; ox <- 0 until tw) yield {
            val x0 = ox * w / tw; val x1 = (ox + 1) * w / tw
            val y0 = oy * h / th; val y1 = (oy + 1) * h / th
            var s = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) { s += p(y * w + x); x += 1 }
              y += 1
            }
            (r.doc_id, ox, oy, s / ((x1 - x0).toLong * (y1 - y0).toLong))
          }
        }
    }.toDF("doc_id", "ox", "oy", "v")
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

  /** The doc_id-derived pixel function both engines share: the fixture
    * encoder paints it, the decode queries' oracle recomputes it
    * closed-form — so a decoder reading any wrong pixel hash-mismatches.
    * Stills use frame = 0.
    */
  def fixturePixel(id: Long, frame: Int, x: Int, y: Int): Int =
    ((id * 31 + frame * 101 + x * 7 + y * 13) % 256).toInt

  /** Documents as REAL media files (the producer dual of [[ImageCodec]]
    * / [[MediaHeaders]]): images are genuine PNG/JPEG encodes and video
    * rows genuine multi-frame animated GIFs — pixels painted by
    * [[fixturePixel]] with doc_id-derived dimensions/frame counts —
    * while audio rows carry a canonical WAV preamble over the text
    * bytes as 16-bit PCM. The decode stage must recover every field
    * from the BYTES through the real codecs; the oracle recomputes the
    * same values from doc_id + text closed-form, so a decoder that
    * mis-reads a single pixel or offset hash-mismatches immediately.
    */
  /** The video documents as OPTIMIZER-SHAPED animated GIFs: frame 0 is
    * the full logical screen, every later frame is stored as a
    * sub-raster patch at a frame-derived offset — the layout real GIF
    * optimizers emit and the compositing path of
    * [[ImageCodec.decodeGray]] must render back. All geometry is
    * closed-form in doc_id and the frame index (screen = the same
    * 8+id%9 × 8+id%7 as the plain GIF fixture; patch = (1+⌊sw/2⌋) ×
    * (1+⌊sh/2⌋) at left = (id+3f) mod (sw−pw+1), top = (id+5f) mod
    * (sh−ph+1)), and patch pixels reuse [[fixturePixel]] in frame-LOCAL
    * coordinates — so the oracle can replay the composited screen with
    * a last-writer-wins model and any compositing error (wrong offset,
    * wrong carry-over, wrong disposal default) hash-mismatches.
    */
  def documentsAsOptimizedMedia(spark: SparkSession, docs: DataFrame)
      : Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).where(col("doc_id") % 3 === 2)
      .as[Long].map { id =>
        val sw = 8 + (id % 9).toInt
        val sh = 8 + (id % 7).toInt
        val nf = 1 + (id % 4).toInt
        val pw = 1 + sw / 2
        val ph = 1 + sh / 2
        val patches = ImageCodec.GifPatch(0, 0, sw, sh) +:
          (1 until nf).map(f => ImageCodec.GifPatch(
            ((id + 3 * f) % (sw - pw + 1)).toInt,
            ((id + 5 * f) % (sh - ph + 1)).toInt, pw, ph))
        MediaRow(id, "video",
          ImageCodec.encodeGifPatches(sw, sh, patches)(fixturePixel(id, _, _, _)))
      }
  }

  def documentsAsEncodedMedia(spark: SparkSession, docs: DataFrame)
      : Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map {
      case (id, text) =>
        (id % 3) match {
          case 0 =>
            val w = 16 + (id % 17).toInt
            val h = 12 + (id % 13).toInt
            val px = (x: Int, y: Int) => fixturePixel(id, 0, x, y)
            MediaRow(id, "image",
              if (id % 6 == 0) ImageCodec.encodePng(w, h)(px)
              else ImageCodec.encodeJpeg(w, h)(px))
          case 1 =>
            val payload = text.getBytes("UTF-8")
            val hdr = MediaHeaders.wavBytes(
              channels = 1 + (id % 2).toInt,
              sampleRate = 8000 + (id % 8).toInt * 4000,
              dataLen = payload.length)
            MediaRow(id, "audio", hdr ++ payload)
          case _ =>
            MediaRow(id, "video", ImageCodec.encodeGif(
              w = 8 + (id % 9).toInt, h = 8 + (id % 7).toInt,
              nFrames = 1 + (id % 4).toInt)(fixturePixel(id, _, _, _)))
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
    phashFromPixels(grid)
  }

  /** The DCT sign-sketch tail shared by the text-texture pHash and the
    * REAL image pHash: input is one 8×8 integer grid per doc
    * (`doc_id, x, y, p` with p in 0..255, all 64 cells present), output
    * the 60-bit low-frequency sign word. Separable two-pass DCT against
    * the broadcast literal basis, divisionless sign bits — see
    * [[phashSketch]] for the full scale/exactness argument.
    */
  def phashFromPixels(grid: DataFrame): DataFrame = {
    val spark = grid.sparkSession
    import spark.implicits._
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

  /** Energy-delta audio fingerprint — the integer skeleton of the
    * landmark/fingerprint family (Shazam/Chromaprint reduced to what
    * exact arithmetic can pin): per `frame`-sample window the exact
    * Σs² energy, then a 60-bit sketch whose bit f is set iff energy
    * ROSE from frame f to f+1 (first 59 transitions). Because the bits
    * are energy COMPARISONS, the sketch is gain-invariant (s → c·s
    * scales every energy by c², preserving order) — re-encoded or
    * re-normalized copies of the same audio collide, which is the
    * property an audio-dedup key needs and a raw content hash lacks.
    * Pairs then go through the same Hamming banding as every other
    * sketch. Per-row kernel, zero exchanges; oracle replays every
    * sample, energy, and comparison closed-form.
    */
  def audioFingerprint(frame: Int)(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      MediaHeaders.wav(r.content).map { case (_, _, hdrLen) =>
        val payload =
          java.util.Arrays.copyOfRange(r.content, hdrLen, r.content.length)
        val n = payload.length / 2
        val nf = n / frame
        val e = new Array[Long](nf)
        var f = 0
        while (f < nf) {
          var acc = 0L
          var i = f * frame
          while (i < (f + 1) * frame) {
            val lo = payload(2 * i) & 0xff
            val s = ((payload(2 * i + 1).toInt << 8) | lo).toLong
            acc += s * s
            i += 1
          }
          e(f) = acc
          f += 1
        }
        var fp = 0L
        var b = 0
        while (b < math.min(59, nf - 1)) {
          if (e(b + 1) > e(b)) fp |= 1L << b
          b += 1
        }
        (r.doc_id, nf.toLong, fp)
      }
    }.toDF("doc_id", "n_frames", "fp")
  }

  /** Temporal frame-delta analysis over animated media (the
    * scene-change / motion-energy profile a video-curation pipeline
    * reads before frame sampling): per consecutive frame pair of each
    * multi-frame lossless decode, the sum and max of absolute pixel
    * deltas plus the changed-pixel count — all exact integer over REAL
    * decoded pixels ([[ImageCodec.decodeGray]]). A static-duplicate
    * frame shows sum_abs_delta = 0; a hard cut shows n_changed ≈ w·h.
    * Scale shape: per-row narrow decode kernel, ZERO exchanges — the
    * per-(doc, frame) grain is computed inside the kernel, so 100 TB of
    * video never shuffles pixel data.
    */
  def frameDelta(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      ImageCodec.decodeGray(r.content).toSeq
        .filter(i => i.format != "jpeg" && i.frames.length >= 2)
        .flatMap { img =>
          (1 until img.frames.length).map { f =>
            val a = img.frames(f - 1)
            val b = img.frames(f)
            var sad = 0L
            var mx = 0L
            var changed = 0L
            var i = 0
            while (i < a.length) {
              val d = math.abs(b(i) - a(i)).toLong
              sad += d
              if (d > mx) mx = d
              if (d != 0L) changed += 1L
              i += 1
            }
            (r.doc_id, f.toLong, sad, mx, changed)
          }
        }
    }.toDF("doc_id", "frame", "sum_abs_delta", "max_delta", "n_changed")
  }

  /** Per-image exact pixel statistics + low-information gate (the
    * vision dual of the text quality gates): min/max/contrast and the
    * fixed-point variance floor((n·Σp² − (Σp)²)·10⁶ / n²) over ALL
    * frames of each lossless decode, with `keep` flagging images whose
    * contrast clears `minContrast` — a flat (single-color, broken, or
    * padding) image carries no training signal and gates out here.
    * All-integer arithmetic: the variance numerator (n·Σp² − (Σp)²)·10⁶
    * is n²·variance·10⁶, which overflows Long past ~200×200 pixels at
    * typical variance, so it goes through BigInt (one BigInt op per
    * IMAGE, not per pixel) — the quotient itself is ≤ 255²·10⁶ and
    * always fits Long, and the floor is exact at every image size, so
    * the oracle (128-bit integer arithmetic) replays it bit-exact.
    * Per-row narrow kernel, zero exchanges.
    */
  def imagePixelStats(media: Dataset[MediaRow],
      minContrast: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      ImageCodec.decodeGray(r.content).toSeq
        .filter(_.format != "jpeg")
        .map { img =>
          var mn = 255
          var mx = 0
          var sum = 0L
          var sq = 0L
          var n = 0L
          img.frames.foreach { fr =>
            var i = 0
            while (i < fr.length) {
              val v = fr(i)
              if (v < mn) mn = v
              if (v > mx) mx = v
              sum += v
              sq += v.toLong * v
              n += 1L
              i += 1
            }
          }
          // n²·var·10⁶ exceeds Long for production-size images — exact
          // 128-bit path, reduced back to the (always-fitting) quotient
          val varFp = ((BigInt(n) * sq - BigInt(sum) * sum) * 1000000 /
            (BigInt(n) * n)).toLong
          (r.doc_id, n, mn.toLong, mx.toLong, (mx - mn).toLong,
            sum, sq, varFp, (mx - mn) >= minContrast)
        }
    }.toDF("doc_id", "n_pixels", "min_p", "max_p", "contrast",
      "px_sum", "px_sq", "var_fp", "keep")
  }

  /** REAL image pHash: the production vision-dedup shape end to end —
    * decode actual pixels ([[ImageCodec]]), area-average down to 8×8
    * ([[resizeBox]]), then the integer DCT sign sketch
    * ([[phashFromPixels]]). Lossless decodes only (PNG + GIF frame 0),
    * so the whole pipeline — pixels, block sums, DCT, sign bits — is
    * exact and externally verifiable. Same Manku-banding machinery as
    * every other sketch for pair generation.
    */
  def phashImage(media: Dataset[MediaRow]): DataFrame =
    phashFromPixels(resizeBox(media, 8, 8)
      .select(col("doc_id"), col("ox").as("x"), col("oy").as("y"),
        col("v").as("p")))
}
