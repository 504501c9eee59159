package graft.queries

import graft.Tables
import graft.operators.MultimodalOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal decode as oracle-checked queries. The fixture rows are
  * REAL media files — genuine PNG/JPEG/GIF encodes with doc_id-derived
  * pixels ([[graft.operators.MultimodalOps.fixturePixel]]) plus WAV
  * containers over PCM text bytes — and the decode stage recovers
  * dimensions, frame counts and PIXEL VALUES through the real JDK
  * codecs ([[graft.operators.ImageCodec]]); the oracle recomputes every
  * field, pixel moment and resampled block closed-form from doc_id +
  * text, so a decoder that mis-reads one pixel fails the hash compare.
  * (JPEG pixel values are decoder-pair dependent and never pinned —
  * dims are; px moments are NULL on both sides.)
  */
object MultimodalQueries {
  type Q = (SparkSession, String) => DataFrame

  val all: Map[String, Q] = Map(
    "mm_decode_features" -> ((s, dir) =>
      MultimodalOps.extractFeatures(
        MultimodalOps.documentsAsEncodedMedia(
          s, Tables.documents(s, dir))).toDF()
        // n_bytes is encoder-specific (deflate/arith coding details) —
        // real but not closed-form recomputable; MultimodalSpec covers it
        .select(col("doc_id"), col("media_type"), col("format"),
          col("width"), col("height"), col("sample_rate"), col("channels"),
          col("n_frames"), col("px_sum"), col("px_sq"),
          col("payload_sha256"))),

    "mm_frame_sample" -> ((s, dir) =>
      MultimodalOps.sampleFrames(
        MultimodalOps.documentsAsMedia(s, Tables.documents(s, dir)),
        frameSize = 32, stride = 4)
        .select(col("doc_id"), col("frame_no"), length(col("frame"))
          .as("frame_len"))),

    // REAL 16-bit PCM decode over the WAV fixture rows (no codec
    // needed): sample count, integer duration, Σs² energy, peak |s| —
    // the loudness/clipping screen. The oracle recomputes every sample
    // from the text payload (ASCII bytes → little-endian int16 pairs),
    // so a wrong header offset or endianness fails the hash compare.
    "mm_wav_stats" -> ((s, dir) =>
      MultimodalOps.wavStats(
        MultimodalOps.documentsAsEncodedMedia(
          s, Tables.documents(s, dir)))),

    // TRUE pixel-intensity histogram over the real decodes (16 bands
    // over every losslessly-decoded pixel: PNG stills + all GIF frames;
    // see MultimodalOps.imagePixelHistogram). The oracle re-derives
    // every pixel closed-form from fixturePixel.
    "mm_image_histogram" -> ((s, dir) =>
      MultimodalOps.imagePixelHistogram(
        MultimodalOps.documentsAsEncodedMedia(
          s, Tables.documents(s, dir)))),

    // Energy-based VAD over the decoded PCM (50-sample frames, frame
    // energy gate tuned inside the measured distribution 2.8e10-3.7e10
    // so BOTH classes exist; see MultimodalOps.wavVad). Sub-frame
    // audio reports 0/0/0; the oracle replays every sample and the
    // gaps-and-islands segment count via a lag window.
    "mm_audio_vad" -> ((s, dir) =>
      MultimodalOps.wavVad(VadFrame, VadThr)(
        MultimodalOps.documentsAsEncodedMedia(
          s, Tables.documents(s, dir)))),

    // Perceptual hash of the image documents (pHash: stub-decode →
    // 8×8 feature-hash texture → separable integer DCT → 60-bit
    // low-frequency sign sketch — see MultimodalOps.phashSketch).
    "mm_phash" -> ((s, dir) =>
      MultimodalOps.phashSketch(Tables.documents(s, dir))),

    // ...and the sketch promoted to image near-dup pairs through the
    // SAME Manku banding/verify machinery as dedup_simhash_pairs:
    // chunks=12 (5-bit chunks, C(12,2)=66 10-bit pair-combo keys),
    // maxHamming=9 — agree ≥ 3 chunks guaranteed, so the banding is
    // EXACT for the threshold (the oracle brute-forces all pairs; the
    // pigeonhole proves Spark's candidate set contains every
    // qualifying one). Thresholds sit in the fixture's measured gap
    // (real near-dups ≤ 9, hash-noise floor ≥ 14 at both test SFs).
    "mm_phash_dedup" -> ((s, dir) =>
      graft.operators.DedupOps.simhashPairsFromSketch(PhMaxHam, PhChunks)(
        MultimodalOps.phashSketch(Tables.documents(s, dir))
          .select(col("doc_id"), col("ph").as("sh")))),

    // REAL image resize: integer box-filter resample of every lossless
    // decode (PNG + GIF frame 0) to an 8×8 thumbnail, one row per
    // output pixel (see MultimodalOps.resizeBox). The oracle replays
    // the exact block sums from fixturePixel — a resampler off by one
    // source pixel anywhere fails the hash.
    "mm_resize" -> ((s, dir) =>
      MultimodalOps.resizeBox(
        MultimodalOps.documentsAsEncodedMedia(s, Tables.documents(s, dir)),
        tw = 8, th = 8)),

    // REAL image pHash: decoded pixels → 8×8 box resample → integer DCT
    // sign sketch (the production vision-dedup pipeline end to end; see
    // MultimodalOps.phashImage). The oracle replays pixels, block sums,
    // both DCT passes and the sign bits closed-form.
    "mm_phash_image" -> ((s, dir) =>
      MultimodalOps.phashImage(
        MultimodalOps.documentsAsEncodedMedia(s, Tables.documents(s, dir)))),

    // Temporal scene-change profile of the animated GIFs: per
    // consecutive-frame pair, exact sum/max of absolute pixel deltas +
    // changed-pixel count over real decoded frames. Zero exchanges.
    "mm_frame_delta" -> ((s, dir) =>
      MultimodalOps.frameDelta(
        MultimodalOps.documentsAsEncodedMedia(s, Tables.documents(s, dir)))),

    // Per-image exact pixel stats + low-information (flat-image) gate
    // over every lossless decode. Zero exchanges.
    "mm_pixel_stats" -> ((s, dir) =>
      MultimodalOps.imagePixelStats(
        MultimodalOps.documentsAsEncodedMedia(s, Tables.documents(s, dir)),
        minContrast = PxMinContrast)),

    // Scene-change profile over OPTIMIZER-SHAPED GIFs: frames are
    // stored as offset sub-raster patches (documentsAsOptimizedMedia)
    // and the decode must COMPOSITE them onto the logical screen before
    // differencing — pixels outside a frame's patch carry over, so the
    // delta is exactly the patch-local change (the honest motion signal
    // of an optimized animation). The oracle replays the composited
    // screen with a last-writer-wins model over the closed-form patch
    // rects; a wrong offset, a dropped carry-over, or a mis-applied
    // disposal default all hash-mismatch.
    "mm_gif_composite_delta" -> ((s, dir) =>
      MultimodalOps.frameDelta(
        MultimodalOps.documentsAsOptimizedMedia(s, Tables.documents(s, dir)))),

    // Gain-invariant audio fingerprint (energy-delta sign sketch over
    // 50-sample frames) — the audio-dedup key: see
    // MultimodalOps.audioFingerprint. Per-row kernel, zero exchanges.
    "mm_audio_fingerprint" -> ((s, dir) =>
      MultimodalOps.audioFingerprint(VadFrame)(
        MultimodalOps.documentsAsEncodedMedia(s, Tables.documents(s, dir)))),

    // Keyframe (scene-change) selection over the animated GIFs: a
    // frame is a keyframe when its composited delta is ABOVE the
    // document's mean frame delta (sad·n_deltas > Σsad — divisionless,
    // exact). The standard video-curation cut before frame sampling:
    // sample at scene changes, not uniformly. Window over the tiny
    // per-(doc, frame) delta frame; the pixel work stays in the
    // per-row decode kernel.
    "mm_keyframes" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = MultimodalOps.frameDelta(
        MultimodalOps.documentsAsEncodedMedia(s, Tables.documents(s, dir)))
      val w = Window.partitionBy(col("doc_id"))
      d.select(col("doc_id"), col("frame"), col("sum_abs_delta"),
          (col("sum_abs_delta") * count(lit(1)).over(w) >
            sum(col("sum_abs_delta")).over(w)).as("is_keyframe"))
    })
  )

  private val PhMaxHam = 9
  private val PxMinContrast = 32
  private val PhChunks = 12
  /** VAD: 50-sample frames; energy gate inside the measured per-frame
    * Σs² distribution (2.8e10–3.7e10 on the ASCII-payload fixture).
    */
  private val VadFrame = 50
  private val VadThr = 32000000000L

  /** The DCT sign-sketch tail, expecting a preceding `ph_px(doc_id, x,
    * y, p)` CTE (all 64 cells per doc): the shared literal DCT basis
    * (MultimodalOps.dctBasis — the ONE cosine table), the separable
    * two-pass DCT, and the divisionless sign bits. Ends at
    * `ph_w(doc_id, ph)` — the SQL dual of
    * MultimodalOps.phashFromPixels.
    */
  private def phashTail: String = {
    val cqvals = MultimodalOps.dctBasis
      .map { case (u, x, c) => s"($u, $x, $c)" }.mkString(", ")
    s"""ph_cq(u, x, c) AS (SELECT * FROM (VALUES $cqvals)),
        ph_1 AS (SELECT p.doc_id, p.x, cv.u AS v,
                   sum(p.p * cv.c)::BIGINT AS gv
                 FROM ph_px p JOIN ph_cq cv ON cv.x = p.y
                 GROUP BY 1, 2, 3),
        ph_2 AS (SELECT g.doc_id, cu.u, g.v,
                   sum(g.gv * cu.c)::BIGINT AS fv
                 FROM ph_1 g JOIN ph_cq cu ON cu.x = g.x
                 GROUP BY 1, 2, 3),
        ph_st AS (SELECT doc_id,
                    (sum(fv) - max(CASE WHEN u = 0 AND v = 0
                       THEN fv END))::BIGINT AS sac
                  FROM ph_2 GROUP BY 1),
        ph_w AS (SELECT f.doc_id,
                   sum(CASE WHEN u * 8 + v BETWEEN 1 AND 60
                         AND 63 * fv > st.sac
                       THEN 1::BIGINT << (u * 8 + v - 1)
                       ELSE 0 END)::BIGINT AS ph
                 FROM ph_2 f JOIN ph_st st USING (doc_id) GROUP BY 1)"""
  }

  /** Text-texture pHash replay: the shingle feature-hash texture grid,
    * then [[phashTail]].
    */
  private def phashCtes: String = {
    val toks = """string_split_regex(trim(text), '\s+')"""
    s"""WITH ph_d AS (
            SELECT doc_id, $toks AS tk FROM documents
            WHERE text IS NOT NULL AND doc_id % 3 = 0),
        ph_s AS (
            SELECT doc_id, unnest(list_distinct(list_transform(
                     range(0, greatest(length(tk) - 8, 0) + 1),
                     i -> array_to_string(tk[i+1:i+8], ' ')))) AS s
            FROM ph_d),
        ph_h AS (SELECT doc_id,
                   ('0x' || substring(md5('px:' || s), 1, 15))::BIGINT AS h
                 FROM ph_s),
        ph_c AS (SELECT doc_id, h % 64 AS cell,
                   sum(h // 64)::BIGINT AS hs
                 FROM ph_h GROUP BY 1, 2),
        ph_g AS (SELECT d.doc_id, c.i AS cell,
                   COALESCE(p.hs, 0) % 256 AS p
                 FROM (SELECT DISTINCT doc_id FROM ph_d) d
                 CROSS JOIN range(0, 64) c(i)
                 LEFT JOIN ph_c p
                   ON p.doc_id = d.doc_id AND p.cell = c.i),
        ph_px AS (SELECT doc_id, cell // 8 AS x, cell % 8 AS y, p
                FROM ph_g),
        $phashTail"""
  }

  /** Real-image pHash replay: the fixture pixels box-resampled to the
    * 8×8 grid (the mm_resize CTEs verbatim, renamed into `ph_px`),
    * then [[phashTail]].
    */
  private def imgPhashCtes: String =
    s"""WITH $pixelDocsCte,
        ph_cells AS (
           SELECT doc_id, w, h, i.i AS ox, j.j AS oy
           FROM pxdoc,
             LATERAL (SELECT unnest(range(0, 8)) AS i) i,
             LATERAL (SELECT unnest(range(0, 8)) AS j) j
           WHERE w >= 8 AND h >= 8),
        ph_blocks AS (
           SELECT doc_id, ox, oy,
                  sum((doc_id * 31 + x.x * 7 + y.y * 13) % 256) AS s,
                  count(*) AS c
           FROM ph_cells,
             LATERAL (SELECT unnest(range(ox * w // 8,
               (ox + 1) * w // 8)) AS x) x,
             LATERAL (SELECT unnest(range(oy * h // 8,
               (oy + 1) * h // 8)) AS y) y
           GROUP BY 1, 2, 3),
        ph_px AS (SELECT doc_id, ox AS x, oy AS y, (s // c) AS p
                  FROM ph_blocks),
        $phashTail"""

  /** Closed-form replay of the fixture geometry + [[MultimodalOps
    * .fixturePixel]]: one row per losslessly-encoded doc (PNG stills,
    * id%6=0, 1 frame; animated GIFs, id%3=2, 1+id%4 frames) with its
    * doc_id-derived dims — the shared prefix of every pixel oracle.
    */
  private def pixelDocsCte: String =
    """pxdoc AS (
         SELECT doc_id,
                CASE WHEN doc_id % 3 = 0 THEN 16 + doc_id % 17
                     ELSE 8 + doc_id % 9 END AS w,
                CASE WHEN doc_id % 3 = 0 THEN 12 + doc_id % 13
                     ELSE 8 + doc_id % 7 END AS h,
                CASE WHEN doc_id % 3 = 0 THEN 1
                     ELSE 1 + doc_id % 4 END AS nf
         FROM documents
         WHERE doc_id % 6 = 0 OR doc_id % 3 = 2)"""

  val oracles: Map[String, String] = Map(
    "mm_image_histogram" ->
      s"""WITH $pixelDocsCte,
         px AS (
           SELECT doc_id,
                  (doc_id * 31 + f.f * 101 + x.x * 7 + y.y * 13) % 256
                    AS p
           FROM pxdoc,
             LATERAL (SELECT unnest(range(0, nf)) AS f) f,
             LATERAL (SELECT unnest(range(0, w)) AS x) x,
             LATERAL (SELECT unnest(range(0, h)) AS y) y),
         b AS (
           SELECT doc_id, (p // 16)::BIGINT AS bucket, count(*) AS n
           FROM px GROUP BY 1, 2)
         SELECT bucket, sum(n)::BIGINT AS n_pixels,
                count(*)::BIGINT AS n_images
         FROM b GROUP BY 1""",
    // same sample re-derivation as mm_wav_stats, framed; the segment
    // count is the gaps-and-islands lag window; sub-frame docs restore
    // via LEFT JOIN with 0s
    "mm_audio_vad" ->
      s"""WITH a AS (
           SELECT doc_id, text, octet_length(encode(text)) // 2 AS n
           FROM documents WHERE doc_id % 3 = 1),
         sm AS (
           SELECT doc_id, n // $VadFrame AS nf,
                  list_transform(range(0, n), i ->
                    CAST(ord(substring(text, (1 + 2 * i)::INTEGER, 1)) +
                         256 * ord(substring(text, (2 + 2 * i)::INTEGER,
                           1)) AS BIGINT)) AS ss
           FROM a),
         fr AS (
           SELECT doc_id, f.f AS f,
                  list_sum(list_transform(
                    range($VadFrame * f.f, $VadFrame * f.f + $VadFrame),
                    i -> ss[(i + 1)::INTEGER] * ss[(i + 1)::INTEGER]))
                    AS e
           FROM sm CROSS JOIN LATERAL (
             SELECT unnest(range(0, nf)) AS f) f),
         fa AS (
           SELECT doc_id, f, (e > $VadThr) AS act,
                  lag(e > $VadThr, 1, FALSE) OVER (
                    PARTITION BY doc_id ORDER BY f) AS pact
           FROM fr),
         agg AS (
           SELECT doc_id, count(*) AS nfr,
                  sum(CASE WHEN act THEN 1 ELSE 0 END)::BIGINT
                    AS n_active,
                  sum(CASE WHEN act AND NOT pact THEN 1 ELSE 0 END)
                    ::BIGINT AS n_segments
           FROM fa GROUP BY 1)
         SELECT s.doc_id, COALESCE(g.nfr, 0)::BIGINT AS n_frames,
                COALESCE(g.n_active, 0)::BIGINT AS n_active,
                COALESCE(g.n_segments, 0)::BIGINT AS n_segments,
                CASE WHEN COALESCE(g.nfr, 0) > 0
                  THEN CAST(g.n_active AS DOUBLE) / CAST(g.nfr AS DOUBLE)
                  ELSE 0.0 END AS active_ratio
         FROM sm s LEFT JOIN agg g USING (doc_id)""",
    // the energy-delta sign bits via a lead window over the same frame
    // energies as mm_audio_vad; sub-2-frame docs restore with fp = 0
    "mm_audio_fingerprint" ->
      s"""WITH a AS (
           SELECT doc_id, text, octet_length(encode(text)) // 2 AS n
           FROM documents WHERE doc_id % 3 = 1),
         sm AS (
           SELECT doc_id, n // $VadFrame AS nf,
                  list_transform(range(0, n), i ->
                    CAST(ord(substring(text, (1 + 2 * i)::INTEGER, 1)) +
                         256 * ord(substring(text, (2 + 2 * i)::INTEGER,
                           1)) AS BIGINT)) AS ss
           FROM a),
         fr AS (
           SELECT doc_id, f.f AS f,
                  list_sum(list_transform(
                    range($VadFrame * f.f, $VadFrame * f.f + $VadFrame),
                    i -> ss[(i + 1)::INTEGER] * ss[(i + 1)::INTEGER]))
                    AS e
           FROM sm CROSS JOIN LATERAL (
             SELECT unnest(range(0, nf)) AS f) f),
         bits AS (
           SELECT doc_id, f, e,
                  lead(e) OVER (PARTITION BY doc_id ORDER BY f) AS en
           FROM fr),
         fp AS (
           SELECT doc_id,
                  sum(CASE WHEN f < 59 AND en IS NOT NULL AND en > e
                      THEN 1::BIGINT << f::INTEGER ELSE 0 END)::BIGINT
                    AS fp
           FROM bits GROUP BY 1)
         SELECT s.doc_id, s.nf::BIGINT AS n_frames,
                COALESCE(p.fp, 0)::BIGINT AS fp
         FROM sm s LEFT JOIN fp p USING (doc_id)""",
    // mm_frame_delta's replay wrapped in the above-mean window gate
    "mm_keyframes" ->
      s"""WITH $pixelDocsCte,
         d AS (
           SELECT doc_id, f.f AS frame,
                  abs(((doc_id * 31 + f.f * 101 + x.x * 7 + y.y * 13)
                         % 256) -
                      ((doc_id * 31 + (f.f - 1) * 101 + x.x * 7 +
                          y.y * 13) % 256)) AS d
           FROM pxdoc,
             LATERAL (SELECT unnest(range(1, nf)) AS f) f,
             LATERAL (SELECT unnest(range(0, w)) AS x) x,
             LATERAL (SELECT unnest(range(0, h)) AS y) y
           WHERE nf >= 2),
         sad AS (
           SELECT doc_id, frame::BIGINT AS frame,
                  sum(d)::BIGINT AS sum_abs_delta
           FROM d GROUP BY 1, 2)
         SELECT doc_id, frame, sum_abs_delta,
                sum_abs_delta * (count(*) OVER (PARTITION BY doc_id)) >
                  (sum(sum_abs_delta) OVER (PARTITION BY doc_id))
                  AS is_keyframe
         FROM sad""",
    // samples re-derived from the text payload: the fixture's WAV data
    // chunk IS the UTF-8 text (all-ASCII in this corpus, so high bytes
    // stay < 128 and unsigned reassembly ≡ two's complement)
    "mm_wav_stats" ->
      """WITH a AS (
           SELECT doc_id, text,
                  (1 + doc_id % 2)::INTEGER AS channels,
                  (8000 + (doc_id % 8) * 4000)::INTEGER AS sample_rate,
                  octet_length(encode(text)) // 2 AS n
           FROM documents WHERE doc_id % 3 = 1),
         sm AS (
           SELECT doc_id, channels, sample_rate, n,
                  list_transform(range(0, n), i ->
                    CAST(ord(substring(text, (1 + 2 * i)::INTEGER, 1)) +
                         256 * ord(substring(text, (2 + 2 * i)::INTEGER,
                           1)) AS BIGINT)) AS ss
           FROM a)
         SELECT doc_id, channels, sample_rate,
                CAST(n AS BIGINT) AS n_samples,
                CAST((n * 1000) // (sample_rate * channels) AS BIGINT)
                  AS duration_ms,
                CAST(COALESCE(list_sum(list_transform(ss, v -> v * v)),
                  0) AS BIGINT) AS sum_sq,
                CAST(COALESCE(list_max(list_transform(ss, v -> abs(v))),
                  0) AS BIGINT) AS peak
         FROM sm""",
    "mm_phash" ->
      s"""$phashCtes
          SELECT doc_id, ph FROM ph_w""",
    "mm_phash_image" ->
      s"""$imgPhashCtes
          SELECT doc_id, ph FROM ph_w""",
    // consecutive-frame absolute pixel deltas replayed closed-form:
    // only multi-frame docs (the animated GIFs with nf >= 2) survive
    "mm_frame_delta" ->
      s"""WITH $pixelDocsCte,
         d AS (
           SELECT doc_id, f.f AS frame,
                  abs(((doc_id * 31 + f.f * 101 + x.x * 7 + y.y * 13)
                         % 256) -
                      ((doc_id * 31 + (f.f - 1) * 101 + x.x * 7 +
                          y.y * 13) % 256)) AS d
           FROM pxdoc,
             LATERAL (SELECT unnest(range(1, nf)) AS f) f,
             LATERAL (SELECT unnest(range(0, w)) AS x) x,
             LATERAL (SELECT unnest(range(0, h)) AS y) y
           WHERE nf >= 2)
         SELECT doc_id, frame::BIGINT AS frame,
                sum(d)::BIGINT AS sum_abs_delta,
                max(d)::BIGINT AS max_delta,
                sum(CASE WHEN d != 0 THEN 1 ELSE 0 END)::BIGINT
                  AS n_changed
         FROM d GROUP BY 1, 2""",
    // exact pixel moments + the fixed-point variance over all frames;
    // HUGEINT intermediates land in BIGINT, floor division on
    // non-negative terms matches Scala Long division exactly
    "mm_pixel_stats" ->
      s"""WITH $pixelDocsCte,
         px AS (
           SELECT doc_id,
                  (doc_id * 31 + f.f * 101 + x.x * 7 + y.y * 13) % 256
                    AS p
           FROM pxdoc,
             LATERAL (SELECT unnest(range(0, nf)) AS f) f,
             LATERAL (SELECT unnest(range(0, w)) AS x) x,
             LATERAL (SELECT unnest(range(0, h)) AS y) y)
         SELECT doc_id, count(*)::BIGINT AS n_pixels,
                min(p)::BIGINT AS min_p, max(p)::BIGINT AS max_p,
                (max(p) - min(p))::BIGINT AS contrast,
                sum(p)::BIGINT AS px_sum, sum(p * p)::BIGINT AS px_sq,
                ((count(*) * sum(p * p) - sum(p) * sum(p)) * 1000000
                   // (count(*) * count(*)))::BIGINT AS var_fp,
                (max(p) - min(p)) >= $PxMinContrast AS keep
         FROM px GROUP BY 1""",
    // banding is candidate generation only — the pigeonhole proves the
    // Spark result ≡ this exhaustive pair scan at the threshold
    "mm_phash_dedup" ->
      s"""$phashCtes
          SELECT a.doc_id AS a, b.doc_id AS b,
                 bit_count(xor(a.ph, b.ph))::BIGINT AS hamming
          FROM ph_w a JOIN ph_w b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.ph, b.ph)) <= $PhMaxHam""",
    "mm_decode_features" ->
      s"""WITH $pixelDocsCte,
         px AS (
           SELECT doc_id,
                  (doc_id * 31 + f.f * 101 + x.x * 7 + y.y * 13) % 256
                    AS p
           FROM pxdoc,
             LATERAL (SELECT unnest(range(0, nf)) AS f) f,
             LATERAL (SELECT unnest(range(0, w)) AS x) x,
             LATERAL (SELECT unnest(range(0, h)) AS y) y),
         ps AS (
           SELECT doc_id, sum(p)::BIGINT AS px_sum,
                  sum(p * p)::BIGINT AS px_sq
           FROM px GROUP BY 1)
         SELECT d.doc_id,
           CASE WHEN d.doc_id % 3 = 0 THEN 'image'
                WHEN d.doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           CASE WHEN d.doc_id % 6 = 0 THEN 'png'
                WHEN d.doc_id % 3 = 0 THEN 'jpeg'
                WHEN d.doc_id % 3 = 1 THEN 'wav'
                ELSE 'gif' END AS format,
           (CASE WHEN d.doc_id % 3 = 0 THEN 16 + d.doc_id % 17
                 WHEN d.doc_id % 3 = 2 THEN 8 + d.doc_id % 9
                 ELSE 0 END)::INTEGER AS width,
           (CASE WHEN d.doc_id % 3 = 0 THEN 12 + d.doc_id % 13
                 WHEN d.doc_id % 3 = 2 THEN 8 + d.doc_id % 7
                 ELSE 0 END)::INTEGER AS height,
           (CASE WHEN d.doc_id % 3 = 1 THEN 8000 + (d.doc_id % 8) * 4000
                 ELSE 0 END)::INTEGER AS sample_rate,
           (CASE WHEN d.doc_id % 3 = 1 THEN 1 + d.doc_id % 2
                 ELSE 0 END)::INTEGER AS channels,
           (CASE WHEN d.doc_id % 3 = 0 THEN 1
                 WHEN d.doc_id % 3 = 2 THEN 1 + d.doc_id % 4
                 ELSE 0 END)::INTEGER AS n_frames,
           ps.px_sum, ps.px_sq,
           CASE WHEN d.doc_id % 3 = 1 THEN sha256(d.text) END
             AS payload_sha256
         FROM documents d LEFT JOIN ps ON ps.doc_id = d.doc_id""",
    "mm_frame_sample" ->
      """SELECT doc_id, (f.i * 4)::INTEGER AS frame_no,
           least(32, octet_length(encode(text)) - f.i * 4 * 32)::INTEGER
             AS frame_len
         FROM documents
         CROSS JOIN LATERAL (
           SELECT unnest(range(0,
             ((octet_length(encode(text)) + 32 * 4 - 1) // (32 * 4))::BIGINT))
             AS i) f""",
    // Composited-delta replay: only pixels inside frame f's patch can
    // change (everything else carries over), and the previous value at
    // such a pixel comes from the LATEST earlier frame whose rect
    // covers it (frame 0 covers the whole screen, so a writer always
    // exists). sum/max/changed over the whole screen therefore equal
    // the patch-local aggregates (outside-the-patch deltas are 0, and
    // max over a nonempty patch is >= 0).
    "mm_gif_composite_delta" ->
      """WITH gdoc AS (
           SELECT doc_id, 8 + doc_id % 9 AS sw, 8 + doc_id % 7 AS sh,
                  1 + doc_id % 4 AS nf
           FROM documents WHERE doc_id % 3 = 2 AND doc_id % 4 >= 1),
         rects AS (
           SELECT doc_id, f.f AS f,
                  CASE WHEN f.f = 0 THEN 0
                       ELSE (doc_id + 3 * f.f) % (sw - (1 + sw // 2) + 1)
                  END AS l,
                  CASE WHEN f.f = 0 THEN 0
                       ELSE (doc_id + 5 * f.f) % (sh - (1 + sh // 2) + 1)
                  END AS t,
                  CASE WHEN f.f = 0 THEN sw ELSE 1 + sw // 2 END AS pw,
                  CASE WHEN f.f = 0 THEN sh ELSE 1 + sh // 2 END AS ph
           FROM gdoc, LATERAL (SELECT unnest(range(0, nf)) AS f) f),
         pp AS (
           SELECT r.doc_id, r.f, r.l + u.u AS x, r.t + v.v AS y,
                  (r.doc_id * 31 + r.f * 101 + u.u * 7 + v.v * 13) % 256
                    AS cur
           FROM rects r,
             LATERAL (SELECT unnest(range(0, r.pw)) AS u) u,
             LATERAL (SELECT unnest(range(0, r.ph)) AS v) v
           WHERE r.f >= 1),
         prevw AS (
           SELECT p.doc_id, p.f, p.x, p.y, p.cur, max(r2.f) AS g
           FROM pp p JOIN rects r2 ON r2.doc_id = p.doc_id AND r2.f < p.f
             AND p.x >= r2.l AND p.x < r2.l + r2.pw
             AND p.y >= r2.t AND p.y < r2.t + r2.ph
           GROUP BY 1, 2, 3, 4, 5),
         pv AS (
           SELECT w.doc_id, w.f, w.cur,
                  (w.doc_id * 31 + w.g * 101 + (w.x - r3.l) * 7 +
                     (w.y - r3.t) * 13) % 256 AS prev
           FROM prevw w JOIN rects r3
             ON r3.doc_id = w.doc_id AND r3.f = w.g)
         SELECT doc_id, f::BIGINT AS frame,
                sum(abs(cur - prev))::BIGINT AS sum_abs_delta,
                max(abs(cur - prev))::BIGINT AS max_delta,
                sum(CASE WHEN cur != prev THEN 1 ELSE 0 END)::BIGINT
                  AS n_changed
         FROM pv GROUP BY 1, 2""",
    // frame 0 only (f term = 0) — the Spark side resamples frames.head
    "mm_resize" ->
      s"""WITH $pixelDocsCte,
         cells AS (
           SELECT doc_id, w, h, i.i AS ox, j.j AS oy
           FROM pxdoc,
             LATERAL (SELECT unnest(range(0, 8)) AS i) i,
             LATERAL (SELECT unnest(range(0, 8)) AS j) j
           WHERE w >= 8 AND h >= 8),
         blocks AS (
           SELECT doc_id, ox, oy,
                  sum((doc_id * 31 + x.x * 7 + y.y * 13) % 256) AS s,
                  count(*) AS c
           FROM cells,
             LATERAL (SELECT unnest(range(ox * w // 8,
               (ox + 1) * w // 8)) AS x) x,
             LATERAL (SELECT unnest(range(oy * h // 8,
               (oy + 1) * h // 8)) AS y) y
           GROUP BY 1, 2, 3)
         SELECT doc_id, ox::INTEGER AS ox, oy::INTEGER AS oy,
                (s // c)::BIGINT AS v
         FROM blocks"""
  )
}
