package graft.queries

import graft.Tables
import graft.operators.MultimodalOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal plumbing as oracle-checked queries. The decode fixture
  * carries REAL container headers (PNG/JPEG/WAV, built by the
  * [[graft.operators.MediaHeaders]] producer dual with doc_id-derived
  * fields), and the decode stage parses them back from the bytes; the
  * oracle recomputes every field closed-form from doc_id + text, so a
  * parser reading the wrong byte offset fails the hash compare.
  */
object MultimodalQueries {
  type Q = (SparkSession, String) => DataFrame

  val all: Map[String, Q] = Map(
    "mm_decode_features" -> ((s, dir) =>
      MultimodalOps.extractFeatures(
        MultimodalOps.documentsAsEncodedMedia(
          s, Tables.documents(s, dir))).toDF()),

    "mm_frame_sample" -> ((s, dir) =>
      MultimodalOps.sampleFrames(
        MultimodalOps.documentsAsMedia(s, Tables.documents(s, dir)),
        frameSize = 32, stride = 4)
        .select(col("doc_id"), col("frame_no"), length(col("frame"))
          .as("frame_len"))),

    // resize seam: byte-stride downsample to ≤64 bytes, content verified
    // by hash (the oracle rebuilds the identical stride sample).
    // NOTE: the oracle strides CHARACTERS while the operator strides
    // UTF-8 BYTES — equivalent only because the documents fixture is
    // ASCII (verified); a non-ASCII fixture would need a BLOB-based dual.
    "mm_resize" -> ((s, dir) =>
      MultimodalOps.resize(
        MultimodalOps.documentsAsMedia(s, Tables.documents(s, dir)),
        targetBytes = 64)
        .select(col("doc_id"), col("media_type"), col("orig_bytes"),
          col("new_bytes"), md5(col("content")).as("content_hash")))
  )

  val oracles: Map[String, String] = Map(
    "mm_decode_features" ->
      """SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           (octet_length(encode(text)) +
            CASE WHEN doc_id % 3 = 0
                 THEN (CASE WHEN doc_id % 6 = 0 THEN 33 ELSE 15 END)
                 WHEN doc_id % 3 = 1 THEN 44
                 ELSE 0 END)::BIGINT AS n_bytes,
           sha256(text) AS payload_sha256,
           (CASE WHEN doc_id % 3 = 0 THEN 16 + doc_id % 624
                 ELSE 0 END)::INTEGER AS width,
           (CASE WHEN doc_id % 3 = 0 THEN 16 + doc_id % 464
                 ELSE 0 END)::INTEGER AS height,
           (CASE WHEN doc_id % 3 = 1 THEN 8000 + (doc_id % 8) * 4000
                 ELSE 0 END)::INTEGER AS sample_rate,
           (CASE WHEN doc_id % 3 = 1 THEN 1 + doc_id % 2
                 ELSE 0 END)::INTEGER AS channels,
           (CASE WHEN doc_id % 3 = 2
                 THEN octet_length(encode(text)) // 100 + 1
                 WHEN doc_id % 3 = 0 THEN 1
                 ELSE 0 END)::INTEGER AS n_frames
         FROM documents""",
    "mm_frame_sample" ->
      """SELECT doc_id, (f.i * 4)::INTEGER AS frame_no,
           least(32, octet_length(encode(text)) - f.i * 4 * 32)::INTEGER
             AS frame_len
         FROM documents
         CROSS JOIN LATERAL (
           SELECT unnest(range(0,
             ((octet_length(encode(text)) + 32 * 4 - 1) // (32 * 4))::BIGINT))
             AS i) f""",
    "mm_resize" ->
      """WITH t AS (SELECT doc_id, text,
               octet_length(encode(text)) AS n,
               greatest(1, (octet_length(encode(text)) + 63) // 64) AS k
             FROM documents),
          r AS (SELECT doc_id, n, k,
                  array_to_string(list_transform(
                    range(0, (n + k - 1) // k),
                    i -> substring(text, (1 + i * k)::INTEGER, 1)), '') AS rs
                FROM t)
          SELECT doc_id,
            CASE WHEN doc_id % 3 = 0 THEN 'image'
                 WHEN doc_id % 3 = 1 THEN 'audio'
                 ELSE 'video' END AS media_type,
            n::BIGINT AS orig_bytes,
            length(rs)::BIGINT AS new_bytes,
            md5(rs) AS content_hash
          FROM r"""
  )
}
