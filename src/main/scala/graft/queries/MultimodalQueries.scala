package graft.queries

import graft.Tables
import graft.operators.MultimodalOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal plumbing as oracle-checked queries: the stub decoder's
  * features are pure functions of the bytes, so DuckDB can recompute them
  * (octet_length / sha256 / modular fake dimensions) — verifying the
  * Spark-side schema, UDF seam, and batch shape even though the codec is
  * stubbed.
  */
object MultimodalQueries {
  type Q = (SparkSession, String) => DataFrame

  val all: Map[String, Q] = Map(
    "mm_decode_features" -> ((s, dir) =>
      MultimodalOps.extractFeatures(
        MultimodalOps.documentsAsMedia(s, Tables.documents(s, dir))).toDF()),

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
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS sha256,
           (octet_length(encode(text)) % 640)::INTEGER AS width,
           ((octet_length(encode(text)) // 7) % 480)::INTEGER AS height,
           (octet_length(encode(text)) // 100 + 1)::INTEGER AS n_frames
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
