package graft.queries

import graft.Tables
import graft.operators.{CorpusOps, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-preparation queries over `documents` (segment boilerplate
  * removal, sequence packing, contamination), each with a bit-exact
  * DuckDB oracle replaying the same algorithm.
  */
object CorpusQueries {
  type Q = (SparkSession, String) => DataFrame

  private val SegTokens = 16
  private val MaxDf = 2
  private val PackBudget = 512
  private val EvalPct = 10
  private val ShingleK = 8
  private val VocabV = 24

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)

  val all: Map[String, Q] = Map(
    // Boilerplate removal: fixed-width token segments occurring in >= 2
    // distinct docs are dropped; per-doc counts + kept-text hash.
    "corpus_segment_dedup" -> ((s, dir) =>
      CorpusOps.segmentDedup(docs(s, dir), SegTokens, MaxDf)),

    // GPT-style packing: concat in doc_id order, chunk into 512-token
    // sequences, report each doc's sequence span + offset. Two-phase
    // distributed prefix sum (see CorpusOps.packSequences).
    "corpus_pack_sequences" -> ((s, dir) =>
      CorpusOps.packSequences(docs(s, dir), PackBudget, bucketWidth = 100L)),

    // Contamination: training docs sharing an 8-token shingle with the
    // 10% eval hash-sample.
    "corpus_contamination" -> ((s, dir) =>
      CorpusOps.contamination(docs(s, dir),
        TextOps.hashSample(col("doc_id"), EvalPct, "eval"), ShingleK)),

    // OOV-ratio quality gate: train the top-V vocabulary on the corpus
    // (model state), score every doc's out-of-vocabulary share.
    "corpus_oov_ratio" -> ((s, dir) => {
      val d = docs(s, dir)
      import s.implicits._
      val vocab = CorpusOps.vocabulary(d, VocabV)
        .as[String].collect().toSet
      CorpusOps.oovRatio(vocab)(d).select(col("doc_id"), col("oov_ratio"))
    })
  )

  import Duck.{h15, toks}

  private def segsCte: String =
    s"""p AS (SELECT doc_id, $toks AS parts FROM documents),
        segs AS (
          SELECT doc_id, t.i AS seg_no,
            array_to_string(
              parts[t.i*$SegTokens+1 : t.i*$SegTokens+$SegTokens], ' ')
              AS seg
          FROM p CROSS JOIN LATERAL (
            SELECT unnest(range(0,
              greatest((length(parts) + $SegTokens - 1) // $SegTokens, 1)))
              AS i) t)"""

  val oracles: Map[String, String] = Map(
    "corpus_segment_dedup" ->
      s"""WITH $segsCte,
          boiler AS (SELECT seg FROM (
              SELECT seg, count(DISTINCT doc_id) AS df FROM segs
              GROUP BY seg) WHERE df >= $MaxDf),
          flagged AS (
            SELECT s.doc_id, s.seg_no, s.seg,
                   (b.seg IS NOT NULL) AS is_boiler
            FROM segs s LEFT JOIN boiler b ON s.seg = b.seg)
          SELECT doc_id,
            count(*)::BIGINT AS n_segments,
            count(CASE WHEN NOT is_boiler THEN 1 END)::BIGINT AS n_kept,
            md5(COALESCE(array_to_string(
              list(seg ORDER BY seg_no) FILTER (WHERE NOT is_boiler), ' '),
              '')) AS kept_hash
          FROM flagged GROUP BY doc_id""",
    "corpus_pack_sequences" ->
      s"""WITH t AS (SELECT doc_id, length($toks)::BIGINT AS n_tokens
                     FROM documents),
          c AS (SELECT doc_id, n_tokens,
                  (sum(n_tokens) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   )::BIGINT - n_tokens AS tok_before
                FROM t)
          SELECT doc_id, n_tokens,
            (tok_before // $PackBudget)::BIGINT AS seq_first,
            ((tok_before + n_tokens - 1) // $PackBudget)::BIGINT AS seq_last,
            (tok_before % $PackBudget)::BIGINT AS tok_offset
          FROM c""",
    "corpus_contamination" ->
      s"""WITH d AS (SELECT doc_id, $toks AS tk,
                ${h15("concat('eval:', doc_id::VARCHAR)")} % 100 < $EvalPct
                  AS is_eval
              FROM documents),
          sh AS (SELECT doc_id, is_eval,
                   unnest(list_distinct(list_transform(
                     range(0, greatest(length(tk) - $ShingleK, 0) + 1),
                     i -> array_to_string(tk[i+1:i+$ShingleK], ' '))))
                     AS sh
                 FROM d),
          e AS (SELECT DISTINCT sh FROM sh WHERE is_eval)
          SELECT s.doc_id, count(*)::BIGINT AS n_shared
          FROM sh s JOIN e USING (sh)
          WHERE NOT s.is_eval
          GROUP BY s.doc_id""",
    "corpus_oov_ratio" ->
      s"""WITH tok AS (SELECT doc_id, unnest($toks) AS t FROM documents),
          v AS (SELECT t FROM (
                  SELECT t, count(*) AS f FROM tok GROUP BY t
                  ORDER BY f DESC, t LIMIT $VocabV))
          SELECT tok.doc_id,
            (count(*) FILTER (WHERE v.t IS NULL))::DOUBLE
              / count(*)::DOUBLE AS oov_ratio
          FROM tok LEFT JOIN v ON tok.t = v.t
          GROUP BY tok.doc_id"""
  )
}
