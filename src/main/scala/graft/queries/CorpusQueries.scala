package graft.queries

import graft.Tables
import graft.operators.{CorpusOps, TextOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  // keeps ~52% of the synthetic corpus at both sf0.001 and sf0.01 —
  // a non-vacuous gate (scores span 0.036..0.104; see bigramLmScore)
  private val LmKeepAbove = 0.064
  // 8-token overlap; docs run 10..99 tokens → 1..4 chunks each
  private val ChunkW = 32
  private val ChunkS = 24
  // gopher-rule thresholds, shared verbatim by the operator call and
  // the oracle SQL (one definition, both engines; on this corpus the
  // size/stopword/repetition rules filter, the rest are published
  // bounds clean text passes)
  private val GMinTok = 20
  private val GMaxTok = 1000
  private val GMinWordLen = 3.0
  private val GMaxWordLen = 10.0
  private val GMaxSymbol = 0.1
  private val GMinAlpha = 0.8
  private val GMinStop = 2
  private val GMinDistinct = 0.3
  // train/val/test split fractions (test = remainder)
  private val TrainPct = 80
  private val ValPct = 10
  // DSIR target-domain slice: sources playing the "wiki-like" corpus
  // the importance weights steer toward
  private val DsirTargets = Seq("src0", "src1", "src2")
  // RAG retrieval: every 101st doc plays the query set (5 at 500 docs)
  private val RagQueryMod = 101
  private val RagDims = 64
  private val RagK = 3
  // workload bound: query docs must sit under this id — see the
  // rag_chunk_retrieval registration for the scale rationale
  private val RagQueryCap = 1L << 30
  // BPE merges learned by corpus_bpe_merges / applied by _tokenize
  private val BpeK = 8

  /** Ridge normal-equation solve (corpus_quality_regression): Cramer's
    * rule on A = XᵀX + λI (intercept + 2 features, λ = 1.0, the
    * intercept regularized too — documented choice), over the nine
    * double moment columns (mn, s1, s2, s11, s22, s12, sy, s1y, s2y).
    * ONE string per determinant, rendered into BOTH engines via
    * expr()/SQL splice, so the IEEE trees are identical by construction.
    */
  private val regA00 = "(mn + 1.0)"
  private val regA11 = "(s11 + 1.0)"
  private val regA22 = "(s22 + 1.0)"
  private[queries] val regDet =
    s"$regA00 * ($regA11 * $regA22 - s12 * s12) - " +
      s"s1 * (s1 * $regA22 - s12 * s2) + s2 * (s1 * s12 - $regA11 * s2)"
  private[queries] val regDet0 =
    s"sy * ($regA11 * $regA22 - s12 * s12) - " +
      s"s1 * (s1y * $regA22 - s12 * s2y) + " +
      s"s2 * (s1y * s12 - $regA11 * s2y)"
  private[queries] val regDet1 =
    s"$regA00 * (s1y * $regA22 - s12 * s2y) - " +
      s"sy * (s1 * $regA22 - s12 * s2) + s2 * (s1 * s2y - s1y * s2)"
  private[queries] val regDet2 =
    s"$regA00 * ($regA11 * s2y - s1y * s12) - " +
      s"s1 * (s1 * s2y - s1y * s2) + sy * (s1 * s12 - $regA11 * s2)"

  private def dec38(c: Column): Column = c.cast("decimal(38,10)")

  /** Power-of-two length-bucket ladder (corpus_length_buckets), one
    * shared CASE string for both engines — no log2 (not exactly-rounded
    * IEEE), just the explicit 7-rung ladder over the token count `n`.
    */
  private val LenBucketCap = 1024L
  private[queries] val lenBucketCase: String =
    "CAST(CASE " +
      Seq(16L, 32L, 64L, 128L, 256L, 512L).map(b =>
        s"WHEN n <= $b THEN $b ").mkString +
      s"ELSE $LenBucketCap END AS BIGINT)"

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

    // Packing efficiency dashboard: per-sequence document counts
    // (starting vs continuing — continuing docs are the cross-document
    // attention-contamination surface) and exact fill tokens, derived
    // from the packing grid by exploding each doc's sequence span. The
    // span explode fans out ≤ (n_tokens/budget + 1) rows per doc; the
    // only shuffle is the sequence-grain rollup.
    "corpus_pack_stats" -> ((s, dir) => {
      val packed = CorpusOps.packSequences(docs(s, dir), PackBudget,
        bucketWidth = 100L).filter(col("n_tokens") > 0)
      val before = col("seq_first") * PackBudget + col("tok_offset")
      packed
        .select(col("doc_id"), col("n_tokens"), col("seq_first"),
          before.as("tok_before"),
          explode(sequence(col("seq_first"), col("seq_last"))).as("seq"))
        .groupBy(col("seq"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("seq_first") === col("seq"), 1L).otherwise(0L))
            .as("n_starting"),
          sum(when(col("seq_first") < col("seq"), 1L).otherwise(0L))
            .as("n_continuing"),
          sum(least(col("tok_before") + col("n_tokens"),
              (col("seq") + 1) * PackBudget) -
            greatest(col("tok_before"), col("seq") * PackBudget))
            .as("fill_tokens"))
    }),

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
    }),

    // Classifier-calibration curve: the hashed-linear quality
    // classifier's logit buckets scored against the INDEPENDENT Gopher
    // rule gate — "does the learned score agree with the rules where
    // it is confident", the eval a curation team runs before trusting
    // a model gate. Bucketing floors logit/2000 through doubles (Spark
    // `div` truncates, DuckDB `//` floors — they disagree on the
    // negative logits, floor() does not). One doc-grain join of two
    // scan-side gates + a ≤10-bucket rollup.
    "corpus_quality_calibration" -> ((s, dir) => {
      val clf = TextOps.linearClassify(TextQueries.ClfDims)(docs(s, dir))
      val gop = CorpusOps.gopherGate(GMinTok, GMaxTok, GMinWordLen,
        GMaxWordLen, GMaxSymbol, GMinAlpha, GMinStop, GMinDistinct)(
        docs(s, dir)).select(col("doc_id"), col("keep").as("gopher_ok"))
      clf.join(gop, Seq("doc_id"))
        .withColumn("bucket",
          floor(col("logit").cast("double") / lit(2000.0)).cast("long"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("gopher_ok"), 1L).otherwise(0L))
            .as("n_gopher_ok"))
        .withColumn("gopher_share",
          col("n_gopher_ok").cast("double") / col("n_docs").cast("double"))
    }),

    // T5-style span corruption (the denoising-objective producer):
    // 3-token spans hash-gated at 20% are each replaced by ONE numbered
    // sentinel in the input; the target sequence is sentinel + original
    // tokens per masked span (Raffel et al.'s exact input/target
    // shape). Deterministic across engines/reruns like the dropout
    // augmenter; sentinel numbers are the span's rank among masked
    // spans. Pure scan-side array arithmetic, zero shuffles; token,
    // span-id, and masked-span frames each stage in their own
    // projection (HOF CollapseProject discipline).
    "corpus_span_corruption" -> ((s, dir) => {
      val gate = (g: Column) => pmod(graft.functions.PortableHash.h15(
        concat(lit("span:"), col("doc_id").cast("string"), lit(":"),
          g.cast("string"))), lit(5L)) === 0L
      def sentinel(idx: Column): Column =
        concat(lit("<extra_id_"), idx.cast("string"), lit(">"))
      docs(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("__tk"))
        .select(col("doc_id"), col("__tk"),
          sequence(lit(0), expr("(size(__tk) - 1) div 3")).as("__gid"))
        .select(col("doc_id"), col("__tk"), col("__gid"),
          filter(col("__gid"), gate).as("__mg"))
        .select(col("doc_id"),
          size(col("__tk")).cast("long").as("n_tokens"),
          size(col("__mg")).cast("long").as("n_spans_masked"),
          array_join(flatten(transform(col("__gid"), g =>
            when(gate(g),
              array(sentinel(array_position(col("__mg"), g) - 1)))
              .otherwise(slice(col("__tk"), g * 3 + 1, lit(3))))), " ")
            .as("corrupted_text"),
          array_join(flatten(transform(col("__mg"), g =>
            concat(array(sentinel(array_position(col("__mg"), g) - 1)),
              slice(col("__tk"), g * 3 + 1, lit(3))))), " ")
            .as("targets_text"))
    }),

    // RAG chunking: overlapping 32-token windows every 24 tokens —
    // zero-shuffle scan-side geometry (PlanSpec-pinned).
    "corpus_chunk_sliding" -> ((s, dir) =>
      CorpusOps.chunkSliding(ChunkW, ChunkS)(docs(s, dir))),

    // Deterministic token-dropout augmentation (the text-side
    // aug-multiplicity op of a training pipeline): each (doc, position,
    // token) is dropped iff its portable hash lands in the 10% bucket —
    // reproducible across engines, partitionings, AND reruns (the
    // property real augmentation pipelines need for caching). Pure
    // scan-side array arithmetic, zero shuffles; the kept-token frame
    // stages in its own projection (HOF CollapseProject discipline).
    "corpus_augment_dropout" -> ((s, dir) =>
      docs(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("__tk"))
        .select(col("doc_id"), col("__tk"),
          filter(zip_with(col("__tk"),
            sequence(lit(1), size(col("__tk"))),
            (t, i) => struct(t.as("t"), i.as("i"))),
            e => pmod(graft.functions.PortableHash.h15(
              concat(lit("aug:"), col("doc_id").cast("string"),
                lit(":"), e.getField("i").cast("string"), lit(":"),
                e.getField("t"))), lit(10L)) =!= 0L).as("__kept"))
        .select(col("doc_id"),
          size(col("__tk")).cast("long").as("n_tokens"),
          (size(col("__tk")) - size(col("__kept"))).cast("long")
            .as("n_dropped"),
          array_join(transform(col("__kept"), e => e.getField("t")),
            " ").as("aug_text"))),

    // Deterministic shard assignment + intra-shard order — the
    // pre-trainer "global shuffle" without a global sort (8 shards).
    "corpus_shard_order" -> ((s, dir) =>
      CorpusOps.shardOrder(nShards = 8)(docs(s, dir))),

    // Per-doc top-3 salient terms by rational TF-IDF (transcendental-
    // free idf; see CorpusOps.tfidfTopTerms).
    "corpus_tfidf_terms" -> ((s, dir) =>
      CorpusOps.tfidfTopTerms(k = 3)(docs(s, dir))),

    // Gopher/C4-style composite rule gate with per-rule booleans; the
    // thresholds are the shared G* constants above.
    "corpus_gopher_gate" -> ((s, dir) =>
      CorpusOps.gopherGate(GMinTok, GMaxTok, GMinWordLen, GMaxWordLen,
        GMaxSymbol, GMinAlpha, GMinStop, GMinDistinct)(docs(s, dir))),

    // The dataset card (the one-row summary a dataset release ships):
    // corpus size in docs/tokens, exact-duplicate share (normalized
    // content hash), English share (the langId argmax), and the Gopher
    // quality pass rate — each signal the registered operator's own
    // kernel, composed into ONE per-doc pass + the gate join + one
    // 1-row aggregate (allowlisted). The numbers a reader compares
    // against the per-source corpus_source_quality table.
    "corpus_dataset_card" -> ((s, dir) => {
      val base = docs(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"),
          size(TextOps.tokens(col("text"))).cast("long").as("ntok"),
          TextOps.contentHash(col("text")).as("ch"),
          TextOps.langId(TextOps.tokens(col("text"))).as("lid"))
      val gp = CorpusOps.gopherGate(GMinTok, GMaxTok, GMinWordLen,
          GMaxWordLen, GMaxSymbol, GMinAlpha, GMinStop, GMinDistinct)(
          docs(s, dir))
        .select(col("doc_id"), col("keep"))
      base.join(gp, Seq("doc_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ntok")).as("total_tokens"),
          countDistinct(col("ch")).as("n_distinct"),
          sum(when(col("lid") === "en", 1L).otherwise(0L)).as("n_en"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_pass"))
        .select(col("n_docs"), col("total_tokens"), col("n_distinct"),
          (lit(1.0) - col("n_distinct").cast("double") /
            col("n_docs").cast("double")).as("dup_share"),
          col("n_en"),
          (col("n_en").cast("double") / col("n_docs").cast("double"))
            .as("en_share"),
          col("n_pass"),
          (col("n_pass").cast("double") / col("n_docs").cast("double"))
            .as("gopher_pass_rate"),
          (col("total_tokens").cast("double") /
            col("n_docs").cast("double")).as("mean_doc_tokens"))
    }),

    // Sequence-length bucketing (the batching-efficiency view): docs
    // binned to the next power-of-two token budget (16..1024, longer
    // truncated), reporting per bucket the docs, real tokens, PAD waste
    // if every doc pads to the bucket size, truncation loss, and the
    // pad share — the report that decides bucketed-batching vs packing
    // (corpus_pack_sequences is the packing alternative). The ladder is
    // ONE shared CASE string in both engines; integer arithmetic
    // end-to-end except the final share division. One doc-grain map +
    // one 8-key exchange.
    "corpus_length_buckets" -> ((s, dir) =>
      docs(s, dir).filter(col("text").isNotNull)
        .select(size(TextOps.tokens(col("text"))).cast("long").as("n"))
        .withColumn("b", expr(lenBucketCase))
        .withColumn("eff", least(col("n"), lit(LenBucketCap)))
        .groupBy(col("b"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("eff")).as("tokens"),
          sum(col("b") - col("eff")).as("pad_tokens"),
          sum(greatest(col("n") - lit(LenBucketCap), lit(0L)))
            .as("trunc_tokens"))
        .select(col("b").as("bucket"), col("n_docs"), col("tokens"),
          col("pad_tokens"), col("trunc_tokens"),
          (col("pad_tokens").cast("double") /
            (col("pad_tokens") + col("tokens")).cast("double"))
            .as("pad_share"))),

    // Quality-classifier TRAINING inside the engine: ridge regression
    // (linear probability model, λ=1) of the Gopher keep label on
    // (n_tokens, mean_word_len) — the gate-distillation step a curation
    // team runs to turn a rule gate into a graded score. Closed form,
    // exactly replayable: ONE 1-row aggregate collects the nine exact
    // DECIMAL moments (features are counts / one shared-tree quotient),
    // the 3×3 normal equations solve by Cramer's rule as ONE expression
    // string rendered into BOTH engines (regDet/regW* below), and a
    // second pass scores every doc for SSE/SST/R² (residual squares
    // through DECIMAL so the sums are order-free). The feature frame is
    // checkpointed — training and scoring share one extraction. At
    // 100 TB this is two map-side-combined passes + broadcast model:
    // the same shape as sim_kmeans/forecast, no driver iteration at all.
    "corpus_quality_regression" -> ((s, dir) => {
      val g = CorpusOps.gopherGate(GMinTok, GMaxTok, GMinWordLen,
          GMaxWordLen, GMaxSymbol, GMinAlpha, GMinStop, GMinDistinct)(
          docs(s, dir))
        .select(col("n_tokens").cast("double").as("x1"),
          col("mean_word_len").as("x2"),
          when(col("keep"), lit(1.0)).otherwise(lit(0.0)).as("y"))
        .localCheckpoint(false)
      val mom = g.agg(
        count(lit(1)).cast("double").as("mn"),
        sum(dec38(col("x1"))).as("d1"),
        sum(dec38(col("x2"))).as("d2"),
        sum(dec38(col("x1") * col("x1"))).as("d11"),
        sum(dec38(col("x2") * col("x2"))).as("d22"),
        sum(dec38(col("x1") * col("x2"))).as("d12"),
        sum(dec38(col("y"))).as("dy"),
        sum(dec38(col("x1") * col("y"))).as("d1y"),
        sum(dec38(col("x2") * col("y"))).as("d2y"))
        .select(col("mn"), col("d1").cast("double").as("s1"),
          col("d2").cast("double").as("s2"),
          col("d11").cast("double").as("s11"),
          col("d22").cast("double").as("s22"),
          col("d12").cast("double").as("s12"),
          col("dy").cast("double").as("sy"),
          col("d1y").cast("double").as("s1y"),
          col("d2y").cast("double").as("s2y"))
      val model = mom.select(
        (expr(regDet0) / expr(regDet)).as("w0"),
        (expr(regDet1) / expr(regDet)).as("w1"),
        (expr(regDet2) / expr(regDet)).as("w2"),
        expr("sy / mn").as("ybar"))
      val fit = g.crossJoin(broadcast(model))
        .withColumn("r", col("y") -
          (col("w0") + col("w1") * col("x1") + col("w2") * col("x2")))
        .withColumn("t", col("y") - col("ybar"))
        .agg(count(lit(1)).as("n_docs"),
          sum(dec38(col("r") * col("r"))).as("ssed"),
          sum(dec38(col("t") * col("t"))).as("sstd"))
      fit.crossJoin(broadcast(model))
        .select(col("n_docs"), col("w0"), col("w1"), col("w2"),
          col("ssed").cast("double").as("sse"),
          col("sstd").cast("double").as("sst"),
          (lit(1.0) - col("ssed").cast("double") /
            col("sstd").cast("double")).as("r2"))
    }),

    // Bigram-LM quality gate: the top-V class-bigram model (offline,
    // (V+1)²-bounded) scores every doc's mean smoothed bigram
    // probability in deterministic fixed-point — the engine-exact stand-
    // in for CCNet's KenLM perplexity filter (transcendental-free; see
    // CorpusOps.bigramLmScore). On THIS synthetic corpus (31 distinct
    // tokens) the spread is narrow, so like sim_recall_at_k the gate is
    // an honest regression tripwire, not a quality sieve.
    "corpus_bigram_lm" -> ((s, dir) => bigramScored(s, dir)),

    // CCNet's head/middle/tail split: per-source LM-score terciles
    // (ntile over avg_prob desc, ties to doc_id — deterministic in
    // both engines), each bucket reporting its size and exact mean
    // probability (integer lm_fp/n_bigrams sums, ONE double division).
    // Shares the training + scoring CODE with corpus_bigram_lm but
    // pays its own model (honest per-query cost); docs without bigram
    // evidence are absent, mirroring the LM frame. The ntile window
    // partitions by source; the rollup is bucket-grain.
    "corpus_ccnet_buckets" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source"))
        .orderBy(col("avg_prob").desc, col("doc_id"))
      bigramScored(s, dir)
        .join(docs(s, dir).select(col("doc_id"), col("source")),
          Seq("doc_id"))
        .withColumn("b", ntile(3).over(w))
        .groupBy(col("source"), col("b"))
        .agg(count(lit(1)).as("n_docs"), sum(col("lm_fp")).as("sfp"),
          sum(col("n_bigrams")).as("sbg"))
        .select(col("source"),
          when(col("b") === 1, "head").when(col("b") === 2, "middle")
            .otherwise("tail").as("bucket"),
          col("n_docs"),
          (col("sfp").cast("double") /
            (lit(1000000.0) * col("sbg").cast("double"))).as("mean_prob"))
    }),

    // DSIR importance resampling (Xie et al. 2023): hashed-unigram
    // bucket counts for the target sources vs the whole corpus (model
    // bounded at 4096 rows by construction), per-doc mean target/raw
    // ratio in fixed point, keep gate = hash-Bernoulli with probability
    // nscore/2e6 — deterministic clipped importance sampling. Offline
    // model is one hash aggregate; online scoring is a pure broadcast-
    // model map (zero shuffles, batch ≡ streaming).
    "corpus_dsir_sample" -> ((s, dir) => {
      val d = docs(s, dir)
      val model = CorpusOps.dsirModel(
        col("source").isin(DsirTargets: _*))(d)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq
      val w = CorpusOps.dsirWeights(model)
      // defaultW prices never-seen buckets (ct=0, cr=0 smoothing);
      // unreachable when scoring the modeled corpus itself
      val t = model.map(_._2).sum
      val r = model.map(_._3).sum
      val defaultW = math.floor(1000000.0 *
        (((r + CorpusOps.DsirBuckets).toDouble) /
          ((t + CorpusOps.DsirBuckets).toDouble))).toLong
      CorpusOps.dsirScore(w, defaultW)(d)
    }),

    // End-to-end RAG retrieval: sliding-window chunks (same grid as
    // corpus_chunk_sliding) embedded via the vocabulary-free hashing
    // trick, exact-cosine-ranked against query docs embedded the same
    // way. Sparse integer vectors end to end; query side broadcast;
    // the only fact exchanges are the chunk-vector aggregate and the
    // per-(query, chunk) dot re-aggregate. The doc_id < 2^30 cap pins
    // the QUERY WORKLOAD fixed as the corpus grows (queries are a
    // workload, not data): exact scoring is O(|queries|·|chunks|), and
    // the 10× scale probe measured 258× growth when the query set was
    // allowed to scale with the corpus — with the cap, corpus growth
    // is linear. (No-op at test SFs, where every doc_id < 2^30; a
    // corpus-scaled query set belongs on the ANN/IVF path instead.)
    "rag_chunk_retrieval" -> ((s, dir) =>
      CorpusOps.ragRetrieve(
        pmod(col("doc_id"), lit(RagQueryMod)) === 0 &&
          col("doc_id") < lit(RagQueryCap),
        ChunkW, ChunkS, RagDims, RagK)(docs(s, dir))),

    // Vocabulary growth / lexical-diversity dashboard per source: exact
    // distinct tokens anchor the sf-small oracle; the HLL sketch —
    // what a 100 TB run would actually use, since exact countDistinct
    // is the expensive expand-pass — is graded as an error-bound
    // boolean (approx_user_stats discipline).
    "corpus_vocab_growth" -> ((s, dir) =>
      docs(s, dir)
        .select(col("source"),
          explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("total_tokens"),
          countDistinct(col("token")).as("distinct_tokens"),
          approx_count_distinct(col("token")).as("__ad"))
        .select(col("source"), col("total_tokens"),
          col("distinct_tokens"),
          (col("distinct_tokens").cast("double") /
            col("total_tokens").cast("double")).as("type_token_ratio"),
          (abs(col("__ad") - col("distinct_tokens")) <=
            col("distinct_tokens").cast("double") * lit(0.05))
            .as("vocab_ok"))),

    // End-to-end quality funnel: the three modern gates composed — per-
    // doc booleans from the gopher rules, the bigram-LM gate, and the
    // duplicate-span gate, plus the final admitted verdict (docs with
    // no bigram evidence fail the LM gate: no evidence, no admission).
    // One scan feeds three gate branches that rejoin on doc_id; every
    // model involved is broadcast-sized.
    "corpus_quality_funnel" -> ((s, dir) => {
      val d = docs(s, dir)
      import s.implicits._
      val vocab = CorpusOps.vocabulary(d, VocabV)
        .as[String].collect().toSet
      val gopher = CorpusOps.gopherGate(GMinTok, GMaxTok, GMinWordLen,
          GMaxWordLen, GMaxSymbol, GMinAlpha, GMinStop, GMinDistinct)(d)
        .select(col("doc_id"), col("keep").as("gopher_ok"))
      // size-guarded model apply: bounded limit(cap+1) probe, never an
      // unguarded V²-worst-case collect (bigramLmScoreAuto)
      val lm = CorpusOps.bigramLmScoreAuto(vocab,
          CorpusOps.bigramModel(vocab)(d), VocabV, LmKeepAbove)(d)
        .select(col("doc_id"), col("keep").as("lm_ok"))
      val spans = graft.operators.DedupOps.duplicateSpans(
          DedupQueries.SpanK, DedupQueries.SpanMaxDup)(d)
        .select(col("doc_id"), col("keep").as("span_ok"))
      // gopher is already one row per non-null-text doc — it IS the base
      gopher
        .join(lm, Seq("doc_id"), "left_outer")
        .join(spans, Seq("doc_id"))
        .select(col("doc_id"), col("gopher_ok"),
          coalesce(col("lm_ok"), lit(false)).as("lm_ok"),
          col("span_ok"),
          (col("gopher_ok") && coalesce(col("lm_ok"), lit(false)) &&
            col("span_ok")).as("admitted"))
    }),

    // Mixture rebalancing: every source downsampled to the smallest
    // source's token budget via integer basis-point rates + the salted
    // hash-sample contract — the deterministic uniform-mixture step
    // before packing.
    "corpus_mixture_sample" -> ((s, dir) =>
      CorpusOps.mixtureSample(docs(s, dir))
        .select(col("doc_id"), col("source"))),

    // Temperature mixture (α = 1/2): heavier sources thinned toward
    // √-proportional shares — same hash-gate contract, rates from
    // exactly-rounded sqrt (see CorpusOps.mixtureTemperatureRates).
    "corpus_mixture_temperature" -> ((s, dir) =>
      CorpusOps.mixtureTemperature(docs(s, dir))
        .select(col("doc_id"), col("source"))),

    // Epoch upsampling: every source repeated toward the largest
    // source's token budget (whole epochs + a hash-gated fractional
    // pass) — the dual of the downsampling mixture.
    "corpus_mixture_epochs" -> ((s, dir) =>
      CorpusOps.mixtureUpsample(docs(s, dir))
        .select(col("doc_id"), col("source"), col("epoch"))),

    // Per-source quality dashboard — the rollup a curation team reads:
    // every text_* signal plus OOV, grouped by source. Per-doc signals
    // are narrow scan-side expressions (WSCG); ratio averages go
    // through exact DECIMAL sums so the group aggregate is
    // order-independent; the only data shuffle is the rollup itself
    // (countDistinct adds its expand pass over the same exchange).
    // PII share uses the same deterministic doc_id%3 augmentation as
    // text_redact so the redaction signal does real work on the
    // synthetic corpus.
    "corpus_source_quality" -> ((s, dir) => {
      val d = docs(s, dir)
      import s.implicits._
      val vocab = CorpusOps.vocabulary(d, VocabV)
        .as[String].collect().toSet
      val aug = CorpusOps.oovRatio(vocab)(d).withColumn("t",
        when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" contact user"),
            col("doc_id").cast("string"),
            lit("@example.com tel 555-123-4567")))
          .otherwise(col("text")))
      val q = TextOps.qualityColumns(col("text")).toMap
      val r = TextOps.repetitionColumns(col("text")).toMap
      def dec38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,10)")
      val perDoc = aug.select(col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"),
        TextOps.langId(TextOps.tokens(col("text"))).as("lid"),
        TextOps.contentHash(col("text")).as("content_hash"),
        q("punct_ratio").as("punct_ratio"),
        q("stopword_ratio").as("stopword_ratio"),
        r("token_distinct_ratio").as("token_distinct_ratio"),
        ((size(regexp_extract_all(col("t"),
            lit(TextOps.emailPattern), lit(0))) +
          size(regexp_extract_all(col("t"),
            lit(TextOps.phonePattern), lit(0)))) > 0).as("has_pii"),
        col("oov_ratio"))
      perDoc.groupBy(col("source")).agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          countDistinct(col("content_hash")).as("n_distinct"),
          sum(when(col("lid") =!= "und", 1L).otherwise(0L)).as("n_lang"),
          sum(when(col("has_pii"), 1L).otherwise(0L)).as("n_pii"),
          sum(dec38(col("punct_ratio"))).as("punct_dec"),
          sum(dec38(col("stopword_ratio"))).as("stop_dec"),
          sum(dec38(col("token_distinct_ratio"))).as("dist_dec"),
          sum(dec38(col("oov_ratio"))).as("oov_dec"))
        .select(col("source"), col("n_docs"), col("total_tokens"),
          (col("total_tokens").cast("double") /
            col("n_docs").cast("double")).as("avg_tokens"),
          (col("n_lang").cast("double") /
            col("n_docs").cast("double")).as("lang_known_share"),
          (lit(1.0) - col("n_distinct").cast("double") /
            col("n_docs").cast("double")).as("exact_dup_share"),
          (col("n_pii").cast("double") /
            col("n_docs").cast("double")).as("pii_doc_share"),
          (col("punct_dec").cast("double") /
            col("n_docs").cast("double")).as("avg_punct_ratio"),
          (col("stop_dec").cast("double") /
            col("n_docs").cast("double")).as("avg_stopword_ratio"),
          (col("dist_dec").cast("double") /
            col("n_docs").cast("double")).as("avg_distinct_ratio"),
          (col("oov_dec").cast("double") /
            col("n_docs").cast("double")).as("avg_oov_ratio"))
    }),

    // Leakage-proof train/val/test split: bucket on the CONTENT hash so
    // exact duplicates can never straddle splits (see
    // CorpusOps.splitLeakproof). Pure scan-side map, zero shuffles.
    "corpus_split" -> ((s, dir) =>
      CorpusOps.splitLeakproof(TrainPct, ValPct)(docs(s, dir))),

    // BPE tokenizer training (Sennrich-style, word-frequency
    // formulation): the k highest-frequency adjacent-symbol merges,
    // learned iteratively. The only corpus-scale operation is the one
    // word-count shuffle; each of the k iterations runs on the
    // model-bounded vocabulary frame (see CorpusOps.bpeMerges). The
    // oracle replays every iteration — pair counts, deterministic
    // argmax, and the greedy left-to-right merge apply (gaps-and-islands
    // replay of the Spark-side fold).
    "corpus_bpe_merges" -> ((s, dir) =>
      CorpusOps.bpeMerges(docs(s, dir), BpeK)),

    // ...and the trained tokenizer applied back to the corpus: per-doc
    // word and BPE-token counts under the learned segmentation — the
    // train-offline/apply-online split (vocab model broadcast; the
    // corpus never shuffles on the word key).
    "corpus_bpe_tokenize" -> ((s, dir) =>
      CorpusOps.bpeTokenCounts(docs(s, dir),
        CorpusOps.bpeTrain(docs(s, dir), BpeK)._2)),

    // Tokenizer compression curve: corpus token total and fertility
    // after each of the first 0..k merges — the diminishing-returns
    // plot a tokenizer team sizes its vocabulary from. One vocab-grain
    // 1-row aggregate per point inside the one training loop.
    "corpus_bpe_curve" -> ((s, dir) =>
      CorpusOps.bpeCompressionCurve(docs(s, dir), BpeK)),

    // Tokenizer fertility per source (BPE tokens / word) — the
    // vocabulary-fit dashboard. One rollup shuffle over the per-doc
    // counts; fertility is the one shared double expression.
    "corpus_bpe_fertility" -> ((s, dir) => {
      val d = docs(s, dir)
      CorpusOps.bpeTokenCounts(d, CorpusOps.bpeTrain(d, BpeK)._2)
        .join(d.select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("total_words"),
          sum(col("n_bpe_tokens")).as("total_bpe_tokens"))
        .select(col("source"), col("n_docs"), col("total_words"),
          col("total_bpe_tokens"),
          (col("total_bpe_tokens").cast("double") /
            col("total_words").cast("double")).as("fertility"))
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
    // pack-stats replay: the same prefix-sum chain as
    // corpus_pack_sequences, then the span explode + sequence rollup
    "corpus_pack_stats" ->
      s"""WITH t AS (SELECT doc_id, length($toks)::BIGINT AS n_tokens
                     FROM documents),
          c AS (SELECT doc_id, n_tokens,
                  (sum(n_tokens) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   )::BIGINT - n_tokens AS tok_before
                FROM t),
          p AS (SELECT doc_id, n_tokens, tok_before,
                  (tok_before // $PackBudget)::BIGINT AS sf,
                  ((tok_before + n_tokens - 1) // $PackBudget)::BIGINT
                    AS sl
                FROM c WHERE n_tokens > 0),
          x AS (SELECT p.doc_id, p.n_tokens, p.tok_before, p.sf, p.sl,
                  u.s
                FROM p CROSS JOIN LATERAL (
                  SELECT unnest(range(sf, sl + 1)) AS s) u)
          SELECT s::BIGINT AS seq, count(*)::BIGINT AS n_docs,
            CAST(sum(CASE WHEN sf = s THEN 1 ELSE 0 END) AS BIGINT)
              AS n_starting,
            CAST(sum(CASE WHEN sf < s THEN 1 ELSE 0 END) AS BIGINT)
              AS n_continuing,
            CAST(sum(least(tok_before + n_tokens, (s+1) * $PackBudget)
                   - greatest(tok_before, s * $PackBudget)) AS BIGINT)
              AS fill_tokens
          FROM x GROUP BY s""",

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
    "rag_chunk_retrieval" -> {
      val (wnd, st, b, m) = (ChunkW, ChunkS, RagDims, RagQueryMod)
      s"""WITH d AS (SELECT doc_id, $toks AS tk FROM documents
                     WHERE text IS NOT NULL),
          ct AS (
            SELECT doc_id, t.i::BIGINT AS chunk_no,
                   unnest(tk[t.i*$st+1 : t.i*$st+$wnd]) AS term
            FROM (SELECT * FROM d
                  WHERE NOT (doc_id % $m = 0 AND doc_id < ${RagQueryCap})) cd
            CROSS JOIN LATERAL (
              SELECT unnest(range(0,
                (greatest(length(tk) - $wnd, 0) + ${st - 1})
                  // $st + 1)) AS i) t),
          cv AS (
            SELECT doc_id, chunk_no, hv % $b AS dim,
                   sum(CASE WHEN (hv // $b) % 2 = 0 THEN 1 ELSE -1
                     END)::BIGINT AS v
            FROM (SELECT doc_id, chunk_no,
                    ${h15("concat('rag:', term)")} AS hv FROM ct)
            GROUP BY 1, 2, 3),
          qv AS (
            SELECT query_id, hv % $b AS dim,
                   sum(CASE WHEN (hv // $b) % 2 = 0 THEN 1 ELSE -1
                     END)::BIGINT AS v
            FROM (SELECT doc_id AS query_id,
                    ${h15("concat('rag:', term)")} AS hv
                  FROM (SELECT doc_id, unnest(tk) AS term FROM d
                        WHERE doc_id % $m = 0
                          AND doc_id < ${RagQueryCap}))
            GROUP BY 1, 2),
          cn AS (SELECT doc_id, chunk_no, sum(v*v)::BIGINT AS cn
                 FROM cv GROUP BY 1, 2),
          qn AS (SELECT query_id, sum(v*v)::BIGINT AS qn
                 FROM qv GROUP BY 1),
          dt AS (
            SELECT q.query_id, c.doc_id, c.chunk_no,
                   sum(c.v * q.v)::BIGINT AS dot
            FROM cv c JOIN qv q USING (dim) GROUP BY 1, 2, 3),
          sc AS (
            SELECT dt.query_id, dt.doc_id, dt.chunk_no, dt.dot,
                   CAST(dot AS DOUBLE) /
                     (sqrt(CAST(cn AS DOUBLE)) * sqrt(CAST(qn AS DOUBLE)))
                     AS cos
            FROM dt JOIN cn USING (doc_id, chunk_no)
                    JOIN qn USING (query_id)
            WHERE cn > 0 AND qn > 0)
          SELECT query_id, doc_id, chunk_no, dot, cos, rank
          FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, doc_id, chunk_no) AS rank
                FROM sc)
          WHERE rank <= $RagK"""
    },
    "corpus_dsir_sample" -> {
      val targets = DsirTargets.map(s => s"'$s'").mkString(", ")
      val B = CorpusOps.DsirBuckets
      s"""WITH bkt AS (
            SELECT doc_id, source,
                   ${h15("concat('dsir:', t)")} % $B AS b
            FROM (SELECT doc_id, source, unnest($toks) AS t
                  FROM documents)),
          cnt AS (
            SELECT b,
                   sum(CASE WHEN source IN ($targets) THEN 1 ELSE 0
                     END)::BIGINT AS ct,
                   count(*)::BIGINT AS cr
            FROM bkt GROUP BY b),
          tot AS (SELECT sum(ct)::BIGINT AS ttot,
                         sum(cr)::BIGINT AS rtot FROM cnt),
          w AS (
            SELECT b,
                   floor(1000000.0 *
                     ((CAST(ct + 1 AS DOUBLE) *
                       CAST(rtot + $B AS DOUBLE)) /
                      (CAST(cr + 1 AS DOUBLE) *
                       CAST(ttot + $B AS DOUBLE))))::BIGINT AS w
            FROM cnt CROSS JOIN tot),
          sc AS (
            SELECT bkt.doc_id, count(*)::BIGINT AS n,
                   sum(w.w)::BIGINT AS fp
            FROM bkt JOIN w USING (b) GROUP BY 1)
          SELECT d.doc_id,
                 coalesce(sc.n, 0) AS n_tokens,
                 coalesce(sc.fp, 0) AS score_fp,
                 sc.fp // sc.n AS nscore_fp,
                 CASE WHEN coalesce(sc.n, 0) > 0
                   THEN ${h15("concat('dsirkeep:', d.doc_id::VARCHAR)")}
                     % ${CorpusOps.DsirClip} < (sc.fp // sc.n)
                   ELSE false END AS keep
          FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id"""
    },
    "corpus_oov_ratio" ->
      s"""WITH tok AS (SELECT doc_id, unnest($toks) AS t FROM documents),
          v AS (SELECT t FROM (
                  SELECT t, count(*) AS f FROM tok GROUP BY t
                  ORDER BY f DESC, t LIMIT $VocabV))
          SELECT tok.doc_id,
            (count(*) FILTER (WHERE v.t IS NULL))::DOUBLE
              / count(*)::DOUBLE AS oov_ratio
          FROM tok LEFT JOIN v ON tok.t = v.t
          GROUP BY tok.doc_id""",
    "corpus_quality_calibration" ->
      s"""WITH j AS (
            SELECT c.doc_id, c.logit, g.keep AS gopher_ok
            FROM (${TextQueries.clfSql}) c
            JOIN ($gopherSql) g USING (doc_id)),
          b AS (
            SELECT floor(CAST(logit AS DOUBLE) / 2000.0)::BIGINT
                     AS bucket, gopher_ok
            FROM j),
          a AS (
            SELECT bucket, count(*) AS n_docs,
                   CAST(sum(CASE WHEN gopher_ok THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_gopher_ok
            FROM b GROUP BY 1)
          SELECT bucket, n_docs, n_gopher_ok,
                 CAST(n_gopher_ok AS DOUBLE) / CAST(n_docs AS DOUBLE)
                   AS gopher_share
          FROM a""",
    "corpus_span_corruption" -> {
      val gateE = (g: String) =>
        h15(s"concat('span:', doc_id::VARCHAR, ':', $g::VARCHAR)") +
          " % 5 = 0"
      s"""WITH d AS (SELECT doc_id, $toks AS tk FROM documents
                     WHERE text IS NOT NULL),
          g AS (SELECT doc_id, tk,
                  range(0, (len(tk) - 1) // 3 + 1) AS gid
                FROM d),
          m AS (SELECT doc_id, tk, gid,
                  list_filter(gid, gg -> ${gateE("gg")}) AS mg
                FROM g)
          SELECT doc_id, len(tk)::BIGINT AS n_tokens,
                 len(mg)::BIGINT AS n_spans_masked,
                 array_to_string(flatten(list_transform(gid, gg ->
                   CASE WHEN list_position(mg, gg) > 0
                     THEN ['<extra_id_' ||
                           (list_position(mg, gg) - 1)::VARCHAR || '>']
                     ELSE tk[gg*3+1 : gg*3+3] END)), ' ')
                   AS corrupted_text,
                 COALESCE(array_to_string(flatten(list_transform(mg,
                   gg -> ['<extra_id_' ||
                          (list_position(mg, gg) - 1)::VARCHAR || '>'] ||
                   tk[gg*3+1 : gg*3+3])), ' '), '') AS targets_text
          FROM m"""
    },
    "corpus_augment_dropout" ->
      s"""WITH d AS (SELECT doc_id, $toks AS tk FROM documents
                     WHERE text IS NOT NULL),
          k AS (SELECT doc_id, tk,
                  list_filter(list_zip(tk, range(1, len(tk) + 1)),
                    x -> ${h15("concat('aug:', doc_id::VARCHAR, ':', " +
                      "x[2]::VARCHAR, ':', x[1])")} % 10 <> 0) AS kept
                FROM d)
          SELECT doc_id, len(tk)::BIGINT AS n_tokens,
                 (len(tk) - len(kept))::BIGINT AS n_dropped,
                 array_to_string(list_transform(kept, x -> x[1]), ' ')
                   AS aug_text
          FROM k""",
    "corpus_chunk_sliding" ->
      s"""WITH d AS (SELECT doc_id, $toks AS tk FROM documents),
          c AS (SELECT doc_id, tk, t.i AS chunk_no
                FROM d CROSS JOIN LATERAL (
                  SELECT unnest(range(0,
                    (greatest(length(tk) - $ChunkW, 0) + ${ChunkS - 1})
                      // $ChunkS + 1)) AS i) t)
          SELECT doc_id, chunk_no::BIGINT AS chunk_no,
            (chunk_no * $ChunkS)::BIGINT AS chunk_start,
            length(tk[chunk_no*$ChunkS+1 : chunk_no*$ChunkS+$ChunkW])::BIGINT
              AS n_tokens,
            md5(array_to_string(
              tk[chunk_no*$ChunkS+1 : chunk_no*$ChunkS+$ChunkW], ' '))
              AS chunk_hash
          FROM c""",
    "corpus_shard_order" ->
      s"""WITH h AS (SELECT doc_id,
                ${h15("concat('shard:', doc_id::VARCHAR)")} AS hv
              FROM documents)
          SELECT doc_id, hv % 8 AS shard,
            (row_number() OVER (PARTITION BY hv % 8
               ORDER BY hv, doc_id) - 1)::BIGINT AS pos
          FROM h""",
    "corpus_tfidf_terms" ->
      s"""WITH tf AS (SELECT doc_id, t.term, count(*)::BIGINT AS tf
                      FROM (SELECT doc_id, unnest($toks) AS term
                            FROM documents) t
                      GROUP BY doc_id, t.term),
          df AS (SELECT term, count(*)::BIGINT AS df FROM tf
                 GROUP BY term),
          n AS (SELECT count(*)::BIGINT AS nn FROM documents
                WHERE text IS NOT NULL),
          sc AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
                   (tf.tf::DOUBLE * nn::DOUBLE) / df.df::DOUBLE AS score
                 FROM tf JOIN df USING (term) CROSS JOIN n)
          SELECT doc_id, term, tf, df, score, rank FROM (
            SELECT doc_id, term, tf, df, score,
              row_number() OVER (PARTITION BY doc_id
                ORDER BY score DESC, term)::BIGINT AS rank
            FROM sc)
          WHERE rank <= 3""",
    "corpus_gopher_gate" -> gopherSql,
    "corpus_quality_regression" -> regressionSql,
    "corpus_dataset_card" ->
      s"""WITH base AS (
            SELECT doc_id, length($toks)::BIGINT AS ntok,
                   md5(regexp_replace(lower(trim(text)), '\\s+', ' ',
                     'g')) AS ch,
                   ${TextQueries.langCase} AS lid
            FROM documents WHERE text IS NOT NULL),
          gp AS (SELECT doc_id, keep FROM ($gopherSql)),
          agg AS (
            SELECT count(*) AS n_docs, sum(ntok)::BIGINT AS total_tokens,
                   count(DISTINCT ch) AS n_distinct,
                   sum(CASE WHEN lid = 'en' THEN 1 ELSE 0 END)::BIGINT
                     AS n_en,
                   sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT
                     AS n_pass
            FROM base JOIN gp USING (doc_id))
          SELECT n_docs, total_tokens, n_distinct,
                 1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_docs AS DOUBLE)
                   AS dup_share,
                 n_en,
                 CAST(n_en AS DOUBLE) / CAST(n_docs AS DOUBLE)
                   AS en_share,
                 n_pass,
                 CAST(n_pass AS DOUBLE) / CAST(n_docs AS DOUBLE)
                   AS gopher_pass_rate,
                 CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE)
                   AS mean_doc_tokens
          FROM agg""",
    "corpus_length_buckets" ->
      s"""WITH t AS (SELECT length($toks)::BIGINT AS n FROM documents
                     WHERE text IS NOT NULL),
          bb AS (SELECT n, $lenBucketCase AS b,
                   least(n, $LenBucketCap) AS eff FROM t),
          g AS (SELECT b, count(*) AS n_docs,
                  sum(eff)::BIGINT AS tokens,
                  sum(b - eff)::BIGINT AS pad_tokens,
                  sum(greatest(n - $LenBucketCap, 0))::BIGINT
                    AS trunc_tokens
                FROM bb GROUP BY 1)
          SELECT b AS bucket, n_docs, tokens, pad_tokens, trunc_tokens,
                 CAST(pad_tokens AS DOUBLE) /
                   CAST(pad_tokens + tokens AS DOUBLE) AS pad_share
          FROM g""",
    "corpus_bigram_lm" ->
      // same replay: top-V vocab (ties to smaller token), class map via
      // positional LEFT JOIN + lead() pairs, bigram/context counts,
      // floor-fixed-point smoothed probability; LEFT JOINs + COALESCE 0
      // mirror the operator's getOrElse(0) for models that did not see
      // a pair (self-trained models always do — belt and braces)
      bigramSql,
    // the SAME LM replay as a subquery, tercile'd per source; mean is
    // exact integer sums with one double division (the bigramSql
    // denominator style)
    "corpus_ccnet_buckets" ->
      s"""SELECT source,
            CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
              ELSE 'tail' END AS bucket,
            count(*)::BIGINT AS n_docs,
            CAST(sum(lm_fp) AS BIGINT)::DOUBLE /
              (1000000.0 * CAST(sum(n_bigrams) AS BIGINT))::DOUBLE
              AS mean_prob
          FROM (
            SELECT d.source, l.doc_id, l.lm_fp, l.n_bigrams,
              ntile(3) OVER (PARTITION BY d.source
                ORDER BY l.avg_prob DESC, l.doc_id) AS b
            FROM ($bigramSql) l JOIN documents d USING (doc_id))
          GROUP BY 1, 2""",
    "corpus_vocab_growth" ->
      s"""SELECT source, count(*)::BIGINT AS total_tokens,
            count(DISTINCT t)::BIGINT AS distinct_tokens,
            count(DISTINCT t)::DOUBLE / count(*)::DOUBLE
              AS type_token_ratio,
            true AS vocab_ok
          FROM (SELECT source, unnest($toks) AS t FROM documents)
          GROUP BY source""",
    // the funnel oracle IS the three gate oracles, composed verbatim as
    // subqueries — one definition per gate, so the funnel cannot drift
    "corpus_quality_funnel" ->
      // the gopher subquery is already one row per non-null-text doc
      s"""SELECT g.doc_id,
            g.keep AS gopher_ok,
            COALESCE(l.keep, false) AS lm_ok,
            sp.keep AS span_ok,
            (g.keep AND COALESCE(l.keep, false) AND sp.keep) AS admitted
          FROM ($gopherSql) g
          LEFT JOIN ($bigramSql) l USING (doc_id)
          JOIN (${DedupQueries.spansSql}) sp USING (doc_id)""",
    "corpus_mixture_sample" ->
      s"""WITH n AS (SELECT doc_id, source, length($toks)::BIGINT AS nt
                     FROM documents),
          tot AS (SELECT source, CAST(sum(nt) AS BIGINT) AS ts
                  FROM n GROUP BY source),
          mn AS (SELECT min(ts) AS mt FROM tot),
          bp AS (SELECT source, (mt * 10000) // ts AS bp FROM tot, mn)
          SELECT d.doc_id, d.source
          FROM documents d JOIN bp USING (source)
          WHERE ${h15("concat('mix:', doc_id::VARCHAR)")} % 10000 < bp.bp""",
    "corpus_mixture_temperature" ->
      s"""WITH n AS (SELECT doc_id, source, length($toks)::BIGINT AS nt
                     FROM documents),
          tot AS (SELECT source, CAST(sum(nt) AS BIGINT) AS ts
                  FROM n GROUP BY source),
          s AS (SELECT list_reduce(list(sqrt(ts::DOUBLE) ORDER BY source),
                         (a, b) -> a + b) AS sv,
                       CAST(sum(ts) AS BIGINT) AS tt
                FROM tot),
          bp AS (SELECT source,
                   least(10000, floor(10000.0 *
                     (((tt::DOUBLE * sqrt(ts::DOUBLE)) / sv)
                       / ts::DOUBLE))::BIGINT) AS bp
                 FROM tot, s)
          SELECT d.doc_id, d.source
          FROM documents d JOIN bp USING (source)
          WHERE ${h15("concat('temp:', doc_id::VARCHAR)")} % 10000
            < bp.bp""",
    "corpus_mixture_epochs" ->
      s"""WITH n AS (SELECT doc_id, source, length($toks)::BIGINT AS nt
                     FROM documents),
          tot AS (SELECT source, CAST(sum(nt) AS BIGINT) AS ts
                  FROM n GROUP BY source),
          mx AS (SELECT max(ts) AS mt FROM tot),
          bp AS (SELECT source, (mt * 10000) // ts AS bp FROM tot, mx)
          SELECT d.doc_id, d.source, e.epoch
          FROM documents d
          JOIN bp USING (source)
          CROSS JOIN LATERAL (
            SELECT unnest(range(0, bp.bp // 10000 + 1)) AS epoch) e
          WHERE e.epoch < bp.bp // 10000
             OR ${h15("concat('epoch:', doc_id::VARCHAR)")} % 10000
                < bp.bp % 10000""",
    "corpus_source_quality" -> sourceQualitySql,

    // split replay: same normalized-content md5, same salted portable
    // hash, same bucket thresholds (one Scala definition, both engines)
    "corpus_split" ->
      s"""WITH c AS (SELECT doc_id,
                       md5(regexp_replace(lower(trim(text)),
                                          '\\s+', ' ', 'g')) AS content_hash
                     FROM documents WHERE text IS NOT NULL),
          b AS (SELECT doc_id, content_hash,
                  ${h15("concat('split:', content_hash)")} % 100 AS bkt
                FROM c)
          SELECT doc_id, content_hash,
            CASE WHEN bkt < $TrainPct THEN 'train'
                 WHEN bkt < ${TrainPct + ValPct} THEN 'val'
                 ELSE 'test' END AS split
          FROM b""",

    // BPE training replay: every iteration's pair counts, argmax, and
    // greedy merge apply (see bpeCtes); the merge table is the UNION of
    // the per-iteration argmax rows.
    "corpus_bpe_merges" ->
      s"""WITH $bpeCtes
          ${(1 to BpeK).map(i =>
            s"""SELECT ${i}::BIGINT AS rank, x AS lhs, y AS rhs,
                x || y AS merged, f AS freq FROM bpe_b$i""")
          .mkString(" UNION ALL ")}""",
    "corpus_bpe_tokenize" ->
      s"""WITH $bpeCtes,
          $bpeApplyCtes
          SELECT d.doc_id, COALESCE(b.n_words, 0)::BIGINT AS n_words,
            COALESCE(b.n_bpe_tokens, 0)::BIGINT AS n_bpe_tokens
          FROM documents d LEFT JOIN bpe_d b ON b.doc_id = d.doc_id""",

    // Compression-curve replay: one 1-row sum per training state
    // bpe_w0..bpe_wK; the fertility division is the same
    // BIGINT→DOUBLE expression both engines evaluate.
    "corpus_bpe_curve" ->
      s"""WITH $bpeCtes
          ${(0 to BpeK).map(i =>
            s"""SELECT ${i}::BIGINT AS rank,
                CAST(sum(cnt * length(string_split(sym, ' '))) AS BIGINT)
                  AS total_tokens,
                CAST(sum(cnt) AS BIGINT) AS total_words,
                CAST(sum(cnt * length(string_split(sym, ' '))) AS BIGINT)
                  ::DOUBLE / CAST(sum(cnt) AS BIGINT)::DOUBLE AS fertility
                FROM bpe_w$i""").mkString(" UNION ALL ")}""",

    // Tokenizer fertility dashboard: BPE tokens per word, rolled up by
    // source — the report a tokenizer team reads to find domains the
    // vocabulary serves poorly. Shares the training + apply CTE chains
    // verbatim with corpus_bpe_tokenize (no drift by construction).
    "corpus_bpe_fertility" ->
      s"""WITH $bpeCtes,
          $bpeApplyCtes
          SELECT d.source, count(*)::BIGINT AS n_docs,
            CAST(sum(COALESCE(b.n_words, 0)) AS BIGINT) AS total_words,
            CAST(sum(COALESCE(b.n_bpe_tokens, 0)) AS BIGINT)
              AS total_bpe_tokens,
            CAST(sum(COALESCE(b.n_bpe_tokens, 0)) AS BIGINT)::DOUBLE
              / CAST(sum(COALESCE(b.n_words, 0)) AS BIGINT)::DOUBLE
              AS fertility
          FROM documents d LEFT JOIN bpe_d b ON b.doc_id = d.doc_id
          GROUP BY d.source"""
  )

  /** The trained-tokenizer APPLY tail (per-word symbol counts joined
    * back to the corpus tokens), shared by `corpus_bpe_tokenize` and
    * `corpus_bpe_fertility`.
    */
  private def bpeApplyCtes: String =
    s"""bpe_n AS MATERIALIZED (SELECT word,
             length(string_split(sym, ' '))::BIGINT AS n_sym
           FROM bpe_w$BpeK),
        bpe_d AS MATERIALIZED (SELECT t.doc_id, count(*)::BIGINT AS n_words,
             sum(n.n_sym)::BIGINT AS n_bpe_tokens
           FROM bpe_tok t JOIN bpe_n n ON n.word = t.t GROUP BY 1)"""

  /** BPE training replay chain: the word-count base `bpe_w0`, then
    * `BpeK` unrolled iterations. Iteration i: split the symbol string
    * (`bpe_a`), enumerate adjacent pairs (`bpe_p`), count + argmax with
    * the (freq desc, pair asc) tiebreak (`bpe_b`), find match positions
    * (`bpe_m`), keep every other match inside consecutive runs —
    * gaps-and-islands, ≡ the Spark fold's greedy left-to-right scan
    * (`bpe_g`) — and rebuild the symbol string, dropping the consumed
    * right element and substituting the merged symbol (`bpe_w`).
    */
  private def bpeCtes: String = {
    val bs1 = "\\1" // regex backreference, kept out of the s-interpolation
    val iters = (1 to BpeK).map { i =>
      s"""bpe_a$i AS MATERIALIZED (SELECT word, cnt, string_split(sym, ' ') AS a
                 FROM bpe_w${i - 1}),
          bpe_p$i AS MATERIALIZED (SELECT a.word, a.cnt, t.j,
                   a.a[t.j+1] AS x, a.a[t.j+2] AS y
                 FROM bpe_a$i a CROSS JOIN LATERAL (
                   SELECT unnest(range(0, length(a.a) - 1)) AS j) t),
          bpe_b$i AS MATERIALIZED (SELECT x, y, f FROM (
                   SELECT x, y, sum(cnt)::BIGINT AS f
                   FROM bpe_p$i GROUP BY 1, 2)
                 ORDER BY f DESC, x, y LIMIT 1),
          bpe_m$i AS MATERIALIZED (SELECT p.word, p.j FROM bpe_p$i p JOIN bpe_b$i b
                   ON p.x = b.x AND p.y = b.y),
          bpe_g$i AS MATERIALIZED (SELECT word, j FROM (
                   SELECT word, j,
                     (j - min(j) OVER (PARTITION BY word, grp)) % 2 = 0
                       AS app
                   FROM (SELECT word, j,
                           j - row_number() OVER (PARTITION BY word
                             ORDER BY j) AS grp
                         FROM bpe_m$i)) WHERE app),
          bpe_w$i AS MATERIALIZED (SELECT s.word, s.cnt,
                   array_to_string(list(CASE WHEN g1.j IS NOT NULL
                       THEN b.x || b.y ELSE s.e END ORDER BY s.j), ' ')
                     AS sym
                 FROM (SELECT a.word, a.cnt, t.j, a.a[t.j+1] AS e
                       FROM bpe_a$i a CROSS JOIN LATERAL (
                         SELECT unnest(range(0, length(a.a))) AS j) t) s
                 CROSS JOIN bpe_b$i b
                 LEFT JOIN bpe_g$i g1 ON g1.word = s.word AND g1.j = s.j
                 LEFT JOIN bpe_g$i g0 ON g0.word = s.word
                   AND g0.j = s.j - 1
                 WHERE g0.j IS NULL
                 GROUP BY s.word, s.cnt)"""
    }.mkString(",\n")
    s"""bpe_tok AS MATERIALIZED (SELECT doc_id, unnest($toks) AS t FROM documents),
        bpe_w0 AS MATERIALIZED (SELECT t AS word, count(*)::BIGINT AS cnt,
                 trim(regexp_replace(t, '(.)', '$bs1 ', 'g')) || ' </w>'
                   AS sym
               FROM bpe_tok GROUP BY t),
        $iters"""
  }

  /** The gopher-gate oracle, shared verbatim with the funnel. */
  private def gopherSql: String = {
    val stopWords = graft.operators.TextOps.langMarkers.flatMap(_._2)
    s"""WITH t AS (SELECT doc_id, text, $toks AS tk FROM documents
                     WHERE text IS NOT NULL),
          s AS (SELECT doc_id,
                  length(tk)::BIGINT AS n_tokens,
                  list_sum(list_transform(tk, x -> length(x)))::DOUBLE
                    / length(tk)::DOUBLE AS mean_word_len,
                  ${Duck.nPunct}::DOUBLE / length(text)::DOUBLE
                    AS symbol_ratio,
                  length(list_filter(tk,
                      x -> regexp_matches(x, '[a-zA-Z]')))::DOUBLE
                    / length(tk)::DOUBLE AS alpha_share,
                  ${Duck.markerHits("tk", stopWords)}::BIGINT AS stop_hits,
                  CASE WHEN length(tk) = 0 THEN CAST(1.0 AS DOUBLE)
                       ELSE length(list_distinct(tk))::DOUBLE
                            / length(tk)::DOUBLE END AS distinct_ratio
                FROM t)
          SELECT doc_id, n_tokens, mean_word_len,
            (n_tokens >= $GMinTok AND n_tokens <= $GMaxTok) AS size_ok,
            (mean_word_len >= $GMinWordLen::DOUBLE
              AND mean_word_len <= $GMaxWordLen::DOUBLE) AS word_len_ok,
            (symbol_ratio <= $GMaxSymbol::DOUBLE) AS symbol_ok,
            (alpha_share >= $GMinAlpha::DOUBLE) AS alpha_ok,
            (stop_hits >= $GMinStop) AS stopword_ok,
            (distinct_ratio >= $GMinDistinct::DOUBLE) AS repetition_ok,
            ((n_tokens >= $GMinTok AND n_tokens <= $GMaxTok)
              AND (mean_word_len >= $GMinWordLen::DOUBLE
                AND mean_word_len <= $GMaxWordLen::DOUBLE)
              AND (symbol_ratio <= $GMaxSymbol::DOUBLE)
              AND (alpha_share >= $GMinAlpha::DOUBLE)
              AND (stop_hits >= $GMinStop)
              AND (distinct_ratio >= $GMinDistinct::DOUBLE)) AS keep
          FROM s"""
  }

  /** Ridge-regression replay: the gopher frame as a derived table, the
    * nine DECIMAL moments, the SAME Cramer strings (regDet*), and the
    * scoring pass. Every double expression is the shared tree.
    */
  private def regressionSql: String = {
    def dd(e: String) = s"CAST(CAST($e AS VARCHAR) AS DOUBLE)"
    s"""WITH feat AS (
          SELECT CAST(n_tokens AS DOUBLE) AS x1, mean_word_len AS x2,
                 CAST(CASE WHEN keep THEN 1 ELSE 0 END AS DOUBLE) AS y
          FROM ($gopherSql)),
        mom AS (
          SELECT CAST(count(*) AS DOUBLE) AS mn,
                 ${dd("sum(CAST(x1 AS DECIMAL(38,10)))")} AS s1,
                 ${dd("sum(CAST(x2 AS DECIMAL(38,10)))")} AS s2,
                 ${dd("sum(CAST(x1 * x1 AS DECIMAL(38,10)))")} AS s11,
                 ${dd("sum(CAST(x2 * x2 AS DECIMAL(38,10)))")} AS s22,
                 ${dd("sum(CAST(x1 * x2 AS DECIMAL(38,10)))")} AS s12,
                 ${dd("sum(CAST(y AS DECIMAL(38,10)))")} AS sy,
                 ${dd("sum(CAST(x1 * y AS DECIMAL(38,10)))")} AS s1y,
                 ${dd("sum(CAST(x2 * y AS DECIMAL(38,10)))")} AS s2y
          FROM feat),
        model AS (
          SELECT ($regDet0) / ($regDet) AS w0,
                 ($regDet1) / ($regDet) AS w1,
                 ($regDet2) / ($regDet) AS w2,
                 sy / mn AS ybar
          FROM mom),
        fit AS (
          SELECT count(*) AS n_docs,
                 sum(CAST(r * r AS DECIMAL(38,10))) AS ssed,
                 sum(CAST(t * t AS DECIMAL(38,10))) AS sstd
          FROM (SELECT y - (w0 + w1 * x1 + w2 * x2) AS r,
                       y - ybar AS t
                FROM feat CROSS JOIN model))
        SELECT n_docs, w0, w1, w2,
               ${dd("ssed")} AS sse, ${dd("sstd")} AS sst,
               1.0 - ${dd("ssed")} / ${dd("sstd")} AS r2
        FROM fit CROSS JOIN model"""
  }

  /** The trained bigram-LM score frame — ONE training + scoring
    * definition consumed by corpus_bigram_lm and corpus_ccnet_buckets
    * (each caller pays its own training run; only the code is shared,
    * mirroring how bigramSql is one SQL definition for both oracles).
    */
  private def bigramScored(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    import s.implicits._
    val vocab = CorpusOps.vocabulary(d, VocabV)
      .as[String].collect().toSet
    // size-guarded: the model collects to the driver only after a
    // bounded limit(cap+1) probe proves it fits (worst case V² rows);
    // past the cap the broadcast-frame join path scores instead
    CorpusOps.bigramLmScoreAuto(vocab,
      CorpusOps.bigramModel(vocab)(d), VocabV, LmKeepAbove)(d)
  }

  /** The bigram-LM oracle, shared verbatim with the funnel. */
  private def bigramSql: String =
    s"""WITH tok AS (SELECT doc_id, unnest($toks) AS t FROM documents),
          v AS (SELECT t FROM (
                  SELECT t, count(*) AS f FROM tok GROUP BY t
                  ORDER BY f DESC, t LIMIT $VocabV)),
          p AS (SELECT d.doc_id, t.i AS pos,
                  CASE WHEN v.t IS NULL THEN '<unk>' ELSE v.t END AS w
                FROM (SELECT doc_id, $toks AS tk FROM documents) d
                CROSS JOIN LATERAL (
                  SELECT unnest(range(1, length(d.tk)+1)) AS i) t
                LEFT JOIN v ON d.tk[t.i] = v.t),
          bgp AS (SELECT doc_id, w AS w1,
                    lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
                  FROM p QUALIFY w2 IS NOT NULL),
          bc AS (SELECT w1, w2, count(*) AS c12 FROM bgp GROUP BY w1, w2),
          ctx AS (SELECT w1, sum(c12)::BIGINT AS c1 FROM bc GROUP BY w1),
          sc AS (SELECT g.doc_id,
                   floor(1000000.0 * ((COALESCE(b.c12, 0) + 1)::DOUBLE
                     / (COALESCE(x.c1, 0) + ${VocabV + 1})::DOUBLE))::BIGINT
                     AS fp
                 FROM bgp g
                 LEFT JOIN bc b ON g.w1 = b.w1 AND g.w2 = b.w2
                 LEFT JOIN ctx x ON g.w1 = x.w1)
          SELECT doc_id, count(*)::BIGINT AS n_bigrams,
            sum(fp)::BIGINT AS lm_fp,
            sum(fp)::DOUBLE / (1000000.0 * count(*))::DOUBLE AS avg_prob,
            (sum(fp)::DOUBLE / (1000000.0 * count(*))::DOUBLE)
              >= $LmKeepAbove::DOUBLE AS keep
          FROM sc GROUP BY doc_id"""

  /** The per-source quality rollup oracle (the SAME pattern objects the
    * Spark side evaluates — a drifted copy would silently break has_pii
    * parity).
    */
  private def sourceQualitySql: String = {
    val email = TextOps.emailPattern
    val phone = TextOps.phonePattern
    val nPunct = Duck.nPunct
    def dec(e: String) = s"CAST(CAST($e AS VARCHAR) AS DECIMAL(38,10))"
    def dd(e: String) = s"CAST(CAST($e AS VARCHAR) AS DOUBLE)"
    s"""WITH tok AS (SELECT doc_id, unnest($toks) AS t FROM documents),
          v AS (SELECT t FROM (
                  SELECT t, count(*) AS f FROM tok GROUP BY t
                  ORDER BY f DESC, t LIMIT $VocabV)),
          oov AS (SELECT tok.doc_id,
                    (count(*) FILTER (WHERE v.t IS NULL))::DOUBLE
                      / count(*)::DOUBLE AS oov_ratio
                  FROM tok LEFT JOIN v ON tok.t = v.t
                  GROUP BY tok.doc_id),
          a AS (SELECT doc_id, source, text,
                  CASE WHEN doc_id % 3 = 0
                       THEN text || ' contact user' || doc_id::VARCHAR
                            || '@example.com tel 555-123-4567'
                       ELSE text END AS t
                FROM documents),
          pd AS (SELECT a.source,
                   length($toks)::BIGINT AS n_tokens,
                   ${TextQueries.langCase} AS lid,
                   md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                     AS content_hash,
                   $nPunct::DOUBLE / length(text)::DOUBLE AS punct_ratio,
                   ${Duck.markerHits(toks,
                     graft.operators.TextOps.langMarkers.flatMap(_._2))
                   }::DOUBLE / length($toks)::DOUBLE AS stopword_ratio,
                   CASE WHEN length($toks) = 0 THEN CAST(1.0 AS DOUBLE)
                        ELSE length(list_distinct($toks))::DOUBLE
                             / length($toks)::DOUBLE END
                     AS token_distinct_ratio,
                   (length(regexp_extract_all(t, '$email'))
                     + length(regexp_extract_all(t, '$phone'))) > 0
                     AS has_pii,
                   o.oov_ratio
                 FROM a JOIN oov o ON a.doc_id = o.doc_id)
          SELECT source,
            count(*)::BIGINT AS n_docs,
            CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
            CAST(sum(n_tokens) AS BIGINT)::DOUBLE
              / count(*)::DOUBLE AS avg_tokens,
            CAST(sum(CASE WHEN lid <> 'und' THEN 1 ELSE 0 END) AS BIGINT)
              ::DOUBLE / count(*)::DOUBLE AS lang_known_share,
            CAST(1 AS DOUBLE) - count(DISTINCT content_hash)::DOUBLE
              / count(*)::DOUBLE AS exact_dup_share,
            CAST(sum(CASE WHEN has_pii THEN 1 ELSE 0 END) AS BIGINT)
              ::DOUBLE / count(*)::DOUBLE AS pii_doc_share,
            ${dd(s"sum(${dec("punct_ratio")})")}
              / count(*)::DOUBLE AS avg_punct_ratio,
            ${dd(s"sum(${dec("stopword_ratio")})")}
              / count(*)::DOUBLE AS avg_stopword_ratio,
            ${dd(s"sum(${dec("token_distinct_ratio")})")}
              / count(*)::DOUBLE AS avg_distinct_ratio,
            ${dd(s"sum(${dec("oov_ratio")})")}
              / count(*)::DOUBLE AS avg_oov_ratio
          FROM pd GROUP BY source"""
  }
}
