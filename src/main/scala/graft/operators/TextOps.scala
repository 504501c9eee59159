package graft.operators

import graft.functions.PortableHash.h15
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline, over
  * the `documents` table (`doc_id, text, lang, source, n_chars`). Not in the
  * reference (SURVEY.md §2.1 absence audit) — these are the scale-extension
  * surface.
  *
  * Every operator is a pure column expression inside whole-stage codegen:
  * no UDFs, no shuffles, no driver-side loops. At 100 TB each is a single
  * narrow map over the scan with column pruning (only `text` is read when
  * only text features are selected).
  *
  * Determinism: all derived numbers are integers, single IEEE divisions of
  * integers, or fixed-shape expression trees — bit-identical between Spark
  * and the DuckDB oracle.
  */
object TextOps {

  /** Whitespace tokens of the trimmed text (the "token counting:
    * whitespace" path).
    */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish regex token count: word runs and single non-word-non-space
    * symbols, the usual pre-tokenizer shape.
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0)))

  // ------------------------------------------------------------ language ID

  /** Tiny per-language stopword marker lists for the n-gram/stopword
    * language heuristic. Deliberately small and fixed: the operator shape
    * (score per language → deterministic argmax) is what scales, the lists
    * are config.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "las", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("的", "是", "了", "在", "有"))

  /** Number of tokens that hit `words` (multiset count, integer). */
  def markerHits(toks: Column, words: Seq[String]): Column = {
    val set = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(set, t)))
  }

  /** Language-ID: argmax of marker-hit scores with fixed precedence order
    * (ties go to the earlier language in `langMarkers`); all-zero → "und".
    * Integer comparisons only — deterministic.
    */
  def langId(toks: Column): Column = {
    val scores = langMarkers.map { case (l, ws) => l -> markerHits(toks, ws) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s > 0 && s === best, lit(l)).otherwise(acc)
    }
  }

  // ------------------------------------------------------- quality scoring

  /** Quality-signal columns: lengths, ratios, and a combined score.
    * Ratios are single int/int IEEE divisions; the score is one fixed
    * expression tree — both reproduce bit-exactly in DuckDB.
    */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nTok = size(toks)
    val nChar = length(text)
    val nPunct = length(regexp_replace(text, "[^.,!?;:]", ""))
    val sumTokLen =
      aggregate(toks, lit(0), (acc, t) => acc + length(t))
    val nStop = markerHits(toks, langMarkers.flatMap(_._2))
    Seq(
      // counters as int64 (DuckDB length() is BIGINT; the compare is
      // dtype-sensitive)
      "n_tokens" -> nTok.cast("long"),
      "n_chars_sp" -> nChar.cast("long"),
      "n_punct" -> nPunct.cast("long"),
      "avg_token_len" -> sumTokLen.cast("double") / nTok.cast("double"),
      "punct_ratio" -> nPunct.cast("double") / nChar.cast("double"),
      "stopword_ratio" -> nStop.cast("double") / nTok.cast("double"))
  }

  /** Materialize the quality columns onto a documents frame. */
  def quality(textCol: String = "text")(df: DataFrame): DataFrame =
    qualityColumns(col(textCol)).foldLeft(df) { case (d, (n, c)) =>
      d.withColumn(n, c)
    }

  // ------------------------------------------------------------- redaction

  /** RE2-safe patterns (identical semantics in Java regex and DuckDB's
    * RE2) so the redaction is oracle-replayable.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\b\\d{3}[-.]\\d{3,4}[-.]\\d{4}\\b"

  /** PII redaction for training corpora: emails and phone-shaped numbers
    * become typed placeholder tokens. Pure regexp_replace chain — narrow,
    * codegen'd, pushdown-transparent.
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(text, emailPattern, "<EMAIL>"),
      phonePattern, "<PHONE>")

  // ----------------------------------------------- repetition / boilerplate

  /** Repetition signals (gopher-style quality gates): share of distinct
    * tokens, and the duplicate-bigram ratio (boilerplate text repeats
    * n-grams). Array expressions per row, no shuffle.
    */
  def repetitionColumns(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val n = size(toks)
    val totalBi = greatest(n - 2, lit(0)) + 1
    val distBi = size(graft.functions.TextExprs.shingleSet(toks, 2))
    // Boundary semantics a quality gate can trust: an empty doc is
    // vacuously all-distinct (ratio 1.0, not NaN), and a doc with <2
    // tokens has zero bigrams so its duplicate-bigram ratio is 0.0 (not
    // the maximally-repetitive 1.0 the raw formula degenerates to).
    Seq(
      "token_distinct_ratio" ->
        when(n === 0, lit(1.0)).otherwise(
          size(array_distinct(toks)).cast("double") / n.cast("double")),
      "bigram_dup_ratio" ->
        when(n < 2, lit(0.0)).otherwise(
          lit(1.0) - distBi.cast("double") / totalBi.cast("double")))
  }

  // -------------------------------------------------------- fingerprinting

  /** Canonical content normalization for exact dedup: lowercase, collapse
    * runs of whitespace.
    */
  def normalized(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Exact content fingerprint (md5 hex of the normalized text). */
  def contentHash(text: Column): Column = md5(normalized(text))

  /** Deterministic hash sampling: keep a row iff the 60-bit portable hash
    * of its id (under a salt naming the sample) lands in the first
    * `percent` of 100 buckets. The standard reproducible-subset operator
    * for training-data pipelines — stable across runs, clusters, and
    * engines (unlike `df.sample`, whose outcome depends on partitioning
    * and RNG seeds), trivially pushed down as a scan filter, and
    * composable: disjoint salts give independent samples, the same salt
    * with a larger percent gives a superset (growable eval sets).
    */
  def hashSample(idCol: Column, percent: Int, salt: String = "sample")
      : Column =
    pmod(h15(concat(lit(s"$salt:"), idCol.cast("string"))), lit(100L)) <
      percent

  /** Positional k-shingle hashes: element i is the 60-bit hash of the
    * shingle starting at token i (a doc shorter than k emits ONE
    * truncated shingle — the boundary convention [[shingleFingerprint]]
    * and [[DedupOps.duplicateSpans]] must share, which is why this is
    * one expression). Pure array math, no explode.
    */
  def shingleHashes(toks: Column, k: Int): Column =
    transform(
      sequence(lit(0), greatest(size(toks) - k, lit(0))),
      i => h15(concat_ws(" ", slice(toks, i + 1, lit(k)))))

  /** Rolling-hash document fingerprint: minimum 60-bit hash over all
    * k-token shingles (a 1-permutation MinHash — the document sketch used
    * for cheap near-dup prefiltering). Pure array expressions, no explode:
    * per-row cost O(tokens·k), no shuffle.
    */
  /** Signed feature hashing (the hashing-trick featurizer, Weinberger
    * et al.): every token lands in `hv mod dims` with sign from the
    * next hash bit, summed per (doc, dim) — a fixed-width bag-of-words
    * the cheap classifiers of a curation pipeline (quality, language,
    * topic) train on with NO vocabulary model at all, at any corpus
    * size. Emitted as exploded (doc_id, dim, v) rows: integer sums are
    * order-free, and the sparse form never materializes |docs|·dims.
    * One explode + one aggregate; the 60-bit portable hash keeps the
    * oracle bit-exact.
    */
  def hashFeatures(dims: Int)(docs: DataFrame): DataFrame = {
    import graft.functions.PortableHash.h15
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .withColumn("hv", h15(concat(lit("fh:"), col("term"))))
      .groupBy(col("doc_id"), (col("hv") % dims).as("dim"))
      .agg(sum(when(expr(s"(hv div $dims) % 2") === 0, 1L)
        .otherwise(-1L)).as("v"))
      .select(col("doc_id"), col("dim"), col("v"))
  }

  def shingleFingerprint(text: Column, k: Int = 5): Column =
    array_min(shingleHashes(tokens(text), k))

  /** Linear-classifier INFERENCE over hashing-trick features — the
    * quality-gate stage of a curation pipeline (CCNet/GPT-style corpora
    * gate documents with a cheap linear/fasttext-style classifier; the
    * expensive part at 100 TB is inference, not training). The logit is
    * Σ_token sign(t)·w(dim(t)) + bias, computed directly from the token
    * stream — same dim/sign derivation as [[hashFeatures]], but skipping
    * the per-(doc, dim) pre-aggregation so the whole op is one explode +
    * ONE per-doc aggregate (integer sums, order-free). Weights are a
    * pure 60-bit-hash function of the dimension, evaluated inline — a
    * deployment substitutes its learned vector as a literal array or
    * broadcast map; either way inference stays a pure map + aggregate
    * with nothing corpus-sized on the wire. Docs with no tokens emit no
    * feature rows and are reported with logit = bias (left join back to
    * the corpus), so the gate is total.
    */
  def linearClassify(dims: Int, bias: Long = 0L, seed: String = "clf")(
      docs: DataFrame): DataFrame = {
    import graft.functions.PortableHash.h15
    val logits = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .withColumn("hv", h15(concat(lit("fh:"), col("term"))))
      .withColumn("sgn",
        when(expr(s"(hv div $dims) % 2") === 0, 1L).otherwise(-1L))
      .withColumn("w",
        h15(concat(lit(s"$seed:w:"), (col("hv") % dims).cast("string")))
          % 1001 - 500)
      .groupBy(col("doc_id"))
      .agg(sum(col("sgn") * col("w")).as("dot"))
    docs.filter(col("text").isNotNull).select(col("doc_id"))
      .join(logits, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        (coalesce(col("dot"), lit(0L)) + lit(bias)).as("logit"))
      .withColumn("keep", col("logit") > 0L)
  }
}
