package graft.operators

import graft.functions.PortableHash.h15
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, over `documents`
  * (text) and `embeddings` (vectors). All are designed around the one rule
  * that matters at 100 TB: **never compare all pairs**. Candidate
  * generation is always an equi-join on a derived key (content hash,
  * shared shingle, LSH band bucket, SimHash band, SRP bucket) so Spark
  * executes a shuffle-or-broadcast hash join, AQE handles skew, and cost is
  * O(candidates), not O(n²).
  */
object DedupOps {

  import TextOps._

  // ------------------------------------------------------------ exact dedup

  /** Exact dedup: hash-groupBy on the normalized content hash, canonical
    * winner = lowest doc id (deterministic). One shuffle on a high-entropy
    * key — perfectly partitionable; map-side partial aggregation applies.
    */
  def exactDedup(idCol: String = "doc_id", textCol: String = "text")(
      df: DataFrame): DataFrame =
    df.select(contentHash(col(textCol)).as("content_hash"), col(idCol))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  // --------------------------------------------------- n-gram Jaccard dedup

  /** Distinct k-token shingle set of a document (array expression, no
    * explode until the join needs it).
    */
  def shingleSet(text: Column, k: Int): Column = {
    val toks = tokens(text)
    array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - k, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  /** N-gram Jaccard near-dup pairs via an inverted shingle index:
    * explode shingles → self-equi-join on the shingle → count shared
    * shingles per pair → Jaccard from |A∩B| and set sizes. The join is on
    * `shingle` (high cardinality) — a classic shuffle hash join; no pair is
    * ever formed that shares zero shingles. Emits (a, b, jaccard) with
    * a < b and jaccard ≥ threshold.
    *
    * Scale: the inverted index is the standard web-scale near-dup plan;
    * hot shingles (stopword-only) can be dropped by an IDF-style filter —
    * here `maxDocFreq` caps a shingle's posting list, bounding join fanout
    * (the skew guard salting would otherwise handle).
    */
  def ngramJaccardPairs(k: Int = 3, threshold: Double = 0.5,
      maxDocFreq: Int = Int.MaxValue)(df: DataFrame): DataFrame = {
    val sets = df.select(col("doc_id"),
      shingleSet(col("text"), k).as("shingles"))
      .withColumn("set_size", size(col("shingles")))
    val posting = sets
      .select(col("doc_id"), col("set_size"),
        explode(col("shingles")).as("shingle"))
    val bounded =
      if (maxDocFreq == Int.MaxValue) posting
      else {
        val freq = posting.groupBy("shingle")
          .agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxDocFreq)
        posting.join(freq.select("shingle"), Seq("shingle"))
      }
    val a = bounded.select(col("shingle"), col("doc_id").as("a"),
      col("set_size").as("size_a"))
    val b = bounded.select(col("shingle"), col("doc_id").as("b"),
      col("set_size").as("size_b"))
    a.join(b, Seq("shingle"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"), col("size_a"), col("size_b"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("size_a") + col("size_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("inter"), col("jaccard"))
  }

  // ----------------------------------------------------------- MinHash LSH

  /** MinHash signature: `perms` independent 60-bit hash families (seeded
    * portable hash), each taking the min over the shingle set. One array
    * expression per row — O(perms·shingles) CPU, zero shuffle.
    */
  def minhashSignature(shingles: Column, perms: Int): Column =
    array((0 until perms).map(p =>
      array_min(transform(shingles, s => h15(p, s)))): _*)

  /** MinHash + LSH banding: signature of `bands·rows` permutations, band
    * key = hash of each `rows`-slice; docs sharing any band key become
    * candidates (equi-join on (band, key)); candidates are verified with
    * the exact Jaccard of their shingle sets. Standard LSH guarantee:
    * P(candidate) = 1-(1-j^rows)^bands.
    *
    * Emits (a, b, jaccard) for verified pairs ≥ threshold. The band join is
    * an equi-join on a 60-bit bucket — uniform, shuffle-friendly; the
    * verify step only touches surviving candidates.
    */
  def minhashLshPairs(k: Int = 2, bands: Int = 8, rows: Int = 2,
      threshold: Double = 0.5)(df: DataFrame): DataFrame = {
    val sets = df.select(col("doc_id"),
      shingleSet(col("text"), k).as("shingles"))
    val sig = sets.withColumn("sig",
      minhashSignature(col("shingles"), bands * rows))
    val banded = sig.select(col("doc_id"), col("shingles"),
      posexplode(array((0 until bands).map(b =>
        h15(concat_ws("_",
          slice(col("sig"), b * rows + 1, rows).cast("array<string>")))): _*))
        .as(Seq("band", "band_key")))
    val a = banded.select(col("band"), col("band_key"),
      col("doc_id").as("a"), col("shingles").as("sh_a"))
    val b = banded.select(col("band"), col("band_key"),
      col("doc_id").as("b"), col("shingles").as("sh_b"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("sh_a"), col("sh_b")).distinct()
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  // --------------------------------------------------------------- SimHash

  /** 64-bit SimHash of the token multiset: per token a 60-bit hash votes
    * ±1 on each bit; simhash bit b is set iff the vote sum is positive.
    * Integer folds only — order-independent, oracle-exact. Array
    * expressions per row; no shuffle.
    */
  def simhash(text: Column): Column = {
    val hashes = transform(tokens(text), t => h15(t))
    // the Scala shiftright/shiftleft wrappers take a static Int shift;
    // call_function reaches the SQL builtin, which shifts by a column —
    // exact integer ops (a double round-trip would corrupt bits > 2^53)
    val votes = aggregate(hashes,
      array_repeat(lit(0), 60),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(59)),
        (a, bit) => a + when(
          call_function("shiftright", h, bit).bitwiseAND(1) === 1, 1)
          .otherwise(-1)))
    aggregate(zip_with(votes, sequence(lit(0), lit(59)),
      (v, bit) => when(v > 0, call_function("shiftleft", lit(1L), bit))
        .otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
  }

  /** SimHash near-dup pairs: pigeonhole banding — split the 60 bits into
    * `chunks` equal chunks; any pair within Hamming distance
    * `chunks - 1` must agree on at least one chunk, so the equi-join on
    * (chunk index, chunk value) finds all such pairs without n². Verified
    * with exact `bit_count(xor) <= maxHamming`.
    */
  def simhashPairs(maxHamming: Int = 14, chunks: Int = 15)(
      df: DataFrame): DataFrame = {
    require(maxHamming < chunks, "pigeonhole needs maxHamming < chunks")
    val bitsPer = 60 / chunks
    val sh = df.select(col("doc_id"), simhash(col("text")).as("sh"))
    val banded = sh.select(col("doc_id"), col("sh"),
      posexplode(array((0 until chunks).map(c =>
        shiftright(col("sh"), c * bitsPer)
          .bitwiseAND((1L << bitsPer) - 1)): _*))
        .as(Seq("chunk", "chunk_val")))
    val a = banded.select(col("chunk"), col("chunk_val"),
      col("doc_id").as("a"), col("sh").as("sh_a"))
    val b = banded.select(col("chunk"), col("chunk_val"),
      col("doc_id").as("b"), col("sh").as("sh_b"))
    a.join(b, Seq("chunk", "chunk_val"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("sh_a"), col("sh_b")).distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming"))
  }

  // ---------------------------------------------- embedding-cosine near-dup

  /** Sequential double-precision dot product of two float vectors — the
    * same left-to-right fold DuckDB's list_reduce performs, so the result
    * is bit-exact across engines. Codegen'd array expression.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Embedding-cosine near-dup pairs. Candidate generation by SRP-LSH
    * (sign-random-projection buckets, see [[SimilarityOps.srpBucket]]);
    * verification by exact cosine ≥ threshold. Join is equi on the bucket.
    */
  def embeddingNearDupPairs(threshold: Double, planes: Int = 8,
      dim: Int = 64)(df: DataFrame): DataFrame = {
    val withBucket = df.select(col("vec_id"), col("embedding"),
      SimilarityOps.srpBucket(col("embedding"), planes, dim).as("bucket"))
    val a = withBucket.select(col("bucket"), col("vec_id").as("a"),
      col("embedding").as("e_a"))
    val b = withBucket.select(col("bucket"), col("vec_id").as("b"),
      col("embedding").as("e_b"))
    a.join(b, Seq("bucket"))
      .filter(col("a") < col("b"))
      .withColumn("cos", cosine(col("e_a"), col("e_b")))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), col("cos"))
  }
}
