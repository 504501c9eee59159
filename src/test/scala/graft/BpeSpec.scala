package graft

import graft.operators.CorpusOps
import org.apache.spark.sql.functions._

/** BPE tokenizer training: the greedy merge-pass fold semantics (the
  * part the oracle replays with gaps-and-islands window arithmetic —
  * these cases pin that both formulations implement the SAME greedy
  * left-to-right rule) and the end-to-end merge table on a hand-computed
  * fixture.
  */
class BpeSpec extends SparkSpec {

  private def pass(syms: Seq[String], l: String, r: String): Seq[String] = {
    val s = spark
    import s.implicits._
    Seq(Tuple1(syms)).toDF("syms")
      .select(CorpusOps.bpeMergePass(col("syms"), l, r).as("m"))
      .collect().head.getSeq[String](0).toList
  }

  test("merge pass is greedy left-to-right, non-overlapping") {
    // overlapping run: every OTHER occurrence applies
    assert(pass(Seq("a", "a", "a"), "a", "a") == List("aa", "a"))
    assert(pass(Seq("a", "a", "a", "a"), "a", "a") == List("aa", "aa"))
    assert(pass(Seq("a", "a", "a", "a", "a"), "a", "a") ==
      List("aa", "aa", "a"))
    // asymmetric pair whose merged form could chain
    assert(pass(Seq("aa", "a", "a"), "aa", "a") == List("aaa", "a"))
    // a just-merged symbol never re-merges within the same pass
    assert(pass(Seq("a", "b", "b"), "a", "b") == List("ab", "b"))
    // symbol-boundary integrity: concatenated text is not a match
    assert(pass(Seq("xa", "b"), "a", "b") == List("xa", "b"))
    assert(pass(Seq("x", "y"), "a", "b") == List("x", "y"))
    assert(pass(Seq("a"), "a", "a") == List("a"))
  }

  test("bpeMerges learns the deterministic merge table; tokenize applies it") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "aa ab aa"), (2L, "aa"),
        (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val (merges, vocab) = CorpusOps.bpeTrain(docs, 2)
    val m = merges.orderBy(col("rank")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    // words: aa×3, ab×1; round 1 pairs (a,a)=3 ties (a,</w>)=3 — the
    // (freq desc, l asc, r asc) tiebreak picks (a,"</w>") ('<' < 'a'
    // in binary order, the collation BOTH engines use)
    assert(m.toList == List(
      (1L, "a", "</w>", "a</w>", 3L),
      (2L, "a", "a</w>", "aa</w>", 3L)))
    // trained segmentation: aa → [a, a</w>] → [aa</w>]; ab stays 3 syms
    val counts = CorpusOps.bpeTokenCounts(docs, vocab)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(counts.toList == List((1L, 3L, 5L), (2L, 1L, 1L), (3L, 0L, 0L)))
  }

  test("merge-list apply ≡ vocabulary lookup on training words, and segments unseen words") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "aa ab aa"), (2L, "aa"),
        (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val (merges, vocab) = CorpusOps.bpeTrain(docs, 2)
    val mlist = merges.orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // parity on the training corpus: replaying the merge list per word
    // reproduces the trained segmentation's counts exactly
    val viaVocab = CorpusOps.bpeTokenCounts(docs, vocab)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    val viaMerges = CorpusOps.bpeTokenCountsOnline(mlist)(docs)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(viaVocab == viaMerges)
    // an UNSEEN word still segments (the vocab-join path cannot):
    // merges (a,</w>) then (a,a</w>) apply to "ba" → b a </w> → b a</w>
    val unseen = CorpusOps.bpeTokenCountsOnline(mlist)(
        Seq((9L, "ba")).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(unseen.toList == List((9L, 1L, 2L)))
  }
}
