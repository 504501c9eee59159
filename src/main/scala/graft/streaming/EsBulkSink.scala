package graft.streaming

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Offline stand-in for the Elasticsearch bulk-`create` sink, preserving
  * the reference's delivery semantics (K1-K5,
  * src/elasticsearch/elasticsearch.go:77-162 and
  * src/injector/store/store.go:23-48) against a parquet "index":
  *
  *  - K1 bulk create: one append per micro-batch.
  *  - K2 conflict drop: doc ids already present in the index (or duplicated
  *    within the batch) are counted (`conflicts`) and dropped — an
  *    at-least-once upstream + create-only sink = effective dedup. The
  *    anti-join against the existing index replaces ES's per-doc version
  *    check; on a live cluster the es connector's
  *    `es.write.operation=create` does this server-side.
  *  - K3 bad-record drop: rows failing `badRecord` are counted and
  *    dropped, not retried (elasticsearch.go:115-119).
  *  - K4 partial-failure retry: a transient-failure hook retries with
  *    constant backoff (store.go:33-47) but a *bounded* number of times —
  *    the reference's unbounded loop can wedge a worker forever
  *    (SURVEY.md §7.5.5); exhausting retries here fails the stream
  *    instead.
  *  - M5 counters: conflicts / bad requests / retries, exposed for the
  *    listener.
  *
  * Scale shape (this class is the offline-correctness harness — a live
  * cluster delegates K2 to ES's per-doc version check — but every
  * streaming test funnels through it, so it must not be the slow part):
  *  - the batch is classified ONCE (bad / in-batch dup / index conflict /
  *    fresh) and persisted; all three counters come from a single
  *    aggregate over that cache, and the append reads the same cache —
  *    one evaluation of the upstream micro-batch plan per write, not one
  *    per counter.
  *  - seen-ness is tracked in a compact append-only doc-id side store
  *    (`<targetDir>_ids`, one column, distinct by construction since only
  *    never-seen ids are appended) — per-batch work is O(ids), never a
  *    re-read + distinct of the whole document index, whose width and
  *    row count grow without bound.
  *  - a driver-held BLOOM FILTER over the store fronts even that: a batch
  *    whose ids all miss the filter (no false negatives) skips the store
  *    read entirely, so the steady-state all-fresh batch costs O(batch)
  *    regardless of how large the id store has grown.
  */
class EsBulkSink(
    targetDir: String,
    badRecord: Option[org.apache.spark.sql.Column] = None,
    maxRetries: Int = 3,
    backoffMs: Long = 10L,
    transientFailure: () => Boolean = () => false) extends Serializable {

  val inserted = new LongAdder
  val conflicts = new LongAdder
  val badRequests = new LongAdder
  val retries = new LongAdder

  def write(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    var attempt = 0
    var done = false
    while (!done) {
      try {
        if (transientFailure()) throw new RuntimeException("transient 429")
        writeOnce(batch)
        done = true
      } catch {
        case e: RuntimeException if attempt < maxRetries =>
          attempt += 1
          retries.increment()
          // the failed attempt may have appended to the index but not the
          // id store; re-derive seen ids (and the Bloom filter) from the
          // authoritative index so the retry cannot re-insert the
          // just-committed docs (K2)
          idsReconciled = false
          bloom = null
          Thread.sleep(backoffMs) // constant backoff, ES_BULK_BACKOFF
        case e: RuntimeException if attempt >= maxRetries =>
          throw e // fail the stream, never wedge (SURVEY.md §7.5.5)
      }
    }
  }

  private def writeOnce(batch: DataFrame): Unit = {
    import org.apache.spark.sql.expressions.Window
    val spark = batch.sparkSession
    // classify every row in ONE frame: bad (K3) / in-batch duplicate or
    // index conflict (K2) / fresh. Good rows rank before bad ones within a
    // doc_id so a bad duplicate can never shadow a good row.
    val dupRank = row_number().over(Window.partitionBy(col("doc_id"))
      .orderBy(col("__bad"), monotonically_increasing_id()))
    val flagged = batch
      // null predicate = bad (a missing field is exactly the malformed
      // shape K3 exists for; the original filter(!p) dropped nulls too)
      .withColumn("__bad",
        badRecord.map(p => coalesce(p, lit(true))).getOrElse(lit(false)))
      .withColumn("__rn", dupRank)
      .persist()
    try {
      // Bloom gate in front of the id store: the filter covers every id
      // ever appended and has NO false negatives, so a batch with zero
      // possible hits skips the store read entirely — the common
      // all-fresh batch costs O(batch) instead of O(store). A false
      // positive only costs the join every batch paid before the gate.
      // The probe rides INSIDE the single counters aggregate below (no
      // separate probe job), and both the probe and every filter build
      // go through an explicit string cast so the two hash encodings
      // always agree whatever the native doc_id type — a type mismatch
      // would mean false NEGATIVES, i.e. silent duplicate inserts.
      val bfBc = spark.sparkContext.broadcast(ensureBloom(spark))
      val probe = udf((id: String) =>
        id != null && bfBc.value.mightContainString(id))
      val maybeSeen = probe(col("doc_id").cast("string"))
      // ONE aggregate pass materializes the cache and yields the K3/K2
      // in-batch counters plus the store-consult flag. Only rows that
      // would otherwise be fresh (good, first-in-batch) matter for the
      // flag — bad rows and in-batch dups are dropped regardless.
      val agg0 = flagged.agg(
        count(when(col("__bad"), 1)).as("bad"),
        count(when(!col("__bad") && col("__rn") > 1, 1)).as("dup"),
        count(when(!col("__bad") && col("__rn") === 1, 1)).as("cand"),
        count(when(!col("__bad") && col("__rn") === 1 && maybeSeen, 1))
          .as("maybe")).collect()(0)
      val (nBad, nDup, nCand, nMaybe) =
        (agg0.getLong(0), agg0.getLong(1), agg0.getLong(2), agg0.getLong(3))
      badRequests.add(nBad)
      if (nMaybe == 0) {
        // no candidate id can be in the store: counters are already in
        // hand and the whole batch's survivors append without touching
        // the store — the steady-state all-fresh shape
        conflicts.add(nDup)
        inserted.add(nCand)
        if (nCand > 0)
          appendFresh(spark, flagged
            .filter(!col("__bad") && col("__rn") === 1)
            .drop("__bad", "__rn"))
      } else {
        val joined = existingIds(spark).map(ids => flagged.join(
          ids.withColumn("__seen", lit(true)), Seq("doc_id"),
          "left_outer"))
          .getOrElse(flagged.withColumn("__seen",
            lit(null).cast("boolean")))
        val classified = joined
          .withColumn("__status",
            when(col("__bad"), "bad")
              .when(col("__rn") > 1 || col("__seen"), "conflict")
              .otherwise("fresh"))
          .persist()
        try {
          // post-join aggregate splits the candidates into seen
          // conflicts vs fresh (the join reads the batch from cache)
          val counts = classified.groupBy(col("__status"))
            .agg(count(lit(1)).as("n")).collect()
            .map(r => r.getString(0) -> r.getLong(1)).toMap
          conflicts.add(counts.getOrElse("conflict", 0L))
          val nFresh = counts.getOrElse("fresh", 0L)
          inserted.add(nFresh)
          if (nFresh > 0)
            appendFresh(spark, classified
              .filter(col("__status") === "fresh")
              .drop("__bad", "__rn", "__seen", "__status"))
        } finally classified.unpersist()
      }
    } finally flagged.unpersist()
  }

  /** Append never-seen docs to the index, their ids to the side store
    * (stays distinct by construction), and fold them into the Bloom
    * filter (distributed build over the cache, driver merge — same
    * capacity so the bit geometries line up; built over the STRING cast
    * to match the probe encoding).
    */
  private def appendFresh(
      spark: org.apache.spark.sql.SparkSession, fresh: DataFrame): Unit = {
    fresh.write.mode(SaveMode.Append).parquet(targetDir)
    fresh.select(col("doc_id")).write.mode(SaveMode.Append).parquet(idsDir)
    ensureBloom(spark).mergeInPlace(fresh
      .select(col("doc_id").cast("string").as("doc_id"))
      .stat.bloomFilter("doc_id",
        EsBulkSink.BloomCapacity, EsBulkSink.BloomFpp))
  }

  private def idsDir = targetDir + "_ids"

  // The index append and the id-store append are two writes; a crash
  // between them would leave committed docs invisible to the store and
  // re-inserted on redelivery. The index is authoritative, so each sink
  // INSTANCE reconciles the store from it once before first use (one
  // index scan per stream start, not per batch — restarts are exactly
  // when the pair can be out of sync).
  @transient private var idsReconciled = false
  @transient private var bloom: org.apache.spark.util.sketch.BloomFilter = _

  /** Driver-held Bloom filter over every id in the store, built once per
    * instance (alongside reconciliation) and folded forward per batch.
    * Rebuilt from the authoritative store after a retry, like the store
    * itself.
    */
  private def ensureBloom(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.util.sketch.BloomFilter = {
    if (bloom == null)
      bloom = existingIds(spark) match {
        case Some(ids) => ids
          .select(col("doc_id").cast("string").as("doc_id"))
          .stat.bloomFilter("doc_id",
            EsBulkSink.BloomCapacity, EsBulkSink.BloomFpp)
        case None => org.apache.spark.util.sketch.BloomFilter.create(
          EsBulkSink.BloomCapacity, EsBulkSink.BloomFpp)
      }
    bloom
  }

  // Path existence through the Hadoop FileSystem API so the sink works
  // against any supported store (local, HDFS, object stores), not only
  // the local FS.
  private def pathExists(
      spark: org.apache.spark.sql.SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def existingIds(spark: org.apache.spark.sql.SparkSession) = {
    if (!idsReconciled) {
      if (pathExists(spark, targetDir))
        spark.read.parquet(targetDir).select(col("doc_id")).distinct()
          .write.mode(SaveMode.Overwrite).parquet(idsDir)
      idsReconciled = true
    }
    if (pathExists(spark, idsDir))
      Some(spark.read.parquet(idsDir))
    else None
  }

  /** The documents currently in the simulated index. */
  def contents(spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.read.parquet(targetDir)
}

object EsBulkSink {
  /** Bloom sizing: fixed so per-batch filters merge into the instance
    * filter (merge requires identical bit geometry). ~2.6 MB of driver
    * memory for 4M ids at 3% fpp; a store outgrowing the capacity only
    * raises the false-positive rate (more store consults), never
    * correctness.
    */
  val BloomCapacity: Long = 4000000L
  val BloomFpp: Double = 0.03
}
