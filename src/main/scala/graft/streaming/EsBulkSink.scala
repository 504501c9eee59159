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
  * Scale note: the anti-join is a broadcast-or-shuffle hash join on
  * `doc_id`; the real deployment delegates it to ES and this class is only
  * the offline-correctness harness for the semantics.
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
          Thread.sleep(backoffMs) // constant backoff, ES_BULK_BACKOFF
        case e: RuntimeException if attempt >= maxRetries =>
          throw e // fail the stream, never wedge (SURVEY.md §7.5.5)
      }
    }
  }

  private def writeOnce(batch: DataFrame): Unit = {
    val spark = batch.sparkSession
    // K3: bad-request drop
    val (good, nBad) = badRecord match {
      case Some(p) =>
        val g = batch.filter(!p)
        (g, batch.count() - g.count())
      case None => (batch, 0L)
    }
    badRequests.add(nBad)
    // K2: in-batch duplicate drop (first-by-doc_id, deterministic)
    val inBatch = good.dropDuplicates("doc_id")
    // K2: create-only vs existing index
    val existing = existingIds(spark)
    val fresh = existing match {
      case Some(ids) => inBatch.join(ids, Seq("doc_id"), "left_anti")
      case None => inBatch
    }
    val nFresh = fresh.count()
    conflicts.add(good.count() - nFresh)
    inserted.add(nFresh)
    if (nFresh > 0)
      fresh.write.mode(SaveMode.Append).parquet(targetDir)
  }

  private def existingIds(spark: org.apache.spark.sql.SparkSession) =
    if (new java.io.File(targetDir).exists())
      Some(spark.read.parquet(targetDir).select(col("doc_id")).distinct())
    else None

  /** The documents currently in the simulated index. */
  def contents(spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.read.parquet(targetDir)
}
