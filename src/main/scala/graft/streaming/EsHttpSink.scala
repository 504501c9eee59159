package graft.streaming

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** REAL Elasticsearch bulk-`create` sink over the wire protocol — the
  * reference's sink shape (src/elasticsearch/elasticsearch.go:77-162)
  * speaking actual HTTP `_bulk` NDJSON, with the per-item status
  * routing of the reference's response loop
  * (elasticsearch.go:115-134):
  *
  *  - 200/201 → inserted;
  *  - 409 → conflict: the id already exists — ES's per-doc version
  *    check IS the K2 dedup, server-side, exactly like the reference
  *    (at-least-once upstream + create-only = effective exactly-once);
  *  - 400 → bad request: counted and DROPPED, never retried
  *    (elasticsearch.go:115-119);
  *  - anything else (429/5xx, item- or request-level) → transient:
  *    the failed items retry with constant backoff a BOUNDED number of
  *    times, then fail the stream (the reference loops forever and can
  *    wedge a worker — SURVEY.md §7.5.5 documents the divergence).
  *
  * Scale shape: each partition serializes its rows into
  * `maxDocsPerBulk`-sized NDJSON bodies and POSTs them over one JDK
  * connection per request — no driver funnel, no shared client state;
  * the counters flow back through the JOB RESULT (one stats tuple per
  * partition), not through executor-side shared adders, so they are
  * correct on a real cluster, not just in local mode. Uses only the
  * JDK HTTP client and Spark's bundled Jackson — zero extra
  * dependencies, same discipline as [[Probes]].
  *
  * [[EsBulkSink]] remains the offline-correctness stand-in (parquet
  * "index", anti-join dedup); this class is the live-protocol path the
  * EsHttpSinkSpec exercises end-to-end against an in-JVM HTTP server
  * implementing the `_bulk` contract.
  */
class EsHttpSink(
    baseUrl: String,
    maxRetries: Int = 3,
    backoffMs: Long = 25L,
    bulkTimeoutMs: Int = 30000,
    maxDocsPerBulk: Int = 500) extends Serializable {

  val inserted = new LongAdder
  val conflicts = new LongAdder
  val badRequests = new LongAdder
  val retries = new LongAdder

  /** One micro-batch (or batch frame) of ASSEMBLED records —
    * `(es_index, doc_id, payload struct)` per [[graft.operators
    * .InjectorOps.assemble]] — bulk-created into the cluster.
    * Throws (failing the stream) when a chunk exhausts its retries.
    */
  def write(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val url = s"$baseUrl/_bulk"
    val (mr, bo, to, chunk) = (maxRetries, backoffMs, bulkTimeoutMs,
      maxDocsPerBulk)
    val stats = batch
      .select(col("es_index").cast("string"),
        col("doc_id").cast("string"), to_json(col("payload")))
      .as[(String, String, String)]
      .rdd.mapPartitions { it =>
        // the action line is SERIALIZED, never interpolated: R4/R3 let a
        // user payload column supply the doc id / index (reference
        // codec.go:77-90 accepts any string), so a value containing
        // `"`, `\` or a newline must be JSON-escaped or the NDJSON body
        // frame-shifts (the reference's elastic client escapes for it)
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        var ins = 0L; var conf = 0L; var bad = 0L; var ret = 0L
        it.grouped(chunk).foreach { rows =>
          var pending = rows.toSeq
          var attempt = 0
          while (pending.nonEmpty) {
            val body = pending.map { case (idx, id, doc) =>
              val action = mapper.createObjectNode()
              action.putObject("create").put("_index", idx).put("_id", id)
              mapper.writeValueAsString(action) + "\n" + doc + "\n"
            }.mkString
            EsHttpSink.post(url, body, to) match {
              // pair item statuses back to rows positionally (the
              // _bulk contract: items are in request order) — but ONLY
              // when the server answered one item per doc sent; a
              // truncated/padded item list would silently mis-route
              // rows, so it retries as a whole-request failure instead
              case Right(items) if items.size == pending.size =>
                val again = Seq.newBuilder[(String, String, String)]
                items.zip(pending).foreach { case (st, row) =>
                  if (st == 200 || st == 201) ins += 1
                  else if (st == 409) conf += 1
                  else if (st == 400) bad += 1
                  else again += row // 429/5xx item: retryable
                }
                pending = again.result()
              case Right(_) => () // item-count mismatch: retry all
              case Left(_) => () // whole-request failure: retry all
            }
            if (pending.nonEmpty) {
              if (attempt >= mr)
                throw new RuntimeException(
                  s"bulk to $url failed for ${pending.size} docs after " +
                    s"$mr retries — failing the stream (SURVEY §7.5.5)")
              attempt += 1; ret += 1
              Thread.sleep(bo)
            }
          }
        }
        Iterator.single((ins, conf, bad, ret))
      }.collect()
    stats.foreach { case (i, c, b, r) =>
      inserted.add(i); conflicts.add(c); badRequests.add(b); retries.add(r)
    }
  }

  /** The reference's readiness check pings the ES root endpoint
    * (`elasticsearch.go:142-150`: `client.Ping` → ok); here a `GET /`
    * against `baseUrl` answering 2xx. Wire this into
    * [[Probes.bind]]'s sink check so a cluster outage flips the pod
    * unready (the orchestrator then stops routing to it) even while
    * the streaming query itself is still alive between batches.
    */
  def ping(): Boolean =
    try {
      val conn = new java.net.URL(baseUrl).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("GET")
      conn.setConnectTimeout(bulkTimeoutMs)
      conn.setReadTimeout(bulkTimeoutMs)
      try conn.getResponseCode / 100 == 2 finally conn.disconnect()
    } catch { case scala.util.control.NonFatal(_) => false }
}

object EsHttpSink {
  /** POST the NDJSON body; Right(per-item statuses) on a parseable
    * 2xx `_bulk` response, Left(status) on transport/server failure —
    * including a 2xx body that is not a well-formed `_bulk` response
    * (missing/non-array `items`, malformed JSON): any NonFatal failure
    * routes into the sink's bounded-retry path as a counted retry
    * rather than escaping as an uncounted task failure.
    */
  private[streaming] def post(url: String, body: String,
      timeoutMs: Int): Either[Int, Seq[Int]] =
    try {
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/x-ndjson")
      val os = conn.getOutputStream
      try os.write(body.getBytes("UTF-8")) finally os.close()
      val status = conn.getResponseCode
      if (status / 100 != 2) { conn.disconnect(); Left(status) }
      else {
        val in = conn.getInputStream
        val resp = try new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        finally { in.close(); conn.disconnect() }
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val root = mapper.readTree(resp)
        val items = root.get("items")
        if (items == null || !items.isArray) Left(-2)
        else Right((0 until items.size).map { i =>
          val it = items.get(i)
          it.get(it.fieldNames().next()).get("status").asInt()
        })
      }
    } catch { case scala.util.control.NonFatal(_) => Left(-1) }
}
