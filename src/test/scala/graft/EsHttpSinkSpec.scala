package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.operators.InjectorOps.InjectorConfig
import graft.streaming.{EsHttpSink, EsConnectorSink, StreamingPipeline}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's tier-2 Elasticsearch contract, run against a REAL
  * protocol boundary: [[graft.streaming.EsHttpSink]] speaks actual
  * HTTP `_bulk` NDJSON to an in-JVM server ([[EsStubServer]])
  * implementing create/409/400 semantics — the end-to-end shape of
  * `/root/reference/src/elasticsearch/elasticsearch_test.go:70-146`
  * (insert → readable at `{index}/_doc/{id}`; re-insert → 409 dedup;
  * template check-then-install) and the `@timestamp`/index-name/doc-id
  * assertions of `src/kafka/consumer_test.go:106-147`, minus only the
  * Kafka hop (connector absent from this environment — pinned in
  * StreamingSpec).
  */
class EsHttpSinkSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", StringType), StructField("n", IntegerType),
    StructField("reject", BooleanType)))
  private val cfg = InjectorConfig(topic = "my-topic")

  private def kafkaFrame(rows: Seq[(Int, Long, String)]) =
    rows.map { case (p, o, json) =>
      Msg(null, json.getBytes("UTF-8"), "my-topic", p, o,
        Timestamp.valueOf("2024-03-05 10:11:12.345"), 0)
    }.toDF()

  private def assembled(rows: Seq[(Int, Long, String)]) =
    StreamingPipeline.streamingPipeline(cfg, schema)(kafkaFrame(rows))

  test("end-to-end over real HTTP: docs land at <topic>-<date>/_doc/<partition>:<offset> with @timestamp") {
    val es = new EsStubServer
    val port = es.start()
    try {
      val sink = new EsHttpSink(s"http://localhost:$port")
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[Msg]
      val cp = Files.createTempDirectory("graft-eshttp").toString
      val q = StreamingPipeline.streamingPipeline(cfg, schema)(
          stream.toDF())
        .writeStream
        .option("checkpointLocation", s"$cp/cp")
        .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
          sink.write(b, id))
        .start()
      try {
        stream.addData(Seq(
          Msg(null, """{"id":"a","n":1}""".getBytes("UTF-8"), "my-topic",
            0, 1L, Timestamp.valueOf("2024-03-05 10:11:12.345"), 0),
          Msg(null, """{"id":"b","n":2}""".getBytes("UTF-8"), "my-topic",
            1, 7L, Timestamp.valueOf("2024-03-05 10:11:12.345"), 0)))
        q.processAllAvailable()
      } finally q.stop()
      // the reference's end-to-end asserts: index routed by topic+day,
      // id = partition:offset, @timestamp carried from the message
      assert(sink.inserted.sum() == 2 && es.docCount == 2)
      val doc = es.doc("my-topic-2024-03-05", "0:1").get
      assert(doc.contains(""""id":"a"""") && doc.contains(""""n":1"""))
      // @timestamp serializes as epoch millis (the ES `date` type's
      // epoch_millis form): 2024-03-05T10:11:12.345Z
      assert(doc.contains("\"@timestamp\":1709633472345"),
        s"@timestamp must carry the message timestamp: $doc")
      assert(es.doc("my-topic-2024-03-05", "1:7").isDefined)
    } finally es.stop()
  }

  test("redelivered batch dedups server-side via create/409 (K2 on the wire)") {
    val es = new EsStubServer
    val port = es.start()
    try {
      val sink = new EsHttpSink(s"http://localhost:$port")
      val batch = assembled(Seq(
        (0, 1L, """{"id":"a","n":1}"""), (0, 2L, """{"id":"b","n":2}""")))
      sink.write(batch, 0L)
      sink.write(batch, 0L) // at-least-once redelivery
      assert(sink.inserted.sum() == 2 && sink.conflicts.sum() == 2)
      assert(es.docCount == 2, "conflicts must not duplicate documents")
    } finally es.stop()
  }

  test("400-rejected docs are counted and dropped, never retried; the rest land (K3 on the wire)") {
    val es = new EsStubServer
    val port = es.start()
    try {
      val sink = new EsHttpSink(s"http://localhost:$port")
      sink.write(assembled(Seq(
        (0, 1L, """{"id":"a","n":1}"""),
        (0, 2L, """{"id":"bad","n":0,"reject":true}"""),
        (0, 3L, """{"id":"c","n":3}"""))), 0L)
      assert(sink.inserted.sum() == 2 && sink.badRequests.sum() == 1)
      assert(sink.retries.sum() == 0, "a 400 must not consume retries")
      assert(es.docCount == 2 &&
        es.doc("my-topic-2024-03-05", "0:2").isEmpty)
    } finally es.stop()
  }

  test("transient 503s retry with bounded backoff, then succeed; exhaustion fails the stream (K4)") {
    val es = new EsStubServer
    val port = es.start()
    try {
      val sink = new EsHttpSink(s"http://localhost:$port", maxRetries = 3)
      es.failBulks.set(2)
      sink.write(assembled(Seq((0, 1L, """{"id":"a","n":1}"""))), 0L)
      assert(sink.inserted.sum() == 1 && sink.retries.sum() == 2)
      // a longer outage than the budget fails the stream instead of
      // wedging (SURVEY §7.5.5)
      es.failBulks.set(10)
      val e = intercept[org.apache.spark.SparkException] {
        new EsHttpSink(s"http://localhost:$port", maxRetries = 2)
          .write(assembled(Seq((0, 9L, """{"id":"z","n":9}"""))), 1L)
      }
      assert(e.getMessage.contains("failing the stream") ||
        Option(e.getCause).exists(_.getMessage.contains("failing the stream")))
    } finally es.stop()
  }

  test("InjectorApp composes with the HTTP sink: env config → pipeline → real _bulk → probes") {
    import graft.streaming.InjectorApp
    val es = new EsStubServer
    val port = es.start()
    val dir = Files.createTempDirectory("graft-app-http").toString
    try {
      val cfg = InjectorApp.fromEnv(Map(
        "KAFKA_TOPICS" -> "my-topic",
        "KAFKA_CONSUMER_RECORD_TYPE" -> "json",
        "K8S_LIVENESS_ROUTE" -> "/live",
        "K8S_READINESS_ROUTE" -> "/ready",
        "PROBES_PORT" -> "0",
        "CHECKPOINT_LOCATION" -> s"$dir/cp"))
      val sink = new EsHttpSink(s"http://localhost:$port")
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[Msg]
      stream.addData(Seq(
        Msg(null, """{"id":"a","n":1}""".getBytes("UTF-8"), "my-topic",
          0, 1L, Timestamp.valueOf("2024-03-05 10:11:12.345"), 0)))
      val (q, probes) = InjectorApp.start(spark, cfg, jsonSchema = schema,
        source = Some(stream.toDF()),
        startSink = Some(a => a.writeStream
          .option("checkpointLocation", s"$dir/cp")
          .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
            sink.write(b, id))
          .start()))
      try {
        q.processAllAvailable()
        assert(sink.inserted.sum() == 1)
        assert(es.doc("my-topic-2024-03-05", "0:1").exists(
          _.contains(""""id":"a"""")))
        val c = new java.net.URL(
          s"http://127.0.0.1:${probes.boundPort}/ready").openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        val ready = try c.getResponseCode finally c.disconnect()
        assert(ready == 200)
      } finally { q.stop(); probes.stop() }
    } finally es.stop()
  }

  test("ensureTemplate installs once over REAL HTTP (check-then-install, K-template)") {
    val es = new EsStubServer
    val port = es.start()
    try {
      val cfg = EsConnectorSink.EsConnectorConfig(
        host = "localhost", port = port, bulkTimeoutMs = 5000L)
      assert(!es.hasTemplate("my-topic"))
      assert(EsConnectorSink.ensureTemplate(cfg, "my-topic"))
      assert(es.hasTemplate("my-topic"))
      // idempotent second call: HEAD finds it, no re-PUT
      assert(!EsConnectorSink.ensureTemplate(cfg, "my-topic"))
    } finally es.stop()
  }
}
