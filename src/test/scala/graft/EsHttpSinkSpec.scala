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
    assembledWith(cfg)(rows)

  private def assembledWith(c: InjectorConfig)(rows: Seq[(Int, Long, String)]) =
    StreamingPipeline.streamingPipeline(c, schema)(kafkaFrame(rows))

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

  test("hostile doc-ids (quote/backslash/newline) land verbatim — the action line is serialized, not interpolated (codec.go:77-90 contract)") {
    val es = new EsStubServer
    val port = es.start()
    try {
      val sink = new EsHttpSink(s"http://localhost:$port")
      // R4 column-routed doc id: the payload column supplies ARBITRARY
      // strings (the reference accepts any), including JSON metachars
      // that would frame-shift a string-interpolated NDJSON action line
      val idCfg = InjectorConfig(topic = "my-topic", docIdColumn = Some("id"))
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      def payload(id: String, n: Int): String = {
        val o = mapper.createObjectNode()
        o.put("id", id); o.put("n", n)
        mapper.writeValueAsString(o)
      }
      val hostiles = Seq("a\"quote", "back\\slash", "new\nline", "tab\tand\"\\\nall")
      val rows = hostiles.zipWithIndex.map { case (id, i) =>
        (0, i.toLong, payload(id, i))
      }
      sink.write(assembledWith(idCfg)(rows), 0L)
      assert(sink.inserted.sum() == hostiles.size &&
        sink.badRequests.sum() == 0,
        "every hostile-id doc must create cleanly — a 400 here means the NDJSON frame broke")
      assert(es.docCount == hostiles.size)
      hostiles.zipWithIndex.foreach { case (id, i) =>
        val doc = es.doc("my-topic-2024-03-05", id)
        assert(doc.isDefined, s"doc with id <$id> must exist under that exact id")
        assert(doc.get.contains(s""""n":$i"""), s"payload for <$id> intact")
      }
      // and redelivery still dedups on the hostile ids (K2 unaffected)
      sink.write(assembledWith(idCfg)(rows), 1L)
      assert(sink.conflicts.sum() == hostiles.size && es.docCount == hostiles.size)
    } finally es.stop()
  }

  test("a 2xx response with fewer items than docs sent is a whole-request failure — no row silently uncounted") {
    val es = new EsStubServer
    val port = es.start()
    try {
      val sink = new EsHttpSink(s"http://localhost:$port")
      es.truncateItems.set(1)
      sink.write(assembled(Seq(
        (0, 1L, """{"id":"a","n":1}"""), (0, 2L, """{"id":"b","n":2}"""))), 0L)
      // first POST stored both docs but answered for one → retried whole,
      // second POST answers 409 for both: every row is ACCOUNTED
      assert(sink.retries.sum() == 1, "truncated response must consume a retry")
      assert(sink.inserted.sum() + sink.conflicts.sum() == 2,
        "every row must be counted exactly once after the retry")
      assert(es.docCount == 2)
    } finally es.stop()
  }

  test("a 2xx body that is not a bulk response routes into bounded retry, not an uncaught task failure") {
    val es = new EsStubServer
    val port = es.start()
    try {
      val sink = new EsHttpSink(s"http://localhost:$port")
      es.garbageBulks.set(1)
      sink.write(assembled(Seq((0, 1L, """{"id":"a","n":1}"""))), 0L)
      assert(sink.retries.sum() == 1 && sink.inserted.sum() == 1)
      // exhaustion on persistent garbage fails the stream like any outage
      es.garbageBulks.set(10)
      val e = intercept[org.apache.spark.SparkException] {
        new EsHttpSink(s"http://localhost:$port", maxRetries = 2)
          .write(assembled(Seq((0, 9L, """{"id":"z","n":9}"""))), 1L)
      }
      assert(e.getMessage.contains("failing the stream") ||
        Option(e.getCause).exists(_.getMessage.contains("failing the stream")))
    } finally es.stop()
  }

  test("readiness follows the sink ping: outage flips /ready to 500, recovery flips it back (reference ReadinessCheck = ES ping)") {
    import graft.streaming.InjectorApp
    val es = new EsStubServer
    val port = es.start()
    val dir = Files.createTempDirectory("graft-app-ready").toString
    try {
      val cfg = InjectorApp.fromEnv(Map(
        "KAFKA_TOPICS" -> "my-topic",
        "KAFKA_CONSUMER_RECORD_TYPE" -> "json",
        "PROBES_PORT" -> "0",
        "CHECKPOINT_LOCATION" -> s"$dir/cp"))
      val sink = new EsHttpSink(s"http://localhost:$port")
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[Msg]
      val (q, probes) = InjectorApp.start(spark, cfg, jsonSchema = schema,
        source = Some(stream.toDF()),
        startSink = Some(a => a.writeStream
          .option("checkpointLocation", s"$dir/cp")
          .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
            sink.write(b, id))
          .start()),
        sinkPing = Some(() => sink.ping()))
      def ready(): Int = {
        val c = new java.net.URL(
          s"http://127.0.0.1:${probes.boundPort}/readiness").openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        try c.getResponseCode finally c.disconnect()
      }
      try {
        q.processAllAvailable()
        assert(ready() == 200, "healthy sink + live query → ready")
        es.healthDown.set(true)
        assert(ready() == 500, "sink outage must flip the pod unready")
        es.healthDown.set(false)
        assert(ready() == 200, "recovery flips it back without a restart")
      } finally { q.stop(); probes.stop() }
    } finally es.stop()
  }

  test("hour-suffix routing lands end-to-end and the installed template pattern covers BOTH day and hour indices (R2/R3 × template parity)") {
    val es = new EsStubServer
    val port = es.start()
    try {
      // install the template exactly as the startup path does
      val conn = EsConnectorSink.EsConnectorConfig(
        host = "localhost", port = port, bulkTimeoutMs = 5000L)
      assert(EsConnectorSink.ensureTemplate(conn, "my-topic"))
      val body = es.template("my-topic").get
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val pattern = mapper.readTree(body).get("template").asText()
      def covers(index: String): Boolean =
        java.util.regex.Pattern.matches(
          pattern.split("\\*", -1).map(java.util.regex.Pattern.quote)
            .mkString(".*"), index)
      // hour-suffixed pipeline over the wire
      val hourCfg = InjectorConfig(topic = "my-topic",
        timeSuffix = graft.operators.InjectorOps.HourSuffix)
      val sink = new EsHttpSink(s"http://localhost:$port")
      sink.write(assembledWith(hourCfg)(
        Seq((0, 1L, """{"id":"a","n":1}"""))), 0L)
      assert(sink.inserted.sum() == 1)
      // message ts 2024-03-05 10:11:12 → hour bucket -10
      assert(es.doc("my-topic-2024-03-05-10", "0:1").isDefined,
        "hour suffix must route to <topic>-<yyyy-MM-dd-HH>")
      assert(covers("my-topic-2024-03-05-10"),
        s"template pattern <$pattern> must cover the hour-suffixed index")
      assert(covers("my-topic-2024-03-05"),
        s"template pattern <$pattern> must cover the day-suffixed index")
      assert(!covers("other-topic-2024-03-05"),
        "pattern must not claim other topics' indices")
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
