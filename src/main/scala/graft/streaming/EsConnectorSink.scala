package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** The live-cluster sink surface (K1/K5) as checkable code: maps the
  * reference's env-var config (`src/elasticsearch/config.go:17-98`) onto
  * the public elasticsearch-hadoop (`elasticsearch-spark`) option
  * surface, so the canonical deployment — Kafka source → injector
  * transforms → ES connector with `create` semantics — is one builder
  * call instead of comment-ware.
  *
  * Semantics mapping (reference file:line → connector option):
  *  - K1 bulk create (`elasticsearch.go:152-162`): `es.write.operation=
  *    create` + `es.mapping.id=doc_id` — insert-if-absent keyed on the
  *    replay-stable id, so at-least-once upstream becomes effective dedup
  *    (K2) server-side, exactly like the reference.
  *  - K4 partial-failure retry (`elasticsearch.go:106-135`,
  *    `store.go:33-47`): `es.batch.write.retry.count` / `retry.wait` —
  *    the connector retries only rejected documents, the reference's
  *    ID-keyed retry set. Bounded, unlike the reference's unbounded loop
  *    (SURVEY.md §7.5.5).
  *  - K5 bulk timeout (`elasticsearch.go:82-86`): `es.http.timeout`.
  *  - R3 per-record index routing (`codec.go:50-75`): the connector's
  *    dynamic-resource pattern `{es_index}` reads the routed index name
  *    from each row — no per-index stream split.
  *
  * The connector jar is a cluster-classpath dependency (not in the
  * offline harness), so `start` is exercised by its option map in unit
  * tests; the option names are the public es-hadoop configuration
  * contract.
  */
object EsConnectorSink {

  /** Connection + bulk tuning in the reference's config vocabulary
    * (env names in comments; defaults match `config.go:34-98`).
    */
  final case class EsConnectorConfig(
      host: String,                        // ELASTICSEARCH_HOST
      port: Int = 9200,
      scheme: String = "http",             // ELASTICSEARCH_SCHEME
      user: Option[String] = None,         // ELASTICSEARCH_USER
      password: Option[String] = None,     // ELASTICSEARCH_PASSWORD
      ignoreCertificate: Boolean = false,  // ELASTICSEARCH_IGNORE_CERT
      disableSniffing: Boolean = false,    // ELASTICSEARCH_DISABLE_SNIFFING
      bulkTimeoutMs: Long = 1000L,         // ES_BULK_TIMEOUT (default 1s)
      backoffMs: Long = 1000L,             // ES_BULK_BACKOFF (default 1s)
      maxRetries: Int = 3,
      bulkEntries: Int = 1000)

  /** Dynamic write resource: each assembled row carries its routed index
    * in `es_index` (R3), which the connector substitutes per document.
    */
  val resource: String = "{es_index}"

  /** The full `es.*` option map for an assembled injector stream. */
  def options(es: EsConnectorConfig): Map[String, String] = {
    val base = Map(
      "es.nodes" -> es.host,
      "es.port" -> es.port.toString,
      "es.net.ssl" -> (es.scheme == "https").toString,
      "es.net.ssl.cert.allow.self.signed" -> es.ignoreCertificate.toString,
      "es.nodes.discovery" -> (!es.disableSniffing).toString,
      "es.write.operation" -> "create",
      "es.mapping.id" -> "doc_id",
      "es.batch.write.retry.count" -> es.maxRetries.toString,
      "es.batch.write.retry.wait" -> s"${es.backoffMs}ms",
      "es.http.timeout" -> s"${es.bulkTimeoutMs}ms",
      "es.batch.size.entries" -> es.bulkEntries.toString)
    val auth = (es.user, es.password) match {
      case (Some(u), Some(p)) =>
        Map("es.net.http.auth.user" -> u, "es.net.http.auth.pass" -> p)
      case _ => Map.empty[String, String]
    }
    base ++ auth
  }

  /** Configured writeStream for an assembled frame (R5 output shape:
    * es_index, es_type, doc_id, payload). Offsets commit to the
    * checkpoint WAL only after the connector acknowledges the batch (K6).
    */
  def writer(assembled: DataFrame, es: EsConnectorConfig,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): DataStreamWriter[Row] =
    options(es).foldLeft(
      assembled.writeStream
        .format("es")
        .trigger(trigger)
        .option("checkpointLocation", checkpoint)) {
      case (w, (k, v)) => w.option(k, v)
    }

  def start(assembled: DataFrame, es: EsConnectorConfig,
      checkpoint: String) =
    writer(assembled, es, checkpoint).start(resource)

  /** Readiness ping — the reference's `ReadinessCheck` is an ES client
    * ping (`src/elasticsearch/elasticsearch.go:142-150`); here `GET /`
    * on the configured host answering 2xx, over the same transport
    * (scheme/auth/timeout) as the template bootstrap.
    */
  def ping(es: EsConnectorConfig,
      transport: Option[(String, String, Option[String]) => Int] = None)
      : Boolean =
    try {
      val send = transport.getOrElse(jdkTransport(es))
      send("GET", s"${es.scheme}://${es.host}:${es.port}/", None) / 100 == 2
    } catch { case scala.util.control.NonFatal(_) => false }

  // -------------------------------------------------------- index template

  /** The reference delegates mapping control to an index template
    * installed BEFORE the first insert (`src/elasticsearch/
    * elasticsearch_test.go:34-61,135-146`; README.md:44-67): without one,
    * the first bulk create lets ES dynamic mapping guess every field
    * type. Default body in the reference's shape — wildcard pattern,
    * `_source` enabled, strings dynamic-mapped to exact-match fields
    * (`keyword` is the current ES spelling of the reference's
    * `not_analyzed string`), `@timestamp` typed date for Kibana.
    */
  def defaultTemplate(indexPattern: String): String =
    s"""{
       |  "template": "$indexPattern",
       |  "settings": {},
       |  "mappings": {
       |    "_source": {"enabled": true},
       |    "dynamic_templates": [
       |      {"strings": {
       |        "match_mapping_type": "string",
       |        "mapping": {"type": "keyword"}}}
       |    ],
       |    "properties": {
       |      "@timestamp": {"type": "date"}
       |    }
       |  },
       |  "aliases": {}
       |}""".stripMargin

  /** Idempotent pre-create step, the code form of the reference's
    * check-then-install (`IndexTemplateExists` → `IndexPutTemplate`,
    * elasticsearch_test.go:135-146): HEAD `_template/{name}`, PUT the
    * body only when absent. Returns true iff this call installed it.
    *
    * @param transport injectable (method, url, body) => HTTP status for
    *                  offline tests; the default is a JDK client
    *                  honoring the config's scheme/auth/timeout
    */
  def ensureTemplate(es: EsConnectorConfig, name: String,
      body: Option[String] = None,
      transport: Option[(String, String, Option[String]) => Int] = None)
      : Boolean = {
    val url = s"${es.scheme}://${es.host}:${es.port}/_template/$name"
    val send = transport.getOrElse(jdkTransport(es))
    if (send("HEAD", url, None) == 200) false
    else {
      val st = send("PUT", url,
        Some(body.getOrElse(defaultTemplate(s"$name-*"))))
      require(st / 100 == 2, s"template PUT $url failed with HTTP $st")
      true
    }
  }

  private def jdkTransport(es: EsConnectorConfig)
      : (String, String, Option[String]) => Int = (method, url, body) => {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    // honor the config's self-signed-cert escape hatch on the https
    // path, like the connector's es.net.ssl.cert.allow.self.signed
    (conn, es.ignoreCertificate) match {
      case (https: javax.net.ssl.HttpsURLConnection, true) =>
        val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
        ctx.init(null, Array[javax.net.ssl.TrustManager](
          new javax.net.ssl.X509TrustManager {
            override def checkClientTrusted(
                c: Array[java.security.cert.X509Certificate],
                a: String): Unit = ()
            override def checkServerTrusted(
                c: Array[java.security.cert.X509Certificate],
                a: String): Unit = ()
            override def getAcceptedIssuers
                : Array[java.security.cert.X509Certificate] = Array.empty
          }), new java.security.SecureRandom)
        https.setSSLSocketFactory(ctx.getSocketFactory)
        https.setHostnameVerifier((_, _) => true)
      case _ => ()
    }
    conn.setRequestMethod(method)
    conn.setConnectTimeout(es.bulkTimeoutMs.toInt)
    conn.setReadTimeout(es.bulkTimeoutMs.toInt)
    (es.user, es.password) match {
      case (Some(u), Some(p)) =>
        conn.setRequestProperty("Authorization", "Basic " +
          java.util.Base64.getEncoder.encodeToString(
            s"$u:$p".getBytes("UTF-8")))
      case _ => ()
    }
    body.foreach { b =>
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
      val os = conn.getOutputStream
      try os.write(b.getBytes("UTF-8")) finally os.close()
    }
    try conn.getResponseCode finally conn.disconnect()
  }
}
