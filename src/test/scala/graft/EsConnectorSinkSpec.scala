package graft

import graft.streaming.EsConnectorSink
import graft.streaming.EsConnectorSink.EsConnectorConfig
import org.scalatest.funsuite.AnyFunSuite

/** The K1/K5 connector option contract: the reference's env config must
  * land on the public es-hadoop option names with create-op semantics.
  */
class EsConnectorSinkSpec extends AnyFunSuite {

  test("default config maps to create-op options with reference defaults") {
    val o = EsConnectorSink.options(EsConnectorConfig(host = "es-host"))
    assert(o("es.nodes") == "es-host")
    assert(o("es.port") == "9200")
    assert(o("es.write.operation") == "create")       // K1/K2
    assert(o("es.mapping.id") == "doc_id")            // R4 stable id
    assert(o("es.batch.write.retry.count") == "3")    // K4 bounded
    assert(o("es.batch.write.retry.wait") == "1000ms") // ES_BULK_BACKOFF 1s
    assert(o("es.http.timeout") == "1000ms")          // ES_BULK_TIMEOUT 1s
    assert(o("es.net.ssl") == "false")
    assert(o("es.nodes.discovery") == "true")         // sniffing on
    assert(!o.contains("es.net.http.auth.user"))
  }

  test("https + auth + no-sniffing config is carried through") {
    val o = EsConnectorSink.options(EsConnectorConfig(
      host = "secure-es", scheme = "https", user = Some("u"),
      password = Some("p"), ignoreCertificate = true,
      disableSniffing = true, bulkTimeoutMs = 2500L, backoffMs = 150L,
      maxRetries = 7, bulkEntries = 500))
    assert(o("es.net.ssl") == "true")
    assert(o("es.net.ssl.cert.allow.self.signed") == "true")
    assert(o("es.nodes.discovery") == "false")
    assert(o("es.net.http.auth.user") == "u")
    assert(o("es.net.http.auth.pass") == "p")
    assert(o("es.http.timeout") == "2500ms")
    assert(o("es.batch.write.retry.wait") == "150ms")
    assert(o("es.batch.write.retry.count") == "7")
    assert(o("es.batch.size.entries") == "500")
  }

  test("dynamic resource routes on the per-row es_index column (R3)") {
    assert(EsConnectorSink.resource == "{es_index}")
  }

  test("ensureTemplate installs once, idempotently, before first insert") {
    import com.sun.net.httpserver.HttpServer
    // fixture "cluster" tracking template state like the reference's
    // IndexTemplateExists → IndexPutTemplate check-then-install
    @volatile var installed: Option[String] = None
    var puts = 0
    val server = HttpServer.create(new java.net.InetSocketAddress(0), 0)
    server.createContext("/_template/my-topic", ex => {
      ex.getRequestMethod match {
        case "HEAD" =>
          ex.sendResponseHeaders(if (installed.isDefined) 200 else 404, -1L)
        case "PUT" =>
          puts += 1
          installed = Some(new String(
            ex.getRequestBody.readAllBytes(), "UTF-8"))
          ex.sendResponseHeaders(200, -1L)
        case _ => ex.sendResponseHeaders(405, -1L)
      }
      ex.close()
    })
    server.start()
    try {
      // default JDK transport against the fixture server — the real path
      val cfg = EsConnectorConfig(host = "127.0.0.1",
        port = server.getAddress.getPort)
      assert(EsConnectorSink.ensureTemplate(cfg, "my-topic"))
      assert(puts == 1)
      // reference-shaped default body: wildcard pattern over the routed
      // day/hour indices, exact-match strings, typed @timestamp
      val body = installed.get
      assert(body.contains("\"template\": \"my-topic-*\""))
      assert(body.contains("\"match_mapping_type\": \"string\""))
      assert(body.contains("\"@timestamp\": {\"type\": \"date\"}"))
      // second call sees it installed and does NOT re-PUT
      assert(!EsConnectorSink.ensureTemplate(cfg, "my-topic"))
      assert(puts == 1)
    } finally server.stop(0)
  }
}
