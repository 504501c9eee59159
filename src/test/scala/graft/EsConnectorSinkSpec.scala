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
}
