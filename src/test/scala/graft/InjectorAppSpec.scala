package graft

import graft.operators.InjectorOps
import graft.streaming.InjectorApp
import org.scalatest.funsuite.AnyFunSuite

/** The env-var deployment surface must parse name-for-name with the
  * reference (`cmd/injector.go`, `src/elasticsearch/config.go`,
  * `src/kafka/config.go`): same names, same defaults, same duration
  * format.
  */
class InjectorAppSpec extends AnyFunSuite {

  test("full reference env maps onto the app config") {
    val cfg = InjectorApp.fromEnv(Map(
      "KAFKA_ADDRESS" -> "broker:9092",
      "KAFKA_TOPICS" -> "clicks, views",
      "KAFKA_CONSUMER_BATCH_SIZE" -> "5000",
      "KAFKA_CONSUMER_RECORD_TYPE" -> "avro",
      "KAFKA_CONSUMER_INCLUDE_KEY" -> "true",
      "SCHEMA_REGISTRY_URL" -> "http://registry:8081",
      "ELASTICSEARCH_HOST" -> "es-host",
      "ELASTICSEARCH_SCHEME" -> "https",
      "ELASTICSEARCH_USER" -> "u",
      "ELASTICSEARCH_PASSWORD" -> "p",
      "ELASTICSEARCH_DISABLE_SNIFFING" -> "true",
      "ES_INDEX" -> "events-idx",
      "ES_INDEX_PREFIX" -> "pre-",
      "ES_INDEX_COLUMN" -> "route",
      "ES_DOC_ID_COLUMN" -> "uuid",
      "ES_TIME_SUFFIX" -> "hour",
      "ES_BLACKLISTED_COLUMNS" -> "secret,internal",
      "ES_BULK_TIMEOUT" -> "2s",
      "ES_BULK_BACKOFF" -> "500ms",
      "ES_INDEX_TEMPLATE" -> "true",
      "K8S_LIVENESS_ROUTE" -> "/live",
      "K8S_READINESS_ROUTE" -> "/ready",
      "PROBES_PORT" -> "9100"))
    assert(cfg.source.bootstrapServers == "broker:9092")
    assert(cfg.source.topics == Seq("clicks", "views"))
    assert(cfg.source.maxOffsetsPerTrigger.contains(5000L))
    assert(cfg.injector.topic == "clicks")
    assert(cfg.injector.esIndex.contains("events-idx"))
    assert(cfg.injector.indexPrefix == "pre-")
    assert(cfg.injector.indexColumn.contains("route"))
    assert(cfg.injector.docIdColumn.contains("uuid"))
    assert(cfg.injector.timeSuffix == InjectorOps.HourSuffix)
    assert(cfg.injector.blacklist == Seq("secret", "internal"))
    assert(cfg.injector.includeKey)
    assert(cfg.sink.host == "es-host" && cfg.sink.scheme == "https")
    assert(cfg.sink.user.contains("u") && cfg.sink.password.contains("p"))
    assert(cfg.sink.disableSniffing)
    assert(cfg.sink.bulkTimeoutMs == 2000L && cfg.sink.backoffMs == 500L)
    assert(cfg.registryUrl.contains("http://registry:8081"))
    assert(cfg.recordType == "avro")
    assert(cfg.probesPort.contains(9100))
    assert(cfg.livenessRoute == "/live" && cfg.readinessRoute == "/ready")
    assert(cfg.installTemplate)
  }

  test("unset env falls back to the reference defaults") {
    val cfg = InjectorApp.fromEnv(Map.empty)
    assert(cfg.injector.timeSuffix == InjectorOps.DaySuffix)
    assert(cfg.injector.blacklist.isEmpty && !cfg.injector.includeKey)
    assert(cfg.sink.bulkTimeoutMs == 1000L) // ES_BULK_TIMEOUT default 1s
    assert(cfg.sink.backoffMs == 1000L)     // ES_BULK_BACKOFF default 1s
    assert(cfg.sink.scheme == "http" && !cfg.sink.disableSniffing)
    // DeserializerFor treats anything but "json" as avro — the reference
    // default with the var unset is the avro path
    assert(cfg.recordType == "avro")
    assert(cfg.source.maxOffsetsPerTrigger.isEmpty)
  }

  test("go-style durations parse like time.ParseDuration") {
    assert(InjectorApp.parseDurationMs("1s") == 1000L)
    assert(InjectorApp.parseDurationMs("500ms") == 500L)
    assert(InjectorApp.parseDurationMs("2m") == 120000L)
    assert(InjectorApp.parseDurationMs("1.5s") == 1500L)
    assert(InjectorApp.parseDurationMs("1m30s") == 90000L)   // compound
    assert(InjectorApp.parseDurationMs("1h30m") == 5400000L)
    assert(InjectorApp.parseDurationMs("1500us") == 1L)      // sub-ms
    assert(InjectorApp.parseDurationMs("-2s") == -2000L)     // signed
    intercept[IllegalArgumentException] {
      InjectorApp.parseDurationMs("10fortnights")
    }
    // Go rejects unitless durations ("time: missing unit") — so do we
    intercept[IllegalArgumentException] {
      InjectorApp.parseDurationMs("10")
    }
    intercept[IllegalArgumentException] {
      InjectorApp.parseDurationMs("ms")
    }
  }
}
