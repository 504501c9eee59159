package graft.streaming

import graft.functions.{HttpSchemaProvider, SchemaProvider}
import graft.operators.InjectorOps
import graft.operators.InjectorOps.InjectorConfig
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** The reference's whole deployment, assembled from the SAME environment
  * variables (`cmd/injector.go:21-76`, `src/kafka/config.go`,
  * `src/elasticsearch/config.go:34-98`): a reference operator can point
  * their existing env at this and get the Spark-native pipeline —
  * Kafka source → record-type-dispatched decode → enrich/route →
  * ES connector with create semantics, plus probes and the metrics
  * listener. `fromEnv` is pure (env injected as a Map) so the whole
  * config surface is unit-testable offline; `start` needs a live
  * Kafka + ES, exactly like the reference binary.
  */
object InjectorApp {

  final case class AppConfig(
      source: StreamingPipeline.KafkaSourceConfig,
      injector: InjectorConfig,
      sink: EsConnectorSink.EsConnectorConfig,
      registryUrl: Option[String],
      recordType: String,
      probesPort: Option[Int],
      livenessRoute: String = "/healthz",
      readinessRoute: String = "/readiness",
      installTemplate: Boolean = false,
      checkpoint: String = "/tmp/graft-injector-checkpoint")

  /** Go `time.ParseDuration` strings to millis — the reference's
    * timeout/backoff env format (config.go:34-50). Full contract:
    * compound values ("1m30s"), optional sign, ns/us/µs/ms/s/m/h units;
    * unitless or malformed input errors like Go's "missing unit".
    */
  def parseDurationMs(s: String): Long = {
    val t = s.trim
    val (sign, body) =
      if (t.startsWith("-")) (-1L, t.tail)
      else if (t.startsWith("+")) (1L, t.tail) else (1L, t)
    // Go special-cases a bare (optionally signed) "0" — the only unitless
    // value ParseDuration accepts (time.go: `if s == "0" { return 0 }`)
    if (body == "0") return 0L
    val token = "([0-9]+(?:\\.[0-9]+)?)(ns|us|µs|ms|s|m|h)".r
    val matches = token.findAllMatchIn(body).toSeq
    require(matches.nonEmpty && matches.map(_.matched).mkString == body,
      s"invalid duration '$s' (Go time.ParseDuration format)")
    val ns = matches.map { m =>
      val v = m.group(1).toDouble
      m.group(2) match {
        case "ns" => v
        case "us" | "µs" => v * 1e3
        case "ms" => v * 1e6
        case "s" => v * 1e9
        case "m" => v * 6e10
        case "h" => v * 3.6e12
      }
    }.sum
    sign * (ns / 1e6).toLong
  }

  /** Env-var surface, name-for-name with the reference. Unset/empty vars
    * take the reference's defaults.
    */
  def fromEnv(env: Map[String, String]): AppConfig = {
    def get(k: String) = env.get(k).filter(_.nonEmpty)
    def csv(k: String) =
      get(k).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val topics = csv("KAFKA_TOPICS").getOrElse(Nil)
    AppConfig(
      source = StreamingPipeline.KafkaSourceConfig(
        bootstrapServers = get("KAFKA_ADDRESS").getOrElse("localhost:9092"),
        topics = topics,
        // S2: the reference's batch size bounds in-flight records
        maxOffsetsPerTrigger =
          get("KAFKA_CONSUMER_BATCH_SIZE").map(_.toLong)),
      injector = InjectorConfig(
        topic = topics.headOption.getOrElse("events"),
        esIndex = get("ES_INDEX"),
        indexPrefix = get("ES_INDEX_PREFIX").getOrElse(""),
        indexColumn = get("ES_INDEX_COLUMN"),
        docIdColumn = get("ES_DOC_ID_COLUMN"),
        timeSuffix = get("ES_TIME_SUFFIX") match {
          case Some("hour") => InjectorOps.HourSuffix
          case _ => InjectorOps.DaySuffix // config.go:51-57: day default
        },
        blacklist = csv("ES_BLACKLISTED_COLUMNS").getOrElse(Nil),
        includeKey =
          get("KAFKA_CONSUMER_INCLUDE_KEY").exists(_.toBoolean)),
      sink = EsConnectorSink.EsConnectorConfig(
        host = get("ELASTICSEARCH_HOST").getOrElse("localhost"),
        scheme =
          get("ELASTICSEARCH_SCHEME").filter(_ == "https").getOrElse("http"),
        user = get("ELASTICSEARCH_USER"),
        password = get("ELASTICSEARCH_PASSWORD"),
        ignoreCertificate =
          get("ELASTICSEARCH_IGNORE_CERT").exists(_.toBoolean),
        disableSniffing =
          get("ELASTICSEARCH_DISABLE_SNIFFING").exists(_.toBoolean),
        bulkTimeoutMs =
          get("ES_BULK_TIMEOUT").map(parseDurationMs).getOrElse(1000L),
        backoffMs =
          get("ES_BULK_BACKOFF").map(parseDurationMs).getOrElse(1000L)),
      registryUrl = get("SCHEMA_REGISTRY_URL"),
      // the reference treats anything but "json" as avro
      // (encode_decode.go:34-40) — unset means the avro default path
      recordType = get("KAFKA_CONSUMER_RECORD_TYPE").getOrElse("avro"),
      probesPort = get("PROBES_PORT").map(_.toInt),
      // the reference reads probe paths from env (probes.go:9-11) — a
      // deployment migrating env name-for-name keeps its configured routes
      livenessRoute = get("K8S_LIVENESS_ROUTE").getOrElse("/healthz"),
      readinessRoute = get("K8S_READINESS_ROUTE").getOrElse("/readiness"),
      // EXTENSION var (not in the reference env surface): the reference
      // leaves template install to a manual PUT its README prescribes
      // (README.md:53-67); ES_INDEX_TEMPLATE=true makes that documented
      // pre-create step part of startup
      installTemplate = get("ES_INDEX_TEMPLATE").exists(_.toBoolean),
      checkpoint = get("CHECKPOINT_LOCATION")
        .getOrElse("/tmp/graft-injector-checkpoint"))
  }

  /** Compose and start the full deployment. The defaults are the
    * cluster-mode path (live Kafka source, es-hadoop connector sink,
    * HTTP schema registry); each is an injectable seam so the SAME
    * assembly — record-type dispatch, key decode, probe wiring and all —
    * runs end-to-end in-process against a MemoryStream source, a fixture
    * registry server, and an [[EsBulkSink]] (StreamingSpec), the way the
    * reference proves its composition against docker-compose services
    * (`src/kafka/consumer_test.go:106-147`).
    *
    * @param jsonSchema payload schema for `KAFKA_CONSUMER_RECORD_TYPE=
    *                   json` (the reference infers none either — JSON
    *                   payloads are schemaless maps there; a Spark plan
    *                   needs the shape up front)
    * @param avroReaderSchema reader schema for `=avro`, resolved against
    *                         per-message writer schemas from the registry
    * @param source injected Kafka-shaped streaming frame (default: the
    *               live Kafka source built from `cfg.source`)
    * @param startSink starts the assembled stream into a sink (default:
    *                  the ES connector with `cfg.sink` + `cfg.checkpoint`)
    * @param schemaProvider registry override (default: HTTP client
    *                       against `cfg.registryUrl`)
    */
  def start(spark: SparkSession, cfg: AppConfig, jsonSchema: StructType,
      avroReaderSchema: String = "",
      avroKeyReaderSchema: String = "",
      jsonKeySchema: Option[StructType] = None,
      source: Option[org.apache.spark.sql.DataFrame] = None,
      startSink: Option[org.apache.spark.sql.DataFrame => StreamingQuery] =
        None,
      schemaProvider: Option[SchemaProvider] = None,
      sinkPing: Option[() => Boolean] = None)
      : (StreamingQuery, Probes) = {
    def provider: SchemaProvider = schemaProvider.getOrElse(
      new HttpSchemaProvider(
        cfg.registryUrl.getOrElse(throw new IllegalArgumentException(
          "SCHEMA_REGISTRY_URL is required for avro records"))))
    // DeserializerFor semantics (encode_decode.go:34-40): "json" is the
    // special case, EVERYTHING else takes the avro path
    val decoder = cfg.recordType match {
      case "json" => InjectorOps.decoderFor("json", jsonSchema)
      case _ => InjectorOps.decoderForProvider(avroReaderSchema, provider)
    }
    // T2 full: the key decodes with the value's record type — Avro keys
    // through their own registry lookup (encode_decode.go:66-72), JSON
    // keys into the supplied struct (encode_decode.go:99-105). A config
    // the reference honors must not silently no-op: missing key schema
    // with includeKey on is a caller error.
    val keyDecoder =
      if (!cfg.injector.includeKey) None
      else cfg.recordType match {
        case "json" => Some(InjectorOps.jsonKeyDecoder(
          jsonKeySchema.getOrElse(throw new IllegalArgumentException(
            "jsonKeySchema is required when KAFKA_CONSUMER_INCLUDE_KEY=true " +
              "with json records"))))
        case _ =>
          require(avroKeyReaderSchema.nonEmpty,
            "avroKeyReaderSchema is required when " +
              "KAFKA_CONSUMER_INCLUDE_KEY=true with avro records")
          Some(InjectorOps.avroKeyDecoder(avroKeyReaderSchema, provider))
      }
    val assembled = StreamingPipeline.streamingPipeline(
      cfg.injector, jsonSchema, decoder = Some(decoder),
      keyDecoder = keyDecoder)(
      source.getOrElse(StreamingPipeline.kafkaSource(spark, cfg.source)))
    val query = startSink.getOrElse { (a: org.apache.spark.sql.DataFrame) =>
      // the documented pre-create step, BEFORE the first insert: without
      // a template, dynamic mapping guesses every field type
      if (cfg.installTemplate)
        EsConnectorSink.ensureTemplate(cfg.sink,
          cfg.injector.indexPrefix +
            cfg.injector.esIndex.getOrElse(cfg.injector.topic))
      EsConnectorSink.start(a, cfg.sink, cfg.checkpoint)
    }.apply(assembled)
    val probes = new Probes(cfg.probesPort.getOrElse(8080),
      cfg.livenessRoute, cfg.readinessRoute)
    // liveness up; readiness tracks the stream AND the sink: the default
    // cluster path pings the configured ES host like the reference's
    // ReadinessCheck; an injected sink (tests, the HTTP sink) passes its
    // own ping. An injected sink WITHOUT a ping skips the check rather
    // than probing an unrelated default host.
    val ping = sinkPing.orElse(
      if (startSink.isEmpty) Some(() => EsConnectorSink.ping(cfg.sink))
      else None)
    probes.bind(query, ping)
    probes.serve()
    (query, probes)
  }
}
