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
      checkpoint: String)

  /** Go `time.ParseDuration`-style strings ("1s", "500ms", "2m") to
    * millis — the reference's timeout/backoff env format
    * (config.go:34-50).
    */
  def parseDurationMs(s: String): Long = {
    val t = s.trim
    val (num, unit) = t.span(c => c.isDigit || c == '.')
    val v = num.toDouble
    unit match {
      case "ms" => v.toLong
      case "s" => (v * 1000).toLong
      case "m" => (v * 60000).toLong
      case "h" => (v * 3600000).toLong
      // Go's ParseDuration rejects unitless values too ("time: missing
      // unit in duration") — same contract, config typos fail fast
      case other =>
        throw new IllegalArgumentException(s"unsupported duration unit '$other'")
    }
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
      recordType = get("KAFKA_CONSUMER_RECORD_TYPE").getOrElse("json"),
      probesPort = get("PROBES_PORT").map(_.toInt),
      checkpoint = get("CHECKPOINT_LOCATION")
        .getOrElse("/tmp/graft-injector-checkpoint"))
  }

  /** Compose and start the full deployment (live Kafka/ES/registry —
    * the cluster-mode path; the offline harness exercises each seam
    * separately with MemoryStream/fixture servers).
    *
    * @param jsonSchema payload schema for `KAFKA_CONSUMER_RECORD_TYPE=
    *                   json` (the reference infers none either — JSON
    *                   payloads are schemaless maps there; a Spark plan
    *                   needs the shape up front)
    * @param avroReaderSchema reader schema for `=avro`, resolved against
    *                         per-message writer schemas from the registry
    */
  def start(spark: SparkSession, cfg: AppConfig, jsonSchema: StructType,
      avroReaderSchema: String = "",
      avroKeyReaderSchema: String = "",
      jsonKeySchema: Option[StructType] = None)
      : (StreamingQuery, Probes) = {
    def provider: SchemaProvider = new HttpSchemaProvider(
      cfg.registryUrl.getOrElse(throw new IllegalArgumentException(
        "SCHEMA_REGISTRY_URL is required for avro records")))
    val decoder = cfg.recordType match {
      case "avro" => InjectorOps.decoderForProvider(avroReaderSchema, provider)
      case _ => InjectorOps.decoderFor("json", jsonSchema)
    }
    // T2 full: the key decodes with the value's record type — Avro keys
    // through their own registry lookup (encode_decode.go:66-72), JSON
    // keys into the supplied struct (encode_decode.go:99-105)
    val keyDecoder =
      if (!cfg.injector.includeKey) None
      else cfg.recordType match {
        case "avro" =>
          Some(InjectorOps.avroKeyDecoder(avroKeyReaderSchema, provider))
        case _ => jsonKeySchema.map(InjectorOps.jsonKeyDecoder)
      }
    val assembled = StreamingPipeline.streamingPipeline(
      cfg.injector, jsonSchema, decoder = Some(decoder),
      keyDecoder = keyDecoder)(
      StreamingPipeline.kafkaSource(spark, cfg.source))
    val query = EsConnectorSink.start(assembled, cfg.sink, cfg.checkpoint)
    val probes = new Probes(cfg.probesPort.getOrElse(8080))
    probes.bind(query) // liveness up, readiness tracks the stream
    probes.serve()
    (query, probes)
  }
}
