package graft.queries

import graft.Tables
import graft.functions.AvroWire
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** D2/D3 on real data: events serialized into Confluent wire format (the
  * test-producer dual, SURVEY.md §3.3) and decoded back with the
  * registry-dispatched expression. Two writer schemas with *different
  * field orders* share one reader schema, so a correct result proves the
  * per-message schema-id dispatch actually happened — a single-schema
  * decode would garble every id=1 row.
  */
object AvroQueries {
  type Q = (SparkSession, String) => DataFrame

  private val writer0 =
    """{"type":"record","name":"Ev","fields":[
       {"name":"event_type","type":"string"},
       {"name":"value","type":"double"}]}""".replaceAll("\n\\s*", "")
  private val writer1 = // reversed field order -> different binary layout
    """{"type":"record","name":"Ev","fields":[
       {"name":"value","type":"double"},
       {"name":"event_type","type":"string"}]}""".replaceAll("\n\\s*", "")
  private val reader = writer0
  private val writers = Map(0 -> writer0, 1 -> writer1)

  private val encodeUdf = udf { (id: Int, et: String, v: Double) =>
    AvroWire.encodeConfluent(id, writers(id),
      Map("event_type" -> et, "value" -> v))
  }

  /** events framed as Confluent-Avro Kafka messages, id = event_id % 2.
    * Memoized per (session, dir): the wire framing is test-fixture input
    * (the producer dual), not the operator under test, and both d2 and d3
    * consume the identical frame.
    */
  private val wireCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  private def wire(s: SparkSession, dir: String): DataFrame =
    wireCache.getOrElseUpdate((s, dir),
      Tables.events(s, dir).select(col("event_id"),
        encodeUdf((col("event_id") % 2).cast("int"), col("event_type"),
          col("value")).as("value"))
        .localCheckpoint(false))

  val all: Map[String, Q] = Map(
    // D2: big-endian schema-id extraction from the wire header.
    "d2_schema_id" -> ((s, dir) =>
      wire(s, dir).select(col("event_id"),
        AvroWire.schemaId(col("value")).as("schema_id"),
        AvroWire.magicOk(col("value")).as("magic_ok"))),

    // D3: registry-dispatched multi-schema decode (codec cache per id).
    "d3_avro_decode" -> ((s, dir) =>
      wire(s, dir)
        .select(col("event_id"),
          AvroWire.fromConfluentAvro(col("value"), reader, writers)
            .as("payload"))
        .filter(col("payload").isNotNull)
        .select(col("event_id"), col("payload.event_type").as("event_type"),
          col("payload.value").as("value")))
  )

  val oracles: Map[String, String] = Map(
    "d2_schema_id" ->
      "SELECT event_id, (event_id % 2)::INTEGER AS schema_id, true AS magic_ok FROM events",
    "d3_avro_decode" ->
      "SELECT event_id, event_type, value FROM events"
  )
}
