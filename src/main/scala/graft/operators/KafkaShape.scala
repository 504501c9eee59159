package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Adapter giving the driver's `events` parquet table the exact shape of
  * Spark's Kafka source DataFrame (`key, value, topic, partition, offset,
  * timestamp, timestampType`), so every injector op runs unchanged in batch
  * (oracle-verified) and against a real Kafka source.
  *
  * Mapping (FIXTURES.md §2): `user_id mod 32` plays the Kafka partition
  * (a topic has a BOUNDED partition count — the pre-r11 raw
  * `user_id.cast(int)` overflowed ANSI-cast at ids ≥ 2³¹, found by the
  * 10× scale probe, and was also unfaithful: real partitions are
  * 0..N−1), `event_id` the offset, `ts` the message timestamp; the
  * remaining columns are serialized to a JSON message value (the
  * reference's `KAFKA_CONSUMER_RECORD_TYPE=json` path). Because
  * serialize→decode is the identity on these fields, every downstream
  * query has a plain-SQL oracle over the original table.
  */
object KafkaShape {

  /** Simulated topic partition count (`user_id mod this` = partition,
    * mirrored verbatim in every oracle that reads the partition). */
  val NumPartitions = 32

  /** Payload schema of the simulated JSON messages. */
  val eventPayloadSchema: StructType = StructType(Seq(
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def fromEvents(events: DataFrame): DataFrame =
    events.select(
      encode(col("user_id").cast("string"), "UTF-8").as("key"),
      encode(
        to_json(struct(col("event_type"), col("value"), col("props"))),
        "UTF-8").as("value"),
      lit("events").as("topic"),
      pmod(col("user_id"), lit(NumPartitions.toLong)).cast("int")
        .as("partition"),
      col("event_id").as("offset"),
      col("ts").as("timestamp"),
      lit(0).as("timestampType"))
}
