package graft

import graft.functions.AvroWire
import org.apache.spark.sql.functions._

/** Mirrors the reference's Avro fixtures (src/kafka/fixtures/fixtures.go:
  * 15-35 — FixtureRecord {"id": int} in Confluent wire format) plus the
  * error semantics of encode_decode.go: bad magic, unknown id, truncated
  * body all drop (null), never throw.
  */
class AvroWireSpec extends SparkSpec {
  import spark.implicits._

  private val fixtureSchema =
    """{"type":"record","name":"FixtureRecord",
       "fields":[{"name":"id","type":"int"}]}""".replaceAll("\n\\s*", "")

  private def wireDf(rows: Array[Byte]*) =
    rows.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("n", "value")

  test("roundtrip: encode then decode recovers the record") {
    val bytes = AvroWire.encodeConfluent(7, fixtureSchema, Map("id" -> 42))
    val out = wireDf(bytes).select(
      AvroWire.fromConfluentAvro($"value", fixtureSchema,
        Map(7 -> fixtureSchema))("id")).as[Int].head()
    assert(out == 42)
  }

  test("schema id: big-endian bytes 1-4, negative ids preserved") {
    val pos = AvroWire.encodeConfluent(66051, fixtureSchema, Map("id" -> 1))
    val neg = AvroWire.encodeConfluent(-2, fixtureSchema, Map("id" -> 1))
    val ids = wireDf(pos, neg).orderBy($"n")
      .select(AvroWire.schemaId($"value")).as[Int].collect()
    assert(ids.toSeq == Seq(66051, -2))
  }

  test("unknown schema id decodes to null (drop, not error)") {
    val bytes = AvroWire.encodeConfluent(9, fixtureSchema, Map("id" -> 1))
    val out = wireDf(bytes).select(
      AvroWire.fromConfluentAvro($"value", fixtureSchema,
        Map(7 -> fixtureSchema)).isNull).as[Boolean].head()
    assert(out)
  }

  test("bad magic byte and truncated value decode to null") {
    val good = AvroWire.encodeConfluent(7, fixtureSchema, Map("id" -> 1))
    val badMagic = good.clone(); badMagic(0) = 1
    val short = good.take(4)
    val out = wireDf(badMagic, short).select(
      AvroWire.fromConfluentAvro($"value", fixtureSchema,
        Map(7 -> fixtureSchema)).isNull).as[Boolean].collect()
    assert(out.toSeq == Seq(true, true))
  }

  test("multi-schema dispatch resolves different field orders") {
    val w0 = """{"type":"record","name":"R","fields":[
      {"name":"a","type":"int"},{"name":"b","type":"string"}]}"""
      .replaceAll("\n\\s*", "")
    val w1 = """{"type":"record","name":"R","fields":[
      {"name":"b","type":"string"},{"name":"a","type":"int"}]}"""
      .replaceAll("\n\\s*", "")
    val r0 = AvroWire.encodeConfluent(0, w0, Map("a" -> 1, "b" -> "x"))
    val r1 = AvroWire.encodeConfluent(1, w1, Map("a" -> 2, "b" -> "y"))
    val out = wireDf(r0, r1).orderBy($"n")
      .select(AvroWire.fromConfluentAvro($"value", w0, Map(0 -> w0, 1 -> w1)))
      .select($"from_confluent_avro(value).a", $"from_confluent_avro(value).b")
      .as[(Int, String)].collect()
    assert(out.toSeq == Seq((1, "x"), (2, "y")))
  }
}
