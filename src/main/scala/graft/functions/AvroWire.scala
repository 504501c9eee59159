package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import scala.collection.concurrent.TrieMap

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Confluent wire format + registry-dispatched Avro decode, built on the
  * Avro runtime that ships with Spark (`avro-1.12.1.jar`) — no external
  * connector needed.
  *
  * Wire format (reference: src/kafka/encode_decode.go:115-147 and
  * src/kafka/fixtures/producer.go:96-118): byte 0 = magic `0`, bytes 1-4 =
  * big-endian schema-registry id, bytes 5.. = Avro binary body.
  *
  * The decode is the one genuinely custom operator in the engine
  * (SURVEY.md §7.4): Spark's built-in Avro path takes a single fixed
  * schema, while the reference dispatches per message on the embedded
  * schema id with a cached codec per id
  * (src/kafka/encode_decode.go:122-134; registry cache
  * src/schema_registry/schema_registry.go:16-27). [[MultiSchemaAvroDecode]]
  * reproduces exactly that: a writer-schema map keyed by id (the
  * "registry", config-provided in this offline build), a per-(thread,id)
  * `GenericDatumReader` cache, and decode into the reader schema's
  * Catalyst struct. Decode errors and unknown ids yield null (D6 drop
  * semantics — a poison message can't wedge the stream, SURVEY.md §7.5.5).
  *
  * Scale: CodegenFallback is deliberate — the cost is Avro IO itself, not
  * expression dispatch; the expression is still evaluated per-partition on
  * executors with zero shuffle, and the surrounding projections stay in
  * whole-stage codegen.
  */
object AvroWire {

  // ------------------------------------------------------------ D2: header

  /** Big-endian int32 schema id from bytes [1,5) of the value. `conv` is
    * unsigned, so re-sign manually to preserve the reference's int32 cast
    * (encode_decode.go:144-147).
    */
  def schemaId(value: Column): Column = {
    val unsigned = conv(hex(substring(value, 2, 4)), 16, 10).cast("long")
    when(unsigned >= 2147483648L, (unsigned - 4294967296L).cast("int"))
      .otherwise(unsigned.cast("int"))
  }

  /** Magic-byte check: first byte must be 0. */
  def magicOk(value: Column): Column =
    substring(value, 1, 1) === lit(Array[Byte](0))

  /** Avro body: everything after the 5-byte header (encode_decode.go:117). */
  def avroBody(value: Column): Column =
    substring(value, 6, Int.MaxValue)

  // ----------------------------------------------- Avro <-> Catalyst subset

  /** Catalyst type for a supported Avro schema (records of primitives,
    * nullable unions, arrays of primitives) — the surface the reference's
    * fixtures and the events payload need.
    */
  def catalystType(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG => LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING => StringType
    case Schema.Type.BYTES => BinaryType
    case Schema.Type.ARRAY => ArrayType(catalystType(s.getElementType))
    case Schema.Type.UNION =>
      import scala.jdk.CollectionConverters._
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"unsupported union $s")
      catalystType(nonNull.head)
    case Schema.Type.RECORD =>
      import scala.jdk.CollectionConverters._
      StructType(s.getFields.asScala.toSeq.map(f =>
        StructField(f.name, catalystType(f.schema))))
    case other => throw new IllegalArgumentException(s"unsupported $other")
  }

  private def toCatalyst(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: org.apache.avro.util.Utf8, StringType) =>
      UTF8String.fromString(u.toString)
    case (s: String, StringType) => UTF8String.fromString(s)
    case (b: ByteBuffer, BinaryType) =>
      val a = new Array[Byte](b.remaining); b.duplicate.get(a); a
    case (r: GenericRecord, st: StructType) =>
      InternalRow.fromSeq(st.fields.zipWithIndex.map { case (f, i) =>
        toCatalyst(r.get(i), f.dataType)
      }.toIndexedSeq)
    case (l: java.util.Collection[_], ArrayType(et, _)) =>
      val it = l.iterator
      val out = Array.newBuilder[Any]
      while (it.hasNext) out += toCatalyst(it.next(), et)
      new GenericArrayData(out.result())
    case (x, _) => x
  }

  // --------------------------------------------- D3: registry-driven decode

  /** Registry-dispatched Confluent-Avro decode expression. */
  case class MultiSchemaAvroDecode(
      child: Expression,
      readerSchemaJson: String,
      writerSchemaJsons: Map[Int, String])
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType =
      catalystType(new Schema.Parser().parse(readerSchemaJson))
    override def nullable: Boolean = true
    override def prettyName: String = "from_confluent_avro"

    // per-(thread, schema id) reader cache — the Spark analogue of the
    // reference's sync.Map codec cache (encode_decode.go:122-134);
    // DatumReader/decoder are not thread-safe, hence the thread key
    @transient private lazy val readers =
      new ThreadLocal[TrieMap[Int, GenericDatumReader[GenericRecord]]] {
        override def initialValue() = TrieMap.empty
      }
    @transient private lazy val readerSchema =
      new Schema.Parser().parse(readerSchemaJson)

    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      if (bytes.length < 6 || bytes(0) != 0) return null // bad magic/short
      val id = ((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
        ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
      writerSchemaJsons.get(id) match {
        case None => null // unknown schema id -> drop (D6)
        case Some(writerJson) =>
          try {
            val reader = readers.get().getOrElseUpdate(id,
              new GenericDatumReader[GenericRecord](
                new Schema.Parser().parse(writerJson), readerSchema))
            val dec = DecoderFactory.get()
              .binaryDecoder(bytes, 5, bytes.length - 5, null)
            toCatalyst(reader.read(null, dec), dataType)
          } catch { case _: Exception => null } // malformed body -> drop
      }
    }

    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Column wrapper: decode a Confluent-framed Avro binary column into a
    * struct of the reader schema.
    */
  def fromConfluentAvro(value: Column, readerSchemaJson: String,
      writerSchemaJsons: Map[Int, String]): Column =
    ColumnBridge.column(MultiSchemaAvroDecode(
      ColumnBridge.expression(value), readerSchemaJson, writerSchemaJsons))

  // --------------------------------------- serialization dual (fixtures)

  // parsed-schema + writer cache for the fixture encoder: schema parsing
  // per record is ~100× the cost of the encode itself. Keyed per thread
  // (GenericDatumWriter isn't thread-safe) by the schema text itself —
  // callers may encode different schemas under one registry id.
  @transient private lazy val encoders =
    new ThreadLocal[TrieMap[String, (Schema, GenericDatumWriter[GenericRecord])]] {
      override def initialValue() = TrieMap.empty
    }

  /** Encode one record in Confluent wire format — the test-producer dual
    * (reference: src/kafka/fixtures/producer.go:96-118). Driver/test-side
    * fixture machinery, not a data-path operator.
    */
  def encodeConfluent(id: Int, schemaJson: String,
      fields: Map[String, Any]): Array[Byte] = {
    val (schema, writer) = encoders.get().getOrElseUpdate(schemaJson, {
      val s = new Schema.Parser().parse(schemaJson)
      (s, new GenericDatumWriter[GenericRecord](s))
    })
    val rec = new GenericData.Record(schema)
    fields.foreach { case (k, v) => rec.put(k, v) }
    val out = new ByteArrayOutputStream()
    out.write(0)
    out.write(ByteBuffer.allocate(4).putInt(id).array())
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    writer.write(rec, enc)
    enc.flush()
    out.toByteArray
  }
}
