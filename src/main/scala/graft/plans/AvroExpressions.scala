package graft.plans

import java.io.ByteArrayOutputStream

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Avro WIRE-FORMAT serialization (SURVEY §2.1 S1 adjunct; reference
  * `src/schemas/avro_schemas.py:1-57` + the Schema-Registry framing of
  * `scripts/validate_pipeline.py:70-87`). The environment has no
  * spark-avro DataSource jar, but core Avro 1.12 ships with Spark, so
  * the byte-level path is real: these expressions produce/consume the
  * exact Avro binary encoding (plus optional Confluent framing — magic
  * byte 0x00 + big-endian int32 schema id) that a Kafka
  * producer/consumer pair would exchange.
  *
  * The Avro schema is DERIVED from the Catalyst struct type the same
  * way the repo's case classes derive the reference's dict schemas
  * (`model/Events.scala`): required fields map to plain types,
  * nullable fields to `["null", T]` unions with null default —
  * byte-compatible with avro_schemas.py's declarations.
  *
  * CodegenFallback is deliberate: spark-avro's own
  * CatalystDataToAvro/AvroDataToCatalyst are CodegenFallback too — the
  * per-row cost is the Avro encoder, not the eval boundary; writer,
  * reader and output buffer are reused per task via transient lazy
  * state.
  */
object AvroExpressions {

  /** Catalyst → Avro schema. Supported: the reference-schema type set
    * (string/int/long/double/boolean/binary) + timestamp-micros and
    * local-timestamp-micros (TimestampNTZ — what Tables.load's
    * nanos conversion yields for the events table). */
  def avroSchemaFor(st: StructType, recordName: String,
      namespace: String): Schema = {
    def base(dt: DataType): Schema = dt match {
      case StringType => Schema.create(Schema.Type.STRING)
      case IntegerType => Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case TimestampType =>
        LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case TimestampNTZType =>
        LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case other =>
        throw new IllegalArgumentException(
          s"avro_encode: unsupported field type $other")
    }
    val fields = new java.util.ArrayList[Schema.Field]()
    st.fields.foreach { f =>
      val s = base(f.dataType)
      if (f.nullable)
        fields.add(new Schema.Field(f.name,
          Schema.createUnion(Schema.create(Schema.Type.NULL), s),
          null, Schema.Field.NULL_DEFAULT_VALUE))
      else fields.add(new Schema.Field(f.name, s, null, null.asInstanceOf[Object]))
    }
    Schema.createRecord(recordName, null, namespace, false, fields)
  }

  /** 5-byte Confluent wire header: magic 0x00 + int32 BE schema id. */
  private[plans] def frame(body: Array[Byte], schemaId: Int): Array[Byte] = {
    val out = new Array[Byte](body.length + 5)
    out(0) = 0
    out(1) = (schemaId >>> 24).toByte
    out(2) = (schemaId >>> 16).toByte
    out(3) = (schemaId >>> 8).toByte
    out(4) = schemaId.toByte
    System.arraycopy(body, 0, out, 5, body.length)
    out
  }

  private[plans] def unframe(bytes: Array[Byte], expectId: Int): Array[Byte] = {
    require(bytes.length >= 5 && bytes(0) == 0,
      s"not Confluent-framed Avro (len=${bytes.length}, magic=${if (bytes.nonEmpty) bytes(0) else -1})")
    val id = ((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
      ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
    require(id == expectId, s"schema id $id, expected $expectId")
    java.util.Arrays.copyOfRange(bytes, 5, bytes.length)
  }

  // ---- Column API ----

  /** struct column → Avro binary. `schemaId` ≥ 0 adds Confluent
    * framing. `wireSchema` pins the on-wire nullability contract
    * independent of the input expression's inferred nullability
    * (Spark marks every reference-typed column nullable; the reference
    * schemas require their envelope + measure fields — and required vs
    * union is a byte-level difference). */
  def avro_encode(c: Column, recordName: String = "Record",
      namespace: String = "graft", schemaId: Int = -1,
      wireSchema: Option[StructType] = None): Column =
    GraftColumnBridge.column(AvroEncode(
      GraftColumnBridge.expression(c), recordName, namespace, schemaId,
      wireSchema))

  /** Avro binary → struct of `st`. `failOnError=false` yields NULL on a
    * malformed payload (the reference's malformed-drop contract, S2).
    * `writerSchema` enables Avro schema RESOLUTION — the registry
    * evolution case: bytes written under an older (or newer) schema
    * are read under `st`, added nullable fields fill with their null
    * default, dropped fields are skipped, and an unresolvable change
    * (e.g. a missing required field) fails loudly. */
  def avro_decode(c: Column, st: StructType, recordName: String = "Record",
      namespace: String = "graft", schemaId: Int = -1,
      failOnError: Boolean = true,
      writerSchema: Option[StructType] = None): Column =
    GraftColumnBridge.column(AvroDecode(GraftColumnBridge.expression(c),
      st, recordName, namespace, schemaId, failOnError, writerSchema))
}

/** Catalyst struct → Avro-binary bytes. */
final case class AvroEncode(child: Expression, recordName: String,
    namespace: String, schemaId: Int,
    wireSchema: Option[StructType] = None)
    extends UnaryExpression with CodegenFallback {
  import AvroExpressions._

  // lazy: child.dataType is only legal once the child is resolved.
  // wireSchema overrides the inferred nullability (see avro_encode).
  @transient private lazy val structType: StructType =
    wireSchema.getOrElse(child.dataType.asInstanceOf[StructType])

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case st: StructType =>
        // values are written by POSITION, so a wireSchema whose names
        // or types disagree with the input would silently serialize
        // values under the wrong fields — reject at analysis
        wireSchema match {
          case Some(w) if w.fieldNames.toSeq != st.fieldNames.toSeq =>
            org.apache.spark.sql.catalyst.analysis.TypeCheckResult
              .TypeCheckFailure(
                s"avro_encode wireSchema field names ${w.fieldNames.toSeq} " +
                  s"must match the input struct ${st.fieldNames.toSeq} " +
                  "(same names, same order)")
          case Some(w) if w.fields.map(_.dataType).toSeq !=
              st.fields.map(_.dataType).toSeq =>
            org.apache.spark.sql.catalyst.analysis.TypeCheckResult
              .TypeCheckFailure(
                "avro_encode wireSchema field types must match the input " +
                  "struct (only nullability may differ)")
          case _ =>
            org.apache.spark.sql.catalyst.analysis.TypeCheckResult
              .TypeCheckSuccess
        }
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"avro_encode expects a struct input, got $other")
    }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "avro_encode"

  @transient private lazy val schema = avroSchemaFor(structType, recordName, namespace)
  @transient private lazy val writer = new GenericDatumWriter[GenericRecord](schema)
  @transient private lazy val buf = new ByteArrayOutputStream()
  @transient private var encoder: BinaryEncoder = _

  override def nullSafeEval(input: Any): Any = {
    val row = input.asInstanceOf[InternalRow]
    val rec = new GenericData.Record(schema)
    var i = 0
    while (i < structType.length) {
      val f = structType(i)
      val v: AnyRef =
        if (row.isNullAt(i)) {
          require(f.nullable,
            s"null in non-nullable avro field ${f.name}")
          null
        } else f.dataType match {
          case StringType => new org.apache.avro.util.Utf8(row.getUTF8String(i).getBytes)
          case IntegerType => java.lang.Integer.valueOf(row.getInt(i))
          case LongType | TimestampType | TimestampNTZType =>
            java.lang.Long.valueOf(row.getLong(i))
          case DoubleType => java.lang.Double.valueOf(row.getDouble(i))
          case FloatType => java.lang.Float.valueOf(row.getFloat(i))
          case BooleanType => java.lang.Boolean.valueOf(row.getBoolean(i))
          case BinaryType => java.nio.ByteBuffer.wrap(row.getBinary(i))
          case other => throw new IllegalStateException(other.toString)
        }
      rec.put(i, v)
      i += 1
    }
    buf.reset()
    encoder = EncoderFactory.get().binaryEncoder(buf, encoder)
    writer.write(rec, encoder)
    encoder.flush()
    val body = buf.toByteArray
    if (schemaId >= 0) frame(body, schemaId) else body
  }

  override protected def withNewChildInternal(newChild: Expression): AvroEncode =
    copy(child = newChild)
}

/** Avro-binary bytes → Catalyst struct. */
final case class AvroDecode(child: Expression, structType: StructType,
    recordName: String, namespace: String, schemaId: Int,
    failOnError: Boolean, writerSchema: Option[StructType] = None)
    extends UnaryExpression with CodegenFallback {
  import AvroExpressions._

  override def dataType: DataType = structType
  override def nullable: Boolean = true
  override def prettyName: String = "avro_decode"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"avro_decode expects a binary input, got $other")
    }

  @transient private lazy val schema = avroSchemaFor(structType, recordName, namespace)
  // writer != reader => Avro schema resolution (GenericDatumReader's
  // two-schema constructor): reader-added nullable fields take their
  // null default, writer-only fields are skipped. Compatibility is
  // checked EAGERLY here: Avro itself only fails resolution inside
  // read() — which sits in nullSafeEval's permissive try, so with
  // failOnError=false an unresolvable PAIR (a configuration error,
  // e.g. reader adds a required field) would silently decode every
  // row to NULL instead of failing loudly.
  @transient private lazy val reader = writerSchema match {
    case Some(w) =>
      val ws = avroSchemaFor(w, recordName, namespace)
      val compat = org.apache.avro.SchemaCompatibility
        .checkReaderWriterCompatibility(schema, ws)
      if (compat.getType !=
          org.apache.avro.SchemaCompatibility.SchemaCompatibilityType.COMPATIBLE)
        throw new IllegalArgumentException(
          s"avro_decode: reader schema cannot resolve writer schema — " +
            compat.getDescription)
      new GenericDatumReader[GenericRecord](ws, schema)
    case None => new GenericDatumReader[GenericRecord](schema)
  }
  @transient private var decoder: BinaryDecoder = _
  @transient private var reuse: GenericRecord = _

  override def nullSafeEval(input: Any): Any = {
    // force schema/reader construction OUTSIDE the permissive try:
    // an unsupported field type or an unresolvable writer/reader pair
    // is a CONFIGURATION error that must fail loudly on the first row
    // even with failOnError=false — only per-record data corruption
    // may become NULL
    val rd = reader
    try {
      val raw = input.asInstanceOf[Array[Byte]]
      val body = if (schemaId >= 0) unframe(raw, schemaId) else raw
      decoder = DecoderFactory.get().binaryDecoder(body, decoder)
      reuse = rd.read(reuse, decoder)
      val out = new Array[Any](structType.length)
      var i = 0
      while (i < structType.length) {
        val v = reuse.get(i)
        out(i) =
          if (v == null) null
          else structType(i).dataType match {
            case StringType => UTF8String.fromString(v.toString)
            case IntegerType | LongType | TimestampType | TimestampNTZType |
                DoubleType | FloatType | BooleanType => v
            case BinaryType =>
              val bb = v.asInstanceOf[java.nio.ByteBuffer]
              val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
            case other => throw new IllegalStateException(other.toString)
          }
        i += 1
      }
      InternalRow.fromSeq(out.toIndexedSeq)
    } catch {
      // only swallow genuinely recoverable decode failures; fatal
      // errors (OOM, interrupts) always propagate
      case scala.util.control.NonFatal(_) if !failOnError => null
    }
  }

  override protected def withNewChildInternal(newChild: Expression): AvroDecode =
    copy(child = newChild)
}
