package graft.plans

import graft.SparkSpec
import graft.model.{OrderEvent, Schemas}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The Avro wire-format path must be byte-real: what AvroEncode writes,
  * PLAIN Avro (the library any non-Spark consumer uses) must read — and
  * vice versa. Schema parity with the reference's avro_schemas.py is
  * pinned structurally. */
class AvroExpressionsSpec extends SparkSpec {
  import spark.implicits._
  import AvroExpressions._

  private val sampleOrders = Seq(
    OrderEvent("e1", "order_created", "2018-01-01T10:00:00", "o1",
      Some("c1"), Some("created"), None, Some("2018-01-20"), Some("t1")),
    OrderEvent("e2", "order_delivered", "2018-01-02T11:30:00", "o2",
      None, None, None, None, Some("t2")),
    OrderEvent("e3", "order_created", "2018-01-03T09:15:00", "o3",
      Some("c3"), Some("shipped"), Some("2018-01-04"), None, Some("t3")))

  test("round trip: encode then decode is the identity (nulls included)") {
    val df = sampleOrders.toDF()
    val back = df
      .select(avro_encode(struct(df.columns.map(col): _*),
        "OrderEvent", "com.ecommerce.events",
        wireSchema = Some(Schemas.orderWire)).as("payload"))
      .select(avro_decode(col("payload"), Schemas.orderWire,
        "OrderEvent", "com.ecommerce.events").as("r"))
      .select("r.*").as[OrderEvent].collect().toSeq
    assert(back == sampleOrders)
  }

  test("wire format: plain-Avro readers consume AvroEncode bytes") {
    val df = sampleOrders.toDF()
    val bytes = df
      .select(avro_encode(struct(df.columns.map(col): _*),
        "OrderEvent", "com.ecommerce.events",
        wireSchema = Some(Schemas.orderWire)).as("p"))
      .as[Array[Byte]].collect()
    val schema = avroSchemaFor(Schemas.orderWire, "OrderEvent", "com.ecommerce.events")
    val reader = new GenericDatumReader[GenericRecord](schema)
    val recs = bytes.map { b =>
      reader.read(null, DecoderFactory.get().binaryDecoder(b, null))
    }
    assert(recs.map(_.get("event_id").toString).toSeq == Seq("e1", "e2", "e3"))
    assert(recs(0).get("customer_id").toString == "c1")
    assert(recs(1).get("customer_id") == null)
    assert(recs(2).get("order_approved_at").toString == "2018-01-04")
  }

  test("wire format: AvroDecode consumes plain-Avro producer bytes") {
    val schema = avroSchemaFor(Schemas.orderWire, "OrderEvent", "com.ecommerce.events")
    val rec = new GenericData.Record(schema)
    rec.put("event_id", "x9"); rec.put("event_type", "order_created")
    rec.put("event_time", "2018-02-01T00:00:00"); rec.put("order_id", "o9")
    rec.put("customer_id", "c9"); rec.put("order_status", null)
    rec.put("order_approved_at", null)
    rec.put("estimated_delivery_date", null); rec.put("timestamp", "t9")
    val buf = new java.io.ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(buf, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    val out = Seq(buf.toByteArray).toDF("p")
      .select(avro_decode(col("p"), Schemas.orderWire,
        "OrderEvent", "com.ecommerce.events").as("r"))
      .select("r.*").as[OrderEvent].head()
    assert(out == OrderEvent("x9", "order_created", "2018-02-01T00:00:00",
      "o9", Some("c9"), None, None, None, Some("t9")))
  }

  test("schema parity with the reference's avro_schemas.py ORDER_SCHEMA") {
    // required fields plain, nullable fields ["null", T] with null
    // default — field-for-field (src/schemas/avro_schemas.py:1-16)
    val s = avroSchemaFor(Schemas.orderWire, "OrderEvent", "com.ecommerce.events")
    assert(s.getName == "OrderEvent")
    assert(s.getNamespace == "com.ecommerce.events")
    assert(s.getFields.size == 9)
    import scala.jdk.CollectionConverters._
    val byName = s.getFields.asScala.map(f => f.name() -> f).toMap
    for (req <- Seq("event_id", "event_type", "event_time", "order_id"))
      assert(byName(req).schema().getType == org.apache.avro.Schema.Type.STRING,
        s"$req must be a plain string")
    // avro_schemas.py:14 declares timestamp REQUIRED (no union)
    assert(byName("timestamp").schema().getType ==
      org.apache.avro.Schema.Type.STRING)
    for (opt <- Seq("customer_id", "order_status", "order_approved_at",
        "estimated_delivery_date")) {
      val u = byName(opt).schema()
      assert(u.getType == org.apache.avro.Schema.Type.UNION &&
        u.getTypes.asScala.map(_.getType.toString).toSeq == Seq("NULL", "STRING"),
        s"$opt must be [null, string]")
      assert(byName(opt).hasDefaultValue, s"$opt must default to null")
    }
  }

  test("Confluent framing: 0x00 magic + int32 BE schema id, round trip") {
    val df = sampleOrders.take(1).toDF()
    val framed = df
      .select(avro_encode(struct(df.columns.map(col): _*),
        "OrderEvent", "com.ecommerce.events", schemaId = 7,
        wireSchema = Some(Schemas.orderWire)).as("p"))
      .as[Array[Byte]].head()
    assert(framed(0) == 0 && framed(1) == 0 && framed(2) == 0 &&
      framed(3) == 0 && framed(4) == 7)
    val back = Seq(framed).toDF("p")
      .select(avro_decode(col("p"), Schemas.orderWire, "OrderEvent",
        "com.ecommerce.events", schemaId = 7).as("r"))
      .select("r.*").as[OrderEvent].head()
    assert(back == sampleOrders.head)
    // wrong id must fail loudly
    val err = intercept[Exception] {
      Seq(framed).toDF("p")
        .select(avro_decode(col("p"), Schemas.orderWire, "OrderEvent",
          "com.ecommerce.events", schemaId = 8).as("r"))
        .collect()
    }
    assert(err.getMessage != null)
  }

  test("malformed payload: failOnError=false yields NULL (the S2 drop contract)") {
    val junk = Seq(Array[Byte](9, 9, 9), Array.empty[Byte]).toDF("p")
    val out = junk.select(avro_decode(col("p"), Schemas.orderWire,
        failOnError = false).as("r"))
      .filter(col("r").isNotNull)
    assert(out.count() == 0)
  }

  test("numeric + timestamp + binary field classes round trip") {
    val st = StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("l", LongType, nullable = false),
      StructField("d", DoubleType, nullable = true),
      StructField("b", BooleanType, nullable = false),
      StructField("ts", TimestampType, nullable = true),
      StructField("bin", BinaryType, nullable = true)))
    val rows = Seq(
      Row(1, 2L, 3.5, true, java.sql.Timestamp.valueOf("2018-01-01 10:00:00"),
        Array[Byte](1, 2, 3)),
      Row(-7, -8L, null, false, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq), st)
    val back = df
      .select(avro_encode(struct(df.columns.map(col): _*), "N", "g").as("p"))
      .select(avro_decode(col("p"), st, "N", "g").as("r"))
      .select("r.*").collect().toSeq
    assert(back(0).getInt(0) == 1 && back(0).getLong(1) == 2L &&
      back(0).getDouble(2) == 3.5 && back(0).getBoolean(3) &&
      back(0).getTimestamp(4) == java.sql.Timestamp.valueOf("2018-01-01 10:00:00") &&
      back(0).getAs[Array[Byte]](5).toSeq == Seq[Byte](1, 2, 3))
    assert(back(1).getInt(0) == -7 && back(1).isNullAt(2) &&
      !back(1).getBoolean(3) && back(1).isNullAt(4) && back(1).isNullAt(5))
  }

  test("a null in a wire-required field fails loudly (the reference contract)") {
    // avro_schemas.py declares timestamp with no union: a missing
    // timestamp must not serialize silently
    val bad = Seq(OrderEvent("e9", "t", "2018-01-01", "o9",
      None, None, None, None, None)).toDF()
    val err = intercept[Exception] {
      bad.select(avro_encode(struct(bad.columns.map(col): _*),
        "OrderEvent", "com.ecommerce.events",
        wireSchema = Some(Schemas.orderWire)).as("p")).collect()
    }
    assert(err.getMessage.contains("timestamp") ||
      (err.getCause != null && err.getCause.getMessage.contains("timestamp")))
  }

  test("wireSchema must match the input struct by name and type") {
    val df = sampleOrders.take(1).toDF()
    // reordered names -> analysis-time rejection (values are written
    // by position; silent misattribution must be impossible)
    val shuffled = StructType(Schemas.orderWire.fields.reverse)
    val err = intercept[Exception] {
      df.select(avro_encode(struct(df.columns.map(col): _*),
        "OrderEvent", "com.ecommerce.events",
        wireSchema = Some(shuffled)).as("p")).collect()
    }
    assert(err.getMessage.contains("field names"))
  }

  test("config errors fail loudly even with failOnError=false") {
    // an unsupported field type in the TARGET schema is a
    // configuration error, not per-record corruption — it must not
    // silently NULL every row
    val badSt = StructType(Seq(
      StructField("d", DecimalType(10, 2), nullable = true)))
    val junk = Seq(Array[Byte](1, 2, 3)).toDF("p")
    val err = intercept[Exception] {
      junk.select(avro_decode(col("p"), badSt,
        failOnError = false).as("r")).collect()
    }
    assert(err.getMessage != null)
  }

  test("schema evolution: old-writer bytes resolve under a newer reader") {
    // v1 writer: (a, b); v2 reader adds nullable c (null default) and
    // drops b — the registry evolution case
    val v1 = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", StringType, nullable = false)))
    val v2 = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("c", DoubleType, nullable = true)))
    val df = Seq((7L, "old")).toDF("a", "b")
    val out = df
      .select(avro_encode(struct(col("a"), col("b")), "Rec", "ns",
        wireSchema = Some(v1)).as("p"))
      .select(avro_decode(col("p"), v2, "Rec", "ns",
        writerSchema = Some(v1)).as("r"))
      .select("r.*").collect().head
    assert(out.getLong(0) == 7L && out.isNullAt(1),
      "added nullable field must fill with its null default")
    // unresolvable change: reader REQUIRES a field the writer never
    // wrote -> loud failure, not silent garbage
    val v2bad = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("d", StringType, nullable = false)))
    val err = intercept[Exception] {
      df.select(avro_encode(struct(col("a"), col("b")), "Rec", "ns",
          wireSchema = Some(v1)).as("p"))
        .select(avro_decode(col("p"), v2bad, "Rec", "ns",
          writerSchema = Some(v1)).as("r"))
        .collect()
    }
    assert(err.getMessage != null)
  }

  test("property: random OrderEvents (unicode, empty, extremes) round trip") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val strGen = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(20)),
      Gen.const(""),
      Gen.const("héllo wörld — 中文 🙂"),
      Gen.listOfN(5, Gen.choose(Char.MinValue, '퟿')).map(_.mkString))
    val optGen = Gen.option(strGen)
    val evGen = for {
      id <- Gen.choose(0, 999999)
      et <- strGen; tm <- strGen; oid <- strGen
      c <- optGen; st <- optGen; ap <- optGen; ed <- optGen
      ts <- strGen // wire-required
    } yield OrderEvent(s"e$id", et, tm, oid, c, st, ap, ed, Some(ts))
    val prop = Prop.forAll(Gen.listOfN(4, evGen)) { evs =>
      val df = evs.toDF()
      val back = df
        .select(avro_encode(struct(df.columns.map(col): _*),
          "OrderEvent", "com.ecommerce.events",
          wireSchema = Some(Schemas.orderWire)).as("p"))
        .select(avro_decode(col("p"), Schemas.orderWire,
          "OrderEvent", "com.ecommerce.events").as("r"))
        .select("r.*").as[OrderEvent].collect().toSeq
      back == evs
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("encode is deterministic: same row, same bytes") {
    val df = sampleOrders.toDF()
    def run() = df.select(avro_encode(struct(df.columns.map(col): _*),
        "OrderEvent", "com.ecommerce.events").as("p"))
      .as[Array[Byte]].collect().map(_.toSeq).toSeq
    assert(run() == run())
  }
}
