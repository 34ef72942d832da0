package graft.plans

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory

/** Generates the checked-in third-party-writer fixtures under
  * `src/test/resources/avro/` (r14 verdict item 6): the bytes are
  * produced by VANILLA Avro — `Schema.Parser` on hand-authored .avsc
  * JSON + `GenericDatumWriter`/`binaryEncoder`, the exact code path
  * `avro-tools jsontofrag` runs — never by this repo's [[AvroEncode]],
  * so decoding them in AvroWireFixtureSpec proves [[AvroDecode]] (and
  * the schemas [[AvroExpressions.avroSchemaFor]] derives for
  * resolution) interoperate with an independent writer rather than
  * only round-tripping our own encoder.
  *
  * Deterministic: fixed schemas, fixed values — re-running must
  * reproduce the committed bytes byte-for-byte (the spec asserts the
  * .avsc files match what it derives, and values are pinned).
  *
  * Run once per schema change: sbt "Test/runMain graft.plans.AvroFixtureGen"
  */
object AvroFixtureGen {

  /** Writer schema V1 — mirrors the layout avroSchemaFor derives
    * (required = plain type, nullable = ["null", T] + null default) so
    * the resolution cases can name V1 as a Catalyst StructType. */
  val v1Json: String =
    """{"type":"record","name":"Fixture","namespace":"graft","fields":[
      |{"name":"id","type":"long"},
      |{"name":"name","type":["null","string"],"default":null},
      |{"name":"score","type":"double"}
      |]}""".stripMargin

  /** Writer schema V3 — the type-promotion case: id INT (reader reads
    * long), score FLOAT (reader reads double). */
  val v3Json: String =
    """{"type":"record","name":"Fixture","namespace":"graft","fields":[
      |{"name":"id","type":"int"},
      |{"name":"name","type":["null","string"],"default":null},
      |{"name":"score","type":"float"}
      |]}""".stripMargin

  private def encode(json: String)(fill: GenericRecord => Unit): Array[Byte] = {
    val schema = new Schema.Parser().parse(json)
    val rec = new GenericData.Record(schema)
    fill(rec)
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val dir = Paths.get("src", "test", "resources", "avro")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("fixture_v1.avsc"), v1Json + "\n")
    Files.writeString(dir.resolve("fixture_v3.avsc"), v3Json + "\n")
    // v1 record: a present nullable string (with non-ASCII) …
    Files.write(dir.resolve("writer_v1.bin"), encode(v1Json) { r =>
      r.put("id", java.lang.Long.valueOf(42L))
      r.put("name", new org.apache.avro.util.Utf8("álpha✓"))
      r.put("score", java.lang.Double.valueOf(2.5))
    })
    // … and a null one (union branch 0)
    Files.write(dir.resolve("writer_v1_null.bin"), encode(v1Json) { r =>
      r.put("id", java.lang.Long.valueOf(-7L))
      r.put("name", null)
      r.put("score", java.lang.Double.valueOf(-0.125))
    })
    // v3 record: int id + float score for the promotion case
    Files.write(dir.resolve("writer_v3.bin"), encode(v3Json) { r =>
      r.put("id", java.lang.Integer.valueOf(7))
      r.put("name", new org.apache.avro.util.Utf8("beta"))
      r.put("score", java.lang.Float.valueOf(1.5f))
    })
    println(s"[avro-fixtures] wrote ${dir.toAbsolutePath}")
  }
}
