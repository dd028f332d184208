package graft.sinks

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileWriter, SeekableByteArrayInput, DataFileReader}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.types._

/** Avro output layer — the print/kafka Avro formats (reference:
  * `p_avro_schema_build_acct_data` src/plugin_cmn_avro.c:47;
  * `kafka_avro_schema_registry` CONFIG-KEYS:1885).
  *
  * The Avro schema is built field-by-field from the query's OUTPUT schema —
  * the Spark analogue of pmacct's `what_to_count` bitmask walk: whatever
  * primitives the aggregation projected is exactly what the record schema
  * carries, nullable fields as `union[null, T]`. Rows encode to
  * single-record Avro binary (the Kafka message body, schema carried by
  * id/registry out of band) or to Avro object-container bytes (the
  * `print_output: avro` file shape, schema embedded). Apache Avro core is
  * used directly, as the reference uses libavro; no broker or registry is
  * required to exercise either path.
  *
  * Everything here is executor-side streaming (mapPartitions over rows);
  * schemas travel as JSON strings into task closures and parse once per
  * partition — at 100 TB the encode is a pure map, no shuffle, no driver
  * involvement.
  */
object AvroSink {

  /** Build the Avro record schema from a Spark output schema
    * (p_avro_schema_build_acct_data parity: one field per projected
    * primitive, nullables as union[null, T]). */
  def avroSchema(st: StructType, name: String = "acct_data"): Schema = {
    val rec = Schema.createRecord(name, null, "graft", false)
    rec.setFields(st.fields.toSeq.map { f =>
      val base = fieldSchema(f.dataType)
      val s =
        if (f.nullable)
          Schema.createUnion(java.util.List.of(
            Schema.create(Schema.Type.NULL), base))
        else base
      new Schema.Field(f.name, s, null, null)
    }.asJava)
    rec
  }

  private def fieldSchema(dt: DataType): Schema = dt match {
    case LongType | TimestampType => Schema.create(Schema.Type.LONG)
    case IntegerType | ShortType | ByteType | DateType =>
      Schema.create(Schema.Type.INT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case ArrayType(elem, _) => Schema.createArray(fieldSchema(elem))
    case other =>
      throw new IllegalArgumentException(s"no avro mapping for $other")
  }

  private def toAvroValue(v: Any): Any = v match {
    case null => null
    case t: java.sql.Timestamp =>
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
    case s: String => s
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case seq: scala.collection.Seq[_] => seq.map(toAvroValue).asJava
    case other => other
  }

  private[sinks] def record(row: Row, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    var i = 0
    while (i < schema.getFields.size) {
      rec.put(i, toAvroValue(row.get(i)))
      i += 1
    }
    rec
  }

  /** Per-partition single-record binary encoder: parse the schema once,
    * reuse the buffer (the executor-side hot path for Avro frames). */
  def rowEncoder(schemaJson: String): Row => Array[Byte] = {
    val schema = new Schema.Parser().parse(schemaJson)
    val writer = new GenericDatumWriter[GenericRecord](schema)
    val out = new ByteArrayOutputStream()
    val encoder = EncoderFactory.get().binaryEncoder(out, null)
    (r: Row) => {
      out.reset()
      writer.write(record(r, schema), encoder)
      encoder.flush()
      out.toByteArray
    }
  }

  /** One Avro-binary message per row (kafka_avro body shape). */
  def encode(df: DataFrame): Dataset[Array[Byte]] = {
    val schemaJson = avroSchema(df.schema).toString
    implicit val enc = org.apache.spark.sql.Encoders.BINARY
    df.mapPartitions { rows =>
      val enc1 = rowEncoder(schemaJson)
      rows.map(enc1)
    }
  }

  /** Decode one single-record Avro binary message. One-shot (parses the
    * schema per call) — inside mapPartitions use [[rowDecoder]]. */
  def decode(bytes: Array[Byte], schemaJson: String): GenericRecord = {
    val schema = new Schema.Parser().parse(schemaJson)
    val reader = new GenericDatumReader[GenericRecord](schema)
    reader.read(null, DecoderFactory.get().binaryDecoder(bytes, null))
  }

  /** Per-partition single-record binary decoder — the read twin of
    * [[rowEncoder]]: parse the schema and build the datum reader ONCE,
    * reuse the record and the binary decoder across rows. (The sf1 soak
    * caught the one-shot form in a per-row loop: schema parsing dominated
    * the whole q92 lane, 10.8 s → 1.5 s at 1M rows.) */
  def rowDecoder(schemaJson: String): Array[Byte] => GenericRecord = {
    val schema = new Schema.Parser().parse(schemaJson)
    val reader = new GenericDatumReader[GenericRecord](schema)
    var dec: org.apache.avro.io.BinaryDecoder = null
    var reuse: GenericRecord = null
    (bytes: Array[Byte]) => {
      dec = DecoderFactory.get().binaryDecoder(bytes, dec)
      reuse = reader.read(reuse, dec)
      reuse
    }
  }

  /** Avro object-container bytes (the `print_output: avro` file shape:
    * schema header + compressed blocks); one container per partition. */
  def container(rows: Iterator[Row], schemaJson: String): Array[Byte] = {
    val schema = new Schema.Parser().parse(schemaJson)
    val writer = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    val out = new ByteArrayOutputStream()
    writer.create(schema, out)
    rows.foreach(r => writer.append(record(r, schema)))
    writer.close()
    out.toByteArray
  }

  def readContainer(bytes: Array[Byte]): Seq[GenericRecord] = {
    val reader = new DataFileReader[GenericRecord](
      new SeekableByteArrayInput(bytes),
      new GenericDatumReader[GenericRecord]())
    try reader.iterator().asScala.toSeq finally reader.close()
  }
}
