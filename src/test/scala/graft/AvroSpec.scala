package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.AvroSink

class AvroSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  test("schema builds field-by-field from the projection (golden)") {
    val df = Seq((1L, "web", 2.5, 10))
      .toDF("bytes", "class", "ratio", "port")
    val got = AvroSink.avroSchema(df.schema).toString
    // golden snapshot: non-nullable primitives stay bare, nullable fields
    // become union[null, T], names preserved
    val expected =
      """{"type":"record","name":"acct_data","namespace":"graft","fields":[""" +
        """{"name":"bytes","type":"long"},""" +
        """{"name":"class","type":["null","string"]},""" +
        """{"name":"ratio","type":"double"},""" +
        """{"name":"port","type":"int"}]}"""
    assert(got == expected)
  }

  test("single-record binary round-trips values and nulls") {
    val df = Seq(
      (Some(42L), Some("a"), Some(1.5)),
      (None, None, None))
      .toDF("n", "s", "d")
    val schemaJson = AvroSink.avroSchema(df.schema).toString
    val back = AvroSink.encode(df).collect().toSeq
      .map(b => AvroSink.decode(b, schemaJson))
    assert(back.size == 2)
    val vals = back.map(r =>
      (r.get(0), Option(r.get(1)).map(_.toString), r.get(2))).toSet
    assert(vals.contains((42L, Some("a"), 1.5)))
    assert(vals.contains((null, None, null)))
  }

  test("timestamps encode as epoch micros, arrays as avro arrays") {
    val ts = java.sql.Timestamp.valueOf("2024-03-15 10:00:00")
    val df = Seq((ts, Seq(1L, 2L, 3L))).toDF("ts", "labels")
    val schemaJson = AvroSink.avroSchema(df.schema).toString
    val r = AvroSink.decode(AvroSink.encode(df).head(), schemaJson)
    assert(r.get(0) == ts.toInstant.getEpochSecond * 1000000L)
    val arr = r.get(1).asInstanceOf[java.util.List[_]]
    assert(arr.size == 3 && arr.get(2) == 3L)
  }

  test("object-container bytes round-trip (print_output: avro shape)") {
    val df = Seq((6L, 100L), (17L, 200L)).toDF("proto", "bytes")
    val schemaJson = AvroSink.avroSchema(df.schema).toString
    val rows = df.collect().iterator
    val container = AvroSink.container(rows, schemaJson)
    val back = AvroSink.readContainer(container)
    assert(back.map(r => (r.get(0), r.get(1))) ==
      Seq((6L, 100L), (17L, 200L)))
  }
}
