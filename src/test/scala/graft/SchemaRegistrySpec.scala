package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.SchemaRegistryMini

/** The Confluent registry REST subset + wire framing q271 rides:
  * register/dedupe semantics, id resolution, subject versions, 404
  * shapes, restart survival, and the frame codec under corruption. */
class SchemaRegistrySpec extends AnyFunSuite {

  private val schemaA =
    """{"type":"record","name":"a","fields":[{"name":"x","type":"long"}]}"""
  private val schemaB =
    """{"type":"record","name":"b","fields":[{"name":"y","type":"string"}]}"""

  test("register dedupes by schema string; ids are global") {
    val reg = new SchemaRegistryMini
    val port = reg.start()
    try {
      val id1 = SchemaRegistryMini.register(port, "s1-value", schemaA)
      val id2 = SchemaRegistryMini.register(port, "s1-value", schemaA)
      val id3 = SchemaRegistryMini.register(port, "s2-value", schemaA)
      assert(id1 == 1 && id2 == id1 && id3 == id1) // global dedupe
      val id4 = SchemaRegistryMini.register(port, "s1-value", schemaB)
      assert(id4 == 2)
      // resolution round-trips the exact schema text
      assert(SchemaRegistryMini.fetchById(port, id1).contains(schemaA))
      assert(SchemaRegistryMini.fetchById(port, id4).contains(schemaB))
      assert(SchemaRegistryMini.fetchById(port, 99).isEmpty) // 40403
      // latest: s1 has two versions, newest wins
      assert(SchemaRegistryMini.latest(port, "s1-value")
        .contains((2, 2, schemaB)))
      assert(SchemaRegistryMini.latest(port, "s2-value")
        .contains((1, 1, schemaA)))
      assert(SchemaRegistryMini.latest(port, "nope").isEmpty) // 40401
    } finally reg.close()
  }

  test("registry state survives a stop/start cycle") {
    val reg = new SchemaRegistryMini
    val port = reg.start()
    try {
      val id = SchemaRegistryMini.register(port, "s-value", schemaA)
      reg.stop()
      intercept[Exception] { SchemaRegistryMini.fetchById(port, id) }
      reg.start(port)
      assert(SchemaRegistryMini.fetchById(port, id).contains(schemaA))
    } finally reg.close()
  }

  test("json escape/extract round-trips registry-shaped strings") {
    for (s <- Seq(schemaA, "with \"quotes\" and \\slashes\\",
      "line\nbreak\ttab", "unicode  ctrl")) {
      val wrapped = s"""{"schema":${SchemaRegistryMini.jsonStr(s)}}"""
      assert(SchemaRegistryMini.jsonField(wrapped, "schema").contains(s))
    }
    assert(SchemaRegistryMini.jsonField("""{"x":1}""", "schema").isEmpty)
    assert(SchemaRegistryMini.jsonField("""{"schema":12}""",
      "schema").isEmpty)
  }

  test("Confluent wire frame: wrap/unwrap + corruption") {
    val body = Array[Byte](1, 2, 3, 4, 5)
    val f = SchemaRegistryMini.wrap(7, body)
    assert(f.length == 10 && f(0) == 0)
    val Some((7, back)) = SchemaRegistryMini.unwrap(f): @unchecked
    assert(back.sameElements(body))
    assert(SchemaRegistryMini.unwrap(Array[Byte](1, 0, 0, 0, 1)).isEmpty)
    assert(SchemaRegistryMini.unwrap(Array[Byte](0, 0, 0)).isEmpty)
    assert(SchemaRegistryMini.unwrap(Array.emptyByteArray).isEmpty)
    // empty avro body is legal (frame is exactly 5 bytes)
    val Some((9, e)) =
      SchemaRegistryMini.unwrap(SchemaRegistryMini.wrap(9,
        Array.emptyByteArray)): @unchecked
    assert(e.isEmpty)
  }
}
