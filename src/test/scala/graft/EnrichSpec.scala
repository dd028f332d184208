package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.Lpm

class EnrichSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  private val prefixes = Seq(
    (0L, 1, 100L),      // 0..32767 /1
    (0L, 4, 101L),      // 0..4095 /4 — longer, wins inside
    (32768L, 2, 200L))  // 32768..49151 /2

  test("Lpm.Table longest match wins, miss is sentinel") {
    val t = new Lpm.Table(16, prefixes)
    assert(t.lookup(10L) == 101L)     // inside /4
    assert(t.lookup(5000L) == 100L)   // /1 only
    assert(t.lookup(33000L) == 200L)
    assert(t.lookup(60000L) == Long.MinValue) // uncovered
  }

  test("LpmLookup expression: codegen path matches interpreted eval") {
    val t = new Lpm.Table(16, prefixes)
    val df = Seq(10L, 5000L, 33000L, 60000L).toDF("ip")
      .withColumn("asn", Lpm.lpm(col("ip"), t))
    val got = df.select("ip", "asn").as[(Long, Option[Long])]
      .collect().toMap
    assert(got == Map(10L -> Some(101L), 5000L -> Some(100L),
      33000L -> Some(200L), 60000L -> None))
  }

  test("Table6: masks straddling the 64-bit limb boundary, longest-first") {
    val base = 0x2001L << 48
    val t6 = new Lpm.Table6(Seq(
      (base, 0L, 16, 1L),                       // /16 default-ish
      (base | (5L << 40), 0L, 24, 2L),          // /24 inside hi
      (base | (5L << 40), 0L, 64, 3L),          // exactly one limb
      (base | (5L << 40), 0xAB00L << 48, 72, 4L), // /72: 8 bits into lo
      (base | (5L << 40), (0xAB00L << 48) | (0x12L << 32), 96, 5L)))
    // /96 wins over /72, /64, /24, /16 for the fully matching address
    assert(t6.lookup(base | (5L << 40),
      (0xAB00L << 48) | (0x12L << 32) | 999L) == 5L)
    // /72 when the /96 bits differ
    assert(t6.lookup(base | (5L << 40),
      (0xAB00L << 48) | (0x99L << 32)) == 4L)
    // /64 when lo's top byte differs
    assert(t6.lookup(base | (5L << 40), 0x1111L) == 3L)
    // /24 only matches if lo-limb prefixes miss... same hi → /64 wins
    assert(t6.lookup(base | (5L << 40) | 7L, 0L) == 2L) // hi differs in low bits → /24
    assert(t6.lookup(base | (9L << 40), 0L) == 1L)      // /16 fallback
    assert(t6.lookup(0x3001L << 48, 0L) == Long.MinValue)
  }

  test("LpmLookup6 expression: codegen matches table lookup") {
    val base = 0x2001L << 48
    val t6 = new Lpm.Table6(Seq(
      (base, 0L, 24, 10L), (base, 0xFF00L << 48, 72, 20L)))
    val rows = Seq((base, 0xFF00L << 48), (base | 1L, 0L),
      (0x3001L << 48, 0L))
    val df = rows.toDF("hi", "lo")
      .withColumn("v", Lpm.lpm6(col("hi"), col("lo"), t6))
    val got = df.select("hi", "lo", "v")
      .as[(Long, Long, Option[Long])].collect()
    rows.zip(got).foreach { case ((hi, lo), (ghi, glo, gv)) =>
      val exp = t6.lookup(hi, lo)
      assert(ghi == hi && glo == lo &&
        gv == (if (exp == Long.MinValue) None else Some(exp)))
    }
    assert(got.map(_._3).toSeq == Seq(Some(20L), Some(10L), None))
  }

  test("joinLongestMatch equals expression strategy") {
    val dim = prefixes.toDF("base", "len", "asn")
    val ips = Seq(10L, 5000L, 33000L, 60000L).toDF("ip")
    val viaJoin = Lpm.joinLongestMatch(ips, dim, col("ip"),
      Seq(1, 2, 4), 16, Seq("asn"))
      .select("ip", "asn").as[(Long, Option[Long])].collect().toMap
    val t = new Lpm.Table(16, prefixes)
    val viaExpr = ips.withColumn("asn", Lpm.lpm(col("ip"), t))
      .select("ip", "asn").as[(Long, Option[Long])].collect().toMap
    assert(viaJoin == viaExpr)
  }

  test("keyed LPM over (peer, ip) product space isolates peers") {
    // peer 0 routes everything to 1; peer 1 only lower half to 2
    val t = new Lpm.Table(17, Seq(
      (0L, 1, 1L),             // peer 0, /0 over ip space
      (65536L, 2, 2L)))        // peer 1, ip 0..32767
    assert(t.lookup(0L * 65536 + 40000) == 1L)
    assert(t.lookup(1L * 65536 + 40000) == Long.MinValue)
    assert(t.lookup(1L * 65536 + 100) == 2L)
  }
}
