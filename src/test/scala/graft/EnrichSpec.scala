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
