package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.SqlBulk

/** Wire-form proofs for the SQL bulk paths (CONFIG-KEYS:1502-1530) —
  * the byte-level contract the gated round-trips (q256/q257) rely on:
  * exact COPY line shape with sql_delimiter semantics, and the MySQL
  * multi-values packing sequence including the overflow flush and the
  * "'sql_multi_values' is too small" hard error.
  */
class SqlBulkSpec extends AnyFunSuite {

  test("pg COPY statement and line render") {
    assert(SqlBulk.pgCopyStatement("acct", Seq("ip_src", "bytes")) ==
      "COPY acct (ip_src, bytes) FROM STDIN DELIMITER ','")
    assert(SqlBulk.pgCopyLine(Seq(7L, "web", 42L)) == "7,web,42")
    // sql_delimiter: a value carrying the default ',' needs another
    // delimiter (the reference's BGP AS-path example, CONFIG-KEYS:1516)
    assertThrows[IllegalArgumentException] {
      SqlBulk.pgCopyLine(Seq("{AS1,AS2}", 1L))
    }
    assert(SqlBulk.pgCopyLine(Seq("{AS1,AS2}", 1L), delim = '_') ==
      "{AS1,AS2}_1")
    assert(SqlBulk.parsePgCopyLine("7,web,42") == Seq("7", "web", "42"))
  }

  test("mysql multi-values packs greedily and flushes on overflow") {
    val rows = Iterator(Seq(1L, 2L), Seq(3L, 4L), Seq(5L, 6L),
      Seq(7L, 8L), Seq(9L, 10L))
    val header = SqlBulk.mysqlInsertHeader("t", Seq("a", "b"))
    assert(header == "INSERT INTO t (a, b) VALUES")
    // header 27 chars, each row " (N, M)" 7-9 chars, 7-byte reserve
    // mirrored from mysql_plugin.c's full-values_clause length check:
    // budget 50 admits two rows per statement, then flushes
    val stmts = SqlBulk.mysqlMultiValues("t", Seq("a", "b"), rows, 50)
      .toSeq
    assert(stmts == Seq(
      "INSERT INTO t (a, b) VALUES (1, 2), (3, 4)",
      "INSERT INTO t (a, b) VALUES (5, 6), (7, 8)",
      "INSERT INTO t (a, b) VALUES (9, 10)"))
    assert(stmts.forall(_.length <= 50))
  }

  test("mysql multi-values rejects a budget below header + one row") {
    assertThrows[IllegalArgumentException] {
      SqlBulk.mysqlMultiValues("t", Seq("a", "b"),
        Iterator(Seq(1L, 2L)), 20).toSeq // header alone doesn't fit
    }
    assertThrows[IllegalArgumentException] {
      // header fits, first row can never fit
      SqlBulk.mysqlMultiValues("t", Seq("a", "b"),
        Iterator(Seq(123456789L, 987654321L)), 30).toSeq
    }
  }

  test("mysql multi-values round-trips strings with quote escaping") {
    val stmts = SqlBulk.mysqlMultiValues("t", Seq("k", "v"),
      Iterator(Seq("it's", 1L), Seq("plain", 2L)), 200).toSeq
    assert(stmts.size == 1)
    assert(stmts.head.contains("('it''s', 1)"))
    val parsed = SqlBulk.parseMysqlMultiValues(
      "INSERT INTO t (k, v) VALUES (7, 8), (9, 10)")
    assert(parsed == Seq(Seq("7", "8"), Seq("9", "10")))
  }
}
