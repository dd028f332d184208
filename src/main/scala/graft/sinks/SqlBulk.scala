package graft.sinks

/** SQL bulk-load wire forms (CONFIG-KEYS:1502-1530): the two
  * dialect-specific fast paths the reference offers beyond plain
  * INSERT/UPDATE —
  *
  *  - PostgreSQL `COPY ... FROM STDIN` (`sql_use_copy`, requires
  *    `sql_dont_try_update`): one COPY statement per purge
  *    (pgsql_plugin.c:699 copy_clause, :851 PQexec + PQputCopyData
  *    lines, :578 PQputCopyEnd), rows as delimiter-joined text lines;
  *    `sql_delimiter` swaps the default ',' when a value itself may
  *    carry commas (e.g. BGP AS-path sets).
  *  - MySQL multi-values INSERT (`sql_multi_values` = buffer size in
  *    BYTES, mysql_plugin.c:360-407): one statement packs as many row
  *    tuples as fit the byte budget; on overflow the buffer is flushed
  *    as a query and packing restarts; a header or single row that can
  *    never fit is a hard error ("'sql_multi_values' is too small").
  *
  * Both renders are pure per-partition string folds — in the sink they
  * run inside `foreachPartition` against the live connection, so the
  * flush parallelizes per partition with no driver involvement (the
  * same shape as the JDBC upsert sink in [[FlowSinks]]).
  */
object SqlBulk {

  /** `COPY t (c1, c2, ...) FROM STDIN DELIMITER 'd'` —
    * pgsql_plugin.c:699,708-711 (the counters ride in `cols` here; the
    * reference appends ", packets, bytes" to its primitive list). */
  def pgCopyStatement(table: String, cols: Seq[String],
                      delim: Char = ','): String =
    s"COPY $table (${cols.mkString(", ")}) FROM STDIN DELIMITER '$delim'"

  /** One COPY data line (the PQputCopyData payload): values joined by
    * the delimiter, no quoting — the reference's COPY handlers render
    * raw `%u`/`%s` (sql_common.c PG_copy_count_* handlers), which is
    * why `sql_delimiter` exists for values that contain the default. */
  def pgCopyLine(vals: Seq[Any], delim: Char = ','): String = {
    vals.foreach {
      case s: String => require(s.indexOf(delim) < 0 && !s.contains('\n'),
        s"COPY value '$s' contains the delimiter '$delim' — " +
          "set sql_delimiter (CONFIG-KEYS:1516)")
      case _ => ()
    }
    vals.map(cell(_, quote = false)).mkString(delim.toString)
  }

  /** Parse a COPY line back (round-trip gate). The -1 limit keeps
    * trailing empty fields — a null last column renders as "" and must
    * parse back with the full arity. */
  def parsePgCopyLine(line: String, delim: Char = ','): Seq[String] =
    line.split(java.util.regex.Pattern.quote(delim.toString), -1).toSeq

  /** The multi-values statement header:
    * `INSERT INTO t (c1, ...) VALUES` (mysql_plugin.c:365-366). */
  def mysqlInsertHeader(table: String, cols: Seq[String]): String =
    s"INSERT INTO $table (${cols.mkString(", ")}) VALUES"

  /** Greedy multi-values packing, mirroring mysql_plugin.c:360-407
    * byte-for-byte: the buffer seeds with the header (error if the
    * header alone exceeds `bufBytes`); each row renders as
    * ` (v1, v2, ...)` (the reference copies `values_clause+7`, cutting
    * the leading " VALUES" but keeping its space) and is admitted while
    * `7 + row.length < bufBytes - offset` (the reference checks the
    * FULL values_clause length — 7 bytes conservative, mirrored here);
    * admitted rows after the first are preceded by ','; a row that
    * doesn't fit flushes the statement and re-tries into a fresh
    * buffer, and a row too big for an EMPTY buffer is a hard error. */
  def mysqlMultiValues(table: String, cols: Seq[String],
                       rows: Iterator[Seq[Any]],
                       bufBytes: Int): Iterator[String] = {
    val header = mysqlInsertHeader(table, cols)
    require(header.length < bufBytes,
      s"'sql_multi_values' is too small ($bufBytes)")
    new Iterator[String] {
      private val sb = new StringBuilder
      private var elems = 0
      private var pending: String = null

      private def renderRow(vals: Seq[Any]): String =
        vals.map(cell(_, quote = true)).mkString(" (", ", ", ")")

      private def fill(): String = {
        sb.setLength(0); sb.append(header); elems = 0
        var out: String = null
        while (out == null && (pending != null || rows.hasNext)) {
          val row = if (pending != null) pending else renderRow(rows.next())
          pending = null
          // mysql_plugin.c:378 admits on the FULL values_clause length
          // alone (7 + row < remaining) — the 7-byte " VALUES" reserve
          // already covers the 1-byte separator comma, so no extra
          // subtraction: a boundary-length row the reference admits
          // packs here too
          val remaining = bufBytes - sb.length
          if (7 + row.length < remaining) {
            if (elems > 0) sb.append(',')
            sb.append(row)
            elems += 1
          } else if (elems > 0) {
            pending = row // flush, re-try into a fresh buffer
            out = sb.toString
          } else {
            throw new IllegalArgumentException(
              s"'sql_multi_values' is too small ($bufBytes)")
          }
        }
        if (out == null && elems > 0) out = sb.toString
        out
      }

      private var nextStmt: String = fill()
      override def hasNext: Boolean = nextStmt != null
      override def next(): String = {
        val r = nextStmt; nextStmt = fill(); r
      }
    }
  }

  /** Parse the packed tuples back out of a multi-values statement
    * (round-trip gate; numeric-and-simple-string tuples only, which is
    * the surface the flow schema emits). */
  def parseMysqlMultiValues(stmt: String): Seq[Seq[String]] = {
    val at = stmt.indexOf(" VALUES")
    require(at > 0, s"not a multi-values statement: $stmt")
    val body = stmt.substring(at + " VALUES".length)
    val tup = """\(([^)]*)\)""".r
    tup.findAllMatchIn(body)
      .map(_.group(1).split(',').toSeq.map(_.trim.stripPrefix("'")
        .stripSuffix("'").replace("''", "'")))
      .toSeq
  }

  private def cell(v: Any, quote: Boolean): String = v match {
    case null => if (quote) "NULL" else ""
    case s: String =>
      if (quote) "'" + s.replace("'", "''") + "'" else s
    case x => x.toString
  }
}
