package graft.functions

/** Output formatters (SURVEY §2.11): pmacct's fixed per-field printers
  * (`src/util.c`; tcpflags/fwd_status encodes CONFIG-KEYS:1690-1744)
  * re-expressed as paired Spark-SQL / DuckDB-SQL scalar expressions —
  * pure Catalyst built-ins (concat/CASE/lpad/hex), no UDFs, identical
  * output text in both dialects.
  *
  * The synthetic 16-bit flow address space prints as `10.<hi>.<lo>`.
  */
object Formatters {

  /** ip_ntoa — dotted-quad form of the 16-bit synthetic address. */
  def ipNtoa(c: String): String =
    s"concat('10.', CAST($c div 256 AS STRING), '.', CAST($c % 256 AS STRING))"
  def ipNtoaDuck(c: String): String =
    s"concat('10.', CAST($c // 256 AS VARCHAR), '.', CAST($c % 256 AS VARCHAR))"

  /** IP protocol number → name (print_proto, src/util.c). */
  def protoName(c: String): String =
    s"CASE $c WHEN 6 THEN 'tcp' WHEN 17 THEN 'udp' " +
      s"ELSE CAST($c AS STRING) END"
  def protoNameDuck(c: String): String =
    s"CASE $c WHEN 6 THEN 'tcp' WHEN 17 THEN 'udp' " +
      s"ELSE CAST($c AS VARCHAR) END"

  /** tcpflags decode: '+'-joined flag names of the set bits
    * (tcpflags_encode_as_array, CONFIG-KEYS:1727). concat_ws drops the
    * NULLs of unset bits in both engines. */
  private val flagNames =
    Seq(1 -> "FIN", 2 -> "SYN", 4 -> "RST", 8 -> "PSH", 16 -> "ACK",
      32 -> "URG", 64 -> "ECE", 128 -> "CWR")
  def tcpFlagsDecode(c: String): String =
    s"concat_ws('+', ${flagNames.map { case (b, n) =>
      s"CASE WHEN $c div $b % 2 = 1 THEN '$n' END" }.mkString(", ")})"
  def tcpFlagsDecodeDuck(c: String): String =
    s"concat_ws('+', ${flagNames.map { case (b, n) =>
      s"CASE WHEN $c // $b % 2 = 1 THEN '$n' END" }.mkString(", ")})"

  /** fwd_status decode per RFC7270 buckets (value div 64)
    * (fwd_status_encode, CONFIG-KEYS:1736-1744). */
  private def fwdCase(div: String): String =
    s"""CASE WHEN $div = 0 THEN 'Unknown'
        WHEN $div = 1 THEN 'Forwarded'
        WHEN $div = 2 THEN 'Dropped'
        ELSE 'Consumed' END"""
  def fwdStatus(c: String): String = fwdCase(s"$c div 64")
  def fwdStatusDuck(c: String): String = fwdCase(s"$c // 64")

  /** DSCP from the tos byte (CONFIG-KEYS:1785: tos >> 2). */
  def dscp(c: String): String = s"CAST($c div 4 AS STRING)"
  def dscpDuck(c: String): String = s"CAST($c // 4 AS VARCHAR)"

  /** mpls_vpn_rd format "0:<asn>:<val>" (print of rd_t, src/util.c). */
  def rdFormat(asn: String, v: String): String =
    s"concat('0:', CAST($asn AS STRING), ':', CAST($v AS STRING))"
  def rdFormatDuck(asn: String, v: String): String =
    s"concat('0:', CAST($asn AS VARCHAR), ':', CAST($v AS VARCHAR))"

  /** compose_timestamp epoch.usec text (src/util.c; CONFIG-KEYS:1690). */
  def tsCompose(us: String): String =
    s"concat(CAST($us div 1000000 AS STRING), '.', " +
      s"lpad(CAST($us % 1000000 AS STRING), 6, '0'))"
  def tsComposeDuck(us: String): String =
    s"concat(CAST($us // 1000000 AS VARCHAR), '.', " +
      s"lpad(CAST($us % 1000000 AS VARCHAR), 6, '0'))"

  /** MAC formatter aa:bb:cc:dd:ee:ff from a 48-bit integer. */
  private def macBytes(c: String, div: String): Seq[String] =
    (5 to 0 by -1).map(i => s"($c $div ${1L << (8 * i)}) % 256")
  def macFormat(c: String): String =
    s"concat_ws(':', ${macBytes(c, "div").map(b =>
      s"lpad(lower(hex($b)), 2, '0')").mkString(", ")})"
  def macFormatDuck(c: String): String =
    s"concat_ws(':', ${macBytes(c, "//").map(b =>
      s"lpad(lower(hex($b)), 2, '0')").mkString(", ")})"
}
