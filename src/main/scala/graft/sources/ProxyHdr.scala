package graft.sources

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** HAProxy PROXY protocol header codec (v1 text + v2 binary) — the
  * front-end framing pmbmpd parses when `bmp_daemon_parse_proxy_header`
  * is set (reference: `parse_proxy_header`, src/network.c — v1 line
  * `PROXY TCP4 <src> <dst> <sport> <dport>\r\n`, v2 12-byte signature +
  * ver_cmd/fam/len + address block). A PROXY command replaces the peer
  * address/port learned from the socket with the header's SOURCE; a
  * LOCAL command (health checks, 0x20) keeps the socket identity.
  */
object ProxyHdr {

  val V2Sig: Array[Byte] = Array(0x0D, 0x0A, 0x0D, 0x0A, 0x00, 0x0D,
    0x0A, 0x51, 0x55, 0x49, 0x54, 0x0A).map(_.toByte)

  private def ipStr(ip: Long): String =
    s"${(ip >> 24) & 0xff}.${(ip >> 16) & 0xff}.${(ip >> 8) & 0xff}.${ip & 0xff}"

  /** v1 text header. */
  def encodeV1(srcIp: Long, dstIp: Long, srcPort: Int,
               dstPort: Int): Array[Byte] =
    s"PROXY TCP4 ${ipStr(srcIp)} ${ipStr(dstIp)} $srcPort $dstPort\r\n"
      .getBytes(StandardCharsets.US_ASCII)

  /** v2 binary header; `proxyCmd=false` emits LOCAL (no address block
    * is required for LOCAL, but senders may include one — we omit). */
  def encodeV2(proxyCmd: Boolean, srcIp: Long, dstIp: Long,
               srcPort: Int, dstPort: Int): Array[Byte] = {
    if (!proxyCmd) {
      val b = ByteBuffer.allocate(16)
      b.put(V2Sig).put(0x20.toByte).put(0x00.toByte).putShort(0)
      b.array()
    } else {
      val b = ByteBuffer.allocate(16 + 12)
      b.put(V2Sig)
      b.put(0x21.toByte)      // version 2, PROXY command
      b.put(0x11.toByte)      // TCP over IPv4
      b.putShort(12)          // address block length
      b.putInt(srcIp.toInt).putInt(dstIp.toInt)
      b.putShort(srcPort.toShort).putShort(dstPort.toShort)
      b.array()
    }
  }

  /** Parse result: `src` is Some((ip, port)) for a PROXY command (the
    * identity that replaces the socket's), None for LOCAL; `consumed`
    * is the header length to strip before the payload. */
  final case class Parsed(src: Option[(Long, Int)], consumed: Int)

  /** Sniff and parse a header at the start of `bytes`; None if the
    * stream carries no PROXY header (plain connection). Malformed
    * headers also return None — callers treat the stream as plain,
    * which will then fail its own framing, like a collector would. */
  def decode(bytes: Array[Byte]): Option[Parsed] = {
    if (bytes.length >= 6 &&
        new String(bytes, 0, 5, StandardCharsets.US_ASCII) == "PROXY") {
      val end = bytes.indexOf('\r'.toByte)
      if (end < 0 || end + 1 >= bytes.length || bytes(end + 1) != '\n')
        return None
      val line = new String(bytes, 0, end, StandardCharsets.US_ASCII)
      val parts = line.split(" ")
      if (parts.length != 6 || parts(1) != "TCP4") return None
      // Reject non-numeric / out-of-range fields like the reference's
      // parse_proxy_header: exactly 4 octets 0-255 and a numeric port,
      // else the stream is treated as plain (documented contract above).
      val octets = parts(2).split("\\.")
      if (octets.length != 4 ||
          !octets.forall(o => o.nonEmpty && o.length <= 3 &&
            o.forall(_.isDigit) && o.toInt <= 255) ||
          !(parts(4).nonEmpty && parts(4).length <= 5 &&
            parts(4).forall(_.isDigit) && parts(4).toInt <= 65535))
        return None
      val ip = octets.map(_.toLong).foldLeft(0L)((a, o) => (a << 8) | o)
      Some(Parsed(Some((ip, parts(4).toInt)), end + 2))
    } else if (bytes.length >= 16 &&
        bytes.take(12).sameElements(V2Sig)) {
      val verCmd = bytes(12) & 0xff
      val fam = bytes(13) & 0xff
      val len = ((bytes(14) & 0xff) << 8) | (bytes(15) & 0xff)
      if (bytes.length < 16 + len || (verCmd & 0xf0) != 0x20) return None
      if ((verCmd & 0x0f) == 0x01 && fam == 0x11 && len >= 12) {
        val b = ByteBuffer.wrap(bytes, 16, 12)
        val src = b.getInt() & 0xffffffffL
        b.getInt() // dst
        val sp = b.getShort() & 0xffff
        Some(Parsed(Some((src, sp)), 16 + len))
      } else Some(Parsed(None, 16 + len)) // LOCAL or non-TCP4
    } else None
  }
}
