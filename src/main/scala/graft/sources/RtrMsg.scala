package graft.sources

import java.nio.ByteBuffer
import scala.collection.mutable

/** RPKI-to-Router (RTR) protocol codec — RFC 8210 (protocol v1) PDUs.
  *
  * pmacct's RPKI thread speaks this protocol to a validator cache
  * (`src/rpki/rpki_msg.c` — rpki_rtr_connect / rpki_rtr_parse_ipv4_prefix
  * family; CONFIG-KEYS rpki_rtr_cache_*): Serial/Reset Query up, then
  * Cache Response → IPvX Prefix announce/withdraw PDUs → End of Data down,
  * maintaining the ROA table the `rpki_roas_file` path (q28) loads
  * statically. This codec is that session's wire layer.
  *
  * Wire layout (RFC 8210 §5): every PDU starts with an 8-byte header —
  * version(1) type(1) session_id-or-zero(2) length(4, whole PDU) — then a
  * type-specific body. IPv4 Prefix (type 4, 20 bytes total): flags(1, bit
  * 0 set = announce, clear = withdraw) prefix_len(1) max_len(1) zero(1)
  * prefix(4) asn(4). IPv6 Prefix (type 6, 32 bytes) is the same shape
  * with a 16-byte prefix. End of Data (type 7; 24 bytes in v1): serial,
  * refresh, retry, expire intervals.
  */
object RtrMsg {
  val Version = 1
  val HeaderLen = 8

  // PDU type codes (RFC 8210 §5.2)
  val TSerialNotify = 0
  val TSerialQuery = 1
  val TResetQuery = 2
  val TCacheResponse = 3
  val TIpv4Prefix = 4
  val TIpv6Prefix = 6
  val TEndOfData = 7
  val TCacheReset = 8
  val TErrorReport = 10

  sealed trait Pdu
  final case class SerialNotify(sessionId: Int, serial: Long) extends Pdu
  final case class SerialQuery(sessionId: Int, serial: Long) extends Pdu
  case object ResetQuery extends Pdu
  final case class CacheResponse(sessionId: Int) extends Pdu
  /** announce=false is a withdraw (flags bit 0 clear, §5.6). */
  final case class Ipv4Prefix(announce: Boolean, prefixLen: Int, maxLen: Int,
                              prefix: Long, asn: Long) extends Pdu
  final case class Ipv6Prefix(announce: Boolean, prefixLen: Int, maxLen: Int,
                              prefix: Array[Byte], asn: Long) extends Pdu
  final case class EndOfData(sessionId: Int, serial: Long, refresh: Long,
                             retry: Long, expire: Long) extends Pdu
  case object CacheReset extends Pdu
  final case class ErrorReport(code: Int, encapsulated: Array[Byte],
                               text: String) extends Pdu

  private def header(buf: ByteBuffer, tpe: Int, sess: Int, len: Int): Unit = {
    buf.put(Version.toByte)
    buf.put(tpe.toByte)
    buf.putShort(sess.toShort)
    buf.putInt(len)
  }

  def encode(p: Pdu): Array[Byte] = p match {
    case SerialNotify(sess, serial) =>
      val b = ByteBuffer.allocate(12)
      header(b, TSerialNotify, sess, 12); b.putInt(serial.toInt); b.array()
    case SerialQuery(sess, serial) =>
      val b = ByteBuffer.allocate(12)
      header(b, TSerialQuery, sess, 12); b.putInt(serial.toInt); b.array()
    case ResetQuery =>
      val b = ByteBuffer.allocate(8)
      header(b, TResetQuery, 0, 8); b.array()
    case CacheResponse(sess) =>
      val b = ByteBuffer.allocate(8)
      header(b, TCacheResponse, sess, 8); b.array()
    case Ipv4Prefix(ann, plen, mlen, prefix, asn) =>
      val b = ByteBuffer.allocate(20)
      header(b, TIpv4Prefix, 0, 20)
      b.put((if (ann) 1 else 0).toByte)
      b.put(plen.toByte); b.put(mlen.toByte); b.put(0.toByte)
      b.putInt(prefix.toInt); b.putInt(asn.toInt); b.array()
    case Ipv6Prefix(ann, plen, mlen, prefix, asn) =>
      require(prefix.length == 16, "IPv6 prefix must be 16 bytes")
      val b = ByteBuffer.allocate(32)
      header(b, TIpv6Prefix, 0, 32)
      b.put((if (ann) 1 else 0).toByte)
      b.put(plen.toByte); b.put(mlen.toByte); b.put(0.toByte)
      b.put(prefix); b.putInt(asn.toInt); b.array()
    case EndOfData(sess, serial, refresh, retry, expire) =>
      val b = ByteBuffer.allocate(24)
      header(b, TEndOfData, sess, 24)
      b.putInt(serial.toInt); b.putInt(refresh.toInt)
      b.putInt(retry.toInt); b.putInt(expire.toInt); b.array()
    case CacheReset =>
      val b = ByteBuffer.allocate(8)
      header(b, TCacheReset, 0, 8); b.array()
    case ErrorReport(code, encap, text) =>
      val txt = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val len = 8 + 4 + encap.length + 4 + txt.length
      val b = ByteBuffer.allocate(len)
      header(b, TErrorReport, code, len)
      b.putInt(encap.length); b.put(encap)
      b.putInt(txt.length); b.put(txt); b.array()
  }

  /** Decode a contiguous PDU stream (the TCP session view). This path
    * eats raw network bytes, so malformed input (bad version, impossible
    * or truncated length, bad body size for the type) stops the walk and
    * returns everything recovered so far instead of throwing — the
    * reference's rpki_rtr_parse_msg likewise drops the session on a bad
    * PDU rather than crashing. */
  def decodeStream(bytes: Array[Byte]): Seq[Pdu] = {
    val out = mutable.Buffer[Pdu]()
    var off = 0
    var bad = false
    while (!bad && bytes.length - off >= HeaderLen) {
      val b = ByteBuffer.wrap(bytes, off, bytes.length - off)
      val version = b.get() & 0xff
      val tpe = b.get() & 0xff
      val sess = b.getShort() & 0xffff
      val len = b.getInt()
      if (version != Version || len < HeaderLen || off + len > bytes.length)
        bad = true
      else {
        def bodyLenOk(expected: Int): Boolean = len == expected
        tpe match {
          case TSerialNotify if bodyLenOk(12) =>
            out += SerialNotify(sess, b.getInt() & 0xffffffffL)
          case TSerialQuery if bodyLenOk(12) =>
            out += SerialQuery(sess, b.getInt() & 0xffffffffL)
          case TResetQuery if bodyLenOk(8) => out += ResetQuery
          case TCacheResponse if bodyLenOk(8) => out += CacheResponse(sess)
          case TIpv4Prefix if bodyLenOk(20) =>
            val flags = b.get() & 0xff
            val plen = b.get() & 0xff
            val mlen = b.get() & 0xff
            b.get() // zero
            val prefix = b.getInt() & 0xffffffffL
            val asn = b.getInt() & 0xffffffffL
            if (plen > 32 || mlen > 32 || mlen < plen) bad = true
            else out += Ipv4Prefix((flags & 1) == 1, plen, mlen, prefix, asn)
          case TIpv6Prefix if bodyLenOk(32) =>
            val flags = b.get() & 0xff
            val plen = b.get() & 0xff
            val mlen = b.get() & 0xff
            b.get()
            val prefix = new Array[Byte](16)
            b.get(prefix)
            val asn = b.getInt() & 0xffffffffL
            if (plen > 128 || mlen > 128 || mlen < plen) bad = true
            else out += Ipv6Prefix((flags & 1) == 1, plen, mlen, prefix, asn)
          case TEndOfData if bodyLenOk(24) =>
            out += EndOfData(sess, b.getInt() & 0xffffffffL,
              b.getInt() & 0xffffffffL, b.getInt() & 0xffffffffL,
              b.getInt() & 0xffffffffL)
          case TCacheReset if bodyLenOk(8) => out += CacheReset
          case TErrorReport if len >= 16 =>
            val encLen = b.getInt()
            if (encLen < 0 || 8 + 4 + encLen + 4 > len) bad = true
            else {
              val enc = new Array[Byte](encLen)
              b.get(enc)
              val txtLen = b.getInt()
              if (txtLen < 0 || 8 + 4 + encLen + 4 + txtLen > len) bad = true
              else {
                val txt = new Array[Byte](txtLen)
                b.get(txt)
                out += ErrorReport(sess, enc,
                  new String(txt, java.nio.charset.StandardCharsets.UTF_8))
              }
            }
          case _ => bad = true // unknown type or wrong length for type
        }
        if (!bad) off += len
      }
    }
    out.toSeq
  }

  /** Fold a decoded session into the resulting IPv4 ROA set — the state
    * pmacct's RPKI thread maintains across End-of-Data serials: announce
    * inserts, withdraw removes (RFC 8210 §5.6 flags semantics). Returns
    * (prefix, prefixLen, maxLen, asn) tuples. */
  def applyV4(pdus: Seq[Pdu]): Set[(Long, Int, Int, Long)] = {
    val set = mutable.LinkedHashSet[(Long, Int, Int, Long)]()
    pdus.foreach {
      case Ipv4Prefix(ann, plen, mlen, prefix, asn) =>
        val k = (prefix, plen, mlen, asn)
        if (ann) set += k else set -= k
      case _ => ()
    }
    set.toSet
  }
}
