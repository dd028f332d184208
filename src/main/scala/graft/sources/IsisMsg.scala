package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import scala.collection.mutable

/** IS-IS LSP codec — the protocol under pmacct's IGP daemon
  * (`docs/INTERNALS:45-48,77-79`: route lookups against an IS-IS
  * link-state database, historically `src/isis/isis.c`; upstream has
  * since retired the daemon but the capability row remains in scope).
  * The formats are public specs: ISO 10589 common header + L1/L2
  * Link State PDUs, RFC 1195 for IP integration, RFC 5305 TLV 135
  * (extended IP reachability: 32-bit metric, control byte with
  * up/down + sub-TLV flags + 6-bit prefix length, then
  * ceil(len/8) prefix bytes), RFC 5301 TLV 137 (dynamic hostname).
  *
  * The decoded LSP database projects to an IGP RIB —
  * (system-id, hostname, prefix, len, metric) — that the engine joins
  * against flows with the same LPM machinery as `networks_file`
  * (`graft.plans.Lpm`), which is exactly how the reference wired IGP
  * results into aggregation keys (peer_dst_ip via `isis/isis.c`).
  */
object IsisMsg {
  val Idrp = 0x83               // ISO 9577 IDRP discriminator
  val PduL1Lsp = 18
  val PduL2Lsp = 20
  val TlvArea = 1
  val TlvExtIpReach = 135       // RFC 5305
  val TlvHostname = 137         // RFC 5301

  /** One RFC 5305 extended-IP-reachability entry. */
  final case class Reach(prefix: Long, len: Int, metric: Long,
                         down: Boolean = false)

  /** One L1/L2 LSP: 6-byte system id (top 48 bits of `sysId`),
    * pseudonode+fragment, sequence number, hostname TLV, reach TLVs. */
  final case class Lsp(level: Int, sysId: Long, pseudonode: Int,
                       fragment: Int, seqNo: Long, lifetime: Int,
                       hostname: String, reach: Seq[Reach])

  /** Encode one LSP (common header + LSP header + TLVs). */
  def encode(l: Lsp): Array[Byte] = {
    val tlvs = new ByteArrayOutputStream()
    def tlv(tpe: Int, v: Array[Byte]): Unit = {
      require(v.length <= 255, "TLV overflow")
      tlvs.write(tpe); tlvs.write(v.length); tlvs.write(v, 0, v.length)
    }
    if (l.hostname.nonEmpty) tlv(TlvHostname, l.hostname.getBytes("UTF-8"))
    // pack reach entries into TLV 135 instances of <=255 bytes each
    val pending = new ByteArrayOutputStream()
    def flushReach(): Unit =
      if (pending.size() > 0) {
        tlv(TlvExtIpReach, pending.toByteArray); pending.reset()
      }
    l.reach.foreach { r =>
      val pBytes = (r.len + 7) / 8
      if (pending.size() + 5 + pBytes > 255) flushReach()
      val e = ByteBuffer.allocate(5 + pBytes)
      e.putInt(r.metric.toInt)
      e.put((((if (r.down) 1 else 0) << 7) | (r.len & 0x3f)).toByte)
      var i = 0
      while (i < pBytes) {
        e.put(((r.prefix >> (24 - 8 * i)) & 0xff).toByte); i += 1
      }
      pending.write(e.array(), 0, e.array().length)
    }
    flushReach()

    val body = tlvs.toByteArray
    val pduLen = 8 + 19 + body.length // common hdr + LSP hdr + TLVs
    val b = ByteBuffer.allocate(pduLen)
    b.put(Idrp.toByte)
    b.put(27.toByte)               // header length (8 common + 19 LSP)
    b.put(1.toByte)                // version/protocol-id extension
    b.put(0.toByte)                // id length (0 = 6 octets)
    b.put((if (l.level == 1) PduL1Lsp else PduL2Lsp).toByte)
    b.put(1.toByte)                // version
    b.put(0.toByte)                // reserved
    b.put(0.toByte)                // max area addresses (0 = 3)
    b.putShort(pduLen.toShort)
    b.putShort(l.lifetime.toShort)
    var i = 0
    while (i < 6) { b.put(((l.sysId >> (40 - 8 * i)) & 0xff).toByte); i += 1 }
    b.put(l.pseudonode.toByte)
    b.put(l.fragment.toByte)
    b.putInt(l.seqNo.toInt)
    b.putShort(0)                  // checksum (not verified here)
    b.put((if (l.level == 1) 1 else 3).toByte) // IS type
    b.put(body)
    b.array()
  }

  /** Decode a concatenated stream of LSPs; malformed PDUs stop the
    * walk (this path eats raw adjacency bytes — never throw). */
  def decode(bytes: Array[Byte]): Seq[Lsp] = {
    val out = mutable.Buffer[Lsp]()
    val buf = ByteBuffer.wrap(bytes)
    var off = 0
    var bad = false
    while (!bad && off + 27 <= bytes.length) {
      if ((bytes(off) & 0xff) != Idrp) bad = true
      else {
        val pduType = bytes(off + 4) & 0x1f
        val pduLen = buf.getShort(off + 8) & 0xffff
        if ((pduType != PduL1Lsp && pduType != PduL2Lsp) ||
            pduLen < 27 || off + pduLen > bytes.length) bad = true
        else {
          val lifetime = buf.getShort(off + 10) & 0xffff
          var sysId = 0L
          var i = 0
          while (i < 6) { sysId = (sysId << 8) | (bytes(off + 12 + i) & 0xff); i += 1 }
          val pseudo = bytes(off + 18) & 0xff
          val frag = bytes(off + 19) & 0xff
          val seqNo = buf.getInt(off + 20) & 0xffffffffL
          var hostname = ""
          val reach = mutable.Buffer[Reach]()
          var t = off + 27
          val end = off + pduLen
          var tbad = false
          while (!tbad && t + 2 <= end) {
            val tpe = bytes(t) & 0xff
            val len = bytes(t + 1) & 0xff
            if (t + 2 + len > end) tbad = true
            else {
              tpe match {
                case TlvHostname =>
                  hostname = new String(bytes, t + 2, len, "UTF-8")
                case TlvExtIpReach =>
                  var p = t + 2
                  val pEnd = t + 2 + len
                  while (!tbad && p + 5 <= pEnd) {
                    val metric = buf.getInt(p) & 0xffffffffL
                    val ctrl = bytes(p + 4) & 0xff
                    val plen = ctrl & 0x3f
                    val pBytes = (plen + 7) / 8
                    val subTlv = (ctrl & 0x40) != 0
                    if (plen > 32 || p + 5 + pBytes > pEnd) tbad = true
                    else {
                      var prefix = 0L
                      var j = 0
                      while (j < pBytes) {
                        prefix |= (bytes(p + 5 + j) & 0xffL) << (24 - 8 * j)
                        j += 1
                      }
                      reach += Reach(prefix, plen, metric, (ctrl & 0x80) != 0)
                      p += 5 + pBytes
                      if (subTlv) { // skip sub-TLV block: 1 len byte + body
                        if (p + 1 > pEnd ||
                            p + 1 + (bytes(p) & 0xff) > pEnd) tbad = true
                        else p += 1 + (bytes(p) & 0xff)
                      }
                    }
                  }
                case _ => () // area/auth/other TLVs not projected
              }
              t += 2 + len
            }
          }
          if (!tbad)
            out += Lsp(if (pduType == PduL1Lsp) 1 else 2, sysId, pseudo,
              frag, seqNo, lifetime, hostname, reach.toSeq)
          off += pduLen
        }
      }
    }
    out.toSeq
  }

  /** Project a decoded LSP set to the IGP RIB: highest-seqno LSP wins
    * per (sysid, pseudonode, fragment), zero-lifetime LSPs purge
    * (ISO 10589 §7.3.16.4), hostname resolved from any fragment of the
    * same system. */
  def rib(lsps: Seq[Lsp]): Seq[(Long, String, Reach)] = {
    val latest = lsps.groupBy(l => (l.sysId, l.pseudonode, l.fragment))
      .values.map(_.maxBy(_.seqNo)).filter(_.lifetime > 0).toSeq
    val names = latest.filter(_.hostname.nonEmpty)
      .groupBy(_.sysId).map { case (id, ls) => id -> ls.head.hostname }
    latest.flatMap(l =>
      l.reach.map(r => (l.sysId, names.getOrElse(l.sysId, ""), r)))
  }
}
