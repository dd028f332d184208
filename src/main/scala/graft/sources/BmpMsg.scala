package graft.sources

import java.nio.ByteBuffer
import scala.collection.mutable

/** BMP (BGP Monitoring Protocol, RFC 7854) wire codec — the binary leg of
  * the pmbmpd listener (`src/bmp/bmp_msg.c`: common header + per-peer
  * header walk, route-monitoring messages carrying full BGP UPDATEs).
  *
  * Covered message types: Route Monitoring (0) — per-peer header + an
  * encapsulated [[BgpMsg]] UPDATE — plus Peer Up (3) / Peer Down (2) /
  * Initiation (4) framing so a realistic session stream parses. Unknown
  * or unmodeled types are skipped by the declared common-header length,
  * as a monitor must.
  */
object BmpMsg {
  val Version = 3
  val CommonHeaderLen = 6
  val PerPeerLen = 42

  /** `peerAddr` keeps the low 4 bytes (the v4 view every existing
    * consumer uses); `addrHi`/`addrLo` carry the full 16-byte peer
    * address so v6 peers (RFC 7854 §4.2 V flag) render correctly. */
  final case class PeerHeader(peerType: Int, flags: Int, distinguisher: Long,
                              peerAddr: Long, peerAs: Long, bgpId: Long,
                              tsSec: Long, tsUsec: Long,
                              addrHi: Long = 0L, addrLo: Long = 0L)

  sealed trait Msg
  final case class RouteMonitoring(peer: PeerHeader,
                                   update: BgpMsg.Update) extends Msg
  /** Peer-up body (RFC 7854 §4.10): local address/ports plus the local
    * ASN and BGP ID from the SENT OPEN (bmp_msg.c:352-405 parses both
    * OPENs; `loc_as` is what renders as `local_as` in peer-up logs).
    * `recvFourOctetAs` is the RECEIVED OPEN's RFC 6793 capability — it
    * decides whether the session's AS_PATHs carry 2- or 4-byte ASNs
    * (peer->cap_4as, bgp_msg.c open parse). */
  final case class PeerUpBody(localHi: Long, localLo: Long,
      localPort: Int, remotePort: Int, localAs: Long, localBgpId: Long,
      recvFourOctetAs: Boolean = true,
      recvAs: Long = 0L, recvBgpId: Long = 0L)
  final case class PeerUp(peer: PeerHeader,
      up: Option[PeerUpBody] = None) extends Msg
  final case class PeerDown(peer: PeerHeader, reason: Int) extends Msg
  final case class Initiation(info: Seq[(Int, String)]) extends Msg
  final case class Termination(reason: Int) extends Msg
  /** Mirrored PDUs decode through the BGP codec when well-formed;
    * `infoCode` carries the errored-PDU / messages-lost signal. */
  final case class RouteMirror(peer: PeerHeader,
      mirrored: Option[BgpMsg.Update], infoCode: Option[Int]) extends Msg
  /** Stats report (type 1, RFC 7854 §4.8): per-peer counter TLVs,
    * stat type → value (32-bit counters and 64-bit gauges). */
  final case class StatsReport(peer: PeerHeader,
                               stats: Map[Int, Long],
                               perAfi: Seq[(Int, Int, Int, Long)] = Nil)
      extends Msg

  // ---- encode --------------------------------------------------------

  private def common(msgType: Int, body: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.allocate(CommonHeaderLen + body.length)
    buf.put(Version.toByte)
    buf.putInt(CommonHeaderLen + body.length)
    buf.put(msgType.toByte)
    buf.put(body)
    buf.array()
  }

  private def peerBytes(p: PeerHeader): Array[Byte] = {
    val buf = ByteBuffer.allocate(PerPeerLen)
    buf.put(p.peerType.toByte)
    buf.put(p.flags.toByte)
    buf.putLong(p.distinguisher)
    buf.putLong(0L)                 // peer address bytes 0-7 (v4-mapped)
    buf.putInt(0)                   // bytes 8-11
    buf.putInt(p.peerAddr.toInt)    // v4 in the low 4 bytes
    buf.putInt(p.peerAs.toInt)
    buf.putInt(p.bgpId.toInt)
    buf.putInt(p.tsSec.toInt)
    buf.putInt(p.tsUsec.toInt)
    buf.array()
  }

  def encodeRouteMonitoring(p: PeerHeader, u: BgpMsg.Update): Array[Byte] =
    common(0, peerBytes(p) ++ BgpMsg.encode(u))

  /** Peer up: local addr(16) + ports(2+2), then optionally the sent and
    * received OPENs (RFC 7854 §4.10) — omitted by default (the message
    * is length-delimited, so the parser skips to msg end anyway). */
  def encodePeerUp(p: PeerHeader,
      sentOpen: Option[BgpMsg.Open] = None,
      recvOpen: Option[BgpMsg.Open] = None): Array[Byte] = {
    val opens = (sentOpen.toSeq ++ recvOpen.toSeq)
      .flatMap(BgpMsg.encodeOpen)
    common(3, peerBytes(p) ++ new Array[Byte](20) ++ opens.toArray)
  }

  def encodePeerDown(p: PeerHeader, reason: Int): Array[Byte] =
    common(2, peerBytes(p) :+ reason.toByte)

  /** Stats TLVs: 2-byte type, 2-byte length (4 or 8), big-endian value;
    * gauges (types 7/8: routes in rib/loc-rib) encode 8 bytes. */
  def encodeStatsReport(p: PeerHeader, stats: Map[Int, Long],
      perAfi: Seq[(Int, Int, Int, Long)] = Nil): Array[Byte] = {
    val sorted = stats.toSeq.sortBy(_._1)
    val body = new java.io.ByteArrayOutputStream()
    body.write(peerBytes(p), 0, PerPeerLen)
    val cnt = ByteBuffer.allocate(4)
      .putInt(sorted.size + perAfi.size).array()
    body.write(cnt, 0, 4)
    sorted.foreach { case (tp, v) =>
      val wide = tp == 7 || tp == 8
      val tlv = ByteBuffer.allocate(if (wide) 12 else 8)
      tlv.putShort(tp.toShort).putShort(if (wide) 8 else 4)
      if (wide) tlv.putLong(v) else tlv.putInt(v.toInt)
      body.write(tlv.array(), 0, tlv.array().length)
    }
    // RFC 7854 §4.8 per-AFI/SAFI gauges (types 9/10/16/17): len 11 =
    // 2B afi + 1B safi + 8B value
    perAfi.foreach { case (tp, afi, safi, v) =>
      val tlv = ByteBuffer.allocate(15)
      tlv.putShort(tp.toShort).putShort(11.toShort)
        .putShort(afi.toShort).put(safi.toByte).putLong(v)
      body.write(tlv.array(), 0, 15)
    }
    common(1, body.toByteArray)
  }

  /** Termination (BMP_MSG_TERM=5, src/bmp/bmp.h:44): info TLVs; type 1
    * is the 2-byte reason code (bmp_term_reason_types,
    * src/bmp/bmp.h:176). */
  def encodeTermination(reason: Int, info: Seq[(Int, String)] = Nil)
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    info.foreach { case (tp, s) =>
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val tlv = ByteBuffer.allocate(4 + b.length)
      tlv.putShort(tp.toShort).putShort(b.length.toShort).put(b)
      out.write(tlv.array(), 0, tlv.array().length)
    }
    val r = ByteBuffer.allocate(6)
    r.putShort(1.toShort).putShort(2.toShort).putShort(reason.toShort)
    out.write(r.array(), 0, 6)
    common(5, out.toByteArray)
  }

  /** Route mirroring (BMP_MSG_ROUTE_MIRROR=6, src/bmp/bmp.h:45,
    * bmp_process_msg_route_mirror src/bmp/bmp_msg.c:937): per-peer
    * header + TLVs — type 0 carries a verbatim BGP PDU, type 1 a 2-byte
    * information code (0 = errored PDU, 1 = messages lost). */
  def encodeRouteMirror(p: PeerHeader, pdu: Option[Array[Byte]],
                        infoCode: Option[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(peerBytes(p), 0, PerPeerLen)
    pdu.foreach { b =>
      val tlv = ByteBuffer.allocate(4 + b.length)
      tlv.putShort(0.toShort).putShort(b.length.toShort).put(b)
      out.write(tlv.array(), 0, tlv.array().length)
    }
    infoCode.foreach { c =>
      val tlv = ByteBuffer.allocate(6)
      tlv.putShort(1.toShort).putShort(2.toShort).putShort(c.toShort)
      out.write(tlv.array(), 0, 6)
    }
    common(6, out.toByteArray)
  }

  def encodeInitiation(info: Seq[(Int, String)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    info.foreach { case (tp, s) =>
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val tlv = ByteBuffer.allocate(4 + b.length)
      tlv.putShort(tp.toShort).putShort(b.length.toShort).put(b)
      out.write(tlv.array(), 0, tlv.array().length)
    }
    common(4, out.toByteArray)
  }

  // ---- decode --------------------------------------------------------

  private def readPeer(buf: ByteBuffer): PeerHeader = {
    val tp = buf.get() & 0xff
    val flags = buf.get() & 0xff
    val dist = buf.getLong()
    val hi = buf.getLong()
    val lo = buf.getLong()
    val addr = lo & 0xffffffffL     // v4 view: low 4 bytes
    val as = buf.getInt() & 0xffffffffL
    val bgpId = buf.getInt() & 0xffffffffL
    val tsSec = buf.getInt() & 0xffffffffL
    val tsUsec = buf.getInt() & 0xffffffffL
    PeerHeader(tp, flags, dist, addr, as, bgpId, tsSec, tsUsec, hi, lo)
  }

  /** Parse a contiguous BMP session stream. Stateful like a collector:
    * the received OPEN of each peer_up fixes the peer's 4-octet-AS
    * capability, and later route-monitoring AS_PATHs for that peer parse
    * 2-byte when it was absent (peer->cap_4as, reference bgp_msg.c). */
  def decodeStream(bytes: Array[Byte]): Seq[Msg] = {
    val buf = ByteBuffer.wrap(bytes)
    val out = mutable.Buffer[Msg]()
    val cap4as = mutable.Map[(Long, Long, Long), Boolean]()
    def pk(p: PeerHeader) = (p.addrHi, p.addrLo, p.distinguisher)
    var truncated = false
    while (!truncated && buf.remaining() >= CommonHeaderLen) {
      val ver = buf.get() & 0xff
      require(ver == Version, s"unsupported BMP version $ver")
      val len = buf.getInt()
      val msgType = buf.get() & 0xff
      val msgEnd = buf.position() + len - CommonHeaderLen
      if (msgEnd > buf.limit()) {
        // incomplete tail (a capture cut mid-message): a live socket
        // would keep these bytes buffered — stop, never throw
        truncated = true
      } else {
      msgType match {
        case 0 =>
          val peer = readPeer(buf)
          val asn16 = !cap4as.getOrElse(pk(peer), true)
          BgpMsg.decodeOne(buf, asn16 = asn16)
            .foreach(u => out += RouteMonitoring(peer, u))
        case 1 =>
          val peer = readPeer(buf)
          val n = buf.getInt()
          val stats = mutable.Map[Int, Long]()
          val perAfi = mutable.Buffer[(Int, Int, Int, Long)]()
          (0 until n).foreach { _ =>
            val tp = buf.getShort() & 0xffff
            val len = buf.getShort() & 0xffff
            val tlvEnd = buf.position() + len
            if (len == 11) {
              // RFC 7854 §4.8 per-AFI/SAFI gauge: 2B afi + 1B safi + u64
              val afi = buf.getShort() & 0xffff
              val safi = buf.get() & 0xff
              perAfi += ((tp, afi, safi, buf.getLong()))
            } else if (len == 8) stats(tp) = buf.getLong()
            else if (len == 4) stats(tp) = buf.getInt() & 0xffffffffL
            buf.position(tlvEnd)
          }
          out += StatsReport(peer, stats.toMap, perAfi.toSeq)
        case 2 =>
          val peer = readPeer(buf)
          out += PeerDown(peer, buf.get() & 0xff)
        case 3 =>
          val peer = readPeer(buf)
          val body =
            if (msgEnd - buf.position() >= 20) {
              val hi = buf.getLong(); val lo = buf.getLong()
              val lp = buf.getShort() & 0xffff
              val rp = buf.getShort() & 0xffff
              def open(): Option[BgpMsg.Open] =
                if (msgEnd - buf.position() >= 19)
                  scala.util.Try(BgpMsg.decodeMessage(buf)).toOption
                    .collect { case BgpMsg.OpenMsg(o) => o }
                else None
              val sent = open() // local side
              val recv = open() // remote side: fixes cap_4as
              cap4as(pk(peer)) = recv.forall(_.fourOctetAs)
              Some(PeerUpBody(hi, lo, lp, rp,
                sent.map(_.asn).getOrElse(0L),
                sent.map(_.bgpId).getOrElse(0L),
                recv.forall(_.fourOctetAs),
                recv.map(_.asn).getOrElse(0L),
                recv.map(_.bgpId).getOrElse(0L)))
            } else None
          out += PeerUp(peer, body)
        case 4 =>
          val info = mutable.Buffer[(Int, String)]()
          while (buf.position() + 4 <= msgEnd) {
            val tp = buf.getShort() & 0xffff
            val l = buf.getShort() & 0xffff
            val b = new Array[Byte](l)
            buf.get(b)
            info += ((tp,
              new String(b, java.nio.charset.StandardCharsets.UTF_8)))
          }
          out += Initiation(info.toSeq)
        case 5 =>
          var reason = -1
          while (buf.position() + 4 <= msgEnd) {
            val tp = buf.getShort() & 0xffff
            val l = buf.getShort() & 0xffff
            if (tp == 1 && l == 2) reason = buf.getShort() & 0xffff
            else buf.position(buf.position() + l)
          }
          out += Termination(reason)
        case 6 =>
          val peer = readPeer(buf)
          var mirrored: Option[BgpMsg.Update] = None
          var infoCode: Option[Int] = None
          while (buf.position() + 4 <= msgEnd) {
            val tp = buf.getShort() & 0xffff
            val l = buf.getShort() & 0xffff
            val tlvEnd = buf.position() + l
            if (tp == 0 && mirrored.isEmpty)
              mirrored = BgpMsg.decodeOne(buf)
            else if (tp == 1 && l == 2)
              infoCode = Some(buf.getShort() & 0xffff)
            buf.position(tlvEnd)
          }
          out += RouteMirror(peer, mirrored, infoCode)
        case _ => () // unknown message types: skip by length
      }
      buf.position(msgEnd)
      }
    }
    out.toSeq
  }
}
