package graft.sources

import java.nio.ByteBuffer
import scala.collection.mutable

/** BGP-4 UPDATE wire codec (RFC 4271 §4.1/§4.3; reference behavior:
  * `bgp_update_msg` parse in src/bgp/bgp_msg.c — NLRI/withdraw walk +
  * path-attribute extraction feeding the RIB).
  *
  * Covers the attribute set the reference materializes into flow
  * primitives (src/network.h:594-618): ORIGIN, AS_PATH (4-octet ASNs,
  * AS_SEQUENCE/AS_SET segments), NEXT_HOP, MED, LOCAL_PREF, COMMUNITIES.
  * Unknown attributes are skipped by their declared length, as a collector
  * must. Messages are parsed from a contiguous session byte stream (the
  * TCP reassembly view): 16-byte all-ones marker, 2-byte length, type 2.
  *
  * The decoded stream feeds the same RIB compaction/as-of machinery as the
  * JSON msglog path (q52/q88) — q93 drives wire bytes end-to-end.
  */
object BgpMsg {
  val HeaderLen = 19
  val TypeUpdate = 2

  /** IPv4 NLRI entry: 32-bit prefix value + mask length. */
  final case class Route(prefix: Long, plen: Int)

  final case class Update(
      withdrawn: Seq[Route] = Nil,
      nlri: Seq[Route] = Nil,
      origin: Option[Int] = None,
      asPath: Seq[Long] = Nil,
      nextHop: Option[Long] = None,
      med: Option[Long] = None,
      localPref: Option[Long] = None,
      communities: Seq[Long] = Nil)

  // ---- encode --------------------------------------------------------

  private def prefixBytes(r: Route): Array[Byte] = {
    val n = (r.plen + 7) / 8
    (0 until n).map(i => ((r.prefix >>> (24 - 8 * i)) & 0xff).toByte).toArray
  }

  private def nlriBytes(routes: Seq[Route]): Array[Byte] = {
    val out = new mutable.ArrayBuilder.ofByte
    routes.foreach { r =>
      out += r.plen.toByte
      out ++= prefixBytes(r)
    }
    out.result()
  }

  private def attr(flags: Int, tp: Int, value: Array[Byte]): Array[Byte] = {
    // RFC 4271 §4.3: bodies over 255 bytes need the extended-length flag
    // (0x10) and a 2-byte length — a long AS_PATH/COMMUNITIES encoded with
    // a 1-byte length would be a corrupt UPDATE (decodeOne already honors
    // extended length; keep encode/decode symmetric).
    if (value.length > 255) {
      val b = ByteBuffer.allocate(4 + value.length)
      b.put((flags | 0x10).toByte).put(tp.toByte)
        .putShort(value.length.toShort).put(value)
      b.array()
    } else {
      val b = ByteBuffer.allocate(3 + value.length)
      b.put(flags.toByte).put(tp.toByte).put(value.length.toByte).put(value)
      b.array()
    }
  }

  private def u32(v: Long): Array[Byte] =
    Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  def encode(u: Update): Array[Byte] = {
    val attrs = new mutable.ArrayBuilder.ofByte
    u.origin.foreach(o => attrs ++= attr(0x40, 1, Array(o.toByte)))
    if (u.asPath.nonEmpty) {
      // one AS_SEQUENCE segment of 4-octet ASNs (RFC 6793 speaker)
      val seg = ByteBuffer.allocate(2 + 4 * u.asPath.size)
      seg.put(2.toByte).put(u.asPath.size.toByte)
      u.asPath.foreach(a => seg.put(u32(a)))
      attrs ++= attr(0x40, 2, seg.array())
    }
    u.nextHop.foreach(nh => attrs ++= attr(0x40, 3, u32(nh)))
    u.med.foreach(m => attrs ++= attr(0x80, 4, u32(m)))
    u.localPref.foreach(lp => attrs ++= attr(0x40, 5, u32(lp)))
    if (u.communities.nonEmpty)
      attrs ++= attr(0xc0, 8,
        u.communities.flatMap(c => u32(c).toSeq).toArray)
    val attrBytes = attrs.result()
    val wd = nlriBytes(u.withdrawn)
    val nl = nlriBytes(u.nlri)
    val len = HeaderLen + 2 + wd.length + 2 + attrBytes.length + nl.length
    val buf = ByteBuffer.allocate(len)
    (0 until 16).foreach(_ => buf.put(0xff.toByte)) // marker
    buf.putShort(len.toShort)
    buf.put(TypeUpdate.toByte)
    buf.putShort(wd.length.toShort)
    buf.put(wd)
    buf.putShort(attrBytes.length.toShort)
    buf.put(attrBytes)
    buf.put(nl)
    buf.array()
  }

  // ---- decode --------------------------------------------------------

  private def readRoutes(buf: ByteBuffer, end: Int): Seq[Route] = {
    val out = mutable.Buffer[Route]()
    while (buf.position() < end) {
      val plen = buf.get() & 0xff
      val n = (plen + 7) / 8
      var p = 0L
      (0 until n).foreach(i => p |= (buf.get() & 0xffL) << (24 - 8 * i))
      out += Route(p, plen)
    }
    out.toSeq
  }

  /** Decode one UPDATE starting at the buffer position; returns None for
    * non-UPDATE message types (position still advances past them). */
  def decodeOne(buf: ByteBuffer): Option[Update] = {
    (0 until 16).foreach { _ =>
      require((buf.get() & 0xff) == 0xff, "bad BGP marker")
    }
    val len = buf.getShort() & 0xffff
    val tp = buf.get() & 0xff
    val msgEnd = buf.position() + len - HeaderLen
    if (tp != TypeUpdate) { buf.position(msgEnd); return None }
    val wdLen = buf.getShort() & 0xffff
    val withdrawn = readRoutes(buf, buf.position() + wdLen)
    val attrLen = buf.getShort() & 0xffff
    val attrEnd = buf.position() + attrLen
    var u = Update(withdrawn = withdrawn)
    while (buf.position() < attrEnd) {
      val flags = buf.get() & 0xff
      val atp = buf.get() & 0xff
      val alen =
        if ((flags & 0x10) != 0) buf.getShort() & 0xffff // extended length
        else buf.get() & 0xff
      val aEnd = buf.position() + alen
      atp match {
        case 1 => u = u.copy(origin = Some(buf.get() & 0xff))
        case 2 =>
          val path = mutable.Buffer[Long]()
          while (buf.position() < aEnd) {
            buf.get() // segment type (order preserved per segment)
            val n = buf.get() & 0xff
            (0 until n).foreach(_ => path += buf.getInt() & 0xffffffffL)
          }
          u = u.copy(asPath = path.toSeq)
        case 3 => u = u.copy(nextHop = Some(buf.getInt() & 0xffffffffL))
        case 4 => u = u.copy(med = Some(buf.getInt() & 0xffffffffL))
        case 5 => u = u.copy(localPref = Some(buf.getInt() & 0xffffffffL))
        case 8 =>
          val cs = mutable.Buffer[Long]()
          while (buf.position() < aEnd) cs += buf.getInt() & 0xffffffffL
          u = u.copy(communities = cs.toSeq)
        case _ => () // unknown attribute: skip by declared length
      }
      buf.position(aEnd)
    }
    u = u.copy(nlri = readRoutes(buf, msgEnd))
    buf.position(msgEnd)
    Some(u)
  }

  /** Parse a contiguous session stream of BGP messages. */
  def decodeStream(bytes: Array[Byte]): Seq[Update] = {
    val buf = ByteBuffer.wrap(bytes)
    val out = mutable.Buffer[Update]()
    while (buf.remaining() >= HeaderLen) decodeOne(buf).foreach(out += _)
    out.toSeq
  }

  // ---- full message surface (OPEN / KEEPALIVE / NOTIFICATION) --------

  final case class Open(asn: Long, holdTime: Int, bgpId: Long,
                        fourOctetAs: Boolean = true)

  sealed trait Message
  final case class OpenMsg(open: Open) extends Message
  final case class UpdateMsg(update: Update) extends Message
  case object KeepaliveMsg extends Message
  final case class NotificationMsg(code: Int, subcode: Int) extends Message

  private def withHeader(tp: Int, body: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.allocate(HeaderLen + body.length)
    (0 until 16).foreach(_ => buf.put(0xff.toByte))
    buf.putShort((HeaderLen + body.length).toShort)
    buf.put(tp.toByte)
    buf.put(body)
    buf.array()
  }

  /** OPEN with the 4-octet-AS capability (RFC 6793): the 2-byte field
    * carries AS_TRANS when the real ASN needs 4 octets. */
  def encodeOpen(o: Open): Array[Byte] = {
    val caps =
      if (o.fourOctetAs) {
        val c = ByteBuffer.allocate(8)
        c.put(2.toByte)       // param type: capabilities
        c.put(6.toByte)       // param length
        c.put(65.toByte)      // capability 65: 4-octet AS
        c.put(4.toByte)
        c.putInt(o.asn.toInt)
        c.array()
      } else Array.emptyByteArray
    val as2 = if (o.asn > 0xffffL) 23456L else o.asn // AS_TRANS
    val body = ByteBuffer.allocate(10 + caps.length)
    body.put(4.toByte)        // BGP version
    body.putShort(as2.toShort)
    body.putShort(o.holdTime.toShort)
    body.putInt(o.bgpId.toInt)
    body.put(caps.length.toByte)
    body.put(caps)
    withHeader(1, body.array())
  }

  def encodeKeepalive(): Array[Byte] = withHeader(4, Array.emptyByteArray)

  def encodeNotification(code: Int, subcode: Int): Array[Byte] =
    withHeader(3, Array(code.toByte, subcode.toByte))

  /** Decode one message of ANY type at the buffer position. */
  def decodeMessage(buf: ByteBuffer): Message = {
    val start = buf.position()
    (0 until 16).foreach { _ =>
      require((buf.get() & 0xff) == 0xff, "bad BGP marker")
    }
    val len = buf.getShort() & 0xffff
    val tp = buf.get() & 0xff
    val msgEnd = start + len
    val out = tp match {
      case 1 =>
        buf.get() // version
        val as2 = buf.getShort() & 0xffff
        val hold = buf.getShort() & 0xffff
        val bgpId = buf.getInt() & 0xffffffffL
        val optLen = buf.get() & 0xff
        val optEnd = buf.position() + optLen
        var asn = as2.toLong
        var four = false
        while (buf.position() + 2 <= optEnd) {
          val ptype = buf.get() & 0xff
          val plen = buf.get() & 0xff
          val pEnd = buf.position() + plen
          if (ptype == 2) {
            while (buf.position() + 2 <= pEnd) {
              val cap = buf.get() & 0xff
              val clen = buf.get() & 0xff
              if (cap == 65 && clen == 4) {
                asn = buf.getInt() & 0xffffffffL
                four = true
              } else buf.position(buf.position() + clen)
            }
          }
          buf.position(pEnd)
        }
        OpenMsg(Open(asn, hold, bgpId, four))
      case 2 =>
        buf.position(start)
        UpdateMsg(decodeOne(buf).get)
      case 3 =>
        NotificationMsg(buf.get() & 0xff, buf.get() & 0xff)
      case 4 => KeepaliveMsg
      case other =>
        throw new IllegalArgumentException(s"unknown BGP type $other")
    }
    buf.position(msgEnd)
    out
  }
}

/** Passive BGP session FSM (RFC 4271 §8; reference: pmbgpd accepts peers
  * and runs the state machine in `src/bgp/bgp.c`). Collector-side
  * semantics: on TCP accept send OPEN → OpenSent; peer OPEN validates →
  * reply KEEPALIVE → OpenConfirm; peer KEEPALIVE → Established; UPDATEs
  * deliver only in Established; NOTIFICATION or hold-timer expiry drops
  * to Idle (pmacct then clears the peer's RIB).
  *
  * Time is injected (`nowSec`) so hold-timer behavior is deterministic
  * under test and driven by the stream clock in the engine.
  */
final class BgpFsm(myAs: Long, myBgpId: Long, holdTime: Int = 90) {
  import BgpMsg._

  sealed trait State
  case object Idle extends State
  case object OpenSent extends State
  case object OpenConfirm extends State
  case object Established extends State

  var state: State = Idle
  var peerOpen: Option[Open] = None
  private var lastSeen = 0L
  /** negotiated hold time: min of both OPENs (RFC 4271 §4.2) */
  def negotiatedHold: Int =
    peerOpen.map(p => math.min(holdTime, p.holdTime)).getOrElse(holdTime)

  val toSend = mutable.Buffer[Array[Byte]]()
  val delivered = mutable.Buffer[Update]()
  var sessionDrops = 0

  /** TCP accept: collector sends its OPEN. */
  def start(nowSec: Long): Unit = {
    lastSeen = nowSec
    toSend += encodeOpen(Open(myAs, holdTime, myBgpId))
    state = OpenSent
  }

  def onMessage(m: Message, nowSec: Long): Unit = {
    if (state != Idle && negotiatedHold > 0 &&
        nowSec - lastSeen > negotiatedHold) {
      // hold timer already expired before this arrival: the session is
      // gone and the late message dies with it
      toSend += encodeNotification(4, 0) // hold timer expired
      drop()
      return
    }
    lastSeen = nowSec
    (state, m) match {
      case (OpenSent, OpenMsg(o)) =>
        peerOpen = Some(o)
        toSend += encodeKeepalive()
        state = OpenConfirm
      case (OpenConfirm, KeepaliveMsg) =>
        state = Established
      case (Established, UpdateMsg(u)) =>
        delivered += u
      case (Established, KeepaliveMsg) => () // refreshes lastSeen above
      case (_, NotificationMsg(_, _)) =>
        drop()
      case (s, other) =>
        // FSM error: unexpected message for the state
        toSend += encodeNotification(5, 0)
        drop()
        val _ = (s, other)
    }
  }

  private def drop(): Unit = {
    state = Idle
    peerOpen = None
    sessionDrops += 1
  }
}
