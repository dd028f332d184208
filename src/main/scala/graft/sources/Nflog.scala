package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable

/** NFLOG netlink codec — the capture path under `uacctd` (reference
  * `src/uacctd.c:47-130` `nflog_incoming` via libnetfilter_log). The
  * wire format is public Linux uapi (`linux/netlink.h`,
  * `linux/netfilter/nfnetlink.h`, `linux/netfilter/nfnetlink_log.h`):
  * a stream of netlink messages — 16-byte `nlmsghdr` (length, type =
  * subsystem<<8 | msg, flags, seq, pid; host order, here little-endian
  * as on the x86 hosts uacctd runs on) — each carrying a 4-byte
  * `nfgenmsg` (family, version, group id in BIG endian) and a chain of
  * 4-byte-aligned `nlattr` TLVs. Network-meaningful attribute payloads
  * (hw_protocol, mark, ifindexes, timestamps) are big-endian.
  *
  * Reassembly mirrors `uacctd.c`'s jumbo-container logic: when HWTYPE
  * is Ethernet the HWHEADER attribute is prepended to PAYLOAD to
  * rebuild the full frame (`uacctd.c:99-103`); otherwise a zeroed
  * 14-byte Ethernet header with the family's ethertype is synthesized
  * (`uacctd.c:104-116`). PHYS ifindexes take precedence over the
  * logical ones (`uacctd.c:76-82`). Non-INET families are skipped
  * (`uacctd.c:62-66`). Malformed messages stop the walk — this path
  * eats raw socket bytes and must never throw.
  */
object Nflog {
  val NlmsghdrLen = 16
  val SubsysUlog = 4          // NFNL_SUBSYS_ULOG
  val MsgPacket = 0           // NFULNL_MSG_PACKET
  val AfInet = 2
  val AfInet6 = 10
  val HwTypeEther = 1         // ARPHRD_ETHER == DLT_EN10MB

  // nfnetlink_log.h attribute types
  val AttrPacketHdr = 1       // hw_protocol be16, hook u8, pad
  val AttrMark = 2
  val AttrTimestamp = 3       // sec be64, usec be64
  val AttrIfIndev = 4
  val AttrIfOutdev = 5
  val AttrIfPhysIndev = 6
  val AttrIfPhysOutdev = 7
  val AttrHwAddr = 8
  val AttrPayload = 9
  val AttrPrefix = 10
  val AttrHwType = 15         // be16
  val AttrHwHeader = 16
  val AttrHwLen = 17

  /** One NFLOG packet notification, post-reassembly: `frame` is the
    * rebuilt Ethernet frame ready for [[Pcap.parse]]. */
  final case class Msg(group: Int, family: Int, hwProto: Int, hook: Int,
                       mark: Long, tsUs: Long, ifIn: Int, ifOut: Int,
                       prefix: String, frame: Array[Byte])

  private def align4(n: Int): Int = (n + 3) & ~3

  private def attr(out: ByteArrayOutputStream, tpe: Int,
                   payload: Array[Byte]): Unit = {
    val len = 4 + payload.length
    val b = ByteBuffer.allocate(align4(len)).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(len.toShort).putShort(tpe.toShort).put(payload)
    out.write(b.array(), 0, b.array().length)
  }

  private def be16(v: Int) =
    ByteBuffer.allocate(2).putShort(v.toShort).array()
  private def be32(v: Long) =
    ByteBuffer.allocate(4).putInt(v.toInt).array()
  private def be64(v: Long) = ByteBuffer.allocate(8).putLong(v).array()

  /** Encode one NFULNL_MSG_PACKET netlink message. `ipPacket` is the
    * raw IP payload (what the kernel logs); `hwHeader`, when given,
    * carries the captured Ethernet header with HWTYPE=ARPHRD_ETHER. */
  def encode(group: Int, family: Int, hwProto: Int, hook: Int, mark: Long,
             tsUs: Long, ifIn: Int, ifOut: Int, prefix: String,
             ipPacket: Array[Byte],
             hwHeader: Option[Array[Byte]] = None, seq: Long = 0L)
      : Array[Byte] = {
    val attrs = new ByteArrayOutputStream()
    val ph = ByteBuffer.allocate(4)
    ph.putShort(hwProto.toShort).put(hook.toByte).put(0.toByte)
    attr(attrs, AttrPacketHdr, ph.array())
    if (mark != 0) attr(attrs, AttrMark, be32(mark))
    attr(attrs, AttrTimestamp,
      be64(tsUs / 1000000L) ++ be64(tsUs % 1000000L))
    if (ifIn != 0) attr(attrs, AttrIfIndev, be32(ifIn.toLong))
    if (ifOut != 0) attr(attrs, AttrIfOutdev, be32(ifOut.toLong))
    hwHeader.foreach { hw =>
      attr(attrs, AttrHwType, be16(HwTypeEther))
      attr(attrs, AttrHwLen, be16(hw.length))
      attr(attrs, AttrHwHeader, hw)
    }
    if (prefix.nonEmpty)
      attr(attrs, AttrPrefix, prefix.getBytes("UTF-8") :+ 0.toByte)
    attr(attrs, AttrPayload, ipPacket)

    val body = attrs.toByteArray
    val len = NlmsghdrLen + 4 + body.length
    val b = ByteBuffer.allocate(align4(len)).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(len)
    b.putShort(((SubsysUlog << 8) | MsgPacket).toShort)
    b.putShort(0)                       // flags
    b.putInt(seq.toInt)                 // seq
    b.putInt(0)                         // portid
    b.put(family.toByte).put(0.toByte)  // nfgenmsg: family, version
    b.putShort(0)                       // res_id placeholder
    // res_id (group) is BIG endian inside the LE header stream
    b.array()(NlmsghdrLen + 2) = ((group >> 8) & 0xff).toByte
    b.array()(NlmsghdrLen + 3) = (group & 0xff).toByte
    b.put(body)
    b.array()
  }

  /** Decode a netlink stream into reassembled [[Msg]]s, mirroring the
    * uacctd callback: non-INET families skipped, PHYS ifindex wins,
    * Ethernet frame rebuilt from HWHEADER+PAYLOAD or synthesized.
    * Any malformed header stops the walk; a malformed attribute chain
    * skips that message. */
  def decode(bytes: Array[Byte]): Seq[Msg] = {
    val out = mutable.Buffer[Msg]()
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var off = 0
    var bad = false
    while (!bad && off + NlmsghdrLen + 4 <= bytes.length) {
      val len = buf.getInt(off)
      val tpe = buf.getShort(off + 4) & 0xffff
      if (len < NlmsghdrLen + 4 || off + len > bytes.length) bad = true
      else {
        if (tpe == ((SubsysUlog << 8) | MsgPacket)) {
          val family = bytes(off + NlmsghdrLen) & 0xff
          val group = ((bytes(off + NlmsghdrLen + 2) & 0xff) << 8) |
            (bytes(off + NlmsghdrLen + 3) & 0xff)
          if (family == AfInet || family == AfInet6)
            decodeAttrs(bytes, off + NlmsghdrLen + 4, off + len,
              group, family).foreach(out += _)
        }
        off += align4(len)
      }
    }
    out.toSeq
  }

  private def decodeAttrs(bytes: Array[Byte], start: Int, end: Int,
                          group: Int, family: Int): Option[Msg] = {
    val le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val be = ByteBuffer.wrap(bytes)
    var off = start
    var hwProto = 0; var hook = 0; var mark = 0L; var tsUs = 0L
    var ifIn = 0; var ifOut = 0; var physIn = 0; var physOut = 0
    var prefix = ""; var hwType = 0
    var hwHeader: Array[Byte] = null
    var payload: Array[Byte] = null
    while (off + 4 <= end) {
      val alen = le.getShort(off) & 0xffff
      val atpe = le.getShort(off + 2) & 0xffff
      if (alen < 4 || off + alen > end) return None
      val vOff = off + 4
      val vLen = alen - 4
      atpe match {
        case AttrPacketHdr if vLen >= 3 =>
          hwProto = be.getShort(vOff) & 0xffff
          hook = bytes(vOff + 2) & 0xff
        case AttrMark if vLen >= 4 =>
          mark = be.getInt(vOff) & 0xffffffffL
        case AttrTimestamp if vLen >= 16 =>
          tsUs = be.getLong(vOff) * 1000000L + be.getLong(vOff + 8)
        case AttrIfIndev if vLen >= 4 => ifIn = be.getInt(vOff)
        case AttrIfOutdev if vLen >= 4 => ifOut = be.getInt(vOff)
        case AttrIfPhysIndev if vLen >= 4 => physIn = be.getInt(vOff)
        case AttrIfPhysOutdev if vLen >= 4 => physOut = be.getInt(vOff)
        case AttrHwType if vLen >= 2 => hwType = be.getShort(vOff) & 0xffff
        case AttrHwHeader =>
          hwHeader = java.util.Arrays.copyOfRange(bytes, vOff, vOff + vLen)
        case AttrPrefix if vLen >= 1 =>
          prefix = new String(bytes, vOff, vLen - 1, "UTF-8")
        case AttrPayload =>
          payload = java.util.Arrays.copyOfRange(bytes, vOff, vOff + vLen)
        case _ => () // unknown attributes are skipped, like libnfnetlink
      }
      off += align4(alen)
    }
    if (payload == null) return None
    // jumbo-container reassembly (uacctd.c:99-116)
    val frame =
      if (hwType == HwTypeEther && hwHeader != null) hwHeader ++ payload
      else {
        val eth = new Array[Byte](14)
        val et = if (family == AfInet6) 0x86DD else 0x0800
        eth(12) = ((et >> 8) & 0xff).toByte
        eth(13) = (et & 0xff).toByte
        eth ++ payload
      }
    Some(Msg(group, family, hwProto, hook, mark, tsUs,
      if (physIn != 0) physIn else ifIn,
      if (physOut != 0) physOut else ifOut, prefix, frame))
  }
}
