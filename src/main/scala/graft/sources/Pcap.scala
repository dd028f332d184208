package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable

/** pcap savefile codec + minimal link/IP parse (reference behavior:
  * `pcap_loop`/savefile replay src/pmacctd.c:1278 with
  * `pcap_savefile*` CONFIG-KEYS:484-524; link-layer parse src/ll.c, IP
  * parse src/nl.c).
  *
  * Savefile format (public, libpcap): 24-byte global header — magic
  * 0xa1b2c3d4 (µs) / 0xa1b23c4d (ns), either byte order — version,
  * snaplen, linktype; then per packet a 16-byte record header
  * (ts_sec, ts_frac, incl_len, orig_len) + `incl_len` captured bytes.
  *
  * In the engine a directory of savefiles is a `binaryFile` scan whose
  * `content` column feeds [[read]] inside `mapPartitions` — each capture
  * file decodes independently in its partition, so a 100 TB archive of
  * pcaps parallelizes by file with no shuffle until aggregation.
  */
object Pcap {
  val MagicMicros = 0xa1b2c3d4L
  val MagicNanos = 0xa1b23c4dL
  val LinkEthernet = 1

  final case class Packet(tsUs: Long, origLen: Long, data: Array[Byte]) {
    override def equals(o: Any): Boolean = o match {
      case p: Packet => p.tsUs == tsUs && p.origLen == origLen &&
        java.util.Arrays.equals(p.data, data)
      case _ => false
    }
    override def hashCode: Int = tsUs.hashCode ^ data.length
  }

  /** One parsed IPv4 flow tuple (the ll.c → nl.c projection). */
  final case class FlowTuple(ipSrc: Long, ipDst: Long, proto: Int,
                             portSrc: Int, portDst: Int, ipLen: Long,
                             tsUs: Long)

  // ---- savefile write (fixture generation / sfprobe-style capture) ----

  def write(packets: Seq[Packet], linkType: Int = LinkEthernet,
            snapLen: Int = 65535): Array[Byte] = {
    val body = packets.map(p => 16 + p.data.length).sum
    val buf = ByteBuffer.allocate(24 + body).order(ByteOrder.BIG_ENDIAN)
    buf.putInt(MagicMicros.toInt)
    buf.putShort(2).putShort(4) // version 2.4
    buf.putInt(0)               // thiszone
    buf.putInt(0)               // sigfigs
    buf.putInt(snapLen)
    buf.putInt(linkType)
    packets.foreach { p =>
      buf.putInt((p.tsUs / 1000000L).toInt)
      buf.putInt((p.tsUs % 1000000L).toInt)
      buf.putInt(p.data.length)
      buf.putInt(p.origLen.toInt)
      buf.put(p.data)
    }
    buf.array()
  }

  // ---- savefile read --------------------------------------------------

  final case class Savefile(linkType: Int, packets: Seq[Packet])

  def read(bytes: Array[Byte]): Savefile = {
    val be = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val magicBe = be.getInt(0) & 0xffffffffL
    val (order, nanos) = magicBe match {
      case MagicMicros => (ByteOrder.BIG_ENDIAN, false)
      case MagicNanos => (ByteOrder.BIG_ENDIAN, true)
      case 0xd4c3b2a1L => (ByteOrder.LITTLE_ENDIAN, false)
      case 0x4d3cb2a1L => (ByteOrder.LITTLE_ENDIAN, true)
      case m => throw new IllegalArgumentException(
        f"not a pcap savefile: magic 0x$m%08x")
    }
    val buf = ByteBuffer.wrap(bytes).order(order)
    buf.position(20)
    val linkType = buf.getInt()
    val out = mutable.Buffer[Packet]()
    while (buf.remaining() >= 16) {
      val sec = buf.getInt() & 0xffffffffL
      val frac = buf.getInt() & 0xffffffffL
      val incl = buf.getInt()
      val orig = buf.getInt() & 0xffffffffL
      val data = new Array[Byte](incl)
      buf.get(data)
      val us = sec * 1000000L + (if (nanos) frac / 1000L else frac)
      out += Packet(us, orig, data)
    }
    Savefile(linkType, out.toSeq)
  }

  // ---- link-layer + IPv4 + L4 parse (ll.c / nl.c projection) ----------

  /** Build a minimal Ethernet+IPv4+L4 frame (fixture generation). */
  def frame(f: FlowTuple): Packet = {
    val l4 = if (f.proto == 6) 20 else 8
    val ipLen = 20 + l4
    val buf = ByteBuffer.allocate(14 + ipLen)
    buf.position(12)
    buf.putShort(0x0800.toShort)       // ethertype IPv4
    buf.put(0x45.toByte)               // v4, ihl 5
    buf.put(0.toByte)
    buf.putShort(f.ipLen.toInt.toShort) // total length (accounted bytes)
    buf.putInt(0)                      // id/frag
    buf.put(64.toByte)                 // ttl
    buf.put(f.proto.toByte)
    buf.putShort(0)                    // checksum (unused here)
    buf.putInt(f.ipSrc.toInt)
    buf.putInt(f.ipDst.toInt)
    buf.putShort(f.portSrc.toShort)
    buf.putShort(f.portDst.toShort)
    Packet(f.tsUs, 14L + ipLen, buf.array())
  }

  /** Parse one captured frame to its flow tuple; None for non-Ethernet /
    * non-IPv4 / truncated frames (pmacctd drops them the same way). */
  def parse(p: Packet, linkType: Int = LinkEthernet): Option[FlowTuple] = {
    if (linkType != LinkEthernet || p.data.length < 34) return None
    val buf = ByteBuffer.wrap(p.data)
    val etherType = buf.getShort(12) & 0xffff
    if (etherType != 0x0800) return None
    val vihl = buf.get(14) & 0xff
    if ((vihl >> 4) != 4) return None
    val ihl = (vihl & 0xf) * 4
    val ipLen = buf.getShort(16) & 0xffff
    val proto = buf.get(23) & 0xff
    val src = buf.getInt(26) & 0xffffffffL
    val dst = buf.getInt(30) & 0xffffffffL
    val l4Off = 14 + ihl
    val (sport, dport) =
      if ((proto == 6 || proto == 17) && p.data.length >= l4Off + 4)
        (buf.getShort(l4Off) & 0xffff, buf.getShort(l4Off + 2) & 0xffff)
      else (0, 0)
    Some(FlowTuple(src, dst, proto, sport, dport, ipLen, p.tsUs))
  }
}
