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

  /** One parsed flow tuple (the ll.c → nl.c projection). For IPv6
    * (`af=6`) the 128-bit addresses fold to their LOW 64 bits — the
    * grouping key the engine aggregates on, documented as such (the full
    * address would be a 16-byte binary column in the wide schema).
    * `vlan` is the outer 802.1Q/802.1AD tag, 0 when untagged
    * (ll.c:65-71); `cvlan` the QinQ inner customer tag when double-
    * tagged (cvlan_ptr, ll.c:45). */
  final case class FlowTuple(ipSrc: Long, ipDst: Long, proto: Int,
                             portSrc: Int, portDst: Int, ipLen: Long,
                             tsUs: Long, af: Int = 4, vlan: Int = 0,
                             cvlan: Int = 0)

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

  /** Read a savefile. NEVER throws: a replay job over a directory of
    * capture files must not die on one corrupt file (libpcap flags the
    * error and yields nothing further) — not-a-pcap returns an empty
    * savefile, a record truncated mid-file keeps the packets before
    * it. */
  def read(bytes: Array[Byte]): Savefile = {
    if (bytes.length < 24) return Savefile(0, Nil)
    val be = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val magicBe = be.getInt(0) & 0xffffffffL
    val (order, nanos) = magicBe match {
      case MagicMicros => (ByteOrder.BIG_ENDIAN, false)
      case MagicNanos => (ByteOrder.BIG_ENDIAN, true)
      case 0xd4c3b2a1L => (ByteOrder.LITTLE_ENDIAN, false)
      case 0x4d3cb2a1L => (ByteOrder.LITTLE_ENDIAN, true)
      case _ => return Savefile(0, Nil) // not a pcap savefile
    }
    val buf = ByteBuffer.wrap(bytes).order(order)
    buf.position(20)
    val linkType = buf.getInt()
    val out = mutable.Buffer[Packet]()
    var truncated = false
    while (!truncated && buf.remaining() >= 16) {
      val sec = buf.getInt() & 0xffffffffL
      val frac = buf.getInt() & 0xffffffffL
      val incl = buf.getInt()
      val orig = buf.getInt() & 0xffffffffL
      if (incl < 0 || incl > buf.remaining()) truncated = true
      else {
        val data = new Array[Byte](incl)
        buf.get(data)
        val us = sec * 1000000L + (if (nanos) frac / 1000L else frac)
        out += Packet(us, orig, data)
      }
    }
    Savefile(linkType, out.toSeq)
  }

  // ------------------------------------------------------------- pcapng
  // pcapng (the Wireshark-era savefile libpcap reads transparently, so
  // the reference's pcap_savefile path accepts it unannounced): block
  // stream of (type, total length, body, total length), byte order
  // from the SHB's 0x1A2B3C4D magic, per-interface timestamp
  // resolution via the if_tsresol option (default 10^-6).

  val NgShb = 0x0a0d0d0aL
  private val NgIdb = 1L
  private val NgSpb = 3L
  private val NgEpb = 6L

  /** Read a pcapng capture: SHB sections, IDBs (per-interface
    * linktype + tsresol), EPB/SPB packets. Lenient: a malformed block
    * ends the walk with everything before it; linkType reports the
    * FIRST interface's. */
  def readNg(bytes: Array[Byte]): Savefile = {
    var order: ByteOrder = null
    var at = 0
    var linkType = -1
    // per-interface units→µs conversion as an exact rational:
    // µs = (units / den) * num + (units % den) * num / den
    // (two-part form so num·(units % den) stays inside a Long).
    // num = -1 marks an UNSUPPORTED if_tsresol — that interface's
    // packets are dropped rather than mis-scaled.
    val ifResolNum = mutable.Buffer[Long]()
    val ifResolDen = mutable.Buffer[Long]()
    val ifSnap = mutable.Buffer[Long]()
    val out = mutable.Buffer[Packet]()
    def u32(o: Int, ord: ByteOrder): Long =
      if (o + 4 > bytes.length) -1L
      else ByteBuffer.wrap(bytes, o, 4).order(ord).getInt() & 0xffffffffL
    var ok = bytes.length >= 12 && (u32(0, ByteOrder.BIG_ENDIAN) == NgShb)
    while (ok && at + 12 <= bytes.length) {
      val btype = u32(at, if (order == null) ByteOrder.BIG_ENDIAN else order)
      if (btype == NgShb) {
        // byte-order magic decides this section's endianness
        val bom = u32(at + 8, ByteOrder.BIG_ENDIAN)
        order = if (bom == 0x1a2b3c4dL) ByteOrder.BIG_ENDIAN
          else if (bom == 0x4d3c2b1aL) ByteOrder.LITTLE_ENDIAN
          else null
        if (order == null) ok = false
      }
      if (ok) {
        val total = u32(at + 4, order)
        if (total < 12 || total % 4 != 0 || at + total > bytes.length)
          ok = false
        else {
          btype match {
            case NgIdb if at + 12 <= bytes.length =>
              val lt = ByteBuffer.wrap(bytes, at + 8, 2).order(order)
                .getShort() & 0xffff
              if (linkType < 0) linkType = lt
              val snap = u32(at + 12, order)
              // walk options for if_tsresol (code 9, 1 byte)
              var resolNum = 1L // 10^-6 default → units already µs
              var resolDen = 1L
              var o = at + 16
              var more = true
              while (more && o + 4 <= at + total.toInt - 4) {
                val code = ByteBuffer.wrap(bytes, o, 2).order(order)
                  .getShort() & 0xffff
                val olen = ByteBuffer.wrap(bytes, o + 2, 2).order(order)
                  .getShort() & 0xffff
                if (code == 0) more = false
                else {
                  if (code == 9 && olen >= 1) {
                    val r = bytes(o + 4) & 0xff
                    def pow10(e: Int): Long = {
                      var v = 1L; var i = 0
                      while (i < e) { v *= 10; i += 1 }; v
                    }
                    if ((r & 0x80) != 0) {
                      // high bit: units of 2^-p seconds. µs = units·10^6/2^p,
                      // reduced by gcd(10^6, 2^p) = 2^min(6,p). Cap p at 40
                      // so the two-part rational stays overflow-free.
                      val p = r & 0x7f
                      if (p <= 40) {
                        val sh = math.min(p, 6)
                        resolNum = 1000000L >> sh
                        resolDen = 1L << (p - sh)
                      } else { resolNum = -1; resolDen = 1 }
                    } else if (r <= 6) {      // coarser than µs: multiply up
                      resolNum = pow10(6 - r); resolDen = 1
                    } else if (r <= 15) {     // finer than µs: divide down
                      resolNum = 1; resolDen = pow10(r - 6)
                    } else { resolNum = -1; resolDen = 1 } // unsupported
                  }
                  o += 4 + ((olen + 3) & ~3)
                }
              }
              ifResolNum += resolNum
              ifResolDen += resolDen
              ifSnap += snap
            case NgEpb if at + 28 <= bytes.length =>
              val ifId = u32(at + 8, order).toInt
              val tsHi = u32(at + 12, order)
              val tsLo = u32(at + 16, order)
              val incl = u32(at + 20, order)
              val orig = u32(at + 24, order)
              if (ifId < 0 || ifId >= ifResolNum.size ||
                incl < 0 || at + 28 + incl > at + total - 4) ok = false
              else if (ifResolNum(ifId) >= 0) {
                // (an interface with an unsupported if_tsresol drops its
                // packets here — a wrong timestamp is worse than a gap)
                val data = new Array[Byte](incl.toInt)
                System.arraycopy(bytes, at + 28, data, 0, incl.toInt)
                val units = (tsHi << 32) | tsLo
                val num = ifResolNum(ifId); val den = ifResolDen(ifId)
                val us = (units / den) * num + (units % den) * num / den
                out += Packet(us, orig, data)
              }
            case NgSpb if at + 16 <= bytes.length &&
                ifResolNum.nonEmpty =>
              val orig = u32(at + 8, order)
              val snap = ifSnap.head
              val incl = math.min(orig,
                if (snap > 0) snap else orig)
              if (incl < 0 || at + 12 + incl > at + total - 4) ok = false
              else {
                val data = new Array[Byte](incl.toInt)
                System.arraycopy(bytes, at + 12, data, 0, incl.toInt)
                out += Packet(0L, orig, data) // SPB carries no timestamp
              }
            case _ => // unknown/meta block: skip by total length
          }
          if (ok) at += total.toInt
        }
      }
    }
    Savefile(math.max(linkType, 0), out.toSeq)
  }

  /** Write a pcapng capture: one SHB + one IDB (+ if_tsresol when
    * `nanos`) + one EPB per packet, little-endian. */
  def writeNg(packets: Seq[Packet], linkType: Int = LinkEthernet,
              nanos: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def block(btype: Long, body: Array[Byte]): Unit = {
      val pad = (4 - body.length % 4) % 4
      val total = 12 + body.length + pad
      val b = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(btype.toInt); b.putInt(total)
      b.put(body); (0 until pad).foreach(_ => b.put(0.toByte))
      b.putInt(total)
      out.write(b.array(), 0, total)
    }
    val shb = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    shb.putInt(0x1a2b3c4d); shb.putShort(1); shb.putShort(0)
    shb.putLong(-1L) // section length unknown
    block(NgShb, shb.array())
    val idbLen = if (nanos) 16 else 8
    val idb = ByteBuffer.allocate(idbLen).order(ByteOrder.LITTLE_ENDIAN)
    idb.putShort(linkType.toShort); idb.putShort(0)
    idb.putInt(0) // snaplen unlimited
    if (nanos) {
      idb.putShort(9); idb.putShort(1) // if_tsresol = 10^-9
      idb.put(9.toByte)
      (0 until 3).foreach(_ => idb.put(0.toByte)) // pad to 32 bits
    }
    block(NgIdb, idb.array())
    packets.foreach { p =>
      val units = if (nanos) p.tsUs * 1000L else p.tsUs
      val epb = ByteBuffer.allocate(20 + p.data.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      epb.putInt(0)
      epb.putInt((units >>> 32).toInt); epb.putInt(units.toInt)
      epb.putInt(p.data.length); epb.putInt(p.origLen.toInt)
      epb.put(p.data)
      block(NgEpb, epb.array())
    }
    out.toByteArray
  }

  /** Sniff classic pcap vs pcapng and dispatch — the libpcap behavior
    * the reference's pcap_savefile users get for free. */
  def readAuto(bytes: Array[Byte]): Savefile =
    if (bytes.length >= 4 &&
      (ByteBuffer.wrap(bytes).getInt(0) & 0xffffffffL) == NgShb)
      readNg(bytes)
    else read(bytes)

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

  /** Build one IPv4 FRAGMENT frame: id/flags/offset set in the IP
    * header; only the first fragment (off8 == 0) carries the L4
    * header — later fragments are opaque payload, exactly why the
    * reference needs its fragment buffer (src/ip_frag.c). `ipLen` is
    * the fragment's accounted total-length claim. */
  def frameFrag(f: FlowTuple, ipId: Int, off8: Int,
                mf: Boolean): Packet = {
    val l4 = if (off8 == 0) (if (f.proto == 6) 20 else 8) else 0
    val buf = ByteBuffer.allocate(14 + 20 + l4)
    buf.position(12)
    buf.putShort(0x0800.toShort)
    buf.put(0x45.toByte)
    buf.put(0.toByte)
    buf.putShort(f.ipLen.toInt.toShort)
    buf.putShort(ipId.toShort)
    buf.putShort(((if (mf) 0x2000 else 0) | (off8 & 0x1fff)).toShort)
    buf.put(64.toByte)
    buf.put(f.proto.toByte)
    buf.putShort(0)
    buf.putInt(f.ipSrc.toInt)
    buf.putInt(f.ipDst.toInt)
    if (off8 == 0) {
      buf.putShort(f.portSrc.toShort)
      buf.putShort(f.portDst.toShort)
    }
    Packet(f.tsUs, 14L + 20 + l4, buf.array())
  }

  /** Parse a v4 frame INCLUDING fragmentation fields: returns the
    * tuple (ports zero when this is a non-first fragment — there is no
    * L4 header to read), the IP id, the fragment offset in 8-byte
    * units, and the MF flag. */
  def parseFrag(p: Packet): Option[(FlowTuple, Int, Int, Boolean)] = {
    val data = p.data
    if (data.length < 14 + 20) return None
    val buf = ByteBuffer.wrap(data)
    if ((buf.getShort(12) & 0xffff) != 0x0800) return None
    val off = 14
    if ((buf.get(off) & 0xff) >> 4 != 4) return None
    val ihl = (buf.get(off) & 0xf) * 4
    val ipLen = buf.getShort(off + 2) & 0xffff
    val ipId = buf.getShort(off + 4) & 0xffff
    val flagsOff = buf.getShort(off + 6) & 0xffff
    val off8 = flagsOff & 0x1fff
    val mf = (flagsOff & 0x2000) != 0
    val proto = buf.get(off + 9) & 0xff
    val src = buf.getInt(off + 12) & 0xffffffffL
    val dst = buf.getInt(off + 16) & 0xffffffffL
    val l4Off = off + ihl
    val (sp, dp) =
      if (off8 == 0 && data.length >= l4Off + 4)
        (buf.getShort(l4Off) & 0xffff, buf.getShort(l4Off + 2) & 0xffff)
      else (0, 0)
    Some((FlowTuple(src, dst, proto, sp, dp, ipLen, p.tsUs),
      ipId, off8, mf))
  }

  /** Build a VLAN-tagged (802.1Q) and/or IPv6 frame. `af=6` writes a
    * 40-byte IPv6 header whose src/dst carry the tuple's longs in the
    * low 8 bytes. */
  def frameExt(f: FlowTuple): Packet = {
    val l4 = if (f.proto == 6) 20 else 8
    val tagLen = (if (f.vlan != 0) 4 else 0) + (if (f.cvlan != 0) 4 else 0)
    val ipHdr = if (f.af == 6) 40 else 20
    val ipLenOnWire = ipHdr + l4
    val buf = ByteBuffer.allocate(14 + tagLen + ipLenOnWire)
    buf.position(12)
    if (f.vlan != 0) {
      // QinQ: outer S-tag uses the 802.1AD TPID, inner C-tag 802.1Q
      buf.putShort((if (f.cvlan != 0) 0x88A8 else 0x8100).toShort)
      buf.putShort((f.vlan & 0xfff).toShort) // PCP/DEI zero + VID
      if (f.cvlan != 0) {
        buf.putShort(0x8100.toShort)
        buf.putShort((f.cvlan & 0xfff).toShort)
      }
    }
    if (f.af == 6) {
      buf.putShort(0x86DD.toShort)          // ethertype IPv6
      buf.putInt(0x60000000)                // version 6, class/flow 0
      buf.putShort((f.ipLen - 40).toInt.toShort) // payload length
      buf.put(f.proto.toByte)               // next header
      buf.put(64.toByte)                    // hop limit
      buf.putLong(0L).putLong(f.ipSrc)      // src: low 64 bits carry id
      buf.putLong(0L).putLong(f.ipDst)
    } else {
      buf.putShort(0x0800.toShort)
      buf.put(0x45.toByte).put(0.toByte)
      buf.putShort(f.ipLen.toInt.toShort)
      buf.putInt(0)
      buf.put(64.toByte).put(f.proto.toByte)
      buf.putShort(0)
      buf.putInt(f.ipSrc.toInt)
      buf.putInt(f.ipDst.toInt)
    }
    buf.putShort(f.portSrc.toShort)
    buf.putShort(f.portDst.toShort)
    Packet(f.tsUs, (14 + tagLen + ipLenOnWire).toLong, buf.array())
  }

  /** Build one IPv6 FRAGMENT frame (RFC 8200 §4.5 fragment extension
    * header, next-header 44 — the find_fragment6 lane of
    * src/ip_frag.c): [next hdr][res][offset13|res2|M][identification].
    * Only the first fragment (off8 == 0) carries the L4 header. */
  def frameFrag6(f: FlowTuple, ident: Long, off8: Int,
                 m: Boolean): Packet = {
    val l4 = if (off8 == 0) (if (f.proto == 6) 20 else 8) else 0
    val buf = ByteBuffer.allocate(14 + 40 + 8 + l4)
    buf.position(12)
    buf.putShort(0x86DD.toShort)
    buf.putInt(0x60000000)
    buf.putShort((f.ipLen - 40).toInt.toShort) // payload-length claim
    buf.put(44.toByte)                  // next header: fragment EH
    buf.put(64.toByte)
    buf.putLong(0L).putLong(f.ipSrc)
    buf.putLong(0L).putLong(f.ipDst)
    buf.put(f.proto.toByte)             // EH: inner next header
    buf.put(0.toByte)
    buf.putShort((((off8 & 0x1fff) << 3) | (if (m) 1 else 0)).toShort)
    buf.putInt(ident.toInt)
    if (off8 == 0) {
      buf.putShort(f.portSrc.toShort)
      buf.putShort(f.portDst.toShort)
    }
    Packet(f.tsUs, (14 + 40 + 8 + l4).toLong, buf.array())
  }

  /** Parse a v6 frame with a fragment extension header: tuple (ports
    * zero on non-first fragments), identification, offset (8-byte
    * units), M flag. None if not v6-with-fragment-EH. */
  def parseFrag6(p: Packet): Option[(FlowTuple, Long, Int, Boolean)] = {
    val data = p.data
    if (data.length < 14 + 48) return None
    val buf = ByteBuffer.wrap(data)
    if ((buf.getShort(12) & 0xffff) != 0x86DD) return None
    val off = 14
    if ((buf.get(off) & 0xff) >> 4 != 6) return None
    val payLen = buf.getShort(off + 4) & 0xffff
    if ((buf.get(off + 6) & 0xff) != 44) return None
    val src = buf.getLong(off + 8 + 8)
    val dst = buf.getLong(off + 24 + 8)
    val eh = off + 40
    val proto = buf.get(eh) & 0xff
    val offM = buf.getShort(eh + 2) & 0xffff
    val off8 = offM >>> 3
    val m = (offM & 1) != 0
    val ident = buf.getInt(eh + 4) & 0xffffffffL
    val l4Off = eh + 8
    val (sp, dp) =
      if (off8 == 0 && data.length >= l4Off + 4)
        (buf.getShort(l4Off) & 0xffff, buf.getShort(l4Off + 2) & 0xffff)
      else (0, 0)
    Some((FlowTuple(src, dst, proto, sp, dp, 40L + payLen, p.tsUs,
      af = 6), ident, off8, m))
  }

  /** Wrap an inner Ethernet frame in outer Eth/IPv4/UDP:4789/VXLAN
    * (nl.c:307-311: decap when dst_port == UDP_PORT_VXLAN and the I flag
    * is set). */
  def frameVxlan(outerSrc: Long, outerDst: Long, vni: Long, tsUs: Long,
                 inner: Packet): Packet = {
    val innerLen = inner.data.length
    val ipLen = 20 + 8 + 8 + innerLen
    val buf = ByteBuffer.allocate(14 + ipLen)
    buf.position(12)
    buf.putShort(0x0800.toShort)
    buf.put(0x45.toByte).put(0.toByte)
    buf.putShort(ipLen.toShort)
    buf.putInt(0)
    buf.put(64.toByte).put(17.toByte)       // UDP
    buf.putShort(0)
    buf.putInt(outerSrc.toInt)
    buf.putInt(outerDst.toInt)
    buf.putShort(12345.toShort)             // outer sport
    buf.putShort(4789.toShort)              // UDP_PORT_VXLAN
    buf.putShort((8 + 8 + innerLen).toShort) // UDP length
    buf.putShort(0)
    buf.put(0x08.toByte)                    // VXLAN flags: I bit
    buf.put(0.toByte).put(0.toByte).put(0.toByte)
    buf.putInt((vni << 8).toInt)            // 24-bit VNI + reserved
    buf.put(inner.data)
    Packet(tsUs, (14 + ipLen).toLong, buf.array())
  }

  /** Parse one captured frame to its flow tuple; None for non-Ethernet /
    * truncated / non-IP frames (pmacctd drops them the same way).
    * Handles 802.1Q tags (ll.c:65-71) and IPv6 (ll.c:57-59 ip6_handler);
    * IPv6 addresses fold to their low 64 bits per [[FlowTuple]]. */
  /** L2 view of a frame for the `aggregate_unknown_etype` path
    * (CONFIG-KEYS): frames whose EtherType has no L3 decoder still
    * aggregate on (src_mac, dst_mac, vlan, etype). Walks the same
    * QinQ tag stack as [[parse]]. */
  final case class L2View(srcMac: Long, dstMac: Long, vlan: Int,
                          etype: Int, frameLen: Long)

  def parseL2(p: Packet): Option[L2View] = {
    if (p.data.length < 14) return None
    val buf = ByteBuffer.wrap(p.data)
    def mac(o: Int): Long = (0 until 6).foldLeft(0L)((a, i) =>
      (a << 8) | (buf.get(o + i) & 0xffL))
    var off = 12
    var etype = buf.getShort(off) & 0xffff
    var vlan = 0
    off += 2
    var tags = 0
    while ((etype == 0x8100 || etype == 0x88a8) && tags < 2 &&
           p.data.length >= off + 4) {
      if (vlan == 0) vlan = buf.getShort(off) & 0x0fff
      etype = buf.getShort(off + 2) & 0xffff
      off += 4
      tags += 1
    }
    Some(L2View(mac(6), mac(0), vlan, etype, p.origLen))
  }

  def parse(p: Packet, linkType: Int = LinkEthernet): Option[FlowTuple] = {
    if (linkType != LinkEthernet || p.data.length < 34) return None
    val buf = ByteBuffer.wrap(p.data)
    var off = 12
    var etherType = buf.getShort(off) & 0xffff
    var vlan = 0
    var cvlan = 0
    off += 2
    // up to two stacked tags: 802.1AD S-tag then 802.1Q C-tag (QinQ,
    // ll.c:65-71 outer walk + cvlan_ptr ll.c:45)
    var tags = 0
    while (tags < 2 && (etherType == 0x8100 || etherType == 0x88A8)) {
      if (p.data.length < off + 4) return None
      val vid = buf.getShort(off) & 0xfff
      if (tags == 0) vlan = vid else cvlan = vid
      etherType = buf.getShort(off + 2) & 0xffff
      off += 4
      tags += 1
    }
    if (etherType == 0x86DD || etherType == 0x0800)
      parseIpAt(p.data, off, p.tsUs, vlan, cvlan)
    else None
  }

  /** Parse an IP packet (v4 or v6 by version nibble) at `off` — the
    * nl.c ip_handler/ip6_handler entry, also used by tunnel decap where
    * the inner payload is raw IP with no link layer (nl.c:785-800: "look
    * at the first payload byte to guess which protocol"). */
  private def parseIpAt(data: Array[Byte], off: Int, tsUs: Long,
                        vlan: Int, cvlan: Int = 0): Option[FlowTuple] = {
    if (data.length < off + 20) return None
    val buf = ByteBuffer.wrap(data)
    val ver = (buf.get(off) & 0xff) >> 4
    if (ver == 6) {
      if (data.length < off + 40) return None
      val payLen = buf.getShort(off + 4) & 0xffff
      val proto = buf.get(off + 6) & 0xff
      val src = buf.getLong(off + 8 + 8)   // low 64 bits
      val dst = buf.getLong(off + 24 + 8)
      val l4Off = off + 40
      val (sport, dport) =
        if ((proto == 6 || proto == 17) && data.length >= l4Off + 4)
          (buf.getShort(l4Off) & 0xffff, buf.getShort(l4Off + 2) & 0xffff)
        else if (proto == 58 && data.length >= l4Off + 2)
          // ICMPv6: type<<8|code into the dst-port slot, the nfprobe
          // convention (src/nfprobe_plugin/nfprobe_plugin.c:290-292)
          (0, ((buf.get(l4Off) & 0xff) << 8) | (buf.get(l4Off + 1) & 0xff))
        else (0, 0)
      Some(FlowTuple(src, dst, proto, sport, dport, 40L + payLen, tsUs,
        af = 6, vlan = vlan, cvlan = cvlan))
    } else if (ver == 4) {
      val vihl = buf.get(off) & 0xff
      val ihl = (vihl & 0xf) * 4
      val ipLen = buf.getShort(off + 2) & 0xffff
      val proto = buf.get(off + 9) & 0xff
      val src = buf.getInt(off + 12) & 0xffffffffL
      val dst = buf.getInt(off + 16) & 0xffffffffL
      val l4Off = off + ihl
      val (sport, dport) =
        if ((proto == 6 || proto == 17) && data.length >= l4Off + 4)
          (buf.getShort(l4Off) & 0xffff, buf.getShort(l4Off + 2) & 0xffff)
        else if (proto == 1 && data.length >= l4Off + 2)
          // ICMP: type<<8|code into the dst-port slot, the nfprobe
          // convention (src/nfprobe_plugin/nfprobe_plugin.c:290-292;
          // type/code captured in nl.c:365-372)
          (0, ((buf.get(l4Off) & 0xff) << 8) | (buf.get(l4Off + 1) & 0xff))
        else (0, 0)
      Some(FlowTuple(src, dst, proto, sport, dport, ipLen, tsUs,
        af = 4, vlan = vlan, cvlan = cvlan))
    } else None
  }

  /** Wrap an inner IP packet (no link layer) in outer
    * Eth/IPv4/UDP:2152/GTPv1-U (gtp_tunnel_func, nl.c:750-800: version
    * from flags>>5, 8-byte v1 header, inner walked straight as IP). */
  def frameGtp(outerSrc: Long, outerDst: Long, teid: Long, tsUs: Long,
               innerIp: Array[Byte]): Packet = {
    val ipLen = 20 + 8 + 8 + innerIp.length
    val buf = ByteBuffer.allocate(14 + ipLen)
    buf.position(12)
    buf.putShort(0x0800.toShort)
    buf.put(0x45.toByte).put(0.toByte)
    buf.putShort(ipLen.toShort)
    buf.putInt(0)
    buf.put(64.toByte).put(17.toByte)
    buf.putShort(0)
    buf.putInt(outerSrc.toInt)
    buf.putInt(outerDst.toInt)
    buf.putShort(23000.toShort)             // outer sport
    buf.putShort(2152.toShort)              // GTP-U port
    buf.putShort((8 + 8 + innerIp.length).toShort)
    buf.putShort(0)
    buf.put(0x30.toByte)                    // GTP: version 1, PT=1
    buf.put(0xff.toByte)                    // message type: T-PDU
    buf.putShort(innerIp.length.toShort)
    buf.putInt(teid.toInt)
    buf.put(innerIp)
    Packet(tsUs, (14 + ipLen).toLong, buf.array())
  }

  /** IPv4-only inner packet bytes (no Ethernet) for GTP fixtures. */
  def innerIpv4(f: FlowTuple): Array[Byte] = {
    val p = frame(f)
    java.util.Arrays.copyOfRange(p.data, 14, p.data.length)
  }

  /** GTP-U decap (gtp_tunnel_func, nl.c:750-800): outer UDP to 2152,
    * version from flags>>5 selects the 4-byte (v0) or 8-byte (v1)
    * header, then the payload is walked directly as IP — NO inner link
    * layer, unlike VXLAN. Returns (teid — 0 for v0, inner tuple). */
  def parseGtp(p: Packet): Option[(Long, FlowTuple)] = {
    parse(p).filter(o => o.proto == 17 && o.portDst == 2152).flatMap { _ =>
      val gtpOff = 14 + 20 + 8
      if (p.data.length < gtpOff + 4) None
      else {
        val buf = ByteBuffer.wrap(p.data)
        val flags = buf.get(gtpOff) & 0xff
        val hdr: Option[(Int, Long)] = ((flags >> 5) & 0x7) match {
          case 0 => Some((4, 0L))
          case 1 if p.data.length >= gtpOff + 8 =>
            Some((8, buf.getInt(gtpOff + 4) & 0xffffffffL))
          case _ => None // unsupported GTP version or truncated v1
        }
        hdr.flatMap { case (hdrLen, teid) =>
          parseIpAt(p.data, gtpOff + hdrLen, p.tsUs, 0).map(t => (teid, t))
        }
      }
    }
  }

  /** VXLAN decap (nl.c:307-311, vxlan_tunnel_configurator nl.c:41): when
    * the outer tuple is UDP to port 4789 and the VXLAN I flag is set,
    * return (vni, inner tuple) by re-running [[parse]] on the
    * encapsulated Ethernet frame; None when not VXLAN. */
  def parseVxlan(p: Packet): Option[(Long, FlowTuple)] = {
    parse(p).filter(o => o.proto == 17 && o.portDst == 4789).flatMap { _ =>
      // outer is always untagged Eth + 20B IPv4 + 8B UDP here
      val vxOff = 14 + 20 + 8
      if (p.data.length < vxOff + 8 + 14) None
      else {
        val buf = ByteBuffer.wrap(p.data)
        val flags = buf.get(vxOff) & 0xff
        if ((flags & 0x08) == 0) None // I flag absent: not a VNI frame
        else {
          val vni = (buf.getInt(vxOff + 4) & 0xffffffffL) >> 8
          val inner = java.util.Arrays.copyOfRange(
            p.data, vxOff + 8, p.data.length)
          parse(Packet(p.tsUs, inner.length.toLong, inner))
            .map(t => (vni, t))
        }
      }
    }
  }
}
