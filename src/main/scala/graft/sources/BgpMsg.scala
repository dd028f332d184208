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

  /** IPv4 NLRI entry: 32-bit prefix value + mask length. With add-path
    * (RFC 7911) negotiated, `pathId` is the 4-byte path identifier that
    * prefixes the entry on the wire; 0 otherwise. */
  final case class Route(prefix: Long, plen: Int, pathId: Long = 0L)

  /** IPv6 NLRI entry: 128-bit prefix as two longs (big-endian halves)
    * + mask length — carried in MP_REACH/MP_UNREACH (RFC 4760). */
  final case class Route6(hi: Long, lo: Long, plen: Int)

  /** VPN-IPv4 NLRI entry (RFC 4364; reference walk at
    * src/bgp/bgp_msg.c:1281-1340 SAFI_MPLS_VPN lane): MPLS label
    * (20-bit value; bottom-of-stack label kept, like the reference's
    * attr_extra->label), route distinguisher (type 0 AS2:val, 1 IP:val,
    * 2 AS4:val), and the IPv4 prefix. `plen` is the HOST prefix length
    * (the wire length also counts label+RD bits). */
  final case class RouteVpn(label: Long, rdType: Int, rdAdmin: Long,
                            rdVal: Long, prefix: Long, plen: Int)

  /** BGP-LS NLRI (RFC 7752 §3.2; reference walk: bgp_ls_nlri_parse in
    * src/bgp/bgp_ls.c:102-152 — [type:2][len:2][proto:1][identifier:8]
    * then descriptor TLVs dispatched off bgp_ls_nlri_tlv_list).
    * `protoId` is the IGP protocol (1/2 IS-IS L1/L2, 3 OSPFv2, ... —
    * src/bgp/bgp_ls.h:43-48). Node descriptors carry sub-TLV 512 (AS)
    * and 515 (IGP router id — src/bgp/bgp_ls.h:66-69). */
  sealed trait LsNlri {
    def protoId: Int; def localAsn: Long; def localId: Long
  }
  /** Node NLRI (type 1). */
  final case class LsNode(protoId: Int, localAsn: Long, localId: Long)
      extends LsNlri
  /** Link NLRI (type 2): local + remote node descriptors (TLV 256/257)
    * and IPv4 interface/neighbor addresses (TLV 259/260). `mtId` is
    * the multi-topology identifier (TLV 263, RFC 7752 §3.2.1.5 —
    * BGP_LS_MULTI_TOPO_ID, src/bgp/bgp_ls.h:60); 0 = default L3. */
  final case class LsLink(protoId: Int, localAsn: Long, localId: Long,
      remoteAsn: Long, remoteId: Long, ifAddr: Long, neighAddr: Long,
      mtId: Long = 0L) extends LsNlri
  /** IPv4 topology prefix NLRI (type 3): IP reachability TLV 265
    * ([mask:1][prefix bytes] — bgp_ls_nlri_tlv_ip_reach_handler). */
  final case class LsPrefix(protoId: Int, localAsn: Long, localId: Long,
      prefix: Long, plen: Int) extends LsNlri
  /** IPv6 topology prefix NLRI (type 4, BGP_LS_NLRI_V6_TOPO_PFX —
    * src/bgp/bgp_ls.h:40): same IP-reach TLV with up to 16 truncated
    * prefix bytes, address as two big-endian limbs. */
  final case class LsPrefix6(protoId: Int, localAsn: Long, localId: Long,
      hi: Long, lo: Long, plen: Int) extends LsNlri

  /** Decoded BGP-LS attribute (path attr 29) TLVs — the subset the
    * reference prints (bgp_ls_attr_tlv_print_list, src/bgp/
    * bgp_ls-data.h): node name 1026, admin group 1088, TE default
    * metric 1092, IGP metric 1095 (1/2/3-byte narrow/OSPF/wide forms),
    * prefix metric 1155. Metrics are exact integers end-to-end. */
  final case class LsAttr(nodeName: Option[String] = None,
      adminGroup: Option[Long] = None, teMetric: Option[Long] = None,
      igpMetric: Option[Long] = None, pfxMetric: Option[Long] = None)

  /** Extended community (RFC 4360; reference src/bgp/bgp_ecommunity.c
    * ecommunity_ecom2str): 8-byte [type][subtype][6-byte value] where
    * type 0x00 splits the value as AS2:val4, types 0x01/0x02 as
    * admin4:val2 (IPv4 / 4-octet-AS administrator). Subtype 0x02 is a
    * Route Target, 0x03 Site-of-Origin. */
  final case class ExtCommunity(tpe: Int, sub: Int, admin: Long,
      value: Long)

  /** RFC 8277 labeled-unicast NLRI entry (SAFI 4): one 3-byte label
    * section + host prefix. */
  final case class RouteLabeled(label: Long, prefix: Long, plen: Int)
  final case class RouteLabeled6(label: Long, hi: Long, lo: Long, plen: Int)

  /** RFC 4659 VPN-IPv6 NLRI entry (AFI 2 / SAFI 128): label + RD +
    * 128-bit prefix. */
  final case class RouteVpn6(label: Long, rdType: Int, rdAdmin: Long,
                             rdVal: Long, hi: Long, lo: Long, plen: Int)

  final case class Update(
      withdrawn: Seq[Route] = Nil,
      nlri: Seq[Route] = Nil,
      origin: Option[Int] = None,
      asPath: Seq[Long] = Nil,
      nextHop: Option[Long] = None,
      med: Option[Long] = None,
      localPref: Option[Long] = None,
      communities: Seq[Long] = Nil,
      nlri6: Seq[Route6] = Nil,
      withdrawn6: Seq[Route6] = Nil,
      nextHop6: Option[(Long, Long)] = None,
      // route reflection (RFC 4456; reference BGP_ATTR_ORIGINATOR_ID=9 /
      // BGP_ATTR_CLUSTER_LIST=10, src/bgp/bgp.h:55-56)
      originatorId: Option[Long] = None,
      clusterList: Seq[Long] = Nil,
      // RFC 8092 (BGP_ATTR_LARGE_COMMUNITIES=32, src/bgp/bgp.h:68,
      // parsed at src/bgp/bgp_msg.c:930): (global admin, local1, local2)
      largeCommunities: Seq[(Long, Long, Long)] = Nil,
      // RFC 4364 VPN-IPv4 (AFI 1 / SAFI 128) — label+RD+prefix NLRI in
      // MP_REACH/MP_UNREACH; next hop is a VPN-IPv4 address (RD 0 + IP)
      nlriVpn: Seq[RouteVpn] = Nil,
      withdrawnVpn: Seq[RouteVpn] = Nil,
      nextHopVpn: Option[Long] = None,
      // RFC 7311 AIGP (attr 26, TLV type 1 = 8-byte accumulated metric)
      // and RFC 8669 Prefix-SID (attr 40, TLV type 1 = label index) —
      // both exported by the reference's BGP metrics
      // (docs/BGP_BMP_METRICS.md: `aigp`, `psid_li`)
      aigp: Option[Long] = None,
      labelIndex: Option[Long] = None,
      // RFC 9234 Only-to-Customer (attr 35, 4-byte ASN) — rendered as
      // `otc` in the reference's BGP/BMP logs (docs/BGP_BMP_METRICS.md)
      otc: Option[Long] = None,
      // RFC 4360 extended communities (attr 16; reference
      // BGP_ATTR_EXT_COMMUNITIES, src/bgp/bgp_ecommunity.c)
      extCommunities: Seq[ExtCommunity] = Nil,
      // RFC 7752 BGP-LS: AFI 16388 / SAFI 71 NLRIs in MP_REACH/UNREACH
      // plus the LS attribute (29) — reference src/bgp/bgp_ls.c
      nlriLs: Seq[LsNlri] = Nil,
      withdrawnLs: Seq[LsNlri] = Nil,
      lsAttr: Option[LsAttr] = None,
      // RFC 8277 labeled unicast (SAFI 4, v4 + v6) and RFC 4659 VPN-IPv6
      // (AFI 2 / SAFI 128) — the remaining MP families a BMP feed from a
      // production router carries (reference bgp_msg.c:1281-1340 handles
      // all labeled safis through one path)
      nlriLab: Seq[RouteLabeled] = Nil,
      withdrawnLab: Seq[RouteLabeled] = Nil,
      nlriLab6: Seq[RouteLabeled6] = Nil,
      withdrawnLab6: Seq[RouteLabeled6] = Nil,
      nlriVpn6: Seq[RouteVpn6] = Nil,
      withdrawnVpn6: Seq[RouteVpn6] = Nil,
      // whether an MP_UNREACH attribute was present (End-of-RIB
      // detection requires it — an empty MP_REACH is NOT an EoR,
      // bgp_msg.c:804-826)
      mpUnreach: Boolean = false,
      // last MP_REACH/MP_UNREACH (afi, safi) seen — lets a collector
      // recognize an RFC 4724 End-of-RIB marker's lane (an empty
      // MP_UNREACH is otherwise indistinguishable from no MP attr)
      mpAfiSafi: Option[(Int, Int)] = None)

  // ---- encode --------------------------------------------------------

  private def prefixBytes(r: Route): Array[Byte] = {
    val n = (r.plen + 7) / 8
    (0 until n).map(i => ((r.prefix >>> (24 - 8 * i)) & 0xff).toByte).toArray
  }

  private def nlriBytes(routes: Seq[Route], addPath: Boolean): Array[Byte] = {
    val out = new mutable.ArrayBuilder.ofByte
    routes.foreach { r =>
      if (addPath) out ++= u32(r.pathId) // RFC 7911 §3: path id first
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

  private def u64(v: Long): Array[Byte] =
    (7 to 0 by -1).map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray

  /** v6 NLRI entry: plen byte + ceil(plen/8) prefix bytes (RFC 4760 §5,
    * same truncated-prefix encoding as v4). */
  private def prefixBytes6(r: Route6): Array[Byte] = {
    val n = (r.plen + 7) / 8
    val full = u64(r.hi) ++ u64(r.lo)
    Array(r.plen.toByte) ++ full.take(n)
  }

  /** VPN-IPv4 NLRI entry bytes: wire plen counts label+RD+prefix bits;
    * the label field is value<<4 | BOS (exp 0); withdraws carry the
    * 0x800000 compatibility label (RFC 3107 §3 / reference encode). */
  private def vpnBytes(r: RouteVpn, withdraw: Boolean): Array[Byte] = {
    val hostBytes = (r.plen + 7) / 8
    val out = new mutable.ArrayBuilder.ofByte
    out += (24 + 64 + r.plen).toByte
    val lbl = if (withdraw) 0x800000L else (r.label << 4) | 1L
    out += ((lbl >>> 16) & 0xff).toByte
    out += ((lbl >>> 8) & 0xff).toByte
    out += (lbl & 0xff).toByte
    out += ((r.rdType >>> 8) & 0xff).toByte
    out += (r.rdType & 0xff).toByte
    r.rdType match {
      case 0 => // 2-byte AS admin + 4-byte value
        out += ((r.rdAdmin >>> 8) & 0xff).toByte
        out += (r.rdAdmin & 0xff).toByte
        out ++= u32(r.rdVal)
      case _ => // types 1 (IP) and 2 (AS4): 4-byte admin + 2-byte value
        out ++= u32(r.rdAdmin)
        out += ((r.rdVal >>> 8) & 0xff).toByte
        out += (r.rdVal & 0xff).toByte
    }
    (0 until hostBytes).foreach(i =>
      out += ((r.prefix >>> (24 - 8 * i)) & 0xff).toByte)
    out.result()
  }

  /** One [type:2][len:2][value] TLV (RFC 7752 §3.1 framing, shared by
    * NLRI descriptors and the LS attribute). */
  private def lsTlv(t: Int, v: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(4 + v.length)
    b.putShort(t.toShort).putShort(v.length.toShort).put(v)
    b.array()
  }

  /** Node descriptor TLV (256 local / 257 remote) with AS (512) and
    * IGP router id (515, 4-byte form) sub-TLVs. */
  private def lsNodeDesc(t: Int, asn: Long, id: Long): Array[Byte] =
    lsTlv(t, lsTlv(512, u32(asn)) ++ lsTlv(515, u32(id)))

  /** BGP-LS NLRI entry bytes: [nlri-type:2][len:2][proto:1]
    * [identifier:8][descriptor TLVs] (RFC 7752 §3.2; identifier 0 =
    * default L3 topology, src/bgp/bgp_ls.h:51). */
  private def lsNlriBytes(n: LsNlri): Array[Byte] = {
    val body = new mutable.ArrayBuilder.ofByte
    body += n.protoId.toByte
    body ++= u64(0L) // identifier: default L3 topology
    val tpe = n match {
      case _: LsNode => body ++= lsNodeDesc(256, n.localAsn, n.localId); 1
      case l: LsLink =>
        body ++= lsNodeDesc(256, l.localAsn, l.localId)
        body ++= lsNodeDesc(257, l.remoteAsn, l.remoteId)
        body ++= lsTlv(259, u32(l.ifAddr))
        body ++= lsTlv(260, u32(l.neighAddr))
        if (l.mtId != 0L) // RFC 7752 §3.2.1.5: 2-byte MT-ID
          body ++= lsTlv(263, Array(((l.mtId >>> 8) & 0xff).toByte,
            (l.mtId & 0xff).toByte))
        2
      case p: LsPrefix =>
        body ++= lsNodeDesc(256, p.localAsn, p.localId)
        val pb = (0 until (p.plen + 7) / 8).map(i =>
          ((p.prefix >>> (24 - 8 * i)) & 0xff).toByte).toArray
        body ++= lsTlv(265, p.plen.toByte +: pb)
        3
      case p: LsPrefix6 =>
        body ++= lsNodeDesc(256, p.localAsn, p.localId)
        val full = u64(p.hi) ++ u64(p.lo)
        body ++= lsTlv(265, p.plen.toByte +: full.take((p.plen + 7) / 8))
        4
    }
    lsTlv(tpe, body.result())
  }

  /** MP_REACH/MP_UNREACH body for the LS AFI (16388/71). Reach bodies
    * carry a 4-byte IPv4 next hop, unreach none (RFC 4760). */
  private def lsMpBody(routes: Seq[LsNlri], nh: Option[Long])
      : Array[Byte] = {
    val b = new mutable.ArrayBuilder.ofByte
    b += 0x40.toByte; b += 0x04.toByte // AFI 16388: BGP-LS
    b += 71                            // SAFI 71: BGP-LS
    nh.foreach { v => b += 4; b ++= u32(v); b += 0 }
    routes.foreach(r => b ++= lsNlriBytes(r))
    b.result()
  }

  /** addPath=true emits RFC 7911 path ids on every NLRI/withdrawn entry
    * (only valid when the session negotiated capability 69 both ways). */
  def encode(u: Update, addPath: Boolean = false): Array[Byte] = {
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
    u.originatorId.foreach(o => attrs ++= attr(0x80, 9, u32(o)))
    if (u.clusterList.nonEmpty)
      attrs ++= attr(0x80, 10,
        u.clusterList.flatMap(c => u32(c).toSeq).toArray)
    if (u.largeCommunities.nonEmpty)
      attrs ++= attr(0xc0, 32, u.largeCommunities.flatMap {
        case (ga, l1, l2) => u32(ga) ++ u32(l1) ++ u32(l2)
      }.toArray)
    u.aigp.foreach { m => // RFC 7311 §3: TLV type 1, length 11, metric
      val b = ByteBuffer.allocate(11)
      b.put(1.toByte).putShort(11.toShort).put(u64(m))
      attrs ++= attr(0x80, 26, b.array())
    }
    u.labelIndex.foreach { li => // RFC 8669 §3.1: Label-Index TLV
      val b = ByteBuffer.allocate(10)
      b.put(1.toByte).putShort(10.toShort) // type, length (incl. header)
      b.put(0.toByte).putShort(0.toShort)  // reserved + flags
      b.put(u32(li))
      attrs ++= attr(0xc0, 40, b.array())
    }
    if (u.extCommunities.nonEmpty) // RFC 4360: 8-byte typed values
      attrs ++= attr(0xc0, 16, u.extCommunities.flatMap { e =>
        val v = e.tpe match {
          case 0 => // 2-byte AS admin + 4-byte value
            Array(((e.admin >>> 8) & 0xff).toByte,
              (e.admin & 0xff).toByte) ++ u32(e.value)
          case _ => // IPv4 (0x01) / AS4 (0x02): 4-byte admin + 2-byte
            u32(e.admin) ++ Array(((e.value >>> 8) & 0xff).toByte,
              (e.value & 0xff).toByte)
        }
        (e.tpe.toByte +: e.sub.toByte +: v).toSeq
      }.toArray)
    u.lsAttr.foreach { a => // RFC 7752 §3.3 LS attribute TLVs
      val b = new mutable.ArrayBuilder.ofByte
      a.nodeName.foreach(s => b ++= lsTlv(1026, s.getBytes("UTF-8")))
      a.adminGroup.foreach(g => b ++= lsTlv(1088, u32(g)))
      a.teMetric.foreach(m => b ++= lsTlv(1092, u32(m)))
      a.igpMetric.foreach { m => // 3-byte IS-IS wide form
        b ++= lsTlv(1095, Array(((m >>> 16) & 0xff).toByte,
          ((m >>> 8) & 0xff).toByte, (m & 0xff).toByte))
      }
      a.pfxMetric.foreach(m => b ++= lsTlv(1155, u32(m)))
      attrs ++= attr(0x80, 29, b.result())
    }
    if (u.nlriLs.nonEmpty)
      attrs ++= attr(0x80, 14,
        lsMpBody(u.nlriLs, Some(u.nextHop.getOrElse(0L))))
    if (u.withdrawnLs.nonEmpty)
      attrs ++= attr(0x80, 15, lsMpBody(u.withdrawnLs, None))
    // RFC 4760: IPv6 unicast rides MP_REACH_NLRI (14) / MP_UNREACH (15)
    if (u.nlri6.nonEmpty) {
      val b = new mutable.ArrayBuilder.ofByte
      b += 0; b += 2          // AFI 2: IPv6
      b += 1                  // SAFI 1: unicast
      b += 16                 // next-hop length
      val (nh, nl) = u.nextHop6.getOrElse((0L, 0L))
      b ++= u64(nh); b ++= u64(nl)
      b += 0                  // reserved (SNPA count in RFC 2858)
      u.nlri6.foreach(r => b ++= prefixBytes6(r))
      attrs ++= attr(0x80, 14, b.result())
    }
    if (u.withdrawn6.nonEmpty) {
      val b = new mutable.ArrayBuilder.ofByte
      b += 0; b += 2; b += 1
      u.withdrawn6.foreach(r => b ++= prefixBytes6(r))
      attrs ++= attr(0x80, 15, b.result())
    }
    // RFC 4364: VPN-IPv4 rides MP_REACH/MP_UNREACH with AFI 1 / SAFI 128
    if (u.nlriVpn.nonEmpty) {
      val b = new mutable.ArrayBuilder.ofByte
      b += 0; b += 1          // AFI 1: IPv4
      b += 128.toByte         // SAFI 128: MPLS-labeled VPN
      b += 12                 // next-hop length: 8-byte RD(0) + IPv4
      b ++= u64(0L)
      b ++= u32(u.nextHopVpn.getOrElse(0L))
      b += 0                  // reserved
      u.nlriVpn.foreach(r => b ++= vpnBytes(r, withdraw = false))
      attrs ++= attr(0x80, 14, b.result())
    }
    if (u.withdrawnVpn.nonEmpty) {
      val b = new mutable.ArrayBuilder.ofByte
      b += 0; b += 1; b += 128.toByte
      u.withdrawnVpn.foreach(r => b ++= vpnBytes(r, withdraw = true))
      attrs ++= attr(0x80, 15, b.result())
    }
    // RFC 4659 VPN-IPv6 (AFI 2 / SAFI 128) + RFC 8277 labeled unicast
    def rdBytes(rt: Int, ra: Long, rv: Long): Array[Byte] = {
      val b = ByteBuffer.allocate(8)
      b.putShort(rt.toShort)
      if (rt == 0) { b.putShort(ra.toShort); b.putInt(rv.toInt) }
      else { b.putInt(ra.toInt); b.putShort(rv.toShort) }
      b.array()
    }
    def labEntry(lbl: Long, rd: Option[Array[Byte]], pfx: Array[Byte],
                 bits: Int, withdraw: Boolean): Array[Byte] = {
      val out = new mutable.ArrayBuilder.ofByte
      out += (24 + rd.map(_ => 64).getOrElse(0) + bits).toByte
      val l = if (withdraw) 0x800000L else (lbl << 4) | 1L
      out += ((l >>> 16) & 0xff).toByte
      out += ((l >>> 8) & 0xff).toByte
      out += (l & 0xff).toByte
      rd.foreach(out ++= _)
      out ++= pfx.take((bits + 7) / 8)
      out.result()
    }
    if (u.nlriVpn6.nonEmpty || u.withdrawnVpn6.nonEmpty) {
      def entries(rs: Seq[RouteVpn6], wd: Boolean): Array[Byte] =
        rs.flatMap(r => labEntry(r.label,
          Some(rdBytes(r.rdType, r.rdAdmin, r.rdVal)),
          u64(r.hi) ++ u64(r.lo), r.plen, wd)).toArray
      if (u.nlriVpn6.nonEmpty) {
        val b = new mutable.ArrayBuilder.ofByte
        b += 0; b += 2; b += 128.toByte; b += 24
        b ++= u64(0L) // next-hop RD, zero
        val (nh, nl) = u.nextHop6.getOrElse((0L, 0L))
        b ++= u64(nh); b ++= u64(nl)
        b += 0
        b ++= entries(u.nlriVpn6, wd = false)
        attrs ++= attr(0x80, 14, b.result())
      }
      if (u.withdrawnVpn6.nonEmpty) {
        val b = new mutable.ArrayBuilder.ofByte
        b += 0; b += 2; b += 128.toByte
        b ++= entries(u.withdrawnVpn6, wd = true)
        attrs ++= attr(0x80, 15, b.result())
      }
    }
    if (u.nlriLab.nonEmpty) {
      val b = new mutable.ArrayBuilder.ofByte
      b += 0; b += 1; b += 4; b += 4
      b ++= u32(u.nextHop.getOrElse(0L)); b += 0
      u.nlriLab.foreach(r => b ++= labEntry(r.label, None,
        u32(r.prefix), r.plen, withdraw = false))
      attrs ++= attr(0x80, 14, b.result())
    }
    if (u.withdrawnLab.nonEmpty) {
      val b = new mutable.ArrayBuilder.ofByte
      b += 0; b += 1; b += 4
      u.withdrawnLab.foreach(r => b ++= labEntry(r.label, None,
        u32(r.prefix), r.plen, withdraw = true))
      attrs ++= attr(0x80, 15, b.result())
    }
    if (u.nlriLab6.nonEmpty) {
      val b = new mutable.ArrayBuilder.ofByte
      b += 0; b += 2; b += 4; b += 16
      val (nh, nl) = u.nextHop6.getOrElse((0L, 0L))
      b ++= u64(nh); b ++= u64(nl); b += 0
      u.nlriLab6.foreach(r => b ++= labEntry(r.label, None,
        u64(r.hi) ++ u64(r.lo), r.plen, withdraw = false))
      attrs ++= attr(0x80, 14, b.result())
    }
    if (u.withdrawnLab6.nonEmpty) {
      val b = new mutable.ArrayBuilder.ofByte
      b += 0; b += 2; b += 4
      u.withdrawnLab6.foreach(r => b ++= labEntry(r.label, None,
        u64(r.hi) ++ u64(r.lo), r.plen, withdraw = true))
      attrs ++= attr(0x80, 15, b.result())
    }
    val attrBytes = attrs.result()
    val wd = nlriBytes(u.withdrawn, addPath)
    val nl = nlriBytes(u.nlri, addPath)
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

  private def readRoutes(buf: ByteBuffer, end: Int,
                         addPath: Boolean): Seq[Route] = {
    val out = mutable.Buffer[Route]()
    while (buf.position() < end) {
      val pathId = if (addPath) buf.getInt() & 0xffffffffL else 0L
      val plen = buf.get() & 0xff
      val n = (plen + 7) / 8
      var p = 0L
      (0 until n).foreach(i => p |= (buf.get() & 0xffL) << (24 - 8 * i))
      out += Route(p, plen, pathId)
    }
    out.toSeq
  }

  /** Walk VPN-IPv4 NLRI entries (reference: bgp_msg.c:1281-1340): label
    * stack scanned to the bottom-of-stack bit on updates (withdraws
    * carry the 0x800000 compatibility label, no BOS semantics), then
    * RD by type, then the host prefix whose length is the wire length
    * minus label+RD bits. Malformed entries stop the walk. */
  private def readRoutesVpn(buf: ByteBuffer, end: Int,
                            withdraw: Boolean): Seq[RouteVpn] = {
    val out = mutable.Buffer[RouteVpn]()
    var bad = false
    while (!bad && buf.position() < end) {
      val wirePlen = buf.get() & 0xff
      val psize = (wirePlen + 7) / 8
      if (wirePlen > 120 || buf.position() + psize > end || psize < 11) {
        bad = true // 3 label + 8 RD minimum, like the reference's guards
      } else {
        val entryEnd = buf.position() + psize
        var label = 0L
        var labels = 0
        if (withdraw) {
          buf.get(); buf.get(); buf.get() // compatibility label
          labels = 1
        } else {
          var bos = false
          while (!bos && buf.position() + 3 <= entryEnd - 8) {
            val b0 = buf.get() & 0xffL
            val b1 = buf.get() & 0xffL
            val b2 = buf.get() & 0xffL
            labels += 1
            bos = (b2 & 1L) != 0
            if (bos) label = (b0 << 12) | (b1 << 4) | (b2 >>> 4)
          }
          if (!bos) bad = true
        }
        if (!bad) {
          val rdType = buf.getShort() & 0xffff
          val (rdAdmin, rdVal) = rdType match {
            case 0 =>
              ((buf.getShort() & 0xffffL, buf.getInt() & 0xffffffffL))
            case _ =>
              ((buf.getInt() & 0xffffffffL, buf.getShort() & 0xffffL))
          }
          val plen = wirePlen - 24 * labels - 64
          var p = 0L
          (0 until (plen + 7) / 8).foreach(i =>
            p |= (buf.get() & 0xffL) << (24 - 8 * i))
          out += RouteVpn(label, rdType, rdAdmin, rdVal, p, plen)
        }
      }
    }
    out.toSeq
  }

  /** Read an RD by wire type (2-byte type, then AS2:val4 / IP4:val2 /
    * AS4:val2 admin split — reference bgp_msg.c:1311-1335). */
  private def readRd(buf: ByteBuffer): (Int, Long, Long) = {
    val t = buf.getShort() & 0xffff
    t match {
      case 0 => (t, buf.getShort() & 0xffffL, buf.getInt() & 0xffffffffL)
      case _ => (t, buf.getInt() & 0xffffffffL, buf.getShort() & 0xffffL)
    }
  }

  /** Walk labeled NLRI entries (RFC 8277 SAFI 4 / RFC 4659 VPN-IPv6):
    * wire plen counts label(24) [+ RD(64)] + prefix bits; one 3-byte
    * label section, value in the top 20 bits. Returns
    * (label, rdTypeOrNeg1, rdAdmin, rdVal, hiOrPrefix, lo, hostPlen). */
  private def readLabeledEntries(buf: ByteBuffer, end: Int, v6: Boolean,
      hasRd: Boolean): Seq[(Long, Int, Long, Long, Long, Long, Int)] = {
    val out = mutable.Buffer[(Long, Int, Long, Long, Long, Long, Int)]()
    var bad = false
    while (!bad && buf.position() < end) {
      val wirePlen = buf.get() & 0xff
      val lbl = ((buf.get() & 0xffL) << 16) | ((buf.get() & 0xffL) << 8) |
        (buf.get() & 0xffL)
      var bits = wirePlen - 24
      val (rt, ra, rv) =
        if (hasRd) { bits -= 64; readRd(buf) } else (-1, 0L, 0L)
      val maxBytes = if (v6) 16 else 4
      if (bits < 0 || (bits + 7) / 8 > maxBytes) bad = true
      else {
        val n = (bits + 7) / 8
        val full = new Array[Byte](16)
        buf.get(full, 0, n)
        if (v6) {
          val hi = (0 until 8).foldLeft(0L)((a, i) =>
            (a << 8) | (full(i) & 0xffL))
          val lo = (8 until 16).foldLeft(0L)((a, i) =>
            (a << 8) | (full(i) & 0xffL))
          out += ((lbl >> 4, rt, ra, rv, hi, lo, bits))
        } else {
          var p = 0L
          (0 until n).foreach(i => p |= (full(i) & 0xffL) << (24 - 8 * i))
          out += ((lbl >> 4, rt, ra, rv, p, 0L, bits))
        }
      }
    }
    out.toSeq
  }

  private def readRoutes6(buf: ByteBuffer, end: Int): Seq[Route6] = {
    val out = mutable.Buffer[Route6]()
    while (buf.position() < end) {
      val plen = buf.get() & 0xff
      val n = (plen + 7) / 8
      val full = new Array[Byte](16)
      buf.get(full, 0, n)
      val hi = (0 until 8).foldLeft(0L)((a, i) =>
        (a << 8) | (full(i) & 0xffL))
      val lo = (8 until 16).foldLeft(0L)((a, i) =>
        (a << 8) | (full(i) & 0xffL))
      out += Route6(hi, lo, plen)
    }
    out.toSeq
  }

  /** Walk BGP-LS NLRIs (reference bgp_ls_nlri_parse, src/bgp/
    * bgp_ls.c:134-178): per entry read [type:2][len:2], proto byte,
    * skip the 8-byte identifier, then dispatch descriptor TLVs;
    * unknown TLVs are skipped by declared length (the reference logs
    * "Unknown TLV" and continues). Malformed entries stop the walk. */
  private[graft] def readLsNlris(buf: ByteBuffer, end: Int): Seq[LsNlri] = {
    val out = mutable.Buffer[LsNlri]()
    var bad = false
    while (!bad && buf.position() + 4 <= end) {
      val tpe = buf.getShort() & 0xffff
      val len = buf.getShort() & 0xffff
      val entryEnd = buf.position() + len
      if (entryEnd > end || len < 9) bad = true
      else {
        val proto = buf.get() & 0xff
        buf.position(buf.position() + 8) // identifier
        var lAsn, lId, rAsn, rId, ifA, nbA, pfx, mtId = 0L
        var p6hi, p6lo = 0L
        var plen = 0
        while (buf.position() + 4 <= entryEnd) {
          val t = buf.getShort() & 0xffff
          val l = buf.getShort() & 0xffff
          val tEnd = math.min(buf.position() + l, entryEnd)
          if (buf.position() + l > entryEnd) {
            // truncated TLV: skip what's left of the entry (the
            // reference logs "Malformed TLV" and bails — bgp_ls.c:166)
            buf.position(entryEnd)
          }
          else t match {
            case 256 | 257 => // node descriptor: walk sub-TLVs
              var asn, id = 0L
              while (buf.position() + 4 <= tEnd) {
                val st = buf.getShort() & 0xffff
                val sl = buf.getShort() & 0xffff
                val sEnd = buf.position() + sl
                st match {
                  case 512 if sl == 4 && sEnd <= tEnd =>
                    asn = buf.getInt() & 0xffffffffL
                  case 515 if sl == 4 && sEnd <= tEnd =>
                    id = buf.getInt() & 0xffffffffL
                  case _ => () // 513/514/517 etc (or truncated): skip
                }
                buf.position(math.min(math.max(sEnd, buf.position()), tEnd))
              }
              if (t == 256) { lAsn = asn; lId = id }
              else { rAsn = asn; rId = id }
            case 259 if l == 4 => ifA = buf.getInt() & 0xffffffffL
            case 260 if l == 4 => nbA = buf.getInt() & 0xffffffffL
            case 263 if l == 2 => mtId = buf.getShort() & 0xffffL
            case 265 if l >= 1 => // IP reachability: [mask:1][prefix]
              plen = buf.get() & 0xff
              // Cap like the reference (bgp_ls.c ip_reach handler): a v4
              // prefix is at most 4 bytes, v6 at most 16 — a crafted plen
              // beyond that would read past the fixed array (v6) or shift
              // negatively into garbage (v4). Reject the entry instead.
              if (1 + (plen + 7) / 8 > l ||
                  (plen + 7) / 8 > (if (tpe == 4) 16 else 4)) plen = 0
              else if (tpe == 4) { // v6: up to 16 bytes, two limbs
                val full = new Array[Byte](16)
                buf.get(full, 0, (plen + 7) / 8)
                p6hi = (0 until 8).foldLeft(0L)((a, i) =>
                  (a << 8) | (full(i) & 0xffL))
                p6lo = (8 until 16).foldLeft(0L)((a, i) =>
                  (a << 8) | (full(i) & 0xffL))
              } else (0 until (plen + 7) / 8).foreach(i =>
                pfx |= (buf.get() & 0xffL) << (24 - 8 * i))
            case _ => () // unknown descriptor: skip
          }
          buf.position(tEnd)
        }
        tpe match {
          case 1 => out += LsNode(proto, lAsn, lId)
          case 2 =>
            out += LsLink(proto, lAsn, lId, rAsn, rId, ifA, nbA, mtId)
          case 3 => out += LsPrefix(proto, lAsn, lId, pfx, plen)
          case 4 => out += LsPrefix6(proto, lAsn, lId, p6hi, p6lo, plen)
          case _ => () // beyond the reference's NLRI_MAX: skip
        }
        buf.position(entryEnd)
      }
    }
    out.toSeq
  }

  /** Decode one UPDATE starting at the buffer position; returns None for
    * non-UPDATE message types (position still advances past them).
    * `addPath` must match the session's negotiated capability — the wire
    * format is not self-describing (RFC 7911 §5). */
  def decodeOne(buf: ByteBuffer, addPath: Boolean = false,
                asn16: Boolean = false): Option[Update] = {
    (0 until 16).foreach { _ =>
      require((buf.get() & 0xff) == 0xff, "bad BGP marker")
    }
    val len = buf.getShort() & 0xffff
    val tp = buf.get() & 0xff
    val msgEnd = buf.position() + len - HeaderLen
    if (tp != TypeUpdate) { buf.position(msgEnd); return None }
    val wdLen = buf.getShort() & 0xffff
    val withdrawn = readRoutes(buf, buf.position() + wdLen, addPath)
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
          // `asn16`: an old-speaker session carries 2-byte ASNs in
          // AS_PATH. Segment lengths are VALIDATED against the attr
          // length first (aspath_parse, src/bgp/bgp_aspath.c): a
          // malformed attr yields a NULL aspath — rendered empty — not
          // a partial/garbled one.
          val asz = if (asn16) 2 else 4
          val path = mutable.Buffer[Long]()
          var ok = true
          var pos = buf.position()
          while (ok && pos < aEnd) {
            if (pos + 2 > aEnd) ok = false
            else {
              val n = buf.get(pos + 1) & 0xff
              pos += 2 + n * asz
              if (pos > aEnd) ok = false
            }
          }
          if (ok && pos == aEnd) {
            while (buf.position() < aEnd) {
              buf.get() // segment type (order preserved per segment)
              val n = buf.get() & 0xff
              (0 until n).foreach { _ =>
                path += (if (asn16) (buf.getShort() & 0xffffL)
                         else buf.getInt() & 0xffffffffL)
              }
            }
            u = u.copy(asPath = path.toSeq)
          }
        case 3 => u = u.copy(nextHop = Some(buf.getInt() & 0xffffffffL))
        case 4 => u = u.copy(med = Some(buf.getInt() & 0xffffffffL))
        case 5 => u = u.copy(localPref = Some(buf.getInt() & 0xffffffffL))
        case 8 =>
          val cs = mutable.Buffer[Long]()
          while (buf.position() < aEnd) cs += buf.getInt() & 0xffffffffL
          u = u.copy(communities = cs.toSeq)
        case 9 => u = u.copy(originatorId = Some(buf.getInt() & 0xffffffffL))
        case 10 =>
          val cl = mutable.Buffer[Long]()
          while (buf.position() < aEnd) cl += buf.getInt() & 0xffffffffL
          u = u.copy(clusterList = cl.toSeq)
        case 32 => // RFC 8092: 12-byte (global, local1, local2) triples
          val lc = mutable.Buffer[(Long, Long, Long)]()
          while (buf.position() + 12 <= aEnd)
            lc += ((buf.getInt() & 0xffffffffL, buf.getInt() & 0xffffffffL,
              buf.getInt() & 0xffffffffL))
          u = u.copy(largeCommunities = lc.toSeq)
        case 26 => // RFC 7311 AIGP: TLV walk, type 1 carries the metric
          while (buf.position() + 3 <= aEnd) {
            val t = buf.get() & 0xff
            val l = buf.getShort() & 0xffff
            if (t == 1 && l == 11 && buf.position() + 8 <= aEnd)
              u = u.copy(aigp = Some(buf.getLong()))
            else buf.position(math.min(aEnd, buf.position() + l - 3))
          }
        case 35 => // RFC 9234 Only-to-Customer: 4-byte ASN
          if (aEnd - buf.position() >= 4)
            u = u.copy(otc = Some(buf.getInt() & 0xffffffffL))
        case 40 => // RFC 8669 Prefix-SID: Label-Index TLV (type 1);
          // length seen both ways in the wild: 7 (RFC — excludes the
          // 3-byte TLV header) and 10 (header included)
          while (buf.position() + 3 <= aEnd) {
            val t = buf.get() & 0xff
            val l = buf.getShort() & 0xffff
            if (t == 1 && (l == 10 || l == 7) &&
                buf.position() + 7 <= aEnd) {
              buf.get(); buf.getShort() // reserved + flags
              u = u.copy(labelIndex = Some(buf.getInt() & 0xffffffffL))
            } else buf.position(math.min(aEnd, buf.position() + l - 3))
          }
        case 16 => // RFC 4360 extended communities: 8-byte values
          val es = mutable.Buffer[ExtCommunity]()
          while (buf.position() + 8 <= aEnd) {
            val t = buf.get() & 0xff
            val st = buf.get() & 0xff
            val (adm, v) =
              if (t == 0)
                ((buf.getShort() & 0xffffL, buf.getInt() & 0xffffffffL))
              else
                ((buf.getInt() & 0xffffffffL, buf.getShort() & 0xffffL))
            es += ExtCommunity(t, st, adm, v)
          }
          u = u.copy(extCommunities = es.toSeq)
        case 29 => // RFC 7752 §3.3 LS attribute TLVs
          var a = u.lsAttr.getOrElse(LsAttr())
          while (buf.position() + 4 <= aEnd) {
            val t = buf.getShort() & 0xffff
            val l = buf.getShort() & 0xffff
            val tEnd = math.min(buf.position() + l, aEnd)
            t match {
              case 1026 =>
                val s = new Array[Byte](tEnd - buf.position())
                buf.get(s)
                a = a.copy(nodeName = Some(new String(s, "UTF-8")))
              case 1088 if l == 4 && buf.position() + 4 <= tEnd =>
                a = a.copy(adminGroup = Some(buf.getInt() & 0xffffffffL))
              case 1092 if l == 4 && buf.position() + 4 <= tEnd =>
                a = a.copy(teMetric = Some(buf.getInt() & 0xffffffffL))
              case 1095 if l >= 1 && l <= 3 &&
                  buf.position() + l <= tEnd =>
                // 1/2/3-byte narrow/OSPF/wide forms, like the
                // reference's bgp_ls_attr_tlv_igp_metric_print
                var m = 0L
                (0 until l).foreach(_ => m = (m << 8) | (buf.get() & 0xffL))
                a = a.copy(igpMetric = Some(m))
              case 1155 if l == 4 && buf.position() + 4 <= tEnd =>
                a = a.copy(pfxMetric = Some(buf.getInt() & 0xffffffffL))
              case _ => () // max_bw and friends (or truncated): skip
            }
            buf.position(tEnd)
          }
          u = u.copy(lsAttr = Some(a))
        case 14 => // MP_REACH_NLRI (RFC 4760 §3)
          val afi = buf.getShort() & 0xffff
          val safi = buf.get() & 0xff
          val nhLen = buf.get() & 0xff
          if (afi == 16388 && safi == 71) {
            buf.position(buf.position() + nhLen + 1) // nh + reserved
            u = u.copy(nlriLs = readLsNlris(buf, aEnd))
          } else if (afi == 1 && safi == 1) {
            // v4 unicast carried in MP_REACH (RFC 4760 allows it; IOS XR
            // BMP feeds use this shape) — NH 4-byte v4 or 16-byte v6
            if (nhLen == 4)
              u = u.copy(nextHopVpn = Some(buf.getInt() & 0xffffffffL))
            else if (nhLen == 16)
              u = u.copy(nextHop6 = Some((buf.getLong(), buf.getLong())))
            else buf.position(buf.position() + nhLen)
            buf.get() // reserved
            u = u.copy(nlri = u.nlri ++ readRoutes(buf, aEnd, addPath))
          } else if (afi == 2 && safi == 1 && nhLen >= 16) {
            // 16-byte global next hop, optionally + 16-byte link-local
            // (RFC 2545 §3: nhLen 32 when both are sent)
            val nh = (buf.getLong(), buf.getLong())
            buf.position(buf.position() + (nhLen - 16) + 1) // ll + rsvd
            u = u.copy(nextHop6 = Some(nh),
              nlri6 = readRoutes6(buf, aEnd))
          } else if (afi == 1 && safi == 128) {
            // next hop forms seen in the wild: RD+IPv4 (12, RFC 4364
            // §4.3.2), bare IPv4 (4), RD+IPv6 (24, RFC 8950 extended
            // next hop). Extract the v4 when present, skip otherwise.
            if (nhLen == 12) {
              buf.getLong()
              u = u.copy(nextHopVpn = Some(buf.getInt() & 0xffffffffL))
            } else if (nhLen == 4) {
              u = u.copy(nextHopVpn = Some(buf.getInt() & 0xffffffffL))
            } else if (nhLen == 24 || nhLen == 16) {
              // RFC 8950: VPNv4 with a v6 next hop ([RD +] 16-byte v6)
              if (nhLen == 24) buf.getLong()
              u = u.copy(nextHop6 = Some((buf.getLong(), buf.getLong())))
            } else buf.position(buf.position() + nhLen)
            buf.get() // reserved
            u = u.copy(nlriVpn = readRoutesVpn(buf, aEnd,
              withdraw = false))
          } else if (afi == 2 && safi == 128 && nhLen >= 24) {
            // RFC 4659 §3.2.1.1: RD(8, zero) + 16-byte v6 next hop
            // (+ optional 16-byte link-local when nhLen is 40)
            buf.getLong()
            val nh = (buf.getLong(), buf.getLong())
            buf.position(buf.position() + (nhLen - 24) + 1) // ll + rsvd
            u = u.copy(nextHop6 = Some(nh),
              nlriVpn6 = readLabeledEntries(buf, aEnd, v6 = true,
                hasRd = true).map { case (l, rt, ra, rv, hi, lo, pl) =>
                  RouteVpn6(l, rt, ra, rv, hi, lo, pl) })
          } else if (afi == 1 && safi == 4) {
            // labeled-unicast v4 NH: 4-byte v4, or 16-byte v6 (RFC 8950)
            if (nhLen == 4)
              u = u.copy(nextHopVpn = Some(buf.getInt() & 0xffffffffL))
            else if (nhLen == 16)
              u = u.copy(nextHop6 = Some((buf.getLong(), buf.getLong())))
            else buf.position(buf.position() + nhLen)
            buf.get() // reserved
            u = u.copy(nlriLab = readLabeledEntries(buf, aEnd,
              v6 = false, hasRd = false).map {
                case (l, _, _, _, p, _, pl) => RouteLabeled(l, p, pl) })
          } else if (afi == 2 && safi == 4 && nhLen >= 16) {
            val nh = (buf.getLong(), buf.getLong())
            buf.position(buf.position() + (nhLen - 16) + 1)
            u = u.copy(nextHop6 = Some(nh),
              nlriLab6 = readLabeledEntries(buf, aEnd, v6 = true,
                hasRd = false).map { case (l, _, _, _, hi, lo, pl) =>
                  RouteLabeled6(l, hi, lo, pl) })
          } // other AFI/SAFI: skip by declared length (position(aEnd))
          u = u.copy(mpAfiSafi = Some((afi, safi)))
        case 15 => // MP_UNREACH_NLRI (RFC 4760 §4)
          val afi = buf.getShort() & 0xffff
          val safi = buf.get() & 0xff
          if (afi == 16388 && safi == 71)
            u = u.copy(withdrawnLs = readLsNlris(buf, aEnd))
          else if (afi == 1 && safi == 1)
            u = u.copy(withdrawn =
              u.withdrawn ++ readRoutes(buf, aEnd, addPath))
          else if (afi == 2 && safi == 1)
            u = u.copy(withdrawn6 = readRoutes6(buf, aEnd))
          else if (afi == 1 && safi == 128)
            u = u.copy(withdrawnVpn =
              readRoutesVpn(buf, aEnd, withdraw = true))
          else if (afi == 2 && safi == 128)
            u = u.copy(withdrawnVpn6 = readLabeledEntries(buf, aEnd,
              v6 = true, hasRd = true).map {
                case (l, rt, ra, rv, hi, lo, pl) =>
                  RouteVpn6(l, rt, ra, rv, hi, lo, pl) })
          else if (afi == 1 && safi == 4)
            u = u.copy(withdrawnLab = readLabeledEntries(buf, aEnd,
              v6 = false, hasRd = false).map {
                case (l, _, _, _, p, _, pl) => RouteLabeled(l, p, pl) })
          else if (afi == 2 && safi == 4)
            u = u.copy(withdrawnLab6 = readLabeledEntries(buf, aEnd,
              v6 = true, hasRd = false).map {
                case (l, _, _, _, hi, lo, pl) =>
                  RouteLabeled6(l, hi, lo, pl) })
          u = u.copy(mpAfiSafi = Some((afi, safi)), mpUnreach = true)
        case _ => () // unknown attribute: skip by declared length
      }
      buf.position(aEnd)
    }
    u = u.copy(nlri = u.nlri ++ readRoutes(buf, msgEnd, addPath))
    buf.position(msgEnd)
    Some(u)
  }

  /** Parse a contiguous session stream of BGP messages. */
  def decodeStream(bytes: Array[Byte],
                   addPath: Boolean = false): Seq[Update] = {
    val buf = ByteBuffer.wrap(bytes)
    val out = mutable.Buffer[Update]()
    var truncated = false
    while (!truncated && buf.remaining() >= HeaderLen) {
      // an incomplete trailing message (capture cut mid-message): a
      // live socket would keep it buffered — stop, never underflow
      val declared = ((bytes(buf.position() + 16) & 0xff) << 8) |
        (bytes(buf.position() + 17) & 0xff)
      if (buf.position() + declared > buf.limit()) truncated = true
      else decodeOne(buf, addPath).foreach(out += _)
    }
    out.toSeq
  }

  // ---- full message surface (OPEN / KEEPALIVE / NOTIFICATION) --------

  final case class Open(asn: Long, holdTime: Int, bgpId: Long,
                        fourOctetAs: Boolean = true,
                        addPath: Boolean = false)

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
    * carries AS_TRANS when the real ASN needs 4 octets. With
    * `o.addPath`, also advertises ADD-PATH (RFC 7911 capability 69) for
    * IPv4 unicast, send/receive both. */
  def encodeOpen(o: Open): Array[Byte] = {
    val capBody = new mutable.ArrayBuilder.ofByte
    if (o.fourOctetAs) {
      capBody += 65.toByte; capBody += 4.toByte    // cap 65: 4-octet AS
      capBody ++= u32(o.asn)
    }
    if (o.addPath) {
      capBody += 69.toByte; capBody += 4.toByte    // cap 69: ADD-PATH
      capBody += 0.toByte; capBody += 1.toByte     // AFI 1 (IPv4)
      capBody += 1.toByte                          // SAFI 1 (unicast)
      capBody += 3.toByte                          // send/receive = both
    }
    val caps = {
      val body = capBody.result()
      if (body.isEmpty) Array.emptyByteArray
      else {
        val c = ByteBuffer.allocate(2 + body.length)
        c.put(2.toByte)               // param type: capabilities
        c.put(body.length.toByte)     // param length
        c.put(body)
        c.array()
      }
    }
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

  /** Decode one message of ANY type at the buffer position. `addPath`
    * reflects the session's negotiated state (affects UPDATE NLRI). */
  def decodeMessage(buf: ByteBuffer, addPath: Boolean = false): Message = {
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
        var addPath = false
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
              } else if (cap == 69 && clen >= 4) {
                // any (AFI 1, SAFI 1) tuple with receive or send bit set
                val capEnd = buf.position() + clen
                while (buf.position() + 4 <= capEnd) {
                  val afi = buf.getShort() & 0xffff
                  val safi = buf.get() & 0xff
                  val sr = buf.get() & 0xff
                  if (afi == 1 && safi == 1 && (sr & 3) != 0) addPath = true
                }
                buf.position(capEnd)
              } else buf.position(buf.position() + clen)
            }
          }
          buf.position(pEnd)
        }
        OpenMsg(Open(asn, hold, bgpId, four, addPath))
      case 2 =>
        buf.position(start)
        UpdateMsg(decodeOne(buf, addPath).get)
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
final class BgpFsm(myAs: Long, myBgpId: Long, holdTime: Int = 90,
                   myAddPath: Boolean = false) {
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
  /** ADD-PATH in effect iff BOTH sides advertised capability 69 for the
    * AFI/SAFI (RFC 7911 §4) — governs the NLRI wire shape of UPDATEs. */
  def addPathNegotiated: Boolean =
    myAddPath && peerOpen.exists(_.addPath)

  val toSend = mutable.Buffer[Array[Byte]]()
  val delivered = mutable.Buffer[Update]()
  var sessionDrops = 0

  /** TCP accept: collector sends its OPEN. */
  def start(nowSec: Long): Unit = {
    lastSeen = nowSec
    toSend += encodeOpen(Open(myAs, holdTime, myBgpId,
      addPath = myAddPath))
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
