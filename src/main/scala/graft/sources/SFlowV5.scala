package graft.sources

import java.nio.ByteBuffer
import scala.collection.mutable

/** sFlow v5 codec (public format, sflow.org spec; reference ingest path
  * `src/sfacctd.c` / `src/sfv5_module.c`) — the flow-sample subset the
  * accounting pipeline consumes: per-sample sampling metadata
  * (rate/pool/drops, in/out interface) plus the raw-header record's frame
  * length. sFlow's defining semantic — counters renormalized by the
  * sampling rate at ingest (`renormalization`, SURVEY §2.1) — happens in
  * the query, not the codec.
  *
  * Layout encoded/decoded here (big-endian, XDR-style 4-byte units):
  * datagram: version=5, agent addr (type=1 + IPv4), sub_agent_id, seq,
  * uptime, n_samples, then samples. Flow sample: tag=1, length, seq,
  * source_id, rate, pool, drops, input, output, n_records; raw-header
  * record: tag=1, length, header_protocol, frame_length, stripped,
  * header_len, header bytes (padded to 4).
  */
final case class SFlowSample(
    seq: Long, sourceId: Long, rate: Long, pool: Long, drops: Long,
    ifIn: Long, ifOut: Long, headerProtocol: Long, frameLength: Long,
    header: Seq[Byte], gateway: Option[SFlowGateway] = None,
    // pmacct enterprise records (sflow.h:294-297, enterprise 43874):
    // EX_TAG = (43874<<12)+2 carries tag + tag2 as two u64s
    // (readExtendedTag, sflow.c:832-836); EX_CLASS2 = (43874<<12)+3
    // carries the nDPI master/app protocol pair as two u32s
    // (readExtendedClass2, sflow.c:821-830).
    tagRec: Option[(Long, Long)] = None,
    class2: Option[(Long, Long)] = None)

/** Extended gateway record (flow record tag 1003): the BGP attributes a
  * router exports inline with the packet sample — pmacct's sfacctd gets
  * peer/origin AS data from this record instead of a BGP session
  * (`src/sfv5_module.c` extended-gateway handling). Path is one
  * AS_SEQUENCE segment; origin AS = last hop. */
final case class SFlowGateway(
    nextHop: Long, routerAs: Long, srcAs: Long, srcPeerAs: Long,
    dstAsPath: Seq[Long], communities: Seq[Long], localPref: Long)

/** Generic interface counters record (counter sample, tag 2 / record
  * tag 1): the periodic SNMP-style stats sFlow exports besides packet
  * samples. */
final case class SFlowIfCounters(
    seq: Long, sourceId: Long, ifIndex: Long, ifSpeed: Long,
    ifInOctets: Long, ifInPkts: Long, ifOutOctets: Long, ifOutPkts: Long)

final case class SFlowDatagram(
    agentIp: Long, subAgentId: Long, seq: Long, uptimeMs: Long,
    samples: Seq[SFlowSample],
    counters: Seq[SFlowIfCounters] = Seq.empty)

/** sFlow v2/v4 legacy flow sample (`readv2v4FlowSample`,
  * `src/sfacctd.c:2816`): the INMPACKETTYPE_IPV4 variant carries the
  * DECODED IP tuple on the wire (SFLSampled_ipv4, `src/sflow.h:76-86`)
  * instead of v5's raw header bytes, plus the optional extended-switch
  * record's VLANs (INMEXTENDED_SWITCH, `src/sfacctd.h:45`). */
final case class SFlowV2V4Sample(
    seq: Long, sourceId: Long, rate: Long, pool: Long, drops: Long,
    ifIn: Long, ifOut: Long, frameLength: Long, proto: Long,
    srcIp: Long, dstIp: Long, srcPort: Long, dstPort: Long,
    tcpFlags: Long, tos: Long, inVlan: Long = 0L, outVlan: Long = 0L)

final case class SFlowV2V4Datagram(
    version: Long, agentIp: Long, seq: Long, uptimeMs: Long,
    samples: Seq[SFlowV2V4Sample], counters: Seq[SFlowIfCounters])

object SFlowV5 {

  def encode(d: SFlowDatagram): Array[Byte] = {
    val sampleBufs = d.samples.map { s =>
      val hdrPad = (4 - s.header.size % 4) % 4
      val recLen = 16 + s.header.size + hdrPad
      // extended gateway record (tag 1003), when present
      val gwLen = s.gateway.map(g =>
        4 + 4 + 12 + 4 + 8 + 4 * g.dstAsPath.size +
          4 + 4 * g.communities.size + 4).getOrElse(0)
      val tagLen = if (s.tagRec.isDefined) 16 else 0   // two u64s
      val cl2Len = if (s.class2.isDefined) 8 else 0    // two u32s
      val nRecs = 1 + s.gateway.size + s.tagRec.size + s.class2.size
      val sampLen = 32 + 8 + recLen +
        (if (gwLen > 0) 8 + gwLen else 0) +
        (if (tagLen > 0) 8 + tagLen else 0) +
        (if (cl2Len > 0) 8 + cl2Len else 0)
      val b = ByteBuffer.allocate(8 + sampLen)
      b.putInt(1) // flow sample tag
      b.putInt(sampLen)
      b.putInt(s.seq.toInt)
      b.putInt(s.sourceId.toInt)
      b.putInt(s.rate.toInt)
      b.putInt(s.pool.toInt)
      b.putInt(s.drops.toInt)
      b.putInt(s.ifIn.toInt)
      b.putInt(s.ifOut.toInt)
      b.putInt(nRecs)
      b.putInt(1) // raw packet header record tag
      b.putInt(recLen)
      b.putInt(s.headerProtocol.toInt)
      b.putInt(s.frameLength.toInt)
      b.putInt(0) // stripped
      b.putInt(s.header.size)
      s.header.foreach(b.put)
      (0 until hdrPad).foreach(_ => b.put(0.toByte))
      s.gateway.foreach { g =>
        b.putInt(1003) // extended gateway record tag
        b.putInt(gwLen)
        b.putInt(1) // next-hop address type: IPv4
        b.putInt(g.nextHop.toInt)
        b.putInt(g.routerAs.toInt)
        b.putInt(g.srcAs.toInt)
        b.putInt(g.srcPeerAs.toInt)
        b.putInt(1) // one AS-path segment
        b.putInt(2) // AS_SEQUENCE
        b.putInt(g.dstAsPath.size)
        g.dstAsPath.foreach(a => b.putInt(a.toInt))
        b.putInt(g.communities.size)
        g.communities.foreach(c => b.putInt(c.toInt))
        b.putInt(g.localPref.toInt)
      }
      s.tagRec.foreach { case (t1, t2) =>
        b.putInt(((43874L << 12) + 2).toInt) // pmacct EX_TAG
        b.putInt(16)
        b.putLong(t1)
        b.putLong(t2)
      }
      s.class2.foreach { case (master, app) =>
        b.putInt(((43874L << 12) + 3).toInt) // pmacct EX_CLASS2
        b.putInt(8)
        b.putInt(master.toInt)
        b.putInt(app.toInt)
      }
      b.array()
    }
    val counterBufs = d.counters.map { c =>
      // counter sample: tag 2, one generic-if-counters record (tag 1).
      // Wire layout here keeps the 8 fields as 4-byte words (the full
      // spec's 64-bit octet counters collapse to 32-bit in this subset).
      val recLen = 8 * 4
      val sampLen = 12 + 8 + recLen
      val b = ByteBuffer.allocate(8 + sampLen)
      b.putInt(2) // counter sample tag
      b.putInt(sampLen)
      b.putInt(c.seq.toInt)
      b.putInt(c.sourceId.toInt)
      b.putInt(1) // n_records
      b.putInt(1) // generic interface counters record tag
      b.putInt(recLen)
      Seq(c.ifIndex, c.ifSpeed, c.ifInOctets, c.ifInPkts,
        c.ifOutOctets, c.ifOutPkts, 0L, 0L).foreach(v => b.putInt(v.toInt))
      b.array()
    }
    val bodies = sampleBufs ++ counterBufs
    val buf = ByteBuffer.allocate(28 + bodies.map(_.length).sum)
    buf.putInt(5) // version
    buf.putInt(1) // agent address type: IPv4
    buf.putInt(d.agentIp.toInt)
    buf.putInt(d.subAgentId.toInt)
    buf.putInt(d.seq.toInt)
    buf.putInt(d.uptimeMs.toInt)
    buf.putInt(bodies.size)
    bodies.foreach(buf.put)
    buf.array()
  }

  /** Decode one datagram. NEVER throws: a malformed or truncated
    * datagram yields what was decodable before the damage (the
    * reference length-checks and drops, `src/sfacctd.c` sample bounds;
    * one bad packet must not fail a collector task). */
  def decode(datagram: Array[Byte]): SFlowDatagram = {
    val empty = SFlowDatagram(0L, 0L, 0L, 0L, Nil, Nil)
    if (datagram.length < 28) return empty
    val buf = ByteBuffer.wrap(datagram)
    def u32(): Long = buf.getInt() & 0xffffffffL
    val version = u32()
    if (version != 5) return empty
    val addrType = u32()
    if (addrType != 1) return empty // only IPv4 agents supported
    val agentIp = u32()
    val subAgent = u32()
    val seq = u32()
    val uptime = u32()
    val nSamples = u32().toInt
    val samples = mutable.Buffer[SFlowSample]()
    val counters = mutable.Buffer[SFlowIfCounters]()
    try (0 until nSamples).foreach { _ =>
      val tag = u32()
      val len = u32().toInt
      val end = buf.position() + len
      if (tag == 2) { // counter sample
        val (cseq, src) = (u32(), u32())
        val nRecs = u32().toInt
        (0 until nRecs).foreach { _ =>
          val rtag = u32()
          val rlen = u32().toInt
          val rend = buf.position() + rlen
          if (rtag == 1) {
            val vals = (0 until 8).map(_ => u32())
            counters += SFlowIfCounters(cseq, src, vals(0), vals(1),
              vals(2), vals(3), vals(4), vals(5))
          }
          buf.position(rend)
        }
      } else if (tag == 1) { // flow sample; other sample types skipped
        val (sseq, src, rate, pool, drops) = (u32(), u32(), u32(), u32(), u32())
        val (iin, iout) = (u32(), u32())
        val nRecs = u32().toInt
        var sample: Option[SFlowSample] = None
        var gateway: Option[SFlowGateway] = None
        var tagRec: Option[(Long, Long)] = None
        var class2: Option[(Long, Long)] = None
        (0 until nRecs).foreach { _ =>
          val rtag = u32()
          val rlen = u32().toInt
          val rend = buf.position() + rlen
          if (rtag == 1 && sample.isEmpty) {
            val proto = u32()
            val frameLen = u32()
            u32() // stripped
            val hdrLen = u32().toInt
            // crafted length: cap the allocation at what the buffer
            // holds before allocating (no multi-GB Array from 4 bytes)
            if (hdrLen < 0 || hdrLen > buf.remaining())
              throw new java.nio.BufferUnderflowException
            val hdr = new Array[Byte](hdrLen)
            buf.get(hdr)
            sample = Some(SFlowSample(sseq, src, rate, pool, drops,
              iin, iout, proto, frameLen, hdr.toSeq))
          } else if (rtag == 1003 && gateway.isEmpty) {
            val addrType = u32()
            val nextHop = if (addrType == 1) u32() else { // IPv6: 16 bytes
              val v6 = new Array[Byte](16); buf.get(v6); 0L
            }
            val (ras, sas, spas) = (u32(), u32(), u32())
            val nSegs = u32().toInt
            val path = mutable.Buffer[Long]()
            (0 until nSegs).foreach { _ =>
              u32() // segment type (order preserved per segment)
              val n = u32().toInt
              (0 until n).foreach(_ => path += u32())
            }
            val nComm = u32().toInt
            val comms = (0 until nComm).map(_ => u32())
            val lp = u32()
            gateway = Some(SFlowGateway(nextHop, ras, sas, spas,
              path.toSeq, comms, lp))
          } else if (rtag == (43874L << 12) + 2 && tagRec.isEmpty) {
            tagRec = Some((buf.getLong(), buf.getLong()))
          } else if (rtag == (43874L << 12) + 3 && class2.isEmpty) {
            class2 = Some((u32(), u32()))
          }
          buf.position(rend)
        }
        samples ++= sample.map(_.copy(gateway = gateway,
          tagRec = tagRec, class2 = class2))
      }
      buf.position(end)
    } catch {
      // truncated mid-sample (or a crafted length running past the
      // buffer): keep the samples decoded before the damage
      case _: java.nio.BufferUnderflowException => ()
      case _: IllegalArgumentException => ()
    }
    SFlowDatagram(agentIp, subAgent, seq, uptime, samples.toSeq,
      counters.toSeq)
  }

  // ---- sFlow v2/v4 (legacy) ------------------------------------------
  //
  // The structural difference from v5: samples and records carry NO
  // length fields — the stream is walked field by field, which is why the
  // reference ABORTS the whole packet on an unknown sample or extended
  // tag (`process_SFv2v4_packet`, `src/sfacctd.c:1494-1538`; "unexpected
  // sampleType; aborting packet"). This decoder mirrors that: unknown
  // tags stop the walk and return what was decoded so far.

  /** Encode a v2/v4 datagram: preamble has NO sub-agent id
    * (`spp->agentSubId = 0`, `src/sfacctd.c:1500`); flow samples use
    * INMPACKETTYPE_IPV4 with the 8-word SFLSampled_ipv4 tuple, followed
    * by one extended-switch record; counter samples carry the 88-byte
    * generic block (`readv2v4CountersSample`, `src/sfacctd.c:3027`). */
  def encodeV2V4(d: SFlowV2V4Datagram): Array[Byte] = {
    require(d.version == 2 || d.version == 4, s"bad v2/v4 version ${d.version}")
    val bodies = d.samples.map { s =>
      val b = ByteBuffer.allocate(4 + 32 + 32 + 4 + 4 + 16)
      b.putInt(1) // SFLFLOW_SAMPLE
      b.putInt(s.seq.toInt)
      b.putInt(s.sourceId.toInt)
      b.putInt(s.rate.toInt)       // meanSkipCount
      b.putInt(s.pool.toInt)
      b.putInt(s.drops.toInt)
      b.putInt(s.ifIn.toInt)
      b.putInt(s.ifOut.toInt)
      b.putInt(2) // packet_data_tag = INMPACKETTYPE_IPV4
      b.putInt(s.frameLength.toInt)
      b.putInt(s.proto.toInt)
      b.putInt(s.srcIp.toInt)
      b.putInt(s.dstIp.toInt)
      b.putInt(s.srcPort.toInt)
      b.putInt(s.dstPort.toInt)
      b.putInt(s.tcpFlags.toInt)
      b.putInt(s.tos.toInt)
      b.putInt(1) // num_extended
      b.putInt(1) // INMEXTENDED_SWITCH
      b.putInt(s.inVlan.toInt)
      b.putInt(0) // in priority
      b.putInt(s.outVlan.toInt)
      b.putInt(0) // out priority
      b.array()
    } ++ d.counters.map { c =>
      val b = ByteBuffer.allocate(4 + 16 + 88)
      b.putInt(2) // SFLCOUNTERS_SAMPLE
      b.putInt(c.seq.toInt)
      b.putInt(c.sourceId.toInt)
      b.putInt(0)  // statsSamplingInterval
      b.putInt(1)  // counterBlockVersion = INMCOUNTERSVERSION_GENERIC
      b.putInt(c.ifIndex.toInt)
      b.putInt(6)  // networkType: ethernetCsmacd
      b.putLong(c.ifSpeed)
      b.putInt(1)  // ifDirection
      b.putInt(3)  // ifStatus: up/up
      b.putLong(c.ifInOctets)
      b.putInt(c.ifInPkts.toInt)
      (0 until 5).foreach(_ => b.putInt(0)) // mcast/bcast/discard/err/unk
      b.putLong(c.ifOutOctets)
      b.putInt(c.ifOutPkts.toInt)
      (0 until 5).foreach(_ => b.putInt(0)) // mcast/bcast/discard/err/prom
      b.array()
    }
    val buf = ByteBuffer.allocate(24 + bodies.map(_.length).sum)
    buf.putInt(d.version.toInt)
    buf.putInt(1) // agent address type: IPv4
    buf.putInt(d.agentIp.toInt)
    buf.putInt(d.seq.toInt)
    buf.putInt(d.uptimeMs.toInt)
    buf.putInt(bodies.size)
    bodies.foreach(buf.put)
    buf.array()
  }

  /** Decode one legacy datagram. NEVER throws — truncation mid-walk
    * keeps what was decoded (the reference aborts the packet, not the
    * collector, `src/sfacctd.c:1494-1538`). */
  def decodeV2V4(datagram: Array[Byte]): SFlowV2V4Datagram = {
    val empty = SFlowV2V4Datagram(0L, 0L, 0L, 0L, Nil, Nil)
    if (datagram.length < 24) return empty
    val buf = ByteBuffer.wrap(datagram)
    def u32(): Long = buf.getInt() & 0xffffffffL
    def u64(): Long = buf.getLong()
    val version = u32()
    if (version != 2 && version != 4) return empty
    val addrType = u32()
    if (addrType != 1) return empty // only IPv4 agents supported
    val agentIp = u32()
    val seq = u32()
    val uptime = u32()
    val nSamples = u32().toInt
    val samples = mutable.Buffer[SFlowV2V4Sample]()
    val counters = mutable.Buffer[SFlowIfCounters]()
    var idx = 0
    var aborted = false
    try while (idx < nSamples && !aborted && buf.remaining() >= 4) {
      u32() match {
        case 1L => // flow sample
          val (sseq, src, rate, pool, drops) =
            (u32(), u32(), u32(), u32(), u32())
          val (iin, iout) = (u32(), u32())
          u32() match {
            case 2L => // INMPACKETTYPE_IPV4
              val vals = (0 until 8).map(_ => u32())
              var (inVlan, outVlan) = (0L, 0L)
              val nExt = u32().toInt
              var e = 0
              while (e < nExt && !aborted) {
                u32() match {
                  case 1L => // INMEXTENDED_SWITCH
                    inVlan = u32(); u32(); outVlan = u32(); u32()
                  case 2L => // INMEXTENDED_ROUTER: nexthop + 2 words
                    val at = u32()
                    if (at == 1) u32() else buf.position(buf.position() + 16)
                    u32(); u32()
                  case _ => aborted = true // no length field: cannot skip
                }
                e += 1
              }
              if (!aborted) samples += SFlowV2V4Sample(sseq, src, rate,
                pool, drops, iin, iout, vals(0), vals(1), vals(2), vals(3),
                vals(4), vals(5), vals(6), vals(7), inVlan, outVlan)
            case _ => aborted = true // HEADER/IPV6 variants not generated
          }
        case 2L => // counter sample
          val (cseq, csrc) = (u32(), u32())
          u32() // statsSamplingInterval
          u32() match {
            case 1L => // generic block
              val ifIndex = u32(); u32()
              val ifSpeed = u64(); u32(); u32()
              val inOct = u64(); val inPkts = u32()
              (0 until 5).foreach(_ => u32())
              val outOct = u64(); val outPkts = u32()
              (0 until 5).foreach(_ => u32())
              counters += SFlowIfCounters(cseq, csrc, ifIndex, ifSpeed,
                inOct, inPkts, outOct, outPkts)
            case _ => aborted = true
          }
        case _ => aborted = true // unexpected sampleType; abort packet
      }
      idx += 1
    } catch {
      // truncated mid-sample: abort the packet, keep earlier samples
      case _: java.nio.BufferUnderflowException => ()
      case _: IllegalArgumentException => ()
    }
    SFlowV2V4Datagram(version, agentIp, seq, uptime, samples.toSeq,
      counters.toSeq)
  }
}
