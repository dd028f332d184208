package graft.sources

import java.nio.ByteBuffer

/** One decoded NetFlow v5 flow record (48-byte wire layout; public format,
  * cf. the reference's v5 ingest path `src/nfacctd.c` version demux).
  * 32-bit unsigned wire fields widen to Long, 16-bit to Int. */
final case class V5Record(
    srcAddr: Long, dstAddr: Long, nextHop: Long,
    ifIn: Int, ifOut: Int,
    packets: Long, octets: Long,
    firstMs: Long, lastMs: Long,
    srcPort: Int, dstPort: Int,
    tcpFlags: Int, proto: Int, tos: Int,
    srcAs: Int, dstAs: Int, srcMask: Int, dstMask: Int)

/** Decoded v5 datagram header. */
final case class V5Header(
    version: Int, count: Int, sysUptimeMs: Long, unixSecs: Long,
    unixNsecs: Long, flowSequence: Long, engineType: Int, engineId: Int,
    samplingInterval: Int)

/** NetFlow v5 wire codec — the binary leg of the collector source and of
  * the nfprobe-style exporter sink (SURVEY §2.1/§2.2). Stateless v5 needs
  * no template cache; the v9/IPFIX path layers template state on the same
  * per-datagram decode (see SURVEY §2.10 "template state").
  *
  * Big-endian, header 24 B + n×48 B records. Encode/decode are exact
  * inverses for in-range values (round-trip property in ProtocolSpec).
  */
object NetFlowV5 {
  val HeaderLen = 24
  val RecordLen = 48
  val MaxRecords = 30 // v5 convention: <= 30 records per datagram

  def encode(h: V5Header, records: Seq[V5Record]): Array[Byte] = {
    require(records.size <= MaxRecords, s"v5 datagram > $MaxRecords records")
    val buf = ByteBuffer.allocate(HeaderLen + records.size * RecordLen)
    buf.putShort(h.version.toShort)
    buf.putShort(records.size.toShort)
    buf.putInt(h.sysUptimeMs.toInt)
    buf.putInt(h.unixSecs.toInt)
    buf.putInt(h.unixNsecs.toInt)
    buf.putInt(h.flowSequence.toInt)
    buf.put(h.engineType.toByte)
    buf.put(h.engineId.toByte)
    buf.putShort(h.samplingInterval.toShort)
    records.foreach { r =>
      buf.putInt(r.srcAddr.toInt); buf.putInt(r.dstAddr.toInt)
      buf.putInt(r.nextHop.toInt)
      buf.putShort(r.ifIn.toShort); buf.putShort(r.ifOut.toShort)
      buf.putInt(r.packets.toInt); buf.putInt(r.octets.toInt)
      buf.putInt(r.firstMs.toInt); buf.putInt(r.lastMs.toInt)
      buf.putShort(r.srcPort.toShort); buf.putShort(r.dstPort.toShort)
      buf.put(0.toByte) // pad1
      buf.put(r.tcpFlags.toByte); buf.put(r.proto.toByte)
      buf.put(r.tos.toByte)
      buf.putShort(r.srcAs.toShort); buf.putShort(r.dstAs.toShort)
      buf.put(r.srcMask.toByte); buf.put(r.dstMask.toByte)
      buf.putShort(0.toShort) // pad2
    }
    buf.array()
  }

  /** Decode one datagram. NEVER throws: a collector drops a malformed
    * datagram and keeps running (the reference length-checks and skips,
    * `src/nfacctd.c` process_v5_packet len guard) — a short header or
    * wrong version yields an empty result, a short body yields the
    * records that fit. */
  def decode(datagram: Array[Byte]): (V5Header, Seq[V5Record]) = {
    val empty = (V5Header(0, 0, 0L, 0L, 0L, 0L, 0, 0, 0), Nil)
    if (datagram.length < HeaderLen) return empty
    val buf = ByteBuffer.wrap(datagram)
    def u8(): Int = buf.get() & 0xff
    def u16(): Int = buf.getShort() & 0xffff
    def u32(): Long = buf.getInt() & 0xffffffffL
    val h = V5Header(u16(), u16(), u32(), u32(), u32(), u32(),
      u8(), u8(), u16())
    if (h.version != 5) return empty
    val fit = math.min(h.count, (datagram.length - HeaderLen) / RecordLen)
    val recs = (0 until fit).map { _ =>
      val (sa, da, nh) = (u32(), u32(), u32())
      val (iin, iout) = (u16(), u16())
      val (pk, oc, fi, la) = (u32(), u32(), u32(), u32())
      val (sp, dp) = (u16(), u16())
      u8() // pad1
      val (fl, pr, tos) = (u8(), u8(), u8())
      val (sas, das, sm, dm) = (u16(), u16(), u8(), u8())
      u16() // pad2
      V5Record(sa, da, nh, iin, iout, pk, oc, fi, la, sp, dp,
        fl, pr, tos, sas, das, sm, dm)
    }
    (h, recs)
  }
}
