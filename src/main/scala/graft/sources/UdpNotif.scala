package graft.sources

import java.nio.ByteBuffer
import scala.collection.mutable

/** YANG UDP-notif transport envelope (draft-ietf-netconf-udp-notif; the
  * fourth telemetry decoder in `src/telemetry/telemetry.h:49-53` next to
  * JSON, GPB and the v1 envelope).
  *
  * Header (public draft layout): byte 0 = version(3 bits) | S(1) |
  * media-type(4); byte 1 = header length; bytes 2-3 = message length;
  * bytes 4-7 = observation-domain id; bytes 8-11 = message id; then
  * options TLVs up to header length, then the payload (YANG JSON/CBOR).
  */
object UdpNotif {
  val BaseHeaderLen = 12
  val MediaJson = 1

  final case class Packet(observationDomain: Long, messageId: Long,
                          mediaType: Int, payload: Array[Byte],
                          options: Seq[(Int, Array[Byte])] = Nil)

  def encode(p: Packet): Array[Byte] = {
    val optBytes = p.options.map(o => 2 + o._2.length).sum
    val hdrLen = BaseHeaderLen + optBytes
    val msgLen = hdrLen + p.payload.length
    val buf = ByteBuffer.allocate(msgLen)
    buf.put(((1 << 5) | (p.mediaType & 0xf)).toByte) // version 1, S=0
    buf.put(hdrLen.toByte)
    buf.putShort(msgLen.toShort)
    buf.putInt(p.observationDomain.toInt)
    buf.putInt(p.messageId.toInt)
    p.options.foreach { case (tp, v) =>
      buf.put(tp.toByte)
      buf.put((2 + v.length).toByte)
      buf.put(v)
    }
    buf.put(p.payload)
    buf.array()
  }

  /** Split a contiguous stream of UDP-notif messages (the TCP-framed or
    * concatenated-datagram view). Framing is length-based, so a malformed
    * header (bad version, hdrLen < base, msgLen < hdrLen, lengths past the
    * buffer, or a TLV length < 2) makes everything after it unparseable:
    * decoding stops and returns the messages recovered so far instead of
    * throwing — this path eats raw network bytes. */
  def decodeStream(bytes: Array[Byte]): Seq[Packet] = {
    val buf = ByteBuffer.wrap(bytes)
    val out = mutable.Buffer[Packet]()
    var bad = false
    while (!bad && buf.remaining() >= BaseHeaderLen) {
      val start = buf.position()
      val b0 = buf.get() & 0xff
      val version = b0 >>> 5
      val mediaType = b0 & 0xf
      val hdrLen = buf.get() & 0xff
      val msgLen = buf.getShort() & 0xffff
      val domain = buf.getInt() & 0xffffffffL
      val msgId = buf.getInt() & 0xffffffffL
      if (version != 1 || hdrLen < BaseHeaderLen || msgLen < hdrLen ||
          start + msgLen > bytes.length) {
        bad = true
      } else {
        val opts = mutable.Buffer[(Int, Array[Byte])]()
        while (!bad && buf.position() < start + hdrLen) {
          if (start + hdrLen - buf.position() < 2) bad = true
          else {
            val tp = buf.get() & 0xff
            val l = (buf.get() & 0xff) - 2
            if (l < 0 || buf.position() + l > start + hdrLen) bad = true
            else {
              val v = new Array[Byte](l)
              buf.get(v)
              opts += ((tp, v))
            }
          }
        }
        if (!bad) {
          val payload = new Array[Byte](msgLen - hdrLen)
          buf.get(payload)
          out += Packet(domain, msgId, mediaType, payload, opts.toSeq)
        }
      }
    }
    out.toSeq
  }

  /** Reassemble segmented messages (draft §4.2 segmentation option,
    * type 1: 2-byte value = 15-bit segment number << 1 | Last bit):
    * group by (observation domain, message id), concatenate in segment
    * order, emit when the Last-marked segment and all before it have
    * arrived — at COMPLETION time, like a collector's reorder buffer.
    * Unsegmented packets pass straight through. */
  def reassemble(pkts: Seq[Packet]): Seq[Packet] = {
    val out = mutable.Buffer[Packet]()
    val partial = mutable.Map[(Long, Long),
      mutable.Map[Int, (Array[Byte], Boolean)]]()
    pkts.foreach { p =>
      p.options.collectFirst { case (1, v) if v.length >= 2 =>
        val raw = ((v(0) & 0xff) << 8) | (v(1) & 0xff)
        (raw >>> 1, (raw & 1) != 0)
      } match {
        case None => out += p
        case Some((seg, _)) =>
          val key = (p.observationDomain, p.messageId)
          val m = partial.getOrElseUpdate(key, mutable.Map())
          m(seg) = (p.payload,
            p.options.collectFirst { case (1, v) if v.length >= 2 =>
              (v(1) & 1) != 0 }.get)
          m.collectFirst { case (i, (_, true)) => i }.foreach { lastSeg =>
            if ((0 to lastSeg).forall(m.contains)) {
              out += p.copy(options = Nil,
                payload = (0 to lastSeg).toArray.flatMap(i => m(i)._1))
              partial.remove(key)
            }
          }
      }
    }
    out.toSeq
  }
}
