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
}
