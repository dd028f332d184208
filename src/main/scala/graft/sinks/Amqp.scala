package graft.sinks

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import scala.collection.mutable

/** AMQP 0-9-1 frame codec — the transport under pmacct's RabbitMQ sink
  * (`src/amqp_plugin.c`, `src/amqp_common.c:266` `amqp_basic_publish`
  * with exchange/routing-key pairs, JSON content type
  * `amqp_common.c:148-153`, round-robin dynamic routing keys
  * `amqp_plugin.c:343-363`). The reference links librabbitmq; the
  * framing itself is the public AMQP 0-9-1 spec: protocol header
  * "AMQP\x00\x00\x09\x01", then frames of
  * `type(1) channel(2) size(4) payload frame-end(0xCE)` — a publish is
  * a method frame (class 60 basic / method 40 publish: reserved-short,
  * exchange shortstr, routing-key shortstr, bits), a content HEADER
  * frame (class 60, weight 0, 64-bit body size, property flags +
  * content-type when flagged), and BODY frames splitting the payload at
  * the negotiated frame-max. Frames from different channels interleave
  * freely; within a channel the method→header→bodies order is fixed —
  * the decoder keeps per-channel assembly state exactly as a broker
  * does.
  */
object Amqp {
  val ProtocolHeader: Array[Byte] =
    Array[Byte]('A', 'M', 'Q', 'P', 0, 0, 9, 1)
  val FrameMethod = 1
  val FrameHeader = 2
  val FrameBody = 3
  val FrameEnd = 0xCE
  val ClassBasic = 60
  val MethodPublish = 40
  val FlagContentType = 0x8000

  /** One published message as the broker would deliver it. */
  final case class Publish(channel: Int, exchange: String,
                           routingKey: String, contentType: String,
                           body: Array[Byte])

  private def frame(tpe: Int, channel: Int, payload: Array[Byte])
      : Array[Byte] = {
    val b = ByteBuffer.allocate(8 + payload.length)
    b.put(tpe.toByte).putShort(channel.toShort).putInt(payload.length)
    b.put(payload).put(FrameEnd.toByte)
    b.array()
  }

  private def shortstr(s: String): Array[Byte] = {
    val b = s.getBytes("UTF-8")
    require(b.length <= 255, "shortstr overflow")
    b.length.toByte +: b
  }

  /** Encode one basic.publish as its frame sequence (method, header,
    * body frames split at `frameMax` payload bytes). */
  def publishFrames(p: Publish, frameMax: Int): Seq[Array[Byte]] = {
    val m = new ByteArrayOutputStream()
    m.write(Array[Byte](0, ClassBasic.toByte, 0, MethodPublish.toByte), 0, 4)
    m.write(Array[Byte](0, 0), 0, 2)           // reserved-short
    val ex = shortstr(p.exchange); m.write(ex, 0, ex.length)
    val rk = shortstr(p.routingKey); m.write(rk, 0, rk.length)
    m.write(0)                                  // mandatory/immediate bits
    val method = frame(FrameMethod, p.channel, m.toByteArray)

    val h = new ByteArrayOutputStream()
    h.write(Array[Byte](0, ClassBasic.toByte, 0, 0), 0, 4) // class, weight
    val sz = ByteBuffer.allocate(8).putLong(p.body.length.toLong)
    h.write(sz.array(), 0, 8)
    h.write(Array[Byte](((FlagContentType >> 8) & 0xff).toByte,
      (FlagContentType & 0xff).toByte), 0, 2)
    val ct = shortstr(p.contentType); h.write(ct, 0, ct.length)
    val header = frame(FrameHeader, p.channel, h.toByteArray)

    val bodies = p.body.grouped(math.max(1, frameMax)).toSeq
      .map(chunk => frame(FrameBody, p.channel, chunk))
    method +: header +: bodies
  }

  /** Serialize a connection's worth of publishes: protocol header + the
    * frame streams of all channels interleaved round-robin (legal per
    * spec — only intra-channel order is constrained). */
  def connection(publishes: Seq[Publish], frameMax: Int): Array[Byte] = {
    val perChannel: Seq[Iterator[Array[Byte]]] = publishes
      .groupBy(_.channel).toSeq.sortBy(_._1)
      .map { case (_, ps) => ps.iterator.flatMap(publishFrames(_, frameMax)) }
    val out = new ByteArrayOutputStream()
    out.write(ProtocolHeader, 0, ProtocolHeader.length)
    val its = perChannel.toArray
    var remaining = its.length
    while (remaining > 0) {
      remaining = 0
      its.foreach { it =>
        if (it.hasNext) { val f = it.next(); out.write(f, 0, f.length) }
        if (it.hasNext) remaining += 1
      }
    }
    out.toByteArray
  }

  private final class Assembly {
    var exchange: String = _
    var routingKey: String = _
    var contentType: String = ""
    var bodySize: Long = -1
    val body = new ByteArrayOutputStream()
    def complete: Boolean = bodySize >= 0 && body.size() >= bodySize
  }

  /** Decode a connection byte stream back into completed publishes, in
    * frame-arrival order of completion. Malformed framing (bad
    * protocol header, missing frame-end octet, truncation, a body
    * frame with no preceding header) stops the walk and returns what
    * was assembled — this path eats raw socket bytes. */
  def decode(bytes: Array[Byte]): Seq[Publish] = {
    if (bytes.length < 8 ||
        !java.util.Arrays.equals(
          java.util.Arrays.copyOf(bytes, 8), ProtocolHeader)) return Nil
    val out = mutable.Buffer[Publish]()
    val chans = mutable.Map[Int, Assembly]()
    val buf = ByteBuffer.wrap(bytes)
    var off = 8
    var bad = false
    while (!bad && off + 8 <= bytes.length) {
      val tpe = bytes(off) & 0xff
      val channel = buf.getShort(off + 1) & 0xffff
      val size = buf.getInt(off + 3)
      if (size < 0 || off + 7 + size + 1 > bytes.length ||
          (bytes(off + 7 + size) & 0xff) != FrameEnd) bad = true
      else {
        val p = off + 7
        tpe match {
          case FrameMethod if size >= 7 =>
            val cls = buf.getShort(p) & 0xffff
            val mth = buf.getShort(p + 2) & 0xffff
            if (cls == ClassBasic && mth == MethodPublish) {
              val end = p + size
              var q = p + 6 // skip reserved-short
              if (q < end && q + 1 + (bytes(q) & 0xff) < end) {
                val a = new Assembly
                val exLen = bytes(q) & 0xff
                a.exchange = new String(bytes, q + 1, exLen, "UTF-8")
                q += 1 + exLen
                val rkLen = bytes(q) & 0xff
                if (q + 1 + rkLen <= end) {
                  a.routingKey = new String(bytes, q + 1, rkLen, "UTF-8")
                  chans(channel) = a
                } else bad = true
              } else bad = true
            }
          case FrameHeader if size >= 14 =>
            chans.get(channel) match {
              case Some(a) =>
                a.bodySize = buf.getLong(p + 4)
                val flags = buf.getShort(p + 12) & 0xffff
                if ((flags & FlagContentType) != 0 && size >= 15 &&
                    15 + (bytes(p + 14) & 0xff) <= size) {
                  val ctLen = bytes(p + 14) & 0xff
                  a.contentType = new String(bytes, p + 15, ctLen, "UTF-8")
                }
                if (a.complete) { emit(out, channel, a); chans -= channel }
              case None => bad = true
            }
          case FrameBody =>
            chans.get(channel) match {
              case Some(a) =>
                a.body.write(bytes, p, size)
                if (a.complete) { emit(out, channel, a); chans -= channel }
              case None => bad = true
            }
          case _ => () // heartbeats / other methods: ignored
        }
        off += 8 + size
      }
    }
    out.toSeq
  }

  private def emit(out: mutable.Buffer[Publish], channel: Int,
                   a: Assembly): Unit =
    out += Publish(channel, a.exchange, a.routingKey, a.contentType,
      a.body.toByteArray)
}
