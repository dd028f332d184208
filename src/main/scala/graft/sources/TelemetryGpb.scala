package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import scala.collection.mutable

/** Streaming-telemetry GPB decoder + header framing (reference decoder
  * inventory: JSON, GPB, Cisco hdr v0/v1, YANG UDP-notif —
  * `src/telemetry/telemetry.h:49-53`; the JSON leg is q79).
  *
  * The protobuf WIRE format is public and tiny: messages are
  * `(field_number << 3 | wire_type)` tags followed by varint (0),
  * fixed64 (1), length-delimited (2) or fixed32 (5) payloads. This
  * decoder walks any message generically into `field number → values`
  * — the self-describing-telemetry consumption shape, where the caller
  * maps field numbers per sensor path the way a .proto would. No
  * protobuf library exists in the container, so the wire walk is
  * implemented directly (as the reference links protobuf-c only for
  * this).
  *
  * Framing: telemetry over TCP/UDP arrives as `header + payload`
  * packets; the v1-shaped header carries version, flags, message type
  * and payload length so a byte stream splits without parsing bodies.
  */
object TelemetryGpb {

  // ---- protobuf varint + message walk --------------------------------

  def writeVarint(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  def readVarint(buf: ByteBuffer): Long = {
    var shift = 0
    var v = 0L
    var b = 0
    do {
      b = buf.get() & 0xff
      v |= (b & 0x7fL) << shift
      shift += 7
    } while ((b & 0x80) != 0)
    v
  }

  /** Encode a flat message: Long → varint field, String/Array[Byte] →
    * length-delimited, Double → fixed64. Nested messages encode as the
    * child's bytes passed length-delimited. */
  def encodeMsg(fields: Seq[(Int, Any)]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    fields.foreach { case (num, value) =>
      value match {
        case l: Long =>
          writeVarint(out, (num.toLong << 3) | 0)
          writeVarint(out, l)
        case i: Int =>
          writeVarint(out, (num.toLong << 3) | 0)
          writeVarint(out, i.toLong)
        case d: Double =>
          writeVarint(out, (num.toLong << 3) | 1)
          val b = ByteBuffer.allocate(8)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          b.putDouble(d)
          out.write(b.array(), 0, 8)
        case s: String =>
          val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          writeVarint(out, (num.toLong << 3) | 2)
          writeVarint(out, bytes.length.toLong)
          out.write(bytes, 0, bytes.length)
        case b: Array[Byte] =>
          writeVarint(out, (num.toLong << 3) | 2)
          writeVarint(out, b.length.toLong)
          out.write(b, 0, b.length)
        case other =>
          throw new IllegalArgumentException(s"no gpb mapping for $other")
      }
    }
    out.toByteArray
  }

  /** Generic wire walk: field number → values in wire order. Varints
    * yield Long, fixed64 Double, fixed32 Long, length-delimited
    * Array[Byte] (caller decides string vs nested message). Unknown
    * fields are preserved, as a self-describing consumer must. */
  def decodeMsg(bytes: Array[Byte]): Map[Int, Seq[Any]] = {
    val buf = ByteBuffer.wrap(bytes)
    val out = mutable.Map[Int, mutable.Buffer[Any]]()
    while (buf.hasRemaining) {
      val tag = readVarint(buf)
      val num = (tag >>> 3).toInt
      val values = out.getOrElseUpdate(num, mutable.Buffer())
      (tag & 7) match {
        case 0 => values += readVarint(buf)
        case 1 =>
          values += buf.order(java.nio.ByteOrder.LITTLE_ENDIAN).getDouble()
          buf.order(java.nio.ByteOrder.BIG_ENDIAN)
        case 2 =>
          val len = readVarint(buf).toInt
          val b = new Array[Byte](len)
          buf.get(b)
          values += b
        case 5 =>
          buf.order(java.nio.ByteOrder.LITTLE_ENDIAN)
          values += (buf.getInt() & 0xffffffffL)
          buf.order(java.nio.ByteOrder.BIG_ENDIAN)
        case w =>
          throw new IllegalArgumentException(s"unsupported wire type $w")
      }
    }
    out.view.mapValues(_.toSeq).toMap
  }

  def str(v: Any): String = new String(v.asInstanceOf[Array[Byte]],
    java.nio.charset.StandardCharsets.UTF_8)

  // ---- header framing (v0/v1-shaped packet envelope) ------------------

  val HdrLen = 12
  val MsgTypeGpb = 2
  val MsgTypeJson = 1

  /** v1-shaped envelope: version(2) flags(2) msgType(2) reserved(2)
    * length(4). A byte stream of `hdr+payload` packets splits on the
    * declared length without touching payload bytes. */
  def frame(payload: Array[Byte], msgType: Int = MsgTypeGpb,
            version: Int = 1): Array[Byte] = {
    val buf = ByteBuffer.allocate(HdrLen + payload.length)
    buf.putShort(version.toShort)
    buf.putShort(0)
    buf.putShort(msgType.toShort)
    buf.putShort(0)
    buf.putInt(payload.length)
    buf.put(payload)
    buf.array()
  }

  /** Split a contiguous stream into (msgType, payload) packets. */
  def deframe(bytes: Array[Byte]): Seq[(Int, Array[Byte])] = {
    val buf = ByteBuffer.wrap(bytes)
    val out = mutable.Buffer[(Int, Array[Byte])]()
    while (buf.remaining() >= HdrLen) {
      buf.getShort() // version
      buf.getShort() // flags
      val msgType = buf.getShort() & 0xffff
      buf.getShort() // reserved
      val len = buf.getInt()
      val payload = new Array[Byte](len)
      buf.get(payload)
      out += ((msgType, payload))
    }
    out.toSeq
  }
}
