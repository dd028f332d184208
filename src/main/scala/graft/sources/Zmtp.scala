package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import scala.collection.mutable

/** ZMTP 3.0 wire codec — the transport under pmacct's ZeroMQ telemetry
  * bridge (`src/telemetry/telemetry.c:120-123` zmq-pull ingest;
  * `nfacctd_zmq_*`, CONFIG-KEYS:1966-1990). The reference links libzmq;
  * the framing itself is the public ZMTP spec (zeromq rfc 23/37): a
  * 64-byte greeting (signature, version, security mechanism, as-server,
  * filler), NULL-mechanism READY commands, then message frames — flags
  * byte (bit0 MORE, bit1 LONG, bit2 COMMAND) + 1- or 8-byte size +
  * body — with multipart messages chained by the MORE bit.
  *
  * pmacct's bridge envelope is a 2-part message: [topic][payload]; the
  * payload feeds the existing telemetry decoders (GPB wire walk q95,
  * JSON q79). decodeSession returns reassembled multipart messages.
  */
object Zmtp {
  val GreetingLen = 64

  /** ZMTP 3.0 greeting: 0xFF + 8 padding + 0x7F signature, major 3,
    * minor 0, mechanism "NULL" (20 bytes, zero-padded), as-server,
    * 31 bytes filler. */
  def greeting(asServer: Boolean): Array[Byte] = {
    val g = new Array[Byte](GreetingLen)
    g(0) = 0xff.toByte
    g(9) = 0x7f.toByte
    g(10) = 3 // version-major
    g(11) = 0 // version-minor
    "NULL".getBytes("US-ASCII").copyToArray(g, 12)
    g(32) = if (asServer) 1 else 0
    g
  }

  /** Command frame (flags bit2): body = name-length(1) + name + data.
    * NULL-mechanism READY carries metadata properties. */
  def command(name: String, data: Array[Byte] = Array.emptyByteArray)
      : Array[Byte] = {
    val nm = name.getBytes("US-ASCII")
    val body = new ByteArrayOutputStream()
    body.write(nm.length)
    body.write(nm, 0, nm.length)
    body.write(data, 0, data.length)
    frameBytes(body.toByteArray, more = false, cmd = true)
  }

  private def frameBytes(body: Array[Byte], more: Boolean,
                         cmd: Boolean): Array[Byte] = {
    var flags = 0
    if (more) flags |= 1
    if (cmd) flags |= 4
    if (body.length > 255) {
      val b = ByteBuffer.allocate(9 + body.length)
      b.put((flags | 2).toByte).putLong(body.length.toLong).put(body)
      b.array()
    } else {
      val b = ByteBuffer.allocate(2 + body.length)
      b.put(flags.toByte).put(body.length.toByte).put(body)
      b.array()
    }
  }

  /** One message frame; `more` chains multipart. */
  def frame(body: Array[Byte], more: Boolean): Array[Byte] =
    frameBytes(body, more, cmd = false)

  /** Encode a multipart message (pmacct envelope: [topic][payload]). */
  def message(parts: Seq[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    parts.zipWithIndex.foreach { case (p, i) =>
      val f = frame(p, more = i < parts.size - 1)
      out.write(f, 0, f.length)
    }
    out.toByteArray
  }

  /** Full session bytes: greeting + READY + messages. */
  def session(messages: Seq[Seq[Array[Byte]]],
              asServer: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val g = greeting(asServer)
    out.write(g, 0, g.length)
    val r = command("READY")
    out.write(r, 0, r.length)
    messages.foreach { m =>
      val bytes = message(m)
      out.write(bytes, 0, bytes.length)
    }
    out.toByteArray
  }

  /** Decode a session byte stream into reassembled multipart messages.
    * Commands (READY etc.) are validated and skipped — a peer that never
    * sent READY, a bad greeting, or any malformed frame stops the walk
    * and returns what was recovered (this path eats raw socket bytes). */
  def decodeSession(bytes: Array[Byte]): Seq[Seq[Array[Byte]]] = {
    if (bytes.length < GreetingLen || (bytes(0) & 0xff) != 0xff ||
        (bytes(9) & 0xff) != 0x7f || bytes(10) != 3) return Nil
    val out = mutable.Buffer[Seq[Array[Byte]]]()
    val cur = mutable.Buffer[Array[Byte]]()
    var off = GreetingLen
    var ready = false
    var bad = false
    while (!bad && off + 2 <= bytes.length) {
      val flags = bytes(off) & 0xff
      val long = (flags & 2) != 0
      val hdr = if (long) 9 else 2
      if (off + hdr > bytes.length) bad = true
      else {
        val size =
          if (long) ByteBuffer.wrap(bytes, off + 1, 8).getLong
          else (bytes(off + 1) & 0xff).toLong
        if (size < 0 || off + hdr + size > bytes.length) bad = true
        else {
          val body = java.util.Arrays.copyOfRange(
            bytes, off + hdr, off + hdr + size.toInt)
          if ((flags & 4) != 0) {
            // command: name-length + name; READY gates message flow
            if (body.length >= 1 && body.length >= 1 + (body(0) & 0xff)) {
              val name = new String(body, 1, body(0) & 0xff, "US-ASCII")
              if (name == "READY") ready = true
              else if (name == "ERROR") bad = true
            } else bad = true
          } else if (!ready) {
            bad = true // data before handshake completes
          } else {
            cur += body
            if ((flags & 1) == 0) { // last part
              out += cur.toSeq
              cur.clear()
            }
          }
          off += hdr + size.toInt
        }
      }
    }
    out.toSeq
  }
}
