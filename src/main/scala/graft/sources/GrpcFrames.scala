package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import scala.collection.mutable

/** gRPC transport framing — the byte layers under a dial-in telemetry
  * gRPC collector (`src/telemetry/telemetry.c:46` grpc_collector_input;
  * the reference bridges gRPC through a helper process, the frames
  * themselves are public specs):
  *
  *  - HTTP/2 connection preface `PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n` then
  *    frames: length(3) type(1) flags(1) stream-id(4, high bit reserved)
  *    (RFC 9113 §4.1). Only DATA (type 0) carries payload; HEADERS,
  *    SETTINGS, WINDOW_UPDATE etc. are walked and skipped.
  *  - gRPC length-prefixed messages inside the per-stream DATA byte
  *    stream: compressed-flag(1) + length(4) + message (gRPC over HTTP/2
  *    spec §Message-Framing). A message may span DATA frames and a DATA
  *    frame may hold several messages — reassembly is per stream.
  */
object GrpcFrames {
  val Preface: Array[Byte] =
    "PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n".getBytes("US-ASCII")
  val TData = 0
  val THeaders = 1
  val TSettings = 4
  val TWindowUpdate = 8

  private def frameHeader(len: Int, tpe: Int, flags: Int,
                          streamId: Long): Array[Byte] = {
    val b = ByteBuffer.allocate(9)
    b.put(((len >> 16) & 0xff).toByte)
    b.put(((len >> 8) & 0xff).toByte)
    b.put((len & 0xff).toByte)
    b.put(tpe.toByte)
    b.put(flags.toByte)
    b.putInt((streamId & 0x7fffffffL).toInt)
    b.array()
  }

  /** One gRPC length-prefixed message (uncompressed). */
  def grpcMessage(payload: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(5 + payload.length)
    b.put(0.toByte) // compressed flag
    b.putInt(payload.length)
    b.put(payload)
    b.array()
  }

  /** Split a stream's bytes into DATA frames of at most `maxFrame`
    * payload bytes — deliberately misaligned with message boundaries so
    * decode must reassemble. */
  def dataFrames(streamId: Long, bytes: Array[Byte],
                 maxFrame: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var off = 0
    while (off < bytes.length) {
      val n = math.min(maxFrame, bytes.length - off)
      val h = frameHeader(n, TData, 0, streamId)
      out.write(h, 0, h.length)
      out.write(bytes, off, n)
      off += n
    }
    out.toByteArray
  }

  /** A minimal client connection: preface, SETTINGS, a HEADERS frame per
    * stream (opaque HPACK bytes — a collector routes on stream id), then
    * the interleaved DATA frames. */
  def connection(streams: Seq[(Long, Array[Byte])],
                 maxFrame: Int = 48): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Preface, 0, Preface.length)
    val settings = frameHeader(0, TSettings, 0, 0)
    out.write(settings, 0, settings.length)
    streams.foreach { case (sid, bytes) =>
      val hdrs = frameHeader(2, THeaders, 0x4, sid) // END_HEADERS
      out.write(hdrs, 0, hdrs.length)
      out.write(0x82); out.write(0x87) // opaque indexed HPACK bytes
      val d = dataFrames(sid, bytes, maxFrame)
      out.write(d, 0, d.length)
    }
    out.toByteArray
  }

  /** Decode a connection: validate the preface, walk frames, reassemble
    * per-stream DATA bytes, then deframe gRPC messages per stream.
    * Malformed input (bad preface, frame past the buffer, message length
    * past the stream) stops the walk and returns what was recovered. */
  def decode(bytes: Array[Byte]): Seq[(Long, Array[Byte])] = {
    if (bytes.length < Preface.length ||
        !Preface.indices.forall(i => bytes(i) == Preface(i))) return Nil
    val streams = mutable.LinkedHashMap[Long, ByteArrayOutputStream]()
    var off = Preface.length
    var bad = false
    while (!bad && off + 9 <= bytes.length) {
      val len = ((bytes(off) & 0xff) << 16) | ((bytes(off + 1) & 0xff) << 8) |
        (bytes(off + 2) & 0xff)
      val tpe = bytes(off + 3) & 0xff
      val sid = ByteBuffer.wrap(bytes, off + 5, 4).getInt & 0x7fffffffL
      if (off + 9 + len > bytes.length) bad = true
      else {
        if (tpe == TData && sid != 0)
          streams.getOrElseUpdate(sid, new ByteArrayOutputStream())
            .write(bytes, off + 9, len)
        off += 9 + len
      }
    }
    // deframe gRPC messages per stream
    streams.iterator.flatMap { case (sid, buf) =>
      val b = buf.toByteArray
      val msgs = mutable.Buffer[(Long, Array[Byte])]()
      var p = 0
      var ok = true
      while (ok && p + 5 <= b.length) {
        val compressed = b(p) & 0xff
        val mlen = ByteBuffer.wrap(b, p + 1, 4).getInt
        if (compressed > 1 || mlen < 0 || p + 5 + mlen > b.length) ok = false
        else {
          msgs += ((sid, java.util.Arrays.copyOfRange(b, p + 5, p + 5 + mlen)))
          p += 5 + mlen
        }
      }
      msgs.iterator
    }.toSeq
  }
}
