package graft.sinks

import java.nio.ByteBuffer
import scala.collection.mutable

/** Kafka wire-protocol Produce codec — the byte-level proof for the one
  * sink family the sandbox cannot drive end-to-end (no broker jar, no
  * egress; documented since r4). Same pattern as the AMQP 0-9-1 (q146)
  * and RESP (q147) codecs: encode the frames a real client would put on
  * the socket, decode them like the broker does, reconcile with the
  * oracle.
  *
  * Format is the public Kafka protocol (kafka.apache.org/protocol):
  *  - request envelope: i32 size + request header v2 (api_key=0 Produce,
  *    api_version=9, correlation_id, nullable client_id, tagged fields)
  *  - ProduceRequest v9 is FLEXIBLE: compact strings/arrays (unsigned
  *    varint length+1) and tagged-field sections
  *  - records ride a RecordBatch v2: fixed 61-byte header with CRC32C
  *    over attributes..end, then length-prefixed records with
  *    zigzag-varint deltas (the reference writes these via librdkafka,
  *    src/kafka_common.c; this codec speaks the wire itself)
  */
object KafkaWire {

  final case class Record(key: String, value: Array[Byte])
  final case class PartitionBatch(topic: String, partition: Int,
                                  records: Seq[Record])

  // ---- varints -------------------------------------------------------

  private def writeUVarint(out: mutable.ArrayBuffer[Byte], v0: Int): Unit = {
    var v = v0
    while ((v & ~0x7f) != 0) {
      out += ((v & 0x7f) | 0x80).toByte
      v = v >>> 7
    }
    out += v.toByte
  }

  private def writeVarint(out: mutable.ArrayBuffer[Byte], v: Int): Unit =
    writeUVarint(out, (v << 1) ^ (v >> 31))

  private def readUVarint(buf: ByteBuffer): Int = {
    var v = 0; var shift = 0; var b = 0
    do {
      b = buf.get() & 0xff
      v |= (b & 0x7f) << shift
      shift += 7
    } while ((b & 0x80) != 0)
    v
  }

  private def readVarint(buf: ByteBuffer): Int = {
    val raw = readUVarint(buf)
    (raw >>> 1) ^ -(raw & 1)
  }

  // ---- record batch v2 ----------------------------------------------

  /** Encode a RecordBatch v2 (magic 2) with CRC32C. */
  def encodeBatch(records: Seq[Record], baseTs: Long): Array[Byte] = {
    val body = mutable.ArrayBuffer[Byte]()
    def i16(v: Int): Unit = { body += (v >> 8).toByte; body += v.toByte }
    def i32(v: Int): Unit = (24 to 0 by -8).foreach(s =>
      body += (v >> s).toByte)
    def i64(v: Long): Unit = (56 to 0 by -8).foreach(s =>
      body += (v >> s).toByte)
    i16(0)                       // attributes: no compression
    i32(records.size - 1)        // lastOffsetDelta
    i64(baseTs); i64(baseTs)     // base/max timestamp
    i64(-1L); i16(-1); i32(-1)   // producer id/epoch, base sequence
    i32(records.size)
    records.zipWithIndex.foreach { case (r, i) =>
      val rec = mutable.ArrayBuffer[Byte]()
      rec += 0                   // record attributes
      writeVarint(rec, 0)        // timestamp delta
      writeVarint(rec, i)        // offset delta
      val k = r.key.getBytes("UTF-8")
      writeVarint(rec, k.length); rec ++= k
      writeVarint(rec, r.value.length); rec ++= r.value
      writeVarint(rec, 0)        // headers
      writeVarint(body, rec.length)
      body ++= rec
    }
    val crc = new java.util.zip.CRC32C
    crc.update(body.toArray)
    // layout: baseOffset(8) batchLength(4) leaderEpoch(4) magic(1)
    // crc(4) body; batchLength counts from leaderEpoch to end
    val head = ByteBuffer.allocate(21 + body.length)
    head.putLong(0L)                       // baseOffset
    head.putInt(9 + body.length)           // batchLength
    head.putInt(-1)                        // partitionLeaderEpoch
    head.put(2.toByte)                     // magic
    head.putInt(crc.getValue.toInt)        // CRC32C over attributes..end
    head.put(body.toArray)
    head.array()
  }

  /** Decode + CRC-verify a RecordBatch v2; malformed or CRC-bad batches
    * return Nil like a broker rejecting the produce. */
  def decodeBatch(bytes: Array[Byte]): Seq[Record] = {
    if (bytes.length < 57) return Nil // 21-byte prefix + 36 fixed body
    val buf = ByteBuffer.wrap(bytes)
    buf.getLong()                          // baseOffset
    val batchLen = buf.getInt()
    if (batchLen + 12 > bytes.length) return Nil
    buf.getInt()                           // leader epoch
    if (buf.get() != 2) return Nil         // magic
    val crcStored = buf.getInt()
    val crc = new java.util.zip.CRC32C
    crc.update(bytes, 21, bytes.length - 21)
    if (crc.getValue.toInt != crcStored) return Nil
    buf.getShort()                         // attributes
    buf.getInt()                           // lastOffsetDelta
    buf.getLong(); buf.getLong()           // timestamps
    buf.getLong(); buf.getShort(); buf.getInt() // producer/sequence
    val n = buf.getInt()
    val out = mutable.Buffer[Record]()
    var i = 0
    var ok = true
    while (ok && i < n && buf.remaining() > 0) {
      val len = readVarint(buf)
      val end = buf.position() + len
      if (len < 3 || end > buf.limit()) ok = false
      else {
        buf.get()                          // record attributes
        readVarint(buf)                    // ts delta
        readVarint(buf)                    // offset delta
        val klen = readVarint(buf)
        val k = new Array[Byte](math.max(0, klen)); buf.get(k)
        val vlen = readVarint(buf)
        val v = new Array[Byte](math.max(0, vlen)); buf.get(v)
        readVarint(buf)                    // headers count (0)
        buf.position(end)
        out += Record(new String(k, "UTF-8"), v)
      }
      i += 1
    }
    if (ok) out.toSeq else Nil
  }

  // ---- Produce v9 request -------------------------------------------

  /** One Produce v9 request (flexible encoding) carrying the batches,
    * size-prefixed like the socket bytes. */
  def encodeProduce(correlationId: Int, clientId: String,
                    batches: Seq[PartitionBatch], baseTs: Long)
      : Array[Byte] = {
    val b = mutable.ArrayBuffer[Byte]()
    def i16(v: Int): Unit = { b += (v >> 8).toByte; b += v.toByte }
    def i32(v: Int): Unit = (24 to 0 by -8).foreach(s => b += (v >> s).toByte)
    def compactStr(s: String): Unit = {
      val bytes = s.getBytes("UTF-8")
      writeUVarint(b, bytes.length + 1); b ++= bytes
    }
    // request header v2
    i16(0); i16(9)                         // Produce, version 9
    i32(correlationId)
    val cid = clientId.getBytes("UTF-8")
    i16(cid.length); b ++= cid             // header client_id: non-compact
    writeUVarint(b, 0)                     // header tagged fields
    // body
    writeUVarint(b, 0)                     // transactional_id: null
    i16(1)                                 // acks
    i32(30000)                             // timeout_ms
    val byTopic = batches.groupBy(_.topic).toSeq.sortBy(_._1)
    writeUVarint(b, byTopic.size + 1)      // compact array
    byTopic.foreach { case (topic, parts) =>
      compactStr(topic)
      writeUVarint(b, parts.size + 1)
      parts.sortBy(_.partition).foreach { p =>
        i32(p.partition)
        val batch = encodeBatch(p.records, baseTs)
        writeUVarint(b, batch.length + 1)  // compact nullable bytes
        b ++= batch
        writeUVarint(b, 0)                 // partition tagged fields
      }
      writeUVarint(b, 0)                   // topic tagged fields
    }
    writeUVarint(b, 0)                     // body tagged fields
    val out = ByteBuffer.allocate(4 + b.length)
    out.putInt(b.length)
    out.put(b.toArray)
    out.array()
  }

  final case class Produced(correlationId: Int, clientId: String,
                            topic: String, partition: Int,
                            records: Seq[Record])

  /** Walk a socket stream of size-prefixed Produce v9 requests like the
    * broker's network thread; short/garbage tails stop the walk, CRC-bad
    * batches drop (decodeBatch contract). */
  def decodeStream(bytes: Array[Byte]): Seq[Produced] = {
    val out = mutable.Buffer[Produced]()
    val buf = ByteBuffer.wrap(bytes)
    var ok = true
    while (ok && buf.remaining() >= 4) {
      val size = buf.getInt()
      if (size < 10 || size > buf.remaining()) ok = false
      else {
        val end = buf.position() + size
        val apiKey = buf.getShort()
        val apiVersion = buf.getShort()
        val corr = buf.getInt()
        val cidLen = buf.getShort() & 0xffff
        val cid = new Array[Byte](cidLen); buf.get(cid)
        readUVarint(buf)                   // header tagged fields
        if (apiKey != 0 || apiVersion != 9) buf.position(end)
        else {
          val txLen = readUVarint(buf)     // transactional id (null = 0)
          if (txLen > 1) buf.position(buf.position() + txLen - 1)
          buf.getShort()                   // acks
          buf.getInt()                     // timeout
          val nTopics = readUVarint(buf) - 1
          (0 until nTopics).foreach { _ =>
            val tLen = readUVarint(buf) - 1
            val t = new Array[Byte](tLen); buf.get(t)
            val topic = new String(t, "UTF-8")
            val nParts = readUVarint(buf) - 1
            (0 until nParts).foreach { _ =>
              val partition = buf.getInt()
              val rLen = readUVarint(buf) - 1
              val batch = new Array[Byte](math.max(0, rLen)); buf.get(batch)
              readUVarint(buf)             // partition tagged fields
              out += Produced(corr, new String(cid, "UTF-8"), topic,
                partition, decodeBatch(batch))
            }
            readUVarint(buf)               // topic tagged fields
          }
          buf.position(end)
        }
      }
    }
    out.toSeq
  }
}
