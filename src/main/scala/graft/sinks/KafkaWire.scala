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

  /** Bounded read: a corrupt length must fail BEFORE the allocation —
    * a flipped bit in a varint could otherwise request a huge array
    * (the 64 MB frame guard bounds the buffer, not a parsed length). */
  private def takeBytes(buf: ByteBuffer, len: Int): Array[Byte] = {
    if (len < 0 || len > buf.remaining())
      throw new IllegalArgumentException(s"length $len > remaining")
    val a = new Array[Byte](len)
    buf.get(a)
    a
  }

  // ---- record batch v2 ----------------------------------------------

  /** Encode a RecordBatch v2 (magic 2) with CRC32C. Transactional
    * batches (KIP-98) carry the producer id/epoch assigned by
    * InitProducerId and set attributes bit 4 — the broker validates the
    * epoch (zombie fencing) and the batch stays invisible to consumers
    * until the EndTxn commit. */
  def encodeBatch(records: Seq[Record], baseTs: Long,
                  producerId: Long = -1L, producerEpoch: Int = -1,
                  transactional: Boolean = false): Array[Byte] = {
    val body = mutable.ArrayBuffer[Byte]()
    def i16(v: Int): Unit = { body += (v >> 8).toByte; body += v.toByte }
    def i32(v: Int): Unit = (24 to 0 by -8).foreach(s =>
      body += (v >> s).toByte)
    def i64(v: Long): Unit = (56 to 0 by -8).foreach(s =>
      body += (v >> s).toByte)
    i16(if (transactional) 0x10 else 0) // attributes: bit 4 = txn
    i32(records.size - 1)        // lastOffsetDelta
    i64(baseTs); i64(baseTs)     // base/max timestamp
    i64(producerId); i16(producerEpoch)
    i32(if (transactional) 0 else -1)   // base sequence
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

  /** The producer identity stamped in a RecordBatch v2 header:
    * (producerId@43, producerEpoch@51, transactional attributes bit).
    * What the broker reads to validate a transactional produce. */
  def batchTxnInfo(bytes: Array[Byte]): (Long, Int, Boolean) = {
    if (bytes.length < 61) return (-1L, -1, false)
    val buf = ByteBuffer.wrap(bytes)
    val attrs = buf.getShort(21)
    (buf.getLong(43), buf.getShort(51).toInt, (attrs & 0x10) != 0)
  }

  /** Decode + CRC-verify a RecordBatch v2; malformed or CRC-bad batches
    * return Nil like a broker rejecting the produce. */
  def decodeBatch(bytes: Array[Byte]): Seq[Record] = {
    if (bytes.length < 61) return Nil // 21-byte prefix + fixed body through recordCount
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
    // CRC passing means corruption can't reach this walk, but a
    // CRC-valid CRAFTED batch still can: any parse failure → Nil,
    // never a thrown task death
    try {
      while (ok && i < n && buf.remaining() > 0) {
        val len = readVarint(buf)
        val end = buf.position() + len
        if (len < 3 || end > buf.limit()) ok = false
        else {
          buf.get()                          // record attributes
          readVarint(buf)                    // ts delta
          readVarint(buf)                    // offset delta
          val klen = readVarint(buf)
          val k = takeBytes(buf, math.max(0, klen))
          val vlen = readVarint(buf)
          val v = takeBytes(buf, math.max(0, vlen))
          readVarint(buf)                    // headers count (0)
          buf.position(end)
          out += Record(new String(k, "UTF-8"), v)
        }
        i += 1
      }
    } catch { case _: RuntimeException => ok = false }
    if (ok) out.toSeq else Nil
  }

  // ---- Produce v9 request -------------------------------------------

  /** One Produce v9 request (flexible encoding) carrying the batches,
    * size-prefixed like the socket bytes. */
  def encodeProduce(correlationId: Int, clientId: String,
                    batches: Seq[PartitionBatch], baseTs: Long,
                    txnId: Option[String] = None,
                    producerId: Long = -1L, producerEpoch: Int = -1)
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
    txnId match {                          // transactional_id
      case Some(t) =>
        val tb = t.getBytes("UTF-8")
        writeUVarint(b, tb.length + 1); b ++= tb
      case None => writeUVarint(b, 0)      // null
    }
    i16(1)                                 // acks
    i32(30000)                             // timeout_ms
    val byTopic = batches.groupBy(_.topic).toSeq.sortBy(_._1)
    writeUVarint(b, byTopic.size + 1)      // compact array
    byTopic.foreach { case (topic, parts) =>
      compactStr(topic)
      writeUVarint(b, parts.size + 1)
      parts.sortBy(_.partition).foreach { p =>
        i32(p.partition)
        val batch = encodeBatch(p.records, baseTs, producerId,
          producerEpoch, transactional = txnId.isDefined)
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

  // ---- broker-side parse + responses (the live-gate surface) ---------

  /** A Produce v9 request parsed to its RAW batch bytes — what a broker
    * appends to the log verbatim after rewriting baseOffset (the CRC
    * covers attributes..end and deliberately EXCLUDES baseOffset /
    * batchLength / epoch, which is what makes the rewrite legal). */
  final case class RawProduce(correlationId: Int, clientId: String,
                              batches: Seq[(String, Int, Array[Byte])],
                              txnId: Option[String] = None)

  /** Parse one Produce v9 request payload (no size prefix). Returns None
    * for a different api key/version or a malformed body. */
  def parseProduce(payload: Array[Byte]): Option[RawProduce] = try {
    val buf = ByteBuffer.wrap(payload)
    val apiKey = buf.getShort(); val apiVersion = buf.getShort()
    if (apiKey != 0 || apiVersion != 9) return None
    val corr = buf.getInt()
    val cidLen = buf.getShort() & 0xffff
    val cid = takeBytes(buf, cidLen)
    readUVarint(buf)                       // header tagged fields
    val txLen = readUVarint(buf)
    val txnId =
      if (txLen > 1) Some(new String(takeBytes(buf, txLen - 1), "UTF-8"))
      else None
    buf.getShort(); buf.getInt()           // acks, timeout
    val out = mutable.Buffer[(String, Int, Array[Byte])]()
    val nTopics = readUVarint(buf) - 1
    (0 until nTopics).foreach { _ =>
      val tLen = readUVarint(buf) - 1
      val t = takeBytes(buf, tLen)
      val nParts = readUVarint(buf) - 1
      (0 until nParts).foreach { _ =>
        val partition = buf.getInt()
        val rLen = readUVarint(buf) - 1
        val batch = takeBytes(buf, math.max(0, rLen))
        readUVarint(buf)                   // partition tagged fields
        out += ((new String(t, "UTF-8"), partition, batch))
      }
      readUVarint(buf)                     // topic tagged fields
    }
    Some(RawProduce(corr, new String(cid, "UTF-8"), out.toSeq, txnId))
  } catch { case _: Exception => None }

  // ---- transactions: InitProducerId v0 + EndTxn v0 (KIP-98) ----------

  /** InitProducerId v0 (api 22): register/resume the transactional.id,
    * get a (producerId, producerEpoch) pair. Re-initializing an id bumps
    * the epoch — the zombie-fencing primitive. */
  def encodeInitProducerId(corr: Int, clientId: String,
                           txnId: String): Array[Byte] = {
    val b = mutable.ArrayBuffer[Byte]()
    def i16(v: Int): Unit = { b += (v >> 8).toByte; b += v.toByte }
    def i32(v: Int): Unit = (24 to 0 by -8).foreach(s => b += (v >> s).toByte)
    i16(22); i16(0); i32(corr)
    val cid = clientId.getBytes("UTF-8"); i16(cid.length); b ++= cid
    val t = txnId.getBytes("UTF-8"); i16(t.length); b ++= t
    i32(60000)                             // transaction_timeout_ms
    val out = ByteBuffer.allocate(4 + b.length)
    out.putInt(b.length); out.put(b.toArray); out.array()
  }

  /** Broker-side parse: (corr, clientId, transactionalId). */
  def parseInitProducerId(payload: Array[Byte])
      : Option[(Int, String, String)] = try {
    val buf = ByteBuffer.wrap(payload)
    if (buf.getShort() != 22 || buf.getShort() != 0) return None
    val corr = buf.getInt()
    val cid = takeBytes(buf, buf.getShort() & 0xffff)
    val txn = takeBytes(buf, buf.getShort() & 0xffff)
    Some((corr, new String(cid, "UTF-8"), new String(txn, "UTF-8")))
  } catch { case _: Exception => None }

  /** InitProducerId v0 response: error, producerId, producerEpoch. */
  def encodeInitProducerIdResponse(corr: Int, error: Int, pid: Long,
                                   epoch: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(4 + 4 + 4 + 2 + 8 + 2)
    b.putInt(20); b.putInt(corr); b.putInt(0) // size, corr, throttle
    b.putShort(error.toShort); b.putLong(pid); b.putShort(epoch.toShort)
    b.array()
  }

  /** Client-side: (error, producerId, producerEpoch). */
  def decodeInitProducerIdResponse(payload: Array[Byte])
      : (Int, Long, Int) = {
    val buf = ByteBuffer.wrap(payload)
    buf.getInt(); buf.getInt()             // corr, throttle
    (buf.getShort().toInt, buf.getLong(), buf.getShort().toInt)
  }

  /** EndTxn v0 (api 26): commit or abort the open transaction of
    * (transactional.id, producerId, producerEpoch). */
  def encodeEndTxn(corr: Int, clientId: String, txnId: String,
                   pid: Long, epoch: Int, commit: Boolean): Array[Byte] = {
    val b = mutable.ArrayBuffer[Byte]()
    def i16(v: Int): Unit = { b += (v >> 8).toByte; b += v.toByte }
    def i32(v: Int): Unit = (24 to 0 by -8).foreach(s => b += (v >> s).toByte)
    def i64(v: Long): Unit = (56 to 0 by -8).foreach(s => b += (v >> s).toByte)
    i16(26); i16(0); i32(corr)
    val cid = clientId.getBytes("UTF-8"); i16(cid.length); b ++= cid
    val t = txnId.getBytes("UTF-8"); i16(t.length); b ++= t
    i64(pid); i16(epoch)
    b += (if (commit) 1 else 0).toByte
    val out = ByteBuffer.allocate(4 + b.length)
    out.putInt(b.length); out.put(b.toArray); out.array()
  }

  /** Broker-side parse: (corr, txnId, pid, epoch, commit). */
  def parseEndTxn(payload: Array[Byte])
      : Option[(Int, String, Long, Int, Boolean)] = try {
    val buf = ByteBuffer.wrap(payload)
    if (buf.getShort() != 26 || buf.getShort() != 0) return None
    val corr = buf.getInt()
    takeBytes(buf, buf.getShort() & 0xffff)  // client id
    val txn = takeBytes(buf, buf.getShort() & 0xffff)
    val pid = buf.getLong(); val epoch = buf.getShort().toInt
    val commit = buf.get() != 0
    Some((corr, new String(txn, "UTF-8"), pid, epoch, commit))
  } catch { case _: Exception => None }

  /** EndTxn v0 response: throttle + error. */
  def encodeEndTxnResponse(corr: Int, error: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(4 + 4 + 4 + 2)
    b.putInt(10); b.putInt(corr); b.putInt(0)
    b.putShort(error.toShort); b.array()
  }

  /** Client-side: the error code (0 ok; 47 fenced; 48 invalid state). */
  def decodeEndTxnResponse(payload: Array[Byte]): Int = {
    val buf = ByteBuffer.wrap(payload)
    buf.getInt(); buf.getInt()
    buf.getShort().toInt
  }

  /** Produce v9 response (flexible; response header v1): per-partition
    * (topic, partition, error, baseOffset). Size-prefixed socket bytes.
    * Layout per the public spec: responses first, throttle LAST. */
  def encodeProduceResponse(corr: Int,
      results: Seq[(String, Int, Short, Long)]): Array[Byte] = {
    val b = mutable.ArrayBuffer[Byte]()
    def i16(v: Int): Unit = { b += (v >> 8).toByte; b += v.toByte }
    def i32(v: Int): Unit = (24 to 0 by -8).foreach(s => b += (v >> s).toByte)
    def i64(v: Long): Unit = (56 to 0 by -8).foreach(s => b += (v >> s).toByte)
    i32(corr); writeUVarint(b, 0)          // response header v1
    val byTopic = results.groupBy(_._1).toSeq.sortBy(_._1)
    writeUVarint(b, byTopic.size + 1)
    byTopic.foreach { case (topic, parts) =>
      val t = topic.getBytes("UTF-8")
      writeUVarint(b, t.length + 1); b ++= t
      writeUVarint(b, parts.size + 1)
      parts.foreach { case (_, p, err, off) =>
        i32(p); i16(err); i64(off)
        i64(-1L)                           // log_append_time
        i64(0L)                            // log_start_offset
        writeUVarint(b, 1)                 // record_errors: empty
        writeUVarint(b, 0)                 // error_message: null
        writeUVarint(b, 0)                 // partition tagged fields
      }
      writeUVarint(b, 0)                   // topic tagged fields
    }
    i32(0)                                 // throttle_time_ms (last)
    writeUVarint(b, 0)                     // body tagged fields
    val out = ByteBuffer.allocate(4 + b.length)
    out.putInt(b.length); out.put(b.toArray); out.array()
  }

  /** Decode a Produce v9 response payload (no size prefix) back to
    * (topic, partition, error, baseOffset) acks. */
  def decodeProduceResponse(payload: Array[Byte])
      : Seq[(String, Int, Short, Long)] = {
    val buf = ByteBuffer.wrap(payload)
    buf.getInt()                           // correlation id
    readUVarint(buf)                       // header tagged fields
    val out = mutable.Buffer[(String, Int, Short, Long)]()
    val nTopics = readUVarint(buf) - 1
    (0 until nTopics).foreach { _ =>
      val tLen = readUVarint(buf) - 1
      val t = takeBytes(buf, tLen)
      val nParts = readUVarint(buf) - 1
      (0 until nParts).foreach { _ =>
        val p = buf.getInt(); val err = buf.getShort()
        val off = buf.getLong()
        buf.getLong(); buf.getLong()       // append time, log start
        val nErrs = readUVarint(buf) - 1
        (0 until nErrs).foreach { _ => buf.getInt(); readUVarint(buf) }
        val msgLen = readUVarint(buf)      // error_message (null = 0)
        if (msgLen > 1) buf.position(buf.position() + msgLen - 1)
        readUVarint(buf)                   // partition tagged fields
        out += ((new String(t, "UTF-8"), p, err, off))
      }
      readUVarint(buf)                     // topic tagged fields
    }
    out.toSeq
  }

  /** Fetch v4 request for ONE (topic, partition) from `offset`
    * (non-flexible encoding — v4 predates flexible versions; both header
    * and body use plain i16/i32 arrays). Size-prefixed socket bytes. */
  def encodeFetch(corr: Int, clientId: String, topic: String,
                  partition: Int, offset: Long, maxBytes: Int)
      : Array[Byte] = {
    val b = mutable.ArrayBuffer[Byte]()
    def i16(v: Int): Unit = { b += (v >> 8).toByte; b += v.toByte }
    def i32(v: Int): Unit = (24 to 0 by -8).foreach(s => b += (v >> s).toByte)
    def i64(v: Long): Unit = (56 to 0 by -8).foreach(s => b += (v >> s).toByte)
    def str(s: String): Unit = {
      val bytes = s.getBytes("UTF-8"); i16(bytes.length); b ++= bytes
    }
    i16(1); i16(4)                         // Fetch, version 4
    i32(corr); str(clientId)               // request header v1
    i32(-1)                                // replica_id: consumer
    i32(0)                                 // max_wait_ms
    i32(1)                                 // min_bytes
    i32(maxBytes)                          // max_bytes (request level)
    b += 0                                 // isolation_level: read_uncommitted
    i32(1); str(topic)                     // one topic
    i32(1); i32(partition)                 // one partition
    i64(offset); i32(maxBytes)             // fetch_offset, partition_max_bytes
    val out = ByteBuffer.allocate(4 + b.length)
    out.putInt(b.length); out.put(b.toArray); out.array()
  }

  final case class FetchReq(correlationId: Int, clientId: String,
                            topic: String, partition: Int,
                            offset: Long, maxBytes: Int)

  /** Parse one Fetch v4 request payload (no size prefix); only the first
    * (topic, partition) is served — the live gate fetches one at a time. */
  def parseFetch(payload: Array[Byte]): Option[FetchReq] = try {
    val buf = ByteBuffer.wrap(payload)
    val apiKey = buf.getShort(); val apiVersion = buf.getShort()
    if (apiKey != 1 || apiVersion != 4) return None
    val corr = buf.getInt()
    val cidLen = buf.getShort() & 0xffff
    val cid = takeBytes(buf, cidLen)
    buf.getInt(); buf.getInt(); buf.getInt()  // replica, max_wait, min_bytes
    val reqMax = buf.getInt()
    buf.get()                              // isolation
    val nTopics = buf.getInt()
    if (nTopics < 1) return None
    val tLen = buf.getShort() & 0xffff
    val t = takeBytes(buf, tLen)
    val nParts = buf.getInt()
    if (nParts < 1) return None
    val partition = buf.getInt()
    val offset = buf.getLong()
    val pMax = buf.getInt()
    Some(FetchReq(corr, new String(cid, "UTF-8"), new String(t, "UTF-8"),
      partition, offset, math.min(reqMax, pMax)))
  } catch { case _: Exception => None }

  /** Fetch v4 response for one (topic, partition): throttle, then the
    * topic/partition envelope around (error, high watermark, last stable
    * offset, no aborted txns, record set). Size-prefixed socket bytes. */
  def encodeFetchResponse(corr: Int, topic: String, partition: Int,
                          hw: Long, recordSet: Array[Byte]): Array[Byte] = {
    val b = mutable.ArrayBuffer[Byte]()
    def i16(v: Int): Unit = { b += (v >> 8).toByte; b += v.toByte }
    def i32(v: Int): Unit = (24 to 0 by -8).foreach(s => b += (v >> s).toByte)
    def i64(v: Long): Unit = (56 to 0 by -8).foreach(s => b += (v >> s).toByte)
    i32(corr)                              // response header v0
    i32(0)                                 // throttle_time_ms
    i32(1)                                 // one topic
    val t = topic.getBytes("UTF-8"); i16(t.length); b ++= t
    i32(1)                                 // one partition
    i32(partition); i16(0)                 // error_code: none
    i64(hw); i64(hw)                       // high watermark, last stable
    i32(0)                                 // aborted_transactions: empty
    i32(recordSet.length); b ++= recordSet
    val out = ByteBuffer.allocate(4 + b.length)
    out.putInt(b.length); out.put(b.toArray); out.array()
  }

  /** Decode a Fetch v4 response payload (no size prefix) →
    * (highWatermark, recordSet bytes). */
  def decodeFetchResponse(payload: Array[Byte]): (Long, Array[Byte]) = {
    val buf = ByteBuffer.wrap(payload)
    buf.getInt(); buf.getInt()             // correlation, throttle
    val nTopics = buf.getInt()
    require(nTopics >= 1, "empty fetch response")
    val tLen = buf.getShort() & 0xffff
    buf.position(buf.position() + tLen)
    buf.getInt()                           // partition count
    buf.getInt()                           // partition index
    val err = buf.getShort()
    require(err == 0, s"fetch error $err")
    val hw = buf.getLong()
    buf.getLong()                          // last stable offset
    val nAborted = buf.getInt()
    buf.position(buf.position() + nAborted * 12)
    val rsLen = buf.getInt()
    val rs = takeBytes(buf, math.max(0, rsLen))
    (hw, rs)
  }

  /** Split a fetched record set into its RecordBatches:
    * (absolute baseOffset, decoded records) per batch — the consumer-side
    * walk that turns log bytes back into offset-addressed records. */
  def decodeBatches(recordSet: Array[Byte]): Seq[(Long, Seq[Record])] = {
    val out = mutable.Buffer[(Long, Seq[Record])]()
    val buf = ByteBuffer.wrap(recordSet)
    var ok = true
    while (ok && buf.remaining() >= 12) {
      val baseOffset = buf.getLong(buf.position())
      val batchLen = buf.getInt(buf.position() + 8)
      val total = 12 + batchLen
      if (batchLen <= 0 || buf.remaining() < total) ok = false
      else {
        val batch = new Array[Byte](total)
        buf.get(batch)
        out += ((baseOffset, decodeBatch(batch)))
      }
    }
    out.toSeq
  }

  // ---- Metadata v0 + ListOffsets v1 (consumer discovery) -------------
  // The calls a real consumer makes before its first fetch: Metadata for
  // the partition map, ListOffsets(-1) for the log-end offsets. Both in
  // their non-flexible versions (plain i16/i32 arrays).

  /** Metadata v0 request; empty `topics` = all topics (the v0 rule). */
  def encodeMetadata(corr: Int, clientId: String,
                     topics: Seq[String]): Array[Byte] = {
    val b = mutable.ArrayBuffer[Byte]()
    def i16(v: Int): Unit = { b += (v >> 8).toByte; b += v.toByte }
    def i32(v: Int): Unit = (24 to 0 by -8).foreach(s => b += (v >> s).toByte)
    def str(s: String): Unit = {
      val x = s.getBytes("UTF-8"); i16(x.length); b ++= x
    }
    i16(3); i16(0); i32(corr); str(clientId)
    i32(topics.size); topics.foreach(str)
    val out = ByteBuffer.allocate(4 + b.length)
    out.putInt(b.length); out.put(b.toArray); out.array()
  }

  /** Parse a Metadata v0 request payload → requested topics (empty =
    * all). None for other keys/versions or malformed bodies. */
  def parseMetadata(payload: Array[Byte]): Option[(Int, Seq[String])] =
    try {
      val buf = ByteBuffer.wrap(payload)
      if (buf.getShort() != 3 || buf.getShort() != 0) return None
      val corr = buf.getInt()
      val cidLen = buf.getShort() & 0xffff
      buf.position(buf.position() + cidLen)
      val n = buf.getInt()
      if (n < 0 || n > (1 << 16)) return None
      Some((corr, (0 until n).map { _ =>
        new String(takeBytes(buf, buf.getShort() & 0xffff), "UTF-8")
      }))
    } catch { case _: Exception => None }

  /** Metadata v0 response: one broker (node 0) + the topic/partition
    * map, every partition led by node 0 with itself as replica+isr. */
  def encodeMetadataResponse(corr: Int, host: String, port: Int,
      topics: Seq[(String, Seq[Int])]): Array[Byte] = {
    val b = mutable.ArrayBuffer[Byte]()
    def i16(v: Int): Unit = { b += (v >> 8).toByte; b += v.toByte }
    def i32(v: Int): Unit = (24 to 0 by -8).foreach(s => b += (v >> s).toByte)
    def str(s: String): Unit = {
      val x = s.getBytes("UTF-8"); i16(x.length); b ++= x
    }
    i32(corr)
    i32(1); i32(0); str(host); i32(port)   // brokers: [node 0]
    i32(topics.size)
    topics.foreach { case (t, parts) =>
      i16(0); str(t)                       // topic error, name
      i32(parts.size)
      parts.foreach { p =>
        i16(0); i32(p); i32(0)             // error, partition, leader
        i32(1); i32(0)                     // replicas [0]
        i32(1); i32(0)                     // isr [0]
      }
    }
    val out = ByteBuffer.allocate(4 + b.length)
    out.putInt(b.length); out.put(b.toArray); out.array()
  }

  /** Decode a Metadata v0 response payload → (topic, partitions). */
  def decodeMetadataResponse(payload: Array[Byte])
      : Seq[(String, Seq[Int])] = {
    val buf = ByteBuffer.wrap(payload)
    buf.getInt()                           // correlation id
    val nBrokers = buf.getInt()
    (0 until nBrokers).foreach { _ =>
      buf.getInt()                         // node
      locally { val skipLen = buf.getShort() & 0xffff; buf.position(buf.position() + skipLen) }
      buf.getInt()                         // port
    }
    val nTopics = buf.getInt()
    (0 until nTopics).map { _ =>
      buf.getShort()                       // topic error
      val t = new String(takeBytes(buf, buf.getShort() & 0xffff), "UTF-8")
      val nParts = buf.getInt()
      val parts = (0 until nParts).map { _ =>
        buf.getShort()                     // error
        val p = buf.getInt()
        buf.getInt()                       // leader
        locally { val skipN = buf.getInt(); buf.position(buf.position() + 4 * skipN) }  // replicas
        locally { val skipN = buf.getInt(); buf.position(buf.position() + 4 * skipN) }  // isr
        p
      }
      (t, parts)
    }
  }

  /** ListOffsets v1 request for ONE (topic, partition); timestamp -1 =
    * latest (the log-end offset a consumer seeks before fetching). */
  def encodeListOffsets(corr: Int, clientId: String, topic: String,
                        partition: Int, timestamp: Long): Array[Byte] = {
    val b = mutable.ArrayBuffer[Byte]()
    def i16(v: Int): Unit = { b += (v >> 8).toByte; b += v.toByte }
    def i32(v: Int): Unit = (24 to 0 by -8).foreach(s => b += (v >> s).toByte)
    def i64(v: Long): Unit = (56 to 0 by -8).foreach(s => b += (v >> s).toByte)
    def str(s: String): Unit = {
      val x = s.getBytes("UTF-8"); i16(x.length); b ++= x
    }
    i16(2); i16(1); i32(corr); str(clientId)
    i32(-1)                                // replica_id: consumer
    i32(1); str(topic)
    i32(1); i32(partition); i64(timestamp)
    val out = ByteBuffer.allocate(4 + b.length)
    out.putInt(b.length); out.put(b.toArray); out.array()
  }

  /** Parse a ListOffsets v1 request → (corr, topic, partition, ts). */
  def parseListOffsets(payload: Array[Byte])
      : Option[(Int, String, Int, Long)] = try {
    val buf = ByteBuffer.wrap(payload)
    if (buf.getShort() != 2 || buf.getShort() != 1) return None
    val corr = buf.getInt()
    locally { val skipLen = buf.getShort() & 0xffff; buf.position(buf.position() + skipLen) }
    buf.getInt()                           // replica id
    if (buf.getInt() < 1) return None
    val t = new String(takeBytes(buf, buf.getShort() & 0xffff), "UTF-8")
    if (buf.getInt() < 1) return None
    Some((corr, t, buf.getInt(), buf.getLong()))
  } catch { case _: Exception => None }

  /** ListOffsets v1 response for one (topic, partition). */
  def encodeListOffsetsResponse(corr: Int, topic: String, partition: Int,
                                offset: Long): Array[Byte] = {
    val b = mutable.ArrayBuffer[Byte]()
    def i16(v: Int): Unit = { b += (v >> 8).toByte; b += v.toByte }
    def i32(v: Int): Unit = (24 to 0 by -8).foreach(s => b += (v >> s).toByte)
    def i64(v: Long): Unit = (56 to 0 by -8).foreach(s => b += (v >> s).toByte)
    i32(corr)
    i32(1)
    val t = topic.getBytes("UTF-8"); i16(t.length); b ++= t
    i32(1); i32(partition); i16(0)         // error: none
    i64(-1L)                               // timestamp
    i64(offset)
    val out = ByteBuffer.allocate(4 + b.length)
    out.putInt(b.length); out.put(b.toArray); out.array()
  }

  /** Decode a ListOffsets v1 response → the offset. */
  def decodeListOffsetsResponse(payload: Array[Byte]): Long = {
    val buf = ByteBuffer.wrap(payload)
    buf.getInt()                           // correlation
    require(buf.getInt() >= 1, "empty ListOffsets response")
    locally { val skipLen = buf.getShort() & 0xffff; buf.position(buf.position() + skipLen) }
    require(buf.getInt() >= 1, "no partitions in ListOffsets response")
    buf.getInt()                           // partition
    val err = buf.getShort()
    require(err == 0, s"ListOffsets error $err")
    buf.getLong()                          // timestamp
    buf.getLong()
  }

  // ---- consumer groups: FindCoordinator v0 + OffsetCommit/Fetch v0 ---
  // The offset-commit recovery path pmacct's librdkafka consumers use
  // (kafka_common.c consumer config `group.id`): a restarted consumer
  // asks the group coordinator for its last committed offsets instead
  // of trusting any local state. v0 = the original non-flexible
  // encodings (plain i16-length strings and i32 arrays).

  /** FindCoordinator v0 (api 10): group key → coordinator node. */
  def encodeFindCoordinator(corr: Int, clientId: String,
                            group: String): Array[Byte] = {
    val b = mutable.ArrayBuffer[Byte]()
    def i16(v: Int): Unit = { b += (v >> 8).toByte; b += v.toByte }
    def i32(v: Int): Unit = (24 to 0 by -8).foreach(s => b += (v >> s).toByte)
    def str(s: String): Unit = {
      val x = s.getBytes("UTF-8"); i16(x.length); b ++= x
    }
    i16(10); i16(0); i32(corr); str(clientId)
    str(group)
    val out = ByteBuffer.allocate(4 + b.length)
    out.putInt(b.length); out.put(b.toArray); out.array()
  }

  /** Broker-side parse: (corr, groupId). */
  def parseFindCoordinator(payload: Array[Byte])
      : Option[(Int, String)] = try {
    val buf = ByteBuffer.wrap(payload)
    if (buf.getShort() != 10 || buf.getShort() != 0) return None
    val corr = buf.getInt()
    takeBytes(buf, buf.getShort() & 0xffff) // client id
    val g = takeBytes(buf, buf.getShort() & 0xffff)
    Some((corr, new String(g, "UTF-8")))
  } catch { case _: Exception => None }

  /** FindCoordinator v0 response: error, node id, host, port. */
  def encodeFindCoordinatorResponse(corr: Int, error: Int, nodeId: Int,
                                    host: String, port: Int)
      : Array[Byte] = {
    val h = host.getBytes("UTF-8")
    val b = ByteBuffer.allocate(4 + 4 + 2 + 4 + 2 + h.length + 4)
    b.putInt(4 + 2 + 4 + 2 + h.length + 4); b.putInt(corr)
    b.putShort(error.toShort); b.putInt(nodeId)
    b.putShort(h.length.toShort); b.put(h); b.putInt(port)
    b.array()
  }

  /** Client-side: (error, nodeId, host, port). */
  def decodeFindCoordinatorResponse(payload: Array[Byte])
      : (Int, Int, String, Int) = {
    val buf = ByteBuffer.wrap(payload)
    buf.getInt()                           // correlation
    val err = buf.getShort().toInt
    val node = buf.getInt()
    val host = new String(takeBytes(buf, buf.getShort() & 0xffff), "UTF-8")
    (err, node, host, buf.getInt())
  }

  /** OffsetCommit v0 (api 8) for one topic: commit each (partition,
    * offset) under the group. */
  def encodeOffsetCommit(corr: Int, clientId: String, group: String,
                         topic: String, offsets: Seq[(Int, Long)])
      : Array[Byte] = {
    val b = mutable.ArrayBuffer[Byte]()
    def i16(v: Int): Unit = { b += (v >> 8).toByte; b += v.toByte }
    def i32(v: Int): Unit = (24 to 0 by -8).foreach(s => b += (v >> s).toByte)
    def i64(v: Long): Unit = (56 to 0 by -8).foreach(s => b += (v >> s).toByte)
    def str(s: String): Unit = {
      val x = s.getBytes("UTF-8"); i16(x.length); b ++= x
    }
    i16(8); i16(0); i32(corr); str(clientId)
    str(group)
    i32(1); str(topic)                     // one topic
    i32(offsets.size)
    offsets.foreach { case (p, off) =>
      i32(p); i64(off); str("")            // partition, offset, metadata
    }
    val out = ByteBuffer.allocate(4 + b.length)
    out.putInt(b.length); out.put(b.toArray); out.array()
  }

  /** Broker-side parse: (corr, group, topic, Seq(partition, offset)). */
  def parseOffsetCommit(payload: Array[Byte])
      : Option[(Int, String, String, Seq[(Int, Long)])] = try {
    val buf = ByteBuffer.wrap(payload)
    if (buf.getShort() != 8 || buf.getShort() != 0) return None
    val corr = buf.getInt()
    takeBytes(buf, buf.getShort() & 0xffff) // client id
    val g = new String(takeBytes(buf, buf.getShort() & 0xffff), "UTF-8")
    val nTopics = buf.getInt()
    if (nTopics < 1) return None
    val t = new String(takeBytes(buf, buf.getShort() & 0xffff), "UTF-8")
    val nParts = buf.getInt()
    val offs = (0 until nParts).map { _ =>
      val p = buf.getInt(); val off = buf.getLong()
      takeBytes(buf, buf.getShort() & 0xffff) // metadata
      (p, off)
    }
    Some((corr, g, t, offs))
  } catch { case _: Exception => None }

  /** OffsetCommit v0 response: per-partition error codes. */
  def encodeOffsetCommitResponse(corr: Int, topic: String,
                                 parts: Seq[(Int, Int)]): Array[Byte] = {
    val b = mutable.ArrayBuffer[Byte]()
    def i16(v: Int): Unit = { b += (v >> 8).toByte; b += v.toByte }
    def i32(v: Int): Unit = (24 to 0 by -8).foreach(s => b += (v >> s).toByte)
    i32(corr)
    i32(1)
    val t = topic.getBytes("UTF-8"); i16(t.length); b ++= t
    i32(parts.size)
    parts.foreach { case (p, err) => i32(p); i16(err) }
    val out = ByteBuffer.allocate(4 + b.length)
    out.putInt(b.length); out.put(b.toArray); out.array()
  }

  /** Client-side: per-partition (partition, error). */
  def decodeOffsetCommitResponse(payload: Array[Byte])
      : Seq[(Int, Int)] = {
    val buf = ByteBuffer.wrap(payload)
    buf.getInt()                           // correlation
    require(buf.getInt() >= 1, "empty OffsetCommit response")
    locally { val l = buf.getShort() & 0xffff; buf.position(buf.position() + l) }
    val n = buf.getInt()
    (0 until n).map(_ => (buf.getInt(), buf.getShort().toInt))
  }

  /** OffsetFetch v0 (api 9) for one topic's partitions. */
  def encodeOffsetFetch(corr: Int, clientId: String, group: String,
                        topic: String, parts: Seq[Int]): Array[Byte] = {
    val b = mutable.ArrayBuffer[Byte]()
    def i16(v: Int): Unit = { b += (v >> 8).toByte; b += v.toByte }
    def i32(v: Int): Unit = (24 to 0 by -8).foreach(s => b += (v >> s).toByte)
    def str(s: String): Unit = {
      val x = s.getBytes("UTF-8"); i16(x.length); b ++= x
    }
    i16(9); i16(0); i32(corr); str(clientId)
    str(group)
    i32(1); str(topic)
    i32(parts.size); parts.foreach(i32)
    val out = ByteBuffer.allocate(4 + b.length)
    out.putInt(b.length); out.put(b.toArray); out.array()
  }

  /** Broker-side parse: (corr, group, topic, partitions). */
  def parseOffsetFetch(payload: Array[Byte])
      : Option[(Int, String, String, Seq[Int])] = try {
    val buf = ByteBuffer.wrap(payload)
    if (buf.getShort() != 9 || buf.getShort() != 0) return None
    val corr = buf.getInt()
    takeBytes(buf, buf.getShort() & 0xffff) // client id
    val g = new String(takeBytes(buf, buf.getShort() & 0xffff), "UTF-8")
    val nTopics = buf.getInt()
    if (nTopics < 1) return None
    val t = new String(takeBytes(buf, buf.getShort() & 0xffff), "UTF-8")
    val n = buf.getInt()
    Some((corr, g, t, (0 until n).map(_ => buf.getInt())))
  } catch { case _: Exception => None }

  /** OffsetFetch v0 response: (partition, offset, error) per partition;
    * offset -1 = nothing committed (the consumer falls back to its
    * auto.offset.reset policy, exactly like librdkafka). */
  def encodeOffsetFetchResponse(corr: Int, topic: String,
                                parts: Seq[(Int, Long, Int)])
      : Array[Byte] = {
    val b = mutable.ArrayBuffer[Byte]()
    def i16(v: Int): Unit = { b += (v >> 8).toByte; b += v.toByte }
    def i32(v: Int): Unit = (24 to 0 by -8).foreach(s => b += (v >> s).toByte)
    def i64(v: Long): Unit = (56 to 0 by -8).foreach(s => b += (v >> s).toByte)
    i32(corr)
    i32(1)
    val t = topic.getBytes("UTF-8"); i16(t.length); b ++= t
    i32(parts.size)
    parts.foreach { case (p, off, err) =>
      i32(p); i64(off); i16(0) /* metadata "" */ ; i16(err)
    }
    val out = ByteBuffer.allocate(4 + b.length)
    out.putInt(b.length); out.put(b.toArray); out.array()
  }

  /** Client-side: (partition, committedOffset, error) per partition. */
  def decodeOffsetFetchResponse(payload: Array[Byte])
      : Seq[(Int, Long, Int)] = {
    val buf = ByteBuffer.wrap(payload)
    buf.getInt()                           // correlation
    require(buf.getInt() >= 1, "empty OffsetFetch response")
    locally { val l = buf.getShort() & 0xffff; buf.position(buf.position() + l) }
    val n = buf.getInt()
    (0 until n).map { _ =>
      val p = buf.getInt(); val off = buf.getLong()
      locally { val l = buf.getShort() & 0xffff; buf.position(buf.position() + l) }
      (p, off, buf.getShort().toInt)
    }
  }

  /** Walk a socket stream of size-prefixed Produce v9 requests like the
    * broker's network thread; short/garbage tails stop the walk, CRC-bad
    * batches drop (decodeBatch contract). */
  def decodeStream(bytes: Array[Byte]): Seq[Produced] = {
    val out = mutable.Buffer[Produced]()
    val buf = ByteBuffer.wrap(bytes)
    var ok = true
    while (ok && buf.remaining() >= 4) {
      val size = buf.getInt()
      val mark = out.length
      if (size < 10 || size > buf.remaining()) ok = false
      else try {
        val end = buf.position() + size
        val apiKey = buf.getShort()
        val apiVersion = buf.getShort()
        val corr = buf.getInt()
        val cidLen = buf.getShort() & 0xffff
        val cid = takeBytes(buf, cidLen)
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
            val t = takeBytes(buf, tLen)
            val topic = new String(t, "UTF-8")
            val nParts = readUVarint(buf) - 1
            (0 until nParts).foreach { _ =>
              val partition = buf.getInt()
              val rLen = readUVarint(buf) - 1
              val batch = takeBytes(buf, math.max(0, rLen))
              readUVarint(buf)             // partition tagged fields
              out += Produced(corr, new String(cid, "UTF-8"), topic,
                partition, decodeBatch(batch))
            }
            readUVarint(buf)               // topic tagged fields
          }
          buf.position(end)
        }
      } catch {
        // A malformed interior frame (e.g. a compact-varint length past
        // the buffer) ends the walk like a garbage tail, never throws;
        // the failing frame contributes nothing.
        case _: RuntimeException =>
          out.remove(mark, out.length - mark)
          ok = false
      }
    }
    out.toSeq
  }
  // ---- group membership: JoinGroup/SyncGroup v0 + Heartbeat v0 ------
  // The coordination half of the consumer-group story (OffsetCommit/
  // Fetch above are the offsets half): members JOIN, the broker elects
  // the FIRST joiner leader and hands it the member list, the leader
  // computes assignments client-side (the Kafka design: the broker is
  // policy-free) and SYNCs them back, every member receives its share.
  // Assignments travel as the real ConsumerProtocolAssignment bytes.

  /** JoinGroup v0 (api 11) request. memberId is empty on first join;
    * a REJOIN after a rebalance signal carries the existing id. The
    * session timeout is what the coordinator's liveness sweep holds
    * each member to (heartbeats overdue by more than it → eviction). */
  def encodeJoinGroup(corr: Int, clientId: String, group: String,
                      memberId: String, topic: String,
                      sessionTimeoutMs: Int = 30000): Array[Byte] =
    encodeJoinGroupTopics(corr, clientId, group, memberId, Seq(topic),
      sessionTimeoutMs)

  /** JoinGroup v0 with a MULTI-topic subscription — the
    * ConsumerProtocolSubscription topic array is the real consumer's
    * subscription set; the leader-side assignor reads it back per
    * member (subscriptions in a group need not be identical). */
  def encodeJoinGroupTopics(corr: Int, clientId: String, group: String,
                            memberId: String, topics: Seq[String],
                            sessionTimeoutMs: Int = 30000): Array[Byte] = {
    val b = mutable.ArrayBuffer[Byte]()
    def i16(v: Int): Unit = { b += (v >> 8).toByte; b += v.toByte }
    def i32(v: Int): Unit = (24 to 0 by -8).foreach(s => b += (v >> s).toByte)
    def str(s: String): Unit = {
      val x = s.getBytes("UTF-8"); i16(x.length); b ++= x
    }
    i16(11); i16(0); i32(corr); str(clientId)
    str(group); i32(sessionTimeoutMs); str(memberId); str("consumer")
    i32(1)                                  // one supported protocol
    str("range")
    // ConsumerProtocolSubscription v0: version, [topics], userdata
    val meta = mutable.ArrayBuffer[Byte]()
    def m16(v: Int): Unit = {
      meta += (v >> 8).toByte; meta += v.toByte
    }
    m16(0)                                  // version 0
    (24 to 0 by -8).foreach(s => meta += (topics.size >> s).toByte)
    topics.foreach { topic =>
      val t = topic.getBytes("UTF-8"); m16(t.length); meta ++= t
    }
    (0 until 4).foreach(_ => meta += 0xff.toByte) // null userdata
    i32(meta.length); b ++= meta            // metadata as bytes
    val out = ByteBuffer.allocate(4 + b.length)
    out.putInt(b.length); out.put(b.toArray); out.array()
  }

  /** Decode ConsumerProtocolSubscription v0 → subscribed topics (the
    * leader-side read of each member's JoinGroup metadata). */
  def decodeSubscription(bytes: Array[Byte]): Option[Seq[String]] =
    try {
      val buf = ByteBuffer.wrap(bytes)
      if (buf.getShort() != 0) return None
      val n = buf.getInt()
      if (n < 0 || n > 1024) return None
      Some((0 until n).map(_ =>
        new String(takeBytes(buf, buf.getShort() & 0xffff), "UTF-8")))
    } catch { case _: Exception => None }

  /** Broker-side parse: (corr, group, memberId, protocol metadata,
    * session timeout ms). */
  def parseJoinGroup(payload: Array[Byte])
      : Option[(Int, String, String, Array[Byte], Int)] = try {
    val buf = ByteBuffer.wrap(payload)
    if (buf.getShort() != 11 || buf.getShort() != 0) return None
    val corr = buf.getInt()
    takeBytes(buf, buf.getShort() & 0xffff) // client id
    val g = new String(takeBytes(buf, buf.getShort() & 0xffff), "UTF-8")
    val sessionTimeout = buf.getInt()
    val member = new String(takeBytes(buf, buf.getShort() & 0xffff),
      "UTF-8")
    takeBytes(buf, buf.getShort() & 0xffff) // protocol type
    val n = buf.getInt()
    if (n < 1) return None
    takeBytes(buf, buf.getShort() & 0xffff) // protocol name
    val meta = takeBytes(buf, buf.getInt())
    Some((corr, g, member, meta, sessionTimeout))
  } catch { case _: Exception => None }

  /** JoinGroup v0 response; `members` non-empty only for the leader. */
  def encodeJoinGroupResponse(corr: Int, error: Int, generation: Int,
                              leaderId: String, memberId: String,
                              members: Seq[(String, Array[Byte])])
      : Array[Byte] = {
    val b = mutable.ArrayBuffer[Byte]()
    def i16(v: Int): Unit = { b += (v >> 8).toByte; b += v.toByte }
    def i32(v: Int): Unit = (24 to 0 by -8).foreach(s => b += (v >> s).toByte)
    def str(s: String): Unit = {
      val x = s.getBytes("UTF-8"); i16(x.length); b ++= x
    }
    i32(corr)
    i16(error); i32(generation); str("range"); str(leaderId)
    str(memberId)
    i32(members.size)
    members.foreach { case (m, meta) =>
      str(m); i32(meta.length); b ++= meta
    }
    val out = ByteBuffer.allocate(4 + b.length)
    out.putInt(b.length); out.put(b.toArray); out.array()
  }

  /** Client-side: (error, generation, leaderId, memberId, members). */
  def decodeJoinGroupResponse(payload: Array[Byte])
      : (Int, Int, String, String, Seq[(String, Array[Byte])]) = {
    val buf = ByteBuffer.wrap(payload)
    buf.getInt()                            // correlation
    val err = buf.getShort().toInt
    val gen = buf.getInt()
    takeBytes(buf, buf.getShort() & 0xffff) // protocol
    val leader = new String(takeBytes(buf, buf.getShort() & 0xffff),
      "UTF-8")
    val me = new String(takeBytes(buf, buf.getShort() & 0xffff), "UTF-8")
    val n = buf.getInt()
    val ms = (0 until n).map { _ =>
      val m = new String(takeBytes(buf, buf.getShort() & 0xffff), "UTF-8")
      (m, takeBytes(buf, buf.getInt()))
    }
    (err, gen, leader, me, ms)
  }

  /** SyncGroup v0 (api 14): the leader carries every member's
    * assignment; followers carry none. */
  def encodeSyncGroup(corr: Int, clientId: String, group: String,
                      generation: Int, memberId: String,
                      assignments: Seq[(String, Array[Byte])])
      : Array[Byte] = {
    val b = mutable.ArrayBuffer[Byte]()
    def i16(v: Int): Unit = { b += (v >> 8).toByte; b += v.toByte }
    def i32(v: Int): Unit = (24 to 0 by -8).foreach(s => b += (v >> s).toByte)
    def str(s: String): Unit = {
      val x = s.getBytes("UTF-8"); i16(x.length); b ++= x
    }
    i16(14); i16(0); i32(corr); str(clientId)
    str(group); i32(generation); str(memberId)
    i32(assignments.size)
    assignments.foreach { case (m, a) => str(m); i32(a.length); b ++= a }
    val out = ByteBuffer.allocate(4 + b.length)
    out.putInt(b.length); out.put(b.toArray); out.array()
  }

  /** Broker-side parse: (corr, group, generation, memberId,
    * assignments). */
  def parseSyncGroup(payload: Array[Byte])
      : Option[(Int, String, Int, String, Seq[(String, Array[Byte])])] =
    try {
      val buf = ByteBuffer.wrap(payload)
      if (buf.getShort() != 14 || buf.getShort() != 0) return None
      val corr = buf.getInt()
      takeBytes(buf, buf.getShort() & 0xffff) // client id
      val g = new String(takeBytes(buf, buf.getShort() & 0xffff), "UTF-8")
      val gen = buf.getInt()
      val me = new String(takeBytes(buf, buf.getShort() & 0xffff),
        "UTF-8")
      val n = buf.getInt()
      val as = (0 until n).map { _ =>
        val m = new String(takeBytes(buf, buf.getShort() & 0xffff),
          "UTF-8")
        (m, takeBytes(buf, buf.getInt()))
      }
      Some((corr, g, gen, me, as))
    } catch { case _: Exception => None }

  /** SyncGroup v0 response: error + this member's assignment bytes. */
  def encodeSyncGroupResponse(corr: Int, error: Int,
                              assignment: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(4 + 4 + 2 + 4 + assignment.length)
    b.putInt(4 + 2 + 4 + assignment.length); b.putInt(corr)
    b.putShort(error.toShort)
    b.putInt(assignment.length); b.put(assignment)
    b.array()
  }

  /** Client-side: (error, assignment bytes). */
  def decodeSyncGroupResponse(payload: Array[Byte])
      : (Int, Array[Byte]) = {
    val buf = ByteBuffer.wrap(payload)
    buf.getInt()                            // correlation
    val err = buf.getShort().toInt
    (err, takeBytes(buf, buf.getInt()))
  }

  /** ConsumerProtocolAssignment v0: version, [(topic, [partitions])],
    * null userdata — the real bytes a Kafka consumer's leader sends. */
  def encodeAssignment(topic: String, partitions: Seq[Int])
      : Array[Byte] = encodeAssignment(Seq((topic, partitions)))

  /** Multi-topic ConsumerProtocolAssignment v0 — one (topic,
    * [partitions]) entry per assigned topic. */
  def encodeAssignment(entries: Seq[(String, Seq[Int])]): Array[Byte] = {
    val b = mutable.ArrayBuffer[Byte]()
    def i16(v: Int): Unit = { b += (v >> 8).toByte; b += v.toByte }
    def i32(v: Int): Unit = (24 to 0 by -8).foreach(s => b += (v >> s).toByte)
    i16(0)                                  // version
    i32(entries.size)
    entries.foreach { case (topic, partitions) =>
      val t = topic.getBytes("UTF-8"); i16(t.length); b ++= t
      i32(partitions.size); partitions.foreach(i32)
    }
    i32(-1)                                 // null userdata
    val out = new Array[Byte](b.length)
    b.copyToArray(out); out
  }

  /** Decode ConsumerProtocolAssignment v0 → (topic, partitions) of the
    * FIRST entry (the single-topic consumers' view). */
  def decodeAssignment(bytes: Array[Byte]): Option[(String, Seq[Int])] =
    decodeAssignmentAll(bytes).flatMap(_.headOption)

  /** Decode ConsumerProtocolAssignment v0 → every (topic, partitions)
    * entry. An empty assignment (zero topics) is a VALID outcome for a
    * member a rebalance left with nothing. */
  def decodeAssignmentAll(bytes: Array[Byte])
      : Option[Seq[(String, Seq[Int])]] =
    try {
      val buf = ByteBuffer.wrap(bytes)
      if (buf.getShort() != 0) return None
      val nt = buf.getInt()
      if (nt < 0 || nt > 1024) return None
      Some((0 until nt).map { _ =>
        val t = new String(takeBytes(buf, buf.getShort() & 0xffff),
          "UTF-8")
        val n = buf.getInt()
        (t, (0 until n).map(_ => buf.getInt()))
      })
    } catch { case _: Exception => None }

  // ---- Heartbeat v0 (api 12) — the liveness + rebalance channel ----
  // A stable member's heartbeats keep it alive in the coordinator's
  // session-timeout sweep AND are how it LEARNS a rebalance started:
  // error 27 (REBALANCE_IN_PROGRESS) tells it to rejoin, 25
  // (UNKNOWN_MEMBER_ID) that it was evicted, 22 (ILLEGAL_GENERATION)
  // that its generation is stale.

  /** Heartbeat v0 request: (group, generation, memberId). */
  def encodeHeartbeat(corr: Int, clientId: String, group: String,
                      generation: Int, memberId: String): Array[Byte] = {
    val b = mutable.ArrayBuffer[Byte]()
    def i16(v: Int): Unit = { b += (v >> 8).toByte; b += v.toByte }
    def i32(v: Int): Unit = (24 to 0 by -8).foreach(s => b += (v >> s).toByte)
    def str(s: String): Unit = {
      val x = s.getBytes("UTF-8"); i16(x.length); b ++= x
    }
    i16(12); i16(0); i32(corr); str(clientId)
    str(group); i32(generation); str(memberId)
    val out = ByteBuffer.allocate(4 + b.length)
    out.putInt(b.length); out.put(b.toArray); out.array()
  }

  /** Broker-side parse: (corr, group, generation, memberId). */
  def parseHeartbeat(payload: Array[Byte])
      : Option[(Int, String, Int, String)] = try {
    val buf = ByteBuffer.wrap(payload)
    if (buf.getShort() != 12 || buf.getShort() != 0) return None
    val corr = buf.getInt()
    takeBytes(buf, buf.getShort() & 0xffff) // client id
    val g = new String(takeBytes(buf, buf.getShort() & 0xffff), "UTF-8")
    val gen = buf.getInt()
    val member = new String(takeBytes(buf, buf.getShort() & 0xffff),
      "UTF-8")
    Some((corr, g, gen, member))
  } catch { case _: Exception => None }

  /** Heartbeat v0 response: just an error code. */
  def encodeHeartbeatResponse(corr: Int, error: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(4 + 6)
    b.putInt(6); b.putInt(corr); b.putShort(error.toShort)
    b.array()
  }

  /** Client-side: the error code. */
  def decodeHeartbeatResponse(payload: Array[Byte]): Int = {
    val buf = ByteBuffer.wrap(payload)
    buf.getInt()                            // correlation
    buf.getShort().toInt
  }

  // ---- LeaveGroup v0 (api 13) — the graceful-shutdown path ----------
  // A closing consumer tells the coordinator it's gone NOW: the group
  // re-forms immediately instead of waiting out the session timeout
  // (q280's eviction lane). The leaver's committed offsets are the
  // clean handover point for whoever inherits its partitions.

  /** LeaveGroup v0 request: (group, memberId). */
  def encodeLeaveGroup(corr: Int, clientId: String, group: String,
                       memberId: String): Array[Byte] = {
    val b = mutable.ArrayBuffer[Byte]()
    def i16(v: Int): Unit = { b += (v >> 8).toByte; b += v.toByte }
    def i32(v: Int): Unit = (24 to 0 by -8).foreach(s => b += (v >> s).toByte)
    def str(s: String): Unit = {
      val x = s.getBytes("UTF-8"); i16(x.length); b ++= x
    }
    i16(13); i16(0); i32(corr); str(clientId)
    str(group); str(memberId)
    val out = ByteBuffer.allocate(4 + b.length)
    out.putInt(b.length); out.put(b.toArray); out.array()
  }

  /** Broker-side parse: (corr, group, memberId). */
  def parseLeaveGroup(payload: Array[Byte])
      : Option[(Int, String, String)] = try {
    val buf = ByteBuffer.wrap(payload)
    if (buf.getShort() != 13 || buf.getShort() != 0) return None
    val corr = buf.getInt()
    takeBytes(buf, buf.getShort() & 0xffff) // client id
    val g = new String(takeBytes(buf, buf.getShort() & 0xffff), "UTF-8")
    val member = new String(takeBytes(buf, buf.getShort() & 0xffff),
      "UTF-8")
    Some((corr, g, member))
  } catch { case _: Exception => None }

  /** LeaveGroup v0 response: just an error code. */
  def encodeLeaveGroupResponse(corr: Int, error: Int): Array[Byte] =
    encodeHeartbeatResponse(corr, error) // same (corr, i16) shape

  /** Client-side: the error code. */
  def decodeLeaveGroupResponse(payload: Array[Byte]): Int =
    decodeHeartbeatResponse(payload)

  // ---- DescribeGroups v0 (api 15) + ListGroups v0 (api 16) ----------
  // The observability half of the group story: what `kafka-consumer-
  // groups.sh --describe` speaks. DescribeGroups returns coordinator
  // state + full membership (with each member's subscription METADATA
  // and current ASSIGNMENT bytes); ListGroups enumerates group ids.

  final case class GroupMember(memberId: String, clientId: String,
                               clientHost: String,
                               metadata: Array[Byte],
                               assignment: Array[Byte])
  final case class GroupDescription(error: Int, group: String,
                                    state: String, protocolType: String,
                                    protocol: String,
                                    members: Seq[GroupMember])

  /** DescribeGroups v0 request: the group-id list. */
  def encodeDescribeGroups(corr: Int, clientId: String,
                           groupIds: Seq[String]): Array[Byte] = {
    val b = mutable.ArrayBuffer[Byte]()
    def i16(v: Int): Unit = { b += (v >> 8).toByte; b += v.toByte }
    def i32(v: Int): Unit = (24 to 0 by -8).foreach(s => b += (v >> s).toByte)
    def str(s: String): Unit = {
      val x = s.getBytes("UTF-8"); i16(x.length); b ++= x
    }
    i16(15); i16(0); i32(corr); str(clientId)
    i32(groupIds.size); groupIds.foreach(str)
    val out = ByteBuffer.allocate(4 + b.length)
    out.putInt(b.length); out.put(b.toArray); out.array()
  }

  /** Broker-side parse: (corr, groupIds). */
  def parseDescribeGroups(payload: Array[Byte])
      : Option[(Int, Seq[String])] = try {
    val buf = ByteBuffer.wrap(payload)
    if (buf.getShort() != 15 || buf.getShort() != 0) return None
    val corr = buf.getInt()
    takeBytes(buf, buf.getShort() & 0xffff) // client id
    val n = buf.getInt()
    if (n < 0 || n > 1024) return None
    Some((corr, (0 until n).map(_ =>
      new String(takeBytes(buf, buf.getShort() & 0xffff), "UTF-8"))))
  } catch { case _: Exception => None }

  /** DescribeGroups v0 response. */
  def encodeDescribeGroupsResponse(corr: Int,
                                   gs: Seq[GroupDescription])
      : Array[Byte] = {
    val b = mutable.ArrayBuffer[Byte]()
    def i16(v: Int): Unit = { b += (v >> 8).toByte; b += v.toByte }
    def i32(v: Int): Unit = (24 to 0 by -8).foreach(s => b += (v >> s).toByte)
    def str(s: String): Unit = {
      val x = s.getBytes("UTF-8"); i16(x.length); b ++= x
    }
    def bytes(x: Array[Byte]): Unit = { i32(x.length); b ++= x }
    i32(corr)
    i32(gs.size)
    gs.foreach { g =>
      i16(g.error); str(g.group); str(g.state); str(g.protocolType)
      str(g.protocol)
      i32(g.members.size)
      g.members.foreach { m =>
        str(m.memberId); str(m.clientId); str(m.clientHost)
        bytes(m.metadata); bytes(m.assignment)
      }
    }
    val out = ByteBuffer.allocate(4 + b.length)
    out.putInt(b.length); out.put(b.toArray); out.array()
  }

  /** Client-side decode. */
  def decodeDescribeGroupsResponse(payload: Array[Byte])
      : Seq[GroupDescription] = {
    val buf = ByteBuffer.wrap(payload)
    buf.getInt()                            // correlation
    def str(): String =
      new String(takeBytes(buf, buf.getShort() & 0xffff), "UTF-8")
    (0 until buf.getInt()).map { _ =>
      val err = buf.getShort().toInt
      val g = str(); val state = str(); val pt = str(); val proto = str()
      val members = (0 until buf.getInt()).map { _ =>
        val id = str(); val cid = str(); val host = str()
        val meta = takeBytes(buf, buf.getInt())
        val asn = takeBytes(buf, buf.getInt())
        GroupMember(id, cid, host, meta, asn)
      }
      GroupDescription(err, g, state, pt, proto, members)
    }
  }

  /** ListGroups v0 request (header only). */
  def encodeListGroups(corr: Int, clientId: String): Array[Byte] = {
    val b = mutable.ArrayBuffer[Byte]()
    def i16(v: Int): Unit = { b += (v >> 8).toByte; b += v.toByte }
    def i32(v: Int): Unit = (24 to 0 by -8).foreach(s => b += (v >> s).toByte)
    def str(s: String): Unit = {
      val x = s.getBytes("UTF-8"); i16(x.length); b ++= x
    }
    i16(16); i16(0); i32(corr); str(clientId)
    val out = ByteBuffer.allocate(4 + b.length)
    out.putInt(b.length); out.put(b.toArray); out.array()
  }

  /** Broker-side parse: the correlation id. */
  def parseListGroups(payload: Array[Byte]): Option[Int] = try {
    val buf = ByteBuffer.wrap(payload)
    if (buf.getShort() != 16 || buf.getShort() != 0) return None
    val corr = buf.getInt()
    takeBytes(buf, buf.getShort() & 0xffff) // client id
    Some(corr)
  } catch { case _: Exception => None }

  /** ListGroups v0 response: [(group, protocolType)]. */
  def encodeListGroupsResponse(corr: Int,
                               gs: Seq[(String, String)]): Array[Byte] = {
    val b = mutable.ArrayBuffer[Byte]()
    def i16(v: Int): Unit = { b += (v >> 8).toByte; b += v.toByte }
    def i32(v: Int): Unit = (24 to 0 by -8).foreach(s => b += (v >> s).toByte)
    def str(s: String): Unit = {
      val x = s.getBytes("UTF-8"); i16(x.length); b ++= x
    }
    i32(corr); i16(0)
    i32(gs.size)
    gs.foreach { case (g, pt) => str(g); str(pt) }
    val out = ByteBuffer.allocate(4 + b.length)
    out.putInt(b.length); out.put(b.toArray); out.array()
  }

  /** Client-side decode: (error, [(group, protocolType)]). */
  def decodeListGroupsResponse(payload: Array[Byte])
      : (Int, Seq[(String, String)]) = {
    val buf = ByteBuffer.wrap(payload)
    buf.getInt()                            // correlation
    val err = buf.getShort().toInt
    def str(): String =
      new String(takeBytes(buf, buf.getShort() & 0xffff), "UTF-8")
    (err, (0 until buf.getInt()).map(_ => (str(), str())))
  }

  // ---- DeleteGroups v0 (api 42) --------------------------------------
  // The admin tail of the group family: a consumed-out group (all
  // members left, offsets retained) is removed along with its
  // committed offsets; a LIVE group refuses with NON_EMPTY_GROUP (68),
  // an unknown id with GROUP_ID_NOT_FOUND (69).

  /** DeleteGroups v0 request: the group-id list. */
  def encodeDeleteGroups(corr: Int, clientId: String,
                         groupIds: Seq[String]): Array[Byte] = {
    val b = mutable.ArrayBuffer[Byte]()
    def i16(v: Int): Unit = { b += (v >> 8).toByte; b += v.toByte }
    def i32(v: Int): Unit = (24 to 0 by -8).foreach(s => b += (v >> s).toByte)
    def str(s: String): Unit = {
      val x = s.getBytes("UTF-8"); i16(x.length); b ++= x
    }
    i16(42); i16(0); i32(corr); str(clientId)
    i32(groupIds.size); groupIds.foreach(str)
    val out = ByteBuffer.allocate(4 + b.length)
    out.putInt(b.length); out.put(b.toArray); out.array()
  }

  /** Broker-side parse: (corr, groupIds). */
  def parseDeleteGroups(payload: Array[Byte])
      : Option[(Int, Seq[String])] = try {
    val buf = ByteBuffer.wrap(payload)
    if (buf.getShort() != 42 || buf.getShort() != 0) return None
    val corr = buf.getInt()
    takeBytes(buf, buf.getShort() & 0xffff) // client id
    val n = buf.getInt()
    if (n < 0 || n > 1024) return None
    Some((corr, (0 until n).map(_ =>
      new String(takeBytes(buf, buf.getShort() & 0xffff), "UTF-8"))))
  } catch { case _: Exception => None }

  /** DeleteGroups v0 response: throttle + [(group, error)]. */
  def encodeDeleteGroupsResponse(corr: Int,
                                 results: Seq[(String, Int)])
      : Array[Byte] = {
    val b = mutable.ArrayBuffer[Byte]()
    def i16(v: Int): Unit = { b += (v >> 8).toByte; b += v.toByte }
    def i32(v: Int): Unit = (24 to 0 by -8).foreach(s => b += (v >> s).toByte)
    def str(s: String): Unit = {
      val x = s.getBytes("UTF-8"); i16(x.length); b ++= x
    }
    i32(corr); i32(0) // throttle_time_ms
    i32(results.size)
    results.foreach { case (g, e) => str(g); i16(e) }
    val out = ByteBuffer.allocate(4 + b.length)
    out.putInt(b.length); out.put(b.toArray); out.array()
  }

  /** Client-side decode: [(group, error)]. */
  def decodeDeleteGroupsResponse(payload: Array[Byte])
      : Seq[(String, Int)] = {
    val buf = ByteBuffer.wrap(payload)
    buf.getInt(); buf.getInt()              // correlation, throttle
    (0 until buf.getInt()).map { _ =>
      val g = new String(takeBytes(buf, buf.getShort() & 0xffff),
        "UTF-8")
      (g, buf.getShort().toInt)
    }
  }

  // ---- SaslHandshake v1 (api 17) + SaslAuthenticate v0 (api 36) -----
  // The auth path the reference documents for Confluent Cloud
  // (QUICKSTART: kafka_config_file `security.protocol SASL_SSL` +
  // `sasl.mechanisms PLAIN` via librdkafka): the client handshakes a
  // mechanism, then ships the RFC 4616 PLAIN token ([authzid] NUL
  // authcid NUL passwd) inside a SaslAuthenticate frame.

  /** SaslHandshake v1 request: the mechanism name. */
  def encodeSaslHandshake(corr: Int, clientId: String,
                          mechanism: String): Array[Byte] = {
    val b = mutable.ArrayBuffer[Byte]()
    def i16(v: Int): Unit = { b += (v >> 8).toByte; b += v.toByte }
    def i32(v: Int): Unit = (24 to 0 by -8).foreach(s => b += (v >> s).toByte)
    def str(s: String): Unit = {
      val x = s.getBytes("UTF-8"); i16(x.length); b ++= x
    }
    i16(17); i16(1); i32(corr); str(clientId); str(mechanism)
    val out = ByteBuffer.allocate(4 + b.length)
    out.putInt(b.length); out.put(b.toArray); out.array()
  }

  /** Broker-side parse: (corr, mechanism). */
  def parseSaslHandshake(payload: Array[Byte])
      : Option[(Int, String)] = try {
    val buf = ByteBuffer.wrap(payload)
    if (buf.getShort() != 17 || buf.getShort() != 1) return None
    val corr = buf.getInt()
    takeBytes(buf, buf.getShort() & 0xffff) // client id
    Some((corr,
      new String(takeBytes(buf, buf.getShort() & 0xffff), "UTF-8")))
  } catch { case _: Exception => None }

  /** SaslHandshake response: error + enabled mechanisms. */
  def encodeSaslHandshakeResponse(corr: Int, error: Int,
                                  mechanisms: Seq[String]): Array[Byte] = {
    val b = mutable.ArrayBuffer[Byte]()
    def i16(v: Int): Unit = { b += (v >> 8).toByte; b += v.toByte }
    def i32(v: Int): Unit = (24 to 0 by -8).foreach(s => b += (v >> s).toByte)
    def str(s: String): Unit = {
      val x = s.getBytes("UTF-8"); i16(x.length); b ++= x
    }
    i32(corr); i16(error)
    i32(mechanisms.size); mechanisms.foreach(str)
    val out = ByteBuffer.allocate(4 + b.length)
    out.putInt(b.length); out.put(b.toArray); out.array()
  }

  /** Client-side: (error, enabled mechanisms). */
  def decodeSaslHandshakeResponse(payload: Array[Byte])
      : (Int, Seq[String]) = {
    val buf = ByteBuffer.wrap(payload)
    buf.getInt()                            // correlation
    val err = buf.getShort().toInt
    (err, (0 until buf.getInt()).map(_ =>
      new String(takeBytes(buf, buf.getShort() & 0xffff), "UTF-8")))
  }

  /** The RFC 4616 PLAIN token: [authzid] NUL authcid NUL passwd. */
  def saslPlainToken(user: String, pass: String): Array[Byte] =
    Array[Byte](0) ++ user.getBytes("UTF-8") ++
      Array[Byte](0) ++ pass.getBytes("UTF-8")

  /** SaslAuthenticate v0 request: the auth bytes. */
  def encodeSaslAuthenticate(corr: Int, clientId: String,
                             token: Array[Byte]): Array[Byte] = {
    val b = mutable.ArrayBuffer[Byte]()
    def i16(v: Int): Unit = { b += (v >> 8).toByte; b += v.toByte }
    def i32(v: Int): Unit = (24 to 0 by -8).foreach(s => b += (v >> s).toByte)
    def str(s: String): Unit = {
      val x = s.getBytes("UTF-8"); i16(x.length); b ++= x
    }
    i16(36); i16(0); i32(corr); str(clientId)
    i32(token.length); b ++= token
    val out = ByteBuffer.allocate(4 + b.length)
    out.putInt(b.length); out.put(b.toArray); out.array()
  }

  /** Broker-side parse: (corr, token). */
  def parseSaslAuthenticate(payload: Array[Byte])
      : Option[(Int, Array[Byte])] = try {
    val buf = ByteBuffer.wrap(payload)
    if (buf.getShort() != 36 || buf.getShort() != 0) return None
    val corr = buf.getInt()
    takeBytes(buf, buf.getShort() & 0xffff) // client id
    Some((corr, takeBytes(buf, buf.getInt())))
  } catch { case _: Exception => None }

  /** SaslAuthenticate v0 response: error, message, server auth bytes
    * (PLAIN sends none; SCRAM's server-first / server-final challenges
    * ride here). */
  def encodeSaslAuthenticateResponse(corr: Int, error: Int,
                                     message: String,
                                     authBytes: Array[Byte] =
                                       Array.emptyByteArray): Array[Byte] = {
    val b = mutable.ArrayBuffer[Byte]()
    def i16(v: Int): Unit = { b += (v >> 8).toByte; b += v.toByte }
    def i32(v: Int): Unit = (24 to 0 by -8).foreach(s => b += (v >> s).toByte)
    def str(s: String): Unit = {
      val x = s.getBytes("UTF-8"); i16(x.length); b ++= x
    }
    i32(corr); i16(error); str(message)
    i32(authBytes.length); b ++= authBytes
    val out = ByteBuffer.allocate(4 + b.length)
    out.putInt(b.length); out.put(b.toArray); out.array()
  }

  /** Client-side: (error, message). */
  def decodeSaslAuthenticateResponse(payload: Array[Byte])
      : (Int, String) = {
    val (e, m, _) = decodeSaslAuthenticateResponseFull(payload)
    (e, m)
  }

  /** Client-side with the server auth bytes (the SCRAM challenge). */
  def decodeSaslAuthenticateResponseFull(payload: Array[Byte])
      : (Int, String, Array[Byte]) = {
    val buf = ByteBuffer.wrap(payload)
    buf.getInt()                            // correlation
    val err = buf.getShort().toInt
    val msg = new String(takeBytes(buf, buf.getShort() & 0xffff), "UTF-8")
    val ab = if (buf.remaining() >= 4) takeBytes(buf, buf.getInt())
             else Array.emptyByteArray
    (err, msg, ab)
  }

  // ---- OffsetCommit v1 — generation-FENCED commits ------------------
  // v0 carries no group identity beyond the name, so any zombie can
  // overwrite committed offsets. v1 adds (generation, memberId): the
  // coordinator rejects a commit from an evicted member (25) or a
  // stale generation (22) — the fence that makes offsets safe across
  // rebalances.

  /** OffsetCommit v1 (api 8 v1) for one topic. */
  def encodeOffsetCommitV1(corr: Int, clientId: String, group: String,
                           generation: Int, memberId: String,
                           topic: String, offsets: Seq[(Int, Long)])
      : Array[Byte] = {
    val b = mutable.ArrayBuffer[Byte]()
    def i16(v: Int): Unit = { b += (v >> 8).toByte; b += v.toByte }
    def i32(v: Int): Unit = (24 to 0 by -8).foreach(s => b += (v >> s).toByte)
    def i64(v: Long): Unit = (56 to 0 by -8).foreach(s => b += (v >> s).toByte)
    def str(s: String): Unit = {
      val x = s.getBytes("UTF-8"); i16(x.length); b ++= x
    }
    i16(8); i16(1); i32(corr); str(clientId)
    str(group); i32(generation); str(memberId)
    i32(1); str(topic)                     // one topic
    i32(offsets.size)
    offsets.foreach { case (p, off) =>
      i32(p); i64(off); i64(-1L); str("")  // partition, offset, ts, meta
    }
    val out = ByteBuffer.allocate(4 + b.length)
    out.putInt(b.length); out.put(b.toArray); out.array()
  }

  /** Broker-side parse: (corr, group, generation, memberId, topic,
    * Seq(partition, offset)). */
  def parseOffsetCommitV1(payload: Array[Byte])
      : Option[(Int, String, Int, String, String, Seq[(Int, Long)])] =
    try {
      val buf = ByteBuffer.wrap(payload)
      if (buf.getShort() != 8 || buf.getShort() != 1) return None
      val corr = buf.getInt()
      takeBytes(buf, buf.getShort() & 0xffff) // client id
      val g = new String(takeBytes(buf, buf.getShort() & 0xffff), "UTF-8")
      val gen = buf.getInt()
      val member = new String(takeBytes(buf, buf.getShort() & 0xffff),
        "UTF-8")
      val nTopics = buf.getInt()
      if (nTopics < 1) return None
      val t = new String(takeBytes(buf, buf.getShort() & 0xffff), "UTF-8")
      val nParts = buf.getInt()
      val offs = (0 until nParts).map { _ =>
        val p = buf.getInt(); val off = buf.getLong()
        buf.getLong()                        // timestamp
        takeBytes(buf, buf.getShort() & 0xffff) // metadata
        (p, off)
      }
      Some((corr, g, gen, member, t, offs))
    } catch { case _: Exception => None }

  // ---- ConsumerGroupHeartbeat v0 (api 68) — KIP-848 ------------------
  // The next-generation group protocol: no JoinGroup/SyncGroup barrier.
  // Each member heartbeats (member epoch + currently-owned partitions)
  // and the BROKER-side assignor answers with that member's target
  // assignment; reconciliation is per-member and incremental, so a
  // joiner never stops the world. Api 68 is flexible-versions-only:
  // compact (uvarint-length) strings/arrays, tagged-field buffers, and
  // topics addressed by UUID.

  private def writeUvarint(b: mutable.ArrayBuffer[Byte], v0: Int): Unit = {
    var v = v0
    while ((v & ~0x7f) != 0) { b += ((v & 0x7f) | 0x80).toByte; v >>>= 7 }
    b += v.toByte
  }
  private def readUvarint(buf: ByteBuffer): Int = {
    var v = 0; var sh = 0
    var cont = true
    while (cont) {
      val x = buf.get() & 0xff
      v |= (x & 0x7f) << sh; sh += 7
      cont = (x & 0x80) != 0
      if (sh > 35) throw new IllegalArgumentException("uvarint overflow")
    }
    v
  }
  private def compactStr(b: mutable.ArrayBuffer[Byte], s: String): Unit = {
    val x = s.getBytes("UTF-8"); writeUvarint(b, x.length + 1); b ++= x
  }
  private def readCompactStr(buf: ByteBuffer): String = {
    val n = readUvarint(buf) - 1
    if (n <= 0) "" else new String(takeBytes(buf, n), "UTF-8")
  }

  /** Deterministic topic UUID both sides derive from the name (the
    * mini broker's topic-id registry). */
  def topicUuid(topic: String): (Long, Long) = {
    val u = java.util.UUID.nameUUIDFromBytes(
      ("graft-topic:" + topic).getBytes("UTF-8"))
    (u.getMostSignificantBits, u.getLeastSignificantBits)
  }

  /** Client-side request: member epoch −1 leaves the group; owned is
    * the member's CURRENT assignment (post-revocation report);
    * instanceId Some(_) requests STATIC membership (KIP-848 carries
    * KIP-345's group.instance.id on the new wire). A regex
    * subscription (KIP-848's SubscribedTopicRegex, request v1 —
    * resolved BROKER-side against the live topic registry, so new
    * matching topics join the member's assignment with no
    * resubscribe) forces version 1 on the wire. */
  def encodeConsumerGroupHeartbeat(corr: Int, clientId: String,
      group: String, memberId: String, memberEpoch: Int,
      topics: Seq[String], owned: Seq[(String, Seq[Int])],
      instanceId: Option[String] = None,
      topicRegex: Option[String] = None)
      : Array[Byte] = {
    val b = mutable.ArrayBuffer[Byte]()
    def i16(v: Int): Unit = { b += (v >> 8).toByte; b += v.toByte }
    def i32(v: Int): Unit = (24 to 0 by -8).foreach(s => b += (v >> s).toByte)
    def i64(v: Long): Unit = (56 to 0 by -8).foreach(s => b += (v >> s).toByte)
    val version = if (topicRegex.isDefined) 1 else 0
    // flexible request header (v2): classic nullable client id + tags
    i16(68); i16(version); i32(corr)
    val cid = clientId.getBytes("UTF-8"); i16(cid.length); b ++= cid
    writeUvarint(b, 0) // header tagged fields
    compactStr(b, group)
    compactStr(b, memberId)
    i32(memberEpoch)
    instanceId match {
      case Some(iid) => compactStr(b, iid)
      case None => writeUvarint(b, 0) // instance id: null
    }
    writeUvarint(b, 0) // rack id: null
    i32(30000)         // rebalance timeout
    writeUvarint(b, topics.size + 1) // subscribed topic names
    topics.foreach(t => compactStr(b, t))
    if (version >= 1) topicRegex match { // subscribed topic regex
      case Some(re) => compactStr(b, re)
      case None => writeUvarint(b, 0)
    }
    writeUvarint(b, 0) // server assignor: null (broker default)
    writeUvarint(b, owned.size + 1) // owned topic_partitions
    owned.foreach { case (t, ps) =>
      val (hi, lo) = topicUuid(t)
      i64(hi); i64(lo)
      writeUvarint(b, ps.size + 1)
      ps.foreach(i32)
      writeUvarint(b, 0) // struct tagged fields
    }
    writeUvarint(b, 0) // request tagged fields
    val out = ByteBuffer.allocate(4 + b.length)
    out.putInt(b.length); out.put(b.toArray); out.array()
  }

  /** Broker-side parse: (corr, group, memberId, memberEpoch,
    * instanceId, subscribed topics, subscribed topic regex (v1+),
    * owned (topicUuidHi, topicUuidLo, partitions)). */
  def parseConsumerGroupHeartbeat(payload: Array[Byte])
      : Option[(Int, String, String, Int, Option[String], Seq[String],
        Option[String], Seq[(Long, Long, Seq[Int])])] = try {
    val buf = ByteBuffer.wrap(payload)
    if (buf.getShort() != 68) return None
    val version = buf.getShort().toInt
    if (version != 0 && version != 1) return None
    val corr = buf.getInt()
    takeBytes(buf, buf.getShort() & 0xffff) // client id
    readUvarint(buf)                        // header tags
    val group = readCompactStr(buf)
    val member = readCompactStr(buf)
    val epoch = buf.getInt()
    val iidLen = readUvarint(buf) - 1       // instance id
    val instanceId =
      if (iidLen <= 0) None
      else Some(new String(takeBytes(buf, iidLen), "UTF-8"))
    readUvarint(buf)                        // rack id (null)
    buf.getInt()                            // rebalance timeout
    val nt = readUvarint(buf) - 1
    val topics = (0 until math.max(0, nt)).map(_ => readCompactStr(buf))
    val regex =
      if (version < 1) None
      else {
        val rl = readUvarint(buf) - 1
        if (rl <= 0) None
        else Some(new String(takeBytes(buf, rl), "UTF-8"))
      }
    readUvarint(buf)                        // server assignor (null)
    val no = readUvarint(buf) - 1
    val owned = (0 until math.max(0, no)).map { _ =>
      val hi = buf.getLong(); val lo = buf.getLong()
      val np = readUvarint(buf) - 1
      val ps = (0 until math.max(0, np)).map(_ => buf.getInt())
      readUvarint(buf)                      // struct tags
      (hi, lo, ps)
    }
    Some((corr, group, member, epoch, instanceId, topics, regex, owned))
  } catch { case _: Exception => None }

  /** Broker response: error 0 with (memberId, memberEpoch, assignment
    * by topic name — resolved from the deterministic topic UUIDs the
    * wire carries). */
  def encodeConsumerGroupHeartbeatResponse(corr: Int, error: Int,
      memberId: String, memberEpoch: Int,
      assignment: Seq[(String, Seq[Int])]): Array[Byte] = {
    val b = mutable.ArrayBuffer[Byte]()
    def i16(v: Int): Unit = { b += (v >> 8).toByte; b += v.toByte }
    def i32(v: Int): Unit = (24 to 0 by -8).foreach(s => b += (v >> s).toByte)
    def i64(v: Long): Unit = (56 to 0 by -8).foreach(s => b += (v >> s).toByte)
    i32(corr)
    writeUvarint(b, 0) // response header (v1) tagged fields
    i32(0)             // throttle
    i16(error)
    writeUvarint(b, 0) // error message: null
    compactStr(b, memberId)
    i32(memberEpoch)
    i32(1000)          // heartbeat interval ms
    if (error != 0) b += 0xff.toByte // assignment: null marker
    else {
      b += 1.toByte    // assignment struct present
      writeUvarint(b, assignment.size + 1)
      assignment.foreach { case (t, ps) =>
        val (hi, lo) = topicUuid(t)
        i64(hi); i64(lo)
        writeUvarint(b, ps.size + 1)
        ps.foreach(i32)
        writeUvarint(b, 0)
      }
      writeUvarint(b, 0) // assignment struct tags
    }
    writeUvarint(b, 0)   // response tags
    val out = ByteBuffer.allocate(4 + b.length)
    out.putInt(b.length); out.put(b.toArray); out.array()
  }

  /** Client-side: (error, memberId, memberEpoch, assignment by
    * (uuidHi, uuidLo, partitions)). */
  def decodeConsumerGroupHeartbeatResponse(payload: Array[Byte])
      : (Int, String, Int, Seq[(Long, Long, Seq[Int])]) = {
    val buf = ByteBuffer.wrap(payload)
    buf.getInt()       // correlation
    readUvarint(buf)   // header tags
    buf.getInt()       // throttle
    val err = buf.getShort().toInt
    readUvarint(buf)   // error message (null)
    val member = readCompactStr(buf)
    val epoch = buf.getInt()
    buf.getInt()       // heartbeat interval
    val marker = buf.get()
    val assignment =
      if (marker == 0xff.toByte || err != 0) Nil
      else {
        val n = readUvarint(buf) - 1
        val as = (0 until math.max(0, n)).map { _ =>
          val hi = buf.getLong(); val lo = buf.getLong()
          val np = readUvarint(buf) - 1
          val ps = (0 until math.max(0, np)).map(_ => buf.getInt())
          readUvarint(buf)
          (hi, lo, ps: Seq[Int])
        }
        readUvarint(buf) // struct tags
        as
      }
    (err, member, epoch, assignment)
  }
}
