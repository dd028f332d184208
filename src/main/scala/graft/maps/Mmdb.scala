package graft.maps

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.mutable

/** MaxMind-DB (.mmdb) binary format codec — the GeoIP(v2) lookup the
  * reference does through libmaxminddb (`CONFIG-KEYS:3363-3371`,
  * src_host_country/pocode/coords handlers). Format is public
  * (https://maxmind.github.io/MaxMind-DB/): a binary search tree over IP
  * bits, a 16-zero-byte separator, a typed data section, and a metadata
  * map after the `\xab\xcd\xef MaxMind.com` marker.
  *
  * [[Mmdb.Reader]] parses real .mmdb bytes (record sizes 24/28/32,
  * IPv4 trees) and resolves an address to its decoded data map.
  * [[Mmdb.build]] writes a spec-conformant IPv4 database from
  * (prefix, len, data) entries — fixture generation for specs/queries,
  * exactly like the NetFlow/sFlow/BGP codecs test both directions.
  *
  * Engine integration: the database bytes broadcast to executors and each
  * partition constructs one Reader (cheap: offsets only) — a per-record
  * trie walk inside `mapPartitions`, no shuffle, the same shape as the
  * LPM Expression path.
  */
object Mmdb {
  private val Marker: Array[Byte] =
    Array(0xab.toByte, 0xcd.toByte, 0xef.toByte) ++
      "MaxMind.com".getBytes(UTF_8)

  // ---- writer ---------------------------------------------------------

  private sealed trait Node
  private final case class Inner(var l: Node, var r: Node) extends Node
  private final case class Leaf(data: Map[String, Any]) extends Node
  private case object Empty extends Node

  /** Build an IPv4 database from prefix entries (record sizes 24/28/32,
    * default 32). Longer prefixes win (LPM): shorter prefixes push their
    * data down when a longer one splits them. */
  def build(entries: Seq[(Long, Int, Map[String, Any])],
            databaseType: String = "graft-Country",
            recordSize: Int = 32): Array[Byte] = {
    require(Seq(24, 28, 32).contains(recordSize))
    val root = Inner(Empty, Empty)
    entries.sortBy(_._2).foreach { case (base, len, data) =>
      var node: Inner = root
      var depth = 0
      while (depth < len - 1) {
        val bit = (base >>> (31 - depth)) & 1
        def descend(child: Node): Inner = child match {
          case i: Inner => i
          case Leaf(d) => Inner(Leaf(d), Leaf(d)) // push shorter data down
          case Empty => Inner(Empty, Empty)
        }
        val next = descend(if (bit == 0) node.l else node.r)
        if (bit == 0) node.l = next else node.r = next
        node = next
        depth += 1
      }
      if (len == 0) { node.l = Leaf(data); node.r = Leaf(data) }
      else {
        val bit = (base >>> (31 - depth)) & 1
        if (bit == 0) node.l = Leaf(data) else node.r = Leaf(data)
      }
    }
    // number inner nodes (BFS), serialize data maps with dedup
    val nodes = mutable.ArrayBuffer[Inner]()
    val index = mutable.Map[Inner, Int]()
    val queue = mutable.Queue[Inner](root)
    while (queue.nonEmpty) {
      val n = queue.dequeue()
      if (!index.contains(n)) {
        index(n) = nodes.size
        nodes += n
        Seq(n.l, n.r).foreach { case i: Inner => queue.enqueue(i); case _ => }
      }
    }
    val nodeCount = nodes.size
    val dataOut = new ByteArrayOutputStream()
    val dataOffsets = mutable.Map[Map[String, Any], Int]()
    def dataOffset(d: Map[String, Any]): Int =
      dataOffsets.getOrElseUpdate(d, {
        val off = dataOut.size()
        encodeValue(dataOut, d)
        off
      })
    def recordValue(n: Node): Long = n match {
      case i: Inner => index(i).toLong
      case Leaf(d) => nodeCount.toLong + 16L + dataOffset(d)
      case Empty => nodeCount.toLong
    }
    // force deterministic data order (left-to-right), then emit tree
    val records = nodes.map(n => (recordValue(n.l), recordValue(n.r)))
    val out = new ByteArrayOutputStream()
    records.foreach { case (l, r) =>
      recordSize match {
        case 32 =>
          out.write(((l >>> 24) & 0xff).toInt)
          out.write(((l >>> 16) & 0xff).toInt)
          out.write(((l >>> 8) & 0xff).toInt); out.write((l & 0xff).toInt)
          out.write(((r >>> 24) & 0xff).toInt)
          out.write(((r >>> 16) & 0xff).toInt)
          out.write(((r >>> 8) & 0xff).toInt); out.write((r & 0xff).toInt)
        case 24 =>
          out.write(((l >>> 16) & 0xff).toInt)
          out.write(((l >>> 8) & 0xff).toInt); out.write((l & 0xff).toInt)
          out.write(((r >>> 16) & 0xff).toInt)
          out.write(((r >>> 8) & 0xff).toInt); out.write((r & 0xff).toInt)
        case 28 =>
          // 7 bytes: L[0..2], middle byte = (Lhi<<4)|Rhi, R[0..2]
          out.write(((l >>> 16) & 0xff).toInt)
          out.write(((l >>> 8) & 0xff).toInt); out.write((l & 0xff).toInt)
          out.write(((((l >>> 24) & 0xf) << 4) | ((r >>> 24) & 0xf)).toInt)
          out.write(((r >>> 16) & 0xff).toInt)
          out.write(((r >>> 8) & 0xff).toInt); out.write((r & 0xff).toInt)
      }
    }
    (0 until 16).foreach(_ => out.write(0)) // data section separator
    dataOut.writeTo(out)
    out.write(Marker, 0, Marker.length)
    encodeValue(out, Map(
      "binary_format_major_version" -> 2L,
      "binary_format_minor_version" -> 0L,
      "build_epoch" -> 0L,
      "database_type" -> databaseType,
      "description" -> Map("en" -> "graft fixture"),
      "ip_version" -> 4L,
      "languages" -> Seq("en"),
      "node_count" -> nodeCount.toLong,
      "record_size" -> recordSize.toLong))
    out.toByteArray
  }

  /** Data-section encoder: map/array/utf8/double/uint; the subset the
    * GeoIP databases use for country/city/ASN records. */
  private def encodeValue(out: ByteArrayOutputStream, v: Any): Unit = v match {
    case m: Map[_, _] =>
      control(out, 7, m.size)
      m.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1).foreach {
        case (k, value) => encodeValue(out, k); encodeValue(out, value)
      }
    case s: String =>
      val b = s.getBytes(UTF_8)
      control(out, 2, b.length)
      out.write(b, 0, b.length)
    case d: Double =>
      control(out, 3, 8)
      val bits = java.lang.Double.doubleToLongBits(d)
      (7 to 0 by -1).foreach(i => out.write(((bits >>> (8 * i)) & 0xff).toInt))
    case l: Long =>
      // uint64 (extended type 9): minimal big-endian bytes
      val n = if (l == 0L) 0 else (64 - java.lang.Long.numberOfLeadingZeros(l) + 7) / 8
      control(out, 0, n); out.write(9 - 7) // extended: real type - 7
      (n - 1 to 0 by -1).foreach(i => out.write(((l >>> (8 * i)) & 0xff).toInt))
    case i: Int => encodeValue(out, i.toLong)
    case seq: Seq[_] =>
      control(out, 0, seq.size); out.write(11 - 7) // array
      seq.foreach(encodeValue(out, _))
    case other =>
      throw new IllegalArgumentException(s"no mmdb encoding for $other")
  }

  private def control(out: ByteArrayOutputStream, tp: Int, size: Int): Unit =
    if (size < 29) out.write((tp << 5) | size)
    else if (size < 285) { out.write((tp << 5) | 29); out.write(size - 29) }
    else {
      out.write((tp << 5) | 30)
      out.write(((size - 285) >> 8) & 0xff); out.write((size - 285) & 0xff)
    }

  // ---- reader ---------------------------------------------------------

  final class Reader(bytes: Array[Byte]) extends Serializable {
    private val metaStart: Int = {
      var i = bytes.length - Marker.length
      while (i >= 0 && !Marker.indices.forall(j => bytes(i + j) == Marker(j)))
        i -= 1
      require(i >= 0, "not an mmdb: metadata marker missing")
      i + Marker.length
    }
    val metadata: Map[String, Any] =
      decodeValue(metaStart, metaStart)._1.asInstanceOf[Map[String, Any]]
    val nodeCount: Int = metadata("node_count").asInstanceOf[Long].toInt
    val recordSize: Int = metadata("record_size").asInstanceOf[Long].toInt
    val ipVersion: Int = metadata("ip_version").asInstanceOf[Long].toInt
    require(Seq(24, 28, 32).contains(recordSize),
      s"unsupported record size $recordSize")
    private val nodeBytes = recordSize * 2 / 8
    private val dataStart = nodeCount * nodeBytes + 16

    private def u8(i: Int): Int = bytes(i) & 0xff

    private def record(node: Int, right: Boolean): Long = {
      val base = node * nodeBytes
      recordSize match {
        case 32 =>
          val o = base + (if (right) 4 else 0)
          ((u8(o).toLong << 24) | (u8(o + 1) << 16) | (u8(o + 2) << 8)
            | u8(o + 3)) & 0xffffffffL
        case 24 =>
          val o = base + (if (right) 3 else 0)
          (u8(o).toLong << 16) | (u8(o + 1) << 8) | u8(o + 2)
        case 28 =>
          // middle byte carries the high nibbles of both records
          val mid = u8(base + 3)
          if (right)
            ((mid & 0x0fL) << 24) | (u8(base + 4).toLong << 16) |
              (u8(base + 5) << 8) | u8(base + 6)
          else
            (((mid >> 4) & 0x0fL) << 24) | (u8(base).toLong << 16) |
              (u8(base + 1) << 8) | u8(base + 2)
      }
    }

    /** Longest-prefix lookup of a 32-bit IPv4 address. */
    def lookup(ipv4: Long): Option[Map[String, Any]] = {
      require(ipVersion == 4, "IPv4 tree expected")
      var node = 0L
      var depth = 31
      while (depth >= 0 && node < nodeCount) {
        val bit = (ipv4 >>> depth) & 1
        node = record(node.toInt, bit == 1)
        depth -= 1
      }
      if (node == nodeCount) None
      else {
        val off = dataStart + (node - nodeCount - 16).toInt
        Some(decodeValue(off, dataStart)._1.asInstanceOf[Map[String, Any]])
      }
    }

    /** Decode one typed value at `off`; `sectionStart` anchors pointers.
      * `budget` caps nesting (containers + pointer hops): the spec says
      * data-section pointers never point at pointers, so legal depth is
      * shallow — a crafted pointer cycle in a corrupt .mmdb must become
      * an orderly IllegalArgumentException, not a StackOverflowError
      * that kills the executor. */
    private def decodeValue(off: Int, sectionStart: Int,
                            budget: Int = 64): (Any, Int) = {
      if (budget <= 0) throw new IllegalArgumentException(
        s"mmdb nesting/pointer chain too deep at $off (corrupt db?)")
      val ctrl = u8(off)
      var tp = ctrl >>> 5
      var p = off + 1
      if (tp == 0) { tp = u8(p) + 7; p += 1 } // extended type
      var size = ctrl & 0x1f
      if (tp == 1) {
        // pointer: size bits select width, value continues in ctrl bits
        val ss = (ctrl >>> 3) & 0x3
        val v0 = ctrl & 0x7
        val (ptr, np) = ss match {
          case 0 => (((v0 << 8) | u8(p)).toLong, p + 1)
          case 1 => (((v0 << 16) | (u8(p) << 8) | u8(p + 1)) + 2048L, p + 2)
          case 2 => (((v0 << 24) | (u8(p) << 16) | (u8(p + 1) << 8)
            | u8(p + 2)) + 526336L, p + 3)
          case _ => (((u8(p).toLong << 24) | (u8(p + 1) << 16)
            | (u8(p + 2) << 8) | u8(p + 3)), p + 4)
        }
        val (v, _) = decodeValue(sectionStart + ptr.toInt, sectionStart,
          budget - 1)
        return (v, np)
      }
      if (size == 29) { size = 29 + u8(p); p += 1 }
      else if (size == 30) {
        size = 285 + ((u8(p) << 8) | u8(p + 1)); p += 2
      } else if (size == 31) {
        size = 65821 + ((u8(p) << 16) | (u8(p + 1) << 8) | u8(p + 2)); p += 3
      }
      tp match {
        case 2 => (new String(bytes, p, size, UTF_8), p + size)
        case 3 =>
          var bits = 0L
          (0 until 8).foreach(i => bits = (bits << 8) | u8(p + i))
          (java.lang.Double.longBitsToDouble(bits), p + 8)
        case 4 => (bytes.slice(p, p + size), p + size)
        case 5 | 6 | 9 | 10 =>
          var v = 0L
          (0 until size).foreach(i => v = (v << 8) | u8(p + i))
          (v, p + size)
        case 8 =>
          var v = 0L
          (0 until size).foreach(i => v = (v << 8) | u8(p + i))
          (v, p + size) // int32, non-negative in geo data
        case 7 =>
          var q = p
          val m = Map.newBuilder[String, Any]
          (0 until size).foreach { _ =>
            val (k, q1) = decodeValue(q, sectionStart, budget - 1)
            val (v, q2) = decodeValue(q1, sectionStart, budget - 1)
            m += k.asInstanceOf[String] -> v
            q = q2
          }
          (m.result(), q)
        case 11 =>
          var q = p
          val a = Seq.newBuilder[Any]
          (0 until size).foreach { _ =>
            val (v, q1) = decodeValue(q, sectionStart, budget - 1)
            a += v
            q = q1
          }
          (a.result(), q)
        case 14 => (size != 0, p)
        case 15 =>
          var bits = 0
          (0 until 4).foreach(i => bits = (bits << 8) | u8(p + i))
          (java.lang.Float.intBitsToFloat(bits).toDouble, p + 4)
        case other =>
          throw new IllegalArgumentException(s"mmdb type $other at $off")
      }
    }
  }
}
