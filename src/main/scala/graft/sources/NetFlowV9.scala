package graft.sources

import java.nio.ByteBuffer
import scala.collection.mutable

/** NetFlow v9 / IPFIX (v10) template-based codec with a per-exporter
  * template cache —
  * the stateful decode the reference keeps in `nfv9_template.c` (learned
  * per (exporter, template-id) layouts; data arriving before its template
  * is held, not dropped, mirroring nfacctd's buffering choice;
  * SURVEY §2.10 "template state", §7 hard part (c)).
  *
  * Wire formats (public): RFC 3954 v9 — 20-byte header, template flowset
  * id 0; RFC 7011 IPFIX — 16-byte header (version 10, total length),
  * template set id 2. Both carry templates as
  * `(template_id, field_count, n×(type, len))` and data sets with
  * ids ≥ 256 laid out per the referenced template. Numeric IEs up to
  * 8 bytes decode big-endian into Long. One cache instance decodes a mixed
  * v9/IPFIX datagram stream (nfacctd accepts both concurrently, §2.8).
  *
  * In the engine the cache lives inside keyed state (one key per
  * exporter — `flatMapGroups`/`transformWithState`), so template state
  * partitions with its exporter and survives checkpointing; q57 drives
  * exactly that shape in batch.
  */
object NetFlowV9 {
  val HeaderLen = 20
  val IpfixHeaderLen = 16

  /** One decoded data record: IANA field type → numeric value. */
  type Decoded = Map[Int, Long]

  final case class Template(id: Int, fields: Seq[(Int, Int)]) {
    val recordLen: Int = fields.map(_._2).sum
  }

  def encodeTemplate(h: V9Header, t: Template): Array[Byte] = {
    val setLen = 8 + t.fields.size * 4
    val buf = ByteBuffer.allocate(HeaderLen + setLen)
    putHeader(buf, h, 1)
    buf.putShort(0) // template flowset
    buf.putShort(setLen.toShort)
    buf.putShort(t.id.toShort)
    buf.putShort(t.fields.size.toShort)
    t.fields.foreach { case (tp, ln) =>
      buf.putShort(tp.toShort); buf.putShort(ln.toShort)
    }
    buf.array()
  }

  def encodeData(h: V9Header, t: Template,
                 records: Seq[Decoded]): Array[Byte] = {
    val body = records.size * t.recordLen
    val pad = (4 - (4 + body) % 4) % 4
    val setLen = 4 + body + pad
    val buf = ByteBuffer.allocate(HeaderLen + setLen)
    putHeader(buf, h, records.size)
    buf.putShort(t.id.toShort)
    buf.putShort(setLen.toShort)
    records.foreach { r =>
      t.fields.foreach { case (tp, ln) =>
        val v = r.getOrElse(tp, 0L)
        (ln - 1 to 0 by -1).foreach(i => buf.put((v >>> (8 * i)).toByte))
      }
    }
    buf.array()
  }

  /** v9 options template (set id 1): scope fields + option fields
    * (RFC 3954 §6.1; reference: sampling/if-name/VRF option records,
    * src/pkt_handlers.c:3690-3830). The template registers like a data
    * template; option data records then decode through the same path and
    * carry e.g. IE 34 (sampling interval) keyed by the scope field. */
  def encodeOptionTemplate(h: V9Header, t: Template,
                           scopeCount: Int): Array[Byte] = {
    val scopeBytes = scopeCount * 4
    val optBytes = (t.fields.size - scopeCount) * 4
    val body = 6 + t.fields.size * 4
    val pad = (4 - (4 + body) % 4) % 4
    val setLen = 4 + body + pad
    val buf = ByteBuffer.allocate(HeaderLen + setLen)
    putHeader(buf, h, 1)
    buf.putShort(1) // options template flowset
    buf.putShort(setLen.toShort)
    buf.putShort(t.id.toShort)
    buf.putShort(scopeBytes.toShort)
    buf.putShort(optBytes.toShort)
    t.fields.foreach { case (tp, ln) =>
      buf.putShort(tp.toShort); buf.putShort(ln.toShort)
    }
    buf.array()
  }

  private def putHeader(buf: ByteBuffer, h: V9Header, count: Int): Unit = {
    buf.putShort(9)
    buf.putShort(count.toShort)
    buf.putInt(h.sysUptimeMs.toInt)
    buf.putInt(h.unixSecs.toInt)
    buf.putInt(h.sequence.toInt)
    buf.putInt(h.sourceId.toInt)
  }

  // ---- IPFIX (RFC 7011) encode: 16-byte header, template set id 2 ------

  def encodeTemplateIpfix(h: V9Header, t: Template): Array[Byte] = {
    val setLen = 8 + t.fields.size * 4
    val buf = ByteBuffer.allocate(IpfixHeaderLen + setLen)
    putIpfixHeader(buf, h, IpfixHeaderLen + setLen)
    buf.putShort(2) // template set
    buf.putShort(setLen.toShort)
    buf.putShort(t.id.toShort)
    buf.putShort(t.fields.size.toShort)
    t.fields.foreach { case (tp, ln) =>
      buf.putShort(tp.toShort); buf.putShort(ln.toShort)
    }
    buf.array()
  }

  def encodeDataIpfix(h: V9Header, t: Template,
                      records: Seq[Decoded]): Array[Byte] = {
    // no padding (RFC 7011 permits none): IPFIX carries no record count,
    // so an exact-multiple set length is what keeps decode unambiguous
    // even for sub-4-byte record layouts
    val body = records.size * t.recordLen
    val setLen = 4 + body
    val buf = ByteBuffer.allocate(IpfixHeaderLen + setLen)
    putIpfixHeader(buf, h, IpfixHeaderLen + setLen)
    buf.putShort(t.id.toShort)
    buf.putShort(setLen.toShort)
    records.foreach { r =>
      t.fields.foreach { case (tp, ln) =>
        val v = r.getOrElse(tp, 0L)
        (ln - 1 to 0 by -1).foreach(i => buf.put((v >>> (8 * i)).toByte))
      }
    }
    buf.array()
  }

  private def putIpfixHeader(buf: ByteBuffer, h: V9Header,
                             totalLen: Int): Unit = {
    buf.putShort(10)
    buf.putShort(totalLen.toShort)
    buf.putInt(h.unixSecs.toInt)   // export time
    buf.putInt(h.sequence.toInt)
    buf.putInt(h.sourceId.toInt)   // observation domain id
  }

  final case class V9Header(sysUptimeMs: Long, unixSecs: Long,
                            sequence: Long, sourceId: Long)

  /** Per-exporter template cache + data-before-template buffer. One
    * instance per exporter key; feed datagrams in arrival order. */
  final class TemplateCache {
    private val templates = mutable.Map[Int, Template]()
    /** (set body, record budget from its datagram header) per template. */
    private val pending =
      mutable.Map[Int, mutable.Buffer[(Array[Byte], Int)]]()

    /** Decode one datagram; returns records decodable NOW (including any
      * previously-buffered data whose template just arrived). */
    def observe(datagram: Array[Byte]): Seq[Decoded] = {
      val buf = ByteBuffer.wrap(datagram)
      val version = buf.getShort() & 0xffff
      require(version == 9 || version == 10,
        s"not a v9/IPFIX datagram: version=$version")
      val (headerLen, templateSetId) =
        if (version == 9) (HeaderLen, 0) else (IpfixHeaderLen, 2)
      // v9's header count caps decoded records — the only way to tell a
      // trailing 2-byte pad from a phantom 2-byte record (RFC 3954 count
      // covers template + data records in the packet)
      var budget = if (version == 9) buf.getShort() & 0xffff else Int.MaxValue
      buf.position(headerLen) // remaining header fields not needed here
      val out = mutable.Buffer[Decoded]()
      while (buf.remaining() >= 4) {
        val setId = buf.getShort() & 0xffff
        val setLen = buf.getShort() & 0xffff
        val setEnd = buf.position() + setLen - 4
        if (setId == templateSetId) {
          while (buf.position() + 4 <= setEnd) {
            val tid = buf.getShort() & 0xffff
            val n = buf.getShort() & 0xffff
            val fields = (0 until n).map { _ =>
              (buf.getShort() & 0xffff, buf.getShort() & 0xffff)
            }
            register(Template(tid, fields), out)
            budget -= 1
          }
        } else if (version == 9 && setId == 1) {
          // v9 options template: scope + option field specs
          while (buf.position() + 6 <= setEnd) {
            val tid = buf.getShort() & 0xffff
            val scopeBytes = buf.getShort() & 0xffff
            val optBytes = buf.getShort() & 0xffff
            val n = (scopeBytes + optBytes) / 4
            val fields = (0 until n).map { _ =>
              (buf.getShort() & 0xffff, buf.getShort() & 0xffff)
            }
            register(Template(tid, fields), out)
            budget -= 1
          }
        } else if (setId >= 256) {
          val body = new Array[Byte](setEnd - buf.position())
          buf.get(body)
          templates.get(setId) match {
            case Some(t) =>
              val decoded = decodeBody(t, body, budget)
              budget -= decoded.size
              out ++= decoded
            case None =>
              pending.getOrElseUpdate(setId, mutable.Buffer()) +=
                ((body, budget))
          }
        }
        buf.position(setEnd)
      }
      out.toSeq
    }

    private def register(t: Template,
                         out: mutable.Buffer[Decoded]): Unit = {
      templates(t.id) = t
      pending.remove(t.id).foreach(_.foreach { case (b, cap) =>
        out ++= decodeBody(t, b, cap)
      })
    }

    private def decodeBody(t: Template, body: Array[Byte],
                           cap: Int): Seq[Decoded] = {
      val n = math.min(body.length / t.recordLen, cap) // pad/count aware
      (0 until n).map { r =>
        var off = r * t.recordLen
        t.fields.map { case (tp, ln) =>
          var v = 0L
          (0 until ln).foreach { i => v = (v << 8) | (body(off + i) & 0xffL) }
          off += ln
          tp -> v
        }.toMap
      }
    }

    def knownTemplates: Set[Int] = templates.keySet.toSet
    def pendingSets: Int = pending.valuesIterator.map(_.size).sum

    /** Persist learned templates (nfacctd_templates_file,
      * CONFIG-KEYS:2040-2064): survive a collector restart without
      * waiting for template refresh. Line format:
      * `id|type:len,type:len,...` */
    def save(): String =
      templates.values.toSeq.sortBy(_.id).map { t =>
        s"${t.id}|${t.fields.map { case (tp, ln) => s"$tp:$ln" }
          .mkString(",")}"
      }.mkString("\n")

    /** Returns any buffered data records the loaded templates release. */
    def load(persisted: String): Seq[Decoded] = {
      val out = mutable.Buffer[Decoded]()
      persisted.linesIterator.filter(_.nonEmpty).foreach { line =>
        val Array(id, fields) = line.split("\\|", 2)
        val t = Template(id.toInt, fields.split(",").toIndexedSeq.map { f =>
          val Array(tp, ln) = f.split(":")
          (tp.toInt, ln.toInt)
        })
        templates(t.id) = t
        pending.remove(t.id).foreach(_.foreach { case (b, cap) =>
          out ++= decodeBody(t, b, cap)
        })
      }
      out.toSeq
    }
  }

  /** Standard IANA IEs used by the tests/queries. */
  object IE {
    val InBytes = 1; val InPkts = 2; val Protocol = 4; val TcpFlags = 6
    val L4SrcPort = 7; val Ipv4SrcAddr = 8; val L4DstPort = 11
    val Ipv4DstAddr = 12
    val SamplingInterval = 34 // option IE: sampling 1-out-of-N
    val ScopeSystem = 1       // v9 option scope field type
  }
}
