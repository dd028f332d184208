package graft.functions

/** L7 helpers: control-channel parsers that predict spawned data flows
  * (conntrack FTP/RTSP/SIP helpers, `src/conntrack.c`,
  * docs/INTERNALS:360-408) and first-bytes payload classification (the
  * nDPI-shaped signature pass, `src/classifier.c:33`).
  *
  * Each parser extracts the (address, port) expectation a stateful
  * tracker would register so the matching data flow inherits the parent
  * class — q98 runs them inside the pipeline against an oracle.
  */
object L7 {

  private val FtpPasv =
    """227[^(]*\((\d+),(\d+),(\d+),(\d+),(\d+),(\d+)\)""".r.unanchored
  private val RtspPort = """client_port=(\d+)""".r.unanchored
  private val SipAudio = """m=audio\s+(\d+)\s""".r.unanchored

  /** FTP `227 Entering Passive Mode (h1,h2,h3,h4,p1,p2)` → (ip, port)
    * the client will connect to for the data channel. */
  def ftpPassive(text: String): Option[(Long, Int)] = text match {
    case FtpPasv(h1, h2, h3, h4, p1, p2) =>
      Some(((h1.toLong << 24) | (h2.toLong << 16) | (h3.toLong << 8)
        | h4.toLong, p1.toInt * 256 + p2.toInt))
    case _ => None
  }

  /** RTSP SETUP `Transport: ...;client_port=p-p'` → first RTP port. */
  def rtspClientPort(text: String): Option[Int] = text match {
    case RtspPort(p) => Some(p.toInt)
    case _ => None
  }

  /** SIP/SDP `m=audio <port> RTP/AVP ...` → RTP port. */
  def sipAudioPort(text: String): Option[Int] = text match {
    case SipAudio(p) => Some(p.toInt)
    case _ => None
  }

  /** DNS query heuristic over a UDP payload head (RFC 1035 §4.1.1):
    * QR=0, opcode 0, Z bits clear, 1..4 questions, no answers. */
  def looksDns(head: Array[Byte]): Boolean = head.length >= 12 && {
    val flags = ((head(2) & 0xff) << 8) | (head(3) & 0xff)
    val qd = ((head(4) & 0xff) << 8) | (head(5) & 0xff)
    val an = ((head(6) & 0xff) << 8) | (head(7) & 0xff)
    (flags & 0x8000) == 0 && ((flags >> 11) & 0xf) == 0 &&
      (flags & 0x0070) == 0 && qd >= 1 && qd <= 4 && an == 0
  }

  /** QUIC long-header heuristic (RFC 9000 §17.2): long-header + fixed
    * bit set, version v1, v2 (RFC 9369 — its own version constant
    * 0x6b3343cf; packet-type bits are remapped but the long-header and
    * fixed bits are unchanged) or an IETF draft version. Version 0 is
    * a VERSION NEGOTIATION packet (RFC 9000 §17.2.1): only the long-
    * header bit is fixed (the server echoes arbitrary low bits), the
    * connection-id length bytes stay in-range (≤ 20, RFC 9000 §17.2),
    * and the tail after both ids is a non-empty whole number of 4-byte
    * supported-version entries. */
  def looksQuic(head: Array[Byte]): Boolean = head.length >= 5 &&
    (head(0) & 0x80) == 0x80 && {
      val v = ((head(1) & 0xffL) << 24) | ((head(2) & 0xffL) << 16) |
        ((head(3) & 0xffL) << 8) | (head(4) & 0xffL)
      if (v == 0L) {
        // VN: DCID len, DCID, SCID len, SCID, then 4-byte versions
        head.length >= 7 && {
          val dl = head(5) & 0xff
          dl <= 20 && head.length >= 7 + dl && {
            val sl = head(6 + dl) & 0xff
            val tail = head.length - (7 + dl + sl)
            sl <= 20 && tail >= 4 && tail % 4 == 0
          }
        }
      } else (head(0) & 0xc0) == 0xc0 &&
        (v == 1L || v == 0x6b3343cfL ||
          (v & 0xffffff00L) == 0xff000000L)
    }

  /** NBNS name-encoding walk (RFC 1002 §4.1): QDCOUNT 1, a 0x20-length
    * first-level-encoded name whose 32 bytes are ALL nibble characters
    * 'A'..'P', the zero terminator, then QTYPE NB (0x20) or NBSTAT
    * (0x21) and QCLASS IN — the full structural grammar, not just the
    * length byte (a DNS query for a 32-char label would satisfy that). */
  def looksNbns(head: Array[Byte]): Boolean = head.length >= 50 &&
    head(4) == 0 && head(5) == 1 && (head(12) & 0xff) == 0x20 && {
      var i = 13
      var ok = true
      while (i < 45 && ok) {
        val c = head(i) & 0xff
        ok = c >= 'A' && c <= 'P'
        i += 1
      }
      ok && head(45) == 0 && head(46) == 0 &&
        ((head(47) & 0xff) == 0x20 || (head(47) & 0xff) == 0x21) &&
        head(48) == 0 && head(49) == 1
    }

  /** NTP heuristic (RFC 5905 §7.3): 48-byte packet, version 3/4, any
    * association mode that uses the standard header — symmetric
    * active/passive (1/2), client/server (3/4), broadcast (5). Modes
    * 6/7 (control/private) use different frames and stay out. */
  def looksNtp(head: Array[Byte]): Boolean = head.length == 48 && {
    val vn = (head(0) & 0x38) >> 3
    val mode = head(0) & 7
    (vn == 3 || vn == 4) && mode >= 1 && mode <= 5
  }

  /** SNMP heuristic (BER): SEQUENCE, version INTEGER 0..3. */
  def looksSnmp(head: Array[Byte]): Boolean = head.length >= 5 &&
    (head(0) & 0xff) == 0x30 && (head(2) & 0xff) == 0x02 &&
    (head(3) & 0xff) == 0x01 && (head(4) & 0xff) <= 3

  /** STUN heuristic (RFC 5389 §6): binding method, magic cookie at
    * bytes 4-7, length a multiple of 4. */
  def looksStun(head: Array[Byte]): Boolean = head.length >= 20 &&
    (head(0) & 0xc0) == 0 &&
    (head(4) & 0xff) == 0x21 && (head(5) & 0xff) == 0x12 &&
    (head(6) & 0xff) == 0xa4 && (head(7) & 0xff) == 0x42 &&
    (((head(2) & 0xff) << 8 | (head(3) & 0xff)) % 4) == 0

  /** STUN attribute walk (RFC 5389 §15): (type, value) pairs from a
    * STUN message, values padded to 32 bits on the wire. Empty on a
    * malformed header or a ragged attribute. */
  def stunAttrs(head: Array[Byte]): Seq[(Int, Array[Byte])] = {
    if (!looksStun(head)) return Seq.empty
    val msgLen = ((head(2) & 0xff) << 8) | (head(3) & 0xff)
    if (20 + msgLen > head.length) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer[(Int, Array[Byte])]()
    var at = 20
    val end = 20 + msgLen
    while (at + 4 <= end) {
      val typ = ((head(at) & 0xff) << 8) | (head(at + 1) & 0xff)
      val len = ((head(at + 2) & 0xff) << 8) | (head(at + 3) & 0xff)
      if (at + 4 + len > end) return Seq.empty
      out += ((typ, java.util.Arrays.copyOfRange(head, at + 4,
        at + 4 + len)))
      at += 4 + ((len + 3) & ~3)
    }
    out.toSeq
  }

  /** XOR-MAPPED-ADDRESS (RFC 5389 §15.2) → (ipv4, port): the NAT's
    * reflexive address, port XORed with the magic's high half and the
    * address with the full magic — the value a NAT-traversal flow
    * correlator extracts. None when absent or not IPv4. */
  def stunXorMapped(head: Array[Byte]): Option[(Long, Int)] =
    stunAttrs(head).collectFirst {
      case (0x0020, v) if v.length >= 8 && (v(1) & 0xff) == 1 =>
        val port = (((v(2) & 0xff) << 8) | (v(3) & 0xff)) ^ 0x2112
        val ip = (((v(4) & 0xffL) << 24) | ((v(5) & 0xffL) << 16) |
          ((v(6) & 0xffL) << 8) | (v(7) & 0xffL)) ^ 0x2112a442L
        (ip & 0xffffffffL, port)
    }

  /** DHCP/BOOTP heuristic (RFC 2131): op 1/2, htype 1 (Ethernet),
    * hlen 6, magic cookie at offset 236. */
  def looksDhcp(head: Array[Byte]): Boolean = head.length >= 240 &&
    (head(0) == 1 || head(0) == 2) && head(1) == 1 && head(2) == 6 &&
    (head(236) & 0xff) == 0x63 && (head(237) & 0xff) == 0x82 &&
    (head(238) & 0xff) == 0x53 && (head(239) & 0xff) == 0x63

  /** First-bytes signature classification over the payload head. The
    * former hard-coded chain is now the data-driven [[SigRules.default]]
    * table (~37 families) evaluated first-match in table order — same
    * model, wider breadth, user-extensible without recompiling. */
  def classifyPayload(head: Array[Byte]): String =
    SigRules.classify(SigRules.default, head)

  /** Classify a flow under a first-k-packets giveup budget — nDPI's
    * per-flow inspection model (reference: classifier giveup knobs,
    * CONFIG-KEYS:3638-3681): inspect packets in order until a signature
    * matches or `budget` packets have been looked at, then give up and
    * label the flow. Returns (class, packetsInspected). */
  def classifyFlow(packets: Iterator[Array[Byte]],
                   budget: Int): (String, Int) = {
    var n = 0
    while (packets.hasNext && n < budget) {
      val c = classifyPayload(packets.next())
      n += 1
      if (c != "unknown") return (c, n)
    }
    ("giveup", n)
  }

  // ---- TLS ClientHello SNI (RFC 8446 §4.4.2.2 / RFC 6066 §3) ---------

  /** Minimal valid ClientHello record carrying a server_name extension
    * (fixture encoder for specs and gated queries). */
  def clientHello(sni: String): Array[Byte] = {
    val name = sni.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    // extension data: server_name_list = len(2) + [type 0, len(2), name]
    val listLen = 3 + name.length
    val extData = new java.io.ByteArrayOutputStream()
    extData.write(listLen >> 8); extData.write(listLen & 0xff)
    extData.write(0) // name_type host_name
    extData.write(name.length >> 8); extData.write(name.length & 0xff)
    extData.write(name, 0, name.length)
    val ext = new java.io.ByteArrayOutputStream()
    ext.write(0); ext.write(0) // extension type 0: server_name
    ext.write(extData.size() >> 8); ext.write(extData.size() & 0xff)
    extData.writeTo(ext)
    val body = new java.io.ByteArrayOutputStream()
    body.write(0x03); body.write(0x03)          // client version TLS 1.2
    (0 until 32).foreach(_ => body.write(0))    // random
    body.write(0)                               // session id len
    body.write(0); body.write(2)                // cipher suites len
    body.write(0x13); body.write(0x01)          // TLS_AES_128_GCM_SHA256
    body.write(1); body.write(0)                // compression: null
    body.write(ext.size() >> 8); body.write(ext.size() & 0xff)
    ext.writeTo(body)
    val hs = new java.io.ByteArrayOutputStream()
    hs.write(1)                                 // handshake type 1
    hs.write(body.size() >> 16); hs.write((body.size() >> 8) & 0xff)
    hs.write(body.size() & 0xff)
    body.writeTo(hs)
    val rec = new java.io.ByteArrayOutputStream()
    rec.write(0x16); rec.write(0x03); rec.write(0x01) // TLS record hdr
    rec.write(hs.size() >> 8); rec.write(hs.size() & 0xff)
    hs.writeTo(rec)
    rec.toByteArray
  }

  /** Extract the SNI host name from a ClientHello record, None when the
    * record is not a ClientHello or carries no server_name extension.
    * Every read is bounds-checked: this eats raw payload bytes. */
  def tlsSni(head: Array[Byte]): Option[String] = {
    def u16(i: Int): Int = ((head(i) & 0xff) << 8) | (head(i + 1) & 0xff)
    if (head.length < 5 + 4 || (head(0) & 0xff) != 0x16 ||
        (head(5) & 0xff) != 1) return None // not handshake/ClientHello
    var off = 5 + 4 + 2 + 32               // record+hs hdrs, version, random
    if (off + 1 > head.length) return None
    off += 1 + (head(off) & 0xff)           // session id
    if (off + 2 > head.length) return None
    off += 2 + u16(off)                     // cipher suites
    if (off + 1 > head.length) return None
    off += 1 + (head(off) & 0xff)           // compression methods
    if (off + 2 > head.length) return None
    val extEnd = math.min(off + 2 + u16(off), head.length)
    off += 2
    while (off + 4 <= extEnd) {
      val tpe = u16(off); val len = u16(off + 2)
      val dataEnd = off + 4 + len
      if (tpe == 0 && dataEnd <= extEnd && len >= 5) {
        // server_name_list: skip list len, entry type, read name
        val nameLen = u16(off + 4 + 3)
        val nameOff = off + 4 + 5
        if (nameOff + nameLen <= dataEnd)
          return Some(new String(head, nameOff, nameLen,
            java.nio.charset.StandardCharsets.UTF_8))
        return None
      }
      off = dataEnd
    }
    None
  }
}
