package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}
import javax.crypto.{Cipher, Mac}

/** QUIC v1 Initial-packet protection (RFC 9001) — the deep-inspection
  * path nDPI uses to classify QUIC flows by SNI/ALPN (reference:
  * `src/ndpi/` QUIC dissector registered via `src/classifier.c:33`;
  * upstream nDPI derives the Initial keys and reads the ClientHello).
  * Initial packets are encrypted, but with keys derived FROM THE PACKET
  * ITSELF (HKDF over the destination connection id with a published
  * salt), so any on-path observer can decrypt them: that is what makes
  * QUIC flows classifiable at all.
  *
  * Everything here is from the public RFCs: HKDF (RFC 5869),
  * HKDF-Expand-Label (RFC 8446 §7.1), initial secrets + header
  * protection + AEAD usage (RFC 9001 §5), varints + frame layout
  * (RFC 9000 §16/§19). AES-GCM and HMAC-SHA256 come from the JDK — an
  * independent implementation, so the spec's Appendix A vectors
  * cross-validate the derivation chain end to end.
  *
  * QUIC v2 (RFC 9369) is the same protocol with deliberately different
  * constants — a new initial salt (§3.3.1), "quicv2 *" key-derivation
  * labels (§3.3.2), and remapped long-header packet-type bits (§3.2) —
  * introduced exactly to break version-ossified middlebox parsers. The
  * v2 path here shares every moving part with the Appendix-A-pinned v1
  * machinery; only those constants differ, and QuicSpec proves the
  * difference is effective (a v2 Initial re-labeled as v1 fails AEAD).
  */
object QuicCrypto {

  // ---- HKDF-SHA256 (RFC 5869) ----------------------------------------

  private def hmac(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val m = Mac.getInstance("HmacSHA256")
    m.init(new SecretKeySpec(if (key.isEmpty) new Array[Byte](32) else key,
      "HmacSHA256"))
    m.doFinal(data)
  }

  def hkdfExtract(salt: Array[Byte], ikm: Array[Byte]): Array[Byte] =
    hmac(salt, ikm)

  def hkdfExpand(prk: Array[Byte], info: Array[Byte],
                 len: Int): Array[Byte] = {
    val out = new Array[Byte](len)
    var t = Array.emptyByteArray
    var filled = 0
    var i = 1
    while (filled < len) {
      t = hmac(prk, t ++ info ++ Array(i.toByte))
      val n = math.min(t.length, len - filled)
      System.arraycopy(t, 0, out, filled, n)
      filled += n
      i += 1
    }
    out
  }

  /** TLS 1.3 HKDF-Expand-Label (RFC 8446 §7.1): struct HkdfLabel
    * { u16 length; opaque label<7..255> = "tls13 " + label;
    *   opaque context<0..255>; }. */
  def expandLabel(secret: Array[Byte], label: String,
                  context: Array[Byte], len: Int): Array[Byte] = {
    val full = ("tls13 " + label).getBytes(UTF_8)
    val info = Array[Byte]((len >> 8).toByte, (len & 0xff).toByte,
      full.length.toByte) ++ full ++
      Array(context.length.toByte) ++ context
    hkdfExpand(secret, info, len)
  }

  // ---- Initial keys (RFC 9001 §5.2 / RFC 9369 §3.3) -------------------

  /** QUIC v1 initial salt (RFC 9001 §5.2). */
  val initialSaltV1: Array[Byte] = hex("38762cf7f55934b34d179ae6a4c80cadccbb7f0a")

  /** QUIC v2 initial salt (RFC 9369 §3.3.1). */
  val initialSaltV2: Array[Byte] = hex("0dede3def700a6db819381be6e269dcbf9bd2ed9")

  /** Version fields on the wire. */
  val VersionV1 = 0x00000001
  val VersionV2 = 0x6b3343cf // RFC 9369 §3.1

  /** Long-header packet-type bits for an Initial: v2 remaps them
    * (RFC 9369 §3.2 — Initial 0b01 where v1 uses 0b00) precisely so
    * version-blind middleboxes can't pattern-match the header. */
  private def initialTypeBits(version: Int): Int =
    if (version == VersionV2) 0x1 else 0x0

  final case class Keys(key: Array[Byte], iv: Array[Byte], hp: Array[Byte])

  /** Per-direction Initial packet-protection keys for a connection id.
    * v2 changes the salt AND the key-derivation labels ("quicv2 key" /
    * "quicv2 iv" / "quicv2 hp", RFC 9369 §3.3.2); the per-direction
    * "client in"/"server in" secrets keep their names. */
  def initialKeys(dcid: Array[Byte], client: Boolean,
                  version: Int = VersionV1): Keys = {
    val v2 = version == VersionV2
    val initial = hkdfExtract(if (v2) initialSaltV2 else initialSaltV1, dcid)
    val secret = expandLabel(initial,
      if (client) "client in" else "server in", Array.emptyByteArray, 32)
    val pfx = if (v2) "quicv2" else "quic"
    Keys(
      key = expandLabel(secret, s"$pfx key", Array.emptyByteArray, 16),
      iv = expandLabel(secret, s"$pfx iv", Array.emptyByteArray, 12),
      hp = expandLabel(secret, s"$pfx hp", Array.emptyByteArray, 16))
  }

  /** The client initial secret itself (exposed for spec vectors). */
  def clientInitialSecret(dcid: Array[Byte],
                          version: Int = VersionV1): Array[Byte] =
    expandLabel(hkdfExtract(
      if (version == VersionV2) initialSaltV2 else initialSaltV1, dcid),
      "client in", Array.emptyByteArray, 32)

  // ---- Header protection (RFC 9001 §5.4) ------------------------------

  /** 5-byte mask = AES-ECB(hp, 16-byte sample) truncated. */
  def hpMask(hp: Array[Byte], sample: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance("AES/ECB/NoPadding")
    c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(hp, "AES"))
    c.doFinal(sample).take(5)
  }

  // ---- AEAD (RFC 9001 §5.3) -------------------------------------------

  private def nonce(iv: Array[Byte], pn: Long): Array[Byte] = {
    val n = iv.clone()
    var i = 0
    while (i < 8) { // XOR the pn into the low 8 bytes of the 12-byte iv
      n(11 - i) = (n(11 - i) ^ ((pn >>> (8 * i)) & 0xff)).toByte
      i += 1
    }
    n
  }

  def aeadSeal(key: Array[Byte], iv: Array[Byte], pn: Long,
               aad: Array[Byte], plain: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"),
      new GCMParameterSpec(128, nonce(iv, pn)))
    c.updateAAD(aad)
    c.doFinal(plain)
  }

  def aeadOpen(key: Array[Byte], iv: Array[Byte], pn: Long,
               aad: Array[Byte], sealed_ : Array[Byte]): Option[Array[Byte]] =
    try {
      val c = Cipher.getInstance("AES/GCM/NoPadding")
      c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"),
        new GCMParameterSpec(128, nonce(iv, pn)))
      c.updateAAD(aad)
      Some(c.doFinal(sealed_))
    } catch { case _: javax.crypto.AEADBadTagException => None }

  // ---- Varints (RFC 9000 §16) -----------------------------------------

  def varint(v: Long): Array[Byte] =
    if (v < 64) Array(v.toByte)
    else if (v < 16384) Array((0x40 | (v >> 8)).toByte, v.toByte)
    else if (v < 1073741824L)
      Array((0x80 | (v >> 24)).toByte, (v >> 16).toByte, (v >> 8).toByte,
        v.toByte)
    else (0 to 7).map(i => (v >> (8 * (7 - i))).toByte).toArray
      .updated(0, (0xc0 | (v >>> 56)).toByte)

  /** Decode the varint at `off`; (value, bytes consumed), or None when
    * the buffer is short. */
  def readVarint(b: Array[Byte], off: Int): Option[(Long, Int)] = {
    if (off >= b.length) return None
    val first = b(off) & 0xff
    val len = 1 << (first >> 6)
    if (off + len > b.length) return None
    var v = (first & 0x3f).toLong
    var i = 1
    while (i < len) { v = (v << 8) | (b(off + i) & 0xff); i += 1 }
    Some((v, len))
  }

  // ---- Client Initial build (fixture encoder) -------------------------

  /** Seal a client Initial datagram carrying `cryptoData` (a TLS
    * handshake stream — typically a ClientHello) in one CRYPTO frame,
    * padded to `minLen` (clients MUST pad Initial datagrams to 1200,
    * RFC 9000 §14.1). */
  def sealClientInitial(dcid: Array[Byte], scid: Array[Byte], pn: Long,
                        cryptoData: Array[Byte],
                        minLen: Int = 1200,
                        version: Int = VersionV1): Array[Byte] = {
    require(pn >= 0 && pn <= 0xffffffffL, "pn must fit 4 bytes")
    require(version == VersionV1 || version == VersionV2, "v1 or v2")
    val keys = initialKeys(dcid, client = true, version)
    val frames = Array[Byte](0x06) ++ varint(0) ++
      varint(cryptoData.length.toLong) ++ cryptoData
    // pad the PLAINTEXT so the sealed datagram reaches minLen
    val hdrLen = 1 + 4 + 1 + dcid.length + 1 + scid.length + 1 /*token*/ +
      2 /*length varint, forced 2-byte*/ + 4 /*pn*/
    val plainLen = math.max(frames.length, minLen - hdrLen - 16)
    val plain = frames ++ new Array[Byte](plainLen - frames.length)
    val lengthField = plainLen + 16 + 4 // payload + tag + pn bytes
    require(lengthField < 16384, "length varint must fit 2 bytes")
    val hdr = java.nio.ByteBuffer.allocate(hdrLen)
    // long header + fixed bit, version-specific Initial type, pn_len-1=3
    hdr.put((0xc3 | (initialTypeBits(version) << 4)).toByte)
    hdr.putInt(version)
    hdr.put(dcid.length.toByte).put(dcid)
    hdr.put(scid.length.toByte).put(scid)
    hdr.put(varint(0)) // token length
    hdr.put((0x40 | (lengthField >> 8)).toByte).put(lengthField.toByte)
    hdr.putInt(pn.toInt)
    val header = hdr.array()
    val sealedPayload = aeadSeal(keys.key, keys.iv, pn, header, plain)
    val out = header ++ sealedPayload
    // apply header protection: sample starts 4 bytes past pn offset
    val pnOff = header.length - 4
    val mask = hpMask(keys.hp, java.util.Arrays.copyOfRange(
      out, pnOff + 4, pnOff + 20))
    out(0) = (out(0) ^ (mask(0) & 0x0f)).toByte
    var i = 0
    while (i < 4) { out(pnOff + i) = (out(pnOff + i) ^ mask(i + 1)).toByte
      i += 1 }
    out
  }

  // ---- Client Initial open (the inspection path) ----------------------

  /** Remove header protection + AEAD-open a client Initial; returns
    * (packet number, plaintext frames). Every read is bounds-checked —
    * this eats raw datagrams. */
  def openClientInitial(d: Array[Byte]): Option[(Long, Array[Byte])] = {
    if (d.length < 7 + 16 + 4) return None
    val first = d(0) & 0xff
    // long header (0x80) + fixed bit (0x40)
    if ((first & 0xc0) != 0xc0) return None
    val version = ((d(1) & 0xff) << 24) | ((d(2) & 0xff) << 16) |
      ((d(3) & 0xff) << 8) | (d(4) & 0xff)
    if (version != VersionV1 && version != VersionV2) return None
    // the Initial type bits are version-specific (RFC 9369 §3.2)
    if (((first >> 4) & 0x3) != initialTypeBits(version)) return None
    var off = 5
    val dcidLen = d(off) & 0xff
    if (dcidLen > 20 || off + 1 + dcidLen > d.length) return None
    val dcid = java.util.Arrays.copyOfRange(d, off + 1, off + 1 + dcidLen)
    off += 1 + dcidLen
    if (off >= d.length) return None
    val scidLen = d(off) & 0xff
    if (scidLen > 20 || off + 1 + scidLen > d.length) return None
    off += 1 + scidLen
    val (tokenLen, tl) = readVarint(d, off).getOrElse(return None)
    if (tokenLen > d.length) return None
    off += tl + tokenLen.toInt
    if (off >= d.length) return None
    val (length, ll) = readVarint(d, off).getOrElse(return None)
    off += ll
    val pnOff = off
    if (pnOff + 20 > d.length || pnOff + length > d.length ||
        length < 20) return None
    val keys = initialKeys(dcid, client = true, version)
    val mask = hpMask(keys.hp, java.util.Arrays.copyOfRange(
      d, pnOff + 4, pnOff + 20))
    val clearFirst = first ^ (mask(0) & 0x0f)
    val pnLen = (clearFirst & 0x03) + 1
    var pn = 0L
    var i = 0
    val hdr = java.util.Arrays.copyOfRange(d, 0, pnOff + pnLen)
    hdr(0) = clearFirst.toByte
    while (i < pnLen) {
      hdr(pnOff + i) = (hdr(pnOff + i) ^ mask(i + 1)).toByte
      pn = (pn << 8) | (hdr(pnOff + i) & 0xff)
      i += 1
    }
    // no pn reconstruction from a larger space here: Initial is the
    // first packet of a connection, truncated pn == full pn
    val sealedPayload = java.util.Arrays.copyOfRange(
      d, pnOff + pnLen, pnOff + length.toInt)
    aeadOpen(keys.key, keys.iv, pn, hdr, sealedPayload).map((pn, _))
  }

  // ---- Frame walk + CRYPTO reassembly (RFC 9000 §19) ------------------

  /** Assemble the CRYPTO stream from a plaintext frame sequence,
    * tolerating PADDING/PING/ACK/CONNECTION_CLOSE interleaved and
    * out-of-order CRYPTO offsets. */
  def cryptoStream(frames: Array[Byte]): Array[Byte] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])]
    var off = 0
    var ok = true
    while (ok && off < frames.length) {
      (frames(off) & 0xff) match {
        case 0x00 => off += 1 // PADDING
        case 0x01 => off += 1 // PING
        case t @ (0x02 | 0x03) => // ACK [ECN]
          var o = off + 1
          def vi(): Long = readVarint(frames, o) match {
            case Some((v, n)) => o += n; v
            case None => ok = false; 0L
          }
          vi(); vi() // largest acked, delay
          val rangeCount = vi(); vi() // first range
          var r = 0L
          while (ok && r < rangeCount) { vi(); vi(); r += 1 }
          if (t == 0x03) { vi(); vi(); vi() } // ECN counts
          off = o
        case 0x06 => // CRYPTO
          var o = off + 1
          readVarint(frames, o) match {
            case Some((dataOff, n1)) =>
              o += n1
              readVarint(frames, o) match {
                case Some((len, n2)) =>
                  o += n2
                  if (o + len > frames.length) ok = false
                  else {
                    parts += ((dataOff, java.util.Arrays.copyOfRange(
                      frames, o, o + len.toInt)))
                    off = o + len.toInt
                  }
                case None => ok = false
              }
            case None => ok = false
          }
        case 0x1c | 0x1d => // CONNECTION_CLOSE: stop cleanly
          off = frames.length
        case _ => ok = false // anything else is not Initial-legal
      }
    }
    if (parts.isEmpty) Array.emptyByteArray
    else {
      val end = parts.map { case (o, b) => o + b.length }.max
      // an Initial's CRYPTO stream is one datagram's worth of handshake
      if (end > 65536) return Array.emptyByteArray
      val out = new Array[Byte](end.toInt)
      parts.sortBy(_._1).foreach { case (o, b) =>
        System.arraycopy(b, 0, out, o.toInt, b.length)
      }
      out
    }
  }

  // ---- ClientHello SNI + ALPN (RFC 8446 / RFC 6066 / RFC 7301) --------

  /** Build a minimal ClientHello HANDSHAKE message (no record layer —
    * QUIC CRYPTO streams carry handshake messages directly) with
    * server_name and ALPN extensions. */
  def clientHelloHs(sni: String, alpns: Seq[String]): Array[Byte] = {
    def u16(v: Int) = Array((v >> 8).toByte, v.toByte)
    val name = sni.getBytes(UTF_8)
    val sniData = u16(3 + name.length) ++ Array(0.toByte) ++
      u16(name.length) ++ name
    val alpnList = alpns.flatMap { p =>
      val b = p.getBytes(UTF_8); Array(b.length.toByte) ++ b
    }.toArray
    val alpnData = u16(alpnList.length) ++ alpnList
    val exts = u16(0) ++ u16(sniData.length) ++ sniData ++ // type 0
      u16(16) ++ u16(alpnData.length) ++ alpnData // type 16
    val body = Array[Byte](3, 3) ++ new Array[Byte](32) ++ // ver + random
      Array(0.toByte) ++ // session id
      u16(2) ++ Array[Byte](0x13, 0x01) ++ // TLS_AES_128_GCM_SHA256
      Array[Byte](1, 0) ++ // compression
      u16(exts.length) ++ exts
    Array[Byte](1) ++ Array((body.length >> 16).toByte,
      (body.length >> 8).toByte, body.length.toByte) ++ body
  }

  /** Extract (SNI, ALPN protocols) from a ClientHello handshake
    * message. Bounds-checked throughout. */
  def clientHelloInfo(hs: Array[Byte]): (Option[String], Seq[String]) = {
    def u16(i: Int): Int = ((hs(i) & 0xff) << 8) | (hs(i + 1) & 0xff)
    if (hs.length < 4 + 2 + 32 + 1 || (hs(0) & 0xff) != 1)
      return (None, Nil)
    var off = 4 + 2 + 32
    off += 1 + (hs(off) & 0xff) // session id
    if (off + 2 > hs.length) return (None, Nil)
    off += 2 + u16(off) // cipher suites
    if (off + 1 > hs.length) return (None, Nil)
    off += 1 + (hs(off) & 0xff) // compression
    if (off + 2 > hs.length) return (None, Nil)
    val extEnd = math.min(off + 2 + u16(off), hs.length)
    off += 2
    var sni: Option[String] = None
    var alpn: Seq[String] = Nil
    while (off + 4 <= extEnd) {
      val tpe = u16(off); val len = u16(off + 2)
      val dataEnd = off + 4 + len
      if (dataEnd > extEnd) return (sni, alpn)
      if (tpe == 0 && len >= 5) {
        val nameLen = u16(off + 4 + 3)
        val nameOff = off + 4 + 5
        if (nameOff + nameLen <= dataEnd)
          sni = Some(new String(hs, nameOff, nameLen, UTF_8))
      } else if (tpe == 16 && len >= 2) {
        var p = off + 4 + 2
        val ps = scala.collection.mutable.ArrayBuffer.empty[String]
        while (p < dataEnd) {
          val l = hs(p) & 0xff
          if (p + 1 + l > dataEnd) return (sni, alpn)
          ps += new String(hs, p + 1, l, UTF_8)
          p += 1 + l
        }
        alpn = ps.toSeq
      }
      off = dataEnd
    }
    (sni, alpn)
  }

  /** The whole inspection path: datagram → keys-from-dcid → AEAD open →
    * CRYPTO reassembly → ClientHello → (SNI, ALPN). This is what an
    * on-path classifier runs per QUIC flow head. */
  def inspect(datagram: Array[Byte]): Option[(Option[String], Seq[String])] =
    openClientInitial(datagram).map { case (_, frames) =>
      clientHelloInfo(cryptoStream(frames))
    }

  /** inspect plus the wire version that was opened (1 or 2) — v2 flows
    * classify identically, they just derive from the v2 salt/labels. */
  def inspectVer(datagram: Array[Byte])
      : Option[(Int, Option[String], Seq[String])] =
    inspect(datagram).map { case (sni, alpn) =>
      val v = ((datagram(1) & 0xff) << 24) | ((datagram(2) & 0xff) << 16) |
        ((datagram(3) & 0xff) << 8) | (datagram(4) & 0xff)
      (if (v == VersionV2) 2 else 1, sni, alpn)
    }

  def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray
  def toHex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString
}
