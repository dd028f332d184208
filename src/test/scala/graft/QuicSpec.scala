package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.QuicCrypto
import graft.functions.QuicCrypto.{hex, toHex}

/** QUIC v1 Initial protection against the RFCs' own published vectors
  * (RFC 5869 Appendix A for HKDF, RFC 9001 Appendix A for the Initial
  * key schedule) plus seal/open roundtrips through the JDK's
  * independent AES-GCM.
  */
class QuicSpec extends AnyFunSuite {

  test("HKDF-SHA256: RFC 5869 A.1 test case 1") {
    val ikm = hex("0b0b0b0b0b0b0b0b0b0b0b0b0b0b0b0b0b0b0b0b0b0b")
    val salt = hex("000102030405060708090a0b0c")
    val info = hex("f0f1f2f3f4f5f6f7f8f9")
    val prk = QuicCrypto.hkdfExtract(salt, ikm)
    assert(toHex(prk) ==
      "077709362c2e32df0ddc3f0dc47bba6390b6c73bb50f9c3122ec844ad7c2b3e5")
    val okm = QuicCrypto.hkdfExpand(prk, info, 42)
    assert(toHex(okm) ==
      "3cb25f25faacd57a90434f64d0362f2a2d2d0a90cf1a5a4c5db02d56ecc4c5" +
        "bf34007208d5b887185865")
  }

  test("Initial key schedule: RFC 9001 A.1 vectors") {
    val dcid = hex("8394c8f03e515708")
    assert(toHex(QuicCrypto.clientInitialSecret(dcid)) ==
      "c00cf151ca5be075ed0ebfb5c80323c42d6b7db67881289af4008f1f6c357aea")
    val ck = QuicCrypto.initialKeys(dcid, client = true)
    assert(toHex(ck.key) == "1f369613dd76d5467730efcbe3b1a22d")
    assert(toHex(ck.iv) == "fa044b2f42a3fd3b46fb255c")
    assert(toHex(ck.hp) == "9f50449e04a0e810283a1e9933adedd2")
    val sk = QuicCrypto.initialKeys(dcid, client = false)
    assert(toHex(sk.key) == "cf3a5331653c364c88f0f379b6067e37")
    assert(toHex(sk.iv) == "0ac1493ca1905853b0bba03e")
    assert(toHex(sk.hp) == "c206b8d9b9f0f37644430b490eeaa314")
  }

  test("varint roundtrip across all four widths") {
    for (v <- Seq(0L, 37L, 63L, 64L, 15293L, 16383L, 16384L, 494878333L,
        1073741823L, 1073741824L, 151288809941952652L)) {
      val enc = QuicCrypto.varint(v)
      assert(QuicCrypto.readVarint(enc, 0).contains((v, enc.length)),
        s"varint $v")
    }
    // RFC 9000 A.1 example encodings
    assert(toHex(QuicCrypto.varint(151288809941952652L)) ==
      "c2197c5eff14e88c")
    assert(toHex(QuicCrypto.varint(494878333L)) == "9d7f3e7d")
    assert(toHex(QuicCrypto.varint(15293L)) == "7bbd")
    assert(toHex(QuicCrypto.varint(37L)) == "25")
  }

  test("client Initial seal → open roundtrip recovers SNI + ALPN") {
    val hs = QuicCrypto.clientHelloHs("www.example.org",
      Seq("h3", "h3-29"))
    val dcid = hex("8394c8f03e515708")
    val dg = QuicCrypto.sealClientInitial(dcid, hex("c0ffee"), 2L, hs)
    assert(dg.length >= 1200) // client Initial padding contract
    val (pn, frames) = QuicCrypto.openClientInitial(dg).get
    assert(pn == 2L)
    val stream = QuicCrypto.cryptoStream(frames)
    assert(stream.startsWith(hs))
    val (sni, alpn) = QuicCrypto.clientHelloInfo(stream)
    assert(sni.contains("www.example.org"))
    assert(alpn == Seq("h3", "h3-29"))
    assert(QuicCrypto.inspect(dg).contains(
      (Some("www.example.org"), Seq("h3", "h3-29"))))
  }

  test("tampering: payload byte, header bit, wrong dcid all fail closed") {
    val dg = QuicCrypto.sealClientInitial(hex("0102030405"), hex(""), 0L,
      QuicCrypto.clientHelloHs("a.example", Seq("h3")))
    def flip(i: Int): Array[Byte] = {
      val c = dg.clone(); c(i) = (c(i) ^ 0x01).toByte; c
    }
    assert(QuicCrypto.openClientInitial(flip(dg.length - 1)).isEmpty)
    assert(QuicCrypto.openClientInitial(flip(1)).isEmpty) // version bit
    // a different dcid derives different keys: AEAD must reject
    val c = dg.clone(); c(6) = (c(6) ^ 0x40).toByte // inside dcid
    assert(QuicCrypto.openClientInitial(c).isEmpty)
    // truncation never throws
    for (n <- Seq(0, 1, 5, 20, 50, 1199))
      assert(QuicCrypto.openClientInitial(dg.take(n)).isEmpty)
  }

  test("QUIC v2: seal → open roundtrip, remapped type bits on the wire") {
    val hs = QuicCrypto.clientHelloHs("v2.example", Seq("h3"))
    val dcid = hex("8394c8f03e515708")
    val dg = QuicCrypto.sealClientInitial(dcid, hex("c0ffee"), 7L, hs,
      version = QuicCrypto.VersionV2)
    // version field + Initial type bits 0b01 (RFC 9369 §3.2) in the clear
    assert(toHex(dg.slice(1, 5)) == "6b3343cf")
    assert(((dg(0) >> 4) & 0x3) == 0x1)
    assert(QuicCrypto.inspectVer(dg).contains(
      (2, Some("v2.example"), Seq("h3"))))
    // v1 of the same flow differs in every protected byte except headers
    val dg1 = QuicCrypto.sealClientInitial(dcid, hex("c0ffee"), 7L, hs)
    assert(QuicCrypto.inspectVer(dg1).contains(
      (1, Some("v2.example"), Seq("h3"))))
    assert(!dg.sameElements(dg1))
  }

  test("QUIC v2: the salt/label change is effective, not cosmetic") {
    val dg = QuicCrypto.sealClientInitial(hex("0102030405"), hex(""), 0L,
      QuicCrypto.clientHelloHs("a.example", Seq("h3")),
      version = QuicCrypto.VersionV2)
    // forge the packet to CLAIM v1: same bytes, version field 1 and the
    // v1 Initial type bits — it parses, but v1 initial keys (different
    // salt AND labels) must fail header protection + AEAD
    val forged = dg.clone()
    forged(0) = (forged(0) & 0xef).toByte // type bits 0b01 → 0b00
    forged(1) = 0; forged(2) = 0; forged(3) = 0; forged(4) = 1
    assert(QuicCrypto.openClientInitial(forged).isEmpty)
    // a v2 Initial wearing v1 type bits under version v2 is malformed
    val badType = dg.clone()
    badType(0) = (badType(0) & 0xef).toByte
    assert(QuicCrypto.openClientInitial(badType).isEmpty)
  }

  test("CRYPTO reassembly: out-of-order offsets + interleaved frames") {
    val data = (0 until 300).map(_.toByte).toArray
    val f = Array[Byte](0x00, 0x00, 0x01) ++ // padding, ping
      Array[Byte](0x06) ++ QuicCrypto.varint(100) ++
      QuicCrypto.varint(200) ++ data.drop(100) ++
      Array[Byte](0x02) ++ QuicCrypto.varint(7) ++ QuicCrypto.varint(0) ++
      QuicCrypto.varint(1) ++ QuicCrypto.varint(2) ++
      QuicCrypto.varint(1) ++ QuicCrypto.varint(1) ++ // ACK, 1 extra range
      Array[Byte](0x06) ++ QuicCrypto.varint(0) ++
      QuicCrypto.varint(100) ++ data.take(100) ++
      Array[Byte](0x00)
    assert(QuicCrypto.cryptoStream(f).sameElements(data))
    // a huge claimed offset yields empty, not an allocation
    val bomb = Array[Byte](0x06) ++ QuicCrypto.varint(1L << 40) ++
      QuicCrypto.varint(1) ++ Array[Byte](9)
    assert(QuicCrypto.cryptoStream(bomb).isEmpty)
  }
}
