package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.MediaCodecs

/** Golden-byte tests for the pure-byte media container codecs. */
class MediaCodecSpec extends AnyFunSuite {

  test("WAV round-trip: header fields and duration") {
    val pcm = Array.tabulate[Byte](16000 * 2 * 2)(i => (i % 251).toByte)
    val wav = MediaCodecs.encodeWav(16000, 2, 16, pcm) // exactly 1 second
    val m = MediaCodecs.decode(wav).get
    assert(m.format == "wav" && m.channels == 2 && m.sampleRate == 16000)
    assert(m.bits == 16 && m.payloadBytes == pcm.length)
    assert(m.durationUs == 1000000L)
  }

  test("WAV chunk walk skips a LIST chunk before data") {
    val base = MediaCodecs.encodeWav(8000, 1, 16, Array.fill[Byte](800)(1))
    // splice an odd-sized LIST chunk between fmt and data (RIFF pad byte)
    val fmtEnd = 12 + 8 + 16
    val list = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val spliced = base.take(fmtEnd) ++ list ++ base.drop(fmtEnd)
    // fix RIFF size (not checked by the decoder, but keep it honest)
    val m = MediaCodecs.decode(spliced).get
    assert(m.sampleRate == 8000 && m.payloadBytes == 800)
    assert(m.durationUs == 50000L) // 800 bytes / 16000 B/s
  }

  test("BMP round-trip: dims, bpp, padded row size") {
    val bmp = MediaCodecs.encodeBmp(3, 2) // rowSize = ((72+31)/32)*4 = 12
    val m = MediaCodecs.decode(bmp).get
    assert(m.format == "bmp" && m.width == 3 && m.height == 2)
    assert(m.bits == 24 && m.payloadBytes == 24)
  }

  test("BMP top-down (negative height) decodes to absolute rows") {
    val bmp = MediaCodecs.encodeBmp(4, 2)
    // flip height to -2 (little-endian i32 at offset 22)
    bmp(22) = (-2).toByte; bmp(23) = 0xff.toByte
    bmp(24) = 0xff.toByte; bmp(25) = 0xff.toByte
    val m = MediaCodecs.decode(bmp).get
    assert(m.height == 2 && m.payloadBytes == 24) // rowSize(4px,24bpp)=12
  }

  test("PPM header with comments and multi-digit dims") {
    val hdr = "P6\n# a comment\n640 480\n# another\n255\n"
    val blob = hdr.getBytes("US-ASCII") ++ new Array[Byte](10)
    val m = MediaCodecs.decode(blob).get
    assert(m.width == 640 && m.height == 480 && m.channels == 3)
    assert(m.payloadBytes == 640L * 480 * 3 && m.bits == 8)
  }

  test("PPM 16-bit maxval doubles bytes per sample") {
    val m = MediaCodecs.decode("P6 2 2 65535 ".getBytes("US-ASCII")).get
    assert(m.bits == 16 && m.payloadBytes == 2L * 2 * 3 * 2)
  }

  test("malformed input returns None, never throws") {
    val cases = Seq(
      Array.empty[Byte],
      "RIFFxxxxWAVE".getBytes("US-ASCII"),             // no chunks
      "P6\n0 5\n255\n".getBytes("US-ASCII"),           // zero width
      "P6\n# only comments".getBytes("US-ASCII"),      // no dims
      MediaCodecs.encodeBmp(2, 2).take(30),            // truncated BMP
      MediaCodecs.encodeWav(8000, 1, 16, Array[Byte](1, 2)).take(20),
      Array[Byte]('B', 'M', 1, 2, 3))                  // tiny BMP
    cases.foreach(c => assert(MediaCodecs.decode(c).isEmpty))
  }

  test("truncated WAV data chunk clamps payload to remaining bytes") {
    val wav = MediaCodecs.encodeWav(8000, 1, 16, Array.fill[Byte](100)(7))
    val m = MediaCodecs.decode(wav.dropRight(40)).get
    assert(m.payloadBytes == 60)
  }

  test("wavSamples16 sign-extends int16 LE from the data chunk") {
    val samples = Array(-32768, -1, 0, 1, 32767, -1000, 999)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (v, i) =>
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val wav = MediaCodecs.encodeWav(16000, 1, 16, pcm)
    assert(MediaCodecs.wavSamples16(wav).toSeq == samples.toSeq)
    assert(MediaCodecs.wavSamples16(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("encodeBmp24/bmpPixels24 round-trip every stride-padding width") {
    (1 to 5).foreach { w =>
      val h = 3
      val rgb = Array.tabulate(w * h * 3)(i => ((i * 37 + 5) % 256).toByte)
      val blob = MediaCodecs.encodeBmp24(w, h, rgb)
      assert(MediaCodecs.bmpPixels24(blob).toSeq == rgb.toSeq,
        s"width $w round-trip")
      // metadata decoder agrees on dims
      val m = MediaCodecs.decode(blob).get
      assert(m.width == w && m.height == h)
    }
    assert(MediaCodecs.bmpPixels24(Array[Byte](7, 7)).isEmpty)
  }

  test("MP3 header walk: tables, ID3 skip, resync, truncation") {
    import graft.multimodal.Mp3
    // MPEG-1 Layer III, 128 kbps, 44100 Hz, no padding:
    // frameLen = 144 * 128000 / 44100 = 417
    def frame(pad: Int): Array[Byte] = {
      val len = 144 * 128000 / 44100 + pad
      val b = new Array[Byte](len)
      b(0) = 0xff.toByte; b(1) = 0xfb.toByte
      b(2) = ((9 << 4) | (0 << 2) | (pad << 1)).toByte
      b
    }
    val f = Mp3.header(frame(0), 0).get
    assert(f.bitrateKbps == 128 && f.sampleRate == 44100 &&
      f.frameLen == 417 && f.samples == 1152 && f.layer == 3)
    assert(Mp3.header(frame(1), 0).get.frameLen == 418)
    // MPEG-2.5 Layer III: 8000 Hz needs verBits 0 -> coefficient 72
    val v25 = Array[Byte](0xff.toByte, 0xe2.toByte,
      ((2 << 4) | (2 << 2)).toByte, 0)
    val f25 = Mp3.header(v25, 0).get
    assert(f25.sampleRate == 8000 && f25.samples == 576 &&
      f25.frameLen == 72 * 16000 / 8000)
    // Layer I: slot size 4
    val l1 = Array[Byte](0xff.toByte, 0xfe.toByte, ((4 << 4)).toByte, 0)
    assert(Mp3.header(l1, 0).get.frameLen == (12 * 128000 / 44100) * 4)
    // stream walk: ID3v2 + junk between frames resyncs
    val id3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 20) ++
      new Array[Byte](20)
    val stream = id3 ++ frame(0) ++ Array[Byte](0, 0, 0) ++ frame(1)
    val walked = Mp3.frames(stream)
    assert(walked.size == 2 && walked(1).padding)
    // truncated tail frame doesn't count; never throws
    (0 until stream.length by 5).foreach(n =>
      assert(Mp3.frames(stream.take(n)).size <= 2))
    // reserved version bits / bad bitrate index / bad sr rejected
    assert(Mp3.header(Array[Byte](0xff.toByte, 0xea.toByte, 0x90.toByte,
      0), 0).isEmpty) // verBits 1 reserved
    assert(Mp3.header(Array[Byte](0xff.toByte, 0xfb.toByte, 0xf0.toByte,
      0), 0).isEmpty) // bitrate idx 15
    assert(Mp3.header(Array[Byte](0xff.toByte, 0xfb.toByte, 0x9c.toByte,
      0), 0).isEmpty) // srIdx 3
  }

  test("MP4 box walk: metadata, largesize, to-EOF, v1 mvhd, fuzz") {
    import graft.multimodal.Mp4
    val f = Mp4.file(1000, 42000, Seq(
      Mp4.trak(1, 42000, "vide", "avc1", 640, 360),
      Mp4.trak(2, 42000, "soun", "mp4a", 0, 0)), mdatLen = 50)
    val m = Mp4.parse(f).get
    assert(m.timescale == 1000 && m.duration == 42000)
    assert(m.durationUs == 42000000L)
    assert(m.tracks == Seq(Mp4.Track("vide", "avc1", 640, 360),
      Mp4.Track("soun", "mp4a", 0, 0)))
    // 64-bit largesize wrapping of mdat + a to-EOF trailing box
    val moovOnly = Mp4.file(600, 600, Seq(
      Mp4.trak(1, 600, "vide", "hev1", 32, 16)), 0)
    val big = new java.io.ByteArrayOutputStream()
    big.write(moovOnly)
    val payload = new Array[Byte](10)
    val bb = java.nio.ByteBuffer.allocate(16 + payload.length)
    bb.putInt(1); bb.put("mdat".getBytes)
    bb.putLong(16L + payload.length); bb.put(payload)
    big.write(bb.array())
    big.write(Array[Byte](0, 0, 0, 0)); big.write("free".getBytes)
    big.write(Array[Byte](1, 2, 3)) // size-0: runs to EOF
    val m2 = Mp4.parse(big.toByteArray).get
    assert(m2.tracks.head.fourcc == "hev1")
    // v1 mvhd (64-bit duration)
    val v1 = java.nio.ByteBuffer.allocate(108)
    v1.putLong(0); v1.putLong(0)             // creation, modification
    v1.putInt(90000); v1.putLong(900000L)    // timescale, duration
    val mvhd1 = Mp4.fullBox("mvhd", 1, v1.array())
    val f1 = Mp4.box("moov", mvhd1)
    val m3 = Mp4.parse(f1).get
    assert(m3.timescale == 90000 && m3.duration == 900000L &&
      m3.durationUs == 10000000L)
    // no moov / junk / truncation: None or valid, never a throw
    assert(Mp4.parse("nope".getBytes).isEmpty)
    (0 until f.length by 7).foreach(n => Mp4.parse(f.take(n)))
    var s = 7L
    (0 until 200).foreach { _ =>
      s = s * 6364136223846793005L + 1442695040888963407L
      val i = ((s >>> 33) % f.length).toInt
      val flipped = f.clone()
      flipped(i) = (flipped(i) ^ (1 << ((s >>> 17) & 7)).toByte).toByte
      Mp4.parse(flipped)
    }
  }
}
