package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Real, pure-byte media codecs for container formats whose specs are
  * public byte layouts needing no external library: WAV (RIFF/PCM,
  * chunk-walked), BMP (BITMAPFILEHEADER + BITMAPINFOHEADER), and binary
  * PPM (P6, comment-aware header). These replace the declared decode stub
  * ([[MultimodalQueries.decodeStub]]) for the codec-free formats; formats
  * that genuinely need a codec library (JPEG/H.264/...) remain out of
  * container scope.
  *
  * All decoders are bounds-checked and return None on malformed or
  * truncated input — this is the same "never throw on raw bytes" rule the
  * network decoders follow.
  */
object MediaCodecs {

  /** Decoded container metadata. Fields not applicable to a format are 0
    * (e.g. width for audio), so the row shape is stable across formats. */
  final case class Meta(format: String, width: Int, height: Int,
                        channels: Int, sampleRate: Int, bits: Int,
                        durationUs: Long, payloadBytes: Long)

  // ---------------------------------------------------------------- encode

  /** Canonical 44-byte RIFF/WAVE PCM header + sample data. */
  def encodeWav(sampleRate: Int, channels: Int, bits: Int,
                pcm: Array[Byte]): Array[Byte] = {
    val blockAlign = channels * bits / 8
    val byteRate = sampleRate * blockAlign
    val b = ByteBuffer.allocate(44 + pcm.length).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes(StandardCharsets.US_ASCII))
    b.putInt(36 + pcm.length)
    b.put("WAVE".getBytes(StandardCharsets.US_ASCII))
    b.put("fmt ".getBytes(StandardCharsets.US_ASCII))
    b.putInt(16)                        // PCM fmt chunk size
    b.putShort(1)                       // audio format: PCM
    b.putShort(channels.toShort)
    b.putInt(sampleRate)
    b.putInt(byteRate)
    b.putShort(blockAlign.toShort)
    b.putShort(bits.toShort)
    b.put("data".getBytes(StandardCharsets.US_ASCII))
    b.putInt(pcm.length)
    b.put(pcm)
    b.array()
  }

  /** 24-bpp bottom-up BMP carrying REAL pixels: `rgb` is top-down packed
    * (r,g,b) rows, w*h*3 bytes; on the wire rows are bottom-up, BGR,
    * padded to 4-byte stride per the BITMAPINFOHEADER layout. */
  def encodeBmp24(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb must be w*h*3")
    val rowSize = ((24 * width + 31) / 32) * 4
    val dataLen = rowSize * height
    val b = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte)
    b.putInt(54 + dataLen)
    b.putInt(0)
    b.putInt(54)
    b.putInt(40)
    b.putInt(width)
    b.putInt(height)                    // positive: bottom-up
    b.putShort(1)
    b.putShort(24)
    b.putInt(0)                         // BI_RGB
    b.putInt(dataLen)
    b.putInt(2835).putInt(2835)         // 72 DPI
    b.putInt(0).putInt(0)
    (height - 1 to 0 by -1).foreach { y => // bottom-up row order
      (0 until width).foreach { x =>
        val o = (y * width + x) * 3
        b.put(rgb(o + 2)).put(rgb(o + 1)).put(rgb(o)) // BGR on the wire
      }
      (0 until rowSize - width * 3).foreach(_ => b.put(0.toByte))
    }
    b.array()
  }

  /** Top-down packed (r,g,b) pixels from a 24-bpp BMP — undoes the
    * bottom-up row order, BGR channel order, and 4-byte row padding.
    * Empty on malformed/unsupported blobs. */
  def bmpPixels24(blob: Array[Byte]): Array[Byte] = {
    if (blob.length < 54 || blob(0) != 'B' || blob(1) != 'M')
      return Array.empty
    val off = i32(blob, 10)
    val width = i32(blob, 18)
    val height = i32(blob, 22)
    val bpp = u16(blob, 28)
    if (bpp != 24 || width <= 0 || height <= 0) return Array.empty
    val rowSize = ((24 * width + 31) / 32) * 4
    if (off + rowSize.toLong * height > blob.length) return Array.empty
    val out = new Array[Byte](width * height * 3)
    (0 until height).foreach { y =>       // y: top-down output row
      val src = off + (height - 1 - y) * rowSize
      (0 until width).foreach { x =>
        val o = (y * width + x) * 3
        out(o) = blob(src + x * 3 + 2)    // R from BGR
        out(o + 1) = blob(src + x * 3 + 1)
        out(o + 2) = blob(src + x * 3)
      }
    }
    out
  }

  /** 24-bpp bottom-up BMP with zeroed pixels; rows padded to 4 bytes. */
  def encodeBmp(width: Int, height: Int): Array[Byte] = {
    val rowSize = ((24 * width + 31) / 32) * 4
    val dataLen = rowSize * height
    val b = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte)
    b.putInt(54 + dataLen)              // file size
    b.putInt(0)                         // reserved
    b.putInt(54)                        // pixel data offset
    b.putInt(40)                        // BITMAPINFOHEADER size
    b.putInt(width)
    b.putInt(height)
    b.putShort(1)                       // planes
    b.putShort(24)                      // bpp
    b.putInt(0)                         // BI_RGB (no compression)
    b.putInt(dataLen)
    b.putInt(2835).putInt(2835)         // 72 DPI
    b.putInt(0).putInt(0)               // palette counts
    b.array()                           // zeroed pixels
  }

  /** Binary PPM (P6), maxval 255, zeroed pixels. */
  def encodePpm(width: Int, height: Int): Array[Byte] = {
    val header = s"P6\n$width $height\n255\n"
      .getBytes(StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + width * height * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    out
  }

  // ---------------------------------------------------------------- decode

  /** Sniff the magic and dispatch; None on unknown/malformed input. */
  def decode(b: Array[Byte]): Option[Meta] =
    if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') decodeBmp(b)
    else if (b.length >= 12 && ascii(b, 0) == "RIFF" && ascii(b, 8) == "WAVE")
      decodeWav(b)
    else if (b.length >= 12 && ascii(b, 0) == "RIFF" && ascii(b, 8) == "WEBP")
      Webp.dims(b).map { case (w, h, nc) =>
        Meta("webp", w, h, nc, 0, 8, 0L, b.length.toLong)
      }
    else if (b.length >= 2 && b(0) == 'P' && b(1) == '6') decodePpm(b)
    else if (b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
      Jpeg.dims(b).map { case (w, h, nc) =>
        Meta("jpeg", w, h, nc, 0, 8, 0L, b.length.toLong)
      }
    else if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' &&
      b(2) == 'N' && b(3) == 'G')
      Png.dims(b).map { case (w, h, nc) =>
        Meta("png", w, h, nc, 0, 8, 0L, b.length.toLong)
      }
    else if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F')
      Gif.dims(b).map { case (w, h, _) =>
        Meta("gif", w, h, 3, 0, 8, 0L, b.length.toLong) // palette RGB
      }
    else if (b.length >= 4 &&
      ((b(0) == 'I' && b(1) == 'I') || (b(0) == 'M' && b(1) == 'M')))
      Tiff.dims(b).map { case (w, h, nc) =>
        Meta("tiff", w, h, nc, 0, 8, 0L, b.length.toLong)
      }
    else None

  private def ascii(b: Array[Byte], off: Int): String =
    if (off + 4 > b.length) ""
    else new String(b, off, 4, StandardCharsets.US_ASCII)

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def i32(b: Array[Byte], o: Int): Int = u32(b, o).toInt

  /** 16-bit little-endian PCM samples from a WAVE blob — the same RIFF
    * chunk walk as [[decodeWav]] (writers may insert LIST/fact chunks
    * before data), returning the data chunk decoded as int16. Empty on
    * a malformed container. */
  def wavSamples16(b: Array[Byte]): Array[Int] = {
    if (b.length < 12 || ascii(b, 0) != "RIFF" || ascii(b, 8) != "WAVE")
      return Array.empty
    var off = 12
    while (off + 8 <= b.length) {
      val id = ascii(b, off)
      val size = u32(b, off + 4)
      if (id == "data") {
        val n = math.min(size, (b.length - off - 8).toLong).toInt / 2
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          out(i) = u16(b, off + 8 + 2 * i).toShort.toInt // sign-extend
          i += 1
        }
        return out
      }
      off += 8 + size.toInt + (size.toInt & 1)
      if (off < 0) return Array.empty
    }
    Array.empty
  }

  /** Walk RIFF chunks (not fixed offsets — writers may insert LIST/fact
    * chunks before data); odd-sized chunks carry a pad byte per the RIFF
    * spec. Needs both a PCM `fmt ` and a `data` chunk. */
  private def decodeWav(b: Array[Byte]): Option[Meta] = {
    var off = 12
    var channels, rate, bits = 0
    var dataLen = -1L
    var fmtSeen = false
    while (off + 8 <= b.length && (dataLen < 0 || !fmtSeen)) {
      val id = ascii(b, off)
      val size = u32(b, off + 4)
      if (id == "fmt " && size >= 16 && off + 8 + 16 <= b.length) {
        channels = u16(b, off + 10)
        rate = u32(b, off + 12).toInt
        bits = u16(b, off + 22)
        fmtSeen = true
      } else if (id == "data") {
        // size may exceed remaining bytes on a truncated file: clamp
        dataLen = math.min(size, (b.length - off - 8).toLong)
      }
      off += 8 + size.toInt + (size.toInt & 1)
      if (off < 0) return None // overflow on malformed size
    }
    if (!fmtSeen || dataLen < 0 || channels <= 0 || rate <= 0 || bits <= 0)
      None
    else {
      val byteRate = rate.toLong * channels * bits / 8
      Some(Meta("wav", 0, 0, channels, rate, bits,
        dataLen * 1000000L / byteRate, dataLen))
    }
  }

  private def decodeBmp(b: Array[Byte]): Option[Meta] = {
    if (b.length < 54) return None
    val hdrSize = u32(b, 14)
    if (hdrSize < 40) return None // BITMAPCOREHEADER not supported
    val width = i32(b, 18)
    val height = i32(b, 22) // negative = top-down; dims are |height| rows
    val bpp = u16(b, 28)
    if (width <= 0 || height == 0 || bpp <= 0) None
    else {
      val rows = math.abs(height)
      val rowSize = ((bpp.toLong * width + 31) / 32) * 4
      Some(Meta("bmp", width, rows, 0, 0, bpp, 0L, rowSize * rows))
    }
  }

  /** P6 header: three whitespace-separated decimal tokens (width, height,
    * maxval) with `#` comments allowed between them. */
  private def decodePpm(b: Array[Byte]): Option[Meta] = {
    var off = 2
    def token(): Option[Int] = {
      // skip whitespace and comments
      var inComment = false
      while (off < b.length &&
             (inComment || (b(off) == ' ' || b(off) == '\n' ||
              b(off) == '\r' || b(off) == '\t' || b(off) == '#'))) {
        if (b(off) == '#') inComment = true
        else if (b(off) == '\n') inComment = false
        off += 1
      }
      var v = -1L
      while (off < b.length && b(off) >= '0' && b(off) <= '9') {
        v = (if (v < 0) 0L else v) * 10 + (b(off) - '0')
        if (v > Int.MaxValue) return None
        off += 1
      }
      if (v < 0) None else Some(v.toInt)
    }
    for {
      w <- token()
      h <- token()
      maxv <- token()
      if w > 0 && h > 0 && maxv > 0 && maxv < 65536
    } yield {
      val bytesPerSample = if (maxv > 255) 2 else 1
      Meta("ppm", w, h, 3, 0, 8 * bytesPerSample, 0L,
        w.toLong * h * 3 * bytesPerSample)
    }
  }
}
