package graft.multimodal

/** GIF87a/89a codec — pure-spec (the 1990 CompuServe specification),
  * completing the image trio next to [[Jpeg]] and [[Png]] with the
  * third distinct compression family: LZW with GIF's variable code
  * widths, clear/EOI codes, 4096-entry dictionary cap, and LSB-first
  * bit packing inside 255-byte sub-blocks.
  *
  * Decoder scope: global or local color table, 8-bit indices up to
  * 256 colors, interlaced (the 4-pass Adam layout) and sequential
  * images, 89a extension blocks skipped; first image frame decoded
  * (animation frames beyond the first are out of scope — the pixels
  * returned are the first frame, like a thumbnailer). Malformed input
  * yields None, never an exception.
  *
  * The encoder (fixture side) is a real LZW compressor — dictionary
  * rebuilds on clear, width bumps at 2^width — so roundtrips exercise
  * the whole variable-width machinery including the KwKwK case.
  */
object Gif {

  final case class Image(width: Int, height: Int,
                         palette: Array[Int],     // 0xRRGGBB
                         indices: Array[Byte])    // w*h palette indices

  // --------------------------------------------------------------- lzw

  /** GIF-LZW compress `data` (values < 2^minCodeSize) into the raw
    * code stream (no sub-block framing). */
  def lzwCompress(data: Array[Byte],
                                      minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var nbits = 0
    var width = minCodeSize + 1
    def put(code: Int): Unit = {
      acc |= code.toLong << nbits
      nbits += width
      while (nbits >= 8) {
        out.write((acc & 0xff).toInt); acc >>= 8; nbits -= 8
      }
    }
    var dict = scala.collection.mutable.Map[(Int, Int), Int]()
    var nextCode = eoi + 1
    put(clear)
    var prefix = -1
    data.foreach { b =>
      val k = b & 0xff
      if (prefix < 0) prefix = k
      else dict.get((prefix, k)) match {
        case Some(code) => prefix = code
        case None =>
          put(prefix)
          dict((prefix, k)) = nextCode
          nextCode += 1
          // width bumps when the NEXT emitted code could be nextCode-1
          if (nextCode - 1 == (1 << width) && width < 12) width += 1
          if (nextCode == 4096) { // dictionary full: clear and rebuild
            put(clear)
            dict = scala.collection.mutable.Map[(Int, Int), Int]()
            nextCode = eoi + 1
            width = minCodeSize + 1
          }
          prefix = k
      }
    }
    if (prefix >= 0) put(prefix)
    // The decoder adds one more table entry than we did — at the flush
    // code just emitted, using the code value `nextCode` holds now. If
    // that phantom entry lands exactly on 2^width the decoder widens
    // BEFORE reading EOI, so EOI must be written at the wider width
    // (the one code position where encoder and decoder add counts
    // differ; everywhere else the one-add lag cancels against the
    // one-position lag).
    if (nextCode == (1 << width) && width < 12) width += 1
    put(eoi)
    if (nbits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }

  /** GIF-LZW decompress a raw code stream; None on malformed codes. */
  def lzwDecompress(data: Array[Byte],
                                        minCodeSize: Int,
                                        maxOut: Int): Option[Array[Byte]] = {
    if (minCodeSize < 1 || minCodeSize > 8) return None
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var pos = 0
    var acc = 0L
    var nbits = 0
    var width = minCodeSize + 1
    def read(): Int = {
      while (nbits < width) {
        if (pos >= data.length) return -1
        acc |= (data(pos) & 0xffL) << nbits
        pos += 1; nbits += 8
      }
      val v = (acc & ((1L << width) - 1)).toInt
      acc >>= width; nbits -= width
      v
    }
    // dictionary: per code its (prefixCode, lastByte); roots are -1
    val prefix = new Array[Int](4096)
    val last = new Array[Byte](4096)
    var nextCode = eoi + 1
    def emit(code: Int): Option[Byte] = { // returns first byte
      var stack = List.empty[Byte]
      var c = code
      while (c >= clear) { // composite
        stack = last(c) :: stack
        c = prefix(c)
      }
      val first = c.toByte
      if (out.size() + 1 + stack.size > maxOut) return None
      out.write(c)
      stack.foreach(b => out.write(b & 0xff))
      Some(first)
    }
    var prev = -1
    var done = false
    while (!done) {
      val code = read()
      if (code < 0) return None
      if (code == clear) {
        nextCode = eoi + 1
        width = minCodeSize + 1
        prev = -1
      } else if (code == eoi) {
        done = true
      } else if (code < clear) {
        if (out.size() >= maxOut) return None
        out.write(code)
        if (prev >= 0 && nextCode < 4096) {
          prefix(nextCode) = prev; last(nextCode) = code.toByte
          nextCode += 1
          if (nextCode == (1 << width) && width < 12) width += 1
        }
        prev = code
      } else if (code < nextCode) {
        val first = emit(code) match {
          case Some(f) => f
          case None => return None
        }
        if (prev >= 0 && nextCode < 4096) {
          prefix(nextCode) = prev; last(nextCode) = first
          nextCode += 1
          if (nextCode == (1 << width) && width < 12) width += 1
        }
        prev = code
      } else if (code == nextCode && prev >= 0 && nextCode < 4096) {
        // KwKwK: the code being defined right now
        var c = prev
        while (c >= clear) c = prefix(c)
        val first = c.toByte
        prefix(nextCode) = prev; last(nextCode) = first
        nextCode += 1
        emit(code) match {
          case Some(_) => ()
          case None => return None
        }
        if (nextCode == (1 << width) && width < 12) width += 1
        prev = code
      } else return None
    }
    Some(out.toByteArray)
  }

  // --------------------------------------------------------------- gif

  /** The interlace 4-pass row order (spec Appendix E). */
  private def interlaceRows(h: Int): Array[Int] = {
    val rows = new Array[Int](h)
    var k = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
         y <- start until h by step) { rows(k) = y; k += 1 }
    rows
  }

  /** Encode a GIF89a with a global color table (palette padded to the
    * next power of two, min 2). */
  def encode(img: Image, interlaced: Boolean = false): Array[Byte] = {
    require(img.palette.nonEmpty && img.palette.length <= 256)
    require(img.indices.length == img.width * img.height)
    require(img.indices.forall(i => (i & 0xff) < img.palette.length))
    var bits = 1
    while ((1 << bits) < img.palette.length) bits += 1
    val pal = img.palette.padTo(1 << bits, 0)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    u16(img.width); u16(img.height)
    out.write(0x80 | ((bits - 1) & 7)) // GCT present, size
    out.write(0); out.write(0)         // bg index, aspect
    pal.foreach { c =>
      out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff)
      out.write(c & 0xff)
    }
    out.write(0x2c)                    // image descriptor
    u16(0); u16(0); u16(img.width); u16(img.height)
    out.write(if (interlaced) 0x40 else 0x00)
    val minCode = math.max(2, bits)
    out.write(minCode)
    val src =
      if (!interlaced) img.indices
      else {
        val o = new Array[Byte](img.indices.length)
        val order = interlaceRows(img.height)
        var k = 0
        order.foreach { y =>
          System.arraycopy(img.indices, y * img.width, o,
            k * img.width, img.width)
          k += 1
        }
        o
      }
    val lzw = lzwCompress(src, minCode)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n)
      out.write(lzw, off, n)
      off += n
    }
    out.write(0)                       // block terminator
    out.write(0x3b)                    // trailer
    out.toByteArray
  }

  /** Decode the FIRST image frame of a GIF. */
  def decode(b: Array[Byte]): Option[Image] = {
    if (b.length < 13) return None
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    def u16(o: Int): Int =
      if (o + 1 >= b.length) -1
      else (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    val sw = u16(6); val sh = u16(8)
    if (sw <= 0 || sh <= 0) return None
    val flags = b(10) & 0xff
    var pos = 13
    var gct: Array[Int] = null
    if ((flags & 0x80) != 0) {
      val n = 1 << ((flags & 7) + 1)
      if (pos + 3 * n > b.length) return None
      gct = Array.tabulate(n)(i =>
        ((b(pos + 3 * i) & 0xff) << 16) |
          ((b(pos + 3 * i + 1) & 0xff) << 8) | (b(pos + 3 * i + 2) & 0xff))
      pos += 3 * n
    }
    while (pos < b.length) {
      (b(pos) & 0xff) match {
        case 0x21 => // extension: label + sub-blocks
          pos += 2
          var ok = true
          while (ok) {
            if (pos >= b.length) return None
            val n = b(pos) & 0xff
            pos += 1
            if (n == 0) ok = false
            else {
              if (pos + n > b.length) return None
              pos += n
            }
          }
        case 0x2c => // image descriptor
          if (pos + 10 > b.length) return None
          val left = u16(pos + 1); val top = u16(pos + 3)
          val w = u16(pos + 5); val h = u16(pos + 7)
          val iflags = b(pos + 9) & 0xff
          pos += 10
          if (w <= 0 || h <= 0 || left < 0 || top < 0) return None
          if (w.toLong * h > (1 << 26)) return None
          var pal = gct
          if ((iflags & 0x80) != 0) {
            val n = 1 << ((iflags & 7) + 1)
            if (pos + 3 * n > b.length) return None
            pal = Array.tabulate(n)(i =>
              ((b(pos + 3 * i) & 0xff) << 16) |
                ((b(pos + 3 * i + 1) & 0xff) << 8) |
                (b(pos + 3 * i + 2) & 0xff))
            pos += 3 * n
          }
          if (pal == null) return None
          if (pos >= b.length) return None
          val minCode = b(pos) & 0xff
          pos += 1
          // collect sub-blocks
          val lzw = new java.io.ByteArrayOutputStream()
          var ok = true
          while (ok) {
            if (pos >= b.length) return None
            val n = b(pos) & 0xff
            pos += 1
            if (n == 0) ok = false
            else {
              if (pos + n > b.length) return None
              lzw.write(b, pos, n)
              pos += n
            }
          }
          // trailer must still be present for a well-formed file
          if (pos >= b.length || (b(pos) & 0xff) != 0x3b) {
            // tolerate further blocks; just require SOME terminator
            if (pos >= b.length) return None
          }
          return lzwDecompress(lzw.toByteArray, minCode, w * h)
            .filter(_.length == w * h)
            .filter(_.forall(i => (i & 0xff) < pal.length))
            .map { idx =>
              val out =
                if ((iflags & 0x40) == 0) idx
                else {
                  val o = new Array[Byte](idx.length)
                  val order = interlaceRows(h)
                  var k = 0
                  order.foreach { y =>
                    System.arraycopy(idx, k * w, o, y * w, w)
                    k += 1
                  }
                  o
                }
              Image(w, h, pal, out)
            }
        case 0x3b => return None // trailer before any image
        case _ => return None
      }
    }
    None
  }

  /** Interleaved RGB bytes through the palette. */
  def rgb(img: Image): Array[Byte] = {
    val out = new Array[Byte](img.indices.length * 3)
    var i = 0
    while (i < img.indices.length) {
      val c = img.palette(img.indices(i) & 0xff)
      out(3 * i) = ((c >> 16) & 0xff).toByte
      out(3 * i + 1) = ((c >> 8) & 0xff).toByte
      out(3 * i + 2) = (c & 0xff).toByte
      i += 1
    }
    out
  }

  /** (width, height, gctColors) from the header alone. */
  def dims(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 13) return None
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val w = (b(6) & 0xff) | ((b(7) & 0xff) << 8)
    val h = (b(8) & 0xff) | ((b(9) & 0xff) << 8)
    val flags = b(10) & 0xff
    if (w <= 0 || h <= 0) None
    else Some((w, h,
      if ((flags & 0x80) != 0) 1 << ((flags & 7) + 1) else 0))
  }
}
