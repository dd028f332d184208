package graft.multimodal

import scala.collection.mutable

/** TIFF 6.0 — pure-spec baseline codec, no image libraries: the tagged
  * container next to [[Png]]/[[Gif]]/[[Jpeg]]/[[Webp]] in the
  * multimodal tier (the scanned-document / geo-raster corpus format).
  *
  * Decoder scope: both byte orders (II/MM), first-IFD walk with
  * unknown tags ignored, 8-bit gray / gray+alpha / RGB / RGBA, chunky
  * planar config, any strip layout, Compression 1 (none), 32773
  * (PackBits) and 5 (TIFF-LZW: MSB-first variable-width codes with the
  * spec's EARLY code-width change at 2^w−1 — one earlier than GIF's
  * LZW, the classic interop trap), Predictor 2 (horizontal
  * differencing) under LZW, PhotometricInterpretation 0 handled by
  * gray inversion. Bounds-checked validate-and-skip: malformed
  * structures yield None, never a throw.
  *
  * Encoder: little-endian, sorted IFD, strip-sized rows, the same
  * three compressions (+ optional predictor under LZW). Roundtrips are
  * bit-exact for arbitrary pixels; javax.imageio's independent TIFF
  * plugin (JDK 9+) cross-validates both directions in TiffSpec.
  */
object Tiff {

  final case class Image(width: Int, height: Int, channels: Int,
                         pixels: Array[Byte])

  val CompNone = 1
  val CompLzw = 5
  val CompPackBits = 32773

  private val MaxPixels = 1 << 26

  // --------------------------------------------------------- packbits

  /** PackBits encode (TIFF 6.0 §9): literal runs vs repeat runs. */
  def packBits(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < data.length) {
      // repeat run?
      var run = 1
      while (i + run < data.length && run < 128 &&
        data(i + run) == data(i)) run += 1
      if (run >= 2) {
        out.write(1 - run) // -(run-1)
        out.write(data(i))
        i += run
      } else {
        // literal run up to the next repeat of 3+ (2-byte repeats are
        // cheaper folded into the literal)
        val start = i
        var j = i + 1
        var rep = 1
        while (j < data.length && j - start < 128 && rep < 3) {
          if (data(j) == data(j - 1)) rep += 1 else rep = 1
          j += 1
        }
        val end = if (rep >= 3) j - 3 else j
        out.write(end - start - 1)
        (start until end).foreach(k => out.write(data(k)))
        i = end
      }
    }
    out.toByteArray
  }

  /** PackBits decode into exactly `expect` bytes; None on overrun or
    * truncation. */
  def unpackBits(data: Array[Byte], from: Int, len: Int,
                 expect: Int): Option[Array[Byte]] = {
    val out = new Array[Byte](expect)
    var o = 0
    var i = from
    val end = from + len
    while (i < end && o < expect) {
      val n = data(i)
      i += 1
      if (n >= 0) {
        val cnt = n + 1
        if (i + cnt > end || o + cnt > expect) return None
        System.arraycopy(data, i, out, o, cnt)
        i += cnt; o += cnt
      } else if (n != -128) {
        val cnt = 1 - n
        if (i >= end || o + cnt > expect) return None
        java.util.Arrays.fill(out, o, o + cnt, data(i))
        i += 1; o += cnt
      } // -128: noop
    }
    if (o == expect) Some(out) else None
  }

  // --------------------------------------------------------- tiff-lzw

  /** TIFF-LZW encode (TIFF 6.0 §13): MSB-first packing, Clear 256,
    * EOI 257, table reset at 4094 entries, EARLY width change (the
    * spec's off-by-one: width bumps when the next free code hits
    * 2^w − 1). */
  def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var nbits = 0
    var width = 9
    def put(code: Int): Unit = {
      acc = (acc << width) | code
      nbits += width
      while (nbits >= 8) {
        out.write(((acc >> (nbits - 8)) & 0xff).toInt)
        nbits -= 8
      }
    }
    // boxed Integer so the miss probe is a real null (a primitive Int
    // value type would unbox null to 0 and alias code 0)
    val dict = new java.util.HashMap[(Int, Int), Integer]() // (prefix, byte)
    var next = 258
    def resetTable(): Unit = { dict.clear(); next = 258; width = 9 }
    put(256) // initial Clear
    resetTable()
    var prefix = -1
    var i = 0
    while (i < data.length) {
      val b = data(i) & 0xff
      if (prefix < 0) prefix = b
      else {
        val hit = dict.get((prefix, b))
        if (hit != null) prefix = hit
        else {
          put(prefix)
          dict.put((prefix, b), next)
          next += 1
          // EARLY change: the moment the table fills the current
          // width (next == 2^w), later codes ship wider — one code
          // earlier than a GIF-style codec, which would keep the
          // narrow width until it actually emitted an overflowing
          // code (validated against the JDK's TIFF writer in TiffSpec)
          if (next == (1 << width) && width < 12) width += 1
          if (next >= 4094) { put(256); resetTable() }
          prefix = b
        }
      }
      i += 1
    }
    if (prefix >= 0) put(prefix)
    put(257) // EOI
    if (nbits > 0) out.write(((acc << (8 - nbits)) & 0xff).toInt)
    out.toByteArray
  }

  /** TIFF-LZW decode into exactly `expect` bytes; None on any
    * malformed stream. */
  def lzwDecode(data: Array[Byte], from: Int, len: Int,
                expect: Int): Option[Array[Byte]] = {
    val out = new Array[Byte](expect)
    var o = 0
    var acc = 0L
    var nbits = 0
    var width = 9
    var i = from
    val end = math.min(from + len, data.length)
    def read(): Int = {
      while (nbits < width) {
        if (i >= end) return -1
        acc = (acc << 8) | (data(i) & 0xff)
        i += 1; nbits += 8
      }
      val v = ((acc >> (nbits - width)) & ((1 << width) - 1)).toInt
      nbits -= width
      v
    }
    // table: first byte + (prefix chain) — store (prev, byte, len)
    val prev = new Array[Int](4096)
    val byt = new Array[Byte](4096)
    val slen = new Array[Int](4096)
    (0 until 256).foreach { c =>
      prev(c) = -1; byt(c) = c.toByte; slen(c) = 1
    }
    var next = 258
    def emit(code: Int): Boolean = {
      val l = slen(code)
      if (o + l > expect) return false
      var c = code
      var k = o + l - 1
      while (c >= 0) { out(k) = byt(c); c = prev(c); k -= 1 }
      o += l
      true
    }
    def firstByte(code: Int): Byte = {
      var c = code
      while (prev(c) >= 0) c = prev(c)
      byt(c)
    }
    var old = -1
    var done = false
    while (!done) {
      val code = read()
      if (code < 0) return None
      if (code == 257) done = true
      else if (code == 256) {
        next = 258; width = 9; old = -1
      } else {
        if (old < 0) {
          if (code > 255) return None
          if (!emit(code)) return None
          old = code
        } else {
          if (code > next || (code == next && next >= 4096)) return None
          if (next < 4096) {
            prev(next) = old
            byt(next) = if (code == next) firstByte(old)
              else firstByte(code)
            slen(next) = slen(old) + 1
            next += 1
          }
          if (code >= 4096) return None
          if (!emit(code)) return None
          old = code
        }
        // the decoder's table add lags the encoder's by one code, so
        // its trigger sits one below the encoder's 2^w: the spec's
        // `maxcode - 1` early change at 2^w − 1
        if (next == (1 << width) - 1 && width < 12) width += 1
      }
    }
    if (o == expect) Some(out) else None
  }

  // ------------------------------------------------------- predictor

  private def predictEncode(row: Array[Byte], ch: Int): Array[Byte] = {
    val out = row.clone()
    var i = row.length - 1
    while (i >= ch) { out(i) = (row(i) - row(i - ch)).toByte; i -= 1 }
    out
  }

  private def predictDecode(row: Array[Byte], ch: Int): Unit = {
    var i = ch
    while (i < row.length) { row(i) = (row(i) + row(i - ch)).toByte; i += 1 }
  }

  // ---------------------------------------------------------- encode

  /** Little-endian TIFF with `rowsPerStrip`-row strips. `predictor`
    * applies horizontal differencing (only meaningful under LZW, where
    * the spec defines tag 317). */
  def encode(img: Image, compression: Int = CompNone,
             predictor: Boolean = false,
             rowsPerStrip: Int = 8): Array[Byte] = {
    require(img.channels >= 1 && img.channels <= 4)
    require(img.pixels.length == img.width * img.height * img.channels)
    require(!predictor || compression == CompLzw,
      "predictor is a TIFF-LZW feature")
    val ch = img.channels
    val rowBytes = img.width * ch
    val nStrips = math.max(1,
      (img.height + rowsPerStrip - 1) / rowsPerStrip)
    val strips = (0 until nStrips).map { s =>
      val y0 = s * rowsPerStrip
      val y1 = math.min(img.height, y0 + rowsPerStrip)
      val raw = new Array[Byte]((y1 - y0) * rowBytes)
      (y0 until y1).foreach { y =>
        val src = java.util.Arrays.copyOfRange(img.pixels,
          y * rowBytes, (y + 1) * rowBytes)
        val row = if (predictor) predictEncode(src, ch) else src
        System.arraycopy(row, 0, raw, (y - y0) * rowBytes, rowBytes)
      }
      compression match {
        case CompNone => raw
        case CompPackBits => packBits(raw)
        case CompLzw => lzwEncode(raw)
        case other => throw new IllegalArgumentException(s"comp $other")
      }
    }
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32(v: Int): Unit = { u16(v & 0xffff); u16((v >>> 16) & 0xffff) }
    out.write('I'); out.write('I'); u16(42)
    // layout: header(8) | strip data | external arrays | IFD
    var at = 8
    val stripOffsets = strips.map { s => val o = at; at += s.length; o }
    // external value areas
    val extras = mutable.ArrayBuffer[(Int, Array[Int], Int)]() // (offset, values, type)
    def extShorts(vs: Array[Int]): Int = {
      if (at % 2 == 1) at += 1 // spec: values sit on word boundaries
      val o = at; extras += ((o, vs, 3)); at += 2 * vs.length
      o
    }
    def extLongs(vs: Array[Int]): Int = {
      if (at % 2 == 1) at += 1
      val o = at; extras += ((o, vs, 4)); at += 4 * vs.length
      o
    }
    val bpsVal =
      if (ch == 1) (3, 1, 8)
      else if (ch == 2) (3, 2, 8 | (8 << 16)) // two shorts fit inline
      else (3, ch, extShorts(Array.fill(ch)(8)))
    val soVal =
      if (nStrips == 1) (4, 1, stripOffsets.head)
      else (4, nStrips, extLongs(stripOffsets.toArray))
    val sbcVal =
      if (nStrips == 1) (4, 1, strips.head.length)
      else (4, nStrips, extLongs(strips.map(_.length).toArray))
    val photometric = if (ch <= 2) 1 else 2
    // IFD entries sorted by tag (the spec mandates ascending order)
    val entries = mutable.ArrayBuffer[(Int, Int, Int, Int)]() // tag,type,count,value
    entries += ((256, 4, 1, img.width))
    entries += ((257, 4, 1, img.height))
    entries += ((258, bpsVal._1, bpsVal._2, bpsVal._3))
    entries += ((259, 3, 1, compression))
    entries += ((262, 3, 1, photometric))
    entries += ((273, soVal._1, soVal._2, soVal._3))
    entries += ((277, 3, 1, ch))
    entries += ((278, 4, 1, rowsPerStrip))
    entries += ((279, sbcVal._1, sbcVal._2, sbcVal._3))
    entries += ((284, 3, 1, 1))
    if (ch == 2 || ch == 4)
      entries += ((338, 3, 1, 2)) // extra sample = unassociated alpha
    if (predictor) entries += ((317, 3, 1, 2))
    val sorted = entries.sortBy(_._1)
    val ifdAt = if (at % 2 == 1) at + 1 else at
    // header
    u32(ifdAt)
    strips.foreach(s => out.write(s, 0, s.length))
    extras.foreach { case (o, vs, t) =>
      while (out.size() < o) out.write(0) // pad to the word boundary
      vs.foreach(v => if (t == 3) u16(v) else u32(v))
    }
    while (out.size() < ifdAt) out.write(0)
    u16(sorted.size)
    sorted.foreach { case (tag, typ, count, value) =>
      u16(tag); u16(typ); u32(count)
      if (typ == 3 && count == 1) { u16(value); u16(0) }
      else u32(value) // count-2 shorts travel packed in `value`
    }
    u32(0) // no next IFD
    out.toByteArray
  }

  // ---------------------------------------------------------- decode

  private final class Reader(b: Array[Byte], le: Boolean) {
    def u16(o: Int): Int =
      if (o + 2 > b.length) -1
      else if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    def u32(o: Int): Long =
      if (o + 4 > b.length) -1L
      else if (le) (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      else ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  }

  private final case class Entry(typ: Int, count: Long, at: Int,
                                 inline: Boolean)

  /** First-IFD tag map; values resolved lazily via [[tagValues]]. */
  private def ifdEntries(b: Array[Byte], r: Reader)
      : Option[Map[Int, Entry]] = {
    val ifd = r.u32(4)
    if (ifd < 8 || ifd + 2 > b.length) return None
    val n = r.u16(ifd.toInt)
    if (n < 0 || n > 512) return None
    val m = mutable.Map[Int, Entry]()
    (0 until n).foreach { k =>
      val e = ifd.toInt + 2 + 12 * k
      if (e + 12 > b.length) return None
      val tag = r.u16(e)
      val typ = r.u16(e + 2)
      val count = r.u32(e + 4)
      val sz = typ match {
        case 1 | 2 | 6 | 7 => 1L
        case 3 | 8 => 2L
        case 4 | 9 | 11 => 4L
        case _ => 8L
      }
      val total = sz * count
      if (total <= 4) m(tag) = Entry(typ, count, e + 8, inline = true)
      else {
        val off = r.u32(e + 8)
        if (off < 0 || off + total > b.length) return None
        m(tag) = Entry(typ, count, off.toInt, inline = false)
      }
    }
    Some(m.toMap)
  }

  private def tagValues(r: Reader, e: Entry): Option[Array[Long]] = {
    val n = e.count.toInt
    if (n < 0 || n > (1 << 20)) return None
    val out = new Array[Long](n)
    (0 until n).foreach { i =>
      e.typ match {
        case 3 =>
          val x = r.u16(e.at + 2 * i); if (x < 0) return None
          out(i) = x
        case 4 =>
          val x = r.u32(e.at + 4 * i); if (x < 0) return None
          out(i) = x
        case 1 =>
          out(i) = 0 // BYTE values unused by this decoder's tags
        case _ => return None
      }
    }
    Some(out)
  }

  private def tag1(m: Map[Int, Entry], r: Reader, tag: Int,
                   default: Long = -1L): Long =
    m.get(tag).flatMap(e => tagValues(r, e).flatMap(_.headOption))
      .getOrElse(default)

  /** Decode the first IFD's image. None outside the supported profile
    * or on any malformed structure. */
  def decode(b: Array[Byte]): Option[Image] = {
    if (b.length < 8) return None
    val le = b(0) == 'I' && b(1) == 'I'
    val be = b(0) == 'M' && b(1) == 'M'
    if (!le && !be) return None
    val r = new Reader(b, le)
    if (r.u16(2) != 42) return None
    val m = ifdEntries(b, r).getOrElse(return None)
    val w = tag1(m, r, 256).toInt
    val h = tag1(m, r, 257).toInt
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
    val ch = math.max(1, tag1(m, r, 277, 1L)).toInt
    if (ch > 4) return None
    val bits = m.get(258).flatMap(e => tagValues(r, e))
      .getOrElse(Array.fill(ch)(8L))
    if (!bits.forall(_ == 8L)) return None
    val comp = tag1(m, r, 259, 1L).toInt
    val photo = tag1(m, r, 262, if (ch <= 2) 1L else 2L).toInt
    if (photo > 2) return None
    if (tag1(m, r, 284, 1L).toInt != 1) return None // chunky only
    val predictor = tag1(m, r, 317, 1L).toInt
    if (predictor != 1 && predictor != 2) return None
    if (predictor == 2 && comp != CompLzw) return None
    val rowBytes = w * ch
    val px = new Array[Byte](w * h * ch)
    def decompress(off: Long, len: Long, expect: Int)
        : Option[Array[Byte]] = {
      if (off < 0 || len < 0 || off + len > b.length) return None
      comp match {
        case CompNone =>
          if (len < expect) None
          else Some(java.util.Arrays.copyOfRange(b, off.toInt,
            off.toInt + expect))
        case CompPackBits => unpackBits(b, off.toInt, len.toInt, expect)
        case CompLzw => lzwDecode(b, off.toInt, len.toInt, expect)
        case _ => None
      }
    }
    if (m.contains(322)) {
      // tiled layout (TIFF 6.0 §15): a tw x th grid, every tile FULL
      // size with right/bottom padding discarded on copy-out
      val tw = tag1(m, r, 322).toInt
      val th = tag1(m, r, 323).toInt
      if (tw <= 0 || th <= 0 || tw % 16 != 0 || th % 16 != 0)
        return None
      val offs = m.get(324).flatMap(e => tagValues(r, e))
        .getOrElse(return None)
      val counts = m.get(325).flatMap(e => tagValues(r, e))
        .getOrElse(return None)
      val across = (w + tw - 1) / tw
      val downN = (h + th - 1) / th
      if (offs.length < across * downN ||
        counts.length < across * downN) return None
      val tileRow = tw * ch
      (0 until downN).foreach { ty =>
        (0 until across).foreach { tx =>
          val idx = ty * across + tx
          val raw = decompress(offs(idx), counts(idx), th * tileRow)
            .getOrElse(return None)
          val copyW = math.min(tw, w - tx * tw) * ch
          val copyH = math.min(th, h - ty * th)
          (0 until copyH).foreach { ry =>
            val row = java.util.Arrays.copyOfRange(raw, ry * tileRow,
              (ry + 1) * tileRow)
            if (predictor == 2) predictDecode(row, ch)
            System.arraycopy(row, 0, px,
              (ty * th + ry) * rowBytes + tx * tw * ch, copyW)
          }
        }
      }
    } else {
      val rps = {
        val v = tag1(m, r, 278, 0xffffffffL)
        if (v <= 0 || v > h) h else v.toInt
      }
      val offs = m.get(273).flatMap(e => tagValues(r, e))
        .getOrElse(return None)
      val counts = m.get(279).flatMap(e => tagValues(r, e))
        .getOrElse(return None)
      val nStrips = (h + rps - 1) / rps
      if (offs.length < nStrips || counts.length < nStrips) return None
      (0 until nStrips).foreach { s =>
        val y0 = s * rps
        val rows = math.min(rps, h - y0)
        val raw = decompress(offs(s), counts(s), rows * rowBytes)
          .getOrElse(return None)
        (0 until rows).foreach { ry =>
          val row = java.util.Arrays.copyOfRange(raw, ry * rowBytes,
            (ry + 1) * rowBytes)
          if (predictor == 2) predictDecode(row, ch)
          System.arraycopy(row, 0, px, (y0 + ry) * rowBytes, rowBytes)
        }
      }
    }
    if (photo == 0) { // WhiteIsZero: invert the gray channel
      if (ch > 2) return None
      var i = 0
      while (i < px.length) {
        if (i % ch == 0) px(i) = (~px(i)).toByte
        i += 1
      }
    }
    Some(Image(w, h, ch, px))
  }

  /** (width, height, channels) from the IFD alone. */
  def dims(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 8) return None
    val le = b(0) == 'I' && b(1) == 'I'
    val be = b(0) == 'M' && b(1) == 'M'
    if (!le && !be) return None
    val r = new Reader(b, le)
    if (r.u16(2) != 42) return None
    val m = ifdEntries(b, r).getOrElse(return None)
    val w = tag1(m, r, 256).toInt
    val h = tag1(m, r, 257).toInt
    val ch = math.max(1, tag1(m, r, 277, 1L)).toInt
    if (w <= 0 || h <= 0) None else Some((w, h, ch))
  }
}
