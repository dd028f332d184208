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

  /** `bits` ∈ {8, 16}; 16-bit samples travel BIG-ENDIAN in `pixels`
    * regardless of the container's byte order (the decoder normalizes,
    * the encoder swaps on write). */
  final case class Image(width: Int, height: Int, channels: Int,
                         pixels: Array[Byte], bits: Int = 8)

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

  /** Predictor 2 at 16 bits differences per SAMPLE (TIFF 6.0 §14 —
    * "the size of a sample is defined by BitsPerSample"), so the u16s
    * are read/written in the FILE's byte order, never bytewise. */
  private def predictEncode16LE(row: Array[Byte], ch: Int): Array[Byte] = {
    val out = row.clone()
    val stride = 2 * ch
    var i = row.length - 2
    while (i >= stride) {
      val cur = (row(i) & 0xff) | ((row(i + 1) & 0xff) << 8)
      val prev = (row(i - stride) & 0xff) |
        ((row(i - stride + 1) & 0xff) << 8)
      val d = (cur - prev) & 0xffff
      out(i) = (d & 0xff).toByte
      out(i + 1) = ((d >> 8) & 0xff).toByte
      i -= 2
    }
    out
  }

  private def predictDecode16(row: Array[Byte], ch: Int,
                              le: Boolean): Unit = {
    val stride = 2 * ch
    var i = stride
    while (i + 1 < row.length) {
      val cur =
        if (le) (row(i) & 0xff) | ((row(i + 1) & 0xff) << 8)
        else ((row(i) & 0xff) << 8) | (row(i + 1) & 0xff)
      val prev =
        if (le) (row(i - stride) & 0xff) |
          ((row(i - stride + 1) & 0xff) << 8)
        else ((row(i - stride) & 0xff) << 8) |
          (row(i - stride + 1) & 0xff)
      val v = (cur + prev) & 0xffff
      if (le) {
        row(i) = (v & 0xff).toByte
        row(i + 1) = ((v >> 8) & 0xff).toByte
      } else {
        row(i) = ((v >> 8) & 0xff).toByte
        row(i + 1) = (v & 0xff).toByte
      }
      i += 2
    }
  }

  // ---------------------------------------------------------- encode

  /** Little-endian TIFF with `rowsPerStrip`-row strips. `predictor`
    * applies horizontal differencing (only meaningful under LZW, where
    * the spec defines tag 317; per SAMPLE as the spec requires —
    * byte-wise for 8-bit, 16-bit-value-wise via predictEncode16LE
    * for 16-bit samples). `big` writes the BigTIFF (version
    * 43) layout: 8-byte offsets, 20-byte IFD entries, LONG8 strip
    * arrays. 16-bit samples write little-endian (swapped from the
    * canonical big-endian [[Image]] order). */
  def encode(img: Image, compression: Int = CompNone,
             predictor: Boolean = false,
             rowsPerStrip: Int = 8,
             big: Boolean = false,
             tile: Option[(Int, Int)] = None): Array[Byte] = {
    require(img.channels >= 1 && img.channels <= 4)
    require(img.bits == 8 || img.bits == 16)
    val bs = img.bits / 8
    require(img.pixels.length ==
      img.width * img.height * img.channels * bs)
    require(!predictor || compression == CompLzw,
      "predictor is a TIFF-LZW feature")
    val ch = img.channels
    val rowBytes = img.width * ch * bs
    /** one serialized row in FILE byte order, UNPREDICTED (the
      * predictor applies per compressed segment — per strip row or per
      * TILE row — never across a tile boundary). */
    def fileRow(y: Int): Array[Byte] = {
      val src = java.util.Arrays.copyOfRange(img.pixels,
        y * rowBytes, (y + 1) * rowBytes)
      if (bs == 2) { // canonical BE -> the file's little-endian
        var i = 0
        while (i + 1 < src.length) {
          val t = src(i); src(i) = src(i + 1); src(i + 1) = t
          i += 2
        }
      }
      src
    }
    def predict(row: Array[Byte]): Array[Byte] =
      if (!predictor) row
      else if (bs == 2) predictEncode16LE(row, ch)
      else predictEncode(row, ch)
    def compress(raw: Array[Byte]): Array[Byte] = compression match {
      case CompNone => raw
      case CompPackBits => packBits(raw)
      case CompLzw => lzwEncode(raw)
      case other => throw new IllegalArgumentException(s"comp $other")
    }
    val nStrips = math.max(1,
      (img.height + rowsPerStrip - 1) / rowsPerStrip)
    val strips = tile match {
      case None => (0 until nStrips).map { s =>
        val y0 = s * rowsPerStrip
        val y1 = math.min(img.height, y0 + rowsPerStrip)
        val raw = new Array[Byte]((y1 - y0) * rowBytes)
        (y0 until y1).foreach { y =>
          System.arraycopy(predict(fileRow(y)), 0, raw,
            (y - y0) * rowBytes, rowBytes)
        }
        compress(raw)
      }
      case Some((tw, th)) =>
        // tiled layout (TIFF 6.0 §15): every tile FULL size, edges
        // zero-padded; tile dims must be multiples of 16
        require(tw > 0 && th > 0 && tw % 16 == 0 && th % 16 == 0,
          "tile dims must be positive multiples of 16")
        val across = (img.width + tw - 1) / tw
        val downN = (img.height + th - 1) / th
        val tileRow = tw * ch * bs
        (0 until downN).flatMap { ty =>
          (0 until across).map { tx =>
            val raw = new Array[Byte](th * tileRow)
            val copyW = math.min(tw, img.width - tx * tw) * ch * bs
            val copyH = math.min(th, img.height - ty * th)
            (0 until copyH).foreach { ry =>
              val seg = new Array[Byte](tileRow)
              System.arraycopy(fileRow(ty * th + ry),
                tx * tw * ch * bs, seg, 0, copyW)
              System.arraycopy(predict(seg), 0, raw, ry * tileRow,
                tileRow)
            }
            compress(raw)
          }
        }
    }
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32(v: Long): Unit = {
      u16((v & 0xffff).toInt); u16(((v >>> 16) & 0xffff).toInt)
    }
    def u64(v: Long): Unit = { u32(v & 0xffffffffL); u32(v >>> 32) }
    val headerLen = if (big) 16 else 8
    out.write('I'); out.write('I'); u16(if (big) 43 else 42)
    if (big) { u16(8); u16(0) } // offset size + pad
    // layout: header | strip data | external arrays | IFD
    var at = headerLen
    val stripOffsets = strips.map { s => val o = at; at += s.length; o }
    // external value areas: (offset, values, type)
    val extras = mutable.ArrayBuffer[(Int, Array[Long], Int)]()
    def ext(vs: Array[Long], typ: Int, width: Int): Long = {
      if (at % 2 == 1) at += 1 // spec: values sit on word boundaries
      val o = at; extras += ((o, vs, typ)); at += width * vs.length
      o.toLong
    }
    val inlineCap = if (big) 8 else 4
    // (type, count, value-or-offset, inlineShorts)
    def shortsVal(vs: Array[Long]): (Int, Int, Long, Array[Long]) =
      if (2 * vs.length <= inlineCap) (3, vs.length, -1L, vs)
      else (3, vs.length, ext(vs, 3, 2), null)
    def offsetsVal(vs: Array[Long]): (Int, Int, Long, Array[Long]) =
      if (big) {
        if (vs.length == 1) (16, 1, vs.head, null)
        else (16, vs.length, ext(vs, 16, 8), null)
      } else {
        if (vs.length == 1) (4, 1, vs.head, null)
        else (4, vs.length, ext(vs, 4, 4), null)
      }
    val bpsVal = shortsVal(Array.fill(ch)(img.bits.toLong))
    val soVal = offsetsVal(stripOffsets.map(_.toLong).toArray)
    val sbcVal = offsetsVal(strips.map(_.length.toLong).toArray)
    val photometric = if (ch <= 2) 1 else 2
    // IFD entries sorted by tag (the spec mandates ascending order)
    val entries =
      mutable.ArrayBuffer[(Int, Int, Int, Long, Array[Long])]()
    def add(tag: Int, typ: Int, count: Int, value: Long,
            inlineShorts: Array[Long] = null): Unit =
      entries += ((tag, typ, count, value, inlineShorts))
    add(256, 4, 1, img.width)
    add(257, 4, 1, img.height)
    add(258, bpsVal._1, bpsVal._2, bpsVal._3, bpsVal._4)
    add(259, 3, 1, compression)
    add(262, 3, 1, photometric)
    tile match {
      case None =>
        add(273, soVal._1, soVal._2, soVal._3, soVal._4)
        add(278, 4, 1, rowsPerStrip)
        add(279, sbcVal._1, sbcVal._2, sbcVal._3, sbcVal._4)
      case Some((tw, th)) =>
        add(322, 4, 1, tw)
        add(323, 4, 1, th)
        add(324, soVal._1, soVal._2, soVal._3, soVal._4)
        add(325, sbcVal._1, sbcVal._2, sbcVal._3, sbcVal._4)
    }
    add(277, 3, 1, ch)
    add(284, 3, 1, 1)
    if (ch == 2 || ch == 4)
      add(338, 3, 1, 2) // extra sample = unassociated alpha
    if (predictor) add(317, 3, 1, 2)
    val sorted = entries.sortBy(_._1)
    val ifdAt = if (at % 2 == 1) at + 1 else at
    // header: first-IFD offset
    if (big) u64(ifdAt) else u32(ifdAt)
    strips.foreach(s => out.write(s, 0, s.length))
    extras.foreach { case (o, vs, t) =>
      while (out.size() < o) out.write(0) // pad to the word boundary
      vs.foreach(v => if (t == 3) u16(v.toInt)
        else if (t == 4) u32(v) else u64(v))
    }
    while (out.size() < ifdAt) out.write(0)
    if (big) u64(sorted.size) else u16(sorted.size)
    val valWidth = if (big) 8 else 4
    sorted.foreach { case (tag, typ, count, value, inlineShorts) =>
      u16(tag); u16(typ)
      if (big) u64(count) else u32(count)
      val before = out.size()
      if (inlineShorts != null) inlineShorts.foreach(v => u16(v.toInt))
      else if (typ == 16) u64(value)
      else if (typ == 3) u16(value.toInt)
      else u32(value)
      while (out.size() < before + valWidth) out.write(0)
    }
    if (big) u64(0) else u32(0) // no next IFD
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
    /** BigTIFF 8-byte field; -1 on overrun or a value beyond Int
      * addressing (in-memory buffers cap far below 2^31 anyway). */
    def u64(o: Int): Long =
      if (o + 8 > b.length) -1L
      else {
        val hi = u32(if (le) o + 4 else o)
        val lo = u32(if (le) o else o + 4)
        if (hi != 0L || lo < 0) -1L else lo
      }
  }

  private final case class Entry(typ: Int, count: Long, at: Int,
                                 inline: Boolean)

  /** First-IFD tag map for classic (42) or BigTIFF (43) layouts;
    * values resolved lazily via [[tagValues]]. */
  private def ifdEntries(b: Array[Byte], r: Reader, big: Boolean)
      : Option[Map[Int, Entry]] = {
    val ifd = if (big) r.u64(8) else r.u32(4)
    val headLen = if (big) 8 else 2 // entry-count field
    val entLen = if (big) 20 else 12
    val inlineCap = if (big) 8 else 4
    if (ifd < 8 || ifd + headLen > b.length) return None
    val n = (if (big) r.u64(ifd.toInt) else r.u16(ifd.toInt).toLong).toInt
    if (n < 0 || n > 512) return None
    val m = mutable.Map[Int, Entry]()
    (0 until n).foreach { k =>
      val e = ifd.toInt + headLen + entLen * k
      if (e + entLen > b.length) return None
      val tag = r.u16(e)
      val typ = r.u16(e + 2)
      val count = if (big) r.u64(e + 4) else r.u32(e + 4)
      if (count < 0) return None
      val sz = typ match {
        case 1 | 2 | 6 | 7 => 1L
        case 3 | 8 => 2L
        case 4 | 9 | 11 => 4L
        case _ => 8L // incl. 16/17/18 (LONG8/SLONG8/IFD8)
      }
      val total = sz * count
      val valAt = e + (if (big) 12 else 8)
      if (total <= inlineCap)
        m(tag) = Entry(typ, count, valAt, inline = true)
      else {
        val off = if (big) r.u64(valAt) else r.u32(valAt)
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
        case 16 =>
          val x = r.u64(e.at + 8 * i); if (x < 0) return None
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

  /** Decode the first IFD's image (classic 42 or BigTIFF 43 header).
    * None outside the supported profile or on any malformed
    * structure. */
  def decode(b: Array[Byte]): Option[Image] = {
    if (b.length < 8) return None
    val le = b(0) == 'I' && b(1) == 'I'
    val be = b(0) == 'M' && b(1) == 'M'
    if (!le && !be) return None
    val r = new Reader(b, le)
    val version = r.u16(2)
    val big = version == 43
    if (version != 42 && !big) return None
    // BigTIFF header: u16 offset size (always 8), u16 zero pad
    if (big && (b.length < 16 || r.u16(4) != 8 || r.u16(6) != 0))
      return None
    val m = ifdEntries(b, r, big).getOrElse(return None)
    val w = tag1(m, r, 256).toInt
    val h = tag1(m, r, 257).toInt
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
    val ch = math.max(1, tag1(m, r, 277, 1L)).toInt
    if (ch > 4) return None
    val bitsArr = m.get(258).flatMap(e => tagValues(r, e))
      .getOrElse(Array.fill(ch)(8L))
    val bits =
      if (bitsArr.forall(_ == 8L)) 8
      else if (bitsArr.forall(_ == 16L)) 16
      else return None
    val bs = bits / 8
    val comp = tag1(m, r, 259, 1L).toInt
    val photo = tag1(m, r, 262, if (ch <= 2) 1L else 2L).toInt
    if (photo > 2) return None
    if (tag1(m, r, 284, 1L).toInt != 1) return None // chunky only
    // SampleFormat (339): unsigned only (the default)
    if (tag1(m, r, 339, 1L).toInt != 1) return None
    val predictor = tag1(m, r, 317, 1L).toInt
    if (predictor != 1 && predictor != 2) return None
    if (predictor == 2 && comp != CompLzw) return None
    def applyPredictor(row: Array[Byte]): Unit =
      if (predictor == 2) {
        if (bs == 2) predictDecode16(row, ch, le)
        else predictDecode(row, ch)
      }
    val rowBytes = w * ch * bs
    val px = new Array[Byte](w * h * ch * bs)
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
      val tileRow = tw * ch * bs
      (0 until downN).foreach { ty =>
        (0 until across).foreach { tx =>
          val idx = ty * across + tx
          val raw = decompress(offs(idx), counts(idx), th * tileRow)
            .getOrElse(return None)
          val copyW = math.min(tw, w - tx * tw) * ch * bs
          val copyH = math.min(th, h - ty * th)
          (0 until copyH).foreach { ry =>
            val row = java.util.Arrays.copyOfRange(raw, ry * tileRow,
              (ry + 1) * tileRow)
            applyPredictor(row)
            System.arraycopy(row, 0, px,
              (ty * th + ry) * rowBytes + tx * tw * ch * bs, copyW)
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
          applyPredictor(row)
          System.arraycopy(row, 0, px, (y0 + ry) * rowBytes, rowBytes)
        }
      }
    }
    // canonical sample order: 16-bit samples normalize to big-endian
    // whatever byte order the container used
    if (bs == 2 && le) {
      var i = 0
      while (i + 1 < px.length) {
        val t = px(i); px(i) = px(i + 1); px(i + 1) = t
        i += 2
      }
    }
    if (photo == 0) { // WhiteIsZero: invert the gray channel
      if (ch > 2) return None
      var i = 0
      while (i < px.length) {
        // ~ per byte flips the full u16 too — only the gray SAMPLE
        if ((i / bs) % ch == 0) px(i) = (~px(i)).toByte
        i += 1
      }
    }
    Some(Image(w, h, ch, px, bits))
  }

  /** (width, height, channels) from the IFD alone. */
  def dims(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 8) return None
    val le = b(0) == 'I' && b(1) == 'I'
    val be = b(0) == 'M' && b(1) == 'M'
    if (!le && !be) return None
    val r = new Reader(b, le)
    val version = r.u16(2)
    val big = version == 43
    if (version != 42 && !big) return None
    if (big && (b.length < 16 || r.u16(4) != 8 || r.u16(6) != 0))
      return None
    val m = ifdEntries(b, r, big).getOrElse(return None)
    val w = tag1(m, r, 256).toInt
    val h = tag1(m, r, 257).toInt
    val ch = math.max(1, tag1(m, r, 277, 1L)).toInt
    if (w <= 0 || h <= 0) None else Some((w, h, ch))
  }
}
