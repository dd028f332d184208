package graft.multimodal

/** Baseline JPEG (ITU-T T.81 / JFIF T.871) codec — pure-spec, no image
  * libraries: the remaining first-class multimodal format after
  * WAV/BMP/PPM in [[MediaCodecs]] (a real training-data pipeline meets
  * JPEG before any of those). The reference treats media as opaque
  * payload bytes; this decoder is the feature-extraction half the
  * Spark pipeline adds on top.
  *
  * Scope — baseline sequential DCT, the profile every camera/JFIF file
  * carries:
  *  - markers: SOI, APPn/COM (skipped), DQT (8/16-bit entries), DHT,
  *    DRI, SOF0, SOS, RSTn, EOI;
  *  - 8-bit precision, 1 (grayscale) or 3 (YCbCr) components, all
  *    sampling factors 1x1 (4:4:4 — no chroma subsampling; subsampled
  *    files are rejected with None, not mis-decoded);
  *  - entropy: canonical Huffman per Annex C/F with FF00 byte
  *    unstuffing and restart-marker predictor resets;
  *  - dequant + double-precision separable IDCT + level shift/clamp.
  *
  * Color: the fixed-point YCbCr→RGB below (libjpeg's classic 16-bit
  * scaled constants) is integer-exact — `(x + 32768) >> 16` is
  * floor((x+32768)/65536) — so a SQL oracle can mirror it bit-for-bit
  * with the floor-division idiom. That is what lets q267 gate the
  * whole decode path against DuckDB arithmetic alone.
  *
  * Everything here is bounds-checked: malformed/truncated input yields
  * None, never an exception (same discipline as the BMP/.mmdb/Kafka
  * codecs).
  */
object Jpeg {

  /** Zig-zag scan order (T.81 Figure 5): index = scan position, value =
    * natural (row-major) coefficient index. */
  val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // ---- T.81 Annex K.3 typical Huffman tables (public spec constants)

  /** (bits-per-length[1..16], values) — DC luminance. */
  val DcLumaBits: Array[Int] =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  val DcLumaVals: Array[Int] = (0 to 11).toArray

  /** DC chrominance. */
  val DcChromaBits: Array[Int] =
    Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  val DcChromaVals: Array[Int] = (0 to 11).toArray

  /** AC luminance (Annex K.3.2). */
  val AcLumaBits: Array[Int] =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  val AcLumaVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** AC chrominance (Annex K.3.2). */
  val AcChromaBits: Array[Int] =
    Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  val AcChromaVals: Array[Int] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Quant tables whose DC entry (8) makes per-block-constant images
    * roundtrip EXACTLY: a constant block's FDCT is DC-only with
    * F(0,0)=8·(v−128), so Q_DC=8 stores v−128 verbatim and the IDCT
    * recovers v. AC entries never matter for such blocks (all-zero
    * coefficients quantize to zero under any table); 16 keeps generic
    * content sane. Two distinct tables so table-id selection is
    * exercised. */
  val QuantExactDcLuma: Array[Int] = Array.tabulate(64)(i => if (i == 0) 8 else 16)
  val QuantExactDcChroma: Array[Int] = Array.tabulate(64)(i => if (i == 0) 8 else 17)
  /** Near-lossless table for generic roundtrip fuzz: AC steps of 1
    * (per-pixel error a few counts), DC step 8 — baseline DC categories
    * stop at 11 (|quantized DC| ≤ 2047), and a smaller DC step would
    * overflow them for 8-bit samples (|F(0,0)| ≤ 8·128·8). */
  val QuantFlat1: Array[Int] = Array.tabulate(64)(i => if (i == 0) 8 else 1)

  // ------------------------------------------------------------- huffman

  /** Canonical Huffman codes from (BITS, HUFFVAL) — T.81 Annex C. Returns
    * (code, length) per value, in HUFFVAL order. */
  def buildCodes(bits: Array[Int], vals: Array[Int]): Array[(Int, Int)] = {
    val out = new Array[(Int, Int)](vals.length)
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        out(k) = (code, len); code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    out
  }

  /** Decode-side table: per bit-length min code, max code, and index of
    * the first value of that length (T.81 Annex F.2.2.3 DECODE). */
  final class HuffDec(bits: Array[Int], val vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxCode(l) = code - 1
        } else maxCode(l) = -1
        code <<= 1
        l += 1
      }
    }
  }

  // --------------------------------------------------------------- encode

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** Pad the tail with 1-bits (T.81 F.1.2.3). */
    def flush(): Unit = if (nbits > 0) { put(0xff, 8 - nbits); () }
  }

  private val C = Array.tabulate(8)(u =>
    if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)
  private val Cos = Array.tabulate(8, 8)((x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16.0))

  /** Forward DCT of one level-shifted 8x8 block (doubles; the encoder is
    * fixture-side so float FDCT + integer quant rounding is fine). */
  private def fdct(s: Array[Int]): Array[Double] = {
    val f = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            acc += s(y * 8 + x) * Cos(x)(v) * Cos(y)(u)
            x += 1
          }
          y += 1
        }
        f(u * 8 + v) = 0.25 * C(u) * C(v) * acc
        v += 1
      }
      u += 1
    }
    f
  }

  /** Bit length of |v| (T.81 "category"/SSSS). */
  private def magCat(v: Int): Int = {
    var a = math.abs(v); var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  /** Encode a baseline JFIF file. `planes` holds 1 (gray) or 3 (Y,Cb,Cr)
    * full-resolution sample planes, row-major, values 0..255.
    * `subsample420` switches the 3-component layout to 4:2:0 (luma 2x2,
    * chroma box-averaged to half resolution — the shape most real JPEG
    * files use); default is 4:4:4. `restartInterval` > 0 emits DRI +
    * RSTn markers every n MCUs. */
  def encode(width: Int, height: Int, planes: Array[Array[Int]],
             qLuma: Array[Int] = QuantExactDcLuma,
             qChroma: Array[Int] = QuantExactDcChroma,
             restartInterval: Int = 0,
             subsample420: Boolean = false): Array[Byte] = {
    require(planes.length == 1 || planes.length == 3,
      s"1 or 3 planes, got ${planes.length}")
    require(width > 0 && height > 0 &&
      planes.forall(_.length == width * height), "plane size mismatch")
    require(!subsample420 || planes.length == 3, "4:2:0 needs YCbCr")
    val nc = planes.length
    val sub = subsample420 && nc == 3
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }

    marker(0xd8) // SOI
    // APP0 / JFIF 1.1, no thumbnail
    marker(0xe0); u16(16)
    "JFIF".foreach(c => u8(c)); u8(0)
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    // DQT: both tables in one segment, 8-bit entries, zigzag order
    val qts = if (nc == 1) Seq((0, qLuma)) else Seq((0, qLuma), (1, qChroma))
    marker(0xdb); u16(2 + qts.size * 65)
    qts.foreach { case (id, q) =>
      u8(id); Zigzag.foreach(z => u8(q(z)))
    }
    // SOF0: baseline, 8-bit; luma 2x2 when subsampled, else 1x1
    marker(0xc0); u16(8 + 3 * nc)
    u8(8); u16(height); u16(width); u8(nc)
    (0 until nc).foreach { c =>
      u8(c + 1)
      u8(if (c == 0 && sub) 0x22 else 0x11)
      u8(if (c == 0) 0 else 1)
    }
    // DHT: all tables for the components present
    val hts: Seq[(Int, Array[Int], Array[Int])] =
      if (nc == 1) Seq((0x00, DcLumaBits, DcLumaVals),
        (0x10, AcLumaBits, AcLumaVals))
      else Seq((0x00, DcLumaBits, DcLumaVals),
        (0x10, AcLumaBits, AcLumaVals),
        (0x01, DcChromaBits, DcChromaVals),
        (0x11, AcChromaBits, AcChromaVals))
    marker(0xc4); u16(2 + hts.map(17 + _._3.length).sum)
    hts.foreach { case (tc, bits, vals) =>
      u8(tc); bits.foreach(u8); vals.foreach(u8)
    }
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }
    // SOS
    marker(0xda); u16(6 + 2 * nc)
    u8(nc)
    (0 until nc).foreach { c =>
      u8(c + 1); u8(if (c == 0) 0x00 else 0x11)
    }
    u8(0); u8(63); u8(0) // Ss/Se/Ah+Al for sequential

    // entropy-coded scan
    val dcCodes = Array(buildCodes(DcLumaBits, DcLumaVals),
      buildCodes(DcChromaBits, DcChromaVals))
    val acCodes = Array(buildCodes(AcLumaBits, AcLumaVals),
      buildCodes(AcChromaBits, AcChromaVals))
    val acValIdx = Array(
      AcLumaVals.zipWithIndex.toMap, AcChromaVals.zipWithIndex.toMap)
    var bw = new BitWriter(out)
    val pred = new Array[Int](nc)

    // gather an (edge-replicated) level-shifted 8x8 block from a plane
    def gather(plane: Array[Int], pw: Int, ph: Int,
               bx: Int, by: Int): Array[Int] = {
      val blk = new Array[Int](64)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          val sx = math.min(bx * 8 + x, pw - 1)
          val sy = math.min(by * 8 + y, ph - 1)
          blk(y * 8 + x) = plane(sy * pw + sx) - 128
          x += 1
        }
        y += 1
      }
      blk
    }

    def emitBlock(blk: Array[Int], comp: Int): Unit = {
      val tsel = if (comp == 0) 0 else 1
      val q = if (comp == 0) qLuma else qChroma
      val f = fdct(blk)
      val zz = new Array[Int](64)
      zz(0) = math.round(f(0) / q(0)).toInt
      var i = 1
      while (i < 64) {
        // AC categories stop at 10 in baseline: clamp to ±1023
        // (only reachable with tiny quant steps on extreme blocks)
        val v = math.round(f(Zigzag(i)) / q(Zigzag(i))).toInt
        zz(i) = math.max(-1023, math.min(1023, v))
        i += 1
      }
      // DC: category + diff bits (negatives in one's complement)
      val diff = zz(0) - pred(comp)
      pred(comp) = zz(0)
      val cat = magCat(diff)
      val (dcode, dlen) = dcCodes(tsel)(cat)
      bw.put(dcode, dlen)
      if (cat > 0) {
        val bitsV = if (diff >= 0) diff else diff + (1 << cat) - 1
        bw.put(bitsV, cat)
      }
      // AC: run/size with ZRL and EOB
      var k = 1
      var run = 0
      while (k < 64) {
        val v = zz(k)
        if (v == 0) run += 1
        else {
          while (run > 15) {
            val (zc, zl) = acCodes(tsel)(acValIdx(tsel)(0xf0))
            bw.put(zc, zl); run -= 16
          }
          val scat = magCat(v)
          val rs = (run << 4) | scat
          val (ac, al) = acCodes(tsel)(acValIdx(tsel)(rs))
          bw.put(ac, al)
          val bitsV = if (v >= 0) v else v + (1 << scat) - 1
          bw.put(bitsV, scat)
          run = 0
        }
        k += 1
      }
      if (run > 0) {
        val (ec, el) = acCodes(tsel)(acValIdx(tsel)(0x00))
        bw.put(ec, el)
      }
    }

    def restartMaybe(mcu: Int, rst: Int): Int = {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.flush()
        marker(0xd0 + rst % 8)
        java.util.Arrays.fill(pred, 0)
        bw = new BitWriter(out)
        rst + 1
      } else rst
    }

    if (!sub) {
      val mbw = (width + 7) / 8
      val mbh = (height + 7) / 8
      var mcu = 0
      var rst = 0
      var by = 0
      while (by < mbh) {
        var bx = 0
        while (bx < mbw) {
          rst = restartMaybe(mcu, rst)
          var c = 0
          while (c < nc) {
            emitBlock(gather(planes(c), width, height, bx, by), c)
            c += 1
          }
          mcu += 1
          bx += 1
        }
        by += 1
      }
    } else {
      // 4:2:0: chroma box-averaged to half resolution (rounded), MCU =
      // four luma blocks + one Cb + one Cr
      val cw = (width + 1) / 2
      val chh = (height + 1) / 2
      def half(plane: Array[Int]): Array[Int] = {
        val o = new Array[Int](cw * chh)
        var y = 0
        while (y < chh) {
          var x = 0
          while (x < cw) {
            var sum = 0
            var n = 0
            var dy = 0
            while (dy < 2) {
              var dx = 0
              while (dx < 2) {
                val sx = 2 * x + dx
                val sy = 2 * y + dy
                if (sx < width && sy < height) {
                  sum += plane(sy * width + sx); n += 1
                }
                dx += 1
              }
              dy += 1
            }
            o(y * cw + x) = (sum + n / 2) / n
            x += 1
          }
          y += 1
        }
        o
      }
      val cb = half(planes(1))
      val cr = half(planes(2))
      val mw = (width + 15) / 16
      val mh = (height + 15) / 16
      var mcu = 0
      var rst = 0
      var my = 0
      while (my < mh) {
        var mx = 0
        while (mx < mw) {
          rst = restartMaybe(mcu, rst)
          var j = 0
          while (j < 2) {
            var i = 0
            while (i < 2) {
              emitBlock(gather(planes(0), width, height,
                2 * mx + i, 2 * my + j), 0)
              i += 1
            }
            j += 1
          }
          emitBlock(gather(cb, cw, chh, mx, my), 1)
          emitBlock(gather(cr, cw, chh, mx, my), 2)
          mcu += 1
          mx += 1
        }
        my += 1
      }
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  // --------------------------------------------------------------- decode

  /** Decoded image: full-resolution sample planes (1 = gray, 3 = YCbCr),
    * values 0..255 row-major. */
  final case class Decoded(width: Int, height: Int,
                           planes: Array[Array[Int]])

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var truncated = false
    /** Next bit, unstuffing FF00; a real marker ends the stream (reads
      * past it return 0 with `truncated` latched — callers abort). */
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) { truncated = true; return 0 }
        var v = b(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          if (pos >= b.length) { truncated = true; return 0 }
          val nxt = b(pos) & 0xff
          if (nxt == 0x00) pos += 1 // stuffed FF
          else { truncated = true; v = 0; pos -= 1 } // marker: stop
        }
        acc = v; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Drop partial byte and consume an expected RSTn; false on anything
      * else. */
    def restart(): Boolean = {
      nbits = 0
      if (pos + 1 >= b.length || (b(pos) & 0xff) != 0xff) return false
      val m = b(pos + 1) & 0xff
      if (m < 0xd0 || m > 0xd7) return false
      pos += 2
      true
    }
  }

  private def huffDecode(br: BitReader, t: HuffDec): Int = {
    var code = br.bit()
    var l = 1
    while (l <= 16) {
      if (t.maxCode(l) >= 0 && code <= t.maxCode(l) && code >= t.minCode(l)) {
        val idx = t.valPtr(l) + (code - t.minCode(l))
        if (idx >= t.vals.length) return -1
        return t.vals(idx)
      }
      code = (code << 1) | br.bit()
      l += 1
    }
    -1
  }

  /** EXTEND (T.81 F.2.2.1): map `cat` received bits to the signed
    * value. */
  private def extend(v: Int, cat: Int): Int =
    if (cat == 0) 0
    else if (v < (1 << (cat - 1))) v - (1 << cat) + 1
    else v

  /** Decode a baseline JFIF/JPEG byte stream. None on anything outside
    * the supported profile or any malformed structure. */
  def decode(b: Array[Byte]): Option[Decoded] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var pos = 2
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffDec](4)
    val acTabs = new Array[HuffDec](4)
    var width = 0
    var height = 0
    var nc = 0
    var compQ: Array[Int] = null    // quant table id per component
    var compDc: Array[Int] = null   // huffman DC table id (from SOS)
    var compAc: Array[Int] = null
    var restartInterval = 0
    var samp420 = false

    def u16(o: Int): Int =
      if (o + 1 >= b.length) -1
      else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

    while (pos + 3 < b.length) {
      if ((b(pos) & 0xff) != 0xff) return None
      val m = b(pos + 1) & 0xff
      pos += 2
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) {
        // SOI repeat / stray RST between segments: no payload
      } else if (m == 0xd9) {
        return None // EOI before SOS
      } else {
        val len = u16(pos)
        if (len < 2 || pos + len > b.length) return None
        val seg = pos + 2
        val segEnd = pos + len
        m match {
          case 0xdb => // DQT
            var o = seg
            while (o < segEnd) {
              val pq = (b(o) & 0xff) >> 4
              val id = b(o) & 0x0f
              if (id > 3 || pq > 1) return None
              val step = if (pq == 0) 1 else 2
              if (o + 1 + 64 * step > segEnd) return None
              val t = new Array[Int](64)
              var i = 0
              while (i < 64) {
                val v = if (pq == 0) b(o + 1 + i) & 0xff
                  else u16(o + 1 + 2 * i)
                t(Zigzag(i)) = v
                i += 1
              }
              quant(id) = t
              o += 1 + 64 * step
            }
          case 0xc4 => // DHT
            var o = seg
            while (o < segEnd) {
              if (o + 17 > segEnd) return None
              val tc = (b(o) & 0xff) >> 4
              val th = b(o) & 0x0f
              if (tc > 1 || th > 3) return None
              val bits = Array.tabulate(16)(i => b(o + 1 + i) & 0xff)
              val n = bits.sum
              if (n > 256 || o + 17 + n > segEnd) return None
              val vals = Array.tabulate(n)(i => b(o + 17 + i) & 0xff)
              val t = new HuffDec(bits, vals)
              if (tc == 0) dcTabs(th) = t else acTabs(th) = t
              o += 17 + n
            }
          case 0xc0 => // SOF0 baseline
            if (len < 8 || (b(seg) & 0xff) != 8) return None
            height = u16(seg + 1); width = u16(seg + 3)
            nc = b(seg + 5) & 0xff
            if (width <= 0 || height <= 0 ||
              (nc != 1 && nc != 3) || len != 8 + 3 * nc) return None
            compQ = new Array[Int](nc)
            val samps = new Array[Int](nc)
            var i = 0
            while (i < nc) {
              val o = seg + 6 + 3 * i
              samps(i) = b(o + 1) & 0xff
              compQ(i) = b(o + 2) & 0x0f
              i += 1
            }
            // 4:4:4 (all 1x1) or 4:2:0 (luma 2x2, chroma 1x1); other
            // sampling layouts are rejected, never mis-decoded
            if (samps.forall(_ == 0x11)) samp420 = false
            else if (nc == 3 && samps(0) == 0x22 &&
              samps(1) == 0x11 && samps(2) == 0x11) samp420 = true
            else return None
          case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
               0xcb | 0xcd | 0xce | 0xcf =>
            return None // non-baseline SOF
          case 0xdd => // DRI
            if (len != 4) return None
            restartInterval = u16(seg)
          case 0xda => // SOS — entropy data follows
            if (nc == 0 || compQ == null) return None
            val ns = b(seg) & 0xff
            if (ns != nc || len != 6 + 2 * ns) return None
            compDc = new Array[Int](nc)
            compAc = new Array[Int](nc)
            var i = 0
            while (i < nc) {
              compDc(i) = (b(seg + 1 + 2 * i + 1) & 0xff) >> 4
              compAc(i) = b(seg + 1 + 2 * i + 1) & 0x0f
              i += 1
            }
            return decodeScan(b, segEnd, width, height, nc, quant,
              dcTabs, acTabs, compQ, compDc, compAc, restartInterval,
              samp420)
          case _ => () // APPn, COM, others: skip
        }
        pos = segEnd
      }
    }
    None // no SOS reached
  }

  private def decodeScan(b: Array[Byte], scanStart: Int, width: Int,
                         height: Int, nc: Int, quant: Array[Array[Int]],
                         dcTabs: Array[HuffDec], acTabs: Array[HuffDec],
                         compQ: Array[Int], compDc: Array[Int],
                         compAc: Array[Int],
                         restartInterval: Int,
                         samp420: Boolean): Option[Decoded] = {
    var i = 0
    while (i < nc) {
      if (quant(compQ(i)) == null || dcTabs(compDc(i)) == null ||
        acTabs(compAc(i)) == null) return None
      i += 1
    }
    val br = new BitReader(b, scanStart)
    val pred = new Array[Int](nc)
    val zz = new Array[Int](64)
    val blk = new Array[Double](64)

    // entropy-decode one block of component `c`, IDCT it into `plane`
    // (dims pw x ph) at block position (bx, by); false on any error
    def readBlock(c: Int, plane: Array[Int], pw: Int, ph: Int,
                  bx: Int, by: Int): Boolean = {
      java.util.Arrays.fill(zz, 0)
      val cat = huffDecode(br, dcTabs(compDc(c)))
      if (cat < 0 || cat > 15 || br.truncated) return false
      val diff = extend(br.bits(cat), cat)
      pred(c) += diff
      zz(0) = pred(c)
      var k = 1
      while (k < 64) {
        val rs = huffDecode(br, acTabs(compAc(c)))
        if (rs < 0 || br.truncated) return false
        val run = rs >> 4
        val size = rs & 0x0f
        if (size == 0) {
          if (run == 15) k += 16 // ZRL
          else k = 64            // EOB
        } else {
          k += run
          if (k > 63) return false
          zz(k) = extend(br.bits(size), size)
          k += 1
        }
      }
      if (br.truncated) return false
      val q = quant(compQ(c))
      var j = 0
      while (j < 64) {
        blk(Zigzag(j)) = zz(j).toDouble * q(Zigzag(j)); j += 1
      }
      idctInto(blk, plane, pw, ph, bx, by)
      true
    }

    def restartMaybe(mcu: Int): Boolean = {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!br.restart()) return false
        java.util.Arrays.fill(pred, 0)
      }
      true
    }

    if (!samp420) {
      val planes = Array.fill(nc)(new Array[Int](width * height))
      val mbw = (width + 7) / 8
      val mbh = (height + 7) / 8
      var mcu = 0
      var by = 0
      while (by < mbh) {
        var bx = 0
        while (bx < mbw) {
          if (!restartMaybe(mcu)) return None
          var c = 0
          while (c < nc) {
            if (!readBlock(c, planes(c), width, height, bx, by))
              return None
            c += 1
          }
          mcu += 1
          bx += 1
        }
        by += 1
      }
      Some(Decoded(width, height, planes))
    } else {
      // 4:2:0 MCU = 4 luma blocks (2x2) + Cb + Cr at half resolution;
      // chroma upsampled by replication into the full-res planes the
      // Decoded contract promises
      val cw = (width + 1) / 2
      val chh = (height + 1) / 2
      val yP = new Array[Int](width * height)
      val cbH = new Array[Int](cw * chh)
      val crH = new Array[Int](cw * chh)
      val mw = (width + 15) / 16
      val mh = (height + 15) / 16
      var mcu = 0
      var my = 0
      while (my < mh) {
        var mx = 0
        while (mx < mw) {
          if (!restartMaybe(mcu)) return None
          var j = 0
          while (j < 2) {
            var i2 = 0
            while (i2 < 2) {
              if (!readBlock(0, yP, width, height, 2 * mx + i2,
                2 * my + j)) return None
              i2 += 1
            }
            j += 1
          }
          if (!readBlock(1, cbH, cw, chh, mx, my)) return None
          if (!readBlock(2, crH, cw, chh, mx, my)) return None
          mcu += 1
          mx += 1
        }
        my += 1
      }
      def up(h: Array[Int]): Array[Int] = {
        val o = new Array[Int](width * height)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            o(y * width + x) = h((y / 2) * cw + (x / 2))
            x += 1
          }
          y += 1
        }
        o
      }
      Some(Decoded(width, height, Array(yP, up(cbH), up(crH))))
    }
  }

  /** Separable-enough double IDCT of one dequantized block, written
    * clamped+level-shifted into the plane (edge blocks clipped). */
  private def idctInto(f: Array[Double], plane: Array[Int], width: Int,
                       height: Int, bx: Int, by: Int): Unit = {
    var y = 0
    while (y < 8) {
      val py = by * 8 + y
      var x = 0
      while (x < 8) {
        val px = bx * 8 + x
        if (px < width && py < height) {
          var acc = 0.0
          var u = 0
          while (u < 8) {
            var v = 0
            while (v < 8) {
              val coef = f(u * 8 + v)
              if (coef != 0.0)
                acc += C(u) * C(v) * coef * Cos(x)(v) * Cos(y)(u)
              v += 1
            }
            u += 1
          }
          val s = math.round(acc * 0.25).toInt + 128
          plane(py * width + px) = math.max(0, math.min(255, s))
        }
        x += 1
      }
      y += 1
    }
  }

  // ---------------------------------------------------------------- color

  /** Fixed-point JFIF YCbCr→RGB (libjpeg's classic 16-bit constants:
    * 1.402→91881, 0.344136→22554, 0.714136→46802, 1.772→116130), with
    * round-half-up via `(x + 32768) >> 16` — arithmetic shift IS floor
    * division, so `floor((x + 32768) / 65536)` reproduces it exactly in
    * SQL. Returns (r, g, b) each clamped to 0..255. */
  def ycbcrToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    val cb0 = cb - 128
    val cr0 = cr - 128
    def fx(x: Long): Int = {
      val v = ((x + 32768L) >> 16).toInt
      math.max(0, math.min(255, v))
    }
    (fx(y * 65536L + 91881L * cr0),
      fx(y * 65536L - 22554L * cb0 - 46802L * cr0),
      fx(y * 65536L + 116130L * cb0))
  }

  /** Interleaved RGB bytes of a decoded image (gray replicates). */
  def rgb(d: Decoded): Array[Byte] = {
    val out = new Array[Byte](d.width * d.height * 3)
    var i = 0
    val n = d.width * d.height
    while (i < n) {
      if (d.planes.length == 1) {
        val v = d.planes(0)(i).toByte
        out(3 * i) = v; out(3 * i + 1) = v; out(3 * i + 2) = v
      } else {
        val (r, g, bl) = ycbcrToRgb(d.planes(0)(i), d.planes(1)(i),
          d.planes(2)(i))
        out(3 * i) = r.toByte; out(3 * i + 1) = g.toByte
        out(3 * i + 2) = bl.toByte
      }
      i += 1
    }
    out
  }

  /** (width, height, components) from the SOF0 header alone — the
    * metadata probe [[MediaCodecs.decode]] rides. */
  def dims(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var pos = 2
    while (pos + 3 < b.length) {
      if ((b(pos) & 0xff) != 0xff) return None
      val m = b(pos + 1) & 0xff
      pos += 2
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) ()
      else {
        val len = if (pos + 1 < b.length)
          ((b(pos) & 0xff) << 8) | (b(pos + 1) & 0xff) else -1
        if (len < 2 || pos + len > b.length) return None
        if (m == 0xc0) {
          if (len < 8) return None
          val h = ((b(pos + 3) & 0xff) << 8) | (b(pos + 4) & 0xff)
          val w = ((b(pos + 5) & 0xff) << 8) | (b(pos + 6) & 0xff)
          val n = b(pos + 7) & 0xff
          if (w <= 0 || h <= 0) return None
          return Some((w, h, n))
        }
        if (m == 0xda) return None // scan before SOF0
        pos += len
      }
    }
    None
  }
}
