package graft.multimodal

/** JPEG (ITU-T T.81 / JFIF T.871) codec — pure-spec, no image
  * libraries: the remaining first-class multimodal format after
  * WAV/BMP/PPM in [[MediaCodecs]] (a real training-data pipeline meets
  * JPEG before any of those). The reference treats media as opaque
  * payload bytes; this decoder is the feature-extraction half the
  * Spark pipeline adds on top.
  *
  * Scope — the profiles real camera/web JFIF files carry:
  *  - markers: SOI, APPn/COM (skipped), DQT (8/16-bit entries), DHT,
  *    DRI, SOF0, SOF2, SOS, RSTn, EOI;
  *  - 8-bit precision, 1 (grayscale) or 3 (YCbCr) components, 4:4:4
  *    or 4:2:0 chroma subsampling (box downsample / replication
  *    upsample); other layouts rejected with None, never mis-decoded;
  *  - BASELINE sequential decoding with restart-marker predictor
  *    resets, and PROGRESSIVE (SOF2) decoding with full spectral
  *    selection AND successive approximation per Annex G — DC
  *    first/refine, AC first/refine with EOB-run coding — validated
  *    against javax.imageio's progressive writer output;
  *  - entropy: canonical Huffman per Annex C/F with FF00 byte
  *    unstuffing;
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

  /** Encode a PROGRESSIVE (SOF2) JFIF file — spectral selection only
    * (Ah=Al=0, the simple legal progressive form): scan 1 carries every
    * component's DC coefficients interleaved, then per component two
    * AC band scans (1..5, 6..63) with single-block EOBs (EOB runs are
    * emitted but never merged, so the Annex K baseline tables suffice —
    * they carry no EOBn symbols above n=0). Coefficients are identical
    * to [[encode]]'s, so a correct decoder produces pixel-identical
    * output for the two files. 4:4:4 / grayscale only. */
  def encodeProgressive(width: Int, height: Int,
                        planes: Array[Array[Int]],
                        qLuma: Array[Int] = QuantExactDcLuma,
                        qChroma: Array[Int] = QuantExactDcChroma)
      : Array[Byte] = {
    require(planes.length == 1 || planes.length == 3)
    require(width > 0 && height > 0 &&
      planes.forall(_.length == width * height))
    val nc = planes.length
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16v(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8)
    marker(0xe0); u16v(16)
    "JFIF".foreach(c => u8(c)); u8(0)
    u8(1); u8(1); u8(0); u16v(1); u16v(1); u8(0); u8(0)
    val qts = if (nc == 1) Seq((0, qLuma)) else Seq((0, qLuma), (1, qChroma))
    marker(0xdb); u16v(2 + qts.size * 65)
    qts.foreach { case (id, q) => u8(id); Zigzag.foreach(z => u8(q(z))) }
    marker(0xc2); u16v(8 + 3 * nc)        // SOF2
    u8(8); u16v(height); u16v(width); u8(nc)
    (0 until nc).foreach { c =>
      u8(c + 1); u8(0x11); u8(if (c == 0) 0 else 1)
    }
    val hts: Seq[(Int, Array[Int], Array[Int])] =
      if (nc == 1) Seq((0x00, DcLumaBits, DcLumaVals),
        (0x10, AcLumaBits, AcLumaVals))
      else Seq((0x00, DcLumaBits, DcLumaVals),
        (0x10, AcLumaBits, AcLumaVals),
        (0x01, DcChromaBits, DcChromaVals),
        (0x11, AcChromaBits, AcChromaVals))
    marker(0xc4); u16v(2 + hts.map(17 + _._3.length).sum)
    hts.foreach { case (tc, bits, vals) =>
      u8(tc); bits.foreach(u8); vals.foreach(u8)
    }
    // quantized coefficient blocks per component (natural order),
    // identical arithmetic to the baseline path
    val mbw = (width + 7) / 8
    val mbh = (height + 7) / 8
    val dcCodes = Array(buildCodes(DcLumaBits, DcLumaVals),
      buildCodes(DcChromaBits, DcChromaVals))
    val acCodes = Array(buildCodes(AcLumaBits, AcLumaVals),
      buildCodes(AcChromaBits, AcChromaVals))
    val acValIdx = Array(
      AcLumaVals.zipWithIndex.toMap, AcChromaVals.zipWithIndex.toMap)
    val coefZz = Array.ofDim[Array[Int]](nc, mbw * mbh)
    var c = 0
    while (c < nc) {
      val q = if (c == 0) qLuma else qChroma
      var bi = 0
      while (bi < mbw * mbh) {
        val bx = bi % mbw
        val by = bi / mbw
        val blk = new Array[Int](64)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val sx = math.min(bx * 8 + x, width - 1)
            val sy = math.min(by * 8 + y, height - 1)
            blk(y * 8 + x) = planes(c)(sy * width + sx) - 128
            x += 1
          }
          y += 1
        }
        val f = fdct(blk)
        val zz = new Array[Int](64)
        zz(0) = math.round(f(0) / q(0)).toInt
        var i = 1
        while (i < 64) {
          val v = math.round(f(Zigzag(i)) / q(Zigzag(i))).toInt
          zz(i) = math.max(-1023, math.min(1023, v))
          i += 1
        }
        coefZz(c)(bi) = zz
        bi += 1
      }
      c += 1
    }
    def sos(comps: Seq[Int], ss: Int, se: Int): Unit = {
      marker(0xda); u16v(6 + 2 * comps.size)
      u8(comps.size)
      comps.foreach { ci =>
        u8(ci + 1); u8(if (ci == 0) 0x00 else 0x11)
      }
      u8(ss); u8(se); u8(0)
    }
    // scan 1: interleaved DC
    sos(0 until nc, 0, 0)
    locally {
      val bw = new BitWriter(out)
      val pred = new Array[Int](nc)
      var bi = 0
      while (bi < mbw * mbh) {
        var ci = 0
        while (ci < nc) {
          val tsel = if (ci == 0) 0 else 1
          val dc = coefZz(ci)(bi)(0)
          val diff = dc - pred(ci)
          pred(ci) = dc
          val cat = magCat(diff)
          val (dcode, dlen) = dcCodes(tsel)(cat)
          bw.put(dcode, dlen)
          if (cat > 0) {
            val bitsV = if (diff >= 0) diff else diff + (1 << cat) - 1
            bw.put(bitsV, cat)
          }
          ci += 1
        }
        bi += 1
      }
      bw.flush()
    }
    // per component: AC band scans (1..5), (6..63)
    (0 until nc).foreach { ci =>
      Seq((1, 5), (6, 63)).foreach { case (ss, se) =>
        sos(Seq(ci), ss, se)
        val bw = new BitWriter(out)
        val tsel = if (ci == 0) 0 else 1
        var bi = 0
        while (bi < mbw * mbh) {
          val zz = coefZz(ci)(bi)
          var last = se
          while (last >= ss && zz(last) == 0) last -= 1
          var k = ss
          var run = 0
          while (k <= last) {
            val v = zz(k)
            if (v == 0) run += 1
            else {
              while (run > 15) {
                val (zc, zl) = acCodes(tsel)(acValIdx(tsel)(0xf0))
                bw.put(zc, zl); run -= 16
              }
              val scat = magCat(v)
              val (ac, al2) = acCodes(tsel)(acValIdx(tsel)(
                (run << 4) | scat))
              bw.put(ac, al2)
              val bitsV = if (v >= 0) v else v + (1 << scat) - 1
              bw.put(bitsV, scat)
              run = 0
            }
            k += 1
          }
          if (last < se) { // EOB for this block (run of exactly 1)
            val (ec, el) = acCodes(tsel)(acValIdx(tsel)(0x00))
            bw.put(ec, el)
          }
          bi += 1
        }
        bw.flush()
      }
    }
    marker(0xd9)
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
    if (b.length < 4 || (b(0) & 0xff) != 0xff) return None
    var soi = 1 // fill bytes (B.1.1.2) may precede the SOI code itself
    while (soi < b.length && (b(soi) & 0xff) == 0xff) soi += 1
    if (soi >= b.length || (b(soi) & 0xff) != 0xd8) return None
    var pos = soi + 1
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
    var progressive = false
    // progressive state: full DCT coefficient planes per component,
    // accumulated across scans, IDCT'd once at EOI
    var coefs: Array[Array[Int]] = null
    var sawScan = false

    def u16(o: Int): Int =
      if (o + 1 >= b.length) -1
      else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

    while (pos + 1 < b.length) {
      if ((b(pos) & 0xff) != 0xff) return None
      // T.81 B.1.1.2: markers may be preceded by any number of 0xFF
      // fill bytes — skip padding until the marker code itself.
      var m = b(pos + 1) & 0xff
      while (m == 0xff && pos + 2 < b.length) { pos += 1; m = b(pos + 1) & 0xff }
      if (m == 0xff) return None
      pos += 2
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) {
        // SOI repeat / stray RST between segments: no payload
      } else if (m == 0xd9) {
        // EOI: in progressive mode this is where the accumulated
        // coefficients become pixels; in baseline it's premature
        if (!progressive || !sawScan) return None
        val blk = new Array[Double](64)
        val comp = Array.tabulate(nc) { c =>
          val g = ProgGrid(width, height, samp420, c)
          val q = quant(compQ(c))
          if (q == null) return None
          val plane = new Array[Int](g.cw * g.ch)
          var by = 0
          while (by < g.bnH) {
            var bx = 0
            while (bx < g.bnW) {
              val base = (by * g.biW + bx) * 64
              var j = 0
              while (j < 64) {
                blk(j) = coefs(c)(base + j).toDouble * q(j); j += 1
              }
              idctInto(blk, plane, g.cw, g.ch, bx, by)
              bx += 1
            }
            by += 1
          }
          plane
        }
        if (!samp420) return Some(Decoded(width, height, comp))
        // replication-upsample chroma to the full-res contract
        val g1 = ProgGrid(width, height, samp420, 1)
        def up(hp: Array[Int]): Array[Int] = {
          val o = new Array[Int](width * height)
          var y = 0
          while (y < height) {
            var x = 0
            while (x < width) {
              o(y * width + x) = hp((y / 2) * g1.cw + (x / 2))
              x += 1
            }
            y += 1
          }
          o
        }
        return Some(Decoded(width, height,
          Array(comp(0), up(comp(1)), up(comp(2)))))
      } else {
        val len = u16(pos)
        if (len < 2 || pos + len > b.length) return None
        val seg = pos + 2
        val segEnd = pos + len
        var scanEnd = -1 // set by a progressive SOS (entropy data end)
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
          case 0xc0 | 0xc2 => // SOF0 baseline / SOF2 progressive
            progressive = m == 0xc2
            if (len < 8 || (b(seg) & 0xff) != 8) return None
            height = u16(seg + 1); width = u16(seg + 3)
            nc = b(seg + 5) & 0xff
            if (width <= 0 || height <= 0 ||
              (nc != 1 && nc != 3) || len != 8 + 3 * nc) return None
            if (width.toLong * height > (1 << 26)) return None
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
            if (progressive) {
              // coefficient buffers sized by the INTERLEAVED grid
              // (MCU-padded); non-interleaved scans and the finalize
              // walk the component's own (possibly smaller) grid
              coefs = Array.tabulate(nc) { c =>
                val g = ProgGrid(width, height, samp420, c)
                new Array[Int](g.biW * g.biH * 64)
              }
            }
          case 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
               0xcb | 0xcd | 0xce | 0xcf =>
            return None // non-baseline/progressive SOF
          case 0xdd => // DRI
            if (len != 4) return None
            restartInterval = u16(seg)
          case 0xda => // SOS — entropy data follows
            if (nc == 0 || compQ == null) return None
            val ns = b(seg) & 0xff
            if (len != 6 + 2 * ns || ns < 1 || ns > nc) return None
            if (!progressive) {
              if (ns != nc) return None
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
            } else {
              if (restartInterval != 0) return None // out of scope
              // scan components by their SOF ids (encoder writes 1..nc)
              val scomps = new Array[Int](ns)
              val sdc = new Array[Int](ns)
              val sac = new Array[Int](ns)
              var i = 0
              while (i < ns) {
                val id = b(seg + 1 + 2 * i) & 0xff
                if (id < 1 || id > nc) return None
                scomps(i) = id - 1
                sdc(i) = (b(seg + 1 + 2 * i + 1) & 0xff) >> 4
                sac(i) = b(seg + 1 + 2 * i + 1) & 0x0f
                i += 1
              }
              val ssSel = b(seg + 1 + 2 * ns) & 0xff
              val seSel = b(seg + 2 + 2 * ns) & 0xff
              val ah = (b(seg + 3 + 2 * ns) & 0xff) >> 4
              val al = b(seg + 3 + 2 * ns) & 0x0f
              progScan(b, segEnd, width, height, scomps, sdc, sac,
                ssSel, seSel, ah, al, coefs, dcTabs, acTabs,
                samp420) match {
                case Some(next) => sawScan = true; scanEnd = next
                case None => return None
              }
            }
          case _ => () // APPn, COM, others: skip
        }
        pos = if (scanEnd >= 0) scanEnd else segEnd
      }
    }
    None // no SOS reached
  }

  /** Per-component block-grid geometry for progressive decoding:
    * pixel dims (cw x ch), the MCU-padded INTERLEAVED grid (biW x biH
    * — coefficient storage), and the component's own non-interleaved
    * grid (bnW x bnH — AC scans and the final IDCT). For 4:4:4 the two
    * grids coincide; for 4:2:0 luma the interleaved grid pads to even
    * block counts (T.81 A.2.4 dummy blocks). */
  private final case class ProgGrid(width: Int, height: Int,
                                    samp420: Boolean, comp: Int) {
    val h: Int = if (samp420 && comp == 0) 2 else 1
    val v: Int = h
    private val hmax = if (samp420) 2 else 1
    val cw: Int = (width * h + hmax - 1) / hmax
    val ch: Int = (height * v + hmax - 1) / hmax
    val mcuW: Int = (width + 8 * hmax - 1) / (8 * hmax)
    val mcuH: Int = (height + 8 * hmax - 1) / (8 * hmax)
    val biW: Int = mcuW * h
    val biH: Int = mcuH * v
    val bnW: Int = (cw + 7) / 8
    val bnH: Int = (ch + 7) / 8
  }

  /** One progressive scan (T.81 G.2): DC first/refine, AC first/refine
    * with EOB-run coding — full spectral selection AND successive
    * approximation, the coefficient-domain algorithms of Annex G
    * reimplemented from the spec. Coefficients land in natural order
    * in `coefs` at their FINAL magnitudes for the bits received so far
    * (values arrive shifted left by Al; refinement scans add the
    * next-lower bit). Returns the byte offset of the next marker. */
  private def progScan(b: Array[Byte], scanStart: Int, width: Int,
                       height: Int, scomps: Array[Int], sdc: Array[Int],
                       sac: Array[Int], ss: Int, se: Int, ah: Int,
                       al: Int, coefs: Array[Array[Int]],
                       dcTabs: Array[HuffDec], acTabs: Array[HuffDec],
                       samp420: Boolean): Option[Int] = {
    if (ss < 0 || se > 63 || ss > se || al > 13) return None
    val isDc = ss == 0
    if (isDc && se != 0) return None         // DC scans are (0,0)
    if (!isDc && scomps.length != 1) return None // AC scans: 1 component
    val br = new BitReader(b, scanStart)
    val grids = scomps.map(c => ProgGrid(width, height, samp420, c))
    val pred = new Array[Int](scomps.length)
    // non-interleaved walks use the single component's own grid
    val g0 = grids(0)
    val nb = g0.bnW * g0.bnH
    @inline def nIdx(bi: Int): Int =
      ((bi / g0.bnW) * g0.biW + bi % g0.bnW) * 64

    // interleaved scans (ns > 1) walk MCUs, each carrying every scan
    // component's h x v blocks (T.81 A.2.3); single-component scans
    // walk that component's own grid. `perBlock` runs the DC action
    // for one (scan-component, coefficient-base) pair.
    def dcWalk(perBlock: (Int, Int) => Boolean): Boolean = {
      if (scomps.length > 1) {
        val mcuW = g0.mcuW
        val mcuH = g0.mcuH
        var my = 0
        while (my < mcuH) {
          var mx = 0
          while (mx < mcuW) {
            var ci = 0
            while (ci < scomps.length) {
              val g = grids(ci)
              var j = 0
              while (j < g.v) {
                var i = 0
                while (i < g.h) {
                  val base =
                    ((my * g.v + j) * g.biW + (mx * g.h + i)) * 64
                  if (!perBlock(ci, base)) return false
                  i += 1
                }
                j += 1
              }
              ci += 1
            }
            mx += 1
          }
          my += 1
        }
      } else {
        var bi = 0
        while (bi < nb) {
          if (!perBlock(0, nIdx(bi))) return false
          bi += 1
        }
      }
      true
    }

    if (isDc && ah == 0) {
      // DC first: diffs at magnitude Al (predictors reset per scan)
      val tabs = new Array[HuffDec](sdc.length)
      var ti = 0
      while (ti < sdc.length) {
        if (dcTabs(sdc(ti)) == null) return None
        tabs(ti) = dcTabs(sdc(ti))
        ti += 1
      }
      if (!dcWalk { (ci, base) =>
        val cat = huffDecode(br, tabs(ci))
        if (cat < 0 || cat > 15 || br.truncated) false
        else {
          val diff = extend(br.bits(cat), cat)
          if (br.truncated) false
          else {
            pred(ci) += diff
            coefs(scomps(ci))(base) = pred(ci) << al
            true
          }
        }
      }) return None
    } else if (isDc) {
      // DC refinement: one bit per block per component
      if (!dcWalk { (ci, base) =>
        val bit = br.bit()
        if (br.truncated) false
        else {
          if (bit == 1) coefs(scomps(ci))(base) |= 1 << al
          true
        }
      }) return None
    } else if (ah == 0) {
      // AC first: band values at magnitude Al, EOB-run coded
      val c = scomps(0)
      val tab = acTabs(sac(0))
      if (tab == null) return None
      var eobrun = 0
      var bi = 0
      while (bi < nb) {
        if (eobrun > 0) eobrun -= 1
        else {
          val base = nIdx(bi)
          var k = ss
          var done = false
          while (!done && k <= se) {
            val rs = huffDecode(br, tab)
            if (rs < 0 || br.truncated) return None
            val r = rs >> 4
            val s = rs & 0x0f
            if (s == 0) {
              if (r == 15) k += 16 // ZRL
              else {
                eobrun = (1 << r) - 1 +
                  (if (r > 0) br.bits(r) else 0)
                if (br.truncated) return None
                done = true
              }
            } else {
              k += r
              if (k > se) return None
              coefs(c)(base + Zigzag(k)) = extend(br.bits(s), s) << al
              if (br.truncated) return None
              k += 1
            }
          }
        }
        bi += 1
      }
    } else {
      // AC refinement (G.1.2.3): correction bits on known-nonzero
      // coefficients, newly-significant values at ±2^Al, EOB runs
      // refining the rest of each block
      val c = scomps(0)
      val tab = acTabs(sac(0))
      if (tab == null) return None
      val p1 = 1 << al
      val m1 = -1 << al
      var eobrun = 0
      var bi = 0
      while (bi < nb) {
        val base = nIdx(bi)
        var k = ss
        if (eobrun == 0) {
          var break = false
          while (!break && k <= se) {
            val rs = huffDecode(br, tab)
            if (rs < 0 || br.truncated) return None
            var r = rs >> 4
            var ins = 0
            if ((rs & 0x0f) != 0) {
              if ((rs & 0x0f) != 1) return None // only ±1 refines
              ins = if (br.bit() == 1) p1 else m1
              if (br.truncated) return None
            } else if (r != 15) {
              eobrun = (1 << r) + (if (r > 0) br.bits(r) else 0)
              if (br.truncated) return None
              break = true // remaining coeffs refined below
            }
            if (!break) {
              // advance over the run: correction bits on nonzero
              // history, count zeros against r, then place `ins`
              var placed = false
              while (!placed && k <= se) {
                val z = base + Zigzag(k)
                if (coefs(c)(z) != 0) {
                  val bit = br.bit()
                  if (br.truncated) return None
                  if (bit == 1 && (coefs(c)(z) & p1) == 0)
                    coefs(c)(z) +=
                      (if (coefs(c)(z) >= 0) p1 else m1)
                } else {
                  if (r == 0) {
                    if (ins != 0) coefs(c)(z) = ins
                    placed = true
                  } else r -= 1
                }
                k += 1
              }
              if (!placed && ins != 0) return None // run past band end
            }
          }
        }
        if (eobrun > 0) {
          // refine every remaining nonzero coefficient in the band
          while (k <= se) {
            val z = base + Zigzag(k)
            if (coefs(c)(z) != 0) {
              val bit = br.bit()
              if (br.truncated) return None
              if (bit == 1 && (coefs(c)(z) & p1) == 0)
                coefs(c)(z) += (if (coefs(c)(z) >= 0) p1 else m1)
            }
            k += 1
          }
          eobrun -= 1
        }
        bi += 1
      }
    }
    // the scan's entropy bytes are fully consumed; skip any residual
    // pad byte to the next marker
    var p = br.pos
    while (p < b.length && (b(p) & 0xff) != 0xff) p += 1
    Some(p)
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
    if (b.length < 4 || (b(0) & 0xff) != 0xff) return None
    var soi = 1 // fill bytes (B.1.1.2) may precede the SOI code itself
    while (soi < b.length && (b(soi) & 0xff) == 0xff) soi += 1
    if (soi >= b.length || (b(soi) & 0xff) != 0xd8) return None
    var pos = soi + 1
    while (pos + 3 < b.length) {
      if ((b(pos) & 0xff) != 0xff) return None
      var m = b(pos + 1) & 0xff
      while (m == 0xff && pos + 2 < b.length) { pos += 1; m = b(pos + 1) & 0xff }
      if (m == 0xff) return None
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
