package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{Jpeg, MediaCodecs}

/** Baseline-JPEG codec gates. The load-bearing property is the one
  * q267 rides: per-8x8-block-CONSTANT images roundtrip EXACTLY through
  * the full pipeline (FDCT → quant(DC=8) → Annex-K Huffman → byte
  * stuffing → Huffman decode → dequant → IDCT), because a constant
  * block is DC-only and the DC quant step of 8 stores v−128 verbatim.
  * Everything else — generic content, restarts, grayscale, stuffing,
  * malformed bytes — bounds the codec the way MediaCodecSpec bounds
  * the other containers.
  */
class JpegSpec extends AnyFunSuite {

  /** Build a wb*8 x hb*8 3-plane image with constant per-block YCbCr
    * from a deterministic seed (the q267 generating arithmetic). */
  private def blockImage(seed: Long, wb: Int, hb: Int)
      : (Int, Int, Array[Array[Int]]) = {
    val w = wb * 8
    val h = hb * 8
    val planes = Array.fill(3)(new Array[Int](w * h))
    for (by <- 0 until hb; bx <- 0 until wb) {
      val y = ((seed * 5 + 17 * bx + 29 * by) % 256).toInt
      val cb = ((seed + 7 * bx + 3 * by) % 256).toInt
      val cr = ((seed * 3 + 11 * bx + 13 * by) % 256).toInt
      for (py <- by * 8 until by * 8 + 8; px <- bx * 8 until bx * 8 + 8) {
        planes(0)(py * w + px) = y
        planes(1)(py * w + px) = cb
        planes(2)(py * w + px) = cr
      }
    }
    (w, h, planes)
  }

  test("per-block-constant images roundtrip exactly (q267's contract)") {
    for (seed <- Seq(0L, 1L, 7L, 63L, 200L, 255L); wb <- 1 to 3;
         hb <- 1 to 2) {
      val (w, h, planes) = blockImage(seed, wb, hb)
      val jpg = Jpeg.encode(w, h, planes)
      val d = Jpeg.decode(jpg).getOrElse(fail(s"decode failed seed=$seed"))
      assert(d.width == w && d.height == h && d.planes.length == 3)
      for (c <- 0 until 3)
        assert(d.planes(c).sameElements(planes(c)),
          s"plane $c mismatch seed=$seed ${wb}x$hb")
    }
  }

  test("fill bytes before markers are legal padding (T.81 B.1.1.2)") {
    val planes = Array.fill(3)(Array.fill(64)(90))
    val jpg = Jpeg.encode(8, 8, planes)
    // pad every marker except the in-entropy RSTs with extra 0xFFs:
    // insert a fill byte before each 0xFFD8/0xFFDB/0xFFC0/0xFFC4/0xFFDA
    val out = scala.collection.mutable.ArrayBuffer[Byte]()
    var i = 0
    while (i < jpg.length) {
      if (i + 1 < jpg.length && (jpg(i) & 0xff) == 0xff &&
          Set(0xd8, 0xdb, 0xc0, 0xc4, 0xda)((jpg(i + 1) & 0xff))) {
        out += 0xff.toByte; out += 0xff.toByte
      }
      out += jpg(i); i += 1
    }
    val d = Jpeg.decode(out.toArray)
      .getOrElse(fail("padded file must decode"))
    assert(d.planes.forall(_.forall(_ == 90)))
    // truncation inside fill padding still returns None cleanly
    assert(Jpeg.decode(out.toArray.take(3)).isEmpty)
  }

  test("extreme values (0/255) and single-block images roundtrip") {
    for (v <- Seq(0, 1, 127, 128, 254, 255)) {
      val planes = Array.fill(3)(Array.fill(64)(v))
      val d = Jpeg.decode(Jpeg.encode(8, 8, planes)).get
      assert(d.planes.forall(_.forall(_ == v)), s"v=$v")
    }
  }

  test("generic content roundtrips within the flat-quant error bound") {
    // xorshift-ish deterministic noise; AC quant step 1 bounds per-pixel
    // reconstruction error by the coefficient rounding (≤0.5 each) →
    // |err| ≤ 8 worst-case, typically ≤2
    var s = 0x2545f49L
    def next(): Int = { s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) % 256).toInt }
    for ((w, h) <- Seq((8, 8), (16, 8), (24, 16), (13, 9), (17, 23))) {
      val planes = Array.fill(3)(Array.fill(w * h)(next()))
      val jpg = Jpeg.encode(w, h, planes,
        qLuma = Jpeg.QuantFlat1, qChroma = Jpeg.QuantFlat1)
      val d = Jpeg.decode(jpg).getOrElse(fail(s"decode failed ${w}x$h"))
      assert(d.width == w && d.height == h)
      // DC step 8 moves a constantish component ≤4; AC rounding ≤0.5
      // per coefficient across 63 coefficients → total ≤ 4 + 63/16 ≈ 8
      for (c <- 0 until 3; i <- 0 until w * h) {
        val err = math.abs(d.planes(c)(i) - planes(c)(i))
        assert(err <= 12, s"err=$err at $i plane $c ${w}x$h")
      }
    }
  }

  test("grayscale (1 component) decode path") {
    val plane = Array.tabulate(16 * 8)(i => (i * 7) % 256)
    // constant blocks for exactness
    val (w, h) = (16, 8)
    val p2 = new Array[Int](w * h)
    for (by <- 0 until 1; bx <- 0 until 2;
         py <- 0 until 8; px <- 0 until 8)
      p2((by * 8 + py) * w + bx * 8 + px) = 40 + 100 * bx
    val d = Jpeg.decode(Jpeg.encode(w, h, Array(p2))).get
    assert(d.planes.length == 1)
    assert(d.planes(0).sameElements(p2))
    val rgb = Jpeg.rgb(d)
    assert((rgb(0) & 0xff) == 40 && (rgb(1) & 0xff) == 40 &&
      (rgb(2) & 0xff) == 40)
    assert(plane.length == w * h) // silence unused warning
  }

  test("4:2:0: constant-structured images roundtrip exactly") {
    // luma constant per 8x8 block, chroma constant per 16x16 MCU: the
    // box-average + replication upsample are identity on constants, so
    // the full subsampled pipeline must be integer-exact
    for (seed <- Seq(1L, 9L, 77L); mw <- 1 to 2; mh <- 1 to 2) {
      val w = mw * 16
      val h = mh * 16
      val planes = Array.fill(3)(new Array[Int](w * h))
      for (by <- 0 until h / 8; bx <- 0 until w / 8) {
        val yv = ((seed * 5 + 17 * bx + 29 * by) % 256).toInt
        for (py <- by * 8 until by * 8 + 8; px <- bx * 8 until bx * 8 + 8)
          planes(0)(py * w + px) = yv
      }
      for (my <- 0 until mh; mx <- 0 until mw) {
        val cb = ((seed + 7 * mx + 3 * my) % 256).toInt
        val cr = ((seed * 3 + 11 * mx + 13 * my) % 256).toInt
        for (py <- my * 16 until my * 16 + 16;
             px <- mx * 16 until mx * 16 + 16) {
          planes(1)(py * w + px) = cb
          planes(2)(py * w + px) = cr
        }
      }
      val jpg = Jpeg.encode(w, h, planes, subsample420 = true)
      val d = Jpeg.decode(jpg).getOrElse(fail(s"420 decode $seed"))
      for (c <- 0 until 3)
        assert(d.planes(c).sameElements(planes(c)),
          s"420 plane $c seed=$seed ${mw}x$mh")
    }
  }

  test("4:2:0: noise luma + constant chroma within the flat-quant bound") {
    var s = 0xabcdefL
    def next(): Int = { s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) % 256).toInt }
    for ((w, h) <- Seq((16, 16), (32, 16), (17, 23))) { // incl. ragged
      val planes = Array(
        Array.fill(w * h)(next()),
        Array.fill(w * h)(99), Array.fill(w * h)(163))
      val jpg = Jpeg.encode(w, h, planes, qLuma = Jpeg.QuantFlat1,
        qChroma = Jpeg.QuantFlat1, subsample420 = true)
      val d = Jpeg.decode(jpg).getOrElse(fail(s"420 noise ${w}x$h"))
      for (i <- 0 until w * h) {
        assert(math.abs(d.planes(0)(i) - planes(0)(i)) <= 12,
          s"luma err at $i ${w}x$h")
        assert(d.planes(1)(i) == 99 && d.planes(2)(i) == 163,
          s"chroma drift at $i ${w}x$h")
      }
    }
  }

  test("progressive (SOF2) decodes pixel-identical to baseline") {
    // our progressive encoder emits the SAME quantized coefficients as
    // the baseline path, so the two decodes must agree EXACTLY —
    // constant-block images and flat-quant noise alike
    for (seed <- Seq(3L, 42L); wb <- 1 to 3; hb <- 1 to 2) {
      val (w, h, planes) = blockImage(seed, wb, hb)
      val base = Jpeg.decode(Jpeg.encode(w, h, planes)).get
      val prog = Jpeg.decode(Jpeg.encodeProgressive(w, h, planes))
        .getOrElse(fail(s"progressive decode seed=$seed ${wb}x$hb"))
      for (c <- 0 until 3)
        assert(prog.planes(c).sameElements(base.planes(c)),
          s"seed=$seed ${wb}x$hb plane $c")
    }
    var s = 0x5eedL
    def next(): Int = { s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) % 256).toInt }
    for ((w, h) <- Seq((8, 8), (24, 16), (13, 9))) {
      val planes = Array.fill(3)(Array.fill(w * h)(next()))
      val base = Jpeg.decode(Jpeg.encode(w, h, planes,
        qLuma = Jpeg.QuantFlat1, qChroma = Jpeg.QuantFlat1)).get
      val prog = Jpeg.decode(Jpeg.encodeProgressive(w, h, planes,
        qLuma = Jpeg.QuantFlat1, qChroma = Jpeg.QuantFlat1)).get
      for (c <- 0 until 3)
        assert(prog.planes(c).sameElements(base.planes(c)),
          s"noise ${w}x$h plane $c")
    }
    // grayscale progressive too
    val g = Array.tabulate(16 * 16)(i => (i * 3) % 256)
    val pb = Jpeg.decode(Jpeg.encode(16, 16, Array(g),
      qLuma = Jpeg.QuantFlat1)).get
    val pp = Jpeg.decode(Jpeg.encodeProgressive(16, 16, Array(g),
      qLuma = Jpeg.QuantFlat1)).get
    assert(pp.planes(0).sameElements(pb.planes(0)))
  }

  test("progressive: ImageIO-written files (successive approximation)") {
    // javax.imageio's progressive writer uses successive approximation
    // and merged EOB runs — the paths our spectral-selection-only
    // encoder never emits. Decode ITS files and compare against its
    // own decode of the same bytes (tolerance covers IDCT and color
    // rounding differences between independent implementations).
    var s = 0x77L
    def next(): Int = { s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) % 256).toInt }
    var tested = 0
    for ((w, h) <- Seq((32, 24), (17, 13))) {
      val bi = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      // GRAY noise: luma carries rich AC content (exercising the SA
      // refinement scans) while chroma stays ~neutral — the writer's
      // fancy (triangular) chroma upsampling vs our replication would
      // otherwise dominate the comparison on chroma-noisy content
      for (y <- 0 until h; x <- 0 until w) {
        val v = (x * 8 + y * 3 + next() % 64) & 0xff
        bi.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val out = new java.io.ByteArrayOutputStream()
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("jpeg").next()
      val params = writer.getDefaultWriteParam
      params.setProgressiveMode(
        javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val ios = javax.imageio.ImageIO.createImageOutputStream(out)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(bi, null, null),
        params)
      writer.dispose(); ios.close()
      val bytes = out.toByteArray
      // confirm it IS progressive (SOF2 present)
      val sof2 = bytes.sliding(2).exists(p =>
        (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2)
      if (sof2) {
        tested += 1
        val ours = Jpeg.decode(bytes)
          .getOrElse(fail(s"rejected ImageIO progressive ${w}x$h"))
        val theirs = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        assert(ours.width == w && ours.height == h)
        val rgb = Jpeg.rgb(ours)
        var maxd = 0
        for (y <- 0 until h; x <- 0 until w) {
          val t = theirs.getRGB(x, y)
          val i = y * w + x
          maxd = math.max(maxd, math.abs(((t >> 16) & 0xff) -
            (rgb(3 * i) & 0xff)))
          maxd = math.max(maxd, math.abs(((t >> 8) & 0xff) -
            (rgb(3 * i + 1) & 0xff)))
          maxd = math.max(maxd,
            math.abs((t & 0xff) - (rgb(3 * i + 2) & 0xff)))
        }
        assert(maxd <= 4, s"${w}x$h max per-channel delta $maxd")
      }
    }
    assert(tested > 0, "ImageIO never produced a SOF2 file")
  }

  test("restart markers reset DC prediction and re-align the stream") {
    val (w, h, planes) = blockImage(42L, 3, 2)
    val jpg = Jpeg.encode(w, h, planes, restartInterval = 2)
    // DRI segment present
    assert(jpg.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xdd))
    // at least one RSTn in the stream
    assert(jpg.sliding(2).exists(p => (p(0) & 0xff) == 0xff &&
      (p(1) & 0xff) >= 0xd0 && (p(1) & 0xff) <= 0xd7))
    val d = Jpeg.decode(jpg).get
    for (c <- 0 until 3) assert(d.planes(c).sameElements(planes(c)))
  }

  test("byte stuffing: a stream containing FF00 still decodes correctly") {
    // deterministic sweep over flat-quant noise images (dense, varied
    // huffman output) until a scan carries a stuffed FF00; the decode
    // must unstuff it and stay within the flat-quant error bound
    var s = 0xdeadbeefL
    def next(): Int = { s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) % 256).toInt }
    var found = false
    var tries = 0
    while (!found && tries < 200) {
      val (w, h) = (24, 16)
      val planes = Array.fill(3)(Array.fill(w * h)(next()))
      val jpg = Jpeg.encode(w, h, planes,
        qLuma = Jpeg.QuantFlat1, qChroma = Jpeg.QuantFlat1)
      val hasStuff = jpg.sliding(2).exists(p =>
        (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0x00)
      if (hasStuff) {
        found = true
        val d = Jpeg.decode(jpg).getOrElse(fail("stuffed stream rejected"))
        for (c <- 0 until 3; i <- 0 until w * h)
          assert(math.abs(d.planes(c)(i) - planes(c)(i)) <= 12)
      }
      tries += 1
    }
    assert(found, "no stuffed byte in 200 deterministic noise images")
  }

  test("fixed-point YCbCr->RGB matches the floor-division formula") {
    def fl(x: Long): Long = {
      val r = ((x % 65536) + 65536) % 65536
      (x - r) / 65536
    }
    for (y <- 0 to 255 by 17; cb <- 0 to 255 by 23; cr <- 0 to 255 by 29) {
      val (r, g, b) = Jpeg.ycbcrToRgb(y, cb, cr)
      def clamp(v: Long): Long = math.max(0L, math.min(255L, v))
      assert(r == clamp(fl(y * 65536L + 91881L * (cr - 128) + 32768L)))
      assert(g == clamp(fl(y * 65536L - 22554L * (cb - 128) -
        46802L * (cr - 128) + 32768L)))
      assert(b == clamp(fl(y * 65536L + 116130L * (cb - 128) + 32768L)))
    }
  }

  test("dims probe and MediaCodecs dispatch") {
    val (w, h, planes) = blockImage(9L, 2, 2)
    val jpg = Jpeg.encode(w, h, planes)
    assert(Jpeg.dims(jpg).contains((16, 16, 3)))
    val meta = MediaCodecs.decode(jpg)
    assert(meta.exists(m => m.format == "jpeg" && m.width == 16 &&
      m.height == 16 && m.channels == 3 && m.bits == 8))
  }

  test("malformed input returns None, never throws") {
    val (w, h, planes) = blockImage(3L, 2, 1)
    val good = Jpeg.encode(w, h, planes)
    // every truncation point: decode fails OR (cut fell after the last
    // scan bit, e.g. only EOI lost — tolerated like real decoders)
    // yields the EXACT image; truncation never produces wrong pixels
    for (n <- 0 until good.length) {
      val r = Jpeg.decode(good.take(n))
      assert(r.isEmpty || (0 until 3).forall(c =>
        r.get.planes(c).sameElements(planes(c))),
        s"truncation at $n produced wrong pixels")
    }
    // single-byte corruptions across the header section must not throw
    // (they may still decode if the byte is don't-care, e.g. APP0 text)
    for (i <- 0 until math.min(good.length, 160)) {
      val bad = good.clone()
      bad(i) = (bad(i) ^ 0x55).toByte
      Jpeg.decode(bad) // must not throw
    }
    // non-baseline SOF2 (progressive) is rejected
    val prog = good.clone()
    val sofAt = prog.indices.find(i => (prog(i) & 0xff) == 0xff &&
      i + 1 < prog.length && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(Jpeg.decode(prog).isEmpty)
    // unsupported sampling (3x3) is rejected, not mis-decoded; and a
    // 4:2:0 HEADER over a 4:4:4-encoded scan must fail cleanly too
    val sub = good.clone()
    sub(sofAt + 11) = 0x33.toByte // comp 1 sampling h=3,v=3
    assert(Jpeg.decode(sub).isEmpty)
    val lie = good.clone()
    lie(sofAt + 11) = 0x22.toByte // 4:2:0 header, 4:4:4 entropy data
    Jpeg.decode(lie) // must not throw (usually None; never wrong dims)
      .foreach(d => assert(d.width == w && d.height == h))
    // garbage
    assert(Jpeg.decode(Array.empty[Byte]).isEmpty)
    assert(Jpeg.decode(Array[Byte](0xff.toByte, 0xd8.toByte)).isEmpty)
    assert(Jpeg.decode("not a jpeg".getBytes("US-ASCII")).isEmpty)
  }
}
