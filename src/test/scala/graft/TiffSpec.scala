package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Tiff

/** TIFF gates: bit-exact roundtrips across compressions / strip
  * layouts / channel counts, TIFF-LZW early-change coverage across the
  * 9→10 bit boundary and table reset, PackBits runs, and
  * cross-validation against javax.imageio's independent TIFF plugin in
  * BOTH directions (it reads our files pixel-identically; we read its
  * LZW/PackBits/uncompressed output). */
class TiffSpec extends AnyFunSuite {

  private def img(w: Int, h: Int, ch: Int, seed: Long): Tiff.Image = {
    var s = seed
    val px = Array.fill(w * h * ch) {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) & 0xff).toByte
    }
    Tiff.Image(w, h, ch, px)
  }

  private def textureImg(w: Int, h: Int, ch: Int): Tiff.Image = {
    // repetitive content so LZW strings actually build
    val px = new Array[Byte](w * h * ch)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
      px((y * w + x) * ch + c) = (((x / 4) * 13 + (y / 3) * 7 + c) % 256).toByte
    Tiff.Image(w, h, ch, px)
  }

  test("roundtrip: all compressions x channels x strip layouts") {
    for (ch <- 1 to 4; comp <- Seq(Tiff.CompNone, Tiff.CompPackBits,
        Tiff.CompLzw); rps <- Seq(1, 5, 64)) {
      val im = img(21, 13, ch, ch * 31L + comp)
      val bytes = Tiff.encode(im, comp, predictor = false, rps)
      val back = Tiff.decode(bytes)
      assert(back.exists(b => b.width == 21 && b.height == 13 &&
        b.channels == ch && b.pixels.sameElements(im.pixels)),
        s"ch=$ch comp=$comp rps=$rps")
      assert(Tiff.dims(bytes).contains((21, 13, ch)))
    }
  }

  test("LZW predictor roundtrips; predictor tag enforced") {
    for (ch <- Seq(1, 3)) {
      val im = textureImg(40, 22, ch)
      val bytes = Tiff.encode(im, Tiff.CompLzw, predictor = true)
      assert(Tiff.decode(bytes).exists(_.pixels.sameElements(im.pixels)))
      // horizontal differencing helps smooth gradients
      val grad = Tiff.Image(64, 8, 1,
        Array.tabulate(64 * 8)(i => (i % 64).toByte))
      assert(Tiff.encode(grad, Tiff.CompLzw, predictor = true).length <
        Tiff.encode(grad, Tiff.CompLzw).length)
    }
  }

  test("TIFF-LZW: early change across 9->10 bits and table reset") {
    // noise forces one dict add per ~2 bytes: cross 511 quickly, and
    // a long stream crosses 1023/2047 and the 4094 reset too
    for (n <- Seq(600, 3000, 20000); seed <- Seq(1L, 5L)) {
      var s = seed
      val data = Array.fill(n) {
        s = s * 6364136223846793005L + 1442695040888963407L
        ((s >>> 33) & 0xff).toByte
      }
      val enc = Tiff.lzwEncode(data)
      assert(Tiff.lzwDecode(enc, 0, enc.length, n)
        .exists(_.sameElements(data)), s"n=$n seed=$seed")
    }
    // KwKwK: aaa... exercises the code==next path
    val aaa = Array.fill[Byte](500)('a')
    val enc = Tiff.lzwEncode(aaa)
    assert(Tiff.lzwDecode(enc, 0, enc.length, 500)
      .exists(_.sameElements(aaa)))
  }

  test("PackBits: runs, literals, 128-boundaries") {
    for (data <- Seq(
      Array.fill[Byte](300)(9),
      Array.tabulate[Byte](300)(i => i.toByte),
      Array.fill[Byte](3)(1) ++ Array[Byte](2) ++ Array.fill[Byte](200)(1),
      Array.emptyByteArray)) {
      val enc = Tiff.packBits(data)
      assert(Tiff.unpackBits(enc, 0, enc.length, data.length)
        .exists(_.sameElements(data)))
    }
  }

  test("ImageIO reads our files pixel-identically (all compressions)") {
    for (ch <- Seq(1, 3); comp <- Seq(Tiff.CompNone, Tiff.CompPackBits,
        Tiff.CompLzw); pred <- Seq(false, true)
        if !pred || comp == Tiff.CompLzw) {
      val im = textureImg(33, 17, ch)
      val bytes = Tiff.encode(im, comp, predictor = pred, rowsPerStrip = 6)
      val bi = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(bi != null, s"ImageIO rejected ch=$ch comp=$comp pred=$pred")
      assert(bi.getWidth == 33 && bi.getHeight == 17)
      // raw raster samples — getRGB would push gray through the JDK's
      // linear-gray -> sRGB colorspace conversion
      val raster = bi.getRaster
      for (y <- 0 until 17; x <- 0 until 33; c <- 0 until ch) {
        val expect = im.pixels((y * 33 + x) * ch + c) & 0xff
        assert(raster.getSample(x, y, c) == expect,
          s"($x,$y,$c) ch=$ch comp=$comp pred=$pred")
      }
    }
  }

  test("we read ImageIO's TIFF output (LZW, PackBits, none)") {
    import javax.imageio.ImageIO
    import scala.jdk.CollectionConverters._
    val writers = ImageIO.getImageWritersByFormatName("tiff").asScala
    assert(writers.nonEmpty, "JDK TIFF writer missing")
    for (compName <- Seq(null, "PackBits", "LZW"); gray <- Seq(true, false)) {
      val w = 29; val h = 11
      val typ = if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
        else java.awt.image.BufferedImage.TYPE_3BYTE_BGR
      val bi = new java.awt.image.BufferedImage(w, h, typ)
      for (y <- 0 until h; x <- 0 until w) {
        // write raw raster samples — setRGB would run the sRGB ->
        // linear-gray conversion on the gray type
        val v = (x * 11 + y * 29) % 256
        if (gray) bi.getRaster.setSample(x, y, 0, v)
        else {
          bi.getRaster.setSample(x, y, 0, x * 7 % 256)
          bi.getRaster.setSample(x, y, 1, y * 13 % 256)
          bi.getRaster.setSample(x, y, 2, v)
        }
      }
      val writer = ImageIO.getImageWritersByFormatName("tiff").next()
      val param = writer.getDefaultWriteParam
      if (compName != null) {
        param.setCompressionMode(
          javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionType(compName)
      }
      val bo = new java.io.ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(bo)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
      ios.close(); writer.dispose()
      val ours = Tiff.decode(bo.toByteArray)
      assert(ours.nonEmpty, s"comp=$compName gray=$gray undecodable")
      val got = ours.get
      assert(got.width == w && got.height == h)
      assert(got.channels == (if (gray) 1 else 3))
      for (y <- 0 until h; x <- 0 until w; c <- 0 until got.channels) {
        val expect = bi.getRaster.getSample(x, y, c)
        val mine = got.pixels((y * w + x) * got.channels + c) & 0xff
        assert(mine == expect,
          s"($x,$y,$c) comp=$compName gray=$gray")
      }
    }
  }

  test("tiled layout: ImageIO tiled writes decode pixel-identically") {
    import javax.imageio.ImageIO
    for (compName <- Seq(null, "LZW"); gray <- Seq(true, false)) {
      val w = 70; val h = 37 // not tile-aligned: padding discarded
      val typ = if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
        else java.awt.image.BufferedImage.TYPE_3BYTE_BGR
      val bi = new java.awt.image.BufferedImage(w, h, typ)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until (if (gray) 1 else 3))
        bi.getRaster.setSample(x, y, c, (x * 7 + y * 31 + c * 11) % 256)
      val writer = ImageIO.getImageWritersByFormatName("tiff").next()
      val param = writer.getDefaultWriteParam
      param.setTilingMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setTiling(32, 16, 0, 0)
      if (compName != null) {
        param.setCompressionMode(
          javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionType(compName)
      }
      val bo = new java.io.ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(bo)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(bi, null, null),
        param)
      ios.close(); writer.dispose()
      val got = Tiff.decode(bo.toByteArray)
      assert(got.nonEmpty, s"tiled comp=$compName gray=$gray")
      val im = got.get
      assert(im.width == w && im.height == h)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until im.channels)
        assert((im.pixels((y * w + x) * im.channels + c) & 0xff) ==
          bi.getRaster.getSample(x, y, c),
          s"($x,$y,$c) tiled comp=$compName gray=$gray")
    }
  }

  test("fuzz: truncation and bit flips never throw, never wrong size") {
    def sane(d: Tiff.Image): Unit =
      assert(d.pixels.length ==
        d.width * d.height * d.channels * (d.bits / 8))
    for (comp <- Seq(Tiff.CompNone, Tiff.CompPackBits, Tiff.CompLzw);
         big <- Seq(false, true); bits <- Seq(8, 16)) {
      val bytes = Tiff.encode(img16(9, 7, 3, 99L, bits), comp, big = big)
      (0 until bytes.length by 3).foreach { n =>
        Tiff.decode(bytes.take(n)).foreach(sane)
      }
      var s = 12345L
      (0 until 300).foreach { _ =>
        s = s * 6364136223846793005L + 1442695040888963407L
        val i = ((s >>> 33) % bytes.length).toInt
        val flipped = bytes.clone()
        flipped(i) = (flipped(i) ^ (1 << ((s >>> 17) & 7)).toByte).toByte
        Tiff.decode(flipped).foreach(sane)
      }
    }
    // big-endian header with a truncated IFD; junk magics
    assert(Tiff.decode("MM__0000".getBytes).isEmpty)
    assert(Tiff.decode("XX".getBytes).isEmpty)
    assert(Tiff.decode(Array.emptyByteArray).isEmpty)
  }

  private def img16(w: Int, h: Int, ch: Int, seed: Long,
                    bits: Int): Tiff.Image = {
    if (bits == 8) img(w, h, ch, seed)
    else {
      var s = seed
      val px = Array.fill(w * h * ch * 2) {
        s = s * 6364136223846793005L + 1442695040888963407L
        ((s >>> 33) & 0xff).toByte
      }
      Tiff.Image(w, h, ch, px, bits = 16)
    }
  }

  test("16-bit + BigTIFF: roundtrips across compressions, channels, " +
    "strip layouts, both container versions") {
    for (ch <- 1 to 4; comp <- Seq(Tiff.CompNone, Tiff.CompPackBits,
        Tiff.CompLzw); big <- Seq(false, true); bits <- Seq(8, 16)) {
      val im = img16(19, 11, ch, ch * 131L + comp + bits, bits)
      val bytes = Tiff.encode(im, comp, rowsPerStrip = 4, big = big)
      // header version pins the layout actually written
      assert((bytes(2) & 0xff) == (if (big) 43 else 42))
      val back = Tiff.decode(bytes)
      assert(back.exists(b => b.width == 19 && b.height == 11 &&
        b.channels == ch && b.bits == bits &&
        b.pixels.sameElements(im.pixels)),
        s"ch=$ch comp=$comp big=$big bits=$bits")
      assert(Tiff.dims(bytes).contains((19, 11, ch)))
    }
  }

  test("ImageIO reads our 16-bit files; we read its 16-bit output") {
    import javax.imageio.ImageIO
    // ours -> ImageIO: 16-bit gray, uncompressed + LZW (the JDK reader
    // exposes USHORT rasters; samples must match our big-endian u16s)
    for (comp <- Seq(Tiff.CompNone, Tiff.CompLzw)) {
      val w = 23; val h = 9
      val px = new Array[Byte](w * h * 2)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (x * 2500 + y * 7919) % 65536
        px((y * w + x) * 2) = ((v >> 8) & 0xff).toByte
        px((y * w + x) * 2 + 1) = (v & 0xff).toByte
      }
      val bytes = Tiff.encode(Tiff.Image(w, h, 1, px, bits = 16), comp)
      val bi = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(bi != null, s"ImageIO rejected 16-bit comp=$comp")
      for (y <- 0 until h; x <- 0 until w) {
        val expect = (x * 2500 + y * 7919) % 65536
        assert(bi.getRaster.getSample(x, y, 0) == expect,
          s"($x,$y) comp=$comp")
      }
    }
    // ImageIO -> ours: TYPE_USHORT_GRAY, LZW and none
    for (compName <- Seq(null, "LZW")) {
      val w = 17; val h = 13
      val bi = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        bi.getRaster.setSample(x, y, 0, (x * 3001 + y * 499) % 65536)
      val writer = ImageIO.getImageWritersByFormatName("tiff").next()
      val param = writer.getDefaultWriteParam
      if (compName != null) {
        param.setCompressionMode(
          javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionType(compName)
      }
      val bo = new java.io.ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(bo)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(bi, null, null),
        param)
      ios.close(); writer.dispose()
      val got = Tiff.decode(bo.toByteArray)
      assert(got.exists(g => g.width == w && g.height == h &&
        g.channels == 1 && g.bits == 16), s"16-bit comp=$compName")
      val im = got.get
      for (y <- 0 until h; x <- 0 until w) {
        val mine = ((im.pixels((y * w + x) * 2) & 0xff) << 8) |
          (im.pixels((y * w + x) * 2 + 1) & 0xff)
        assert(mine == bi.getRaster.getSample(x, y, 0),
          s"($x,$y) comp=$compName")
      }
    }
  }

  test("16-bit predictor 2: per-SAMPLE differencing roundtrips and " +
    "compresses gradients") {
    for (ch <- Seq(1, 3); big <- Seq(false, true)) {
      val im = img16(31, 14, ch, 17L * ch, 16)
      val bytes = Tiff.encode(im, Tiff.CompLzw, predictor = true,
        big = big)
      assert(Tiff.decode(bytes).exists(b => b.bits == 16 &&
        b.pixels.sameElements(im.pixels)), s"ch=$ch big=$big")
    }
    // a smooth 16-bit ramp (values cross byte boundaries, so bytewise
    // differencing would corrupt it; per-sample differencing makes it
    // tiny under LZW)
    val w = 128; val h = 8
    val px = new Array[Byte](w * h * 2)
    for (y <- 0 until h; x <- 0 until w) {
      val v = x * 513 // strides past 0xFF so the hi byte moves
      px((y * w + x) * 2) = ((v >> 8) & 0xff).toByte
      px((y * w + x) * 2 + 1) = (v & 0xff).toByte
    }
    val grad = Tiff.Image(w, h, 1, px, bits = 16)
    val withP = Tiff.encode(grad, Tiff.CompLzw, predictor = true)
    val withoutP = Tiff.encode(grad, Tiff.CompLzw)
    assert(Tiff.decode(withP).exists(_.pixels.sameElements(px)))
    assert(withP.length < withoutP.length,
      s"predictor ${withP.length} !< plain ${withoutP.length}")
  }

  test("tiled writer: roundtrips 8/16-bit x classic/BigTIFF, " +
    "predictor restarts per tile, ImageIO reads the classic files") {
    for (bits <- Seq(8, 16); big <- Seq(false, true);
         comp <- Seq(Tiff.CompNone, Tiff.CompLzw);
         pred <- Seq(false, true) if !pred || comp == Tiff.CompLzw) {
      val im = img16(70, 37, 3, bits + comp + 7L, bits) // not aligned
      val bytes = Tiff.encode(im, comp, predictor = pred,
        big = big, tile = Some((32, 16)))
      assert(Tiff.decode(bytes).exists(b => b.bits == bits &&
        b.pixels.sameElements(im.pixels)),
        s"bits=$bits big=$big comp=$comp pred=$pred")
    }
    // a tile-boundary-sensitive pattern: a predictor leaking across
    // the tile edge would corrupt column 32 of every row
    val im8 = textureImg(64, 16, 1)
    val t = Tiff.encode(im8, Tiff.CompLzw, predictor = true,
      tile = Some((32, 16)))
    assert(Tiff.decode(t).exists(_.pixels.sameElements(im8.pixels)))
    // classic tiled output is readable by the independent JDK plugin
    val bi = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(t))
    assert(bi != null && bi.getWidth == 64 && bi.getHeight == 16)
    for (y <- 0 until 16; x <- 0 until 64)
      assert(bi.getRaster.getSample(x, y, 0) ==
        (im8.pixels(y * 64 + x) & 0xff), s"($x,$y)")
  }

  test("BigTIFF structure: 8-byte offsets honored, truncated headers " +
    "refused") {
    val im = img16(33, 21, 3, 7L, 16)
    val bytes = Tiff.encode(im, Tiff.CompLzw, rowsPerStrip = 5,
      big = true)
    // offset size field 8, pad 0, 64-bit first-IFD pointer
    assert(bytes(4) == 8 && bytes(5) == 0 && bytes(6) == 0 &&
      bytes(7) == 0)
    assert(Tiff.decode(bytes).exists(_.pixels.sameElements(im.pixels)))
    // declared offset size != 8 refused
    val badOs = bytes.clone(); badOs(4) = 4
    assert(Tiff.decode(badOs).isEmpty)
    // 16-byte-header floor enforced
    assert(Tiff.decode(bytes.take(12)).isEmpty)
  }
}
