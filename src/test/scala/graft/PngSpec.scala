package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{MediaCodecs, Png}

/** PNG / DEFLATE / zlib gates. The JDK's Deflater/Inflater serve as
  * INDEPENDENT reference codecs: our inflate must decode the JDK's
  * dynamic-Huffman output, and the JDK must decode our fixed-Huffman
  * LZ77 output — cross-validation neither side can fake. PNG roundtrips
  * are bit-exact for arbitrary pixels across all five scanline filters.
  */
class PngSpec extends AnyFunSuite {

  private def noise(n: Int, seed: Long): Array[Byte] = {
    var s = seed
    Array.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 33).toByte
    }
  }

  private def texty(n: Int): Array[Byte] =
    Iterator.continually("the quick brown fox jumps over the lazy dog ")
      .flatten.take(n).map(_.toByte).toArray

  test("inflate decodes JDK Deflater output (dynamic + stored + fixed)") {
    for ((data, label) <- Seq(
      (texty(5000), "texty"), (noise(4096, 7L), "noise"),
      (Array.emptyByteArray, "empty"),
      (Array.fill[Byte](10000)(42), "constant"),
      (noise(3, 9L), "tiny"))) {
      for (level <- Seq(java.util.zip.Deflater.BEST_COMPRESSION,
        java.util.zip.Deflater.NO_COMPRESSION, // stored blocks
        java.util.zip.Deflater.BEST_SPEED)) {
        val d = new java.util.zip.Deflater(level, true) // raw deflate
        d.setInput(data); d.finish()
        val buf = new Array[Byte](data.length + 1024)
        val m = d.deflate(buf)
        d.end()
        val got = Png.inflate(java.util.Arrays.copyOf(buf, m))
        assert(got.exists(_.sameElements(data)), s"$label level $level")
      }
    }
  }

  test("JDK Inflater decodes our fixed-Huffman LZ77 output") {
    for ((data, label) <- Seq(
      (texty(6000), "texty"), (noise(2048, 3L), "noise"),
      (Array.emptyByteArray, "empty"),
      (Array.fill[Byte](70000)(7), "constant-long"))) {
      val comp = Png.deflateFixed(data)
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(comp)
      val out = new Array[Byte](data.length + 16)
      val n = inf.inflate(out)
      assert(inf.finished(), s"$label not finished")
      inf.end()
      assert(n == data.length &&
        java.util.Arrays.equals(out, 0, n, data, 0, data.length),
        s"$label roundtrip")
      // matches actually compress repetitive data
      if (label == "constant-long") assert(comp.length < data.length / 50)
    }
  }

  test("JDK Inflater decodes our DYNAMIC-table output; beats fixed") {
    for ((data, label) <- Seq(
      (texty(6000), "texty"), (noise(2048, 3L), "noise"),
      (Array.emptyByteArray, "empty"),
      (Array[Byte](42), "one-byte"),
      (Array.fill[Byte](70000)(7), "constant-long"),
      (Array.tabulate[Byte](300)(i => (i % 2).toByte), "two-symbol"))) {
      val comp = Png.deflateDynamic(data)
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(comp)
      val out = new Array[Byte](data.length + 16)
      val n = inf.inflate(out)
      assert(inf.finished(), s"$label not finished")
      inf.end()
      assert(n == data.length &&
        java.util.Arrays.equals(out, 0, n, data, 0, data.length),
        s"$label roundtrip")
      // our own inflate agrees
      assert(Png.inflate(comp).exists(_.sameElements(data)), label)
    }
    // frequency-tuned tables beat the fixed ones on skewed data
    val skewed = texty(20000)
    assert(Png.deflateDynamic(skewed).length <
      Png.deflateFixed(skewed).length)
    // seeded sweep: arbitrary content roundtrips through the JDK
    (0 until 40).foreach { s =>
      val data = noise(1 + (s * 997) % 5000, s.toLong)
      val comp = Png.deflateDynamic(data)
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(comp)
      val out = new Array[Byte](data.length + 16)
      val n = inf.inflate(out)
      assert(inf.finished() && n == data.length &&
        java.util.Arrays.equals(out, 0, n, data, 0, data.length),
        s"seed $s")
      inf.end()
    }
  }

  test("our inflate decodes our deflate; zlib wrap verifies adler32") {
    for (data <- Seq(texty(3000), noise(1000, 11L))) {
      assert(Png.inflate(Png.deflateFixed(data))
        .exists(_.sameElements(data)))
      assert(Png.zlibDecompress(Png.zlibCompress(data))
        .exists(_.sameElements(data)))
      // corrupt the adler trailer: must reject
      val z = Png.zlibCompress(data)
      z(z.length - 1) = (z(z.length - 1) ^ 1).toByte
      assert(Png.zlibDecompress(z).isEmpty)
    }
  }

  test("PNG roundtrips arbitrary pixels across all five filters") {
    for (ch <- 1 to 4; (w, h) <- Seq((1, 1), (5, 7), (16, 16), (33, 9))) {
      val img = Png.Image(w, h, ch, noise(w * h * ch, ch * 100 + w))
      // filterOf(y) = y % 5 sweeps None/Sub/Up/Average/Paeth
      val bytes = Png.encode(img)
      val back = Png.decode(bytes).getOrElse(fail(s"decode $ch ${w}x$h"))
      assert(back.width == w && back.height == h && back.channels == ch)
      assert(back.pixels.sameElements(img.pixels), s"$ch ${w}x$h")
      // each filter individually too
      for (f <- 0 to 4) {
        val b2 = Png.encode(img, _ => f)
        assert(Png.decode(b2).exists(_.pixels.sameElements(img.pixels)),
          s"filter $f $ch ${w}x$h")
      }
    }
  }

  test("Adam7 interlace roundtrips bit-exact; ImageIO agrees") {
    // dims sweep covers empty passes (1x1 has only pass 1; 3x3 skips
    // pass 2; ragged dims exercise every ceil boundary)
    for (ch <- Seq(1, 3, 4);
         (w, h) <- Seq((1, 1), (3, 3), (5, 7), (8, 8), (17, 13))) {
      val img = Png.Image(w, h, ch, noise(w * h * ch, ch * 31 + w))
      val bytes = Png.encode(img, interlaced = true)
      val back = Png.decode(bytes)
        .getOrElse(fail(s"interlaced decode $ch ${w}x$h"))
      assert(back.pixels.sameElements(img.pixels), s"$ch ${w}x$h")
      // lossless + independent implementation: ImageIO must read our
      // interlaced file pixel-identically (RGB/RGBA only — its gray
      // reader is also exact but getRGB converts, so skip ch=1)
      if (ch >= 3) {
        val bi = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        assert(bi != null, s"ImageIO rejected interlaced $ch ${w}x$h")
        for (y <- 0 until h; x <- 0 until w) {
          val i = (y * w + x) * ch
          val want = (if (ch == 4) (img.pixels(i + 3) & 0xff) << 24
            else 0xff000000) |
            ((img.pixels(i) & 0xff) << 16) |
            ((img.pixels(i + 1) & 0xff) << 8) | (img.pixels(i + 2) & 0xff)
          assert(bi.getRGB(x, y) == want, s"($x,$y) $ch ${w}x$h")
        }
      }
    }
    // a truncated interlaced stream (a whole missing pass) must fail
    val img = Png.Image(16, 16, 3, noise(16 * 16 * 3, 5L))
    val good = Png.encode(img, interlaced = true)
    for (n <- 0 until good.length)
      assert(Png.decode(good.take(n)).isEmpty)
  }

  test("dims probe and MediaCodecs dispatch") {
    val img = Png.Image(12, 5, 3, noise(12 * 5 * 3, 1L))
    val bytes = Png.encode(img)
    assert(Png.dims(bytes).contains((12, 5, 3)))
    val meta = MediaCodecs.decode(bytes)
    assert(meta.exists(m => m.format == "png" && m.width == 12 &&
      m.height == 5 && m.channels == 3))
  }

  test("malformed input returns None, never throws") {
    val img = Png.Image(9, 6, 3, noise(9 * 6 * 3, 5L))
    val good = Png.encode(img)
    // every truncation point fails cleanly (PNG requires IEND + CRCs)
    for (n <- 0 until good.length)
      assert(Png.decode(good.take(n)).isEmpty, s"truncated at $n decoded")
    // any single-byte corruption either fails cleanly or still decodes
    // to the exact image (flips in pure padding) — never wrong pixels,
    // because every chunk is CRC-guarded and the zlib body is
    // adler-guarded
    for (i <- good.indices) {
      val bad = good.clone()
      bad(i) = (bad(i) ^ 0x40).toByte
      val r = Png.decode(bad)
      assert(r.isEmpty || r.get.pixels.sameElements(img.pixels),
        s"corruption at $i produced wrong pixels")
    }
    // interlaced (Adam7) is rejected, not mis-decoded: patch IHDR
    val adam = good.clone()
    adam(28) = 1 // interlace byte within IHDR body
    assert(Png.decode(adam).isEmpty) // (CRC now fails — still rejected)
    assert(Png.decode(Array.emptyByteArray).isEmpty)
    assert(Png.decode("not a png at all, really".getBytes).isEmpty)
    // inflate bomb guard: a tiny stream expanding past maxOut
    val bomb = Png.deflateFixed(Array.fill[Byte](1 << 20)(0))
    assert(Png.inflate(bomb, maxOut = 1000).isEmpty)
  }
}
