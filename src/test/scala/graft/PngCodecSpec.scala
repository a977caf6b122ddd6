package graft

import graft.sources.PngCodec
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class PngCodecSpec extends AnyFunSuite {

  test("encode/decode round-trips random rasters exactly (PNG is lossless)") {
    for (seed <- Seq(3, 17, 42)) {
      val rnd = new Random(seed)
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(30)
      val px = Array.fill(w * h)(rnd.nextInt(256).toByte)
      val img = PngCodec.decode(PngCodec.encode(w, h, px))
        .getOrElse(fail(s"seed=$seed: round-trip failed"))
      assert(img.width === w)
      assert(img.height === h)
      assert(img.pixels.toSeq === px.toSeq)
    }
  }

  test("the container is a real compressed PNG, not a raw raster") {
    // constant raster → DEFLATE collapses it: container smaller than
    // the raw pixels proves actual compression happens inside
    val n = 64 * 64
    val flat = PngCodec.encode(64, 64, Array.fill(n)(7.toByte))
    assert(flat.length < n, s"no compression: ${flat.length} >= $n")
    // magic at offset 0, IHDR chunk follows the 8-byte signature
    assert(flat.take(8).toSeq === PngCodec.Magic.toSeq)
    assert(new String(flat.slice(12, 16), "US-ASCII") === "IHDR")
  }

  test("corrupt inputs return None, never throw") {
    val good = PngCodec.encode(5, 4, Array.tabulate(20)(_.toByte))
    assert(PngCodec.decode(null).isEmpty)
    assert(PngCodec.decode(Array.emptyByteArray).isEmpty)
    assert(PngCodec.decode(good.take(7)).isEmpty) // shorter than magic
    assert(PngCodec.decode(good.take(20)).isEmpty) // truncated stream
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(PngCodec.decode(badMagic).isEmpty)
    // flip a byte inside the data chunks: either the CRC check or the
    // inflate fails — must map to None, not an exception
    val rnd = new Random(11)
    (0 until 100).foreach { _ =>
      val b = good.clone()
      val i = 8 + rnd.nextInt(b.length - 8)
      b(i) = (b(i) ^ (1 << rnd.nextInt(8))).toByte
      PngCodec.decode(b) // must not throw; value is corrupt-dependent
    }
  }

  test("truecolor PNGs decode to pinned BT.601 integer luminance") {
    for (seed <- Seq(5, 23)) {
      val rnd = new Random(seed)
      val w = 1 + rnd.nextInt(20)
      val h = 1 + rnd.nextInt(15)
      val r = Array.fill(w * h)(rnd.nextInt(256).toByte)
      val g = Array.fill(w * h)(rnd.nextInt(256).toByte)
      val b = Array.fill(w * h)(rnd.nextInt(256).toByte)
      val img = PngCodec.decode(PngCodec.encodeRgb(w, h, r, g, b))
        .getOrElse(fail(s"seed=$seed: color round-trip failed"))
      assert(img.bands === 3)
      assert(img.width === w)
      assert(img.height === h)
      (0 until w * h).foreach { k =>
        val want = PngCodec.luma(r(k) & 0xff, g(k) & 0xff, b(k) & 0xff)
        assert(img.pixel(k) === want, s"seed=$seed pixel $k")
      }
    }
    // the pinned coefficients: 77+150+29 = 256 keeps white at 255
    assert(PngCodec.luma(255, 255, 255) === 255)
    assert(PngCodec.luma(0, 0, 0) === 0)
  }

  test("16-bit gray, palette, and alpha PNGs are out of contract (ADVICE r9)") {
    import java.awt.image.BufferedImage
    def png(img: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // 16-bit grayscale: 1 band but 16-bit samples — toByte would
    // silently truncate, so the gate must reject it
    val g16 = new BufferedImage(4, 3, BufferedImage.TYPE_USHORT_GRAY)
    g16.getRaster.setSample(1, 1, 0, 0x8123)
    assert(PngCodec.decode(png(g16)).isEmpty, "16-bit gray accepted")
    // palette-indexed: 1 band of 8-bit PALETTE INDICES, not intensities
    val pal = new BufferedImage(4, 3, BufferedImage.TYPE_BYTE_INDEXED)
    pal.setRGB(2, 1, 0x336699)
    assert(PngCodec.decode(png(pal)).isEmpty, "palette accepted")
    // RGBA: 4 bands
    val argb = new BufferedImage(4, 3, BufferedImage.TYPE_INT_ARGB)
    argb.setRGB(0, 0, 0x80ff8040)
    assert(PngCodec.decode(png(argb)).isEmpty, "alpha accepted")
  }
}
