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

  test("multi-band (color) PNGs are out of contract and return None") {
    val img = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(1, 1, 0xff8040)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    assert(PngCodec.decode(bos.toByteArray).isEmpty)
  }
}
