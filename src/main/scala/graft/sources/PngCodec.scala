package graft.sources

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real COMPRESSED-image codec: 8-bit grayscale PNG via the JDK's
  * `javax.imageio` (zlib/DEFLATE inside the container — no external
  * dependency, so the sandbox can execute the full encode→decode
  * round trip that PGM (mm15) only proved for an uncompressed
  * format).
  *
  * Contract mirrors the other binary codecs (PgmCodec, WavCodec,
  * TarCodec, WarcCodec): encode is canonical and deterministic for a
  * given JDK, decode is total — `None` for anything that is not a
  * parseable single-band grayscale PNG (corrupt bytes are DATA at
  * media-scan scale, never exceptions). Reference tie: token.rs's
  * media metadata fields are the reference's only multimodal surface;
  * the compressed container is the brief's 100 TB training-data
  * requirement.
  */
object PngCodec {

  // executor threads must never touch a temp-file cache
  ImageIO.setUseCache(false)

  /** PNG signature (the mm20 sniffing magic). */
  val Magic: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  final case class Image(width: Int, height: Int, pixels: Array[Byte]) {
    def pixel(k: Int): Int = pixels(k) & 0xff
  }

  /** Encode a w×h 8-bit grayscale raster (row-major) as PNG. */
  def encode(w: Int, h: Int, px: Array[Byte]): Array[Byte] = {
    require(px.length == w * h, s"raster ${px.length} != $w x $h")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h, px)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode a grayscale PNG. None on: null/short input, wrong magic,
    * undecodable stream, or a multi-band (color) image — the
    * grayscale contract keeps pixel extraction deterministic (no
    * JVM-dependent color-space conversion in the data path).
    */
  def decode(bytes: Array[Byte]): Option[Image] = {
    if (bytes == null || bytes.length < Magic.length) return None
    var i = 0
    while (i < Magic.length) {
      if (bytes(i) != Magic(i)) return None
      i += 1
    }
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) return None
      val raster = img.getRaster
      if (raster.getNumBands != 1) return None
      val w = img.getWidth
      val h = img.getHeight
      val px = new Array[Byte](w * h)
      var k = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          px(k) = raster.getSample(x, y, 0).toByte
          k += 1
          x += 1
        }
        y += 1
      }
      Some(Image(w, h, px))
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }
}
