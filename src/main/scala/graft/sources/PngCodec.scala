package graft.sources

import java.awt.image.{BufferedImage, IndexColorModel}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real COMPRESSED-image codec: PNG via the JDK's `javax.imageio`
  * (zlib/DEFLATE inside the container — no external dependency, so
  * the sandbox can execute the full encode→decode round trip that
  * PGM (mm15) only proved for an uncompressed format).
  *
  * Contract mirrors the other binary codecs (PgmCodec, WavCodec,
  * TarCodec, WarcCodec): encode is canonical and deterministic for a
  * given JDK, decode is total — `None` for anything outside the
  * pinned contract (corrupt bytes are DATA at media-scan scale,
  * never exceptions). The pinned contract (round 10):
  *
  *  - 8-bit single-band grayscale → pixels verbatim. 16-bit gray and
  *    palette-indexed PNGs are REJECTED (both present 1 raster band,
  *    but `getSample.toByte` would silently truncate the former and
  *    return palette indices for the latter — ADVICE r9).
  *  - 8-bit 3-band RGB (no alpha) → pixels are BT.601 integer
  *    luminance `(77·R + 150·G + 29·B) >> 8` (77+150+29 = 256; pure
  *    integer form, so the DuckDB oracle replays it exactly —
  *    `(77*r + 150*g + 29*b) // 256`). No JVM-dependent float
  *    color-space conversion ever touches the data path.
  *  - anything else (alpha, CMYK, >8-bit channels) → None.
  *
  * Reference tie: token.rs's media metadata fields are the
  * reference's only multimodal surface; the compressed container is
  * the brief's 100 TB training-data requirement.
  */
object PngCodec {

  // executor threads must never touch a temp-file cache
  ImageIO.setUseCache(false)

  /** PNG signature (the mm20 sniffing magic). */
  val Magic: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** `bands` records the source layout: 1 = grayscale (pixels are the
    * raw samples), 3 = RGB (pixels are BT.601 integer luminance).
    */
  final case class Image(width: Int, height: Int, pixels: Array[Byte],
      bands: Int = 1) {
    def pixel(k: Int): Int = pixels(k) & 0xff
  }

  /** BT.601 integer luminance, the pinned 8-bit color→gray form. */
  @inline def luma(r: Int, g: Int, b: Int): Int = (77 * r + 150 * g + 29 * b) >> 8

  /** Encode a w×h 8-bit grayscale raster (row-major) as PNG. */
  def encode(w: Int, h: Int, px: Array[Byte]): Array[Byte] = {
    require(px.length == w * h, s"raster ${px.length} != $w x $h")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h, px)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Encode a w×h 8-bit RGB raster (row-major, one array per channel)
    * as a truecolor PNG.
    */
  def encodeRgb(w: Int, h: Int, r: Array[Byte], g: Array[Byte],
      b: Array[Byte]): Array[Byte] = {
    require(r.length == w * h && g.length == r.length && b.length == r.length,
      s"raster ${r.length}/${g.length}/${b.length} != $w x $h")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var k = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          ((r(k) & 0xff) << 16) | ((g(k) & 0xff) << 8) | (b(k) & 0xff))
        k += 1
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode a PNG under the pinned contract (object scaladoc): 8-bit
    * gray verbatim, 8-bit RGB as BT.601 integer luminance, everything
    * else None.
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
      val sm = raster.getSampleModel
      val nb = raster.getNumBands
      // every in-contract channel is exactly 8 bits — a 16-bit gray
      // sample would silently truncate through toByte otherwise
      var band = 0
      while (band < nb) {
        if (sm.getSampleSize(band) != 8) return None
        band += 1
      }
      val w = img.getWidth
      val h = img.getHeight
      if (nb == 1) {
        // palette PNGs also present one band, but the samples are
        // palette INDICES, not intensities — out of contract
        if (img.getColorModel.isInstanceOf[IndexColorModel]) return None
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
        Some(Image(w, h, px, bands = 1))
      } else if (nb == 3 && !img.getColorModel.hasAlpha) {
        // getSample band indices are semantic (band 0 = R) regardless
        // of the underlying buffer layout (TYPE_3BYTE_BGR stores
        // B,G,R but bandOffsets map 0→R)
        val px = new Array[Byte](w * h)
        var k = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            px(k) = luma(raster.getSample(x, y, 0), raster.getSample(x, y, 1),
              raster.getSample(x, y, 2)).toByte
            k += 1
            x += 1
          }
          y += 1
        }
        Some(Image(w, h, px, bands = 3))
      } else None
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }
}
