package graft.sources

/** A REAL image codec for the multimodal decode path: binary PGM
  * ("P5", Netpbm grayscale — the format's full grammar: magic,
  * whitespace/comment-tolerant ASCII header, 8-bit raster). Pure
  * byte parsing, so unlike JPEG/PNG it needs no codec library and
  * runs in this container — the multimodal pipeline's decode stage
  * stops being a stub for at least one actual format, and the
  * partition-batched transform shape (mm02's contract) is exercised
  * against real bytes end-to-end (mm15 gates the build→parse
  * round-trip against a closed-form oracle).
  *
  * Only maxval ≤ 255 (1-byte samples) is supported — the common
  * case; a 2-byte-sample file returns None like any other
  * unsupported/corrupt input (decode never throws: a 100 TB media
  * scan treats undecodable payloads as data, not errors).
  */
object PgmCodec {

  final case class Pgm(width: Int, height: Int, maxVal: Int,
      pixels: Array[Byte]) {
    def pixel(i: Int): Int = pixels(i) & 0xff
  }

  /** Binary P5 bytes for a raster (row-major, 1 byte per pixel). */
  def encode(width: Int, height: Int, maxVal: Int,
      pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == width * height, "raster size mismatch")
    require(maxVal > 0 && maxVal <= 255, "1-byte samples only")
    val header = s"P5\n$width $height\n$maxVal\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(pixels, 0, out, header.length, pixels.length)
    out
  }

  /** Parse binary PGM. None on anything malformed: wrong magic,
    * truncated header or raster, maxval outside (0, 255].
    */
  def decode(bytes: Array[Byte]): Option[Pgm] = {
    if (bytes == null || bytes.length < 2 ||
      bytes(0) != 'P' || bytes(1) != '5') return None
    var i = 2

    // PGM grammar: tokens separated by whitespace; a '#' starts a
    // comment running to end of line, allowed wherever whitespace is
    def skipSpaceAndComments(): Boolean = {
      var sawSpace = false
      var more = true
      while (more && i < bytes.length) {
        val b = bytes(i)
        if (b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f') {
          sawSpace = true; i += 1
        } else if (b == '#') {
          sawSpace = true
          while (i < bytes.length && bytes(i) != '\n') i += 1
        } else more = false
      }
      sawSpace
    }

    def readInt(): Int = {
      if (!skipSpaceAndComments()) return -1
      if (i >= bytes.length || bytes(i) < '0' || bytes(i) > '9') return -1
      var v = 0L
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0')
        if (v > Int.MaxValue) return -1
        i += 1
      }
      v.toInt
    }

    val w = readInt(); if (w <= 0) return None
    val h = readInt(); if (h <= 0) return None
    val mv = readInt(); if (mv <= 0 || mv > 255) return None
    // exactly ONE whitespace byte separates maxval from the raster
    // (the spec's rule — raster bytes may themselves look like
    // whitespace and must not be skipped)
    if (i >= bytes.length || !isSpace(bytes(i))) return None
    i += 1
    val n = w.toLong * h
    if (n > Int.MaxValue || bytes.length - i < n) return None
    val px = java.util.Arrays.copyOfRange(bytes, i, i + n.toInt)
    Some(Pgm(w, h, mv, px))
  }

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f'
}
