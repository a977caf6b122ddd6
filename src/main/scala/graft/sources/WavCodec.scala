package graft.sources

/** A real WAV (RIFF/WAVE, PCM16 mono) container around [[PcmCodec]]'s
  * sample layout — the FOURTH real format (after PGM, WARC, TAR) and
  * the one audio training corpora actually arrive in. Public spec:
  * Microsoft/IBM RIFF (1991), as in every audio toolchain.
  *
  * The parsing contract mirrors the other containers: CHUNK-WALK by
  * declared little-endian sizes, never sentinel scanning — a sample
  * run that happens to spell "data" must not start a chunk. Unknown
  * chunks between "fmt " and "data" are skipped by their declared
  * size (real encoders emit LIST/INFO chunks there). decode never
  * throws — None on any structural violation (bad magics, truncated
  * chunk, non-PCM format, odd data size, size overflow), the shared
  * corrupt-input posture.
  */
object WavCodec {

  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** Canonical 44-byte-header mono PCM16 WAV. */
  def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, s"bad sample rate: $sampleRate")
    val data = PcmCodec.encode(samples)
    val out = new java.io.ByteArrayOutputStream(44 + data.length)
    out.write(ascii("RIFF")); out.write(le32(36L + data.length))
    out.write(ascii("WAVE"))
    out.write(ascii("fmt ")); out.write(le32(16))
    out.write(le16(1))                 // PCM
    out.write(le16(1))                 // mono
    out.write(le32(sampleRate.toLong))
    out.write(le32(sampleRate.toLong * 2)) // byte rate
    out.write(le16(2))                 // block align
    out.write(le16(16))                // bits per sample
    out.write(ascii("data")); out.write(le32(data.length.toLong))
    out.write(data)
    out.toByteArray
  }

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** bytes → (sampleRate, samples); None on any malformed structure. */
  def decode(bytes: Array[Byte]): Option[(Int, Array[Short])] = {
    if (bytes == null || bytes.length < 44) return None
    if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return None
    if (u32(bytes, 4) != bytes.length.toLong - 8) return None
    var i = 12
    var rate = -1
    // chunk-walk: fmt must precede data; unknown chunks skipped by size
    while (i + 8 <= bytes.length) {
      val id = tag(bytes, i)
      val size = u32(bytes, i + 4)
      if (size > bytes.length.toLong - i - 8) return None // truncated chunk
      if (id == "fmt ") {
        if (size != 16) return None
        if (u16(bytes, i + 8) != 1) return None   // PCM only
        if (u16(bytes, i + 10) != 1) return None  // mono only
        rate = u32(bytes, i + 12).toInt
        if (rate <= 0) return None
        if (u32(bytes, i + 16) != rate.toLong * 2) return None // byte rate
        if (u16(bytes, i + 20) != 2) return None  // block align
        if (u16(bytes, i + 22) != 16) return None // bits per sample
      } else if (id == "data") {
        if (rate < 0) return None // data before fmt
        if (size % 2 != 0) return None
        if (i + 8 + size != bytes.length.toLong) return None // trailing junk
        val body = java.util.Arrays.copyOfRange(bytes, i + 8, i + 8 + size.toInt)
        return PcmCodec.decode(body).map(rate -> _)
      }
      // chunks are word-aligned: odd sizes carry a pad byte
      i += 8 + size.toInt + (size % 2).toInt
    }
    None // no data chunk
  }
}
