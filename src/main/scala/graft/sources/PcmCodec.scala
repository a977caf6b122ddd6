package graft.sources

/** Minimal raw-PCM codec: 16-bit little-endian signed samples, no
  * container — the byte layout of a WAV `data` chunk (RIFF spec,
  * public). Encode packs a sample array; decode unpacks, rejecting
  * odd-length payloads (torn frames are data, not exceptions — the
  * same posture as [[PgmCodec]]).
  */
object PcmCodec {

  /** samples → 16-bit LE bytes (2 bytes per sample). */
  def encode(samples: Array[Short]): Array[Byte] = {
    val out = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val v = samples(i)
      out(2 * i) = (v & 0xff).toByte
      out(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** bytes → samples; None on null/odd-length (undecodable) input. */
  def decode(bytes: Array[Byte]): Option[Array[Short]] = {
    if (bytes == null || bytes.length % 2 != 0) return None
    val n = bytes.length / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort
      i += 1
    }
    Some(out)
  }
}
