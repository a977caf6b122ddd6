package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

/** A real TAR (POSIX ustar) reader/writer — the WebDataset container:
  * large-scale multimodal training corpora ship as TAR shards, so the
  * archive→samples stage is the mm-family's third REAL format after
  * WARC ([[WarcCodec]]) and PGM ([[PgmCodec]]). Pure byte parsing, no
  * external library.
  *
  * The contract that matters at 100 TB mirrors WARC's: entry bodies
  * are framed by the octal size field, NEVER by scanning for a
  * sentinel — a body containing the bytes "ustar" or a 512-byte run
  * of zeros must not split or terminate an entry (TarCodecSpec pins
  * both). Headers are validated structurally (magic + checksum + size
  * octal); decode never throws — None on ANY malformed entry
  * (truncation, bad magic, checksum mismatch, non-octal size), the
  * corrupt-input posture shared with the other codecs.
  */
object TarCodec {

  final case class Entry(name: String, body: Array[Byte])

  private val BlockSize = 512

  private def octal(value: Long, len: Int): Array[Byte] = {
    // len-1 octal digits, NUL terminated (the common GNU/ustar layout)
    val s = java.lang.Long.toOctalString(value)
    require(s.length <= len - 1, s"octal field overflow: $value")
    val padded = ("0" * (len - 1 - s.length)) + s
    (padded + "\u0000").getBytes(UTF_8)
  }

  private def putString(block: Array[Byte], off: Int, len: Int, s: String): Unit = {
    val bytes = s.getBytes(UTF_8)
    require(bytes.length <= len, s"field overflow: $s")
    System.arraycopy(bytes, 0, block, off, bytes.length)
  }

  /** One entry's bytes: a 512-byte ustar header + body padded to a
    * 512-byte boundary. Size and checksum are computed, never
    * caller-set.
    */
  def encodeEntry(name: String, body: Array[Byte]): Array[Byte] = {
    require(name.getBytes(UTF_8).length <= 100, s"name too long: $name")
    val header = new Array[Byte](BlockSize)
    putString(header, 0, 100, name)
    System.arraycopy(octal(420, 8), 0, header, 100, 8)        // mode 0644
    System.arraycopy(octal(0, 8), 0, header, 108, 8)          // uid
    System.arraycopy(octal(0, 8), 0, header, 116, 8)          // gid
    System.arraycopy(octal(body.length.toLong, 12), 0, header, 124, 12)
    System.arraycopy(octal(0, 12), 0, header, 136, 12)        // mtime
    java.util.Arrays.fill(header, 148, 156, ' '.toByte)       // chksum blanks
    header(156) = '0'                                         // regular file
    putString(header, 257, 6, "ustar")                  // magic
    header(263) = '0'; header(264) = '0'                      // version
    var sum = 0L
    var i = 0
    while (i < BlockSize) { sum += header(i) & 0xff; i += 1 }
    val chk = java.lang.Long.toOctalString(sum)
    val chkPadded = ("0" * (6 - chk.length)) + chk
    System.arraycopy(chkPadded.getBytes(UTF_8), 0, header, 148, 6)
    header(154) = 0; header(155) = ' '.toByte
    val padded = (body.length + BlockSize - 1) / BlockSize * BlockSize
    val out = new Array[Byte](BlockSize + padded)
    System.arraycopy(header, 0, out, 0, BlockSize)
    System.arraycopy(body, 0, out, BlockSize, body.length)
    out
  }

  /** Concatenated entries + the mandatory two-zero-block terminator. */
  def encodeArchive(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val members = entries.iterator
      .map { case (n, b) => encodeEntry(n, b) }
      .foldLeft(Array.emptyByteArray)(_ ++ _)
    members ++ new Array[Byte](2 * BlockSize)
  }

  private def parseOctal(bytes: Array[Byte], off: Int, len: Int): Option[Long] = {
    var i = off
    val end = off + len
    // skip leading spaces, stop at NUL or space (both legal terminators)
    while (i < end && bytes(i) == ' '.toByte) i += 1
    var v = 0L
    var digits = 0
    while (i < end && bytes(i) != 0 && bytes(i) != ' '.toByte) {
      val c = bytes(i)
      if (c < '0' || c > '7') return None
      if (v > (Long.MaxValue - 7) / 8) return None // crafted-size overflow
      v = v * 8 + (c - '0')
      digits += 1
      i += 1
    }
    if (digits == 0) None else Some(v)
  }

  private def cString(bytes: Array[Byte], off: Int, len: Int): String = {
    var end = off
    while (end < off + len && bytes(end) != 0) end += 1
    new String(bytes, off, end - off, UTF_8)
  }

  /** Parse a whole archive. None on ANY malformed entry — an archive
    * either parses completely (up to the zero-block terminator) or is
    * counted corrupt, the census-keeps-corrupt posture of the other
    * codecs.
    */
  def decode(bytes: Array[Byte]): Option[Seq[Entry]] = {
    if (bytes == null) return None
    val out = Seq.newBuilder[Entry]
    var i = 0
    while (true) {
      if (i + BlockSize > bytes.length) return None // missing terminator
      var allZero = true
      var j = i
      while (allZero && j < i + BlockSize) { allZero = bytes(j) == 0; j += 1 }
      if (allZero) return Some(out.result()) // first zero block ends it
      if (cString(bytes, i + 257, 6) != "ustar") return None
      // Only plain regular files ('0' or pre-POSIX NUL) are in-contract:
      // PAX extended headers ('x'/'g'), GNU longnames ('L'), links and
      // directories would otherwise surface as regular entries whose
      // body is metadata. Reject-malformed posture, same as the other
      // codecs (ADVICE r8).
      val typeflag = bytes(i + 156)
      if (typeflag != '0'.toByte && typeflag != 0.toByte) return None
      val size = parseOctal(bytes, i + 124, 12) match {
        case Some(v) => v
        case None => return None
      }
      val declared = parseOctal(bytes, i + 148, 8) match {
        case Some(v) => v
        case None => return None
      }
      var sum = 0L
      var k = i
      while (k < i + BlockSize) {
        // checksum counts the chksum field itself as spaces
        sum += (if (k - i >= 148 && k - i < 156) ' '.toByte else bytes(k)) & 0xff
        k += 1
      }
      if (sum != declared) return None
      if (size > bytes.length.toLong - i - BlockSize) return None // truncated
      val body = new Array[Byte](size.toInt)
      System.arraycopy(bytes, i + BlockSize, body, 0, size.toInt)
      out += Entry(cString(bytes, i, 100), body)
      val padded = (size + BlockSize - 1) / BlockSize * BlockSize
      i += BlockSize + padded.toInt
    }
    None // unreachable
  }
}
