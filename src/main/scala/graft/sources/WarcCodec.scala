package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

/** A real WARC (ISO 28500 / WARC 1.0 — the Common Crawl container)
  * reader/writer for the multimodal ingest path: pure byte parsing
  * like [[PgmCodec]], so the archive→records stage runs in this
  * container with no external library. The parsing contract that
  * matters at 100 TB: record bodies are framed by Content-Length,
  * NEVER by scanning for a sentinel — a body containing the literal
  * bytes "WARC/1.0" must not split a record (the spec's reason for
  * mandatory Content-Length; WarcCodecSpec pins it).
  *
  * Grammar handled: version line, header fields up to the first empty
  * CRLF line (values may contain ':'), exactly Content-Length body
  * bytes, then the mandatory CRLF CRLF record terminator. decode
  * never throws — None on any malformed framing (truncation, missing
  * or non-numeric Content-Length, bad terminator), the corrupt-input
  * posture shared with PgmCodec.
  */
object WarcCodec {

  final case class Record(headers: Map[String, String], body: Array[Byte]) {
    def header(name: String): Option[String] = headers.get(name)
  }

  private val CRLF = "\r\n".getBytes(UTF_8)

  /** One record's bytes. Content-Length is computed, not caller-set. */
  def encodeRecord(headers: Seq[(String, String)], body: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder("WARC/1.0\r\n")
    headers.foreach { case (k, v) =>
      require(!k.contains(":") && !k.exists(c => c == '\r' || c == '\n'),
        s"bad header name: $k")
      require(!v.exists(c => c == '\r' || c == '\n'), s"bad header value: $v")
      sb.append(k).append(": ").append(v).append("\r\n")
    }
    sb.append("Content-Length: ").append(body.length).append("\r\n\r\n")
    val head = sb.toString.getBytes(UTF_8)
    val out = new Array[Byte](head.length + body.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(body, 0, out, head.length, body.length)
    System.arraycopy(CRLF, 0, out, head.length + body.length, 2)
    System.arraycopy(CRLF, 0, out, head.length + body.length + 2, 2)
    out
  }

  /** Concatenated records — an archive member. */
  def encodeArchive(records: Seq[(Seq[(String, String)], Array[Byte])]): Array[Byte] =
    records.iterator.map { case (h, b) => encodeRecord(h, b) }
      .foldLeft(Array.emptyByteArray)(_ ++ _)

  /** Parse a whole archive. None on ANY malformed record — an archive
    * either parses completely or is counted corrupt (the census keeps
    * corrupt archives as data, mirroring PgmCodec's posture).
    */
  def decode(bytes: Array[Byte]): Option[Seq[Record]] = {
    if (bytes == null) return None
    val out = Seq.newBuilder[Record]
    var i = 0
    while (i < bytes.length) {
      parseRecord(bytes, i) match {
        case Some((rec, next)) => out += rec; i = next
        case None => return None
      }
    }
    Some(out.result())
  }

  /** One record starting at `from`; returns it and the next offset. */
  private def parseRecord(bytes: Array[Byte], from: Int): Option[(Record, Int)] = {
    var i = from
    def readLine(): Option[String] = {
      val start = i
      while (i + 1 < bytes.length && !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 >= bytes.length) None
      else {
        val s = new String(bytes, start, i - start, UTF_8)
        i += 2
        Some(s)
      }
    }
    readLine() match {
      case Some(v) if v.startsWith("WARC/") => // version accepted loosely
      case _ => return None
    }
    val headers = Map.newBuilder[String, String]
    var done = false
    while (!done) {
      readLine() match {
        case None => return None
        case Some("") => done = true
        case Some(line) =>
          val sep = line.indexOf(':')
          if (sep <= 0) return None
          headers += line.substring(0, sep).trim -> line.substring(sep + 1).trim
      }
    }
    val hs = headers.result()
    val len = hs.get("Content-Length").flatMap(_.toLongOption) match {
      case Some(n) if n >= 0 && n <= Int.MaxValue => n.toInt
      case _ => return None
    }
    // long arithmetic: a crafted Content-Length near Int.MaxValue
    // must truncate-reject here, not overflow into copyOfRange
    if ((bytes.length - i).toLong < len.toLong + 4) return None
    val body = java.util.Arrays.copyOfRange(bytes, i, i + len)
    i += len
    if (bytes(i) != '\r' || bytes(i + 1) != '\n' ||
      bytes(i + 2) != '\r' || bytes(i + 3) != '\n') return None
    Some((Record(hs, body), i + 4))
  }
}
