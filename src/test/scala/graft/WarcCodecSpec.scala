package graft

import graft.sources.WarcCodec
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8
import scala.util.Random

class WarcCodecSpec extends AnyFunSuite {

  private def rec(id: String, body: Array[Byte]) =
    (Seq("WARC-Type" -> "response", "WARC-Record-ID" -> id), body)

  test("archive round-trips multiple records exactly") {
    for (seed <- Seq(3, 17)) {
      val rnd = new Random(seed)
      val records = (0 until 5).map { k =>
        rec(s"urn:graft:$k", Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte))
      }
      val parsed = WarcCodec.decode(WarcCodec.encodeArchive(records))
        .getOrElse(fail(s"seed=$seed: archive failed to parse"))
      assert(parsed.size === 5)
      parsed.zipWithIndex.foreach { case (p, k) =>
        assert(p.header("WARC-Record-ID") === Some(s"urn:graft:$k"))
        assert(p.header("Content-Length") ===
          Some(records(k)._2.length.toString))
        assert(p.body.toSeq === records(k)._2.toSeq)
      }
    }
  }

  test("bodies are framed by Content-Length, not sentinel scanning") {
    // a body containing the literal record-start marker and CRLFCRLF
    // must NOT split the record
    val tricky = "WARC/1.0\r\nWARC-Type: fake\r\n\r\n".getBytes(UTF_8)
    val parsed = WarcCodec.decode(WarcCodec.encodeArchive(Seq(
      rec("urn:graft:0", tricky), rec("urn:graft:1", "after".getBytes(UTF_8)))))
      .getOrElse(fail("tricky body failed"))
    assert(parsed.size === 2)
    assert(parsed.head.body.toSeq === tricky.toSeq)
    assert(new String(parsed(1).body, UTF_8) === "after")
  }

  test("UTF-8 bodies: Content-Length counts bytes, not chars") {
    val s = "héllo wörld ∞"
    val bytes = s.getBytes(UTF_8)
    assert(bytes.length > s.length)
    val parsed = WarcCodec.decode(WarcCodec.encodeRecord(
      Seq("WARC-Record-ID" -> "urn:graft:9"), bytes)).get
    assert(parsed.head.header("Content-Length") === Some(bytes.length.toString))
    assert(new String(parsed.head.body, UTF_8) === s)
  }

  test("header values may contain colons; names/values reject CRLF") {
    val parsed = WarcCodec.decode(WarcCodec.encodeRecord(
      Seq("WARC-Target-URI" -> "https://example.com/a:b?c=d"),
      "x".getBytes(UTF_8))).get
    assert(parsed.head.header("WARC-Target-URI") ===
      Some("https://example.com/a:b?c=d"))
    intercept[IllegalArgumentException] {
      WarcCodec.encodeRecord(Seq("Bad\r\nName" -> "v"), Array.emptyByteArray)
    }
    intercept[IllegalArgumentException] {
      WarcCodec.encodeRecord(Seq("Name" -> "bad\nvalue"), Array.emptyByteArray)
    }
  }

  test("malformed framing returns None, never throws") {
    val good = WarcCodec.encodeRecord(
      Seq("WARC-Record-ID" -> "urn:graft:0"), "abcdef".getBytes(UTF_8))
    assert(WarcCodec.decode(null).isEmpty)
    assert(WarcCodec.decode(good.dropRight(1)).isDefined === false) // truncated terminator
    assert(WarcCodec.decode(good.drop(1)).isEmpty) // bad magic
    assert(WarcCodec.decode("HTTP/1.1 200 OK\r\n\r\n".getBytes(UTF_8)).isEmpty)
    // missing Content-Length
    assert(WarcCodec.decode(
      "WARC/1.0\r\nWARC-Type: x\r\n\r\nbody\r\n\r\n".getBytes(UTF_8)).isEmpty)
    // non-numeric Content-Length
    assert(WarcCodec.decode(
      "WARC/1.0\r\nContent-Length: ten\r\n\r\n0123456789\r\n\r\n".getBytes(UTF_8)).isEmpty)
    // one good record followed by garbage poisons the archive (the
    // all-or-nothing contract the census counts on)
    assert(WarcCodec.decode(good ++ "garbage".getBytes(UTF_8)).isEmpty)
    // empty archive is valid and empty
    assert(WarcCodec.decode(Array.emptyByteArray) === Some(Seq()))
    // a Content-Length near Int.MaxValue must reject by truncation,
    // not overflow the bounds check into a throwing copyOfRange
    assert(WarcCodec.decode(
      "WARC/1.0\r\nContent-Length: 2147483647\r\n\r\nshort\r\n\r\n"
        .getBytes(UTF_8)).isEmpty)
    assert(WarcCodec.decode(
      "WARC/1.0\r\nContent-Length: 2147483644\r\n\r\n\r\n\r\n"
        .getBytes(UTF_8)).isEmpty)
  }

  test("zero-length bodies round-trip") {
    val parsed = WarcCodec.decode(WarcCodec.encodeArchive(Seq(
      rec("urn:graft:0", Array.emptyByteArray),
      rec("urn:graft:1", "x".getBytes(UTF_8))))).get
    assert(parsed.size === 2)
    assert(parsed.head.body.isEmpty)
    assert(parsed.head.header("Content-Length") === Some("0"))
  }
}
