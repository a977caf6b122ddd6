package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.TarCodec
import java.nio.charset.StandardCharsets.UTF_8

class TarCodecSpec extends AnyFunSuite {

  private def bytes(s: String): Array[Byte] = s.getBytes(UTF_8)

  test("round-trips entries, including empty and block-multiple bodies") {
    val entries = Seq(
      "docs/1.txt" -> bytes("hello tar"),
      "docs/2.txt" -> Array.emptyByteArray,
      "docs/3.bin" -> Array.fill[Byte](1024)(7), // exact block multiple
      "docs/4.bin" -> Array.fill[Byte](513)(-1)) // one byte past a block
    val archive = TarCodec.encodeArchive(entries)
    assert(archive.length % 512 === 0)
    val decoded = TarCodec.decode(archive).get
    assert(decoded.map(_.name) === entries.map(_._1))
    decoded.zip(entries).foreach { case (e, (_, b)) =>
      assert(e.body.toSeq === b.toSeq)
    }
  }

  test("bodies are size-framed: embedded magic and zero blocks do not split") {
    val trap = new Array[Byte](1200)
    System.arraycopy(bytes("ustar"), 0, trap, 600, 5) // magic inside a body
    // trap[0..599] and trap[605..] are zeros — a full zero "block" worth
    val archive = TarCodec.encodeArchive(Seq(
      "a" -> trap, "b" -> bytes("after the trap")))
    val decoded = TarCodec.decode(archive).get
    assert(decoded.map(_.name) === Seq("a", "b"))
    assert(decoded.head.body.toSeq === trap.toSeq)
  }

  test("corrupt inputs return None, never throw") {
    val good = TarCodec.encodeArchive(Seq("x" -> bytes("payload")))
    assert(TarCodec.decode(null).isEmpty)
    assert(TarCodec.decode(Array.emptyByteArray).isEmpty) // no terminator
    assert(TarCodec.decode(good.dropRight(1024)).isEmpty) // terminator gone
    assert(TarCodec.decode(good.take(300)).isEmpty)       // truncated header
    val badMagic = good.clone(); badMagic(257) = 'X'.toByte
    assert(TarCodec.decode(badMagic).isEmpty)
    val badChk = good.clone(); badChk(0) = 'y'.toByte // name change breaks sum
    assert(TarCodec.decode(badChk).isEmpty)
    val badSize = good.clone(); badSize(124) = '9'.toByte // non-octal digit
    assert(TarCodec.decode(badSize).isEmpty)
    // size larger than the remaining bytes (truncated body)
    val shortBody = good.clone()
    // bump size from 7 to 7777 octal keeping checksum stale -> checksum
    // catches it first; rebuild instead with a hand-truncated archive
    val truncated = TarCodec.encodeEntry("big", Array.fill[Byte](600)(1))
      .take(512 + 100)
    assert(TarCodec.decode(truncated).isEmpty)
    assert(TarCodec.decode(shortBody).nonEmpty) // clone untouched still parses
  }

  test("crafted 12-digit size cannot overflow to a negative length") {
    val e = TarCodec.encodeEntry("x", bytes("abc"))
    val arch = e ++ new Array[Byte](1024)
    // overwrite size field with max octal digits (checksum now stale, but
    // the octal parser runs first on a 7-filled field via decode order —
    // assert None either way, and specifically no exception
    (124 until 135).foreach(i => arch(i) = '7'.toByte)
    assert(TarCodec.decode(arch).isEmpty)
  }

  test("header checksum matches the POSIX blank-field rule") {
    val e = TarCodec.encodeEntry("docs/9.txt", bytes("abcdef"))
    var expected = 0L
    (0 until 512).foreach { i =>
      expected += (if (i >= 148 && i < 156) ' '.toByte else e(i)) & 0xff
    }
    val stored = new String(e, 148, 6, UTF_8)
    assert(java.lang.Long.parseLong(stored, 8) === expected)
    assert(e(156) === '0'.toByte) // regular file
    assert(new String(e, 257, 5, UTF_8) === "ustar")
  }
}
