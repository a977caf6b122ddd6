package graft

import graft.sources.TarCodec
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Seeded randomized properties for the TAR codec: arbitrary archives
  * round-trip exactly, and ARBITRARY byte flips never throw — they
  * either leave a still-valid archive (flip landed in body padding or
  * unchecked header slack) or yield None.
  */
class TarCodecFuzzSpec extends AnyFunSuite {

  test("random archives round-trip exactly") {
    for (seed <- Seq(3, 17, 58, 101)) {
      val rnd = new Random(seed)
      val entries = (0 until 1 + rnd.nextInt(8)).map { i =>
        val name = s"d/${seed}_$i." + ("x" * rnd.nextInt(20))
        val body = Array.fill(rnd.nextInt(2000))(rnd.nextInt(256).toByte)
        name -> body
      }
      val decoded = TarCodec.decode(TarCodec.encodeArchive(entries))
        .getOrElse(fail(s"seed=$seed: decode failed"))
      assert(decoded.map(_.name) === entries.map(_._1))
      decoded.zip(entries).foreach { case (e, (_, b)) =>
        assert(e.body.toSeq === b.toSeq, s"seed=$seed")
      }
    }
  }

  test("single random byte flips never throw; checked fields yield None") {
    val rnd = new Random(7)
    val entries = (0 until 3).map { i =>
      s"f$i" -> Array.fill(300 + rnd.nextInt(700))(rnd.nextInt(256).toByte)
    }
    val good = TarCodec.encodeArchive(entries)
    (0 until 400).foreach { _ =>
      val pos = rnd.nextInt(good.length)
      val mutated = good.clone()
      mutated(pos) = (mutated(pos) ^ (1 << rnd.nextInt(8))).toByte
      val out = TarCodec.decode(mutated) // must not throw
      // a flip inside a checked header field (name/size/chksum/magic of
      // any entry) must be REJECTED, not silently parsed: compute which
      // entry's header region pos falls into
      var off = 0
      var verdictKnown = false
      entries.foreach { case (_, body) =>
        val padded = (body.length + 511) / 512 * 512
        if (!verdictKnown && pos >= off && pos < off + 512) {
          val f = pos - off
          // name[0..100), size[124..136), the chksum DIGITS [148..154)
          // and magic[257..263) are all verified (everything outside
          // the chksum field by the sum, the digits by comparison) —
          // any flip there must fail the parse. 154/155 are the
          // NUL+space terminators: a flip there can legally still
          // parse (the sum treats the whole field as spaces), so they
          // are excluded.
          if (f < 100 || (f >= 124 && f < 136) || (f >= 148 && f < 154)
            || (f >= 257 && f < 263)) {
            assert(out.isEmpty, s"flip at header offset $f parsed anyway")
            verdictKnown = true
          }
        }
        off += 512 + padded
      }
      // body or terminator flips: parse may succeed; if it does, the
      // entry COUNT is intact (framing never drifts)
      if (!verdictKnown) out.foreach(es => assert(es.size == entries.size))
    }
  }

  test("truncation at every block boundary yields None, never throws") {
    val entries = Seq("a" -> Array.fill[Byte](700)(5), "b" -> Array.fill[Byte](100)(9))
    val good = TarCodec.encodeArchive(entries)
    val memberBytes = good.length - 1024 // before the two zero blocks
    (0 to memberBytes by 512).foreach { cut =>
      // no zero block survives the cut -> the terminator is missing
      assert(TarCodec.decode(good.take(cut)).isEmpty, s"cut=$cut")
    }
    // one surviving zero block is a legal (lenient) terminator
    assert(TarCodec.decode(good.take(memberBytes + 512))
      .exists(_.size == entries.size))
  }
}
