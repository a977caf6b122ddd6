package graft

import graft.sources.WavCodec
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Seeded randomized properties for the WAV codec, mirroring
  * TarCodecFuzzSpec: random clips round-trip exactly, and arbitrary
  * single-bit flips never throw — they either still parse (flip in
  * sample data: PCM bytes carry no redundancy) or yield None (flip in
  * any verified header field).
  */
class WavCodecFuzzSpec extends AnyFunSuite {

  test("random clips round-trip exactly across rates and lengths") {
    for (seed <- Seq(5, 23, 77, 131)) {
      val rnd = new Random(seed)
      val rate = 8000 + rnd.nextInt(40000)
      val samples = Array.fill(rnd.nextInt(3000))(rnd.nextInt(65536).toShort)
      val (r, s) = WavCodec.decode(WavCodec.encode(rate, samples))
        .getOrElse(fail(s"seed=$seed: decode failed"))
      assert(r === rate)
      assert(s.toSeq === samples.toSeq, s"seed=$seed")
    }
  }

  test("single random byte flips never throw; header flips reject") {
    val rnd = new Random(11)
    val samples = Array.fill(500)(rnd.nextInt(65536).toShort)
    val good = WavCodec.encode(16000, samples)
    (0 until 400).foreach { _ =>
      val pos = rnd.nextInt(good.length)
      val mutated = good.clone()
      mutated(pos) = (mutated(pos) ^ (1 << rnd.nextInt(8))).toByte
      val out = WavCodec.decode(mutated) // must not throw
      // every byte of the 44-byte canonical header is verified: magics
      // by comparison, sizes by arithmetic consistency, fmt fields by
      // the PCM16-mono contract — a flip there must reject
      if (pos < 44) assert(out.isEmpty, s"header flip at $pos parsed")
      // data flips parse (PCM has no checksum) with the SAME geometry
      else {
        assert(out.nonEmpty, s"data flip at $pos rejected")
        val (r, s) = out.get
        assert(r === 16000 && s.length === samples.length)
      }
    }
  }

  test("truncation and extension at every boundary class reject") {
    val good = WavCodec.encode(22050, Array.fill[Short](100)(7))
    (0 until good.length by 7).foreach { cut =>
      assert(WavCodec.decode(good.take(cut)).isEmpty, s"cut=$cut")
    }
    assert(WavCodec.decode(good ++ Array[Byte](1)).isEmpty)   // trailing junk
    assert(WavCodec.decode(good ++ good).isEmpty)             // concatenated
  }
}
