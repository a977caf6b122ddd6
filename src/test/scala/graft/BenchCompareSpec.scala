package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.BenchCompare

/** The bench-regression adjudication rule, pinned (VERDICT r10 #1).
  * The comparator is pure arithmetic, so the gate logic gets tested
  * without running a bench: the r10 evidence cases — phantom
  * sub-second "regressions" that burned a round of manual
  * adjudication — must come out NOISE, and a real out-of-envelope
  * regression must FAIL.
  */
class BenchCompareSpec extends AnyFunSuite {

  private val env = 0.20
  private val minAbs = 0.40

  test("parseQueries reads the map Bench emits") {
    val line = """{"metric":"total","value":12.3,"unit":"sec",""" +
      """"queries":{"q1":0.52,"dd11":4.75,"ev48":2.31},"batch":{"sec":1}}"""
    val q = BenchCompare.parseQueries(line)
    assert(q === Map("q1" -> 0.52, "dd11" -> 4.75, "ev48" -> 2.31))
  }

  test("r10's phantom regressions adjudicate as noise") {
    // q62 0.45→0.74 (1.63x) and tx39 0.31→0.50 (1.62x): ratio is out
    // of envelope but the absolute delta is sub-0.4 s — box noise on
    // untouched sub-second queries, the exact class that wasted r10
    val old = Map("q62" -> 0.45, "tx39" -> 0.31, "dd11" -> 4.75)
    val fresh = Map("q62" -> 0.74, "tx39" -> 0.50, "dd11" -> 5.20)
    val (reg, _, _) = BenchCompare.compare(old, fresh, env, minAbs)
    // dd11 4.75→5.20 is +0.45 s but only 1.09x — inside the envelope
    assert(reg.isEmpty, s"phantoms flagged: $reg")
  }

  test("a real out-of-envelope regression fails") {
    val old = Map("dd33" -> 3.90, "q1" -> 0.50)
    val fresh = Map("dd33" -> 5.50, "q1" -> 0.49)
    val (reg, imp, _) = BenchCompare.compare(old, fresh, env, minAbs)
    assert(reg.map(_.q) === Seq("dd33"))
    assert(imp.isEmpty)
  }

  test("improvements report symmetrically but never fail") {
    val old = Map("ev51" -> 6.81, "ev48" -> 3.67)
    val fresh = Map("ev51" -> 0.85, "ev48" -> 2.31)
    val (reg, imp, _) = BenchCompare.compare(old, fresh, env, minAbs)
    assert(reg.isEmpty)
    assert(imp.map(_.q).toSet === Set("ev51", "ev48"))
  }

  test("declared semantic changes never adjudicate; undeclared still fail") {
    // the r13 q13 case: the query was intentionally restated (native
    // HLL → oracle-exact relational sketch), 0.49→1.18 s — a real
    // delta with no like-for-like baseline
    val old = Map("q13" -> 0.49, "dd33" -> 3.90)
    val fresh = Map("q13" -> 1.18, "dd33" -> 5.50)
    val (reg, _, _) = BenchCompare.compare(old, fresh, env, minAbs)
    val (adjudicable, changed) = BenchCompare.splitChanged(reg, Set("q13"))
    assert(changed.map(_.q) === Seq("q13"), "declared change is set aside")
    assert(adjudicable.map(_.q) === Seq("dd33"),
      "an undeclared regression still adjudicates")
    // and a declared change is not an improvement claim either
    val (_, impD) = BenchCompare.splitChanged(
      BenchCompare.compare(Map("q13" -> 1.18), Map("q13" -> 0.49),
        env, minAbs)._2, Set("q13"))
    assert(impD.map(_.q) === Seq("q13"))
  }

  test("failed samples (-1) adjudicate as invalid, not as wins") {
    val old = Map("q5" -> 1.0)
    val fresh = Map("q5" -> -1.0)
    val (reg, imp, invalid) = BenchCompare.compare(old, fresh, env, minAbs)
    assert(reg.isEmpty && imp.isEmpty)
    assert(invalid === Seq("q5"))
  }

  test("keys only on one side are ignored (new/retired operators)") {
    val old = Map("q1" -> 1.0)
    val fresh = Map("dd46" -> 1.0)
    val (reg, imp, invalid) = BenchCompare.compare(old, fresh, env, minAbs)
    assert(reg.isEmpty && imp.isEmpty && invalid.isEmpty)
  }

  test("envelope probe parses from the lap summary line") {
    val line = """{"metric":"total","value":220.9,"unit":"sec",""" +
      """"queries":{"q1":0.5},"envelope_probe":0.31,"load":[0.7,3.1]}"""
    assert(BenchCompare.parseEnvelopeProbe(line) === Some(0.31))
    assert(BenchCompare.parseEnvelopeProbe("""{"queries":{"q1":0.5}}""")
      === None)
  }

  test("auto envelope: noisy box widens the gate, quiet box keeps the floor") {
    // measured 0.31 > floor -> use the measurement: a 1.25x swing on
    // an untouched query stops flagging on the day the probes
    // themselves swung 1.31x
    val noisy = """{"queries":{"q1":0.5},"envelope_probe":0.31}"""
    assert(BenchCompare.deriveEnvelope(noisy) === 0.31)
    // measured 0.07 < floor -> keep 0.20: a lucky probe run must not
    // tighten the gate below the hand-measured bound
    val quiet = """{"queries":{"q1":0.5},"envelope_probe":0.07}"""
    assert(BenchCompare.deriveEnvelope(quiet) === BenchCompare.EnvelopeFloor)
    // no probe in the lap -> the constant, unchanged behavior
    assert(BenchCompare.deriveEnvelope("""{"queries":{"q1":0.5}}""") ===
      BenchCompare.EnvelopeFloor)
  }

  test("converged recheck dissolves a lap-transient flag (the r12 dd32 case)") {
    // dd32 read 0.56→0.99 in the r12 full lap (1.77x, +0.43 s — both
    // arms tripped) but converged to ~1.1x on the focused SAMPLES=7
    // recheck; the mechanical rule must dissolve it with no human
    val rc = BenchCompare.Recheck("dd32", 0.56, 0.99, 0.62)
    val (confirmed, dissolved) = BenchCompare.adjudicate(Seq(rc), env, minAbs)
    assert(confirmed.isEmpty)
    assert(dissolved.map(_.q) === Seq("dd32"))
  }

  test("converged recheck confirms a regression that re-measures slow") {
    val rc = BenchCompare.Recheck("dd33", 3.90, 5.50, 5.40)
    val (confirmed, dissolved) = BenchCompare.adjudicate(Seq(rc), env, minAbs)
    assert(confirmed.map(_.q) === Seq("dd33"))
    assert(dissolved.isEmpty)
  }

  test("recheck re-applies BOTH envelope arms to the converged value") {
    // converged ratio 1.5x but delta 0.15 s: sub-minAbs — noise
    val subAbs = BenchCompare.Recheck("q62", 0.30, 0.74, 0.45)
    // converged delta 0.9 s but ratio 1.12x: in-envelope — noise
    val subRatio = BenchCompare.Recheck("ss37", 7.50, 10.9, 8.40)
    val (confirmed, dissolved) =
      BenchCompare.adjudicate(Seq(subAbs, subRatio), env, minAbs)
    assert(confirmed.isEmpty)
    assert(dissolved.map(_.q).toSet === Set("q62", "ss37"))
  }

  test("runFocused measures real queries by short id and skips unknown ids") {
    // the integration leg of the mechanical path: a tiny-sf focused
    // recheck must return a positive converged time for a real query
    // and silently omit an id that matches no SparkEntry entry
    val out = BenchCompare.runFocused("/root/testdata/sf0.001",
      Seq("q02", "zz99"), samples = 2, warmupMs = 0L)
    assert(out.keySet === Set("q02"))
    assert(out("q02") > 0.0)
  }

  test("the derived envelope adjudicates the r11 warmup-class phantoms") {
    // the r11 first mechanical lap flagged 10 early-alphabet queries
    // at ~1.3-1.5x before the warmup floor landed; on such a day the
    // probes spread ~1.45x -> derived envelope 0.45 absorbs the class
    val fresh = Map("dd08" -> 4.9, "q1" -> 0.9)
    val old = Map("dd08" -> 3.45, "q1" -> 0.85)
    val envAuto = BenchCompare.deriveEnvelope(
      """{"queries":{"dd08":4.9},"envelope_probe":0.45}""")
    val (reg, _, _) = BenchCompare.compare(old, fresh, envAuto, minAbs)
    assert(reg.isEmpty)
    // the same diff under the bare floor WOULD flag — the probe is
    // what tells the two days apart
    val (regFloor, _, _) = BenchCompare.compare(old, fresh, 0.20, minAbs)
    assert(regFloor.map(_.q) === Seq("dd08"))
  }
}
