package graft

import org.scalatest.funsuite.AnyFunSuite

/** Operator-index drift gate (VERDICT r10 #4): docs/OPERATORS.md is
  * generated from the sources, and round 10 shipped it 3 pointers
  * stale because a late commit shifted lines after generation. Same
  * discipline as ShuffleBudgetSpec — the committed index must match a
  * fresh regeneration, so any source edit that moves an operator
  * fails the suite until the index is regenerated in the same commit.
  */
class OperatorIndexSpec extends AnyFunSuite {

  private val IndexPath = java.nio.file.Paths.get("docs/OPERATORS.md")

  private def check(): (Int, String) = {
    val p = new ProcessBuilder("python3", "tools/gen_operator_index.py", "--check")
      .directory(new java.io.File("."))
      .redirectErrorStream(true)
      .start()
    val src = scala.io.Source.fromInputStream(p.getInputStream, "UTF-8")
    val out = try src.mkString finally src.close()
    (p.waitFor(), out)
  }

  test("docs/OPERATORS.md matches a fresh regeneration") {
    assume(new java.io.File("tools/gen_operator_index.py").exists())
    val (rc, out) = check()
    assert(rc === 0, s"operator index drifted:\n$out")
  }

  test("positive control: --check fails on a stale index") {
    // perturb one committed pointer, prove the gate sees it, restore.
    // Within-suite tests run sequentially and no other suite touches
    // the file, so the perturbation window is race-free.
    val committed = java.nio.file.Files.readString(IndexPath)
    val perturbed = committed.replaceFirst(
      "\\.scala:(\\d+) \\|", ".scala:999999 |")
    assert(perturbed != committed, "no pointer found to perturb")
    try {
      java.nio.file.Files.writeString(IndexPath, perturbed)
      val (rc, out) = check()
      assert(rc === 1, s"gate missed a perturbed pointer:\n$out")
      assert(out.contains("stale"))
    } finally java.nio.file.Files.writeString(IndexPath, committed)
  }
}
