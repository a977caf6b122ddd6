package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic float handling for oracle parity.
  *
  * Per-row IEEE double arithmetic is bit-identical between Spark and
  * DuckDB, but `round()` is not: Spark rounds half-up, DuckDB
  * half-even, so values landing exactly on a .00005 boundary diverge.
  * `floor(x·10^d)/10^d` has no tie to break — identical input doubles
  * give identical truncations.
  */
object Det {

  /** Truncate to `d` decimal digits (toward −∞), tie-free. */
  def trunc(c: Column, d: Int): Column = {
    val p = math.pow(10, d)
    floor(c * p) / p
  }

  def trunc4(c: Column): Column = trunc(c, 4)

  /** DuckDB SQL twin of [[trunc]]. */
  def duckTrunc(expr: String, d: Int): String = {
    val p = math.pow(10, d).toLong
    s"floor(($expr) * $p) / $p"
  }

  /** Sign-proof integer division matching the DuckDB oracle.
    *
    * MEASURED (DuckDB 1.0.0, this container): integer `//` TRUNCATES
    * toward zero (`-5 // 2 = -2`), exactly like Spark's `div` — so
    * plain `div` is parity-exact against a plain `//` oracle for ANY
    * sign, and the earlier pmod-floor guard here was the one thing
    * that could break it (it floored the Spark side only, diverging
    * on negative numerators; every caller's numerator was
    * nonnegative, so gates stayed green either way). Callers that
    * genuinely need FLOOR bucketing for negative keys must guard
    * BOTH engine sides symmetrically, as q44 does with its
    * `((x % N) + N) % N` day/hour keys (operators/Round5j.scala).
    */
  def floorDiv(numerator: String, divisor: Long): String =
    s"($numerator) div $divisor"
}
