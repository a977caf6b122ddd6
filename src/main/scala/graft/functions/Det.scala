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

  /** FLOOR division on the integer domain, sign-proof.
    *
    * Spark's `div` truncates toward zero while DuckDB's `//` floors,
    * so the two disagree on any negative numerator (e.g. a pre-epoch
    * timestamp in regenerated testdata). Subtracting `pmod` makes the
    * numerator exactly divisible, so `div` IS floor for any sign —
    * the q34 recipe (operators/Round4b.scala), shared so every epoch
    * day/hour/minute key uses the same guarded form.
    */
  def floorDiv(numerator: String, divisor: Long): String =
    s"(($numerator) - pmod($numerator, $divisor)) div $divisor"
}
