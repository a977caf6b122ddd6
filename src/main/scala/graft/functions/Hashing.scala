package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic hashing shared with the DuckDB oracle.
  *
  * The driver verifies every query against DuckDB, so any
  * hash-dependent operator (fingerprints, MinHash, SimHash, LSH
  * banding) must use a hash BOTH engines compute identically. md5 is
  * the common denominator: Spark `conv(substr(md5(x),1,15),16,10)` and
  * DuckDB `CAST('0x'||substr(md5(x),1,15) AS BIGINT)` yield the same
  * non-negative 60-bit value.
  *
  * At 100 TB this stays fully distributed and codegen'd (md5/conv are
  * native Catalyst expressions) — no UDFs, no driver round-trips.
  */
object Hashing {

  /** MinHash family geometry — canonical home (the native
    * [[MinhashSigExpr]] and [[graft.operators.Dedup]] both read
    * these; Dedup re-exports them under its historical names).
    * Coefficients are fixed (deterministic in k) and small enough
    * that a·h32+b < 2^52 never overflows; P is the smallest prime
    * > 2^32.
    */
  val MinhashK = 16
  val MinhashP = 4294967311L
  val MinhashA: IndexedSeq[Long] =
    (0 until MinhashK).map(k => (k * 2654435761L + 12345L) % 1048573L + 1L)
  val MinhashB: IndexedSeq[Long] =
    (0 until MinhashK).map(k => (k * 40503L + 9973L) % 1048573L)

  /** 60-bit deterministic hash of a string column (non-negative). */
  def hash64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Seeded variant: independent hash families for MinHash — seed is
    * mixed into the input, mirroring `hash64(seed || '|' || x)`.
    */
  def hash64Seeded(c: Column, seed: Int): Column =
    hash64(concat_ws("|", lit(seed.toString), c))

  /** DuckDB SQL fragment equivalent of [[hash64]] for oracle authoring. */
  def duckHash64(expr: String): String =
    s"CAST('0x' || substr(md5($expr), 1, 15) AS BIGINT)"

  def duckHash64Seeded(expr: String, seed: Int): String =
    duckHash64(s"concat_ws('|', '$seed', $expr)")

  /** Karp-Rabin base/modulus for fixed-width gram hashing. M is prime
    * and < 2^28, B < 2^8, so every Horner step `acc*B + cp` stays
    * under 2^36 — overflow-free in BIGINT on BOTH engines (DuckDB
    * raises on signed overflow, so the headroom is load-bearing).
    */
  val KrB = 131L
  val KrM = 268435399L

  /** Karp-Rabin hash of the 8-char gram at 1-based offset `i + 1` of
    * the document whose codepoints are precomputed in array column
    * `cps`. Pure modular arithmetic — ~8 codegen'd multiply-adds per
    * gram where the md5 path pays a digest + hex parse per gram; this
    * is the winnowing hot loop at corpus scale.
    */
  def kr8(cps: Column, i: Column): Column =
    (0 until 8).foldLeft(lit(0L): Column) { (acc, k) =>
      (acc * lit(KrB) + element_at(cps, i + lit(k + 1))) % lit(KrM)
    }

  /** DuckDB fragment equivalent of [[kr8]]: `cps` names a BIGINT list
    * column (1-based), `i` the 0-based gram start expression.
    */
  def duckKr8(cps: String, i: String): String =
    (0 until 8).foldLeft("CAST(0 AS BIGINT)") { (acc, k) =>
      s"(($acc * $KrB + $cps[$i + ${k + 1}]) % $KrM)"
    }

  /** Karp-Rabin modulus for folding 60-bit TOKEN HASHES (vs [[KrM]]'s
    * codepoint domain): the largest prime < 2^55, so every Horner step
    * `acc*B + th` is at most (2^55)·131 + 2^60 < 2^63 — overflow-free
    * in checked BIGINT arithmetic on both engines while keeping a
    * 55-bit hash space (window-collision probability ~n²/2^56).
    */
  val KrTokM = 36028797018963913L

  /** Karp-Rabin hash of the `w`-token window at 0-based offset `i` of
    * the document whose per-token [[hash64]] values are precomputed in
    * array column `ths`. One md5 per TOKEN (shared by every window
    * containing it) + w codegen'd multiply-adds per window — the
    * md5-per-window variant this replaces paid a digest + hex parse at
    * every token position.
    */
  def krTok(ths: Column, i: Column, w: Int): Column =
    (0 until w).foldLeft(lit(0L): Column) { (acc, k) =>
      (acc * lit(KrB) + element_at(ths, i + lit(k + 1))) % lit(KrTokM)
    }

  /** DuckDB fragment equivalent of [[krTok]]: `ths` names a BIGINT
    * list column (1-based), `i` the 0-based window start expression.
    */
  def duckKrTok(ths: String, i: String, w: Int): String =
    (0 until w).foldLeft("CAST(0 AS BIGINT)") { (acc, k) =>
      s"(($acc * $KrB + $ths[$i + ${k + 1}]) % $KrTokM)"
    }
}
