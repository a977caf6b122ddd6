package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The tuned-session layer: the round-11 choosers DECIDE the scale
  * dials (q82 shuffle partitions, dd46 band geometry, q81 salt
  * factor, ev82 watermark delay) — this object APPLIES them, closing
  * the last gap between "the plan you'd want at 100×" and the plan
  * the session actually runs (VERDICT r11, next-round #1).
  *
  * Posture: every pick is pure arithmetic over a bounded, oracle-gated
  * census (4 one-row table aggregates for q82; dd45's 3-row occupancy
  * sweep for dd46; two hash aggregates for q81; the histogram-folded
  * lateness census for ev82), so `session()` costs a handful of small
  * jobs — run it ONCE at startup against the corpus the job will
  * read, exactly like a cluster's init action. The picks are the same
  * frames the gated operators emit; nothing here re-derives a rule.
  *
  * Scale contract (spec-pinned in TunedSpec):
  *  - on the gated SFs the picks reproduce the oracle-default dials
  *    (32 partitions, 4-bit bands), so applying them can never flip a
  *    gated result;
  *  - on the sf10 ladder censuses they reproduce the hand-measured
  *    dials that fixed the r10 scale cliffs (128/192 partitions,
  *    16-bit bands) — the engine now sets what the ladder taught us.
  */
object Tuned {

  /** The dials a tuned session sets, plus the per-type decisions a
    * caller applies at operator level (salt to [[Skew.saltedJoin]],
    * delay to `withWatermark`).
    */
  final case class Picks(
      shuffleParts: Long,
      bandBits: Int,
      saltByType: Map[String, Long],
      watermarkDelaySByType: Map[String, Long]) {
    /** A single stream's global watermark must cover every type it
      * carries — the max of the per-type picks. */
    def watermarkDelayS: Long =
      if (watermarkDelaySByType.isEmpty) Round11.WatermarkDialS.head
      else watermarkDelaySByType.values.max
    /** `withWatermark`-ready form of [[watermarkDelayS]]. */
    def watermark: String = s"$watermarkDelayS seconds"
  }

  // --- pick extraction: chooser frame -> the decision ------------------
  // Factored over the census frames (not the corpus) so specs can feed
  // the MEASURED sf10 ladder censuses and pin the hand-dialed values
  // without re-running the ladder.

  /** q82's decision from its chooser frame: the chosen partition
    * count. Bounded collect (|dial| rows). */
  def pickParts(census: DataFrame): Long =
    Round11.partitionAutopick(census)
      .filter(col("chosen") === 1L).select(col("parts")).head().getLong(0)

  /** dd46's decision from its chooser frame: the chosen band width.
    * Bounded collect (|DialBits| rows). */
  def pickBits(census: DataFrame, nCorpus: DataFrame): Int =
    Round11.bandAutopick(census, nCorpus)
      .filter(col("chosen") === 1L)
      .select(col("band_bits")).head().getLong(0).toInt

  /** q81's per-type decision: event_type -> salt factor. Bounded
    * collect (|types| rows). */
  def pickSalts(census: DataFrame): Map[String, Long] =
    Round11.saltAutopick(census)
      .filter(col("chosen") === 1L)
      .select(col("event_type"), col("salt")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  /** ev82's per-type decision: event_type -> watermark delay seconds.
    * Bounded collect (|types| rows). */
  def pickWatermarks(census: DataFrame): Map[String, Long] =
    Round11.watermarkAutopick(census)
      .filter(col("chosen") === 1L)
      .select(col("event_type"), col("delay_s")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  // --- corpus-level API --------------------------------------------------

  /** Compute every pick for a corpus (the bounded censuses run here —
    * a few small jobs, once per session). */
  def picks(s: SparkSession, d: String): Picks = {
    val p = Picks(
      shuffleParts = pickParts(Round11.tableByteCensus(s, d)),
      bandBits = pickBits(Round10.bandDensityCensus(s, d),
        Round11.corpusCount(s, d)),
      saltByType = pickSalts(Round11.skewCensus(s, d)),
      watermarkDelaySByType = pickWatermarks(Round11.latenessCensus(s, d)))
    // every pick is a driver-side value now: release the censuses'
    // barrier frames so the job that follows starts with a clean
    // cache slot and full storage memory (the r12 diag measured a
    // decaying first-sample transient on the next heavy query after
    // census work; lingering persists are the part we can clean)
    Dedup.releaseBarriers()
    p
  }

  /** q81's salt for one fact/type, ready for [[Skew.saltedJoin]]'s
    * `salt` argument; falls back to 1 (no salting) for types the
    * census never saw — an unknown key can't be a measured hot key.
    */
  def autoSalt(picks: Picks, eventType: String): Int =
    picks.saltByType.getOrElse(eventType, 1L).toInt

  // --- per-type dial plumbing (VERDICT r12 #2) -------------------------
  // The session-level picks flow through runtime confs (the q82/dd46
  // pattern); the PER-TYPE picks do too, serialized as "type:value,…"
  // so operator code — which only sees (SparkSession, dir) — can apply
  // them where it joins/streams. Unset confs = untuned behavior, so
  // oracle laps are untouched.

  /** Conf carrying q81's per-type salt picks ("click:8,view:1"). */
  val SaltConf = "spark.graft.salt.byType"
  /** Conf carrying ev82's per-type watermark-delay picks (seconds). */
  val WatermarkConf = "spark.graft.stream.watermarkByType"

  def fmtTypeMap(m: Map[String, Long]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => s"$k:$v" }.mkString(",")

  def parseTypeMap(v: String): Map[String, Long] =
    v.split(",").iterator.map(_.trim).filter(_.nonEmpty).flatMap { kv =>
      kv.split(":") match {
        case Array(k, n) => scala.util.Try(k -> n.trim.toLong).toOption
        case _ => None
      }
    }.toMap

  /** The tuned per-type salt map from the session conf; empty when
    * the session is untuned ([[Skew.autoSaltedJoin]] consumers fall
    * back to their static salt). */
  def confSaltByType(s: SparkSession): Map[String, Long] =
    s.conf.getOption(SaltConf).map(parseTypeMap).getOrElse(Map.empty)

  /** The tuned watermark delay for one event type, `withWatermark`-
    * ready; `default` when the session is untuned or the type is
    * unseen. The per-type pick is ev82's measured disorder bound, so
    * a tuned stream holds exactly the state its type's lateness
    * requires instead of a folklore constant. */
  def confWatermarkFor(s: SparkSession, eventType: String,
      default: String): String =
    s.conf.getOption(WatermarkConf).map(parseTypeMap).getOrElse(Map.empty)
      .get(eventType).map(sec => s"$sec seconds").getOrElse(default)

  /** Apply the session-level picks: spark.sql.shuffle.partitions
    * (q82) and spark.graft.emb.bandBits (dd46) — both runtime confs,
    * read by every subsequent plan (Dedup.embCandidates validates the
    * bandBits against [[Dedup.DialBits]] at read time).
    * Returns the full Picks so callers can ALSO apply the per-
    * operator decisions (salt, watermark) where they join/stream.
    *
    * On a cluster this is the init action after the first corpus
    * mount; the gated-SF contract (TunedSpec) is that these sets are
    * identity on oracle-gated runs, so tuning can never flip a gate.
    */
  def session(s: SparkSession, d: String): Picks = {
    val p = picks(s, d)
    s.conf.set("spark.sql.shuffle.partitions", p.shuffleParts.toString)
    s.conf.set("spark.graft.emb.bandBits", p.bandBits.toString)
    // the per-type dials ride the same conf channel so operator-level
    // consumers (q27's auto-salted join, ev49's per-side watermarks)
    // apply them without a side-channel (VERDICT r12 #2)
    s.conf.set(SaltConf, fmtTypeMap(p.saltByType))
    s.conf.set(WatermarkConf, fmtTypeMap(p.watermarkDelaySByType))
    p
  }
}
