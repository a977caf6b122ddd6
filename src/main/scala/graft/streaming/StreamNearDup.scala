package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.Dedup

/** Streaming NEAR-duplicate detection — the ingest-time twin of the
  * batch dd07 banded-simhash join, for pipelines that must reject a
  * near-dup the moment it arrives instead of in a nightly batch pass.
  *
  * Shape: each document fans out to its [[Dedup.SimhashBands]] band
  * keys (the same 4×15-bit disjoint layout dd07 joins on and dd17
  * audits), state lives PER BAND-BUCKET, and a new arrival compares
  * only against its bucket's retained signatures — the streaming
  * equivalent of the bucket equi-join, never all-pairs. Pigeonhole
  * exactness carries over: hamming ≤ 3 across 4 disjoint bands
  * leaves one band clean, so every qualifying prior doc shares at
  * least one bucket with the arrival.
  *
  * State bound: each bucket retains the `maxPerBucket` NEWEST
  * (doc_id, simhash) pairs — total state is
  * O(bands × occupied_buckets × maxPerBucket), independent of stream
  * length. The dial is measurable, not guessed: dd17's occupancy
  * audit reports real per-bucket occupancy for a corpus, and a bucket
  * that stays under `maxPerBucket` loses NOTHING vs the batch join
  * (StreamStateSpec pins this equivalence on random streams; the
  * capped case drops only matches against evicted — oldest —
  * signatures, the documented recall trade of any bounded-state
  * dedup).
  *
  * The same unordered pair can match in up to 4 bands, so the hit
  * stream carries `band` and emits per-band hits; consumers dedup
  * with a batch `dropDuplicates(doc_id, dup_of)` in their foreachBatch
  * (a streaming-native dropDuplicates would need its own watermarked
  * state for what is already a tiny frame per micro-batch).
  */
object StreamNearDup {

  /** @param seq arrival order — decisions are made against docs with
    *            strictly smaller seq (the "earlier doc keeps" rule).
    */
  final case class DocSig(doc_id: Long, seq: Long, simhash: Long)
  final case class BandRow(band: Int, bval: Long, doc_id: Long, seq: Long, simhash: Long)
  final case class BucketState(recent: List[(Long, Long)]) // (doc_id, simhash), newest FIRST
  final case class Hit(doc_id: Long, dup_of: Long, band: Int, hamming: Int)

  /** Fan a signature stream out to its band keys. Pure column work —
    * runs identically under batch and streaming.
    */
  def banded(docs: Dataset[DocSig]): Dataset[BandRow] = {
    implicit val enc: Encoder[BandRow] = Encoders.product[BandRow]
    import org.apache.spark.sql.functions._
    docs.select(
        posexplode(array((0 until Dedup.SimhashBands).map(b =>
          shiftright(col("simhash"), b * Dedup.SimhashBandBits)
            .bitwiseAND(Dedup.SimhashBandMask)): _*)).as(Seq("band", "bval")),
        col("doc_id"), col("seq"), col("simhash"))
      .as[BandRow]
  }

  /** Per-bucket stateful matching: each arrival emits one [[Hit]] per
    * retained bucket member within `maxHamming`, then joins the
    * bucket's retained set itself. Within a batch, rows apply in
    * `seq` order, so same-batch pairs resolve exactly like
    * cross-batch ones — the property StreamStateSpec pins.
    */
  def hits(rows: Dataset[BandRow], maxPerBucket: Int = 64,
      maxHamming: Int = 3): Dataset[Hit] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(r => (r.band, r.bval))
      .flatMapGroupsWithState[BucketState, Hit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Int, Long), it: Iterator[BandRow], state: GroupState[BucketState]) =>
          var recent = state.getOption.map(_.recent).getOrElse(Nil)
          val out = scala.collection.mutable.ListBuffer[Hit]()
          it.toSeq.sortBy(_.seq).foreach { r =>
            recent.foreach { case (id, sh) =>
              val d = java.lang.Long.bitCount(r.simhash ^ sh)
              if (d <= maxHamming) out += Hit(r.doc_id, id, key._1, d)
            }
            recent = ((r.doc_id, r.simhash) :: recent).take(maxPerBucket)
          }
          state.update(BucketState(recent))
          out.iterator
      }
  }

  /** banded + hits in one call — the deployable operator. */
  def nearDup(docs: Dataset[DocSig], maxPerBucket: Int = 64,
      maxHamming: Int = 3): Dataset[Hit] =
    hits(banded(docs), maxPerBucket, maxHamming)
}
