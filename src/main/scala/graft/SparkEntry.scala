package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every implemented operator has a `queries` entry; every SQL-
  * expressible one has a DuckDB `oracleSql` twin with identical
  * aliases/ordering/numeric handling (SURVEY.md §6).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The flagship is the reference's own pipeline end-to-end:
    * EVENT_JSON extraction → validation → kafka-record fanout census
    * (events.rs full path).
    *
    * The caller's session may be bare (no graft configs):
    * events.parquet carries TIMESTAMP(NANOS), which Spark 4 only reads
    * with the legacy nanos-as-long conf — set it here so the flagship
    * runs on any session.
    */
  def entry(spark: SparkSession): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    EventPipeline.queries("ev13_pipeline_e2e")(spark, "/root/testdata/sf0.001")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreAnalytics.queries ++ EventPipeline.queries ++ TextAnalysis.queries ++
      Dedup.queries ++ Similarity.queries ++ Similarity.queries2 ++
      Multimodal.queries ++ Multimodal.queries2 ++ Curation.queries ++
      Round3.queries ++ Round4.queries ++ Round4b.queries ++ Round5.queries ++
      Round5b.queries ++ Round5c.queries ++ Round5d.queries ++ Round5e.queries ++
      Round5f.queries ++ Round5g.queries ++ Round5h.queries ++ Round5i.queries ++ Round5j.queries ++ Round5k.queries ++ Round5l.queries ++ Round5m.queries ++ Round5n.queries ++ Round5o.queries ++ Round5p.queries ++ Round5q.queries ++ Round5r.queries ++ Round5s.queries ++ Round5t.queries ++ Round5u.queries ++ Round6.queries ++ Round6b.queries ++ Round6c.queries ++ Round6d.queries ++ Round6e.queries ++ Round6f.queries ++ Round6g.queries ++ Round6h.queries ++ Round6i.queries ++ Round6j.queries ++ Round6k.queries ++ Round6l.queries ++ Round6m.queries ++ Round6n.queries ++ Round6o.queries ++ Round6p.queries ++ Round6q.queries ++ Round6r.queries ++ Round6s.queries ++ Round6t.queries ++ Round6u.queries ++ Round6v.queries ++ Round6w.queries ++ Round6x.queries ++ Round6y.queries ++ Round6z.queries ++ Round6aa.queries ++ Round6ab.queries ++ Round6ac.queries ++ Round6ad.queries ++ Round6ae.queries ++ Round6af.queries ++ Round6ag.queries ++ Round6ah.queries ++ Round6ai.queries ++ Round6aj.queries ++ Round6ak.queries ++ Round6al.queries ++ Round6am.queries ++ Round6an.queries ++ Round6ao.queries ++ Round6ap.queries ++ Round6aq.queries ++ Round6ar.queries ++ Round6as.queries ++ Round6at.queries ++ Round6au.queries ++ Round6av.queries ++ Round6aw.queries ++ Round6ax.queries ++ Round6ay.queries ++ Round6az.queries ++ Round6ba.queries ++ Round6bb.queries ++ Round6bc.queries ++ Round6bd.queries ++ Round6be.queries ++ Round6bf.queries ++ Round7.queries ++ Round7b.queries ++ Round7c.queries ++ Round7d.queries ++ Round7e.queries ++ Round8.queries ++ Round8b.queries ++ Round8c.queries ++ Round8d.queries ++ Round8e.queries ++ Round8f.queries ++ Round8g.queries ++ Round8h.queries ++ Round8i.queries ++ Round8j.queries ++ Round8k.queries ++ Round8l.queries

  def oracleSql: Map[String, String] =
    CoreAnalytics.oracles ++ EventPipeline.oracles ++ TextAnalysis.oracles ++
      Dedup.oracles ++ Similarity.oracles ++ Similarity.oracles2 ++
      Multimodal.oracles ++ Curation.oracles ++ Round3.oracles ++ Round4.oracles ++
      Round4b.oracles ++ Round5.oracles ++ Round5b.oracles ++ Round5c.oracles ++
      Round5d.oracles ++ Round5e.oracles ++ Round5f.oracles ++ Round5g.oracles ++
      Round5h.oracles ++ Round5i.oracles ++ Round5j.oracles ++ Round5k.oracles ++ Round5l.oracles ++ Round5m.oracles ++ Round5n.oracles ++ Round5o.oracles ++ Round5p.oracles ++ Round5q.oracles ++ Round5r.oracles ++ Round5s.oracles ++ Round5t.oracles ++ Round5u.oracles ++ Round6.oracles ++ Round6b.oracles ++ Round6c.oracles ++ Round6d.oracles ++ Round6e.oracles ++ Round6f.oracles ++ Round6g.oracles ++ Round6h.oracles ++ Round6i.oracles ++ Round6j.oracles ++ Round6k.oracles ++ Round6l.oracles ++ Round6m.oracles ++ Round6n.oracles ++ Round6o.oracles ++ Round6p.oracles ++ Round6q.oracles ++ Round6r.oracles ++ Round6s.oracles ++ Round6t.oracles ++ Round6u.oracles ++ Round6v.oracles ++ Round6w.oracles ++ Round6x.oracles ++ Round6y.oracles ++ Round6z.oracles ++ Round6aa.oracles ++ Round6ab.oracles ++ Round6ac.oracles ++ Round6ad.oracles ++ Round6ae.oracles ++ Round6af.oracles ++ Round6ag.oracles ++ Round6ah.oracles ++ Round6ai.oracles ++ Round6aj.oracles ++ Round6ak.oracles ++ Round6al.oracles ++ Round6am.oracles ++ Round6an.oracles ++ Round6ao.oracles ++ Round6ap.oracles ++ Round6aq.oracles ++ Round6ar.oracles ++ Round6as.oracles ++ Round6at.oracles ++ Round6au.oracles ++ Round6av.oracles ++ Round6aw.oracles ++ Round6ax.oracles ++ Round6ay.oracles ++ Round6az.oracles ++ Round6ba.oracles ++ Round6bb.oracles ++ Round6bc.oracles ++ Round6bd.oracles ++ Round6be.oracles ++ Round6bf.oracles ++ Round7.oracles ++ Round7b.oracles ++ Round7c.oracles ++ Round7d.oracles ++ Round7e.oracles ++ Round8.oracles ++ Round8b.oracles ++ Round8c.oracles ++ Round8d.oracles ++ Round8e.oracles ++ Round8f.oracles ++ Round8g.oracles ++ Round8h.oracles ++ Round8i.oracles ++ Round8j.oracles ++ Round8k.oracles ++ Round8l.oracles
}
