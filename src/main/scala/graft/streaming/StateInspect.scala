package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Offline state-store inspection via Spark 4's state data source —
  * the operability half of the stateful lane: read a checkpoint's
  * state as a DataFrame, no stream restart, no code in the job being
  * inspected.
  *
  * Why this matters at 100 TB: when a production stream misbehaves
  * (watermark stuck, state ballooning, one key poisoned), the ev62/
  * ev75 sizing models say how big state SHOULD be — this answers what
  * it actually IS, per key, from the durable checkpoint, while the
  * job keeps running. The same reader is the migration path between
  * state engines: dump v1 (flatMapGroupsWithState) state, transform,
  * feed to a v2 processor via transformWithState's initial-state
  * overload.
  *
  * Both formats ship registered in the pinned Spark
  * (META-INF/services DataSourceRegister: StateMetadataSource,
  * StateDataSource); StateInspectSpec drives them against real
  * checkpoints from both state engines.
  */
object StateInspect {

  /** The checkpoint's stateful-operator catalog (operator ids/names,
    * partition counts, batch id range) — `state-metadata` format.
    * The entry point: run this first to learn the operatorId /
    * state-variable names the [[state]] reader needs.
    */
  def metadata(s: SparkSession, checkpoint: String): DataFrame =
    s.read.format("state-metadata").load(checkpoint)

  /** One operator's state rows (`statestore` format): `key` /
    * `value` structs (schema = the job's own state encoders) plus
    * `partition_id`. `stateVar` selects a transformWithState state
    * variable (v2 jobs can hold several per operator); v1 operators
    * have a single implicit variable and omit it. `batchId` time-
    * travels to an earlier retained snapshot (default: latest
    * committed batch).
    */
  def state(s: SparkSession, checkpoint: String,
      operatorId: Long = 0L,
      stateVar: Option[String] = None,
      batchId: Option[Long] = None): DataFrame = {
    var r = s.read.format("statestore")
      .option("operatorId", operatorId.toString)
    stateVar.foreach(v => r = r.option("stateVarName", v))
    batchId.foreach(b => r = r.option("batchId", b.toString))
    r.load(checkpoint)
  }
}
