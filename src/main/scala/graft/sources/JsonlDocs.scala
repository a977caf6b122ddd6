package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL document ingress with corrupt-line dead-lettering.
  *
  * Real corpus drops arrive as newline-delimited JSON with a long
  * tail of malformed lines (truncated writes, encoding damage, schema
  * drift). The scalable posture is the reference's dead-letter split
  * (events.rs:310-340 logs-and-drops invalid events; ev16 routes them
  * to a sink): parse PERMISSIVE with an explicit schema — never
  * inferSchema, which double-scans and lets one bad file reshape the
  * corpus — capture failures in `_corrupt_record`, and hand back
  * (valid, dead) frames so the bad lines are auditable instead of
  * silently nulled. Works identically under `read` and `readStream`
  * (same schema, same split predicate).
  */
object JsonlDocs {

  /** documents-table schema + the corrupt-record capture column. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("_corrupt_record", StringType)))

  /** A row is dead when parsing failed (corrupt capture non-null) or
    * the payload is structurally unusable (no id or no text). The
    * predicate is shared by batch and streaming so the split can
    * never diverge between them.
    */
  private val isDead =
    col("_corrupt_record").isNotNull ||
      col("doc_id").isNull || col("text").isNull

  private def reader(s: SparkSession) =
    s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")

  /** Batch read → (valid docs, dead letters). Valid rows drop the
    * capture column; dead rows keep the raw line for the audit sink.
    */
  def readSplit(s: SparkSession, path: String): (DataFrame, DataFrame) = {
    // one parsed frame, two filters — the JSON parse runs in the scan
    // and both branches push their predicate onto it
    val parsed = reader(s).json(path)
    (parsed.filter(!isDead).drop("_corrupt_record"),
      parsed.filter(isDead)
        .select(coalesce(col("_corrupt_record"), to_json(struct(
          col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars")))).as("raw_line")))
  }

  /** Streaming twin: same schema, same split. */
  def streamSplit(s: SparkSession, path: String): (DataFrame, DataFrame) = {
    val parsed = s.readStream.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
    (parsed.filter(!isDead).drop("_corrupt_record"), parsed.filter(isDead))
  }
}
