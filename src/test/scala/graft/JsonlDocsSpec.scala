package graft

import org.apache.spark.sql.functions._
import graft.sources.JsonlDocs

class JsonlDocsSpec extends SparkSpec {

  private def writeLines(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl")
    java.nio.file.Files.write(dir.resolve("part-0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  test("jsonl ingress splits valid docs from dead letters without losing either") {
    val path = writeLines(Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web", "n_chars": 11}""",
      """{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "web", "n_chars": 7}""",
      """{"doc_id": 3, "text": "truncated""", // malformed JSON
      """not json at all""",
      """{"doc_id": null, "text": "orphan"}""", // structurally dead: no id
      """{"doc_id": 4, "lang": "en"}""")) // structurally dead: no text
    val (valid, dead) = JsonlDocs.readSplit(spark, path)
    assert(valid.count() === 2)
    assert(valid.columns.toSeq ===
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    assert(valid.select(col("doc_id")).collect().map(_.getLong(0)).toSet ===
      Set(1L, 2L))
    // every input line lands on exactly one side
    assert(dead.count() === 4)
    // parse failures keep the raw line for the audit sink
    val raws = dead.collect().map(_.getString(0))
    assert(raws.exists(_.contains("not json at all")))
  }

  test("streaming twin applies the identical split") {
    val path = writeLines(Seq(
      """{"doc_id": 10, "text": "stream me", "lang": "en", "source": "s", "n_chars": 9}""",
      """broken line"""))
    val (valid, dead) = JsonlDocs.streamSplit(spark, path)
    assert(valid.isStreaming && dead.isStreaming)
    val snap = graft.streaming.StreamJobs
      .runMemorySnapshot(valid, "graft_jsonl_valid", "append")
    assert(snap.count() === 1)
    assert(snap.select(col("doc_id")).head.getLong(0) === 10L)
  }
}
