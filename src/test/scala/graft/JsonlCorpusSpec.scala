package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.sources.JsonlCorpus

class JsonlCorpusSpec extends SparkSpec {
  import spark.implicits._

  private val schema = new StructType()
    .add("doc_id", LongType).add("text", StringType).add("lang", StringType)

  private def writeLines(dir: String, name: String, lines: Seq[String]): String = {
    val p = Paths.get(dir, name)
    Files.write(p, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    p.toString
  }

  test("read: every line lands in exactly one of (typed corpus, quarantine)") {
    val dir = tempDir("graft_jsonl")
    val in = writeLines(dir, "in.jsonl", Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en"}""",
      """{"doc_id": 2, "text": "bonjour", "lang": "fr", "extra": "ignored"}""",
      """not json at all""",
      """{"doc_id": "NaN-ish", "text": "type mismatch on doc_id"}""",
      """{"doc_id": 5, "text": "missing lang is null, not corrupt"}"""))
    val (good, bad) = JsonlCorpus.read(spark, in, schema)
    val g = good.as[(Long, String, Option[String])].collect().sortBy(_._1).toSeq
    assert(g == Seq(
      (1L, "hello world", Some("en")),
      (2L, "bonjour", Some("fr")),
      (5L, "missing lang is null, not corrupt", None)))
    // quarantine carries the raw line for triage
    val q = bad.as[String].collect().sorted.toSeq
    assert(q == Seq(
      """not json at all""",
      """{"doc_id": "NaN-ish", "text": "type mismatch on doc_id"}"""))
  }

  test("toParquet lands typed rows + quarantine sidecar, reports both counts") {
    val dir = tempDir("graft_jsonl_pq")
    val in = writeLines(dir, "in.jsonl", Seq(
      """{"doc_id": 1, "text": "a", "lang": "en"}""",
      """garbage""",
      """{"doc_id": 2, "text": "b", "lang": "de"}"""))
    val out = s"$dir/out"
    val (nGood, nBad) = JsonlCorpus.toParquet(spark, in, out, schema)
    assert((nGood, nBad) == ((2L, 1L)))
    // the main read does NOT see the quarantine (underscore dir is
    // invisible to the parquet reader); the sidecar reads explicitly
    assert(spark.read.parquet(out).count() == 2)
    assert(spark.read.parquet(s"$out/_quarantine").as[String].head() == "garbage")
  }

  test("writeJsonl round-trips through read with stable shard count") {
    val dir = tempDir("graft_jsonl_rt")
    val docs = (1L to 100L).map(i => (i, s"doc $i", "en"))
      .toDF("doc_id", "text", "lang")
    JsonlCorpus.writeJsonl(docs, s"$dir/out", numFiles = 4, orderCol = "doc_id")
    val files = new java.io.File(s"$dir/out").listFiles()
      .filter(f => f.getName.startsWith("part-")).toSeq
    assert(files.size == 4)
    val (back, bad) = JsonlCorpus.read(spark, s"$dir/out", schema)
    assert(bad.isEmpty)
    assert(back.as[(Long, String, String)].collect().sortBy(_._1).toSeq ==
      (1L to 100L).map(i => (i, s"doc $i", "en")).toSeq)
  }

  test("sampleSchema infers from a bounded sample only") {
    val dir = tempDir("graft_jsonl_s")
    val in = writeLines(dir, "in.jsonl",
      (1 to 50).map(i => s"""{"doc_id": $i, "text": "t$i"}"""))
    val s = JsonlCorpus.sampleSchema(spark, in, sampleLines = 10)
    assert(s.fieldNames.toSet == Set("doc_id", "text"))
  }

  test("read refuses a schema that collides with the corrupt column") {
    val badSchema = new StructType().add("__graft_corrupt", StringType)
    val e = intercept[IllegalArgumentException] {
      JsonlCorpus.read(spark, "/nonexistent", badSchema)
    }
    assert(e.getMessage.contains("__graft_corrupt"))
  }
}
