package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._

/** PII detection + redaction on constructed documents with known entity
  * placements — the operator the q88 census aggregates.
  */
class PiiScrubSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "s0", "reach me at jane.doe+spam@mail.example.org or 555-0199 thanks"),
    (2L, "s0", "host 10.42.7.255 and backup 10.0.0.1 no phone here"),
    (3L, "s1", "plain text with nothing sensitive at all"),
    (4L, "s1", "double contact a@b.io c.d@e.co and 555-1234 555-9999 on 10.1.2.3")
  ).toDF("doc_id", "source", "text")

  test("counts every entity and the redacted text has no residual match") {
    val got = TextAnalysis.piiScrub(docs)
      .select("doc_id", "n_emails", "n_phones", "n_ips", "clean")
      .as[(Long, Int, Int, Int, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, 1, 1, 0, true),
      (2L, 0, 0, 2, true),
      (3L, 0, 0, 0, true),
      (4L, 2, 2, 1, true)))
  }

  test("redaction shortens exactly by match length minus placeholder length") {
    // doc 3 has no matches: zero delta, text untouched by construction
    val deltas = TextAnalysis.piiScrub(docs)
      .select("doc_id", "chars_removed").as[(Long, Int)].collect().toMap
    assert(deltas(3L) === 0)
    // doc 1: email 30 chars -> <EMAIL>(7): -23; phone 8 -> <PHONE>(7): -1
    assert(deltas(1L) === 24)
  }

  test("the scrub plan is map-only — no shuffle exchange") {
    val plan = TextAnalysis.piiScrub(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("census totals roll up the per-doc counts per source") {
    val seeded = docs // census seeds its own PII; run on the documents shape
      .withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")))
    val got = TextAnalysis.piiScrubCensus(seeded)
      .select("source", "n_docs", "emails", "phones", "ips", "n_residual")
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // every doc gains exactly one injected email+phone+ip on top of its own:
    // s0 = doc1 (1 email, 1 phone) + doc2 (2 ips) + 2 injections of each
    // s1 = doc3 (nothing) + doc4 (2 emails, 2 phones, 1 ip) + 2 of each
    assert(got.toSeq === Seq(
      ("s0", 2L, 3L, 3L, 4L, 0L),
      ("s1", 2L, 4L, 4L, 3L, 0L)))
  }
}
