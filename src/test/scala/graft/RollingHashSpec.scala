package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  private def naive(s: String, w: Int): Seq[Long] = {
    val B = 256L; val M = 1000000007L
    (0 to s.length - w).map { i =>
      s.substring(i, i + w).foldLeft(0L)((h, c) => (h * B + c) % M)
    }
  }

  test("rolling update matches naive per-window recomputation") {
    val s = "the quick brown fox jumps over the lazy dog again and again"
    val got = graft.functions.RollingHash.hashes(UTF8String.fromString(s), 8)
      .toLongArray().toSeq
    assert(got === naive(s, 8))
  }

  test("rolling_hash resolves as a SQL function through the extension") {
    val n = spark.sql("SELECT size(rolling_hash('abcdefghij', 4)) n").as[Int].head()
    assert(n === 7)
  }

  test("chunkOverlap finds docs sharing a copied passage") {
    val passage = "this exact passage was copied verbatim between the two documents"
    val docs = Seq(
      (0L, s"first document unique preamble $passage and a unique ending", "en", "s0"),
      (1L, s"totally different start here $passage with other trailing words", "en", "s0"),
      (2L, "nothing in common with the others at all in this text body", "en", "s0")
    ).toDF("doc_id", "text", "lang", "source")
    val pairs = Dedup.chunkOverlap(docs, window = 32, minShared = 10L)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.toSeq === Seq((0L, 1L)))
  }
}
