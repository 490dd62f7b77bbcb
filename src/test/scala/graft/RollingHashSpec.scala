package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  private def naive(s: String, w: Int): Seq[Long] = {
    val B1 = 256L; val M1 = 1000000007L
    val B2 = 131L; val M2 = 998244353L
    (0 to s.length - w).map { i =>
      val win = s.substring(i, i + w)
      val h1 = win.foldLeft(0L)((h, c) => (h * B1 + c) % M1)
      val h2 = win.foldLeft(0L)((h, c) => (h * B2 + c) % M2)
      (h1 << 31) + h2
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

  test("chunkOverlap DF cap drops corpus boilerplate from the join") {
    // every doc carries the same boilerplate header — without a document-
    // frequency cap the self-join would produce all C(n,2) pairs on the
    // header's window hashes; with the cap those hashes never enter the join
    val boiler = "standard license header text appearing identically in every single document of the corpus"
    val docs = (0L until 12L).map { i =>
      (i, s"$boiler unique body $i with enough distinct words ${i * 7}", "en", "s0")
    }.toDF("doc_id", "text", "lang", "source")
    val uncapped = Dedup.chunkOverlap(docs, window = 32, minShared = 10L, maxDf = 1000).count()
    val capped = Dedup.chunkOverlap(docs, window = 32, minShared = 10L, maxDf = 8).count()
    assert(uncapped === 12L * 11L / 2) // boilerplate pairs everything with everything
    assert(capped === 0L)              // capped: boilerplate carries no signal
  }
}
