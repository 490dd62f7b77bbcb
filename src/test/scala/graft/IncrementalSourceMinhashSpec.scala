package graft

import java.nio.file.Files

import graft.ops.{Dedup, SourceMinhashIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted per-source MinHash index must min-merge appends into
  * EXACTLY the signature a from-scratch build over the full corpus
  * produces — the mergeability contract q278 estimates with, promoted to
  * an index-maintenance guarantee.
  */
class IncrementalSourceMinhashSpec extends SparkSpec {
  import spark.implicits._

  // real corpus slices so shingle inventories are non-trivial: doc_id is
  // laid out source = doc_id % 20, so split on floor(doc_id/20) parity —
  // every source appears in BOTH batches and the merge actually has to
  // take mins across batches (asserted below)
  private lazy val docs =
    Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"), col("source"))
  private lazy val batch1 = docs.where((col("doc_id") / 20).cast("long") % 2 === 0)
  private lazy val batch2 = docs.where((col("doc_id") / 20).cast("long") % 2 === 1)

  private def sigSet(df: DataFrame): Set[(String, Int, String)] =
    df.select(col("source"), col("salt").cast("int"), col("m"))
      .as[(String, Int, String)].collect().toSet

  test("build + append min-merges to the full-corpus signatures exactly") {
    val path = Files.createTempDirectory("graft-srcmh").resolve("idx").toString
    SourceMinhashIndex.build(batch1, path)
    SourceMinhashIndex.appendDocs(batch2, path)

    val merged = sigSet(SourceMinhashIndex.read(spark, path))
    val full = sigSet(Dedup.sourceSignatures(docs))
    assert(merged === full, "index+append signatures diverge from batch")

    // the split must actually exercise cross-batch merging: some components
    // must come from each batch, and both batches cover every source
    val b1 = sigSet(Dedup.sourceSignatures(batch1))
    val b2 = sigSet(Dedup.sourceSignatures(batch2))
    assert(b1.map(_._1) === full.map(_._1) && b2.map(_._1) === full.map(_._1))
    assert((full -- b1).nonEmpty && (full -- b2).nonEmpty,
      "degenerate split: one batch alone already holds every min")

    // appends stack rows; compaction folds back to one row per component
    // without changing the merged view
    val rawRows = spark.read.parquet(path).count()
    assert(rawRows > merged.size, "append should add rows, not overwrite")
    SourceMinhashIndex.compact(spark, path)
    assert(spark.read.parquet(path).count() === merged.size.toLong)
    assert(sigSet(SourceMinhashIndex.read(spark, path)) === full)
  }

  test("index similarities equal q278's est_j on the full corpus") {
    val path = Files.createTempDirectory("graft-srcmh2").resolve("idx").toString
    SourceMinhashIndex.build(batch1, path)
    SourceMinhashIndex.appendDocs(batch2, path)

    val fromIndex = SourceMinhashIndex.similarities(spark, path)
      .select(col("src_a"), col("src_b"), col("est_j"))
      .as[(String, String, Double)].collect()
      .map { case (a, b, e) => (a, b) -> e }.toMap
    val fromBatch = Dedup.sourceMinhash(docs)
      .select(col("src_a"), col("src_b"), col("est_j"))
      .as[(String, String, Double)].collect()
      .map { case (a, b, e) => (a, b) -> e }.toMap
    // q278 only reports pairs with a non-empty exact intersection; on those
    // the index estimate must agree exactly
    assert(fromBatch.nonEmpty)
    for ((pair, e) <- fromBatch)
      assert(fromIndex(pair) === e, s"pair $pair")
  }
}
