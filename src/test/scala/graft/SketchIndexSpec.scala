package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ops.SketchIndex

/** Incremental HLL index: building on the full corpus and building on a
  * prefix then appending the rest must yield BIT-identical estimates (HLL
  * union is associative/commutative/idempotent on the register state), and
  * the estimate must match a direct hll_sketch_agg over the whole corpus.
  */
class SketchIndexSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("kmvSketch: ordered 16-value fingerprint, estimate in the k=16 error band") {
    val rows = graft.ops.Sketches
      .kmvSketch(Tables.documents(spark, sfDir), k = 16)
      .orderBy(col("rank"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === 16)
    assert(rows.map(_._1).toSeq === (1 to 16))
    // minima are sorted and live in [0, 2^48)
    val hs = rows.map(_._2)
    assert(hs.zip(hs.tail).forall { case (a, b) => a < b })
    assert(hs.head >= 0L && hs.last < (1L << 48))
    // unbiased KMV estimator: SE ≈ 1/√(k−2) ≈ 27%; 3× is a safe fence
    val (est, exact) = (rows.head._3, rows.head._4)
    assert(est > exact / 3 && est < exact * 3, s"est $est vs exact $exact")
    assert(rows.forall(r => r._3 == est && r._4 == exact))
  }

  private def estMap(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("sketchResemblance: complete sketches (k ≥ |union|) recover exact Jaccard") {
    import spark.implicits._
    // src0 (even side) and src1 (odd side) share exactly the shingles
    // {"a b c","b c d"}: inter 2, union 6 → J = 1/3; with k=16 > 6 the
    // KMV union holds EVERY hash, so the estimate is exact
    val docs = Seq(
      (0L, "a b c d e f", "en", "src0", 0L),
      (1L, "a b c d x y", "en", "src1", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = graft.ops.Sketches.sketchResemblance(docs, k = 16)
      .select("n_a", "n_b", "est_jaccard", "exact_jaccard")
      .as[(Long, Long, Double, Double)].head()
    assert(r._1 === 4L && r._2 === 4L)
    assert(r._3 === r._4)
    assert(math.abs(r._4 - 1.0 / 3) < 1e-5)

    // disjoint vocabularies → both estimates are 0
    val disjoint = Seq(
      (0L, "a b c d", "en", "src0", 0L),
      (1L, "p q r s", "en", "src1", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val z = graft.ops.Sketches.sketchResemblance(disjoint, k = 16)
      .select("est_jaccard", "exact_jaccard").as[(Double, Double)].head()
    assert(z === ((0.0, 0.0)))
  }

  test("build+append ≡ full rebuild, and matches a direct corpus sketch") {
    val docs = Tables.documents(spark, sfDir)
    val part1 = docs.where(col("doc_id") % 3 =!= 0)
    val part2 = docs.where(col("doc_id") % 3 === 0)

    val full = Files.createTempDirectory("hllfull").toString
    val incr = Files.createTempDirectory("hllincr").toString
    SketchIndex.build(docs, full)
    SketchIndex.build(part1, incr)
    SketchIndex.appendDocs(part2, incr)

    val a = estMap(SketchIndex.estimates(spark, full))
    val b = estMap(SketchIndex.estimates(spark, incr))
    assert(a.keySet == b.keySet)
    for ((k, v) <- a) assert(b(k) == v, s"estimate drift for $k")

    // direct one-shot sketch over the corpus — same estimates
    val direct = docs
      .select(col("source"),
        explode(split(graft.ops.Dedup.normText(col("text")), " ")).as("tok"))
      .groupBy(col("source"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(tok, 12))")
        .as("distinct_tokens_est"))
    val c = estMap(direct)
    for ((k, v) <- a) assert(c(k) == v, s"direct-sketch drift for $k")

    // estimates are sane: within 5% of exact distinct counts
    val exact = docs
      .select(col("source"),
        explode(split(graft.ops.Dedup.normText(col("text")), " ")).as("tok"))
      .groupBy(col("source")).agg(countDistinct(col("tok")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((k, v) <- a)
      assert(math.abs(v.toDouble - exact(k)) / exact(k) < 0.05,
        s"$k estimate $v vs exact ${exact(k)}")
  }

  test("compact folds appends to one row per source, same estimates") {
    val docs = Tables.documents(spark, sfDir)
    val idx = Files.createTempDirectory("hllcomp").toString
    SketchIndex.build(docs.where(col("doc_id") % 2 === 0), idx)
    SketchIndex.appendDocs(docs.where(col("doc_id") % 2 =!= 0), idx)
    val before = estMap(SketchIndex.estimates(spark, idx))
    SketchIndex.compact(spark, idx)
    val rows = spark.read.parquet(idx)
    assert(rows.count() == rows.select("source").distinct().count(),
      "compact must leave one row per source")
    assert(estMap(SketchIndex.estimates(spark, idx)) == before)
  }
}
