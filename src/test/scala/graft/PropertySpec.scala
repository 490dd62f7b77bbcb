package graft

import graft.ops.{Graph, Percentiles}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized cross-validation (seeded scalacheck generators, fully
  * deterministic): the hand-built distributed algorithms must agree with an
  * independent reference on arbitrary inputs, not just the curated
  * fixtures — the two-pass percentile against Catalyst's exact
  * `percentile`, and min-label connected components against a brute-force
  * union-find.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("two-pass exact quantiles agree with Catalyst percentile on random data") {
    // values with deliberate duplicates and mixed sign; ragged group sizes
    val valueGen = Gen.frequency(
      (3, Gen.chooseNum(-1000.0, 1000.0)),
      (2, Gen.chooseNum(-20, 20).map(_.toDouble)))
    val rowGen = for {
      g <- Gen.oneOf("a", "b", "c")
      v <- valueGen
    } yield (g, v)

    for (seed <- 1L to 5L) {
      val rows = sample(Gen.listOfN(300, rowGen), seed)
      val df = rows.toDF("grp", "value")
      val got = Percentiles
        .exactQuantiles(df, "grp", "value", Seq(("p50", 0.5), ("p90", 0.9)))
        .groupBy(col("grp"))
        .agg(
          max(when(col("qname") === "p50", col("qv"))).as("p50"),
          max(when(col("qname") === "p90", col("qv"))).as("p90"))
        .as[(String, Double, Double)].collect()
        .map { case (g, a, b) => g -> (a, b) }.toMap
      val want = df.groupBy(col("grp"))
        .agg(expr("percentile(value, 0.5)").as("p50"),
          expr("percentile(value, 0.9)").as("p90"))
        .as[(String, Double, Double)].collect()
        .map { case (g, a, b) => g -> (a, b) }.toMap
      assert(got.keySet === want.keySet, s"seed $seed group mismatch")
      for ((g, (p50, p90)) <- want) {
        assert(math.abs(got(g)._1 - p50) <= 1e-9 * math.max(1.0, math.abs(p50)),
          s"seed $seed grp $g p50: ${got(g)._1} vs $p50")
        assert(math.abs(got(g)._2 - p90) <= 1e-9 * math.max(1.0, math.abs(p90)),
          s"seed $seed grp $g p90: ${got(g)._2} vs $p90")
      }
    }
  }

  test("connected components agree with brute-force union-find on random graphs") {
    val edgeGen = for {
      u <- Gen.chooseNum(0L, 29L)
      v <- Gen.chooseNum(0L, 29L) if v != u
    } yield (u, v)

    for (seed <- 1L to 5L) {
      val edges = sample(Gen.listOfN(25, edgeGen), seed).distinct
      val got = Graph.connectedComponents(edges.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap

      // reference union-find
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (u, v) =>
        val (ru, rv) = (find(u), find(v))
        if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
      }
      val vertices = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val want = vertices.map { v =>
        // canonical label: min vertex of the component
        val root = find(v)
        v -> vertices.filter(find(_) == root).min
      }.toMap
      assert(got === want, s"seed $seed")
    }
  }

  test("containment prefix filter is lossless on random near-dup corpora") {
    // documents drawn from a 12-word vocabulary so shared shingles (and
    // doc-inside-doc embeddings) are common — the regime the prefix bound
    // has to survive; lengths vary so t*n lands on and off integers
    val word = Gen.oneOf((0 until 12).map(i => s"w$i"))
    val docGen = for {
      n <- Gen.chooseNum(3, 15)
      ws <- Gen.listOfN(n, word)
    } yield ws.mkString(" ")

    for (seed <- 1L to 4L) {
      val texts = sample(Gen.listOfN(30, docGen), seed)
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t, "en", "s0") }
        .toDF("doc_id", "text", "lang", "source")
      for (t <- Seq(0.5, 0.75, 0.8)) {
        val direct = graft.ops.Dedup
          .finishContainment(docs, graft.ops.Dedup.containmentCandidatesDirect(docs), t)
          .orderBy("doc_a", "doc_b").collect().toSeq
        val pref = graft.ops.Dedup.containmentPairs(docs, minContainment = t)
          .orderBy("doc_a", "doc_b").collect().toSeq
        assert(pref === direct, s"seed $seed t=$t")
      }
    }
  }
}
