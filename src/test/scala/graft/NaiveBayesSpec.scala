package graft

import org.apache.spark.sql.functions._
import graft.ops.{Similarity, TextAnalysis}

/** Known-answer checks for q221-q223: NB source attribution, tokenizer
  * fertility, metadata-filtered ANN.
  */
class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))

  test("naiveBayesSource separates two disjoint-vocabulary sources") {
    val rows = (0 until 6).map { i =>
      if (i < 3) (i.toLong, "a", "apple banana cherry apple")
      else (i.toLong, "b", "xylophone zebra quartz zebra")
    }
    val out = TextAnalysis.naiveBayesSource(docs(rows)).collect()
    // perfectly separable -> diagonal confusion matrix
    assert(out.length == 2)
    assert(out.forall(r =>
      r.getAs[String]("actual") == r.getAs[String]("predicted")))
    assert(out.forall(_.getAs[Long]("n_docs") == 3L))
  }

  test("tokenizerFertility counts fixed-4 pieces exactly") {
    // "abcd efghi x" -> words: abcd(1 piece), efghi(2), x(1) = 4 pieces
    val out = TextAnalysis.tokenizerFertility(
      docs(Seq((1L, "s", "abcd efghi x")))).collect().head
    assert(out.getAs[Long]("n_words") == 3)
    assert(out.getAs[Long]("n_pieces") == 4)
    assert(math.abs(out.getAs[Double]("fertility") - 4.0 / 3.0) < 1e-5)
    assert(math.abs(out.getAs[Double]("avg_word_len") - 10.0 / 3.0) < 1e-3)
    assert(out.getAs[Double]("long_word_frac") == 0.0)
  }

  test("filteredAnn never returns a candidate outside the predicate") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dd = Tables.documents(spark, "/root/testdata/sf0.001")
    val keep = dd.where(col("lang") === "en")
      .select(col("doc_id")).as[Long].collect().toSet
    val out = Similarity.filteredAnn(emb, dd).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => keep.contains(r.getAs[Long]("neighbor_id"))))
    // every probe returns at most k=5, ranked 1..n densely
    out.groupBy(_.getAs[Long]("probe_id")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("rnk")).sorted.toSeq ==
        (1 to rs.length).toSeq)
    }
  }
}
