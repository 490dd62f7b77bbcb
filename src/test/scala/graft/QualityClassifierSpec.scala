package graft

import java.nio.file.Files

import graft.ml.QualityClassifier
import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.functions._

/** The weak-label → linear-model → score-everything loop: rules label a
  * separable corpus, the classifier must recover the rule boundary on the
  * training set AND carry it through a save/load round trip unchanged.
  */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // 20 clean docs (distinct vocabulary, long enough) vs 20 junk docs
  // (one token stuttered) — linearly separable in hashed-token space
  private def docs = {
    val clean = (0 until 20).map { i =>
      (i.toLong, (0 until 20).map(j => s"w${i}_$j").mkString(" "))
    }
    val junk = (0 until 20).map { i =>
      (100L + i, Seq.fill(30)(s"spam$i").mkString(" "))
    }
    (clean ++ junk).toDF("doc_id", "text")
  }

  test("weak labels encode the length and repetition gates") {
    val labels = QualityClassifier.weakLabels(docs)
      .select("doc_id", "label").as[(Long, Double)].collect().toMap
    assert((0 until 20).forall(i => labels(i.toLong) == 1.0))
    assert((0 until 20).forall(i => labels(100L + i) == 0.0))
  }

  test("classifier separates the weak labels and survives save/load") {
    val labeled = QualityClassifier.weakLabels(docs)
    val model = QualityClassifier.fit(labeled)
    val scored = QualityClassifier.score(model, docs)
      .join(labeled.select("doc_id", "label"), "doc_id")
    // trivially separable corpus → the model must recover the rule boundary
    assert(scored.where(col("prediction") =!= col("label")).count() === 0L)

    val dir = Files.createTempDirectory("qc_model").toString + "/m"
    model.write.overwrite().save(dir)
    val reloaded = PipelineModel.load(dir)
    val a = QualityClassifier.score(model, docs)
      .select("doc_id", "p_good").as[(Long, Double)].collect().toMap
    val b = QualityClassifier.score(reloaded, docs)
      .select("doc_id", "p_good").as[(Long, Double)].collect().toMap
    assert(a === b) // the serialized artifact scores bit-identically
  }

  test("3-fold CV generalizes on separable data and covers every doc once") {
    val labeled = QualityClassifier.weakLabels(docs)
    val cv = QualityClassifier.crossValidate(labeled, k = 3)
      .collect().sortBy(_.getAs[Int]("fold"))
    assert(cv.length == 3)
    // every doc held out exactly once
    assert(cv.map(_.getAs[Long]("n_test")).sum == 40L)
    // train+test partition the corpus per fold
    cv.foreach { r =>
      assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_test") == 40L)
    }
    // separable vocabulary generalizes well above the trivial baseline
    cv.foreach { r =>
      val acc = r.getAs[Double]("accuracy")
      val base = math.max(r.getAs[Double]("pos_rate"),
        1.0 - r.getAs[Double]("pos_rate"))
      assert(acc >= base - 0.15, s"fold ${r.getAs[Int]("fold")}: " +
        s"accuracy $acc far below baseline $base")
    }
  }
}
