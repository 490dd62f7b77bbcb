package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Regression, Sax}

/** Known-answer checks for q227-q229: Newton logistic fit, SAX motifs,
  * paragraph dedup.
  */
class RegressionSpec extends SparkSpec {
  import spark.implicits._

  test("logisticNewton separates a step function with high accuracy") {
    // y = 1 iff value >= 300 -> perfectly separable on x = value/100
    val rows = (0 until 400).map { i =>
      val v = i.toDouble // 0..399
      (i.toLong, java.sql.Timestamp.valueOf("2020-01-01 00:00:00"),
        1L, if (v >= 300) "error" else "view", v)
    }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Regression.logisticNewton(df).collect().head
    assert(out.getAs[Long]("n") == 400)
    assert(out.getAs[Long]("n_pos") == 100)
    // 4 Newton steps on separable data: slope positive, high accuracy
    assert(out.getAs[Double]("beta1") > 0)
    assert(out.getAs[Double]("accuracy") > 0.9)
  }

  test("logisticNewton recovers ~zero slope on label-independent noise") {
    // each value appears once with each label -> feature ⟂ label exactly
    val rows = (0 until 200).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf("2020-01-01 00:00:00"),
        1L, if (i % 2 == 0) "error" else "view",
        ((i / 2) % 10).toDouble * 10)
    }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Regression.logisticNewton(df).collect().head
    // balanced labels, independent feature: intercept ~ logit(0.5) = 0
    assert(math.abs(out.getAs[Double]("beta0")) < 0.2)
    assert(math.abs(out.getAs[Double]("beta1")) < 0.5)
  }

  test("saxMotifs finds the sawtooth motif in a periodic series") {
    // hourly values cycling low/high: symbols alternate, so one motif
    // dominates each phase
    val rows = (0 until 96).map { h =>
      val v = if (h % 2 == 0) 10.0 else 90.0
      (h.toLong, h.toLong * 3600, 1L, "a", v)
    }
    val df = rows.toDF("event_id", "sec", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_seconds(sec)")).drop("sec")
    val out = Sax.saxMotifs(df).collect()
    assert(out.nonEmpty)
    // alternating 0,3 symbols -> words 0*16+3*4+0=12 and 3*16+0*4+3=51
    val words = out.map(_.getAs[Int]("word")).toSet
    assert(words.contains(12) && words.contains(51))
  }

  test("paragraphDedup counts shared fragments across documents") {
    val shared = "this shared paragraph is long enough to count"
    val docs = Seq(
      (1L, "a", s"$shared. unique one text that is long enough here"),
      (2L, "a", s"$shared. another unique fragment long enough as well"),
      (3L, "b", "completely different content that is long enough too"))
      .toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
    val out = Dedup.paragraphDedup(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(out("a").getAs[Long]("n_paras") == 4)
    assert(out("a").getAs[Long]("n_shared") == 2) // the two shared copies
    assert(out("b").getAs[Long]("n_shared") == 0)
  }
}
