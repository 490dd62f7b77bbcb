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

  test("olsNormalEq recovers exact coefficients on noiseless planar data") {
    // y = 100 + 7·n_items + 3·sum_qty exactly -> R² = 1, betas exact
    val li = (1 to 50).flatMap { ok =>
      val items = 1 + ok % 5
      (1 to items).map(i => (ok.toLong, (ok * 3 + i) % 17 + 1.0, "N"))
    }.toDF("l_orderkey", "l_quantity", "l_returnflag")
    val feats = li.groupBy("l_orderkey")
      .agg(count(lit(1)).as("ni"), sum("l_quantity").as("sq"))
      .select(col("l_orderkey").as("o_orderkey"),
        (lit(100.0) + lit(7.0) * col("ni") + lit(3.0) * col("sq"))
          .as("o_totalprice"))
    val out = Regression.olsNormalEq(feats, li).collect().head
    assert(out.getAs[Long]("n") == 50)
    assert(math.abs(out.getAs[Double]("beta0") - 100.0) < 1e-4)
    assert(math.abs(out.getAs[Double]("beta1") - 7.0) < 1e-4)
    assert(math.abs(out.getAs[Double]("beta2") - 3.0) < 1e-4)
    assert(math.abs(out.getAs[Double]("r2") - 1.0) < 1e-6)
  }

  test("decisionStump finds the exact separating threshold") {
    // returnflag = R exactly when quantity <= 20 -> stump splits at 20
    // with perfect purity on both sides (gain = parent entropy)
    val li = (1 to 40).flatMap(q => Seq.fill(5)(
      (q.toLong, q.toDouble, if (q <= 20) "R" else "N")))
      .toDF("l_orderkey", "l_quantity", "l_returnflag")
    val out = Regression.decisionStump(li).collect().head
    assert(out.getAs[Int]("threshold") == 20)
    assert(out.getAs[Long]("pos_left") == 100 &&
      out.getAs[Long]("n_left") == 100)
    assert(out.getAs[Long]("pos_right") == 0 &&
      out.getAs[Long]("n_right") == 100)
    // balanced parent: H = ln 2; children pure: gain = ln 2
    assert(math.abs(out.getAs[Double]("gain") - math.log(2)) < 1e-6)
  }

  test("periodSetOps partitions users into consistent segments") {
    val rows = Seq(
      // user 1: both halves, user 2: only first, user 3: only second
      (1L, "2024-01-05 00:00:00", 1L), (2L, "2024-01-20 00:00:00", 1L),
      (3L, "2024-01-06 00:00:00", 2L), (4L, "2024-01-25 00:00:00", 3L))
      .map { case (e, t, u) =>
        (e, java.sql.Timestamp.valueOf(t), u, "view", 1.0)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.ops.Relational.periodSetOps(rows).collect()
      .map(r => r.getAs[String]("segment") -> r.getAs[Long]("n_users")).toMap
    assert(out == Map("both" -> 1L, "only_first" -> 1L,
      "only_second" -> 1L, "either" -> 3L))
  }

  test("rollingDistinctUsers counts each user once per trailing window") {
    // user 1 active days 0 and 3 (one window covers both); user 2 day 1
    val rows = Seq((1L, 0L, 1L), (2L, 3L * 86400, 1L), (3L, 86400L, 2L))
      .map { case (e, s, u) =>
        (e, new java.sql.Timestamp(s * 1000L), u, "view", 1.0)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.ops.Relational.rollingDistinctUsers(rows).collect()
      .map(r => r.getAs[Long]("day_num") -> r.getAs[Long]("n_users_7d")).toMap
    // windows clip at the max observed day (3): days 0..3 only
    assert(out == Map(0L -> 1L, 1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("groupedOls recovers each brand's exact line on noiseless data") {
    // brand A: y = 3 + 2x; brand B: y = 10 + 5x -> R-squared 1 for both
    val li = (1 to 20).map { i =>
      val brand = if (i % 2 == 0) 1L else 2L
      val x = (i % 7 + 1).toDouble
      val y = if (brand == 1L) 3.0 + 2.0 * x else 10.0 + 5.0 * x
      (i.toLong, x, y)
    }.toDF("l_partkey", "l_quantity", "l_extendedprice")
    val part = (1 to 20).map(i =>
      (i.toLong, if (i % 2 == 0) "A" else "B")).toDF("p_partkey", "p_brand")
    val m = Regression.groupedOls(li, part).collect()
      .map(r => r.getAs[String]("p_brand") -> r).toMap
    assert(math.abs(m("A").getAs[Double]("slope") - 2.0) < 1e-6)
    assert(math.abs(m("A").getAs[Double]("intercept") - 3.0) < 1e-6)
    assert(math.abs(m("B").getAs[Double]("slope") - 5.0) < 1e-6)
    assert(math.abs(m("B").getAs[Double]("r2") - 1.0) < 1e-6)
  }

  test("calibrationBins: a sharp separable model fills the extreme bins") {
    // separable step data: after 4 Newton rounds p is near 0 left of the
    // step and near 1 right of it -> mass concentrates in outer bins and
    // observed rates match predictions there
    val rows = (0 until 400).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf("2020-01-01 00:00:00"),
        1L, if (i >= 300) "error" else "view", i.toDouble)
    }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Regression.calibrationBins(df).collect()
      .map(r => r.getAs[Int]("bin") -> r).toMap
    assert(out.contains(0) && out.contains(9))
    assert(out(0).getAs[Double]("obs_rate") < 0.1)
    assert(out(9).getAs[Double]("obs_rate") > 0.9)
    assert(out.values.map(_.getAs[Long]("n")).sum == 400)
  }

  test("modePerGroup picks the most frequent value, smaller value on ties") {
    val li = (Seq.fill(3)(("R", 10.0)) ++ Seq.fill(3)(("R", 7.0))
      ++ Seq.fill(2)(("N", 5.0)) ++ Seq(("N", 9.0)))
      .zipWithIndex.map { case ((f, q), i) => (i.toLong, q, f) }
      .toDF("l_orderkey", "l_quantity", "l_returnflag")
    val m = graft.ops.Relational.modePerGroup(li).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r).toMap
    assert(m("R").getAs[Int]("mode_qty") == 7) // tie 3-3 -> smaller value
    assert(m("N").getAs[Int]("mode_qty") == 5)
    assert(m("N").getAs[Double]("mode_share") == 0.666667)
  }
}
