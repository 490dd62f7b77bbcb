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

  test("mergedIncidents agrees with a plain interval-union sweep on random streams") {
    val gap = 1800L; val pad = 1200L
    val rowGen = for {
      u <- Gen.chooseNum(1L, 4L)
      e <- Gen.chooseNum(0L, 20000L)
    } yield (u, e)
    for (seed <- 1L to 5L) {
      val rows = sample(Gen.listOfN(120, rowGen), seed).distinct
      // independent reference: sessionize, filter n>=2, pad, union-merge
      val want = rows.groupBy(_._1).flatMap { case (u, rs) =>
        val sorted = rs.map(_._2).sorted
        val ranges = scala.collection.mutable.ListBuffer[(Long, Long, Int)]()
        var start = sorted.head; var prev = sorted.head; var n = 1
        for (t <- sorted.tail) {
          if (t - prev > gap) { ranges += ((start, prev, n)); start = t; n = 0 }
          prev = t; n += 1
        }
        ranges += ((start, prev, n))
        val kept = ranges.filter(_._3 >= 2).map(r => (r._1 - pad, r._2 + pad))
        if (kept.isEmpty) None
        else {
          val merged = scala.collection.mutable.ListBuffer[(Long, Long)]()
          for ((s, e) <- kept.sortBy(identity)) {
            if (merged.nonEmpty && s <= merged.last._2)
              merged(merged.length - 1) =
                (merged.last._1, math.max(merged.last._2, e))
            else merged += ((s, e))
          }
          val spans = merged.map(m => m._2 - m._1)
          Some(u -> ((kept.size.toLong, merged.size.toLong,
            spans.sum, spans.max)))
        }
      }
      val ev = rows.zipWithIndex.map { case ((u, e), i) => (u, i.toLong, e) }
        .toDF("user_id", "event_id", "e")
        .select(col("user_id"), col("event_id"),
          to_timestamp(col("e")).as("ts"), lit("error").as("event_type"),
          lit(1.0).as("value"))
      val got = graft.ops.Ranges.mergedIncidents(ev, gap, pad)
        .select("user_id", "n_raw", "n_merged", "covered_sec", "longest_sec")
        .as[(Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      assert(got === want, s"seed $seed")
    }
  }

  test("ksDrift agrees with a direct two-sample KS computation on random data") {
    val rowGen = for {
      k <- Gen.oneOf("a", "b")
      e <- Gen.chooseNum(0L, 999L)
      v <- Gen.frequency(
        (3, Gen.chooseNum(-50.0, 50.0)),
        (2, Gen.chooseNum(-5, 5).map(_.toDouble))) // deliberate ties
    } yield (k, e, v)
    for (seed <- 1L to 5L) {
      val rows = sample(Gen.listOfN(400, rowGen), seed)
      val es = rows.map(_._2)
      val split = math.floor(es.min + (es.max - es.min) * 0.75).toLong
      val want = rows.groupBy(_._1).map { case (k, rs) =>
        val a = rs.filter(_._2 < split).map(_._3)
        val b = rs.filter(_._2 >= split).map(_._3)
        val vals = (a ++ b).distinct.sorted
        val na = a.size.toDouble; val nb = b.size.toDouble
        val ks = vals.map(v =>
          math.abs(a.count(_ <= v) / na - b.count(_ <= v) / nb)).max
        val thr = 1.3581 * math.sqrt((na + nb) / (na * nb))
        k -> ((a.size.toLong, b.size.toLong,
          math.round(ks * 10000) / 10000.0, ks > thr))
      }
      val ev = rows.toDF("event_type", "e", "value")
        .select(col("event_type"), to_timestamp(col("e")).as("ts"), col("value"))
      val got = graft.ops.Drift.ksDrift(ev)
        .select("event_type", "n_train", "n_eval", "ks", "drifted")
        .as[(String, Long, Long, Double, Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      assert(got === want, s"seed $seed")
    }
  }

  test("ANOVA partitions total variance on random data: SSB+SSW = SST") {
    val rowGen = for {
      g <- Gen.oneOf("a", "b", "c", "d")
      v <- Gen.chooseNum(-100.0, 100.0)
    } yield (g, v)
    for (seed <- 1L to 5L) {
      val rows = sample(Gen.listOfN(200, rowGen), seed).zipWithIndex
        .map { case ((g, v), i) => (i.toLong, 0L, 1L, g, v) }
      val df = rows.toDF("event_id", "sec", "user_id", "event_type", "value")
        .withColumn("ts", expr("timestamp_seconds(sec)")).drop("sec")
      val r = graft.ops.StatTests.anovaF(df).collect().head
      val vals = rows.map(_._5)
      val mean = vals.sum / vals.size
      val sst = vals.map(v => (v - mean) * (v - mean)).sum
      val ssb = r.getAs[Double]("ss_between")
      val ssw = r.getAs[Double]("ss_within")
      assert(math.abs(ssb + ssw - sst) < 1e-4 * math.max(1.0, sst),
        s"seed $seed: SSB $ssb + SSW $ssw != SST $sst")
      assert(ssb >= -1e-9 && ssw >= -1e-9)
      val eta = r.getAs[Double]("eta_sq")
      assert(eta >= 0.0 && eta <= 1.0)
    }
  }

  test("jarqueBera moments match brute force on random samples") {
    for (seed <- 1L to 5L) {
      val vals = sample(Gen.listOfN(150, Gen.chooseNum(0.0, 500.0)), seed)
      val rows = vals.zipWithIndex.map { case (v, i) =>
        (i.toLong, 0L, 1L, "x", v)
      }
      val df = rows.toDF("event_id", "sec", "user_id", "event_type", "value")
        .withColumn("ts", expr("timestamp_seconds(sec)")).drop("sec")
      val r = graft.ops.StatTests.jarqueBera(df).collect().head
      val n = vals.size.toDouble
      val mean = vals.sum / n
      val m2 = vals.map(v => (v - mean) * (v - mean)).sum / n
      val m3 = vals.map(v => math.pow(v - mean, 3)).sum / n
      val m4 = vals.map(v => math.pow(v - mean, 4)).sum / n
      assert(math.abs(r.getAs[Double]("skewness")
        - m3 / (m2 * math.sqrt(m2))) < 1e-4, s"seed $seed skew")
      assert(math.abs(r.getAs[Double]("ex_kurtosis")
        - (m4 / (m2 * m2) - 3.0)) < 1e-4, s"seed $seed kurt")
    }
  }

  test("weighted median never moves past half the weight (random prices)") {
    // Internal consistency on real data at two scale factors: the chosen
    // price must accumulate >= 50% of revenue, and the price just below
    // it must accumulate < 50%.
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val li = Tables.lineitem(spark, sf)
        .select(col("l_returnflag"),
          (col("l_extendedprice") / col("l_quantity"))
            .cast("decimal(18,6)").as("price"),
          col("l_extendedprice").cast("decimal(18,2)").as("rev"))
      val med = graft.ops.Relational.weightedMedianPrice(spark, sf)
        .collect().map(r => r.getAs[String]("l_returnflag")
          -> r.getAs[Double]("weighted_median_price")).toMap
      for ((flag, wm) <- med) {
        val rows = li.where(col("l_returnflag") === flag)
          .as[(String, java.math.BigDecimal, java.math.BigDecimal)]
          .collect().map(t => (t._2.doubleValue, t._3.doubleValue))
        val tot = rows.map(_._2).sum
        val below = rows.filter(_._1 < wm - 5e-5).map(_._2).sum
        val upto = rows.filter(_._1 <= wm + 5e-5).map(_._2).sum
        assert(below * 2 < tot + 1e-6, s"$flag: below-median mass >= half")
        assert(upto * 2 >= tot - 1e-6, s"$flag: median failed to reach half")
      }
    }
  }
}
