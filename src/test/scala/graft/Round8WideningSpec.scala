package graft

import java.sql.Timestamp
import graft.ops.{Similarity, StatTests, TimeSeries}
import org.apache.spark.sql.functions._

/** Semantic checks for the round-8 widening operators on constructed
  * fixtures with hand-computable answers (the DuckDB oracle already pins
  * engine parity on the real tables; these pin the STATISTICS).
  */
class Round8WideningSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, i: Int) =
    new Timestamp((19700L + day) * 86400000L + i * 60000L)

  test("kruskalWallis: separated groups score high, identical groups zero") {
    // three groups occupying disjoint value bands → near-maximal H
    val sep = (0 until 30).flatMap { i =>
      Seq(("a", ts(i % 7, i), 0L, 1L, 10.0 + i % 5),
        ("b", ts(i % 7, i), 0L, 1L, 20.0 + i % 5),
        ("c", ts(i % 7, i), 0L, 1L, 30.0 + i % 5))
    }.toDF("event_type", "ts", "event_id", "user_id", "value")
    val hSep = StatTests.kruskalWallis(sep)
    val rows = hSep.orderBy($"event_type")
      .select($"event_type", $"mean_rank", $"h", $"h_adj", $"df")
      .as[(String, Double, Double, Double, Int)].collect()
    assert(rows.map(_._1).toSeq === Seq("a", "b", "c"))
    // mean ranks must be ordered with the bands
    assert(rows(0)._2 < rows(1)._2 && rows(1)._2 < rows(2)._2)
    assert(rows(0)._5 === 2)
    // χ²(df=2) 0.001 critical value is 13.8; perfect separation clears it
    assert(rows(0)._3 > 13.8)
    // ties exist (5 distinct values per band) so the correction raises H
    assert(rows(0)._4 >= rows(0)._3)

    // identical distributions → H ≈ 0
    val same = (0 until 30).flatMap { i =>
      Seq(("a", ts(i % 7, i), 0L, 1L, (i % 5).toDouble),
        ("b", ts(i % 7, i), 0L, 1L, (i % 5).toDouble))
    }.toDF("event_type", "ts", "event_id", "user_id", "value")
    val h0 = StatTests.kruskalWallis(same)
      .select($"h").as[Double].head()
    assert(math.abs(h0) < 1e-9)
  }

  test("cliffsDelta: dominance hits ±1, identical phases 0") {
    // weekday epoch-days: ((d + 4) % 7) not in {0,6}; day 19704 % cycle…
    // use explicit days: 19700+1=Fri? anchor: pmod(day+4,7)∈{0,6} is weekend.
    val wd = (0 until 7).filter(d => { val x = (19700 + d + 4) % 7; x != 0 && x != 6 })
    val we = (0 until 7).filter(d => { val x = (19700 + d + 4) % 7; x == 0 || x == 6 })
    assert(wd.nonEmpty && we.nonEmpty)
    val rows =
      // "up": every weekday value above every weekend value → δ = +1
      wd.flatMap(d => (0 until 5).map(i => ("up", ts(d, i), 0L, 1L, 100.0 + i))) ++
      we.flatMap(d => (0 until 5).map(i => ("up", ts(d, i), 0L, 1L, 1.0 + i))) ++
      // "flat": same values both phases → δ = 0
      wd.flatMap(d => (0 until 5).map(i => ("flat", ts(d, i), 0L, 1L, i.toDouble))) ++
      we.flatMap(d => (0 until 5).map(i => ("flat", ts(d, i), 0L, 1L, i.toDouble)))
    val got = StatTests.cliffsDelta(
      rows.toDF("event_type", "ts", "event_id", "user_id", "value"))
      .select($"event_type", $"delta", $"magnitude")
      .as[(String, Double, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("up") === ((1.0, "large")))
    assert(got("flat") === ((0.0, "negligible")))
  }

  test("periodFold finds an exact 7-day cycle with share 1") {
    // 8 full weeks, one reading per day, value = pure function of day%7
    val rows = (0 until 56).map { d =>
      ("w", ts(d, 0), 0L, 1L, Seq(5.0, 1.0, 2.0, 8.0, 3.0, 9.0, 4.0)(d % 7))
    }.toDF("event_type", "ts", "event_id", "user_id", "value")
    val r = TimeSeries.periodFold(rows)
      .select($"n_days", $"best_p", $"best_share", $"second_p", $"second_share")
      .as[(Long, Int, Double, Int, Double)].head()
    assert(r._1 === 56)
    assert(r._2 === 7 && r._3 === 1.0)
    // 14 explains the cycle too (harmonic) — ties broken to the smaller p
    assert(r._4 === 14 && r._5 === 1.0)
  }

  test("pqDistortion: per-subspace SSE shares sum to 1, counts cover corpus") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val n = emb.count()
    val census = Similarity.pqDistortion(emb)
      .select($"subspace", $"n_vecs", $"sse_share")
      .as[(Int, Long, Double)].collect()
    val bySub = census.groupBy(_._1)
    assert(bySub.keySet === Set(0, 1, 2, 3))
    bySub.foreach { case (s, rows) =>
      assert(rows.map(_._2).sum === n, s"subspace $s counts")
      assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-3, s"subspace $s shares")
    }
  }

  test("ndcgQuantized: ndcg in (0,1], perfect when quantization is lossless") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val got = Similarity.ndcgQuantized(emb)
      .select($"ndcg").as[Double].collect()
    assert(got.length === 10)
    assert(got.forall(v => v > 0.0 && v <= 1.0))
  }

  test("friedman + pageTrend: a perfectly consistent daily ordering") {
    // types a < b < c on EVERY day (alphabetical order = trend order, so
    // Page's declared ordering is the true one); day-level shifts vary
    val rows = (0 until 12).flatMap { d =>
      Seq(("a", ts(d, 0), 0L, 1L, 10.0 + d),
        ("b", ts(d, 0), 0L, 1L, 20.0 + d),
        ("c", ts(d, 0), 0L, 1L, 30.0 + d))
    }.toDF("event_type", "ts", "event_id", "user_id", "value")
    val fr = StatTests.friedman(rows)
      .orderBy($"event_type")
      .select($"n_days", $"mean_rank", $"q", $"df")
      .as[(Long, Double, Double, Int)].collect()
    assert(fr.map(_._1).toSeq === Seq(12L, 12L, 12L))
    assert(fr.map(_._2).toSeq === Seq(1.0, 2.0, 3.0))
    // perfect consistency: Q = n(k-1)... here 12·2 = 24, df 2
    assert(fr(0)._3 === 24.0 && fr(0)._4 === 2)

    val pg = StatTests.pageTrend(rows)
      .orderBy($"position")
      .select($"event_type", $"position", $"l", $"z")
      .as[(String, Int, Double, Double)].collect()
    assert(pg.map(r => (r._1, r._2)).toSeq === Seq(("a", 1), ("b", 2), ("c", 3)))
    // perfect ascending trend: L = n·(1·1 + 2·2 + 3·3) = 12·14 = 168 and
    // z hits the distribution's maximum (L = μ + σ·z with every block agreeing)
    assert(pg(0)._3 === 168.0)
    assert(pg(0)._4 > 4.0)
  }

  test("dunnPosthoc: separated bands are pairwise significant and signed") {
    val sep = (0 until 40).flatMap { i =>
      Seq(("a", ts(i % 7, i), 0L, 1L, 10.0 + i % 5),
        ("b", ts(i % 7, i), 0L, 1L, 20.0 + i % 5),
        ("c", ts(i % 7, i), 0L, 1L, 30.0 + i % 5))
    }.toDF("event_type", "ts", "event_id", "user_id", "value")
    val got = StatTests.dunnPosthoc(sep)
      .orderBy($"type_a", $"type_b")
      .select($"type_a", $"type_b", $"z", $"significant")
      .as[(String, String, Double, Boolean)].collect()
    assert(got.map(r => (r._1, r._2)).toSeq ===
      Seq(("a", "b"), ("a", "c"), ("b", "c")))
    assert(got.forall(_._4))
    assert(got.forall(_._3 < 0)) // lower band has the lower mean rank
    // a-vs-c spans two bands: the most extreme z
    assert(got(1)._3 < got(0)._3 && got(1)._3 < got(2)._3)
  }

  test("rboWeights identity and rboQuantized bounds") {
    // identical rankings ⇒ every rank-m doc contributes wTail(m), and
    // (1−p)·Σ_m wTail(m) = 1 − p^d (the truncated-RBO maximum)
    val w = Similarity.rboWeights(0.9, 10)
    assert(w.map(_._1) === (1 to 10))
    val maxRbo = 0.1 * 0 + (1.0 - 0.9) * w.map(_._2).sum
    assert(math.abs(maxRbo - (1.0 - math.pow(0.9, 10))) < 1e-12)

    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val got = Similarity.rboQuantized(emb)
      .select($"rbo").as[Double].collect()
    assert(got.length === 10)
    // the emitted rbo is rounded to 1e-6, which can sit up to 5e-7 above
    // the analytic truncated maximum
    assert(got.forall(v => v >= 0.0 && v <= maxRbo + 5e-7))
  }

  test("jonckheere: fully separated ascending bands maximize J") {
    val sep = (0 until 20).flatMap { i =>
      Seq(("a", ts(i % 7, i), 0L, 1L, 10.0 + i % 5),
        ("b", ts(i % 7, i), 0L, 1L, 20.0 + i % 5),
        ("c", ts(i % 7, i), 0L, 1L, 30.0 + i % 5))
    }.toDF("event_type", "ts", "event_id", "user_id", "value")
    val got = StatTests.jonckheere(sep)
      .orderBy($"type_a", $"type_b")
      .select($"type_a", $"type_b", $"u", $"j", $"z")
      .as[(String, String, Double, Double, Double)].collect()
    assert(got.map(r => (r._1, r._2)).toSeq ===
      Seq(("a", "b"), ("a", "c"), ("b", "c")))
    // full separation in the declared order: every pair's U = na·nb = 400,
    // so J = 1200 — the statistic's maximum — and z is far right-tail
    assert(got.forall(_._3 === 400.0))
    assert(got.head._4 === 1200.0)
    assert(got.head._5 > 5.0)

    // reversed bands: J = 0, z mirrored to the far left tail
    val rev = sep.withColumn("value", lit(40.0) - $"value")
    val z2 = StatTests.jonckheere(rev).select($"j", $"z")
      .as[(Double, Double)].head()
    assert(z2._1 === 0.0)
    assert(math.abs(z2._2 + got.head._5) < 1e-9)
  }

  test("quade: perfect consistency is the A=B singularity; noise gives finite F") {
    // types ordered identically every day → every S_ij deviation pattern is
    // the same sign structure, A = B exactly → F undefined (NULL)
    // integer day shifts keep every within-day range EXACTLY equal (a
    // 0.1·d shift perturbs the range in the last ulp, un-tying the block
    // weights and silently leaving the singularity)
    val perfect = (0 until 10).flatMap { d =>
      Seq(("a", ts(d, 0), 0L, 1L, 1.0 + d),
        ("b", ts(d, 0), 0L, 1L, 2.0 + d),
        ("c", ts(d, 0), 0L, 1L, 3.0 + d))
    }.toDF("event_type", "ts", "event_id", "user_id", "value")
    val fPerfect = StatTests.quade(perfect)
      .select($"f", $"df1", $"df2").as[(Option[Double], Int, Int)].head()
    assert(fPerfect._1.isEmpty && fPerfect._2 === 2 && fPerfect._3 === 18)

    // one day flips the ordering → finite positive F
    val noisy = perfect.withColumn("value",
      when(unix_timestamp($"ts") === lit(ts(0, 0).getTime / 1000)
        && $"event_type" === "a", 9.0).otherwise($"value"))
    val fNoisy = StatTests.quade(noisy)
      .select($"f").as[Option[Double]].head()
    assert(fNoisy.exists(v => v > 0 && !v.isInfinite))
  }

  test("degenerate inputs degrade without errors") {
    // single group: KW h has df 0 and a defined value; no throw
    val one = (0 until 10).map(i => ("a", ts(i % 3, i), 0L, 1L, i.toDouble))
      .toDF("event_type", "ts", "event_id", "user_id", "value")
    val kw = StatTests.kruskalWallis(one)
      .select($"df").as[Int].collect()
    assert(kw.toSeq === Seq(0))

    // all rows in one phase: Cliff's delta has an empty side → NULL delta
    // and NULL magnitude, row still emitted (the monitor sees the series,
    // not a crash and not a spurious class)
    val wdOnly = (0 until 7)
      .filter(d => { val x = (19700 + d + 4) % 7; x != 0 && x != 6 })
      .flatMap(d => (0 until 3).map(i => ("a", ts(d, i), 0L, 1L, i.toDouble)))
      .toDF("event_type", "ts", "event_id", "user_id", "value")
    val cd = StatTests.cliffsDelta(wdOnly)
      .select($"n_we", $"delta", $"magnitude")
      .as[(Long, Option[Double], Option[String])].collect()
    assert(cd.length === 1 && cd.head._1 === 0L)
    assert(cd.head._2.isEmpty && cd.head._3.isEmpty)

    // constant series: periodFold's SST = 0 → null shares, periods ranked
    // by the deterministic tie-break, no division error
    val const = (0 until 30).map(d => ("a", ts(d, 0), 0L, 1L, 5.0))
      .toDF("event_type", "ts", "event_id", "user_id", "value")
    val pf = TimeSeries.periodFold(const)
      .select($"best_p", $"best_share").as[(Int, Option[Double])].head()
    assert(pf._1 === 2 && pf._2.isEmpty)
  }
}
