package graft

import graft.ops.Drift
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** PSI drift monitor: batch semantics on constructed distributions, and
  * batch ≡ stream parity — the live-monitoring deployment feeds the same
  * counts→PSI stage from a streaming aggregate over a static dimension.
  */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  /** (event_type, e, value) rows: sensor "flat" has the same uniform spread
    * in both phases; sensor "shift" moves its whole mass to the top of the
    * envelope in the eval phase (e >= 750 given the 0..999 time span).
    */
  private def rows: Seq[(String, Long, Double)] = {
    val train = (0 until 750).flatMap { i =>
      Seq(("flat", i.toLong, (i % 100).toDouble),
        ("shift", i.toLong, (i % 100).toDouble))
    }
    val eval_ = (750 until 1000).flatMap { i =>
      Seq(("flat", i.toLong, (i % 100).toDouble),
        ("shift", i.toLong, 95.0 + (i % 5))) // top bin only
    }
    train ++ eval_
  }

  private def ev = rows.toDF("event_type", "e", "value")

  test("stable sensor scores near zero, shifted sensor scores high") {
    val dim = Drift.dimension(ev).localCheckpoint()
    val counts = Drift.binning(ev, dim)
      .groupBy(col("event_type"), col("phase"), col("bin"))
      .agg(count(lit(1)).as("c"))
    val gotMap = Drift.psiFromCounts(counts)
      .select("event_type", "psi", "drift").as[(String, Double, String)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(gotMap("flat")._1 < 0.1 && gotMap("flat")._2 == "stable")
    assert(gotMap("shift")._1 > 0.25 && gotMap("shift")._2 == "high")
  }

  test("PSI is symmetric-positive: swapping phases preserves the score") {
    val dim = Drift.dimension(ev).localCheckpoint()
    val counts = Drift.binning(ev, dim)
      .groupBy(col("event_type"), col("phase"), col("bin"))
      .agg(count(lit(1)).as("c"))
    val swapped = counts.withColumn("phase",
      when(col("phase") === "u", "v").otherwise("u"))
    val a = Drift.psiFromCounts(counts)
      .select("event_type", "psi").as[(String, Double)].collect().toMap
    val b = Drift.psiFromCounts(swapped)
      .select("event_type", "psi").as[(String, Double)].collect().toMap
    assert(a === b) // (p-q)ln(p/q) is phase-exchange invariant
  }

  test("streamed eval counts yield the same PSI as the batch run") {
    implicit val ctx = spark.sqlContext
    // the dimension (envelope + split) is static — in production it comes
    // from the frozen training snapshot
    val dim = Drift.dimension(ev).localCheckpoint()

    val mem = MemoryStream[(String, Long, Double)]
    val streamedCounts = Drift.binning(
      mem.toDF().toDF("event_type", "e", "value"), dim)
      .groupBy(col("event_type"), col("phase"), col("bin"))
      .agg(count(lit(1)).as("c"))
    val q = streamedCounts.writeStream
      .format("memory").queryName("drift_counts").outputMode("complete").start()
    try {
      val rs = rows
      mem.addData(rs.take(600))
      q.processAllAvailable()
      mem.addData(rs.drop(600))
      q.processAllAvailable()

      val live = Drift.psiFromCounts(spark.table("drift_counts"))
        .select("event_type", "psi", "drift", "rnk")
        .as[(String, Double, String, Int)].collect().sortBy(_._4)
      val batch = {
        val counts = Drift.binning(ev, dim)
          .groupBy(col("event_type"), col("phase"), col("bin"))
          .agg(count(lit(1)).as("c"))
        Drift.psiFromCounts(counts)
          .select("event_type", "psi", "drift", "rnk")
          .as[(String, Double, String, Int)].collect().sortBy(_._4)
      }
      assert(live.toSeq === batch.toSeq)
    } finally q.stop()
  }

  test("streamed per-value counts yield the same KS verdict as batch") {
    implicit val ctx = spark.sqlContext
    // frozen split boundary, as a production monitor would configure it —
    // must equal the batch derivation floor(0 + (999-0)*0.75) = 749
    val splitE = 749L
    val mem = MemoryStream[(String, Long, Double)]
    val streamedCounts = mem.toDF().toDF("event_type", "e", "value")
      .withColumn("tr", (col("e") < lit(splitE)).cast("long"))
      .groupBy(col("event_type"), col("value"))
      .agg(sum(col("tr")).as("ca"), sum(lit(1L) - col("tr")).as("cb"))
    val q = streamedCounts.writeStream
      .format("memory").queryName("ks_counts").outputMode("complete").start()
    try {
      val rs = rows
      mem.addData(rs.take(600))
      q.processAllAvailable()
      mem.addData(rs.drop(600))
      q.processAllAvailable()
      val live = Drift.ksFromCounts(spark.table("ks_counts"))
        .select("event_type", "n_train", "n_eval", "ks", "drifted")
        .as[(String, Long, Long, Double, Boolean)].collect().sortBy(_._1)
      val batch = Drift.ksDrift(
        ev.select(col("event_type"), to_timestamp(col("e")).as("ts"), col("value")))
        .select("event_type", "n_train", "n_eval", "ks", "drifted")
        .as[(String, Long, Long, Double, Boolean)].collect().sortBy(_._1)
      assert(live.toSeq === batch.toSeq)
    } finally q.stop()
  }

  test("quantileDrift reports a planted median shift in value units") {
    // anchors at e=0 and e=1200 pin the split to floor(1200·0.75)=900;
    // train is then 0..99 (×8 + one extra 0), eval 100..199 (×2 + one
    // extra 100) — every R-7 rank lands ON a sorted element, so the
    // quantiles are integers and d50 = d90 = 100 exactly.
    val rows = Seq(("s", 0L, 0.0), ("s", 1200L, 100.0)) ++
      (100 until 900).map(e => ("s", e.toLong, (e % 100).toDouble)) ++
      (900 until 1100).map(e => ("s", e.toLong, 100.0 + e % 100))
    val ev = rows.toDF("event_type", "e", "value")
      .select(col("event_type"), to_timestamp(col("e")).as("ts"), col("value"))
    val got = Drift.quantileDrift(ev)
      .select("event_type", "d50", "d90").as[(String, Double, Double)].head()
    assert(got._2 === 100.0 && got._3 === 100.0)
  }

  test("winsorized moments clip symmetric tails without moving the center") {
    // values 1..100: p05/p95 clip 5 rows each side symmetrically, so the
    // winsorized mean stays exactly 50.5 while the spread shrinks.
    val ev = (1 to 100).map(v => ("s", v.toLong, v.toDouble))
      .toDF("event_type", "e", "value")
      .select(col("event_type"), to_timestamp(col("e")).as("ts"), col("value"))
    val got = Drift.winsorizedStats(ev)
      .select("event_type", "n", "n_clip_lo", "n_clip_hi", "wins_mean", "wins_sd")
      .as[(String, Long, Long, Long, Double, Double)].head()
    assert(got === (("s", 100L, 5L, 5L, 50.5, got._6)))
    assert(got._6 > 0 && got._6 < 29.02) // tighter than the raw sd 29.01..?
  }

  test("ks drift: identical distributions pass, disjoint ones flag") {
    // "same": uniform 0..49 in both phases → KS ≈ 0, below threshold.
    // "jump": eval values disjoint from train's → KS = 1 exactly.
    val rows = (0 until 1000).flatMap { e =>
      val evalPhase = e >= 749 // global split at floor(999·0.75) = 749
      Seq(
        ("same", e.toLong, (e % 50).toDouble),
        ("jump", e.toLong,
          if (evalPhase) 100.0 + (e % 50) else (e % 50).toDouble))
    }
    val ev = rows.toDF("event_type", "e", "value")
      .select(col("event_type"), to_timestamp(col("e")).as("ts"), col("value"))
    val got = Drift.ksDrift(ev)
      .select("event_type", "n_train", "n_eval", "ks", "drifted")
      .as[(String, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(!got("same")._5 && got("same")._4 < 0.05)
    assert(got("jump")._5 && got("jump")._4 === 1.0)
    assert(got("jump")._2 === 749L && got("jump")._3 === 251L)
  }
}
