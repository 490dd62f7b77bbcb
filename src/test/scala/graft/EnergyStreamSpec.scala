package graft

import graft.ops.Drift
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming energy-distance monitor — the last drift axis without a
  * streamed twin (PSI, KS, CUSUM, extremal, CvM all have parity specs).
  * Same shape as CvmStreamSpec: per-value phase counts stream in complete
  * mode against a frozen split; [[Drift.energyFromCounts]] over the live
  * counts must equal the batch q314 stage exactly, whatever the slicing.
  */
class EnergyStreamSpec extends SparkSpec {
  import spark.implicits._

  private val splitE = 600L

  /** "stable" is phase-invariant (energy ≈ 0); "jump" doubles its scale in
    * the eval phase; values include negatives and ties so the cumulative
    * cross-sum identity is exercised off the happy path.
    */
  private def rows: Seq[(String, Long, Double)] = {
    val train = (0 until 600).flatMap { i =>
      Seq(("stable", i.toLong, ((i % 50) - 25).toDouble),
        ("jump", i.toLong, ((i % 50) - 25).toDouble))
    }
    val eval_ = (600 until 900).flatMap { i =>
      Seq(("stable", i.toLong, ((i % 50) - 25).toDouble),
        ("jump", i.toLong, 2.0 * ((i % 50) - 25) + 10.0))
    }
    train ++ eval_
  }

  private def counts(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("tr", (col("e") < splitE).cast("long"))
    .groupBy(col("event_type"), col("value"))
    .agg(sum(col("tr")).as("ca"), sum(lit(1L) - col("tr")).as("cb"))

  test("streamed eval counts yield the same energy distance as batch across three slicings") {
    implicit val ctx = spark.sqlContext
    val rs = rows
    val batch = Drift.energyFromCounts(counts(rs.toDF("event_type", "e", "value")))
      .select("event_type", "n_train", "n_eval", "energy_d2")
      .as[(String, Long, Long, Double)].collect().sortBy(_._1).toSeq
    // semantics: identical phases ≈ 0 (exactly 0 up to the rounding snap
    // here because train and eval draw the same value multiset shape);
    // the scaled-and-shifted series scores clearly positive
    val byKey = batch.map(r => r._1 -> r._4).toMap
    assert(math.abs(byKey("stable")) < 1e-6)
    assert(byKey("jump") > 1.0)

    val slicings = Seq(
      Seq(rs),
      Seq(rs.take(500), rs.slice(500, 1300), rs.drop(1300)),
      rs.grouped(450).toSeq)
    for ((slices, i) <- slicings.zipWithIndex) {
      assert(slices.flatten.size == rs.size, s"slicing $i drops rows")
      val mem = MemoryStream[(String, Long, Double)]
      val name = s"energy_counts_${i}_${System.nanoTime()}"
      val q = counts(mem.toDF().toDF("event_type", "e", "value"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      try {
        slices.foreach { s => mem.addData(s: _*); q.processAllAvailable() }
        val live = Drift.energyFromCounts(spark.table(name))
          .select("event_type", "n_train", "n_eval", "energy_d2")
          .as[(String, Long, Long, Double)].collect().sortBy(_._1).toSeq
        assert(live === batch, s"slicing $i")
      } finally q.stop()
    }
  }
}
