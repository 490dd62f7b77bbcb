package graft

import graft.ops.Drift
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming CvM drift monitor: the live deployment streams per-value phase
  * counts (train/eval tagged against a frozen split) into the same
  * counts→CvM stage the batch q302 uses — parity must be EXACT for every
  * micro-batch slicing, because the streaming aggregate in complete mode
  * re-emits full counts each trigger and [[Drift.cvmFromCounts]] is a pure
  * function of those counts.
  */
class CvmStreamSpec extends SparkSpec {
  import spark.implicits._

  private val splitE = 800L

  /** "flat" keeps the same uniform value spread in both phases — both phase
    * lengths are exact multiples of the 100-value cycle, so the empirical
    * CDFs coincide and CvM ≈ 0; "shift" moves its whole mass up in the eval
    * phase (CvM flags).
    */
  private def rows: Seq[(String, Long, Double)] = {
    val train = (0 until 800).flatMap { i =>
      Seq(("flat", i.toLong, (i % 100).toDouble),
        ("shift", i.toLong, (i % 100).toDouble))
    }
    val eval_ = (800 until 1000).flatMap { i =>
      Seq(("flat", i.toLong, (i % 100).toDouble),
        ("shift", i.toLong, 95.0 + (i % 5)))
    }
    train ++ eval_
  }

  private def counts(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("tr", (col("e") < splitE).cast("long"))
    .groupBy(col("event_type"), col("value"))
    .agg(sum(col("tr")).as("ca"), sum(lit(1L) - col("tr")).as("cb"))

  test("streamed eval counts yield the same CvM as batch across three slicings") {
    implicit val ctx = spark.sqlContext
    val rs = rows
    val batch = Drift.cvmFromCounts(counts(rs.toDF("event_type", "e", "value")))
      .select("event_type", "n_train", "n_eval", "cvm", "drifted")
      .as[(String, Long, Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    // semantics: the shifted series flags, the stable one does not
    assert(batch.find(_._1 == "shift").get._5)
    assert(!batch.find(_._1 == "flat").get._4.isNaN)
    assert(!batch.find(_._1 == "flat").get._5)

    val slicings = Seq(
      Seq(rs),
      Seq(rs.take(400), rs.slice(400, 1600), rs.drop(1600)), // splits inside train AND eval
      rs.grouped(700).toSeq)                                 // uneven tail batch
    for ((slices, i) <- slicings.zipWithIndex) {
      assert(slices.flatten.size == rs.size, s"slicing $i drops rows")
      val mem = MemoryStream[(String, Long, Double)]
      val name = s"cvm_counts_${i}_${System.nanoTime()}"
      val q = counts(mem.toDF().toDF("event_type", "e", "value"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      try {
        slices.foreach { s => mem.addData(s: _*); q.processAllAvailable() }
        val live = Drift.cvmFromCounts(spark.table(name))
          .select("event_type", "n_train", "n_eval", "cvm", "drifted")
          .as[(String, Long, Long, Double, Boolean)].collect().sortBy(_._1).toSeq
        assert(live === batch, s"slicing $i")
      } finally q.stop()
    }
  }
}
