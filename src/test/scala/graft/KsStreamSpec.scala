package graft

import graft.ops.Drift
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming KS drift monitor: the live deployment streams per-value phase
  * counts (train/eval tagged against a frozen split) into the same
  * counts→KS stage batch q128 uses — parity must be EXACT for every
  * micro-batch slicing, because the streaming aggregate in complete mode
  * re-emits full counts each trigger and [[Drift.ksFromCounts]] is a pure
  * function of those counts. This is the third member of the factored
  * drift-stage family (PSI in DriftSpec, CvM in CvmStreamSpec) — KS's max
  * CDF gap is the one statistic of the three that depends on the ORDER of
  * distinct values, so the spec doubles as proof that the window sort
  * inside ksFromCounts is insensitive to arrival order.
  */
class KsStreamSpec extends SparkSpec {
  import spark.implicits._

  private val splitE = 800L

  /** "flat" keeps the same uniform value spread in both phases — CDFs
    * coincide, KS stays under threshold; "shift" moves its whole eval mass
    * into the top of the range, so the max CDF gap is large and flags.
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

  test("streamed eval counts yield the same KS as batch across three slicings") {
    implicit val ctx = spark.sqlContext
    val rs = rows
    val batch = Drift.ksFromCounts(counts(rs.toDF("event_type", "e", "value")))
      .select("event_type", "n_train", "n_eval", "ks", "threshold", "drifted")
      .as[(String, Long, Long, Double, Double, Boolean)]
      .collect().sortBy(_._1).toSeq
    // semantics: the shifted series flags, the stable one does not
    assert(batch.find(_._1 == "shift").get._6)
    assert(!batch.find(_._1 == "flat").get._6)
    assert(batch.find(_._1 == "flat").get._4 < batch.find(_._1 == "flat").get._5)

    val slicings = Seq(
      Seq(rs),
      Seq(rs.take(400), rs.slice(400, 1600), rs.drop(1600)), // splits inside train AND eval
      rs.grouped(700).toSeq)                                 // uneven tail batch
    for ((slices, i) <- slicings.zipWithIndex) {
      assert(slices.flatten.size == rs.size, s"slicing $i drops rows")
      val mem = MemoryStream[(String, Long, Double)]
      val name = s"ks_counts_${i}_${System.nanoTime()}"
      val q = counts(mem.toDF().toDF("event_type", "e", "value"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      try {
        slices.foreach { s => mem.addData(s: _*); q.processAllAvailable() }
        val live = Drift.ksFromCounts(spark.table(name))
          .select("event_type", "n_train", "n_eval", "ks", "threshold",
            "drifted")
          .as[(String, Long, Long, Double, Double, Boolean)]
          .collect().sortBy(_._1).toSeq
        assert(live === batch, s"slicing $i")
      } finally q.stop()
    }
  }

  test("KS stage is arrival-order independent: reversed and shuffled " +
       "count rows give identical statistics") {
    val rs = rows
    val base = counts(rs.toDF("event_type", "e", "value")).collect().toSeq
    def ks(rows: Seq[org.apache.spark.sql.Row]) = {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 7),
        base.head.schema)
      Drift.ksFromCounts(df)
        .select("event_type", "ks", "drifted")
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
        .sortBy(_._1).toSeq
    }
    assert(ks(base.reverse) === ks(base))
    assert(ks(scala.util.Random.shuffle(base)) === ks(base))
  }
}
