package graft

import org.apache.spark.sql.functions._

/** SURVEY §4 claims AQE handles residual join skew at cluster scale; this
  * spec makes that claim TESTED rather than asserted (the counterpart of
  * SkewJoinSpec, which proves the manual salting path): a deliberately
  * skewed key must actually trigger AQE's skew-split on the executed plan —
  * the join node carries the `skew=true` marker only when
  * OptimizeSkewedJoin split the oversized partition into parallel reads.
  */
class AqeSkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("a deliberately skewed key triggers AQE skew-split in the final plan") {
    val pad = "x" * 128
    // one hot key carrying ~20k padded rows vs a 99-key long tail: with 4
    // shuffle partitions the hot partition dwarfs the median
    val left = ((1 to 20000).map(i => (1L, s"$pad$i")) ++
      (2L to 100L).flatMap(k => (1 to 20).map(i => (k, s"t$k-$i"))))
      .toDF("k", "payload")
    val right = (1L to 100L).map(k => (k, s"dim$k")).toDF("k", "attr")

    val prev = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> spark.conf.getOption("spark.sql.adaptive.skewJoin.skewedPartitionFactor"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> spark.conf.getOption("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> spark.conf.getOption("spark.sql.adaptive.advisoryPartitionSizeInBytes"))
    try {
      // no broadcast (skew-split only applies to shuffle joins) and
      // test-sized skew thresholds — production keeps the defaults
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")

      val joined = left.join(right, "k")
      // collect() drives THIS DataFrame's QueryExecution (count() would
      // spawn a separate one and leave this plan unexecuted/non-final)
      assert(joined.collect().length === 20000 + 99 * 20)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), s"expected an executed adaptive plan:\n$plan")
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the join skew-split in:\n$plan")
    } finally prev.foreach {
      case (key, Some(v)) => spark.conf.set(key, v)
      case (key, None) => spark.conf.unset(key)
    }
  }
}
