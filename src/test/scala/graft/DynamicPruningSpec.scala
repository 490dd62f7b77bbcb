package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.sources.Sink
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** Dynamic partition pruning over the partitioned sink layout: when a fact
  * table partitioned by component joins a dimension filtered at runtime,
  * Spark injects a subquery-driven partition filter so the fact scan reads
  * ONLY the partitions the surviving dim keys name — at 100 TB the
  * difference between scanning the fleet and scanning two machines. The
  * spec asserts both the plan marker and the answer.
  */
class DynamicPruningSpec extends SparkSpec {
  import spark.implicits._

  test("join against a filtered dim prunes fact partitions dynamically") {
    val dir = Files.createTempDirectory("graft_dpp").toString
    val long = (for {
      comp <- Seq("pump0", "pump1", "pump2", "pump3")
      i <- 1 to 500
    } yield (comp, s"s${i % 4}", Timestamp.valueOf(s"2024-01-01 00:0${i % 6}:00"), i.toDouble))
      .toDF("component", "sensor", "ts", "value")
    Sink.writePartitioned(long, dir)

    // the dim must be a real source (not a constant-foldable local
    // relation) so the optimizer still sees a selective predicate over it
    val dimDir = Files.createTempDirectory("graft_dpp_dim").toString
    Seq(("pump0", "site_a"), ("pump1", "site_a"),
      ("pump2", "site_b"), ("pump3", "site_b")).toDF("component", "site")
      .write.mode("overwrite").parquet(dimDir)
    val dims = spark.read.parquet(dimDir)

    val fact = Sink.readPartitioned(spark, dir)
    val joined = fact
      .join(dims.where(col("site") === "site_a"), "component")
      .groupBy(col("component")).agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.explainString(FormattedMode)
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamicpruning partition filter in:\n$plan")

    val got = joined.orderBy("component").as[(String, Long)].collect().toSeq
    assert(got === Seq(("pump0", 500L), ("pump1", 500L)))
  }
}
