package graft

import java.nio.file.Files

import graft.sources.{ComponentSource, Predictions}

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("component tree ingest: schema inference + long-format read") {
    val root = Files.createTempDirectory("graft-compsrc")
    for (comp <- Seq("pump", "motor")) {
      val dir = root.resolve(comp)
      Files.createDirectories(dir)
      Files.writeString(dir.resolve("part-0.csv"),
        """Timestamp,s1,s2
          |2024-01-01 00:00:00,1.5,2.5
          |2024-01-01 00:01:00,3.0,4.0
          |""".stripMargin)
    }
    // heterogeneous third component: different column inventory
    val vdir = root.resolve("valve")
    Files.createDirectories(vdir)
    Files.writeString(vdir.resolve("part-0.csv"),
      """Timestamp,s9
        |2024-01-01 00:00:00,7.25
        |2024-01-01 00:01:00,8.75
        |""".stripMargin)
    val specs = ComponentSource.inferSchema(spark, root.toString)
    assert(specs.map(_.name) === Seq("motor", "pump", "valve"))
    assert(specs.head.columns.map(c => (c.name, c.dtype)) ===
      Seq(("Timestamp", "DATETIME"), ("s1", "DOUBLE"), ("s2", "DOUBLE")))

    val long = ComponentSource.readLong(spark, root.toString)
    assert(long.columns.toSeq === Seq("component", "sensor", "ts", "value"))
    assert(long.count() === 10) // 2 comps x 2 rows x 2 sensors + valve 2 x 1
    val pumpS1 = long.where($"component" === "pump" && $"sensor" === "s1")
      .select("value").as[Double].collect().sorted
    assert(pumpS1.toSeq === Seq(1.5, 3.0))
    assert(long.where($"component" === "valve").select("value").as[Double]
      .collect().sorted.toSeq === Seq(7.25, 8.75))
    // O(1) plan: ONE file scan regardless of component count (no N-way union)
    val nScans = "FileScan".r.findAllIn(long.queryExecution.executedPlan.toString).size
    assert(nScans === 1)
  }

  test("component with no timestamp column fails fast with a clear message") {
    val root = Files.createTempDirectory("graft-compsrc-nots")
    val dir = root.resolve("pump")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("part-0.csv"),
      """When,s1
        |2024-01-01 00:00:00,1.5
        |""".stripMargin)
    val ex = intercept[IllegalArgumentException] {
      ComponentSource.readLong(spark, root.toString)
    }
    assert(ex.getMessage.contains("pump"))
    assert(ex.getMessage.contains("Timestamp"))
  }

  test("partitioned sink: component directories + pruned read-back") {
    val root = Files.createTempDirectory("graft-sink")
    val long = Seq(
      ("pump", "s1", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
      ("motor", "s1", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 2.0))
      .toDF("component", "sensor", "ts", "value")
    graft.sources.Sink.writePartitioned(long, root.toString)
    assert(Files.exists(root.resolve("component=pump")))
    val back = graft.sources.Sink.readPartitioned(spark, root.toString)
    val pruned = back.where($"component" === "pump")
    // partition filter must resolve at plan time, not as a data filter
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() === 1)
    assert(scan.contains("PartitionFilters"))
  }

  test("JSONL predictions: schema'd read + diagnostics expansion") {
    // wire-format shapes: prediction=1 with score + diagnostics,
    // prediction=0 with score but no diagnostics (scheduler.py only expands
    // diagnostics for prediction=1), and a pre-2022 score-less line
    val f = Files.createTempFile("graft-preds", ".jsonl")
    Files.writeString(f,
      """{"timestamp":"2024-01-01T00:05:00.000Z","prediction":1,"anomaly_score":0.82,"diagnostics":[{"name":"pump\\s1","value":0.7},{"name":"pump\\s2","value":0.3}]}
        |{"timestamp":"2024-01-01T00:00:00.000Z","prediction":0,"anomaly_score":0.03}
        |{"timestamp":"2024-01-01T00:10:00.000Z","prediction":0}
        |""".stripMargin)
    val preds = Predictions.readJsonl(spark, f.toString)
    val long = Predictions.diagnosticsLong(preds)
    assert(long.count() === 4) // 2 diagnostics + 2 null-sensor placeholder rows
    assert(long.where($"sensor".isNull).count() === 2)
    val wide = Predictions.diagnosticsWide(preds)
    assert(wide.columns.toSeq ===
      Seq("ts", "prediction", "anomaly_score", "pump\\s1", "pump\\s2"))
    val rows = wide.collect()
    assert(rows.map(_.getInt(1)).toSeq === Seq(0, 1, 0)) // sorted by ts
    assert(rows(0).getDouble(2) === 0.03) // anomaly_score carried through
    assert(rows(1).getDouble(2) === 0.82)
    assert(rows(1).getDouble(3) === 0.7)
    assert(rows(2).isNullAt(2))          // pre-2022 line: score stays null
    assert(rows(0).isNullAt(3))          // prediction=0: no sensor columns
  }

  test("schema evolution: mergeSchema unions old and new parquet generations") {
    import org.apache.spark.sql.functions._
    // generation 1: (sensor, ts, value); generation 2 adds a quality flag —
    // the normal life of a 100 TB table that gained a column mid-history
    val dir = java.nio.file.Files.createTempDirectory("graft-evo").toString
    Seq(("s1", 1L, 10.0), ("s2", 2L, 20.0))
      .toDF("sensor", "ts", "value")
      .write.parquet(s"$dir/gen=1")
    Seq(("s1", 3L, 30.0, "good"), ("s2", 4L, 40.0, "bad"))
      .toDF("sensor", "ts", "value", "quality")
      .write.parquet(s"$dir/gen=2")

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("sensor", "ts", "value", "quality", "gen"))
    // old-generation rows read with the new column null-backfilled
    assert(merged.where($"quality".isNull).count() === 2)
    assert(merged.count() === 4)

    // filters still push into the scan across both generations
    val plan = merged.where($"ts" > 2L).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThan(ts,2)"),
      "ts filter did not push into the merged-schema scan")
    assert(merged.where($"ts" > 2L).count() === 2)
  }

  test("orc round trip: partitioned write, pruned pushdown read") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-orc")
      .resolve("data").toString
    val df = Seq(
      ("pump", 1L, 10.0), ("pump", 2L, 12.0), ("fan", 3L, 5.0)
    ).toDF("component", "ts", "value")
    df.write.partitionBy("component").orc(dir)

    val back = spark.read.orc(dir)
    assert(back.count() === 3)
    val q = back.where($"component" === "pump" && $"ts" >= 2L)
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // partition pruning handles component=, the ts filter reaches the ORC scan
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,2)"),
      "ts filter did not push into the ORC scan")
    assert(q.select(sum($"value")).as[Double].head() === 12.0)
  }
}
