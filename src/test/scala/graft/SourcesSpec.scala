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
}
