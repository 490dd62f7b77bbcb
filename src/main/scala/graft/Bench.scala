package graft
import org.apache.spark.sql.SparkSession

/** Per-query wall-clock benchmark. Two untimed warmup passes first (the
  * first pays JIT + whole-stage-codegen compilation + filesystem cache; the
  * second lets the JIT finish re-profiling the hot paths it deoptimized
  * during the first), then three timed passes in name order keeping the
  * per-query MINIMUM. On a shared box single measurements swing 2-3× from
  * GC/scheduler jitter; the min over three steady-state passes is the
  * reproducible signal and is what BASELINE.md records.
  *
  * Override passes with SPARK_GRAFT_BENCH_WARMUP / SPARK_GRAFT_BENCH_RUNS.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val warmups = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "2").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    (1 to warmups).foreach { _ =>
      ordered.foreach { case (_, fn) =>
        try fn(spark, sfDir).count() catch { case _: Throwable => }
      }
    }
    def timedPass(): Map[String, Double] = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val passes = (1 to runs).map(_ => timedPass())
    val results = ordered.map { case (name, _) =>
      name -> passes.map(_(name)).min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","warmups":$warmups,"runs":$runs}"""
    println(line)
    // stdout tail-capture truncates past ~4 KB, which silently drops most of
    // the per-query map (154 queries ≈ 6 KB) — persist the full artifact to
    // a repo file so the numbers survive regardless of how stdout is caught
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
