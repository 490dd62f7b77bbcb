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
  * Artifacts (the per-round driver keeps only the LAST ~2000 chars of
  * stdout, which truncates a 374-query JSON line mid-object — observed as
  * `parsed: null` in BENCH_r06/r07.json):
  *   - BENCH.json          — full per-query min map (the historical shape).
  *   - BENCH_spread.json   — per-query {min, median, stdev, runs[]} so
  *                           run-to-run noise is measurable per query.
  *   - stdout, LAST line   — a COMPACT (<1.5 KB) JSON summary that survives
  *                           the tail capture intact: totals + slowest-10 +
  *                           pointers to the two file artifacts. The full
  *                           line is printed BEFORE it for full-capture
  *                           consumers.
  *
  * Override passes with SPARK_GRAFT_BENCH_WARMUP / SPARK_GRAFT_BENCH_RUNS.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val warmups = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "2").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
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
    def fmt(d: Double): String = BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val spread = ordered.map { case (name, _) =>
      val xs = passes.map(_(name)).sorted
      val n = xs.length
      val med = if (n % 2 == 1) xs(n / 2) else (xs(n / 2 - 1) + xs(n / 2)) / 2
      val mean = xs.sum / n
      val sd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / n)
      name -> (xs.head, med, sd, xs)
    }
    val results = spread.map { case (name, (mn, _, _, _)) => name -> mn }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val fullLine = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","warmups":$warmups,"runs":$runs}"""
    def writeFile(path: String, body: String): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(path),
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // A filtered run must not clobber the canonical full-surface artifact:
    // default the output elsewhere unless the caller names a path explicitly.
    val defaultOut = if (only.isDefined) "BENCH_partial.json" else "BENCH.json"
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", defaultOut)
    writeFile(out, fullLine)
    val spreadJson = spread.map { case (k, (mn, med, sd, xs)) =>
      s"\"" + k + "\":{\"min\":" + fmt(mn) + ",\"median\":" + fmt(med) +
        ",\"stdev\":" + fmt(sd) + ",\"runs\":[" + xs.map(fmt).mkString(",") + "]}"
    }.mkString("{", ",", "}")
    writeFile(out.stripSuffix(".json") + "_spread.json",
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","warmups":$warmups,"runs":$runs,"n_queries":${results.size},"queries":$spreadJson}""")
    val top = results.sortBy(-_._2).take(10)
      .map { case (k, v) => s"\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    println(fullLine)
    // compact final line — MUST stay well under the driver's 2000-char tail
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","sf":"$sfDir","warmups":$warmups,"runs":$runs,"n_queries":${results.size},"queries_file":"$out","spread_file":"${out.stripSuffix(".json")}_spread.json","slowest10":$top}""")
    spark.stop()
  }
}
