package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Per-query orchestration profiler — counts Spark jobs, stages, tasks and
  * summed task time for each named query, next to its wall time. At sf0.1
  * most suite inputs are tiny, so wall − task-time ≈ scheduling/planning/
  * materialization overhead; a query whose wall is dominated by job COUNT
  * (many eager localCheckpoints / iterative rounds) shows up here
  * directly. Usage: runMain graft.Profile <sfDir> <q1,q2,...>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args(1).split(",").toSet
      else Set.empty[String]
    val spark = GraftSession.getOrCreate()
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskNanos = new AtomicLong
    // SPARK_GRAFT_PROFILE_JOBS=1: one line per job with its callsite and
    // task count — attributes the per-query job count to specific actions
    val verbose = sys.env.get("SPARK_GRAFT_PROFILE_JOBS").contains("1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) {
          val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
          val nt = j.stageInfos.map(_.numTasks).sum
          println(f"  job ${j.jobId}%4d tasks=$nt%4d  $site")
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null)
          taskNanos.addAndGet(t.taskInfo.duration * 1000000L)
      }
    })
    val sel = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names.contains(n) }
    // one warmup so JIT/codegen noise doesn't masquerade as overhead
    sel.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => } }
    ops.SharedState.clear()
    println(f"${"query"}%-32s ${"wall_s"}%8s ${"jobs"}%6s ${"stages"}%7s ${"tasks"}%7s ${"task_s"}%8s")
    sel.foreach { case (name, fn) =>
      jobs.set(0); stages.set(0); tasks.set(0); taskNanos.set(0)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count() catch { case e: Throwable =>
        println(s"$name FAILED: ${e.getMessage}") }
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; small settle pause
      Thread.sleep(200)
      println(f"$name%-32s $wall%8.2f ${jobs.get}%6d ${stages.get}%7d ${tasks.get}%7d ${taskNanos.get / 1e9}%8.2f")
    }
    spark.stop()
  }
}
