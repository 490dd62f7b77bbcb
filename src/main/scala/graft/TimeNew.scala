package graft

/** Ad-hoc per-query timer: runMain graft.TimeNew <sfDir> q1,q2,... —
  * 2 warmups + min-of-3, the bench protocol, on just the named queries.
  */
object TimeNew {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.getOrCreate(master = "local[32]",
      shufflePartitions = 32)
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      (1 to 2).foreach(_ => fn(spark, sfDir).count())
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$n%-28s $best%8.3f s")
    }
    spark.stop()
  }
}
