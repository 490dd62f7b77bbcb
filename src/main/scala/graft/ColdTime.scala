package graft

/** Cold single-pass timer for the decade rehearsals:
  * runMain graft.ColdTime <sfDir> q1,q2,... — one pass per query, no
  * warmups, printed in run order. Used with the SAME protocol on both
  * sides of a scale ratio (sf10 vs sf100) so the shared-JVM JIT penalty
  * cancels in the ratio, as BASELINE_sf10.md established.
  */
object ColdTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.getOrCreate(master = "local[32]",
      shufflePartitions = 32)
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(n)(spark, sfDir).count()
      println(f"$n%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$rows")
    }
    spark.stop()
  }
}
