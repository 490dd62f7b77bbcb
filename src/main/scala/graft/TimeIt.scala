package graft

import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the slowest bench query. */
object TimeIt {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    val docs = Tables.documents(spark, sfDir)
    time("scan+spread")(docs.count())
    val toks = docs.select(col("doc_id"),
      explode(split(ops.Dedup.normText(col("text")), " ")).as("tok"))
    time("explode tokens")(toks.count())
    val tc = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    time("tokCounts groupBy")(tc.count())
    time("full simhash")(ops.Dedup.simhash(docs).count())
    time("full simhash again")(ops.Dedup.simhash(docs).count())
    spark.stop()
  }
}
