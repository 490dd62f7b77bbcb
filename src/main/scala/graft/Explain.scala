package graft

import java.nio.file.{Files, Paths}

/** Dumps the formatted physical plan of every SparkEntry query to a file —
  * the review artifact for the perf pass (pushdown / broadcast / codegen
  * checks). Usage: runMain graft.Explain <sfDir> <outFile>
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outFile) = args
    val spark = GraftSession.getOrCreate(master = "local[4]", shufflePartitions = 4)
    val sb = new StringBuilder
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"==== $name ====\n").append(plan).append("\n")
    }
    Files.writeString(Paths.get(outFile), sb.toString)
    spark.stop()
  }
}
