package graft

import graft.ops.Curation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The deterministic hash-based sampler is a stateless projection+filter,
  * so the SAME plan runs unchanged under Structured Streaming — documents
  * arriving on a stream are kept or dropped identically to a batch run
  * over the same rows (the property that lets corpus curation move from
  * nightly batch to continuous ingestion without a rewrite).
  */
class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  test("stratified sampling on a stream equals the batch decision") {
    implicit val ctx = spark.sqlContext
    val rows = (0L until 200L).map(i =>
      (i, s"doc $i", if (i % 3 == 0) "en" else "de", "s0", 10L))

    val mem = MemoryStream[(Long, String, String, String, Long)]
    val streamed = Curation.stratifiedSample(
      mem.toDF().toDF("doc_id", "text", "lang", "source", "n_chars"))
    val q = streamed.writeStream
      .format("memory").queryName("sampled").outputMode("append").start()
    try {
      mem.addData(rows.take(120))
      q.processAllAvailable()
      mem.addData(rows.drop(120))
      q.processAllAvailable()

      val got = spark.table("sampled")
        .as[(Long, String, Long)].collect().toSet
      val want = Curation.stratifiedSample(
        rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
        .as[(Long, String, Long)].collect().toSet
      assert(got === want)
      assert(want.nonEmpty && want.size < rows.size)
    } finally q.stop()
  }
}
