package graft

import java.nio.file.Files

import graft.sources.ZOrder
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("morton16 interleaves bits exactly") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 3L),
      (65535L, 0L), (0L, 65535L))
      .toDF("a", "b")
      .select(ZOrder.morton16(col("a"), col("b")).as("z"))
      .as[Long].collect().toSeq
    assert(got === Seq(0L, 1L, 2L, 3L, 15L, 0x55555555L, 0xAAAAAAAAL))
  }

  test("z-ordered files are tight on BOTH keys; single-key sort is not") {
    // a 64x64 grid of points — two independent dimensions
    val pts = (for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toLong * 1024, y.toLong * 1024)).toDF("ka", "kb")

    def perFileSpread(path: String, key: String): Double = {
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      val spreads = files.map { f =>
        val r = spark.read.parquet(f).agg(
          (max(col(key)) - min(col(key))).cast("double")).as[Double].head()
        r
      }
      spreads.sum / spreads.length
    }

    val zdir = Files.createTempDirectory("graft_zorder").toString
    ZOrder.writeZOrdered(pts, zdir, "ka", "kb", nFiles = 16)

    val sdir = Files.createTempDirectory("graft_sorted").toString
    pts.repartitionByRange(16, col("ka")).sortWithinPartitions(col("ka"))
      .write.mode("overwrite").parquet(sdir)

    // sorted-by-ka: each file spans ALL of kb (spread ~64*1024); z-order
    // bounds both dimensions, so its kb spread per file must be far tighter
    val zSpreadB = perFileSpread(zdir, "kb")
    val sSpreadB = perFileSpread(sdir, "kb")
    assert(zSpreadB < sSpreadB / 2,
      s"z-order kb spread $zSpreadB not tighter than sorted $sSpreadB")
    // and ka stays reasonably tight too (not worse than 2x the full range / 4)
    val zSpreadA = perFileSpread(zdir, "ka")
    assert(zSpreadA < 64 * 1024 / 2, s"z-order ka spread too wide: $zSpreadA")
  }
}
