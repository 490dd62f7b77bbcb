package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) write layout: interleave the bits of two sort
  * keys so files are locally tight in BOTH dimensions at once. A layout
  * sorted by one column prunes scans filtered on that column only; a
  * z-ordered layout gives every file a narrow min/max envelope on both
  * keys, so parquet row-group statistics prune filters on either (the
  * standard lakehouse trick for multi-tenant time-series: cluster by
  * (tenant, time) without picking a loser).
  *
  * All pure built-in column arithmetic (shifts + masks) — codegen'd, no
  * UDF; the caller quantizes each key into [0, 65535] first (rank, bucket
  * index, or epoch-scaled), which is what bounds the interleave.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to even bit positions (classic
    * magic-mask bit dilation).
    */
  private def spread(c: Column): Column = {
    val x0 = c.cast("long").bitwiseAND(lit(0xFFFFL))
    val x1 = (x0.bitwiseOR(shiftleft(x0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val x2 = (x1.bitwiseOR(shiftleft(x1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = (x2.bitwiseOR(shiftleft(x2, 2))).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit-clamped non-negative keys; `a` takes
    * the even bits, `b` the odd bits.
    */
  def morton16(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** Write `df` as `nFiles` parquet files range-partitioned AND sorted by
    * the Morton code of the two (pre-quantized) keys.
    */
  def writeZOrdered(df: DataFrame, path: String, keyA: String, keyB: String,
                    nFiles: Int): Unit =
    df.withColumn("_z", morton16(col(keyA), col(keyB)))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
}
