package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Prefix

/** Prefix.over must be BIT-IDENTICAL to the single-task unpartitioned
  * window it replaces, for every bucket count (bucket boundaries must not
  * be observable), including tie groups and the exclusive-frame NULL on
  * the global first row. ntileFromRowNumber must reproduce SQL ntile
  * semantics exactly for uneven splits.
  */
class PrefixSpec extends SparkSpec {
  import spark.implicits._

  // keys with ties in v; unique id tie-break makes the order total
  private lazy val df = Seq(
    (1L, 5.0), (2L, 3.0), (3L, 5.0), (4L, 1.0), (5L, 3.0),
    (6L, 9.0), (7L, 1.0), (8L, 7.0), (9L, 3.0), (10L, 5.0),
    (11L, 2.0), (12L, 8.0), (13L, 2.0))
    .toDF("id", "v")

  test("distributed prefix sum + row number match the single-task window") {
    val order = Seq(col("v").desc, col("id"))
    val w = Window.orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val expect = df
      .withColumn("cum", sum(col("v")).over(w))
      .withColumn("rn", row_number().over(w).cast("long"))
      .orderBy(col("id"))
      .select(col("id"), col("cum"), col("rn"))
      .collect().toSeq
    for (buckets <- Seq(1, 3, 4, 32)) {
      val got = Prefix.over(df, order,
          Seq(Prefix.Agg(col("v"), "cum"), Prefix.rowNumber("rn")), buckets)
        .orderBy(col("id"))
        .select(col("id"), col("cum"), col("rn"))
        .collect().toSeq
      assert(got == expect, s"buckets=$buckets")
    }
  }

  test("distributed exclusive prefix max matches, NULL on the first row") {
    val order = Seq(col("v"), col("id"))
    val w = Window.orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val expect = df.withColumn("prior", max(col("v")).over(w))
      .orderBy(col("id")).select(col("id"), col("prior")).collect().toSeq
    for (buckets <- Seq(1, 4, 32)) {
      val got = Prefix.over(df, order,
          Seq(Prefix.Agg(col("v"), "prior", "max", inclusive = false)), buckets)
        .orderBy(col("id")).select(col("id"), col("prior")).collect().toSeq
      assert(got == expect, s"buckets=$buckets")
      // global first row in the (v, id) order is id=4 — empty frame, NULL
      assert(got.find(_.getLong(0) == 4L).get.isNullAt(1),
        "global first row must be NULL")
    }
  }

  test("ntileFromRowNumber reproduces ntile for uneven splits") {
    for (n <- Seq(3, 10, 13, 25, 100); k <- Seq(3, 5, 10)) {
      val rows = spark.range(1, n + 1).toDF("id")
      val expect = rows
        .withColumn("t", ntile(k).over(Window.orderBy(col("id"))))
        .orderBy(col("id")).select(col("t")).as[Int].collect().toSeq
      val got = rows
        .withColumn("t", Prefix.ntileFromRowNumber(col("id"), lit(n), k))
        .orderBy(col("id")).select(col("t")).as[Int].collect().toSeq
      assert(got == expect, s"n=$n k=$k")
    }
  }
}
