package graft

import graft.functions.DecimalDot

class DecimalDotSpec extends SparkSpec {
  import spark.implicits._

  test("decimal_dot matches the SQL higher-order-function formulation") {
    val df = Seq((Array(0.1, 0.2, 0.3), Array(0.4, 0.5, 0.6)))
      .toDF("a", "b")
    df.createOrReplaceTempView("dd")
    val native = df.select(DecimalDot($"a", $"b").as("d")).as[Double].head()
    val hof = spark.sql(
      """SELECT CAST(aggregate(zip_with(a, b, (x,y) -> CAST(x*y AS DECIMAL(18,16))),
        |  CAST(0 AS DECIMAL(18,16)), (acc,x) -> CAST(acc+x AS DECIMAL(18,16))) AS double)
        |FROM dd""".stripMargin).as[Double].head()
    assert(native === hof)
    assert(native === 0.32)
  }

  test("out-of-long-range inputs fall back to exact BigInteger, not garbage") {
    // each product = 1e10; scaled by 1e16 => 1e26 per term, far past Long.
    val big = Array.fill(4)(1e5)
    val d = Seq((big, big)).toDF("a", "b")
      .select(DecimalDot($"a", $"b").as("d")).as[Double].head()
    assert(d === 4e10)

    // accumulator overflow without per-term overflow: 2000 terms of ~0.81
    // (scaled 8.1e15 each; sum scaled 1.62e19 > Long.MaxValue 9.2e18)
    val unit = Array.fill(2000)(0.9)
    val d2 = Seq((unit, unit)).toDF("a", "b")
      .select(DecimalDot($"a", $"b").as("d")).as[Double].head()
    assert(math.abs(d2 - 1620.0) < 1e-9)
  }
}
