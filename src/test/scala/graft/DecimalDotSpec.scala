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

  test("integer fast path is bit-identical to the BigDecimal reference") {
    // reference: the pre-optimization per-term semantics — the double's
    // EXACT binary value, HALF_UP at scale 16, exact accumulation
    def refDot(a: Array[Double], b: Array[Double]): Double = {
      var acc = java.math.BigInteger.ZERO
      a.indices.foreach { i =>
        val p = a(i) * b(i)
        if (p != 0.0)
          acc = acc.add(new java.math.BigDecimal(p)
            .setScale(16, java.math.RoundingMode.HALF_UP).unscaledValue())
      }
      new java.math.BigDecimal(acc, 16).doubleValue()
    }
    val rnd = new scala.util.Random(421)
    val cases = Seq.tabulate(200) { c =>
      val n = 1 + rnd.nextInt(64)
      val gen: () => Double = c % 5 match {
        case 0 => () => rnd.nextDouble() * 2 - 1                 // unit scale
        case 1 => () => (rnd.nextDouble() * 2 - 1) * 1e-12       // tiny
        case 2 => () => (rnd.nextDouble() * 2 - 1) * 1e6         // large → fallback
        case 3 => () => java.lang.Double.longBitsToDouble(rnd.nextLong() & 0x000fffffffffffffL) // denormals
        case 4 => () => // exact-half ties at scale 16
          val k = rnd.nextInt(20) - 10
          (rnd.nextInt(1000) + 0.5) * 1e-16 * math.pow(2, k)
      }
      (Array.fill(n)(gen()), Array.fill(n)(gen()))
    } ++ Seq(
      (Array(0.0, -0.0, 1e-300), Array(5.0, 5.0, 1e-300)),       // underflow-to-0 terms
      (Array(0.1, 0.2, 0.3), Array(0.4, 0.5, 0.6)))
    cases.foreach { case (a, b) =>
      val native = Seq((a, b)).toDF("a", "b")
        .select(DecimalDot($"a", $"b").as("d")).as[Double].head()
      val ref = refDot(a, b)
      assert(java.lang.Double.doubleToRawLongBits(native)
        === java.lang.Double.doubleToRawLongBits(ref),
        s"mismatch: native=$native ref=$ref a=${a.toSeq} b=${b.toSeq}")
    }
  }
}
