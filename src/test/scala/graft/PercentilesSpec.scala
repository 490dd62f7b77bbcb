package graft

import graft.ops.Percentiles
import org.apache.spark.sql.functions._

class PercentilesSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random doubles (no Random — repeatable across runs)
  private def vals(g: String, n: Int, seed: Int): Seq[(String, Double)] =
    (0 until n).map { i =>
      val x = ((i * 2654435761L + seed) & 0xffffff).toDouble / 1e4
      (g, x)
    }

  private def check(data: Seq[(String, Double)], qs: Seq[(String, Double)]): Unit = {
    val df = data.toDF("g", "v")
    val got = Percentiles.exactQuantiles(df, "g", "v", qs, nBuckets = 16)
      .select($"g", $"qname", $"qv").as[(String, String, Double)]
      .collect().map { case (g, q, v) => (g, q) -> v }.toMap
    val want = qs.flatMap { case (nm, q) =>
      df.groupBy($"g").agg(expr(s"percentile(v, $q)").as("p"))
        .as[(String, Double)].collect().map { case (g, p) => (g, nm) -> p }
    }.toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (k, v) => assert(v === want(k), s"quantile $k") }
  }

  test("count-and-locate equals Catalyst exact percentile on mixed groups") {
    val data = vals("a", 257, 7) ++ vals("b", 100, 13) ++ vals("c", 1, 1)
    check(data, Seq("p50" -> 0.5, "p90" -> 0.9, "p01" -> 0.01))
  }

  test("integral positions (no interpolation) and heavy ties") {
    // n = 5 -> pos integral at q=0.5; group t is one massive tie plus outliers
    val exact = Seq("a" -> 1.0, "a" -> 2.0, "a" -> 3.0, "a" -> 4.0, "a" -> 5.0)
    val ties = Seq.fill(99)(("t", 7.5)) ++ Seq("t" -> 0.0, "t" -> 100.0)
    check(exact ++ ties, Seq("p50" -> 0.5, "p90" -> 0.9))
  }

  test("all values identical in a group") {
    check(Seq.fill(10)(("k", 42.0)), Seq("p50" -> 0.5, "p99" -> 0.99))
  }

  test("quantile-sketch audit: estimates land inside the exact ±1pct bracket") {
    val data = (vals("a", 5000, 3) ++ vals("b", 3000, 11))
      .map { case (g, v) => (g, v) }
    val got = graft.ops.Sketches.quantileAccuracy(data.toDF("grp", "x"))
      .select($"grp", $"ok50", $"ok95", $"ok99")
      .as[(String, Boolean, Boolean, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(("a", true, true, true), ("b", true, true, true)))
  }

  test("NULL values are ignored, matching Catalyst percentile semantics") {
    // nulls interleaved with 1..5; counting them into n would shift every rank
    val df = Seq[(String, Option[Double])](
      "a" -> Some(1.0), "a" -> None, "a" -> Some(2.0), "a" -> Some(3.0),
      "a" -> None, "a" -> Some(4.0), "a" -> Some(5.0), "a" -> None)
      .toDF("g", "v")
    val got = Percentiles.exactQuantiles(df, "g", "v", Seq("p50" -> 0.5), nBuckets = 16)
      .select($"qv").as[Double].head()
    val want = df.agg(expr("percentile(v, 0.5)")).as[Double].head()
    assert(got === want)
    assert(got === 3.0)
  }
}
