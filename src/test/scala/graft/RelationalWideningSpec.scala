package graft

import org.apache.spark.sql.functions._
import graft.ops.{Graph, Relational}

/** Known-answer checks for the q216-q220 widening: unpivot, RANGE frames,
  * MoM growth, modularity, grouping sets.
  */
class RelationalWideningSpec extends SparkSpec {
  import spark.implicits._

  test("modularity of two disjoint triangles is 1/2") {
    // two triangles: {1,2,3} and {4,5,6}; perfect partition
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L)).toDF("u", "v")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L), (6L, 4L)).toDF("id", "label")
    val out = Graph.modularity(edges, labels).collect()
    assert(out.length == 2)
    // each community: e_c=3, m=6, d_c=6 -> 3/6 - (6/12)^2 = 0.25; Q=0.5
    assert(out.forall(r => math.abs(r.getAs[Double]("contrib") - 0.25) < 1e-9))
    assert(out.forall(r => math.abs(r.getAs[Double]("modularity") - 0.5) < 1e-9))
  }

  test("one-community partition scores Q=0, below the clean split") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L)).toDF("u", "v")
    val allOne = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 1L), (5L, 1L), (6L, 1L)).toDF("id", "label")
    val q = Graph.modularity(edges, allOne)
      .collect().head.getAs[Double]("modularity")
    // every edge internal but degree term eats it all: Q = 1 - 1 = 0
    assert(math.abs(q) < 1e-9)
  }

  test("rangeFrameRevenue RANGE frame spans days, not rows") {
    val orders = Seq(
      (1L, 10L, "O", 100.0, 0L), // day 0
      (2L, 10L, "O", 50.0, 10L * 86400), // day 10 (within 30 of day 0)
      (3L, 10L, "O", 25.0, 50L * 86400)) // day 50 (outside both)
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "sec")
      .withColumn("o_orderdate", expr("timestamp_seconds(sec)"))
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .drop("sec")
    val out = Relational.rangeFrameRevenue(spark, orders)
      .orderBy(col("d")).collect()
    assert(out.map(_.getAs[Double]("rev30")).toSeq == Seq(100.0, 150.0, 25.0))
    assert(out.map(_.getAs[Long]("days30")).toSeq == Seq(1L, 2L, 1L))
  }

  test("columnProfile reports nulls, distincts, canonical min/max") {
    val out = Relational.columnProfile(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    assert(out.size == 6)
    assert(out.values.forall(_.getAs[Long]("n_nulls") == 0))
    assert(out("l_returnflag").getAs[Long]("n_distinct") == 3)
    // decimal-canonicalized numeric rendering has the fixed scale
    assert(out("l_quantity").getAs[String]("min_s").matches("""\d+\.\d{4}"""))
  }

  test("fkOrphans finds zero orphans on the consistent star schema") {
    val out = Relational.fkOrphans(spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 3)
    assert(out.forall(_.getAs[Long]("n_orphans") == 0))
    assert(out.forall(_.getAs[Double]("orphan_frac") == 0.0))
  }

  test("paretoFrontier keeps only undominated (price, qty) points") {
    val out = Relational.paretoFrontier(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    // pairwise non-dominance: no frontier point is cheaper AND
    // higher-volume than another
    for (a <- out; b <- out if a != b) {
      val dom = a.getAs[Double]("unit_price") <= b.getAs[Double]("unit_price") &&
        a.getAs[Double]("max_qty") >= b.getAs[Double]("max_qty")
      assert(!dom || (a.getAs[Double]("unit_price") == b.getAs[Double]("unit_price")
        && a.getAs[Double]("max_qty") == b.getAs[Double]("max_qty")))
    }
  }

  test("lorenzDeciles shares are monotone and end at 1.0") {
    val out = Relational.lorenzDeciles(spark, "/root/testdata/sf0.001")
      .orderBy(col("decile")).collect()
    assert(out.length == 10)
    val shares = out.map(_.getAs[Double]("cum_share"))
    assert(shares.sliding(2).forall(p => p(0) <= p(1)))
    assert(math.abs(shares.last - 1.0) < 1e-9)
    // top decile holds a disproportionate share
    assert(1.0 - shares(8) > 0.1)
  }

  test("weightedMedianPrice sits where half the revenue accumulates") {
    val out = Relational.weightedMedianPrice(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length == 3)
    assert(out.forall(_.getAs[Double]("weighted_median_price") > 0))
  }

  test("entropyRate is 0 for a deterministic chain, ln k for uniform") {
    val sf = "/root/testdata/sf0.001"
    val out = graft.ops.Ranges.entropyRate(spark, sf).collect()
    assert(out.nonEmpty)
    val hr = out.head.getAs[Double]("h_rate")
    // 5 event types: entropy rate bounded by ln 5, above 0 on real data
    assert(hr > 0.0 && hr <= math.log(5.0) + 1e-9)
    // h_rate is a weighted mean of h_cond values
    val conds = out.map(_.getAs[Double]("h_cond"))
    assert(hr <= conds.max + 1e-9 && hr >= conds.min - 1e-9)
    // pis sum to 1
    assert(math.abs(out.map(_.getAs[Double]("pi")).sum - 1.0) < 1e-4)
  }

  test("hoppingPeaks windows overlap and never under-count the peak hour") {
    val sf = "/root/testdata/sf0.001"
    val peaks = graft.ops.Ranges.hoppingPeaks(spark, sf).collect()
    assert(peaks.nonEmpty)
    // rank-1 window per type has the max count, starts at a 15-min grid
    peaks.filter(_.getAs[Int]("rnk") == 1).foreach { r =>
      assert(r.getAs[Long]("win_start") % 900 == 0)
    }
    peaks.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val byRnk = rs.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Long]("n_events"))
      assert(byRnk.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    }
  }

  test("groupingSetsMix gid decodes the grouping set membership") {
    val out = Relational.groupingSetsMix(spark, "/root/testdata/sf0.001")
      .collect()
    // gid 1: (rflag, lstatus) grouped, year aggregated... our sets:
    // (rflag,year)->gid 2, (lstatus,year)->gid 4, (year)->gid 6, ()->7
    val gids = out.map(_.getAs[Int]("gid")).toSet
    assert(gids == Set(2, 4, 6, 7))
    val grand = out.filter(_.getAs[Int]("gid") == 7)
    assert(grand.length == 1)
    val n = grand.head.getAs[Long]("n")
    // grand total row counts every lineitem
    val expected = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet").count()
    assert(n == expected)
  }

  test("eventDedupCensus counts same-bucket repeats as duplicates") {
    val rows = Seq(
      // two identical payloads 10s apart (same 5-min bucket) + one distinct
      (1L, 10L, 1L, "click", 5.0), (2L, 20L, 1L, "click", 5.0),
      (3L, 30L, 1L, "click", 7.0),
      // same payload but in the NEXT bucket -> not a duplicate
      (4L, 310L, 1L, "view", 5.0), (5L, 10L, 1L, "view", 5.0))
      .map { case (e, sec, u, t, v) =>
        (e, new java.sql.Timestamp(sec * 1000L), u, t, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val m = Relational.eventDedupCensus(rows).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(m("click").getAs[Long]("n_raw") == 3)
    assert(m("click").getAs[Long]("n_unique") == 2)
    assert(m("view").getAs[Long]("n_unique") == 2)
    assert(m("view").getAs[Double]("dup_rate") == 0.0)
  }

  test("rfmSegments puts the dominant customer in segment 111") {
    // customer 1: most recent, most orders, highest spend -> quintile 1
    // on all three axes; 5 customers, one per quintile
    val rows = (1 to 5).flatMap { c =>
      (1 to (6 - c)).map { k =>
        (c * 100L + k, c.toLong,
          java.sql.Timestamp.valueOf(f"2024-01-${c * 5}%02d 00:00:00"),
          (6 - c) * 100.0)
      }
    }.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      // recency: customer 5 ordered latest -> invert so c1 is most recent
      .withColumn("o_orderdate",
        expr("timestamp_seconds(86400 * (40 - 5 * o_custkey))"))
    val m = Relational.rfmSegments(rows).collect()
      .map(r => r.getAs[Int]("segment") -> r.getAs[Long]("n_customers"))
      .toMap
    assert(m(111) == 1) // customer 1 best on all axes
    assert(m(555) == 1) // customer 5 worst on all axes
    assert(m.values.sum == 5)
  }

  test("againstTide counts only sign-opposed customer deltas") {
    // nation A: customers 1 (+100) and 2 (-300) -> tide -200; customer 1
    // moves against it. nation B: both up -> tide up, nobody against.
    val orders = Seq(
      (1L, 1L, 1996, 100.0), (2L, 1L, 1997, 200.0),   // c1: +100
      (3L, 2L, 1996, 500.0), (4L, 2L, 1997, 200.0),   // c2: -300
      (5L, 3L, 1996, 50.0), (6L, 3L, 1997, 80.0),     // c3: +30
      (7L, 4L, 1997, 10.0))                           // c4: +10 (new)
      .map { case (ok, ck, yr, p) =>
        (ok, ck, java.sql.Timestamp.valueOf(s"$yr-06-01 00:00:00"), p) }
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val cust = Seq((1L, 10L), (2L, 10L), (3L, 20L), (4L, 20L))
      .toDF("c_custkey", "c_nationkey")
    val nat = Seq((10L, "A"), (20L, "B")).toDF("n_nationkey", "n_name")
    val m = Relational.againstTide(orders, cust, nat).collect()
      .map(r => r.getAs[String]("nation") -> r).toMap
    assert(m("A").getAs[Double]("nation_delta") == -200.0)
    assert(m("A").getAs[Long]("n_up_against") == 1)
    assert(m("A").getAs[Long]("n_down_against") == 0)
    assert(m("B").getAs[Long]("n_up_against") == 0)
    assert(m("B").getAs[Long]("n_down_against") == 0)
  }

  test("priceVolumeMix decomposes the revenue delta exactly") {
    // nation A: 1996 sells 10 units for 100; 1997 sells 20 units for 300.
    // p1=10, p2=15 -> volume = (20-10)*10 = 100, price = 20*5 = 100,
    // delta_rev = 200 = volume + price
    val li = Seq((1L, 10.0, 100.0), (2L, 20.0, 300.0))
      .toDF("l_orderkey", "l_quantity", "l_extendedprice")
    val ord = Seq(
      (1L, 1L, java.sql.Timestamp.valueOf("1996-06-01 00:00:00")),
      (2L, 1L, java.sql.Timestamp.valueOf("1997-06-01 00:00:00")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val cust = Seq((1L, 10L)).toDF("c_custkey", "c_nationkey")
    val nat = Seq((10L, "A")).toDF("n_nationkey", "n_name")
    val r = Relational.priceVolumeMix(li, ord, cust, nat).collect().head
    assert(r.getAs[Double]("delta_rev") == 200.0)
    assert(r.getAs[Double]("volume_effect") == 100.0)
    assert(r.getAs[Double]("price_effect") == 100.0)
  }

  test("fanoutProfile buckets keys by power-of-2 fan-out") {
    // orders->lineitem: order 1 has 1 item (bucket 1), order 2 has 5
    // (bucket 4), order 3 has 8 (bucket 8)
    val li = (Seq.fill(1)(1L) ++ Seq.fill(5)(2L) ++ Seq.fill(8)(3L))
      .zipWithIndex.map { case (ok, i) => (ok, i.toLong) }
      .toDF("l_orderkey", "l_linenumber")
    val ord = Seq((1L, 7L), (2L, 7L), (3L, 8L))
      .toDF("o_orderkey", "o_custkey")
    val rows = Relational.fanoutProfile(ord, li).collect()
      .filter(_.getAs[String]("relation") == "orders->lineitem")
      .map(r => r.getAs[Long]("bucket") ->
        ((r.getAs[Long]("keys_in_bucket"), r.getAs[Long]("max_fanout"))))
      .toMap
    assert(rows == Map(1L -> ((1L, 1L)), 4L -> ((1L, 5L)), 8L -> ((1L, 8L))))
  }

  test("rollupConsistency: merged day rows equal the direct month exactly") {
    val orders = Seq(
      (1L, "1996-01-01", 10.01), (2L, "1996-01-01", 20.02),
      (3L, "1996-01-15", 0.03), (4L, "1996-02-01", 5.55))
      .map { case (ok, d, p) =>
        (ok, java.sql.Timestamp.valueOf(d + " 00:00:00"), p) }
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val out = Relational.rollupConsistency(orders).collect()
    assert(out.length == 2)
    assert(out.forall(_.getAs[Boolean]("consistent")))
    val jan = out.find(_.getAs[Int]("mo") == 1).get
    assert(jan.getAs[Long]("n_days") == 2)
    assert(jan.getAs[Double]("rev_merged") == 30.06)
  }

  test("basketConfidence is asymmetric: conf(a->b) != conf(b->a)") {
    // part 1 in 4 orders, part 2 in 2 orders, together in 2 orders:
    // conf(1->2) = 2/4 = 0.5, conf(2->1) = 2/2 = 1.0
    val li = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (3L, 2L), (4L, 2L))
      .toDF("l_orderkey", "l_partkey")
    val m = Relational.basketConfidence(li).collect()
      .map(r => (r.getAs[Long]("ante"), r.getAs[Long]("cons")) ->
        r.getAs[Double]("conf")).toMap
    assert(m((1L, 2L)) == 0.5)
    assert(m((2L, 1L)) == 1.0)
  }
}
