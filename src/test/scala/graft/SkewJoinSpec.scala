package graft

import graft.ops.SkewJoin

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join's rows under heavy skew") {
    // 10k rows of one hot key + a long tail
    val left = ((1 to 10000).map(i => (1L, s"hot$i")) ++
      (2L to 100L).map(k => (k, s"tail$k"))).toDF("k", "payload")
    val right = (1L to 100L).map(k => (k, s"dim$k")).toDF("k", "attr")

    val plain = left.join(right, "k").orderBy("k", "payload")
      .as[(Long, String, String)].collect().toSeq
    val salted = SkewJoin.saltedJoin(left, right, "k").orderBy("k", "payload")
      .as[(Long, String, String)].collect().toSeq
    assert(salted === plain)
    assert(salted.size === 10099)
  }

  test("fully duplicate hot-key rows still spread across salts") {
    // The degenerate skew shape: 10k IDENTICAL rows. A salt computed from
    // column values alone would map them all to one reducer.
    val left = Seq.fill(10000)((1L, "same")).toDF("k", "payload")
      .repartition(8)
    val right = Seq((1L, "dim")).toDF("k", "attr")

    import org.apache.spark.sql.functions._
    val salts = left
      .withColumn("_salt",
        pmod(hash(left.columns.map(col) :+ monotonically_increasing_id(): _*),
             lit(8)))
      .select(countDistinct("_salt")).as[Long].head()
    assert(salts > 1, s"expected duplicate rows to spread, got $salts salt(s)")

    // and the join result is still exactly the plain join
    val joined = SkewJoin.saltedJoin(left, right, "k")
    assert(joined.count() === 10000L)
  }
}
