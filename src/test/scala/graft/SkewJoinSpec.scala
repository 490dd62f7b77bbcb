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
}
