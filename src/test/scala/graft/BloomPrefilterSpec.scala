package graft

import graft.ops.BloomPrefilter

class BloomPrefilterSpec extends SparkSpec {
  import spark.implicits._

  test("prefilter + join returns exactly the plain join's rows") {
    val fact = (1L to 20000L).map(i => (i % 1000, s"row$i")).toDF("k", "payload")
    val dim = Seq(7L, 42L, 999L).map(k => (k, s"dim$k")).toDF("k", "attr")

    val plain = fact.join(dim, "k").as[(Long, String, String)]
      .collect().toSet
    val pre = BloomPrefilter.prefilter(fact, dim, "k", expectedKeys = 10)
    val filtered = pre.join(dim, "k").as[(Long, String, String)]
      .collect().toSet
    assert(filtered === plain)
    assert(plain.size === 60) // 3 dim keys x 20 fact rows each
  }

  test("the prefilter actually cuts the fact volume") {
    val fact = (1L to 20000L).map(i => (i % 1000, s"row$i")).toDF("k", "payload")
    val dim = Seq(7L, 42L, 999L).map(k => (k, s"dim$k")).toDF("k", "attr")
    val kept = BloomPrefilter.prefilter(fact, dim, "k", expectedKeys = 10).count()
    // 60 true matches + fpp-bounded false positives, far below 20000
    assert(kept >= 60L && kept < 2000L, s"kept $kept of 20000")
  }
}
