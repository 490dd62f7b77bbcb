package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter semi-join prefilter: shrink a huge fact table BEFORE an
  * expensive downstream (wide aggregation, multi-join pipeline, a shuffle
  * AQE can't see past) using a compact membership sketch of the dimension's
  * join keys.
  *
  * When the dimension side is small enough to broadcast exactly, a
  * broadcast left-semi join is strictly better — use that. This operator is
  * for the middle regime: too many distinct keys to ship as an exact set
  * (say 10⁸ order ids → GBs as a hash set) but fine as a bloom filter
  * (~120 MB at 1% fpp), which every executor can hold. The filter is
  * conservative (false positives only), so it NEVER changes join results —
  * it just cuts the rows that reach the real join; the join itself stays in
  * the plan for exactness. Spark's own InjectRuntimeFilter applies this
  * automatically inside one query when statistics justify it; the explicit
  * operator covers multi-stage pipelines (filter once, reuse across several
  * downstream queries) where the optimizer can't.
  */
object BloomPrefilter {

  /** Build a bloom over `dim[key]`, keep only `fact` rows whose key might
    * be present. `expectedKeys`/`fpp` size the sketch — see
    * [[org.apache.spark.util.sketch.BloomFilter]] for the bits formula.
    */
  def prefilter(fact: DataFrame, dim: DataFrame, key: String,
                expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val bf: BloomFilter = dim.stat.bloomFilter(key, expectedKeys, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bf)
    // a UDF is acceptable here: no Catalyst built-in tests bloom membership,
    // and the call is one branch-free hash probe per row
    val mightContain = udf((k: Long) => bc.value.mightContain(k))
    fact.where(col(key).isNotNull && mightContain(col(key)))
  }
}
