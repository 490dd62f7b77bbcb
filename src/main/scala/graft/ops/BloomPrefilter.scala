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
    * be present. `expectedKeys`/`fpp` size the sketch via the standard
    * optimal-bits formula (same sizing as
    * [[org.apache.spark.util.sketch.BloomFilter]]).
    *
    * The sketch is built and probed entirely with Catalyst's own
    * `bloom_filter_agg` / `might_contain` expressions — the same pair
    * Spark's InjectRuntimeFilter plants — so the probe stays inside
    * whole-stage codegen (the aggregate ships to executors as a scalar
    * subquery result, exactly like a runtime filter). Keys are hashed with
    * xxhash64 on BOTH sides; `might_contain` on a NULL hash returns NULL,
    * which `where` treats as drop — matching semi-join semantics for NULL
    * keys.
    */
  def prefilter(fact: DataFrame, dim: DataFrame, key: String,
                expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val numBits = BloomFilter.create(expectedKeys, fpp).bitSize()
    val spark = fact.sparkSession
    val viewName = s"graft_bloom_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    dim.select(xxhash64(col(key)).as("k")).where(col("k").isNotNull)
      .agg(expr(s"bloom_filter_agg(k, ${expectedKeys}L, ${numBits}L)").as("bf"))
      .createOrReplaceTempView(viewName)
    fact.where(col(key).isNotNull &&
      expr(s"might_contain((SELECT bf FROM $viewName), xxhash64(`$key`))"))
  }
}
