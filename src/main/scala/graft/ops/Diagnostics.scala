package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Shuffle-health observability: the queries an operator of a 100 TB
  * deployment runs BEFORE committing to a join/aggregation strategy.
  */
object Diagnostics {

  /** q62: key-skew census — bucket a prospective shuffle key into
    * `nBuckets` reducer-shaped buckets with a portable salted-md5 hash and
    * report each bucket's load ratio (1.0 = perfectly even). A max ratio
    * near nBuckets means one key owns the shuffle — reach for
    * [[SkewJoin.saltedJoin]], AQE skew handling, or a DF-cap before
    * running the real join. One aggregation, output size = nBuckets
    * regardless of input.
    */
  def keySkew(df: DataFrame, key: String, nBuckets: Int = 32): DataFrame = {
    val bucketed = df
      .select(col(key).cast("string").as("k"))
      .where(col("k").isNotNull)
      .withColumn("h", md5(concat(lit("skew:"), col("k"))))
      .withColumn("u24",
        expr("""CAST(
          (instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 1048576 +
          (instr('0123456789abcdef', substr(h, 2, 1)) - 1) * 65536 +
          (instr('0123456789abcdef', substr(h, 3, 1)) - 1) * 4096 +
          (instr('0123456789abcdef', substr(h, 4, 1)) - 1) * 256 +
          (instr('0123456789abcdef', substr(h, 5, 1)) - 1) * 16 +
          (instr('0123456789abcdef', substr(h, 6, 1)) - 1) AS BIGINT)"""))
      .withColumn("bucket", pmod(col("u24"), lit(nBuckets.toLong)).cast("int"))
    val counts = bucketed.groupBy(col("bucket")).agg(count(lit(1)).as("n_rows"))
    val total = counts.agg(sum(col("n_rows")).as("total"))
    counts
      .crossJoin(broadcast(total))
      .select(
        col("bucket"), col("n_rows"),
        (round(col("n_rows").cast("double") * nBuckets / col("total") * 10000) / 10000)
          .as("load_ratio"))
  }

  def keySkew(spark: SparkSession, sfDir: String): DataFrame =
    keySkew(Tables.lineitem(spark, sfDir), "l_suppkey")

  /** Benford first-digit expected shares, log10(1+1/d) as fixed 6-decimal
    * literals — identical constants in any engine (computing log10 at
    * runtime would compare one libm against another).
    */
  private val benfordExpected: Map[Int, Double] = Map(
    1 -> 0.301030, 2 -> 0.176091, 3 -> 0.124939, 4 -> 0.096910,
    5 -> 0.079181, 6 -> 0.066947, 7 -> 0.057992, 8 -> 0.051153,
    9 -> 0.045757)

  /** q154: Benford first-digit census per series — the classic screen for
    * fabricated / synthetic / truncated measurements: organically grown
    * magnitudes follow log10(1+1/d); uniform generators, clipped sensors
    * and copy-paste batches don't. The first significant digit is
    * extracted in integer space (round(|v|·10⁴) → decimal string → first
    * char), never via log10/pow whose libm rounding differs across
    * engines. One aggregation to 9·series rows; the digit grid is
    * zero-filled (a missing digit is itself evidence) exactly like q123's
    * bucket grid.
    */
  def benfordCensus(events: DataFrame): DataFrame = {
    val digits = events
      .select(col("event_type"),
        round(abs(col("value")) * 10000).cast("bigint").as("i"))
      .where(col("i") > 0)
      .withColumn("digit", substring(col("i").cast("string"), 1, 1).cast("int"))
    val counts = digits.groupBy(col("event_type"), col("digit"))
      .agg(count(lit(1)).as("n"))
    val totals = digits.groupBy(col("event_type"))
      .agg(count(lit(1)).as("total"))
    val grid = totals.select(col("event_type"), col("total"))
      .withColumn("digit", explode(sequence(lit(1), lit(9))))
    val expected = benfordExpected.foldLeft(lit(0.0)) {
      case (acc, (d, e)) => when(col("digit") === d, lit(e)).otherwise(acc)
    }
    grid
      .join(counts, Seq("event_type", "digit"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .select(col("event_type"), col("digit"), col("n"),
        (round(col("n").cast("double") / col("total") * 1000000) / 1000000)
          .as("obs_share"),
        expected.as("exp_share"),
        (round((col("n").cast("double") / col("total") - expected) * 1000000)
          / 1000000).as("dev"))
  }

  def benfordCensus(spark: SparkSession, sfDir: String): DataFrame =
    benfordCensus(Tables.events(spark, sfDir))

  /** Poisson(1) inverse-CDF thresholds on the 8-bit uniform scale
    * (round(CDF·2⁸) as integer literals, so the replica multiplicity is a
    * pure integer compare in any engine). The 1/256 quantization moves
    * each weight probability by < 0.002 absolute (e.g. P(w=0) = 94/256 =
    * 0.3672 vs 0.36788 exact) and P(w>5) folds into w=5 — a deterministic
    * bootstrap LAW shared exactly by both oracle sides, whose bias is
    * orders of magnitude below the CI resolution at any realistic n.
    * 8-bit draws exist so one 128-bit digest yields SIXTEEN uniforms —
    * the digest count is the query's entire cost at scale (see
    * [[bootstrapCi]]); the earlier 24-bit variant bought 3 extra digits
    * of CDF resolution nobody consumes for 3.2× the digests.
    */
  private val poissonCdf8 = Seq(
    94L -> 0, 188L -> 1, 235L -> 2, 251L -> 3, 255L -> 4)

  /** q155: bootstrap confidence interval for the per-series mean via
    * deterministic POISSON resampling — the resample-at-scale classic:
    * "draw n rows with replacement" is a global operation, but each row
    * entering replica b an independent Poisson(1) number of times is
    * embarrassingly parallel and converges to the same bootstrap law. The
    * multiplicity is a pure function of md5(event_id, block) → every
    * engine, retry and backfill draws the SAME replicas.
    *
    * Hash economics: one md5 digest carries 128 bits = sixteen
    * independent 8-bit uniforms (see [[poissonCdf8]] for why 8 bits
    * suffice), so replicas are drawn in BLOCKS OF SIXTEEN — the md5 runs
    * on the ×⌈B/16⌉ block explode (computed once per block row, before
    * the ×16 slot explode), cutting the dominant per-row cost 16× vs
    * hashing every (event, replica) pair; at 100 TB the digest count is
    * what the query costs. Aggregation is series×B replica means (exact
    * decimal sums) and the CI bounds are pure rank selection — B=201
    * puts p2.5/p97.5 at integer ranks 6/196, so no cross-engine
    * interpolation arithmetic exists at all.
    */
  def bootstrapCi(events: DataFrame, replicas: Int = 201): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = poissonCdf8.foldRight(lit(5)) {
      case ((thresh, k), acc) => when(col("u8") < thresh, lit(k)).otherwise(acc)
    }
    val blocks = (replicas + 15) / 16
    // the digest's 16 bytes are pulled through FOUR 32-bit conv calls per
    // hash (string parsing is the hot path at 16 slot-rows per hash; the
    // per-slot byte then costs one shift+mask in codegen, not a substr+conv)
    val drawn = events
      .select(col("event_type"), col("event_id"), col("value"))
      // the events table is a single-row-group parquet file, so without an
      // explicit spread the ×⌈B/16⌉×16 explode + md5 chain below — the
      // query's entire cost — runs in ONE task (measured: wall ≈ summed
      // task time, zero parallelism). Hash-repartition on the stable event
      // key right after the read (guide §2.5). The partition count is
      // pinned to the session's shuffle-partition setting EXPLICITLY:
      // AQE's coalescer sizes partitions by the 2 MB shuffle-write
      // estimate and cannot see the 200× explode behind it, so a bare
      // repartition(col) collapses right back to one task.
      .transform(d => d.repartition(
        d.sparkSession.sessionState.conf.numShufflePartitions,
        col("event_id")))
      // snap value to 6 dp as a long ONCE per event — the replica sum is
      // then a pure long multiply-add (w ≤ 5, so no overflow concern)
      .withColumn("v6", expr("CAST(round(value * 1000000) AS BIGINT)"))
      .withColumn("blk", explode(sequence(lit(0), lit(blocks - 1))))
      .withColumn("h", md5(concat(lit("boot:"), col("event_id").cast("string"),
        lit(":"), col("blk").cast("string"))))
      .withColumn("cs", expr(
        "transform(sequence(0, 3), i -> CAST(conv(substr(h, 1 + 8*i, 8), 16, 10) AS BIGINT))"))
      .withColumn("slot", explode(sequence(lit(0), lit(15))))
      .withColumn("b", col("blk") * 16 + col("slot"))
      .where(col("b") < replicas)
      .withColumn("u8",
        expr("shiftright(cs[slot div 4], 8 * (3 - slot % 4)) & 255"))
      .withColumn("w", w)
      .where(col("w") > 0)
    // value·w snapped at 6 dp as a LONG (same half-up rounding the
    // decimal(18,6) cast performed, but summed through codegen'd long
    // addition — Spark's decimal aggregate was the query's hot half)
    val means = drawn.groupBy(col("event_type"), col("b"))
      .agg((sum(col("v6") * col("w")).cast("double")
        / lit(1000000.0) / sum(col("w"))).as("m"))
    val rw = Window.partitionBy(col("event_type")).orderBy(col("m"), col("b"))
    // B=201: p2.5 → rank 1+0.025·200 = 6, p97.5 → rank 196 (both integer)
    val loRank = 1 + math.round(0.025 * (replicas - 1)).toInt
    val hiRank = 1 + math.round(0.975 * (replicas - 1)).toInt
    val ci = means
      .withColumn("rn", row_number().over(rw))
      .where(col("rn") === loRank || col("rn") === hiRank)
      .groupBy(col("event_type"))
      .agg((round(min(col("m")) * 1000000) / 1000000).as("ci_lo"),
        (round(max(col("m")) * 1000000) / 1000000).as("ci_hi"))
    val base = events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (round(sum(col("value").cast("decimal(18,6)")).cast("double")
          / count(col("value")) * 1000000) / 1000000).as("mean"))
    base.join(ci, "event_type")
      .select(col("event_type"), col("n_events"), col("mean"),
        col("ci_lo"), col("ci_hi"))
  }

  def bootstrapCi(spark: SparkSession, sfDir: String): DataFrame =
    bootstrapCi(Tables.events(spark, sfDir))
}
