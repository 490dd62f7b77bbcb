package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Extreme-value and sequence-randomness screens per series.
  *
  * The anomaly-detection surface (reference evaluation.py:189-313) asks
  * "how unusual is this value" — these operators ask the prior questions a
  * capacity planner needs: how heavy is the tail (Hill), what does the
  * worst month look like and how bad can it get (Gumbel block maxima +
  * return level), and is the series even exchangeable (records census,
  * turning-points test) or does it trend/oscillate beyond what iid noise
  * allows.
  *
  * Scale posture: q212/q213 reduce to per-(series, block) maxima or a
  * per-series top-k (one window sort per series key, exactly the shuffle
  * a groupBy would pay); q214/q215 are one ordered window pass per series.
  * All cross-row float accumulation is decimal-snapped.
  */
object ExtremeStats {

  private def r6(c: org.apache.spark.sql.Column) =
    round(c * lit(1000000)) / lit(1000000.0)
  private val EULER = 0.5772156649015329
  private val PI = 3.141592653589793

  /** q212: Gumbel fit over 30-day block maxima — method-of-moments
    * (scale β = s·√6/π, location μ = x̄ − γβ over the block maxima) plus
    * the 100-block return level μ − β·ln(−ln(0.99)): the "value exceeded
    * once a century" planning number. Block maxima are exact doubles (max
    * never accumulates); only the two moment sums cross rows, snapped to
    * decimals.
    */
  def blockMaximaGumbel(events: DataFrame): DataFrame = {
    val blocks = events
      .select(col("event_type"),
        expr("CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT) div 30")
          .as("blk"),
        col("value"))
      .groupBy(col("event_type"), col("blk"))
      .agg(max(col("value")).as("mx"))
    blocks.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(col("mx").cast("decimal(18,6)")).as("s1"),
        sum((col("mx") * col("mx")).cast("decimal(28,6)")).as("s2"))
      .withColumn("nb", col("n_blocks").cast("double"))
      .withColumn("mean_mx", col("s1").cast("double") / col("nb"))
      .withColumn("sd_mx",
        sqrt((col("s2").cast("double")
          - col("nb") * col("mean_mx") * col("mean_mx"))
          / (col("n_blocks") - 1).cast("double")))
      .withColumn("beta", col("sd_mx") * sqrt(lit(6.0)) / lit(PI))
      .withColumn("mu", col("mean_mx") - lit(EULER) * col("beta"))
      .select(col("event_type"), col("n_blocks"),
        r6(col("mean_mx")).as("mean_max"),
        r6(col("sd_mx")).as("sd_max"),
        r6(col("mu")).as("gumbel_loc"),
        r6(col("beta")).as("gumbel_scale"),
        r6(col("mu") - col("beta") * log(-log(lit(0.99)))).as("rl100"))
  }

  def blockMaximaGumbel(spark: SparkSession, sfDir: String): DataFrame =
    blockMaximaGumbel(Tables.events(spark, sfDir))

  /** q213: Hill tail-index estimator on the top-k order statistics —
    * 1/α̂ = (1/k)·Σᵢ ln(x₍ᵢ₎/x₍ₖ₊₁₎) over the k largest values, the
    * standard "is this power-law and how heavy" number (α ≤ 2 means
    * infinite variance: mean-based monitoring is lying to you). One
    * descending window rank per series; only k+1 rows survive the filter,
    * so the log-sum runs on a bounded set no matter the input size.
    */
  def hillTail(events: DataFrame, k: Int = 100): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id"))
    val top = events
      .select(col("event_type"), col("event_id"), col("value"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k + 1)
    val thr = top.where(col("rn") === k + 1)
      .select(col("event_type"), col("value").as("x_thr"))
    top.where(col("rn") <= k)
      .join(broadcast(thr), Seq("event_type"))
      .groupBy(col("event_type"), col("x_thr"))
      .agg(count(lit(1)).as("k_used"),
        sum(log(col("value") / col("x_thr")).cast("decimal(28,12)"))
          .cast("double").as("sum_ln"))
      .select(col("event_type"), col("k_used"),
        r6(col("x_thr")).as("threshold"),
        r6(col("sum_ln") / col("k_used").cast("double")).as("inv_alpha"),
        r6(col("k_used").cast("double") / col("sum_ln")).as("hill_alpha"))
  }

  def hillTail(spark: SparkSession, sfDir: String): DataFrame =
    hillTail(Tables.events(spark, sfDir))

  /** q214: records census — how many times did the series set a new
    * all-time high, vs the iid expectation ln(n)+γ (for exchangeable data
    * the i-th observation is a record with probability 1/i; many more
    * records than H_n means upward drift, far fewer means the peak came
    * early). One ordered window pass; a record is a value STRICTLY above
    * the preceding running max (the first observation counts).
    */
  def recordsCensus(events: DataFrame): DataFrame = {
    val ord = Window.partitionBy(col("event_type"))
      .orderBy(unix_timestamp(col("ts")), col("event_id"))
    val prevMax = ord.rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(col("event_type"), col("ts"), col("event_id"), col("value"))
      .withColumn("pm", max(col("value")).over(prevMax))
      .withColumn("is_rec",
        when(col("pm").isNull || col("value") > col("pm"), 1L).otherwise(0L))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("is_rec")).as("n_records"))
      .select(col("event_type"), col("n"), col("n_records"),
        r6(log(col("n").cast("double")) + lit(EULER)).as("expected_iid"),
        r6(col("n_records").cast("double")
          / (log(col("n").cast("double")) + lit(EULER))).as("ratio"))
  }

  def recordsCensus(spark: SparkSession, sfDir: String): DataFrame =
    recordsCensus(Tables.events(spark, sfDir))

  /** q215: turning-points test — counts local extrema (sign change of
    * consecutive deltas); under iid the expectation is 2(n−2)/3 with
    * variance (16n−29)/90, so the z-score reads oscillation (z ≫ 0,
    * alternating) vs smoothness/trend (z ≪ 0) directly. Complements
    * q181's runs test (which sees the median crossing pattern, not local
    * shape). One lag/lead window pass per series.
    */
  def turningPoints(events: DataFrame): DataFrame = {
    val ord = Window.partitionBy(col("event_type"))
      .orderBy(unix_timestamp(col("ts")), col("event_id"))
    events
      .select(col("event_type"), col("ts"), col("event_id"), col("value"))
      .withColumn("d1", col("value") - lag(col("value"), 1).over(ord))
      .withColumn("d2", lead(col("value"), 1).over(ord) - col("value"))
      .withColumn("tp",
        when(col("d1") * col("d2") < 0, 1L).otherwise(0L))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("tp")).as("n_turning"))
      .withColumn("expected",
        lit(2.0) * (col("n") - 2).cast("double") / lit(3.0))
      .withColumn("variance",
        (lit(16.0) * col("n").cast("double") - lit(29.0)) / lit(90.0))
      .select(col("event_type"), col("n"), col("n_turning"),
        r6(col("expected")).as("expected"),
        r6((col("n_turning").cast("double") - col("expected"))
          / sqrt(col("variance"))).as("z_score"))
  }

  def turningPoints(spark: SparkSession, sfDir: String): DataFrame =
    turningPoints(Tables.events(spark, sfDir))

  /** q225: peaks-over-threshold exceedance fit — the OTHER classical EVT
    * route beside q212's block maxima (POT uses every tail observation,
    * not one per block, so its scale estimate converges much faster). The
    * threshold is the exact 95th percentile — the k = ⌈0.95n⌉-th smallest
    * value via one per-series rank (integer k = (19n+19) div 20, no float
    * boundary) — and exceedances fit an exponential by mean excess. The
    * rank window is the same per-series sort q213 already pays; the tail
    * aggregate sees ~n/20 rows.
    */
  def potExceedances(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val wAll = Window.partitionBy(col("event_type"))
    val ranked = events
      .select(col("event_type"), col("event_id"), col("value"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wAll))
    val thr = ranked
      .where(col("rn") === expr("(19 * n + 19) div 20"))
      .select(col("event_type"), col("value").as("thr"), col("n"))
    ranked.join(broadcast(thr.select(col("event_type"), col("thr"))),
        Seq("event_type"))
      .where(col("value") > col("thr"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_exceed"),
        sum((col("value") - col("thr")).cast("decimal(18,6)")).as("s_exc"))
      .join(broadcast(thr), Seq("event_type"))
      .withColumn("mean_excess",
        col("s_exc").cast("double") / col("n_exceed").cast("double"))
      .select(col("event_type"), col("n"),
        r6(col("thr")).as("threshold"),
        col("n_exceed"),
        r6(col("mean_excess")).as("mean_excess"),
        r6(lit(1.0) / col("mean_excess")).as("exp_rate"),
        r6(col("n_exceed").cast("double") / col("n").cast("double"))
          .as("frac_exceed"))
  }

  def potExceedances(spark: SparkSession, sfDir: String): DataFrame =
    potExceedances(Tables.events(spark, sfDir))

  /** q367: empirical upper-tail dependence between series pairs — on the
    * day-aligned daily means, λ̂_U = 2·P(both > q90)/(P(A > q90) +
    * P(B > q90)) per unordered pair. The JOINT-extremes question q44's
    * Pearson matrix cannot answer (correlation is dominated by the bulk;
    * two sensors can correlate 0.9 yet never spike together, or
    * correlate 0.2 and always fail together — capacity planning cares
    * about the second case). Thresholds are per-series exact q90 from
    * the distributed count-and-locate engine.
    *
    * Scale shape: daily resample, q90 fences broadcast, one day-keyed
    * self-join bounded by |series|²·|days|, integer exceed counts only.
    */
  def tailDependence(events: DataFrame): DataFrame = {
    val daily = TimeSeries.cusumDaily(events)
    val q90 = Percentiles.exactQuantiles(daily, "event_type", "x",
        Seq("q90" -> 0.9))
      .select(col("event_type"), col("qv").as("thr"))
    val f = daily.join(broadcast(q90), "event_type")
      .select(col("event_type"), col("day"),
        (col("x") > col("thr")).as("exc"))
    val b = f.select(col("event_type").as("type_b"), col("day"),
      col("exc").as("exc_b"))
    f.join(b, "day")
      .where(col("event_type") < col("type_b"))
      .groupBy(col("event_type").as("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("exc"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("exc_b"), 1L).otherwise(0L)).as("n_b"),
        sum(when(col("exc") && col("exc_b"), 1L).otherwise(0L))
          .as("n_joint"))
      .select(col("type_a"), col("type_b"), col("n_days"), col("n_a"),
        col("n_b"), col("n_joint"),
        when(col("n_a") + col("n_b") > 0,
          round(lit(2.0) * col("n_joint") / (col("n_a") + col("n_b"))
            * 10000) / 10000.0).otherwise(0.0).as("tail_dep"))
  }

  def tailDependence(spark: SparkSession, sfDir: String): DataFrame =
    tailDependence(Tables.events(spark, sfDir))

  /** q368: extremal index by runs declustering — exceedance days over the
    * exact per-series q90 fence grouped into clusters (a gap > `sep` days
    * starts a new cluster), θ̂ = clusters/exceedances (Ferro–Segers runs
    * estimator). θ→1 means extremes arrive independently (q225's POT
    * counts are honest effective sample sizes); θ→0 means they arrive in
    * storms — the effective number of independent extreme events is
    * θ·n, and every return-period estimate must shrink accordingly.
    * Complements q367 (CROSS-series joint extremes) with the
    * within-series time-clustering lens.
    *
    * Scale shape: daily resample, broadcast fences, one series-
    * PARTITIONED lag window over exceedance days only, then a
    * (series, cluster) census — all keyed, nothing global.
    */
  def extremalIndex(events: DataFrame, sep: Int = 2): DataFrame = {
    val daily = TimeSeries.cusumDaily(events)
    val q90 = Percentiles.exactQuantiles(daily, "event_type", "x",
        Seq("q90" -> 0.9))
      .select(col("event_type"), col("qv").as("thr"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val runs = daily.join(broadcast(q90), "event_type")
      .where(col("x") > col("thr"))
      .select(col("event_type"), col("day"))
      .withColumn("prev", lag(col("day"), 1).over(w))
      .withColumn("newc",
        when(col("prev").isNull || col("day") - col("prev") > sep, 1L)
          .otherwise(0L))
      .withColumn("cid", sum(col("newc")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    val sizes = runs.groupBy(col("event_type"), col("cid"))
      .agg(count(lit(1)).as("csz"))
    sizes.groupBy(col("event_type"))
      .agg(sum(col("csz")).as("n_exceed"),
        count(lit(1)).as("n_clusters"),
        max(col("csz")).as("max_cluster"))
      .select(col("event_type"), col("n_exceed"), col("n_clusters"),
        col("max_cluster"),
        (round(col("n_clusters").cast("double") / col("n_exceed") * 10000)
          / 10000.0).as("theta"),
        (round(col("n_exceed").cast("double") / col("n_clusters") * 10000)
          / 10000.0).as("mean_cluster"))
  }

  def extremalIndex(spark: SparkSession, sfDir: String): DataFrame =
    extremalIndex(Tables.events(spark, sfDir))
}
