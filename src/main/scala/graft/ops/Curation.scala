package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus-curation operators: deterministic stratified sampling (language
  * rebalancing) and sequence-packing statistics — the steps between "cleaned
  * corpus" and "token stream a trainer reads".
  */
object Curation {

  /** q327: Neyman allocation for stratified sampling — given a target
    * sample of 10k documents, the per-source (stratum) sample sizes
    * n_h ∝ N_h·σ_h that minimize the variance of an estimated mean (here
    * of document length): the statistically-correct version of the
    * proportional split q54 implements. One moment aggregate per source;
    * the allocation weights, shares and the implied sampling fractions
    * are closed-form; σ_h terms snapped before the weight sum.
    */
  def neymanAllocation(docs: DataFrame, target: Int = 10000): DataFrame = {
    def s12(c: org.apache.spark.sql.Column) = round(c * lit(1e12)) / lit(1e12)
    val m = docs.groupBy(col("source")).agg(
      count(lit(1)).as("nh"),
      sum(col("n_chars").cast("decimal(28,4)")).cast("double").as("s1"),
      sum((col("n_chars") * col("n_chars")).cast("decimal(38,4)"))
        .cast("double").as("s2"))
      .withColumn("mu", col("s1") / col("nh"))
      .withColumn("sg", s12(sqrt(greatest(
        col("s2") / col("nh") - col("mu") * col("mu"), lit(0.0)))))
      .withColumn("wgt", s12(col("nh") * col("sg")))
    val tot = m.agg(
      s12(sum(col("wgt").cast("decimal(38,10)")).cast("double")).as("wtot"))
    m.crossJoin(broadcast(tot))
      .withColumn("share", s12(col("wgt") / col("wtot")))
      .select(col("source"), col("nh").as("n_docs"),
        (round(col("sg") * 100) / 100.0).as("sigma_chars"),
        (round(col("share") * lit(1000000)) / lit(1000000.0))
          .as("alloc_share"),
        floor(col("share") * target).cast("bigint").as("n_sample"),
        (round(least(col("share") * target / col("nh"), lit(1.0))
          * lit(1000000)) / lit(1000000.0)).as("sampling_frac"))
  }

  def neymanAllocation(spark: SparkSession, sfDir: String): DataFrame =
    neymanAllocation(Tables.documents(spark, sfDir))


  /** q54: deterministic stratified sampling — downsample over-represented
    * strata (here: languages) with a per-stratum keep rate. The keep
    * decision is a pure function of the row key: u = first 24 bits of
    * md5("samp:" + doc_id) as a uniform integer in [0, 2^24), kept iff
    * u < rate * 2^24. No rand(): re-running, retrying a task, or running on
    * another engine selects the SAME sample (the md5-hex → integer
    * arithmetic is portable; see SURVEY §3), and sampling composes with
    * incremental ingestion — a doc's fate never depends on what else is in
    * the batch. One narrow projection + filter, no shuffle at all.
    */
  def stratifiedSample(
      docs: DataFrame,
      rates: Map[String, Double] = Map("en" -> 0.4),
      defaultRate: Double = 1.0): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col("lang") === k, lit(v)).otherwise(acc)
    }
    docs
      .select(col("doc_id"), col("lang"))
      .withColumn("h", md5(concat(lit("samp:"), col("doc_id").cast("string"))))
      .withColumn("u24",
        expr("""CAST(
          (instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 1048576 +
          (instr('0123456789abcdef', substr(h, 2, 1)) - 1) * 65536 +
          (instr('0123456789abcdef', substr(h, 3, 1)) - 1) * 4096 +
          (instr('0123456789abcdef', substr(h, 4, 1)) - 1) * 256 +
          (instr('0123456789abcdef', substr(h, 5, 1)) - 1) * 16 +
          (instr('0123456789abcdef', substr(h, 6, 1)) - 1) AS BIGINT)"""))
      .where(col("u24") < rate * lit(16777216.0))
      .select(col("doc_id"), col("lang"), col("u24"))
  }

  def stratifiedSample(spark: SparkSession, sfDir: String): DataFrame =
    stratifiedSample(Tables.documents(spark, sfDir))

  /** q55: sequence-packing census under concat-then-chunk packing (the
    * GPT-style batch layout: concatenate all documents in doc_id order into
    * one token stream, cut it into fixed windows of `windowTokens`). Reports
    * each document's window span and whether a window boundary fragments it
    * — the corpus-level fragmentation rate drives the choice of context
    * length vs document length distribution.
    *
    * The global running token offset is NOT a single-partition global
    * window: documents get coarse ordered buckets (doc_id div bucketWidth);
    * per-bucket token totals (one small agg) are prefix-summed and the
    * offsets broadcast back, so the cumulative sum is per-bucket local work
    * plus an O(n_buckets) side table — the classic two-pass distributed
    * prefix sum. Size bucketWidth ~ sqrt(corpus) so both passes stay wide.
    */
  def seqPacking(
      docs: DataFrame,
      windowTokens: Int = 256,
      bucketWidth: Int = 64): DataFrame = {
    val d = docs.select(
      col("doc_id"),
      size(split(Dedup.normText(col("text")), " ")).cast("long").as("n_tok"),
      expr(s"doc_id div $bucketWidth").as("bucket"))
    val offsets = d
      .groupBy(col("bucket"))
      .agg(sum(col("n_tok")).as("tot"))
      .withColumn("offset",
        coalesce(
          sum(col("tot")).over(
            Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("bucket"), col("offset"))
    val local = d.withColumn("local",
      sum(col("n_tok")).over(
        Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("local", coalesce(col("local"), lit(0L)))
    local
      .join(broadcast(offsets), "bucket")
      .withColumn("tok_start", col("offset") + col("local"))
      .withColumn("start_window", expr(s"tok_start div $windowTokens"))
      .withColumn("end_window", expr(s"(tok_start + n_tok - 1) div $windowTokens"))
      .select(
        col("doc_id"), col("n_tok"), col("tok_start"),
        col("start_window"), col("end_window"),
        (col("end_window") - col("start_window") + 1).as("n_windows"),
        (col("end_window") > col("start_window")).as("fragmented"))
  }

  def seqPacking(spark: SparkSession, sfDir: String): DataFrame =
    seqPacking(Tables.documents(spark, sfDir))

  /** q64: weighted sampling without replacement (Efraimidis–Spirakis
    * A-Res): each row draws a deterministic uniform u from md5 and gets
    * priority u^(1/w); the global top-k by priority IS a weighted sample
    * without replacement. Here w = n_chars, i.e. longer documents are
    * proportionally likelier — the "sample by content volume, not by row
    * count" primitive a corpus budget needs.
    *
    * Ranked by ln(u)/w, a monotone transform of u^(1/w) (u ≤ 1 so ln(u) ≤ 0
    * and dividing by w preserves order) — avoiding pow(), whose last-ulp
    * behavior differs across libm implementations, keeps the key
    * bit-identical to the DuckDB oracle. The global top-k goes through
    * orderBy+limit — Spark plans that as TakeOrderedAndProject (each
    * partition keeps k rows, the driver merges k·partitions) — NOT a
    * row_number window over an unpartitioned sort; the rank is assigned
    * after the limit, over k rows.
    */
  def weightedSample(docs: DataFrame, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .where(col("n_chars") > 0)
      .withColumn("h", md5(concat(lit("wsamp:"), col("doc_id").cast("string"))))
      .withColumn("u24",
        expr("""CAST(
          (instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 1048576 +
          (instr('0123456789abcdef', substr(h, 2, 1)) - 1) * 65536 +
          (instr('0123456789abcdef', substr(h, 3, 1)) - 1) * 4096 +
          (instr('0123456789abcdef', substr(h, 4, 1)) - 1) * 256 +
          (instr('0123456789abcdef', substr(h, 5, 1)) - 1) * 16 +
          (instr('0123456789abcdef', substr(h, 6, 1)) - 1) AS BIGINT)"""))
      .withColumn("priority",
        log((col("u24") + 1).cast("double") / lit(16777216.0)) / col("n_chars"))
      .orderBy(col("priority").desc, col("doc_id"))
      .limit(k)
      .withColumn("rn", row_number().over(
        Window.orderBy(col("priority").desc, col("doc_id"))))
      .select(col("rn"), col("doc_id"), col("lang"), col("n_chars"),
        // + 0.0 normalizes IEEE −0.0 (a tiny negative priority rounds to
        // −0.0 in DuckDB; Spark's BigDecimal round cannot produce it)
        (round(col("priority") * 10000000) / 10000000 + lit(0.0)).as("priority"))
  }

  def weightedSample(spark: SparkSession, sfDir: String): DataFrame =
    weightedSample(Tables.documents(spark, sfDir))

  /** q75: data-mixture plan — given a target language mixture and a
    * max-epochs cap, compute the largest token budget the corpus supports
    * and each stratum's planned token count / epoch factor. The budget is
    * pinned by the scarcest stratum: B = min over strata of
    * avail·maxEpochs/share (any larger B forces that stratum past the epoch
    * cap). This is the mixture-rebalancing arithmetic a training-data recipe
    * runs before sampling: q54's per-stratum rates come FROM a plan like
    * this.
    *
    * Scale posture: one projection+groupBy over the corpus (5 stratum rows
    * out), then all remaining arithmetic happens on the stratum table with a
    * broadcast one-row global min — the 100 TB input is touched exactly
    * once.
    */
  def mixturePlan(
      docs: DataFrame,
      targets: Seq[(String, Double)] = Seq(
        "en" -> 0.30, "es" -> 0.20, "fr" -> 0.20, "de" -> 0.15, "zh" -> 0.15),
      maxEpochs: Double = 4.0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val avail = docs
      .select(col("lang"),
        size(split(Dedup.normText(col("text")), " ")).cast("long").as("n_tok"))
      .groupBy(col("lang"))
      .agg(sum(col("n_tok")).as("avail_tokens"))
    val tgt = targets.toDF("lang", "target_share")
    val capped = avail.join(broadcast(tgt), "lang")
      .withColumn("cap_budget",
        col("avail_tokens") * lit(maxEpochs) / col("target_share"))
    // global min as an unpartitioned window over the STRATUM table (a
    // handful of rows post-aggregation) — a separate agg + cross join would
    // re-scan the corpus
    capped
      .withColumn("budget", min(col("cap_budget")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(
        col("lang"), col("avail_tokens"), col("target_share"),
        round(col("target_share") * col("budget")).cast("long").as("planned_tokens"),
        (round(col("target_share") * col("budget") / col("avail_tokens") * 10000) / 10000)
          .as("epochs"),
        round(col("budget")).cast("long").as("budget_tokens"))
  }

  def mixturePlan(spark: SparkSession, sfDir: String): DataFrame =
    mixturePlan(Tables.documents(spark, sfDir))

  /** q395: dedup-aware mixture plan — q75's budget arithmetic priced on
    * UNIQUE tokens. A recipe that budgets against raw per-source token
    * counts silently spends part of every epoch re-reading exact
    * duplicates (and a cross-source dup double-spends across strata); the
    * honest plan budgets against keeper tokens (q254's corpus-global
    * min-doc_id-per-hash accounting). Per source (uniform target shares,
    * derived in-engine from the stratum count — no hardcoded source list):
    * both planned allocations, effective epochs over unique data, and the
    * duplicate re-read volume the naive plan pays. planned_naive −
    * dup_reread ≠ planned_dedup in general — that gap is exactly why the
    * plan must be re-solved after dedup, not patched.
    *
    * Scale: the corpus is touched once (hash + token count ride one scan);
    * everything after the two q254-shaped shuffles happens on the
    * stratum table with unpartitioned windows over a handful of rows.
    */
  def dedupAwareMixture(docs: DataFrame, maxEpochs: Double = 4.0): DataFrame = {
    val hashed = docs.select(col("doc_id"), col("source"),
      md5(Dedup.normText(col("text"))).as("h"),
      size(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
        .cast("bigint").as("n_tok"))
    val keepers = hashed.groupBy(col("h")).agg(min(col("doc_id")).as("keeper"))
    val bySrc = hashed.join(keepers, "h")
      .groupBy(col("source"))
      .agg(sum(col("n_tok")).as("tokens_total"),
        sum(when(col("doc_id") === col("keeper"), col("n_tok"))
          .otherwise(0L)).as("tokens_kept"))
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    bySrc
      .withColumn("share", lit(1.0) / count(lit(1)).over(wAll))
      .withColumn("b_naive",
        min(col("tokens_total") * lit(maxEpochs) / col("share")).over(wAll))
      .withColumn("b_dedup",
        min(col("tokens_kept") * lit(maxEpochs) / col("share")).over(wAll))
      .select(col("source"), col("tokens_total"), col("tokens_kept"),
        (round(col("share") * 10000) / 10000).as("target_share"),
        round(col("share") * col("b_naive")).cast("long").as("planned_naive"),
        round(col("share") * col("b_dedup")).cast("long").as("planned_dedup"),
        (round(col("share") * col("b_dedup") / col("tokens_kept") * 10000)
          / 10000).as("epochs_eff"),
        round(col("share") * col("b_naive")
          * (lit(1.0) - col("tokens_kept").cast("double")
             / col("tokens_total").cast("double")))
          .cast("long").as("dup_reread"))
  }

  def dedupAwareMixture(spark: SparkSession, sfDir: String): DataFrame =
    dedupAwareMixture(Tables.documents(spark, sfDir))

  /** q401: shard-balance audit — did the deterministic shuffle actually
    * break the corpus's source ordering? Training data is written in S
    * hash shards (the md5→uniform idiom q54/q64 sample with); a reader
    * consuming shard-by-shard sees each shard's SOURCE MIX as its local
    * data distribution, so a shard whose mix drifts from the corpus mix
    * re-introduces the ordering bias the shuffle was supposed to kill.
    * Per shard: doc count, total-variation distance between the shard's
    * source distribution and the global one (over the FULL source grid —
    * absent sources contribute their whole global share), and the hottest
    * source's local share. TVD ≈ 0 everywhere = a clean shuffle; one hot
    * shard = a pathological key pattern.
    *
    * Scale: one groupBy to (shard × source) — S·|sources| rows — then
    * grid arithmetic on that tiny table; the corpus is scanned once.
    */
  def shardBalance(docs: DataFrame, shards: Int = 8): DataFrame = {
    val sh = docs.select(col("source"),
        md5(concat(lit("shard:"), col("doc_id").cast("string"))).as("h"))
      .withColumn("u24", expr(
        """CAST(
          (instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 1048576 +
          (instr('0123456789abcdef', substr(h, 2, 1)) - 1) * 65536 +
          (instr('0123456789abcdef', substr(h, 3, 1)) - 1) * 4096 +
          (instr('0123456789abcdef', substr(h, 4, 1)) - 1) * 256 +
          (instr('0123456789abcdef', substr(h, 5, 1)) - 1) * 16 +
          (instr('0123456789abcdef', substr(h, 6, 1)) - 1) AS BIGINT)"""))
      .withColumn("shard", pmod(col("u24"), lit(shards.toLong)).cast("int"))
      .select(col("shard"), col("source"))
    val cnt = sh.groupBy(col("shard"), col("source"))
      .agg(count(lit(1)).as("n"))
    val shn = sh.groupBy(col("shard")).agg(count(lit(1)).as("n_docs"))
    val gl = sh.groupBy(col("source")).agg(count(lit(1)).as("ng"))
    val tot = sh.agg(count(lit(1)).as("nt"))
    shn.crossJoin(broadcast(gl))
      .join(cnt, Seq("shard", "source"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("p", coalesce(col("n"), lit(0L)).cast("double") / col("n_docs"))
      .withColumn("q", col("ng").cast("double") / col("nt"))
      .groupBy(col("shard"), col("n_docs"))
      .agg(
        sum((round(abs(col("p") - col("q")) * lit(1e12)) / lit(1e12))
          .cast("decimal(28,12)")).cast("double").as("sad"),
        max(col("p")).as("mx"))
      .select(col("shard"), col("n_docs"),
        (round(lit(0.5) * col("sad") * lit(1e6)) / lit(1e6)).as("tvd"),
        (round(col("mx") * lit(1e6)) / lit(1e6)).as("max_source_share"))
  }

  def shardBalance(spark: SparkSession, sfDir: String): DataFrame =
    shardBalance(Tables.documents(spark, sfDir))

  /** q405: storage-order runs audit — q401 asks whether a RESHUFFLE is
    * balanced; this asks whether the corpus AS STORED needs one: the
    * multicategory Wald–Wolfowitz runs test on the source sequence in
    * doc_id order. A source-clumped file (R far below E[R]) feeds a
    * sequential reader long single-source stretches — the ordering bias
    * that shows up as loss spikes; R ≈ E[R] says the storage order is
    * already exchangeable. E[R] = (n(n+1) − Σn_i²)/n and the classical
    * variance use exact decimal Σn_i², Σn_i³ (cubes cast to decimal
    * BEFORE multiplying — the 64-bit-overflow lesson from the tie
    * corrections applies verbatim at corpus scale).
    *
    * Scale: adjacent comparison is NOT a global single-partition window —
    * rows compare within doc_id-blocks (partitioned window) and block
    * boundaries compare on a blocks-sized summary table (the seqPacking
    * two-level trick), so the only global state is |blocks| rows.
    */
  def orderRuns(docs: DataFrame, block: Long = 64L): DataFrame = {
    val base = docs.select(col("doc_id"), col("source"),
      expr(s"doc_id div $block").as("blk"))
    val wB = Window.partitionBy(col("blk")).orderBy(col("doc_id"))
    val within = base
      .withColumn("prev", lag(col("source"), 1).over(wB))
      .agg(count(lit(1)).as("n"),
        sum(when(col("prev").isNotNull && col("prev") =!= col("source"), 1L)
          .otherwise(0L)).as("chg_w"))
    val wBlk = Window.orderBy(col("blk"))
    val bound = base.groupBy(col("blk"))
      .agg(expr("min_by(source, doc_id)").as("first_src"),
        expr("max_by(source, doc_id)").as("last_src"))
      .withColumn("prev_last", lag(col("last_src"), 1).over(wBlk))
      .agg(sum(when(col("prev_last").isNotNull
          && col("prev_last") =!= col("first_src"), 1L)
        .otherwise(0L)).as("chg_b"))
    val ss = base.groupBy(col("source")).agg(count(lit(1)).as("ni"))
      .agg(sum(col("ni").cast("decimal(38,0)") * col("ni")).as("s2"),
        sum(col("ni").cast("decimal(38,0)") * col("ni") * col("ni"))
          .as("s3"))
    within.crossJoin(bound).crossJoin(ss)
      .withColumn("n_runs", lit(1L) + col("chg_w") + col("chg_b"))
      .withColumn("nd", col("n").cast("double"))
      .withColumn("s2d", col("s2").cast("double"))
      .withColumn("s3d", col("s3").cast("double"))
      .withColumn("nn1", col("nd") * (col("nd") + lit(1.0)))
      .withColumn("e_runs", (col("nn1") - col("s2d")) / col("nd"))
      .withColumn("vr",
        (col("s2d") * (col("s2d") + col("nn1"))
          - lit(2.0) * col("nd") * col("s3d")
          - col("nd") * col("nd") * col("nd"))
          / (col("nd") * col("nd") * (col("nd") - lit(1.0))))
      .select(col("n"), col("n_runs"),
        (round(col("e_runs") * lit(1e6)) / lit(1e6)).as("expected_runs"),
        when(col("vr") <= 0, lit(null).cast("double"))
          .otherwise(round((col("n_runs").cast("double") - col("e_runs"))
            / sqrt(col("vr")) * lit(1e6)) / lit(1e6) + lit(0.0)).as("z"))
  }

  def orderRuns(spark: SparkSession, sfDir: String): DataFrame =
    orderRuns(Tables.documents(spark, sfDir))

  /** q77: curation funnel — per source, how many documents survive each
    * successive cleaning gate (length → repetition → punctuation), plus the
    * end-to-end retention rate. This is the report a corpus owner reads to
    * see WHERE their data dies in the pipeline; every gate compares
    * integers (count·scale ≤ count·scale) so no float boundary can flip a
    * document between engines.
    *
    * One tokenization pass feeds all gates; the only explode is the bigram
    * census (needed for the q53-style top-bigram share), aggregated per doc
    * before the per-source rollup — the wide explode never reaches a join.
    */
  /** Per-document cumulative gate verdicts (length → repetition →
    * punctuation) — the shared core of the q77 funnel rollup and the q80
    * pipeline manifest. All comparisons are integer·scale ≤ integer·scale.
    */
  def gateFlags(
      docs: DataFrame,
      minWords: Int = 10,
      maxWords: Int = 1000): DataFrame = {
    val s = docs
      .select(col("doc_id"), col("source"), Dedup.normText(col("text")).as("t"))
      .withColumn("w", split(col("t"), " "))
    val base = s.select(
      col("doc_id"), col("source"),
      length(col("t")).cast("long").as("n_chars"),
      size(col("w")).cast("long").as("n_words"),
      size(array_distinct(col("w"))).cast("long").as("uniq_words"),
      (length(col("t")) - length(regexp_replace(col("t"), "[^a-z0-9 ]", "")))
        .cast("long").as("n_punct"))
    val topBigram = s
      .where(size(col("w")) >= 2)
      .select(col("doc_id"),
        explode(expr("transform(sequence(0, size(w)-2), i -> concat(w[i], ' ', w[i+1]))"))
          .as("bg"))
      .groupBy(col("doc_id"), col("bg"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("top_bigram_n"))
    base
      .join(topBigram, Seq("doc_id"), "left")
      .withColumn("top_bigram_n", coalesce(col("top_bigram_n"), lit(0L)))
      // gates are cumulative: a doc must pass every earlier stage
      .withColumn("p_len",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("p_rep", col("p_len") &&
        (col("n_words") - col("uniq_words")) * 10 <= col("n_words") * 7 &&
        col("top_bigram_n") * 100 <= col("n_words") * 9)
      .withColumn("p_punct", col("p_rep") &&
        col("n_punct") * 100 <= col("n_chars") * 10)
  }

  def curationFunnel(
      docs: DataFrame,
      minWords: Int = 10,
      maxWords: Int = 1000): DataFrame = {
    gateFlags(docs, minWords, maxWords)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("p_len"), 1L).otherwise(0L)).as("n_pass_len"),
        sum(when(col("p_rep"), 1L).otherwise(0L)).as("n_pass_rep"),
        sum(when(col("p_punct"), 1L).otherwise(0L)).as("n_pass_all"))
      .withColumn("retention",
        round(col("n_pass_all").cast("double") / col("n_docs") * 10000) / 10000)
  }

  def curationFunnel(spark: SparkSession, sfDir: String): DataFrame =
    curationFunnel(Tables.documents(spark, sfDir))

  /** q80: end-to-end curation manifest — every document's fate through the
    * full pipeline, with the stage that dropped it: exact dedup (q20
    * semantics: md5 keep-first) → quality gates (q77 semantics) → stratified
    * sampling (q54 semantics). The output is the audit trail a data release
    * ships alongside the corpus: WHY each excluded document is gone.
    *
    * Composition stays declarative — one manifest row per input document,
    * stages as column expressions over three already-scale-shaped
    * sub-plans (argmin dedup via groupBy+join, integer gates, md5 sampling
    * with no shuffle), so the whole pipeline is ONE Catalyst plan and the
    * optimizer shares the scan.
    */
  def pipelineManifest(
      docs: DataFrame,
      rates: Map[String, Double] = Map("en" -> 0.4),
      defaultRate: Double = 1.0): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col("lang") === k, lit(v)).otherwise(acc)
    }
    val hashed = docs.select(col("doc_id"), col("lang"),
      md5(Dedup.normText(col("text"))).as("h"))
    val keepers = hashed.groupBy(col("h")).agg(min(col("doc_id")).as("keeper"))
    val dup = hashed.join(keepers, "h")
      .select(col("doc_id"), col("lang"),
        (col("doc_id") =!= col("keeper")).as("is_dup"))
    val gates = gateFlags(docs).select(col("doc_id"), col("source"), col("p_punct"))
    dup
      .join(gates, "doc_id")
      .withColumn("hs", md5(concat(lit("samp:"), col("doc_id").cast("string"))))
      .withColumn("u24",
        expr("""CAST(
          (instr('0123456789abcdef', substr(hs, 1, 1)) - 1) * 1048576 +
          (instr('0123456789abcdef', substr(hs, 2, 1)) - 1) * 65536 +
          (instr('0123456789abcdef', substr(hs, 3, 1)) - 1) * 4096 +
          (instr('0123456789abcdef', substr(hs, 4, 1)) - 1) * 256 +
          (instr('0123456789abcdef', substr(hs, 5, 1)) - 1) * 16 +
          (instr('0123456789abcdef', substr(hs, 6, 1)) - 1) AS BIGINT)"""))
      .withColumn("stage",
        when(col("is_dup"), "dup")
          .when(!col("p_punct"), "gate")
          .when(col("u24") >= rate * lit(16777216.0), "sample")
          .otherwise("kept"))
      .select(col("doc_id"), col("lang"), col("source"), col("stage"))
  }

  def pipelineManifest(spark: SparkSession, sfDir: String): DataFrame =
    pipelineManifest(Tables.documents(spark, sfDir))

  /** q90: retrieval-chunking work list — fixed-size sliding character
    * windows (`chunkSize` chars, `overlap`-char overlap between neighbors)
    * over each document, the split step every RAG / embedding-index
    * pipeline runs before vectorizing. Emits one row per chunk with its
    * 1-based offset, length, and the md5 of the ACTUAL slice, so the oracle
    * compare proves both engines cut byte-identical chunks (not just equal
    * counts) — the same "verify the content, not the bookkeeping" posture
    * as q88's residual-match self-check.
    *
    * Scale posture: the whole plan is one narrow projection + a bounded
    * explode (fan-out = len/stride per doc, known before the explode from
    * pure integer arithmetic — `(len - size) DIV stride + 1`, no
    * double-precision ceil that could disagree at exact-boundary lengths).
    * Zero shuffles, map-only, codegen'd end to end: at 100 TB this is an
    * embarrassingly parallel scan whose output feeds the embedding UDF
    * batches directly. `sampleMod` keeps the small-SF oracle output
    * readable; production runs pass 1.
    */
  def chunkPlan(
      docs: DataFrame,
      chunkSize: Int = 200,
      overlap: Int = 50,
      sampleMod: Int = 50): DataFrame = {
    require(overlap < chunkSize, "overlap must be smaller than chunkSize")
    val stride = chunkSize - overlap
    docs
      .where(col("doc_id") % sampleMod === 0)
      .select(col("doc_id"), col("text"), length(col("text")).as("len"))
      .withColumn("n_chunks",
        when(col("len") <= chunkSize, lit(1L))
          .otherwise(expr(s"(len - $chunkSize + $stride - 1) DIV $stride") + 1L))
      .select(col("doc_id"), col("text"), col("len"),
        explode(expr("sequence(0L, n_chunks - 1)")).as("i"))
      .select(
        col("doc_id"),
        col("i").cast("int").as("chunk_idx"),
        (col("i") * stride + 1).cast("long").as("c_start"),
        least(lit(chunkSize.toLong), col("len") - col("i") * stride).cast("long").as("c_len"),
        md5(expr(s"substr(text, CAST(i * $stride + 1 AS INT), CAST(least($chunkSize, len - i * $stride) AS INT))"))
          .as("chunk_md5"))
  }

  def chunkPlan(spark: SparkSession, sfDir: String): DataFrame =
    chunkPlan(Tables.documents(spark, sfDir))

  /** q95: token-length histogram per language in power-of-2 buckets, with
    * the running share of corpus tokens up to each bucket — the input the
    * packing (q55) and mixture (q75) planners read: where the tokens
    * actually live, how much of the budget short docs can ever contribute,
    * what fraction a max-sequence-length truncation touches. Bucket =
    * floor(log2 n_tok) via binary-string length (integer-exact — the q70
    * idiom; no float log edge cases at bucket boundaries).
    *
    * Scale: one tokenizing projection (no explode — only sizes are needed)
    * → one map-side-combined aggregate to O(langs × log n) rows; the
    * cumulative share is a window over that tiny table, never the corpus.
    */
  def lengthHistogram(docs: DataFrame): DataFrame = {
    val sized = docs
      .select(col("lang"),
        size(split(Dedup.normText(col("text")), " ")).as("n_tok"))
      .withColumn("bucket", (length(bin(col("n_tok"))) - 1).cast("int"))
    val g = sized
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("bucket_tokens"))
    val cum = Window.partitionBy(col("lang")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = Window.partitionBy(col("lang"))
    g.select(
      col("lang"), col("bucket"),
      expr("CAST(power(2, bucket) AS BIGINT)").as("bucket_lo"),
      col("n_docs"), col("bucket_tokens"),
      (round(sum(col("bucket_tokens")).over(cum).cast("double") /
        sum(col("bucket_tokens")).over(tot) * 10000) / 10000).as("cum_token_share"))
  }

  def lengthHistogram(spark: SparkSession, sfDir: String): DataFrame =
    lengthHistogram(Tables.documents(spark, sfDir))

  /** q187: quality-temperature sampling — keep probability proportional to
    * quality², so high-quality documents survive preferentially but
    * low-quality ones still contribute mass (the soft alternative to
    * q53's hard gates; τ = 2 sharpening as quality·quality keeps the
    * probability arithmetic exact-multiply, never libm pow). Deterministic
    * like q54: the coin is a 24-bit md5-derived uniform per doc_id, so the
    * sample is reproducible across runs, engines and retries. Per-source
    * rollup: raw/kept counts, realized keep rate, and mean quality of the
    * kept slice (4-dp quality summed in DECIMAL — order-free). One
    * tokenization pass (the q28 projection), map-only until the
    * source-sized rollup.
    */
  def qualityTemperatureSample(docs: DataFrame): DataFrame = {
    val q = TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), col("quality"))
    val coin = docs.select(col("doc_id"), col("source"))
      .join(q, "doc_id")
      .withColumn("h", md5(concat(lit("qsamp:"), col("doc_id").cast("string"))))
      .withColumn("u24",
        expr("""CAST(
          (instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 1048576 +
          (instr('0123456789abcdef', substr(h, 2, 1)) - 1) * 65536 +
          (instr('0123456789abcdef', substr(h, 3, 1)) - 1) * 4096 +
          (instr('0123456789abcdef', substr(h, 4, 1)) - 1) * 256 +
          (instr('0123456789abcdef', substr(h, 5, 1)) - 1) * 16 +
          (instr('0123456789abcdef', substr(h, 6, 1)) - 1) AS BIGINT)"""))
      .withColumn("kept",
        col("u24").cast("double") < col("quality") * col("quality") * lit(16777216.0))
    coin.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        (round(sum(when(col("kept"), 1L).otherwise(0L)).cast("double")
          / count(lit(1)) * lit(1000000)) / lit(1000000.0)).as("keep_rate"),
        (round(sum(when(col("kept"), col("quality").cast("decimal(18,6)"))
          .otherwise(lit(null))).cast("double")
          / sum(when(col("kept"), 1L).otherwise(0L)) * lit(10000))
          / lit(10000.0)).as("mean_kept_quality"))
  }

  def qualityTemperatureSample(spark: SparkSession, sfDir: String): DataFrame =
    qualityTemperatureSample(Tables.documents(spark, sfDir))

  /** q268: deterministic negative sampling for contrastive training —
    * every document is paired with the representatives of `offsets.size`
    * OTHER hash buckets (bucket = doc_id mod nBuckets, representative =
    * the bucket's min doc_id), then pairs that would poison the loss are
    * dropped: the self-pair and exact near-misses (same normalized-text
    * md5 — a "negative" that's actually a positive). The census reports
    * how many negatives survive per source and how many the dup guard
    * caught. Scale shape: the representative table is nBuckets rows —
    * broadcast — so negative assignment is a map-side join over one scan;
    * no sampling RNG, so retries/engines agree bit-for-bit.
    */
  def negativeSamples(docs: DataFrame, nBuckets: Int = 64,
                      offsets: Seq[Int] = Seq(1, 7, 31)): DataFrame = {
    val d = docs.select(col("doc_id"), col("source"),
      md5(Dedup.normText(col("text"))).as("h"),
      pmod(col("doc_id"), lit(nBuckets)).as("b"))
    val reps = d.groupBy(col("b")).agg(min(col("doc_id")).as("rep_id"))
      .join(d.select(col("doc_id").as("rep_id"), col("h").as("rep_h")),
        "rep_id")
      .withColumnRenamed("b", "tb")
    val cand = d
      .withColumn("o", explode(array(offsets.map(lit): _*)))
      .withColumn("tb", pmod(col("b") + col("o"), lit(nBuckets)))
      .join(broadcast(reps), "tb")
    cand.groupBy(col("source")).agg(
      count_distinct(col("doc_id")).as("n_docs"),
      sum(when(col("rep_id") =!= col("doc_id") && col("rep_h") =!= col("h"),
        1L).otherwise(0L)).as("n_negs"),
      sum(when(col("rep_id") =!= col("doc_id") && col("rep_h") === col("h"),
        1L).otherwise(0L)).as("n_dropped_dup"),
      sum(when(col("rep_id") === col("doc_id"), 1L).otherwise(0L))
        .as("n_dropped_self"))
  }

  def negativeSamples(spark: SparkSession, sfDir: String): DataFrame =
    negativeSamples(Tables.documents(spark, sfDir))

  /** q356: Kish effective sample size of the quality-temperature weights —
    * per source, ESS = (Σw)²/Σw² with w = quality² (q187's acceptance
    * weight), plus ESS/n and the design effect n·Σw²/(Σw)² (the ESS
    * ratio's reciprocal). The sampling-theory answer to "how much statistical
    * power survives the reweighting": a source whose ESS ratio collapses
    * is being represented by a handful of high-quality documents — exactly
    * the over-concentration failure mixture planning (q75) must know
    * about before trusting q187's keep rates.
    *
    * Scale shape: quality is q28's map-side projection; one
    * map-combinable per-source moment aggregate; weights are 1e-4-snapped
    * upstream so the decimal(38,16) sums are exact on any partitioning.
    */
  def kishEss(docs: DataFrame): DataFrame = {
    val q = TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), col("quality"))
    docs.select(col("doc_id"), col("source")).join(q, "doc_id")
      .withColumn("w", col("quality") * col("quality"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("w").cast("decimal(38,16)")).cast("double").as("sw"),
        sum((col("w") * col("w")).cast("decimal(38,16)"))
          .cast("double").as("sw2"))
      .select(col("source"), col("n_docs"),
        when(col("sw2") > 0,
          (round(col("sw") * col("sw") / col("sw2") * 100) / 100.0))
          .otherwise(0.0).as("ess"),
        when(col("sw2") > 0,
          (round(col("sw") * col("sw") / col("sw2") / col("n_docs")
            * 1000000) / 1000000.0)).otherwise(0.0).as("ess_ratio"),
        when(col("sw") * col("sw") > 0,
          (round(col("n_docs") * col("sw2") / (col("sw") * col("sw"))
            * 1000000) / 1000000.0)).otherwise(0.0).as("design_effect"))
  }

  def kishEss(spark: SparkSession, sfDir: String): DataFrame =
    kishEss(Tables.documents(spark, sfDir))

  /** q355: uniformity audit of the engine's own md5 sampling coin — the
    * binned one-sample KS statistic of u24 ("samp:" salt, q54's exact
    * keep-coin) against U[0,1) per source, with the 95% critical value
    * 1.36/√n. Every deterministic sampler in the repo (q54/q64/q83/q187)
    * stands on this coin being uniform and source-independent; a
    * contractor swapping doc_id allocation schemes (e.g. source-prefixed
    * id ranges) could silently bias every downstream sample — this query
    * is the tripwire.
    *
    * Scale shape: the ECDF never sorts the data — u24 buckets into 4096
    * bins ((source, bin) map-combinable census), a dense 4096-row spine
    * per source left-joins the counts, and the cumulative walk is a
    * window over ≤4096 BOUNDED rows per source. Statistic resolution is
    * the bin width (1/4096), stated in the column name; all inputs to
    * the sup are exact integers.
    */
  def samplerUniformity(docs: DataFrame, bins: Int = 4096): DataFrame = {
    val u = docs.select(col("doc_id"), col("source"))
      .withColumn("h", md5(concat(lit("samp:"), col("doc_id").cast("string"))))
      .withColumn("u24",
        expr("""CAST(
          (instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 1048576 +
          (instr('0123456789abcdef', substr(h, 2, 1)) - 1) * 65536 +
          (instr('0123456789abcdef', substr(h, 3, 1)) - 1) * 4096 +
          (instr('0123456789abcdef', substr(h, 4, 1)) - 1) * 256 +
          (instr('0123456789abcdef', substr(h, 5, 1)) - 1) * 16 +
          (instr('0123456789abcdef', substr(h, 6, 1)) - 1) AS BIGINT)"""))
      .withColumn("bin", floor(col("u24") / lit(bins.toLong)).cast("long"))
    val c = u.groupBy(col("source"), col("bin")).agg(count(lit(1)).as("cnt"))
    val spine = u.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .withColumn("bin", explode(sequence(lit(0L), lit(bins - 1L))))
    val w = Window.partitionBy(col("source")).orderBy(col("bin"))
    spine.join(c, Seq("source", "bin"), "left")
      .withColumn("cnt0", coalesce(col("cnt"), lit(0L)))
      .withColumn("cum", sum(col("cnt0")).over(w))
      .withColumn("dd", abs(col("cum").cast("double") / col("n")
        - (col("bin") + 1).cast("double") / lit(bins.toDouble)))
      .groupBy(col("source"), col("n"))
      .agg(max(col("dd")).as("d"))
      .select(col("source"), col("n").as("n_docs"),
        (round(col("d") * 1000000) / 1000000.0).as("ks_binned"),
        (round(lit(1.36) / sqrt(col("n").cast("double")) * 1000000)
          / 1000000.0).as("ks_crit_95"),
        (col("d") < lit(1.36) / sqrt(col("n").cast("double")))
          .as("uniform_ok"))
  }

  def samplerUniformity(spark: SparkSession, sfDir: String): DataFrame =
    samplerUniformity(Tables.documents(spark, sfDir))

  /** q427: k-anonymity / l-diversity census — the privacy-governance
    * audit (Sweeney 2002; Machanavajjhala 2007) that q88's PII scrub does
    * not cover: even with direct identifiers gone, a quasi-identifier
    * combination (here nation × market segment × balance band) can single
    * a record out. Equivalence classes of the QID tuple are bucketed by
    * size (a k=1 class IS a re-identification), and each class's
    * l-diversity is checked on a sensitive attribute (the debt flag) —
    * a class where everyone shares the sensitive value leaks it even at
    * comfortable k. The census — classes, rows, low-diversity classes per
    * size bucket, plus the corpus-wide minimum k — is the table a release
    * decision reads.
    *
    * One grouped pass to classes, one to the census; the broadcast k_min
    * scalar rides every row. Nothing scales beyond the class count.
    */
  def kAnonymity(customer: DataFrame): DataFrame = {
    val classes = customer
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("bal_band"),
        (col("c_acctbal") < 0).as("sensitive"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_band"))
      .agg(count(lit(1)).as("k"),
        countDistinct(col("sensitive")).as("l_div"))
    val kmin = classes.agg(min(col("k")).as("k_min"))
    classes
      .withColumn("bucket",
        when(col("k") === 1, lit(1L))
          .when(col("k") <= 4, lit(2L))
          .when(col("k") <= 9, lit(5L))
          .when(col("k") <= 24, lit(10L))
          .otherwise(lit(25L)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("k")).as("n_rows"),
        sum(when(col("l_div") < 2, 1L).otherwise(0L))
          .as("n_low_diversity"))
      .crossJoin(broadcast(kmin))
  }

  def kAnonymity(spark: SparkSession, sfDir: String): DataFrame =
    kAnonymity(Tables.customer(spark, sfDir))
}
