package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal asset plumbing: opaque binary payloads + typed metadata.
  *
  * The engine treats media as `binary` columns with a typed metadata struct
  * alongside — the schema, partitioning and batch shape a real pipeline
  * needs. The decode step (image/audio codecs aren't in this environment) is
  * STUBBED with [[decodeStub]]: a deterministic metadata extractor keyed off
  * the payload digest. A production deployment replaces that one column
  * expression with a vectorized decoder (mapPartitions over the binary
  * column, batched per partition); everything upstream and downstream —
  * column pruning, the per-kind aggregation, the digest-based dedup — is
  * unchanged, because the stub has the same signature: binary → struct.
  *
  * The synthetic payload is the document text encoded as UTF-8 bytes, so the
  * DuckDB oracle can reconstruct byte-identical payloads and digests.
  */
object Multimodal {

  /** Parse `n` hex digits of an md5 string starting at 1-based `pos` into a
    * bigint — portable to DuckDB as the identical instr-arithmetic.
    */
  private def hexField(digestCol: String, pos: Int, n: Int): Column =
    (0 until n).map { i =>
      (expr(s"instr('0123456789abcdef', substr($digestCol, ${pos + i}, 1))") - 1)
        .cast("long") * (1L << (4 * (n - 1 - i)))
    }.reduce(_ + _)

  /** The decode seam: payload digest + byte length → typed media metadata.
    * Deterministic fake in lieu of real codecs; same struct a real decoder
    * would emit.
    */
  def decodeStub(df: DataFrame): DataFrame =
    df.withColumn("kind",
        when(col("asset_id") % 3 === 0, "image")
          .when(col("asset_id") % 3 === 1, "audio")
          .otherwise("video"))
      .withColumn("width",
        when(col("kind") === "image", hexField("digest", 1, 4) % 1024 + 16))
      .withColumn("height",
        when(col("kind") === "image", hexField("digest", 5, 4) % 1024 + 16))
      .withColumn("duration_ms",
        when(col("kind") =!= "image", hexField("digest", 9, 4) % 60000 + 1000))

  /** q31: binary payload ingestion + metadata census per media kind. The
    * payload bytes never reach the shuffle — only the 16-byte digest and the
    * small metadata columns do, which is what makes this shape survive
    * petabyte media tables (the binary column stays columnar in parquet and
    * is pruned out of every exchange).
    */
  def multimodalMeta(docs: DataFrame): DataFrame = {
    assetMeta(docs)
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).as("total_bytes"),
        count_distinct(col("digest")).as("n_distinct"),
        round(avg(col("width")), 4).as("avg_width"),
        round(avg(col("height")), 4).as("avg_height"),
        round(avg(col("duration_ms")), 4).as("avg_duration_ms"))
  }

  def multimodalMeta(spark: SparkSession, sfDir: String): DataFrame =
    multimodalMeta(Tables.documents(spark, sfDir))

  /** The asset-metadata table (digest + typed decode-stub fields) every
    * downstream multimodal operator reads — built once here so q31/q195/
    * q196/q197 share the shape. Payload bytes are projected away
    * immediately; only the 16-byte digest and small metadata survive.
    */
  def assetMeta(docs: DataFrame): DataFrame = {
    val assets = docs.select(
      col("doc_id").as("asset_id"),
      encode(col("text"), "UTF-8").as("payload"))
    decodeStub(assets.select(
      col("asset_id"),
      octet_length(col("payload")).as("n_bytes"),
      md5(col("payload")).as("digest")))
  }

  /** q195: exact asset dedup census by payload digest — the multimodal
    * twin of q20's text dedup (media pipelines dedup by content hash
    * before any decode; a CDN mirror or re-crawl shows up as byte-equal
    * payloads). Per kind: asset/unique counts, reclaimable duplicate
    * bytes ((copies−1)·size per digest group) and the duplicate rate.
    * The digest groupBy shuffles a 32-char hash + a long per asset —
    * never payload bytes.
    */
  def assetDedup(docs: DataFrame): DataFrame = {
    val per = assetMeta(docs)
      .groupBy(col("kind"), col("digest"))
      .agg(count(lit(1)).as("cnt"), max(col("n_bytes")).as("nb"))
    per.groupBy(col("kind"))
      .agg(sum(col("cnt")).as("n_assets"),
        count(lit(1)).as("n_unique"),
        sum((col("cnt") - 1) * col("nb")).as("dup_bytes"),
        (round((sum(col("cnt")) - count(lit(1))).cast("double")
          / sum(col("cnt")) * lit(1000000)) / lit(1000000.0)).as("dup_rate"))
  }

  def assetDedup(spark: SparkSession, sfDir: String): DataFrame =
    assetDedup(Tables.documents(spark, sfDir))

  def resizePlan(spark: SparkSession, sfDir: String): DataFrame =
    resizePlan(assetMeta(Tables.documents(spark, sfDir)), 256L, 256L)

  def frameSamplePlan(spark: SparkSession, sfDir: String): DataFrame =
    frameSamplePlan(assetMeta(Tables.documents(spark, sfDir)), fps = 1.0)

  /** Resize planning for image assets: the largest scale ≤ 1 that fits the
    * (maxW, maxH) box while preserving aspect ratio, and the resulting
    * target dims. This is the declarative half of a resize pipeline — the
    * per-pixel work happens in the decoder seam ([[graft.ops.AssetDecoder]]),
    * but WHICH assets need work and their output geometry is pure column
    * arithmetic the optimizer can prune, push and batch with everything
    * else (e.g. `where(needs_resize)` before the expensive decode).
    *
    * Target dims use floor(dim · scale) with a 1px floor, the convention
    * image libraries share; scale is exact double division.
    */
  def resizePlan(meta: DataFrame, maxW: Long, maxH: Long): DataFrame =
    meta
      .where(col("kind") === "image")
      .withColumn("scale",
        least(lit(1.0), lit(maxW.toDouble) / col("width"),
          lit(maxH.toDouble) / col("height")))
      .withColumn("target_w",
        greatest(lit(1L), floor(col("width") * col("scale")).cast("long")))
      .withColumn("target_h",
        greatest(lit(1L), floor(col("height") * col("scale")).cast("long")))
      .withColumn("needs_resize", col("scale") < 1.0)
      .select(col("asset_id"), col("width"), col("height"),
        col("target_w"), col("target_h"),
        (round(col("scale") * 10000) / 10000).as("scale"), col("needs_resize"))

  /** Frame-sampling plan for video assets: one row per frame to extract at
    * `fps` frames/second across the asset's duration — (asset_id,
    * frame_idx, offset_ms). The explode is bounded by duration·fps and
    * happens AFTER metadata-level filtering, so a petabyte video table
    * yields exactly the frame-extraction work list and nothing else; the
    * actual pixel grab is the decoder seam's job, keyed by (asset, offset).
    */
  def frameSamplePlan(meta: DataFrame, fps: Double = 1.0): DataFrame = {
    val stepMs = math.max(1L, math.round(1000.0 / fps))
    meta
      .where(col("kind") === "video" && col("duration_ms").isNotNull)
      .select(col("asset_id"), col("duration_ms"),
        posexplode(expr(s"sequence(0L, duration_ms - 1, ${stepMs}L)"))
          .as(Seq("frame_idx", "offset_ms")))
      .select(col("asset_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("offset_ms"), col("duration_ms"))
  }

  /** One 32-bit dHash half: bits `off`..`off+31` of the 64-bit difference
    * hash, from the 72-cell luma grid arrays `s` (block byte sums) and `n`
    * (block sizes). Bit b of the full hash compares horizontally adjacent
    * grid cells on the 8-row × 9-col grid — pixel(r,c) > pixel(r,c+1) with
    * r = b/8, c = b%8 — via exact cross-multiplication (sum_a·n_b >
    * sum_b·n_a), so no float division ever enters the hash.
    */
  private def dHashHalf(off: Int): Column = {
    def cell(arr: String, plus: Int) =
      s"element_at($arr, cast(((b+$off) div 8)*9 + ((b+$off) % 8) + $plus as int))"
    expr(s"""aggregate(sequence(0, 31), 0L, (acc, b) -> acc +
      IF(${cell("s", 1)} * ${cell("n", 2)} > ${cell("s", 2)} * ${cell("n", 1)},
         shiftleft(1L, b), 0L))""")
  }

  /** Real 64-bit difference hash (dHash) per asset, as two 32-bit halves
    * (h1 = bits 0..31, h2 = bits 32..63 — halves avoid 64-bit sign wrap in
    * both engines). The decode seam here maps the deterministic synthetic
    * payload bytes to a luma image: the payload's UTF-8 bytes ARE the
    * row-major grayscale pixels, block-averaged down to the canonical
    * dHash 9-wide × 8-tall grid (72 cells, cell k spanning bytes
    * ⌊k·L/72⌋..⌊(k+1)·L/72⌋). That is the textbook dHash pipeline —
    * downsample, compare horizontal neighbours, 64 bits — and it is
    * locality-sensitive for real: a few edited bytes perturb a few blocks
    * and flip a few bits, unlike the md5-digest bits this replaced. A
    * production deployment swaps ONLY the bytes→pixels step (real JPEG
    * decode + resize in [[graft.ops.AssetDecoder]]'s batched seam); the
    * block-average, bit extraction, banding and pair join are unchanged.
    * Assets shorter than 72 payload bytes are skipped (no full grid).
    *
    * All arithmetic is integer (byte sums, cross-multiplied comparisons,
    * bit shifts), so DuckDB mirrors it exactly with list_transform/ord.
    */
  def dHash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("asset_id"), col("text"))
      .where(length(col("text")) >= 72)
      .withColumn("ll", length(col("text")).cast("long"))
      .withColumn("s", expr(
        """transform(sequence(0, 71), k -> aggregate(
          sequence(cast((k*ll) div 72 as int) + 1,
                   cast(((k+1)*ll) div 72 as int)),
          0L, (acc, i) -> acc + ascii(substring(text, i, 1))))"""))
      .withColumn("n", expr(
        "transform(sequence(0, 71), k -> ((k+1)*ll) div 72 - (k*ll) div 72)"))
      .select(col("asset_id"), dHashHalf(0).as("h1"), dHashHalf(32).as("h2"))

  /** Candidate near-dup pairs from the banded-Hamming join over [[dHash]]
    * hashes — the pair-level table [[phashPairs]] censuses. Exposed so the
    * planted-near-duplicate spec can assert a specific pair surfaces.
    */
  def phashCandidatePairs(docs: DataFrame, maxBucket: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withH = dHash(docs)
    val bands = withH.select(col("asset_id"), col("h1"), col("h2"),
        explode(array(
          struct(lit(0).as("band"), (col("h1") % 65536).as("key")),
          struct(lit(1).as("band"), expr("h1 div 65536").as("key")),
          struct(lit(2).as("band"), (col("h2") % 65536).as("key")),
          struct(lit(3).as("band"), expr("h2 div 65536").as("key"))
        )).as("bk"))
      .select(col("asset_id"), col("h1"), col("h2"),
        col("bk.band").as("band"), col("bk.key").as("key"))
      .withColumn("bc",
        count(lit(1)).over(Window.partitionBy(col("band"), col("key"))))
      .where(col("bc") <= maxBucket)
    val a = bands.select(col("asset_id").as("asset_a"), col("band"),
      col("key"), col("h1").as("a1"), col("h2").as("a2"))
    val b = bands.select(col("asset_id").as("asset_b"), col("band"),
      col("key"), col("h1").as("b1"), col("h2").as("b2"))
    a.join(b, Seq("band", "key"))
      .where(col("asset_a") < col("asset_b"))
      .groupBy(col("asset_a"), col("asset_b"),
        col("a1"), col("a2"), col("b1"), col("b2"))
      .agg(count(lit(1)).as("n_shared_bands"))
      .withColumn("hamming",
        expr("bit_count(a1 ^ b1) + bit_count(a2 ^ b2)"))
  }

  /** q424: banded-Hamming perceptual-hash near-dup pairs — the multimodal
    * near-dup operator a media pipeline runs AFTER q195's exact digest
    * dedup: a 64-bit dHash survives re-encodes and resizes that change the
    * payload bytes, and two hashes within a small Hamming radius flag the
    * same underlying image. The hash is a REAL difference hash computed
    * from the payload bytes (see [[dHash]]) — near-identical payloads land
    * at small Hamming distance. The LSH trick is the pigeonhole split: 4
    * bands of 16 bits — any pair within Hamming ≤ 3 agrees EXACTLY on at
    * least one band (r < bands); for r ≤ 6 the band join is a high-recall
    * candidate filter, verified exactly on the 64 true bits. Bucket caps
    * bound hub fan-out exactly as q22/q74 — with a locality-sensitive
    * hash, near-constant image families now genuinely pile into shared
    * band buckets, which is precisely the skew the cap exists for.
    */
  def phashPairs(docs: DataFrame, maxBucket: Int = 64,
                 maxHamming: Int = 6): DataFrame = {
    phashCandidatePairs(docs, maxBucket)
      // census by shared-band count rather than the raw pair list: the
      // candidate distribution (how many pairs the bands surface, how
      // close they get, how many verify within radius) is the operator's
      // tuning table
      .groupBy(col("n_shared_bands"))
      .agg(count(lit(1)).as("n_candidates"),
        sum(when(col("hamming") <= maxHamming, 1L).otherwise(0L))
          .as("n_within_radius"),
        min(col("hamming")).cast("int").as("min_hamming"),
        max(col("hamming")).cast("int").as("max_hamming"))
      .orderBy(col("n_shared_bands"))
  }

  def phashPairs(spark: SparkSession, sfDir: String): DataFrame =
    phashPairs(Tables.documents(spark, sfDir))
}
