package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize a larger scale factor from an existing one by stamping K
  * key-shifted copies (default 10: sf0.1 → sf1) — the scale-rehearsal data
  * generator behind BASELINE_sf1.md.
  *
  * Design constraints, so that timings at the synthetic SF mean something:
  *
  *  - **Referential integrity per copy.** Every foreign key is offset by the
  *    same per-table stride as its primary key, so joins have the same
  *    per-key fan-out as the source data — row counts scale ×K, join output
  *    scales ×K, never ×K².
  *  - **Constant duplicate ratio.** Documents get a per-copy token suffix
  *    (`w` → `w~i`), making shingle/MinHash/SimHash spaces of different
  *    copies disjoint: the near-dup pair density (pairs/row) stays that of
  *    the source corpus instead of every doc gaining K−1 exact twins, which
  *    would quadratically inflate pair-join output and measure a *harder*
  *    problem than 10× data. Embeddings get a small deterministic per-copy
  *    perturbation for the same reason (exact-tie clusters would grow ×K).
  *  - **Dims stay dims.** region/nation are not replicated — at any real SF
  *    they are broadcast-side tables.
  *  - **Time axis unchanged.** Timestamps are copied verbatim, so per-window
  *    densities grow ×K — the same thing that happens when a real deployment
  *    ingests K× the devices over the same calendar window.
  *
  * Usage: runMain graft.ScaleUp <srcDir> <dstDir> [copies]
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // One stride per key family, each far above the source key range so
    // copies can never collide.
    val C = 10000000L   // custkey
    val O = 100000000L  // orderkey
    val P = 10000000L   // partkey
    val S = 1000000L    // suppkey
    val E = 100000000L  // event_id
    val U = 100000000L  // user_id
    val D = 10000000L   // doc_id / vec_id

    // Shift a key by i*stride while PRESERVING the source column's type —
    // `col + lit(long)` would silently widen an IntegerType key to LongType,
    // handing the rehearsal different parquet schemas (and thus different
    // join/coercion plans) than real generated data.
    def shifted(df: DataFrame, c: String, stride: Long, i: Int) =
      (col(c) + lit(i * stride)).cast(df.schema(c).dataType)

    def stamp(name: String, df: DataFrame)(shift: (DataFrame, Int) => DataFrame): Unit = {
      val out = (0 until copies).map(i => shift(df, i)).reduce(_ unionAll _)
      out.repartition(32).write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name x$copies written")
    }

    // dims: copy verbatim
    Seq("region", "nation").foreach { t =>
      Tables.load(spark, src, t).write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }

    stamp("customer", Tables.customer(spark, src)) { (df, i) =>
      df.withColumn("c_custkey", shifted(df, "c_custkey", C, i))
    }
    stamp("supplier", Tables.supplier(spark, src)) { (df, i) =>
      df.withColumn("s_suppkey", shifted(df, "s_suppkey", S, i))
    }
    stamp("part", Tables.part(spark, src)) { (df, i) =>
      df.withColumn("p_partkey", shifted(df, "p_partkey", P, i))
    }
    stamp("orders", Tables.orders(spark, src)) { (df, i) =>
      df.withColumn("o_orderkey", shifted(df, "o_orderkey", O, i))
        .withColumn("o_custkey", shifted(df, "o_custkey", C, i))
    }
    stamp("lineitem", Tables.lineitem(spark, src)) { (df, i) =>
      df.withColumn("l_orderkey", shifted(df, "l_orderkey", O, i))
        .withColumn("l_partkey", shifted(df, "l_partkey", P, i))
        .withColumn("l_suppkey", shifted(df, "l_suppkey", S, i))
    }
    stamp("events", Tables.events(spark, src)) { (df, i) =>
      df.withColumn("event_id", shifted(df, "event_id", E, i))
        .withColumn("user_id", shifted(df, "user_id", U, i))
    }
    stamp("documents", Tables.load(spark, src, "documents")) { (df, i) =>
      val t =
        if (i == 0) df
        else df.withColumn(
          "text",
          array_join(transform(split(col("text"), " "), w => concat(w, lit(s"~$i"))), " "))
      t.withColumn("doc_id", shifted(df, "doc_id", D, i))
        .withColumn("n_chars", length(col("text")).cast(df.schema("n_chars").dataType))
    }
    stamp("embeddings", Tables.load(spark, src, "embeddings")) { (df, i) =>
      // Decorrelate copies with a per-copy CYCLIC DIMENSION ROTATION:
      // within a copy every pairwise distance/cosine is EXACTLY preserved
      // (a rotation is an isometry), so each copy carries the source
      // corpus's full near-dup/cluster structure — while cross-copy
      // cosines collapse to noise (~N(0, 1/64)), far below any near-dup
      // threshold. Additive noise can't do both: at ±0.02 copies sat at
      // cos ≈ 0.99 (every vector gained K−1 near-twins and the rehearsal
      // measured that artifact, not the operator), and even entry-scale
      // noise leaves cos ≈ 0.7, still above srpLsh's 0.4 link fence.
      // Shifts 7i mod 64 are distinct and nonzero for i = 1..9.
      val t =
        if (i == 0) df
        else {
          val sh = (7 * i) % 64
          df.withColumn(
            "embedding",
            expr(s"concat(slice(embedding, ${sh + 1}, ${64 - sh}), slice(embedding, 1, $sh))"))
        }
      t.withColumn("vec_id", shifted(df, "vec_id", D, i))
    }
    spark.stop()
  }
}
