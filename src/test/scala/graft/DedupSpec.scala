package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("splitLeakage: planted near-dup clique leaks exactly train×eval pairs") {
    // 20 identical docs → all C(20,2)=190 pairs are near-dups; the md5
    // split fixes t train / e eval docs, so cross = t·e and every eval
    // member is contaminated (each pairs with every train member)
    val docs = (0L until 20L).map(j => (j, "one two three four five", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
    val r = Dedup.splitLeakage(docs)
      .select("n_pairs", "n_within_train", "n_within_eval", "n_cross",
        "n_eval_docs", "n_contam_eval_docs", "contam_tokens")
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert(r._1 === 190L)
    assert(r._2 + r._3 + r._4 === 190L)
    val e = r._5 // every doc is in the clique, so eval side size = e
    val t = 20L - e
    assert(r._3 === e * (e - 1) / 2)
    assert(r._2 === t * (t - 1) / 2)
    assert(r._4 === t * e)
    assert(r._6 === (if (t > 0) e else 0L)) // all eval docs contaminated
    assert(r._7 === r._6 * 5L)              // 5 tokens per doc
  }

  test("dupSpectrum: multiplicity histogram with exact token accounting") {
    val docs = Seq(
      (0L, "a b c", "en", "s", 0L), (1L, "a b c", "en", "s", 0L),
      (2L, "a b c", "en", "s", 0L),                       // m=3, 3 tok each
      (3L, "x y", "en", "s", 0L),                         // m=1, 2 tok
      (4L, "p q r s", "en", "s", 0L), (5L, "p q r s", "en", "s", 0L) // m=2
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Dedup.dupSpectrum(docs).orderBy($"multiplicity")
      .select("multiplicity", "n_groups", "n_docs", "tokens_total",
        "tokens_excess")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.toSeq === Seq(
      (1L, 1L, 1L, 2L, 0L),
      (2L, 1L, 2L, 8L, 4L),
      (3L, 1L, 3L, 9L, 6L)))
    // the excess column integrates to q254's total dup tokens
    assert(rows.map(_._5).sum === 10L)
  }

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog", "s0"),
    (1L, "the quick brown fox jumps over the lazy dog", "s0"), // exact dup of 0
    (2L, "The  quick brown fox jumps over the lazy dog", "s1"), // dup after normalization
    (3L, "completely different text about spark engines here", "s1")
  ).toDF("doc_id", "text", "source")

  test("exactDedup keeps first doc_id per normalized hash") {
    val rows = Dedup.exactDedup(docs).orderBy("source")
      .as[(String, Long, Long, Long)].collect()
    assert(rows === Seq(("s0", 2L, 1L, 1L), ("s1", 2L, 1L, 1L)))
  }

  test("ngramJaccard flags identical shingle sets with jaccard 1.0") {
    val rows = Dedup.ngramJaccard(docs).orderBy("doc_a", "doc_b")
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(rows.map(r => (r._1, r._2)) === Seq((0L, 1L), (0L, 2L), (1L, 2L)))
    assert(rows.forall(_._3 === 1.0))
  }

  test("prefix-filtered jaccard join is lossless vs the full join") {
    val direct = Dedup.ngramJaccard(docs).orderBy("doc_a", "doc_b").collect().toSeq
    val prefix = Dedup.ngramJaccardPrefix(docs).orderBy("doc_a", "doc_b").collect().toSeq
    assert(prefix === direct)
  }

  test("ngramJaccardCapped: the cap engages, and the prefix path stays exact on the capped set") {
    // the real sf0.001 corpus at maxDf=3: a biting cap (sf0.001 shingle DFs
    // reach beyond 3). The capped output must (a) differ from the uncapped
    // one — otherwise the cap never engaged and the test proves nothing —
    // and (b) equal a direct inverted-index join over the SAME capped
    // shingle set, i.e. the prefix filter is still lossless post-cap.
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val capped = Dedup.ngramJaccardCapped(corpus, minJaccard = 0.5, maxDf = 3)
      .orderBy("doc_a", "doc_b").collect().toSeq
    val uncapped = Dedup.ngramJaccardPrefix(corpus, minJaccard = 0.5)
      .orderBy("doc_a", "doc_b").collect().toSeq
    assert(capped !== uncapped, "maxDf=3 never engaged on the fixture corpus")
    // direct recompute on the capped feature set
    val sh0 = Dedup.shingles(corpus)
    val keep = sh0.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .where(col("df") <= 3).select("sh")
    val sh = sh0.join(keep, "sh").select(col("doc_id"), col("sh"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val direct = sh.toDF("doc_a", "sh")
      .join(sh.toDF("doc_b", "sh"), Seq("sh"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_shared"))
      .join(sizes.toDF("doc_a", "na"), "doc_a")
      .join(sizes.toDF("doc_b", "nb"), "doc_b")
      .withColumn("jaccard",
        col("n_shared").cast("double") / (col("na") + col("nb") - col("n_shared")))
      .where(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        round(col("jaccard"), 6).as("jaccard"))
      .orderBy("doc_a", "doc_b").collect().toSeq
    assert(capped === direct)
    assert(capped.nonEmpty, "capped corpus produced no pairs")
  }

  test("asymmetric containment prefix filter is lossless vs the direct join") {
    // the real sf0.001 corpus: 500 docs with genuine near-dup structure —
    // the prefix path must emit the IDENTICAL final pairs as the symmetric
    // inverted join at every threshold tried (incl. t where t*n is integral)
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    for (t <- Seq(0.5, 0.8)) {
      val direct = Dedup.finishContainment(corpus,
          Dedup.containmentCandidatesDirect(corpus), t)
        .orderBy("doc_a", "doc_b").collect().toSeq
      val pref = Dedup.containmentPairs(corpus, minContainment = t)
        .orderBy("doc_a", "doc_b").collect().toSeq
      assert(pref === direct, s"containment prefix path diverged at t=$t")
      assert(direct.nonEmpty, "cross-validation corpus produced no pairs")
    }
  }

  test("minhashLsh collides all bands for identical documents") {
    val rows = Dedup.minhashLsh(docs).orderBy("doc_a", "doc_b")
      .as[(Long, Long, Long)].collect()
    assert(rows === Seq((0L, 1L, 3L), (0L, 2L, 3L), (1L, 2L, 3L)))
  }

  test("mega-duplicate cluster: band cap suppresses the quadratic join but clustering recovers it") {
    // 10k identical docs (one boilerplate mega-cluster) + the 4 normal docs.
    // Uncapped, the mega-cluster alone would expand to ~5·10⁷ candidate
    // pairs; the cap must keep the pair join to the normal docs' pairs and
    // carry the mega-cluster into clustering as O(n) star edges.
    val mega = spark.range(100, 10100).select(
      col("id").as("doc_id"),
      lit("shared boilerplate license header repeated across the whole mirror set").as("text"),
      lit("sM").as("source"))
    val all = docs.union(mega)

    // pair surface: nothing from the over-cap bucket, normal pairs intact
    val pairs = Dedup.minhashLsh(all)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSeq.sorted
    assert(pairs === Seq((0L, 1L), (0L, 2L), (1L, 2L)))

    // edge surface: exactly one star (9999 edges) for the mega-bucket
    val edges = Dedup.lshEdges(all)
    assert(edges.where(col("src") === 100L).count() === 9999L)
    assert(edges.count() === 9999L + 3L)

    // clustering recovers the full 10k cluster with min-id canonical rep
    val clusters = Dedup.dupClusters(all)
    val megaRows = clusters.where(col("cluster_id") === 100L)
    assert(megaRows.count() === 10000L)
    assert(megaRows.agg(max(col("cluster_size"))).as[Long].head() === 10000L)
    assert(megaRows.where(col("is_canonical")).select("doc_id").as[Long].head() === 100L)

    // accounting: the census reports the suppressed buckets per band
    val census = Dedup.lshBucketCensus(all)
      .select("band", "pairs_suppressed", "n_overcap")
      .as[(Int, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(census.map(_._1) === Seq(0, 1, 2))
    assert(census.forall(_._2 === 10000L * 9999L / 2))
    assert(census.forall(_._3 === 1L))
  }

  test("empty documents cannot link sources via the universal fingerprint") {
    // three sources that share NOTHING except a blank/whitespace-only doc;
    // s0/s1 legitimately share the fox content
    val withEmpty = docs.union(Seq(
      (10L, "", "s0"), (11L, "   ", "s1"), (12L, "", "s2"),
      (13L, "unique content only in s2", "s2")
    ).toDF("doc_id", "text", "source"))
    val rows = Dedup.sourceContamination(withEmpty)
      .select("source_a", "source_b").as[(String, String)].collect().toSeq.sorted
    // without the guard s2 would show contaminated with both s0 and s1
    assert(rows === Seq(("s0", "s1")))
  }

  test("simhash is equal for identical texts and differs across texts") {
    val m = Dedup.simhash(docs).as[(Long, Long)].collect().toMap
    assert(m(0L) === m(1L))
    assert(m(0L) === m(2L)) // same normalized token multiset
    assert(m(0L) !== m(3L))
    assert(m.values.forall(v => v >= 0L && v < (1L << 60)))
  }

  test("embedNearDup keeps only same-label pairs above the cosine floor") {
    val emb = Seq(
      (0L, Array(1f, 0f), 0),
      (1L, Array(1f, 0.01f), 0),
      (2L, Array(0f, 1f), 0),
      (3L, Array(1f, 0f), 1) // same direction as 0 but different label: blocked
    ).toDF("vec_id", "embedding", "label")
    val rows = Dedup.embedNearDup(emb)
      .select("vec_a", "vec_b").as[(Long, Long)].collect()
    assert(rows.toSeq === Seq((0L, 1L)))
  }

  test("decontamFlags flags only training docs sharing an n-gram with the eval set") {
    val corpus = Seq(
      (0L, "a b c d e", "en", "s0", 0L), // eval (0 % 50 == 0)
      (1L, "x a b c d y", "en", "s0", 0L), // shares "a b c d"
      (2L, "p q r s t", "en", "s0", 0L), // clean
      (3L, "b c d e", "en", "s0", 0L) // shares "b c d e"
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Dedup.decontamFlags(corpus)
      .orderBy("doc_id")
      .as[(Long, Long)].collect().toSeq
    assert(rows === Seq((1L, 1L), (3L, 1L)))
  }

  test("leakageSafeSplit never splits a duplicate cluster across splits") {
    val corpus = Seq(
      (0L, "aa bb cc dd ee", "en", "s0", 0L),
      (1L, "aa bb cc dd ee", "en", "s0", 0L), // exact dup of 0 -> same cluster
      (2L, "xx yy zz ww vv", "en", "s0", 0L) // singleton
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Dedup.leakageSafeSplit(corpus)
      .select("split", "n_docs", "n_clusters")
      .as[(String, Long, Long)].collect().toSeq
    assert(rows.map(_._2).sum === 3L)
    // if the dup pair straddled two splits, its shared rep would be counted
    // in both and the cluster total would exceed 2
    assert(rows.map(_._3).sum === 2L)
  }

  test("clusterKeepBest keeps the longest cluster member, min id on ties") {
    val corpus = Seq(
      // cluster {0,1,2}: identical shingle sets; 1 is longest → kept
      (0L, "aa bb cc dd ee", "en", "s0", 14L),
      (1L, "aa bb cc dd ee ff", "en", "s0", 17L),
      (2L, "aa bb cc dd ee", "en", "s0", 14L),
      (3L, "xx yy zz ww vv", "en", "s0", 14L) // singleton → kept
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Dedup.clusterKeepBest(corpus)
      .orderBy("doc_id")
      .select("doc_id", "cluster_id", "cluster_size", "is_kept")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(rows === Seq(
      (0L, 0L, 3L, false), (1L, 0L, 3L, true),
      (2L, 0L, 3L, false), (3L, 3L, 1L, true)))

    // tie on length inside the cluster → the smallest doc_id wins
    val tied = Seq(
      (5L, "aa bb cc dd ee", "en", "s0", 14L),
      (6L, "aa bb cc dd ee", "en", "s0", 14L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val kept = Dedup.clusterKeepBest(tied)
      .where(col("is_kept")).select("doc_id").as[Long].collect().toSeq
    assert(kept === Seq(5L))
  }

  test("substringSpans finds one maximal shared run with exact bounds") {
    // 100 shared chars embedded at different offsets in unrelated context;
    // letters chosen so context windows can't accidentally match
    val shared = "z" * 36 + "q" * 32 + "k" * 32 // 100 chars, run structure
    val a = "a" * 10 + shared + "b" * 20 // shared at 1-based pos 11
    val b = "c" * 25 + shared + "d" * 5  // shared at 1-based pos 26
    val spans = Dedup.substringSpans(
        Seq((1L, a), (2L, b)).toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(spans === Seq((1L, 2L, 11L, 26L, 100L)))
  }

  test("substringSpans separates distinct runs and drops short ones") {
    // two shared regions: one of 80 chars (reported), one of 40 chars
    // (40 < minSpan=64 → dropped); contexts differ so runs can't merge
    val s1 = "m" * 40 + "n" * 40
    val s2 = "p" * 40
    val a = s1 + "x" * 15 + s2
    val b = "y" * 7 + s1 + "w" * 30 + s2 + "v" * 3
    val spans = Dedup.substringSpans(
        Seq((1L, a), (2L, b)).toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(spans === Seq((1L, 2L, 1L, 8L, 80L)))
  }

  test("substringSpans: no span between unrelated docs") {
    val spans = Dedup.substringSpans(Seq(
      (1L, "totally unrelated first document text that is long enough to window"),
      (2L, "second document with nothing in common across any thirty two chars")
    ).toDF("doc_id", "text")).count()
    assert(spans === 0L)
  }

  test("spanRemoval merges overlapping spans and charges only later docs") {
    // doc 2 shares one 100-char passage with BOTH doc 0 and doc 1 — two
    // identical doc_b-side intervals that must merge to ONE region of 100
    // removable chars, not 200; docs 0/1 (earlier ids) keep their copies
    // and doc 1 is charged for its own overlap with doc 0.
    val shared = "z" * 36 + "q" * 32 + "k" * 32
    val d0 = "a" * 10 + shared + "b" * 20
    val d1 = "c" * 25 + shared + "d" * 5
    val d2 = "e" * 7 + shared + "f" * 12
    val out = Dedup.spanRemoval(
        Seq((0L, d0), (1L, d1), (2L, d2)).toDF("doc_id", "text"))
      .select("doc_id", "n_regions", "chars_removable")
      .as[(Long, Long, Long)].collect()
      .map { case (id, a, b) => id -> ((a, b)) }.toMap
    assert(!out.contains(0L)) // earliest copy never charged
    assert(out(1L) === ((1L, 100L)))
    assert(out(2L) === ((1L, 100L)))
  }

  test("spanRemoval frac is removable chars over normalized length") {
    val shared = "z" * 36 + "q" * 32 + "k" * 32 // 100 chars
    val a = "a" * 10 + shared + "b" * 20
    val b = "c" * 25 + shared + "d" * 75 // normalized length 200
    val row = Dedup.spanRemoval(Seq((1L, a), (2L, b)).toDF("doc_id", "text"))
      .select("doc_id", "frac_removable").as[(Long, Double)].collect().toMap
    assert(row(2L) === 0.5)
  }

  test("normFunnel attributes collisions to the right normalization stage") {
    val d = Seq(
      (1L, "Hello World", "a"),  // case-dup of 2 only after lower
      (2L, "hello world", "a"),
      (3L, "hello  world", "a"), // spacing-dup only after ws-collapse
      (4L, "hello, world!", "a") // punct-dup only after alnum strip
    ).toDF("doc_id", "text", "source")
    val r = Dedup.normFunnel(d).collect().head
    assert(r.getAs[Long]("n_docs") == 4)
    assert(r.getAs[Long]("u_raw") == 4)
    assert(r.getAs[Long]("u_trim") == 4)
    assert(r.getAs[Long]("u_lower") == 3)  // 1 ≡ 2
    assert(r.getAs[Long]("u_ws") == 2)     // 3 joins
    assert(r.getAs[Long]("u_alnum") == 1)  // 4 joins
  }

  test("dupInflation charges cross-source dups to the duplicate's source") {
    val d = Seq(
      (1L, "one two three", "orig"),   // keeper (3 tokens)
      (2L, "one two three", "mirror"), // dup in another source
      (3L, "four five", "mirror"))     // unique (2 tokens)
      .toDF("doc_id", "text", "source")
    val m = Dedup.dupInflation(d).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(m("orig").getAs[Long]("tokens_dup") == 0)
    assert(m("mirror").getAs[Long]("tokens_total") == 5)
    assert(m("mirror").getAs[Long]("tokens_dup") == 3)
    assert(m("mirror").getAs[Double]("inflation") == 2.5)
  }

  test("dupTransitivity closure on a clean duplicate pair graph") {
    // three identical docs -> LSH pairs (1,2),(1,3),(2,3): every wedge
    // closes, closure_rate = 1
    val t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq((1L, t, "a"), (2L, t, "a"), (3L, t, "b"),
      (4L, "totally different words here that never collide at all", "b"))
      .toDF("doc_id", "text", "source")
    val r = Dedup.dupTransitivity(docs).collect().head
    assert(r.getAs[Long]("n_pairs") == 3)
    assert(r.getAs[Long]("n_wedges") == 3)
    assert(r.getAs[Long]("n_closed") == 3)
    assert(r.getAs[Double]("closure_rate") == 1.0)
  }

  test("sourceMinhash: identical sources estimate Jaccard 1, disjoint near 0") {
    val t1 = "alpha beta gamma delta epsilon zeta eta theta"
    val t2 = "one two three four five six seven eight nine ten"
    val d = Seq((1L, t1, "sA"), (2L, t1, "sB"), (3L, t2, "sC"))
      .toDF("doc_id", "text", "source")
    val rows = Dedup.sourceMinhash(d).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) -> r)
      .toMap
    // sA and sB share every shingle: exact and estimated Jaccard both 1
    assert(rows(("sA", "sB")).getAs[Double]("exact_j") == 1.0)
    assert(rows(("sA", "sB")).getAs[Double]("est_j") == 1.0)
    // disjoint sources produce no intersection row at all
    assert(!rows.contains(("sA", "sC")))
  }
}
