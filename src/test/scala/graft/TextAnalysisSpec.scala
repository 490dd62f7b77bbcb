package graft

import graft.ops.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("langId predicts en for stopword-dense docs") {
    val docs = Seq(
      (0L, "the cat is in the hat and it is the best of hats", "en", "s0"),
      (1L, "zebra xylophone quartz jigsaw plasma", "de", "s0")
    ).toDF("doc_id", "text", "lang", "source")
    val m = TextAnalysis.langId(docs)
      .select("lang", "pred_lang").as[(String, String)].collect().toMap
    assert(m("en") === "en")
    assert(m("de") === "other")
  }

  test("bpeMerges learns (a,b) then (ab,c) on the classic corpus; fertility drops") {
    // word freqs: ab×3, abc×2, bcd×1 → pair counts (a,b)=5, (b,c)=3, (c,d)=1
    val docs = Seq((0L, "ab ab ab abc abc bcd", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
    val rows = TextAnalysis.bpeMerges(docs, rounds = 3).orderBy($"rnd")
      .select("rnd", "merged", "pair_count", "tokens_per_word")
      .as[(Int, Option[String], Option[Long], Double)].collect()
    assert(rows.map(_._2).toSeq === Seq(None, Some("ab"), Some("abc"), Some("bc")))
    assert(rows.map(_._3).toSeq === Seq(None, Some(5L), Some(2L), Some(1L)))
    // 15 chars / 6 words → 2.5; then 10/6, 8/6, 7/6 as merges land
    val tpw = rows.map(_._4)
    assert(tpw(0) === 2.5)
    assert(math.abs(tpw(1) - 10.0 / 6) < 2e-6)
    assert(math.abs(tpw(2) - 8.0 / 6) < 2e-6)
    assert(math.abs(tpw(3) - 7.0 / 6) < 2e-6)
  }

  test("confidentErrors flags the planted label error, keeps clean docs diagonal") {
    // two sources with disjoint vocabularies, one doc labeled srcA but
    // written in srcB's vocabulary
    val docs = ((0L to 4L).map(j => (j, "aaa aab aac", "en", "srcA")) ++
      (5L to 9L).map(j => (j, "bbb bba bbc", "en", "srcB")) :+
      (10L, "bbb bba bbc", "en", "srcA"))
      .toDF("doc_id", "text", "lang", "source")
    val rows = TextAnalysis.confidentErrors(docs)
      .select("actual", "suggested", "n_docs", "is_error")
      .as[(String, String, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // the planted error is confidently reassigned to srcB
    assert(rows(("srcA", "srcB")) === ((1L, true)))
    // clean docs stay on the diagonal
    assert(rows(("srcA", "srcA"))._1 === 5L)
    assert(rows(("srcB", "srcB"))._1 === 5L)
    assert(!rows(("srcA", "srcA"))._2 && !rows(("srcB", "srcB"))._2)
  }

  test("qualityScore computes exact token-derived features") {
    val docs = Seq((0L, "the cat sat", "en", "s0")).toDF("doc_id", "text", "lang", "source")
    val r = TextAnalysis.qualityScore(docs)
      .select("n_chars", "n_words", "avg_word_len", "punct_ratio", "stop_ratio")
      .as[(Int, Int, Double, Double, Double)].head()
    assert(r === ((11, 3, 3.0, 0.0, 0.3333)))
  }

  test("tokenCount aggregates per language") {
    val docs = Seq(
      (0L, "alpha beta gamma", "en", "s0"),
      (1L, "alpha beta", "en", "s0")
    ).toDF("doc_id", "text", "lang", "source")
    val r = TextAnalysis.tokenCount(docs)
      .select("n_docs", "total_tokens", "n_distinct_tokens")
      .as[(Long, Long, Long)].head()
    assert(r === ((2L, 5L, 3L)))
  }

  test("fingerprint groups word-set permutations together") {
    val docs = Seq(
      (0L, "a b c", "en", "s0"),
      (1L, "c b a", "en", "s0"),
      (2L, "b a c b", "en", "s0"), // same distinct word set
      (3L, "x y z", "en", "s0")
    ).toDF("doc_id", "text", "lang", "source")
    val r = TextAnalysis.fingerprint(docs)
      .select("n_docs", "first_doc", "last_doc").as[(Long, Long, Long)].collect()
    assert(r.toSeq === Seq((3L, 0L, 2L)))
  }

  test("lmScore: common transitions score higher than rare ones") {
    // model over the corpus: c(a b)=3, c(b a)=1, c(a c)=1 -> c(a *)=4, c(b *)=1
    val docs = Seq(
      (0L, "a b a b", "en", "s0"), // (2*ln(3/4) + ln(1/1)) / 3
      (1L, "a b", "en", "s0"), // ln(3/4)
      (2L, "a c", "en", "s0") // ln(1/4)
    ).toDF("doc_id", "text", "lang", "source")
    val rows = TextAnalysis.lmScore(docs)
      .orderBy("doc_id")
      .select("doc_id", "n_bigrams", "avg_logprob")
      .as[(Long, Long, Double)].collect().toSeq
    assert(rows === Seq((0L, 3L, -0.1918), (1L, 1L, -0.2877), (2L, 1L, -1.3863)))
  }

  test("noveltyCensus: the first source is fully novel, a copy source fully redundant") {
    val docs = Seq(
      (0L, "a b c d e", "en", "src0"),
      (1L, "a b c d e", "en", "src1"), // exact copy: zero novel grams
      (2L, "x y z w v", "en", "src2") // disjoint: fully novel
    ).toDF("doc_id", "text", "lang", "source")
    val rows = TextAnalysis.noveltyCensus(docs)
      .orderBy("source")
      .select("source", "n_grams", "n_novel", "novelty")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(rows === Seq(
      ("src0", 3L, 3L, 1.0), ("src1", 3L, 0L, 0.0), ("src2", 3L, 3L, 1.0)))
  }

  test("dsirWeights: documents that sound like the target source score higher") {
    // target src0 speaks only {aa bb}; src1 speaks only {xx yy}. A src1 doc
    // written in src0's vocabulary must out-score the native src1 docs.
    val docs = Seq(
      (0L, "aa bb aa bb aa", "en", "src0"),
      (1L, "bb aa bb aa bb", "en", "src0"),
      (2L, "xx yy xx yy xx", "en", "src1"),
      (3L, "aa bb aa bb aa", "en", "src1") // target-like outlier inside src1
    ).toDF("doc_id", "text", "lang", "source")
    val rows = TextAnalysis.dsirWeights(docs, targetSource = "src0")
      .orderBy("doc_id")
      .select("doc_id", "n_tok", "logratio")
      .as[(Long, Long, Double)].collect().toSeq
    assert(rows.map(_._2) === Seq(5L, 5L, 5L, 5L))
    val byDoc = rows.map(r => r._1 -> r._3).toMap
    assert(byDoc(3L) > byDoc(2L)) // target-like doc beats native src1 docs
    assert(byDoc(0L) > 0.0 && byDoc(2L) < 0.0)
    assert(byDoc(0L) === byDoc(3L)) // identical text → identical weight, source-blind
  }

  test("heapsLaw fits an exact half-power vocabulary curve") {
    // doc i carries 1 new word + 2i-2 repeats, so after d docs the curve is
    // V(d) = d, N(d) = d^2 — exactly V = N^0.5, i.e. beta 0.5, log10 K = 0.
    val docs = (1 to 8).map { i =>
      val words = s"w$i" +: Seq.fill(2 * i - 2)("w1")
      (i.toLong, words.mkString(" "), "x", "s")
    }.toDF("doc_id", "text", "lang", "source")
    val got = TextAnalysis.heapsLaw(docs)
      .select("lang", "n_docs", "tokens", "vocab", "beta", "log10_k")
      .as[(String, Long, Long, Long, Double, Double)].head()
    assert(got === (("x", 8L, 64L, 8L, 0.5, 0.0)))
  }

  test("rankChurn scores a planted head-vocabulary shift") {
    // cutoff = 3*3/4 = 2: docs 0-2 are the old snapshot ("aa bb" → ranks
    // aa=1, bb=2), doc 3 is the new one ("bb cc" → bb=1, cc=2). Common
    // token bb moved one rank; union is {aa, bb, cc}.
    val docs = Seq(
      (0L, "aa bb"), (1L, "aa bb"), (2L, "aa bb"), (3L, "bb cc")
    ).map { case (id, t) => (id, t, "x", "s") }
      .toDF("doc_id", "text", "lang", "source")
    val got = TextAnalysis.rankChurn(docs)
      .select("lang", "n_common", "jaccard", "mean_disp")
      .as[(String, Long, Double, Double)].head()
    assert(got === (("x", 1L, 0.333333, 1.0)))
  }

  test("readability counts sentences, words and vowel groups") {
    val docs = Seq((1L, "The cat sat. The dog ran!", "en", "s", 25L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.readability(docs).collect().head
    assert(r.getAs[Long]("n_sent") == 2)
    assert(r.getAs[Long]("n_words") == 6)
    // e, a, a, e, o, a -> 6 vowel groups
    assert(r.getAs[Long]("n_syll") == 6)
    // 206.835 - 1.015*3 - 84.6*1 = 119.19
    assert(math.abs(r.getAs[Double]("flesch") - 119.19) < 1e-9)
  }

  test("tfidfCosinePairs: shared rare term links docs, stop term does not") {
    // "zebra" appears in docs 1,2 only (rare); "common" in all 10 (df*5 > n)
    val docs = ((1 to 10).map { i =>
      val extra = if (i <= 2) "zebra quark" else s"filler$i other$i"
      (i.toLong, s"common $extra", "en", "s", 20L)
    }).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = TextAnalysis.tfidfCosinePairs(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r).toMap
    assert(rows.keySet == Set((1L, 2L)))
    // docs 1 and 2 share their entire rare vocabulary -> cosine 1
    assert(math.abs(rows((1L, 2L)).getAs[Double]("cosine") - 1.0) < 1e-9)
  }

  test("vocabOverlap uses the Szymkiewicz-Simpson coefficient") {
    // s1 vocab {a,b,c,d}, s2 vocab {c,d}, overlap 2/min(4,2) = 1.0;
    // s3 is disjoint -> no row at all
    val docs = Seq((1L, "a b c d", "s1"), (2L, "c d", "s2"),
      (3L, "x y z", "s3"))
      .map { case (i, t, src) => (i, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = TextAnalysis.vocabOverlap(docs).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) -> r)
      .toMap
    assert(rows.keySet == Set(("s1", "s2")))
    assert(rows(("s1", "s2")).getAs[Double]("overlap") == 1.0)
    assert(rows(("s1", "s2")).getAs[Long]("n_shared") == 2)
  }

  test("compressibility separates repetitive from organic text") {
    val docs = Seq(
      (1L, "ab" * 50, "loop"),        // 2 distinct 4-grams out of 97
      (2L, ('a' to 'z').mkString + "0123456789", "organic"))
      .map { case (i, t, src) => (i, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val m = TextAnalysis.compressibility(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(m("loop").getAs[Long]("n_distinct") == 2)
    assert(m("organic").getAs[Double]("distinct_ratio") == 1.0)
    assert(m("loop").getAs[Double]("distinct_ratio")
      < m("organic").getAs[Double]("distinct_ratio"))
  }

  test("langPurity scores sources by lang-id agreement") {
    val en = "the cat of the house and the dog in it is a pet it is"
    val xx = "zzz yyy www qqq rrr"
    val docs = Seq((1L, en, "en", "good"), (2L, en, "en", "mixed"),
      (3L, xx, "en", "mixed")) // labeled en but no stopwords -> miss
      .map { case (i, t, l, src) => (i, t, l, src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val m = TextAnalysis.langPurity(docs).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("purity")).toMap
    assert(m("good") == 1.0)
    assert(m("mixed") == 0.5)
  }
}
