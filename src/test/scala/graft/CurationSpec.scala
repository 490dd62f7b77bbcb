package graft

import graft.ops.Curation

/** Mixture-plan arithmetic on a corpus small enough to verify by hand. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("dedupAwareMixture: cross-source dup deflates the dup's stratum, not the keeper's") {
    // a: "x y z" twice (within-source dup); b: "p q" plus a cross-source
    // copy of a's text whose keeper lives in a → b keeps only 2 of 5 tokens
    val docs = Seq(
      (0L, "x y z", "en", "a", 0L), (1L, "x y z", "en", "a", 0L),
      (2L, "p q", "en", "b", 0L), (3L, "x y z", "en", "b", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val m = Curation.dedupAwareMixture(docs, maxEpochs = 4.0)
      .select("source", "tokens_total", "tokens_kept", "planned_naive",
        "planned_dedup", "epochs_eff", "dup_reread")
      .as[(String, Long, Long, Long, Long, Double, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(m("a")._2 === 6L && m("a")._3 === 3L)
    assert(m("b")._2 === 5L && m("b")._3 === 2L)
    // naive budget min(6·4/.5, 5·4/.5)=40 → 20/source; dedup budget
    // min(3·4/.5, 2·4/.5)=16 → 8/source
    assert(m("a")._4 === 20L && m("b")._4 === 20L)
    assert(m("a")._5 === 8L && m("b")._5 === 8L)
    assert(math.abs(m("a")._6 - 8.0 / 3) < 1e-4)
    assert(m("b")._6 === 4.0)
    // naive plan re-reads: a 20·(1−3/6)=10, b 20·(1−2/5)=12 — and
    // planned_naive − dup_reread ≠ planned_dedup: re-solve, don't patch
    assert(m("a")._7 === 10L && m("b")._7 === 12L)
    assert(m("a")._4 - m("a")._7 !== m("a")._5)
  }

  test("orderRuns: clumped storage scores far below expectation, alternating above") {
    def corpus(srcOf: Long => String) =
      (0L until 20L).map(j => (j, s"text $j", "en", srcOf(j)))
        .toDF("doc_id", "text", "lang", "source")
    // A¹⁰B¹⁰ → 2 runs; E[R] = (20·21 − 2·100)/20 = 11
    val clump = Curation.orderRuns(corpus(j => if (j < 10) "A" else "B"))
      .select("n", "n_runs", "expected_runs", "z")
      .as[(Long, Long, Double, Option[Double])].head()
    assert(clump._1 === 20L && clump._2 === 2L)
    assert(math.abs(clump._3 - 11.0) < 1e-9)
    assert(clump._4.get < -3.0)
    // ABAB… → 20 runs, z positive
    val alt = Curation.orderRuns(corpus(j => if (j % 2 == 0) "A" else "B"))
      .select("n_runs", "z").as[(Long, Option[Double])].head()
    assert(alt._1 === 20L && alt._2.get > 3.0)
  }

  test("shardBalance: a single-source corpus has zero TVD in every shard") {
    val docs = (0L until 64L).map(j => (j, s"doc $j text", "en", "only", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Curation.shardBalance(docs, shards = 8)
      .select("shard", "n_docs", "tvd", "max_source_share")
      .as[(Int, Long, Double, Double)].collect()
    assert(rows.map(_._2).sum === 64L)   // every doc lands in some shard
    assert(rows.forall(_._3 === 0.0))    // shard mix ≡ global mix
    assert(rows.forall(_._4 === 1.0))
    // md5 sharding actually spreads: no shard holds the majority
    assert(rows.map(_._2).max < 32L)
  }

  test("mixturePlan: budget pinned by the scarcest stratum, epochs capped") {
    // en has 100 tokens available, de only 10; with a 50/50 target and a
    // 2-epoch cap the de side pins the budget at 10*2/0.5 = 40 tokens.
    val docs = Seq(
      (0L, Seq.fill(100)("w").mkString(" "), "en", "s0", 0L),
      (1L, Seq.fill(10)("w").mkString(" "), "de", "s0", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Curation.mixturePlan(docs,
        targets = Seq("en" -> 0.5, "de" -> 0.5), maxEpochs = 2.0)
      .orderBy("lang")
      .select("lang", "avail_tokens", "planned_tokens", "epochs", "budget_tokens")
      .as[(String, Long, Long, Double, Long)].collect().toSeq
    assert(rows === Seq(
      ("de", 10L, 20L, 2.0, 40L),
      ("en", 100L, 20L, 0.2, 40L)))
  }

  test("curationFunnel: gates are cumulative and each can drop a doc") {
    val clean = (1 to 20).map(i => s"word$i").mkString(" ")
    val tooShort = "just three words"
    val repetitive = Seq.fill(40)("w").mkString(" ")
    val punctHeavy = (1 to 15).map(i => s"w$i!!!").mkString(" ")
    val docs = Seq(
      (0L, clean, "en", "s0", 0L),
      (1L, tooShort, "en", "s0", 0L),
      (2L, repetitive, "en", "s0", 0L),
      (3L, punctHeavy, "en", "s0", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Curation.curationFunnel(docs)
      .select("source", "n_docs", "n_pass_len", "n_pass_rep", "n_pass_all", "retention")
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    assert(rows === Seq(("s0", 4L, 3L, 2L, 1L, 0.25)))
  }

  test("chunkPlan: chunk grid covers the text with the declared overlap") {
    // chunkSize 10, overlap 4 → stride 6. len 25 → chunks at 1, 7, 13, 19:
    // the last chunk is the 7-char tail. len 10 and len 3 → exactly 1 chunk.
    val docs = Seq(
      (0L, "a" * 25, "en", "s0", 25L),
      (50L, "b" * 10, "en", "s0", 10L),
      (100L, "ccc", "en", "s0", 3L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Curation.chunkPlan(docs, chunkSize = 10, overlap = 4, sampleMod = 1)
      .orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_idx", "c_start", "c_len")
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(rows === Seq(
      (0L, 0, 1L, 10L), (0L, 1, 7L, 10L), (0L, 2, 13L, 10L), (0L, 3, 19L, 7L),
      (50L, 0, 1L, 10L),
      (100L, 0, 1L, 3L)))
    // coverage invariant: consecutive chunks overlap by exactly `overlap`
    // and the final chunk ends at the document's last character
    rows.groupBy(_._1).foreach { case (_, cs) =>
      cs.sliding(2).foreach {
        case Seq((_, _, s1, l1), (_, _, s2, _)) => assert(s1 + l1 - s2 === 4L)
        case _ =>
      }
      val (_, _, s, l) = cs.last
      val len = cs.head match { case (id, _, _, _) => Map(0L -> 25L, 50L -> 10L, 100L -> 3L)(id) }
      assert(s + l - 1 === len)
    }
  }

  test("pipelineManifest attributes every drop to its stage") {
    val clean1 = (1 to 20).map(i => s"word$i").mkString(" ")
    val clean2 = (1 to 20).map(i => s"other$i").mkString(" ")
    val docs = Seq(
      (0L, clean1, "en", "s0", 0L),
      (1L, clean1, "en", "s0", 0L), // exact dup of 0
      (2L, "just three words", "en", "s0", 0L), // fails the length gate
      (3L, clean2, "en", "s0", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")

    val noSampling = Curation.pipelineManifest(docs, rates = Map.empty)
      .orderBy("doc_id").select("doc_id", "stage")
      .as[(Long, String)].collect().toSeq
    assert(noSampling === Seq(
      (0L, "kept"), (1L, "dup"), (2L, "gate"), (3L, "kept")))

    // rate 0 for en: every doc surviving dedup+gates is sampled out
    val allSampled = Curation.pipelineManifest(docs, rates = Map("en" -> 0.0))
      .orderBy("doc_id").select("doc_id", "stage")
      .as[(Long, String)].collect().toSeq
    assert(allSampled === Seq(
      (0L, "sample"), (1L, "dup"), (2L, "gate"), (3L, "sample")))
  }

  test("negativeSamples drops self pairs and exact-dup negatives") {
    // bucket b = doc_id % 64; representative of each bucket = its min id.
    // doc 65 (b=1) pairs with reps of buckets 2, 8, 32; doc 2 is an exact
    // dup of doc 65's text -> that pair is dropped as a false negative
    val docs = (Seq((1L, "alpha beta"), (2L, "same text"), (8L, "gamma"),
      (32L, "delta"), (65L, "same text"), (33L, "epsilon"), (39L, "zeta"),
      (63L, "eta")))
      .map { case (id, t) => (id, t, "en", "s" + (id % 2), t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.ops.Curation.negativeSamples(docs).collect()
    val negs = out.map(_.getAs[Long]("n_negs")).sum
    val dropped = out.map(_.getAs[Long]("n_dropped_dup")).sum
    assert(negs > 0)
    assert(dropped >= 1) // 65 vs bucket-2 rep (doc 2, identical text)
  }
}
