package graft

import graft.ops.{Dedup, Graph, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Degenerate-input behavior of the round-9 widening operators — tiny
  * corpora, exhausted selections, empty survivor sets. These pin the
  * CONVENTIONS (what the operator emits when the input underflows its
  * parameters) so ANSI mode never turns a corner case into a crash.
  */
class Round9EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  test("kcenterCoreset with t > n re-picks covered points at radius 0") {
    // 2 distinct vectors, t=4: picks 0 then 10; every further "farthest"
    // point is already covered (md = 0) → radius 0 rows, coverage stays 0
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (10L, Array(0f, 1f, 0f, 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val rows = Similarity.kcenterCoreset(emb, t = 4).orderBy($"k")
      .select("k", "center_id", "radius", "cov_max")
      .as[(Int, Long, Option[Double], Double)].collect()
    assert(rows.length === 4)
    assert(rows(0)._2 === 0L && rows(1)._2 === 10L)
    assert(math.abs(rows(1)._3.get - 2.0) < 1e-9)
    // exhausted: later picks report radius 0 and coverage stays 0
    assert(rows.drop(2).forall(r => r._3.contains(0.0) && r._4 === 0.0))
  }

  test("bpeMerges on single-character words emits only the baseline row") {
    // no adjacent pairs exist → every merge round has no candidate and
    // contributes no row; the round-0 fertility row survives
    val docs = Seq((0L, "a b a b c", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
    val rows = TextAnalysis.bpeMerges(docs, rounds = 2)
      .select("rnd", "tokens_per_word").as[(Int, Double)].collect()
    assert(rows.toSeq === Seq((0, 1.0)))
  }

  test("ktrussPeel with no triangles drops everything in round one") {
    // a path graph has zero triangles → every edge has support 0 < k−2
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val rows = Graph.ktrussPeel(e, k = 4, rounds = 2).orderBy($"rnd")
      .select("rnd", "n_tri", "n_dropped", "n_edges")
      .as[(Int, Long, Long, Long)].collect()
    assert(rows(0) === ((1, 0L, 3L, 0L)))
    assert(rows(1) === ((2, 0L, 0L, 0L)))
  }

  test("dupSpectrum on an all-unique corpus is one m=1 row, zero excess") {
    val docs = (0L to 4L).map(j => (j, s"unique text $j", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
    val rows = Dedup.dupSpectrum(docs)
      .select("multiplicity", "n_groups", "tokens_excess")
      .as[(Long, Long, Long)].collect()
    assert(rows.toSeq === Seq((1L, 5L, 0L)))
  }

  test("saxDiscords ranks ascending by count and never beats the motif top") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val d = graft.ops.Sax.saxDiscords(events)
      .select("event_type", "rnk", "n", "first_h")
      .as[(String, Int, Long, Long)].collect()
    assert(d.nonEmpty)
    // ascending in rank within each series
    d.groupBy(_._1).values.foreach { rows =>
      val byRnk = rows.sortBy(_._2).map(_._3)
      assert(byRnk.zip(byRnk.tail).forall { case (a, b) => a <= b })
    }
    val m = graft.ops.Sax.saxMotifs(events)
      .select("event_type", "rnk", "n").as[(String, Int, Long)].collect()
    // the rarest word is never more frequent than the most common one
    val top = m.filter(_._2 == 1).map(r => r._1 -> r._3).toMap
    d.filter(_._2 == 1).foreach { r => assert(r._3 <= top(r._1)) }
  }

  test("lmGap is exactly zero when both halves hold identical documents") {
    val docs = (0L until 20L).map(j => (j, "alpha beta gamma delta", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
    val r = graft.ops.TextAnalysis.lmGap(docs)
      .select("n_train_docs", "n_eval_docs", "train_nll", "eval_nll", "gap")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(r._1 + r._2 === 20L && r._1 > 0 && r._2 > 0)
    assert(r._3 === r._4 && r._5 === 0.0)
    assert(r._3 > 0.0) // NLL of a smoothed LM is strictly positive
  }

  test("confidentErrors on a single source is one diagonal row") {
    val docs = (0L to 3L).map(j => (j, s"text body $j", "en", "only"))
      .toDF("doc_id", "text", "lang", "source")
    val rows = TextAnalysis.confidentErrors(docs)
      .select("actual", "suggested", "n_docs", "is_error")
      .as[(String, String, Long, Boolean)].collect()
    assert(rows.toSeq === Seq(("only", "only", 4L, false)))
  }
}
