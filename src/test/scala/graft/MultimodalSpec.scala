package graft

import graft.ops.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("multimodalMeta assigns kinds round-robin and fills kind-typed metadata") {
    val docs = (0L to 5L).map(i => (i, s"payload number $i", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
    val rows = Multimodal.multimodalMeta(docs).orderBy("kind").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("audio", "image", "video"))
    assert(rows.forall(_.getLong(1) === 2L)) // two assets per kind
    val byKind = rows.map(r => r.getString(0) -> r).toMap
    // images carry width/height, no duration; audio/video the reverse
    assert(!byKind("image").isNullAt(4) && !byKind("image").isNullAt(5))
    assert(byKind("image").isNullAt(6))
    assert(byKind("audio").isNullAt(4) && !byKind("audio").isNullAt(6))
    assert(byKind("video").isNullAt(4) && !byKind("video").isNullAt(6))
  }

  test("decode stub is deterministic in the payload digest") {
    val docs = Seq((0L, "same payload", "en", "s0")).toDF("doc_id", "text", "lang", "source")
    val a = Multimodal.multimodalMeta(docs).collect().toSeq
    val b = Multimodal.multimodalMeta(docs).collect().toSeq
    assert(a === b)
  }

  test("resizePlan fits the box, preserves aspect, never upscales") {
    val meta = Seq(
      (1L, "image", 2048L, 1024L), // downscale, width-bound
      (2L, "image", 100L, 200L),   // already fits -> scale 1, no resize
      (3L, "image", 512L, 2048L),  // height-bound
      (4L, "video", 999L, 999L)    // wrong kind -> excluded
    ).toDF("asset_id", "kind", "width", "height")
    val rows = Multimodal.resizePlan(meta, 512, 512)
      .orderBy("asset_id")
      .as[(Long, Long, Long, Long, Long, Double, Boolean)].collect().toSeq
    assert(rows.map(_._1) === Seq(1L, 2L, 3L))
    val byId = rows.map(r => r._1 -> r).toMap
    assert(byId(1L)._4 === 512L && byId(1L)._5 === 256L && byId(1L)._7)
    assert(byId(2L)._4 === 100L && byId(2L)._5 === 200L && !byId(2L)._7)
    assert(byId(3L)._4 === 128L && byId(3L)._5 === 512L && byId(3L)._7)
  }

  test("dHash is a real difference hash: identical payloads collide, " +
       "a one-byte edit stays within a small Hamming radius") {
    val base = ("the quick brown fox jumps over the lazy dog while the " +
      "cat watches from the warm windowsill nearby") // 100 chars
    assert(base.length >= 72)
    val edited = base.updated(37, 'X').updated(38, 'Y') // two-byte edit
    val far = base.reverse.map(c => if (c.isLetter) ('z' - c + 'a').toChar else c)
    val docs = Seq(
      (1L, base, "en", "s0"), (2L, base, "en", "s0"),
      (3L, edited, "en", "s0"), (4L, far, "en", "s0"),
      (5L, "short", "en", "s0") // < 72 bytes: skipped, no partial grid
    ).toDF("doc_id", "text", "lang", "source")
    val h = Multimodal.dHash(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(!h.contains(5L))
    assert(h(1L) === h(2L)) // byte-identical payloads -> identical hash
    def ham(a: (Long, Long), b: (Long, Long)) =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    // locality: a 2-byte edit perturbs at most a couple of grid cells
    assert(ham(h(1L), h(3L)) > 0 && ham(h(1L), h(3L)) <= 6,
      s"edit distance ${ham(h(1L), h(3L))}")
    // and halves stay within 32 bits (no sign wrap either engine)
    assert(h.values.forall { case (a, b) =>
      a >= 0 && a < (1L << 32) && b >= 0 && b < (1L << 32) })
  }

  test("phash banding surfaces a planted near-duplicate image pair") {
    val base = ("synthetic luma payload for the banded hamming candidate " +
      "join across all four sixteen bit bands here") // > 72 chars
    val nearDup = base.updated(10, 'Q') // one-byte re-encode artifact
    // decoys: unrelated payloads that should NOT pair within radius
    val decoys = (10L to 29L).map { i =>
      (i, s"completely different document number $i " * 3, "en", "s0")
    }
    val docs = (Seq((1L, base, "en", "s0"), (2L, nearDup, "en", "s0"))
      ++ decoys).toDF("doc_id", "text", "lang", "source")
    val pairs = Multimodal.phashCandidatePairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        r.getAs[Number]("hamming").longValue).toMap
    assert(pairs.contains((1L, 2L)), s"planted pair missing: ${pairs.keys}")
    assert(pairs((1L, 2L)) <= 6, s"planted pair hamming ${pairs((1L, 2L))}")
    // census view counts it inside the radius
    val census = Multimodal.phashPairs(docs).collect()
    assert(census.map(_.getAs[Long]("n_within_radius")).sum >= 1L)
  }

  test("frameSamplePlan emits one row per sampled frame for videos only") {
    val meta = Seq(
      (1L, "video", Some(3500L)), // frames at 0,1000,2000,3000
      (2L, "video", Some(1000L)), // frames at 0
      (3L, "image", None)
    ).toDF("asset_id", "kind", "duration_ms")
    val rows = Multimodal.frameSamplePlan(meta, fps = 1.0)
      .orderBy("asset_id", "frame_idx")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.filter(_._1 == 1L).map(_._3) === Seq(0L, 1000L, 2000L, 3000L))
    assert(rows.filter(_._1 == 2L).map(_._3) === Seq(0L))
    assert(rows.filter(_._1 == 1L).map(_._2) === Seq(0L, 1L, 2L, 3L))
    assert(!rows.exists(_._1 == 3L))
  }
}
