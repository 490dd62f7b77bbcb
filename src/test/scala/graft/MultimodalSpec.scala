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
