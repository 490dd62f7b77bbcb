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
}
