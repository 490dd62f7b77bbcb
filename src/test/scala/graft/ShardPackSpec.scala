package graft

import graft.sources.ShardPack

class ShardPackSpec extends SparkSpec {
  import spark.implicits._

  test("every shard respects the byte cap; oversized assets get their own shard") {
    val assets = (0L until 100L).map(i => (i, (i % 7) * 100L + 50L)).toDF("asset_id", "n_bytes")
    val cap = 1000L
    val packed = ShardPack.packShards(assets, cap, nWorkers = 4)
      .as[(Long, Long, Long, Long)].collect().toSeq

    // nothing lost, nothing duplicated
    assert(packed.map(_._1).sorted === (0L until 100L))

    // each shard's total fits the cap unless it is a single oversized asset
    val byShard = packed.groupBy(p => (p._3, p._4))
    for ((_, members) <- byShard) {
      val total = members.map(_._2).sum
      assert(total <= cap || members.size == 1,
        s"shard over cap with ${members.size} members totaling $total")
    }

    // within a worker, packing follows asset order: shard seq is monotone
    for ((_, ms) <- packed.groupBy(_._3)) {
      val inOrder = ms.sortBy(_._1).map(_._4)
      assert(inOrder === inOrder.sorted)
    }
  }

  test("an asset bigger than the cap is isolated, not dropped") {
    val assets = Seq((0L, 100L), (1L, 5000L), (2L, 100L)).toDF("asset_id", "n_bytes")
    val packed = ShardPack.packShards(assets, maxShardBytes = 1000L, nWorkers = 1)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(packed.map(_._1) === Seq(0L, 1L, 2L))
    val shardOf = packed.map(p => p._1 -> p._4).toMap
    assert(shardOf(1L) !== shardOf(0L))
    assert(shardOf(2L) !== shardOf(1L))
  }
}
