package graft.sources

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy shard packing for dataset export — assigning assets to
  * size-capped output shards (the WebDataset/tar-shard layout a training
  * job streams).
  *
  * Greedy first-fit is inherently sequential: each decision depends on the
  * bytes already packed, so a corpus-global greedy pass would serialize
  * 100 TB through one worker. The distributed design real shard writers
  * use: range-partition the assets on the ordering key across workers,
  * then each worker packs ITS contiguous span greedily and independently —
  * shard identity is (worker, local shard seq). Per-worker results are
  * byte-exact greedy; the only deviation from a single-machine pack is at
  * most one underfull shard per worker boundary, which is the accepted
  * industry trade for linear scalability. This is one of the few operators
  * where mapPartitions is the RIGHT tool: the per-partition sequential
  * fold is the algorithm, not a workaround.
  */
object ShardPack {

  def packShards(assets: DataFrame, maxShardBytes: Long,
                 nWorkers: Int = 32): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .select(col("asset_id").cast("long"), col("n_bytes").cast("long"))
      .repartitionByRange(nWorkers, col("asset_id"))
      .sortWithinPartitions(col("asset_id"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val worker = TaskContext.getPartitionId().toLong
        var shard = 0L
        var used = 0L
        it.map { case (id, bytes) =>
          // close the current shard when this asset would overflow it; an
          // asset larger than the cap gets a shard of its own
          if (used > 0 && used + bytes > maxShardBytes) {
            shard += 1L
            used = 0L
          }
          used += bytes
          (id, bytes, worker, shard)
        }
      }
      .toDF("asset_id", "n_bytes", "worker", "shard_seq")
  }
}
