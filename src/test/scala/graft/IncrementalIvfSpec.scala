package graft

import java.nio.file.Files
import graft.ops.IvfIndex
import org.apache.spark.sql.functions._

/** Persisted IVF index: frozen-codebook assignment parity (batch ≡
  * build+append, row for row), append cost shape, and the re-assignment
  * census audit.
  */
class IncrementalIvfSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("build+append assignments equal one batch assignment over the union") {
    val path = Files.createTempDirectory("ivfidx").toString
    val all = emb.localCheckpoint()
    val n = all.count()
    val cut = n * 3 / 4
    val old = all.where($"vec_id" < cut)
    val fresh1 = all.where($"vec_id" >= cut && $"vec_id" < cut + (n - cut) / 2)
    val fresh2 = all.where($"vec_id" >= cut + (n - cut) / 2)

    IvfIndex.build(old, path, k = 4, iters = 2)
    val a1 = IvfIndex.append(spark, path, fresh1)
    val a2 = IvfIndex.append(spark, path, fresh2)
    assert(a1.count() + a2.count() === n - cut)

    // parity: the persisted lists match assigning the whole union against
    // the same frozen codebook, bit for bit (c AND d2)
    val persisted = IvfIndex.assignments(spark, path)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val oneShot = IvfIndex.assignTo(IvfIndex.centroids(spark, path), all)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(persisted === oneShot)
    assert(persisted.size === n)

    // the codebook trained on `old` must be what q259's trainer produces:
    // same seeds, same rounds → identical cluster ids (the seed vec_ids)
    val cents = IvfIndex.centroids(spark, path)
    assert(cents.select("c").distinct().as[Long].collect().sorted.toSeq ===
      old.orderBy($"vec_id").limit(4).select("vec_id").as[Long].collect().toSeq)
  }

  test("reassignment census: counts cover the corpus, self-consistent rates") {
    val path = Files.createTempDirectory("ivfidx2").toString
    val all = emb.localCheckpoint()
    val n = all.count()
    val cut = n / 2
    IvfIndex.build(all.where($"vec_id" < cut), path, k = 4, iters = 2)
    IvfIndex.append(spark, path, all.where($"vec_id" >= cut))

    val census = IvfIndex.reassignCensus(spark, path, all)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(census.map(_._2).sum === n)           // every vector audited
    assert(census.forall(r => r._3 >= 0 && r._3 <= r._2))
    assert(census.forall(r => math.abs(r._4 - r._3.toDouble / r._2) < 1e-6 + 1e-6))

    // audit on a codebook trained over the FULL corpus: one refresh step
    // from a Lloyd fixed point moves (near) nothing — the stale-codebook
    // signal is zero when the codebook isn't stale
    val fullPath = Files.createTempDirectory("ivfidx3").toString
    IvfIndex.build(all, fullPath, k = 4, iters = 8)
    val stable = IvfIndex.reassignCensus(spark, fullPath, all)
      .agg(sum($"n_moved")).as[Long].head()
    val half = IvfIndex.reassignCensus(spark, path, all)
      .agg(sum($"n_moved")).as[Long].head()
    assert(stable <= half, s"converged codebook moved $stable > half-trained $half")
  }
}
