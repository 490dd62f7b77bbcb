package graft

import java.nio.file.Files
import graft.ops.{CoresetIndex, IvfIndex}
import org.apache.spark.sql.functions._

/** Persisted coreset index: frozen-center cover parity (batch ≡
  * build+append, row for row), the build-radius coverage contract, and the
  * uncovered-mass drift audit.
  */
class IncrementalCoresetSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("build+append cover equals one-shot cover of the union, bit for bit") {
    val path = Files.createTempDirectory("coreidx").toString
    val all = emb.localCheckpoint()
    val n = all.count()
    val cut = n * 3 / 4
    CoresetIndex.build(all.where($"vec_id" < cut), path, t = 4)
    val a = CoresetIndex.append(spark, path, all.where($"vec_id" >= cut))
    assert(a.count() === n - cut)

    val persisted = CoresetIndex.cover(spark, path)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val oneShot = IvfIndex.assignTo(CoresetIndex.centers(spark, path), all)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(persisted === oneShot)
    assert(persisted.size === n)

    // centers must be the q392 traversal's picks over the build corpus
    val picks = graft.ops.Similarity
      .kcenterCoreset(all.where($"vec_id" < cut), t = 4)
      .select("center_id").as[Long].collect().sorted.toSeq
    val stored = CoresetIndex.centers(spark, path)
      .select("c").distinct().as[Long].collect().sorted.toSeq
    assert(stored === picks)
  }

  test("a far-away appended batch shows up as uncovered mass at its center") {
    val path = Files.createTempDirectory("coreidx2").toString
    // tight unit-cube-ish corpus: 8-dim, values in [0, 0.1]
    val base = (0L until 20L).map { v =>
      (v, Array.tabulate(8)(i => ((v + i) % 5).toFloat / 50f), 0)
    }.toDF("vec_id", "embedding", "label")
    CoresetIndex.build(base, path, t = 3)

    // no drift yet: every build vector sits inside the build radius
    val clean = CoresetIndex.coverageCensus(spark, path)
      .agg(sum($"n_uncovered")).as[Long].head()
    assert(clean === 0L)

    // an outlier far outside the hull must exceed the build radius
    val far = Seq((100L, Array.fill(8)(5f), 0))
      .toDF("vec_id", "embedding", "label")
    CoresetIndex.append(spark, path, far)
    val census = CoresetIndex.coverageCensus(spark, path)
      .select("center", "n_vecs", "max_d2", "n_uncovered")
      .as[(Long, Long, Double, Long)].collect()
    assert(census.map(_._4).sum === 1L)
    // the uncovered row's center also carries the inflated max_d2
    val hot = census.filter(_._4 === 1L).head
    assert(hot._3 > census.filter(_._4 === 0L).map(_._3).max)
    assert(census.map(_._2).sum === 21L)
  }
}
