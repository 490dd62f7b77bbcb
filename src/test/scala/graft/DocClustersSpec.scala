package graft

import java.nio.file.Files

import graft.ml.DocClusters
import org.apache.spark.ml.PipelineModel

class DocClustersSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("pipeline clusters the corpus; assignments are seed-deterministic") {
    val model = DocClusters.fit(docs, k = 3)
    val census = DocClusters.clusterCensus(model, docs)
      .orderBy("cluster").collect()
    assert(census.length === 3)
    assert(census.map(_.getLong(1)).sum === docs.count())

    // same seed, fresh fit -> identical assignments
    val model2 = DocClusters.fit(docs, k = 3)
    val a = model.transform(docs).select("doc_id", "cluster")
      .as[(Long, Int)].collect().toMap
    val b = model2.transform(docs).select("doc_id", "cluster")
      .as[(Long, Int)].collect().toMap
    assert(a === b)
  }

  test("fitted model survives save/load") {
    val dir = Files.createTempDirectory("graft_docclusters").toString + "/m"
    val model = DocClusters.fit(docs, k = 3)
    model.write.overwrite().save(dir)
    val loaded = PipelineModel.load(dir)
    val a = model.transform(docs).select("doc_id", "cluster")
      .as[(Long, Int)].collect().toMap
    val b = loaded.transform(docs).select("doc_id", "cluster")
      .as[(Long, Int)].collect().toMap
    assert(a === b)
  }
}
