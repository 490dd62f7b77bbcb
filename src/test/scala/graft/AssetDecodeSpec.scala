package graft

import graft.ops.{AssetDecode, Multimodal, StubDecoder}
import org.apache.spark.sql.functions._

class AssetDecodeSpec extends SparkSpec {
  import spark.implicits._

  test("batched mapPartitions decode matches the columnar decode stub") {
    val docs = (0L to 8L).map(i => (i, s"some payload $i with text", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")

    val batched = AssetDecode.decode(AssetDecode.assetsOf(docs), StubDecoder)
      .select("asset_id", "n_bytes", "digest", "kind", "width", "height", "duration_ms")

    val columnar = Multimodal.decodeStub(
      docs.select(
        col("doc_id").as("asset_id"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        md5(encode(col("text"), "UTF-8")).as("digest")))
      .select("asset_id", "n_bytes", "digest", "kind", "width", "height", "duration_ms")

    val b = batched.orderBy("asset_id").collect().toSeq
    val c = columnar.orderBy("asset_id").collect().toSeq
    assert(b === c)
  }
}
