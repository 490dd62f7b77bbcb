package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}

/** Raw media asset: opaque bytes + identity. */
case class RawAsset(asset_id: Long, payload: Array[Byte])

/** Typed decode result — what a real image/audio/video codec emits. */
case class AssetMeta(
    asset_id: Long,
    n_bytes: Long,
    digest: String,
    kind: String,
    width: Option[Long],
    height: Option[Long],
    duration_ms: Option[Long])

/** Batched decoder contract: one call per partition, iterator-in /
  * iterator-out, so implementations can amortize codec/model setup across a
  * whole batch (the JVM analog of a vectorized pandas UDF). Implementations
  * must be Serializable — they ship to executors.
  */
trait AssetDecoder extends Serializable {
  def decodePartition(assets: Iterator[RawAsset]): Iterator[AssetMeta]
}

/** Deterministic stand-in codec: metadata derives from the payload's md5 —
  * real image/audio libraries aren't available in this environment, so the
  * "decode" is faked, but everything around it (typed Dataset, partition
  * batching, lazy iterators, schema) is exactly what a real codec plugs
  * into. Field formulas match [[Multimodal.decodeStub]]'s column
  * expressions digit-for-digit, which AssetDecodeSpec asserts.
  */
object StubDecoder extends AssetDecoder {
  private def md5hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  private def hexField(digest: String, pos1: Int, n: Int): Long =
    digest.slice(pos1 - 1, pos1 - 1 + n)
      .foldLeft(0L)((acc, c) => acc * 16 + Character.digit(c, 16))

  override def decodePartition(assets: Iterator[RawAsset]): Iterator[AssetMeta] =
    assets.map { a =>
      val digest = md5hex(a.payload)
      val kind = (a.asset_id % 3) match {
        case 0 => "image"
        case 1 => "audio"
        case _ => "video"
      }
      val isImage = kind == "image"
      AssetMeta(
        a.asset_id,
        a.payload.length.toLong,
        digest,
        kind,
        if (isImage) Some(hexField(digest, 1, 4) % 1024 + 16) else None,
        if (isImage) Some(hexField(digest, 5, 4) % 1024 + 16) else None,
        if (!isImage) Some(hexField(digest, 9, 4) % 60000 + 1000) else None)
    }
}

/** The imperative decode path: a typed Dataset pipeline around any
  * [[AssetDecoder]]. Used when the decode genuinely cannot be a Catalyst
  * expression (native codecs, model inference); the declarative
  * [[Multimodal.decodeStub]] path is preferred whenever it can.
  */
object AssetDecode {
  def decode(assets: Dataset[RawAsset], decoder: AssetDecoder): Dataset[AssetMeta] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[AssetMeta]
    assets.mapPartitions(decoder.decodePartition _)
  }

  /** documents → RawAsset payloads (UTF-8 text bytes as the stand-in blob). */
  def assetsOf(docs: DataFrame): Dataset[RawAsset] = {
    import org.apache.spark.sql.functions._
    implicit val enc = org.apache.spark.sql.Encoders.product[RawAsset]
    docs.select(col("doc_id").as("asset_id"),
      encode(col("text"), "UTF-8").as("payload")).as[RawAsset]
  }
}
