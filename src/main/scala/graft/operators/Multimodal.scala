package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: media as opaque BINARY
  * payloads with typed metadata, flowing through decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The Spark-side plumbing — schema, typed Dataset transforms, partition
  * behavior, batch shape — is real and tested. The actual codecs are NOT:
  * this container has no image/audio libraries, so the decode kernel is a
  * clearly-marked deterministic stub (see [[MultimodalStub]]). Swapping in a
  * real decoder changes one function body, nothing about the dataflow.
  *
  * Scale notes: payloads never shuffle — every stage below is map-side
  * (mapPartitions / projection). Feature vectors (small) are what joins and
  * aggregations see; keep the binary column out of shuffle keys and project
  * it away before any wide operation.
  */
object Multimodal {

  /** Typed asset row: media payload + metadata. */
  final case class Asset(asset_id: Long, kind: String, payload: Array[Byte],
                         width: Int, height: Int, n_frames: Int)

  /** Decoded features: fixed-dim embedding + summary stats per asset. */
  final case class AssetFeatures(asset_id: Long, kind: String, n_bytes: Long,
                                 mean_byte: Double, features: Array[Float])

  /** Derive a deterministic asset table from the documents corpus: payload
    * = utf-8 text bytes, kind/meta hash-derived. Stands in for an ingest of
    * real media files; the BINARY column and metadata struct are the real
    * schema a media lake would carry. */
  def assets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (lit(32) + pmod(col("doc_id"), lit(4)) * 16).cast("int").as("width"),
      (lit(32) + pmod(col("doc_id") * 7, lit(4)) * 16).cast("int").as("height"),
      (lit(1) + pmod(col("doc_id"), lit(8))).cast("int").as("n_frames"))

  /** Decode + feature-extract, one batch of rows per partition through the
    * (stubbed) kernel — the mapPartitions shape a real vectorized decoder
    * (or GPU batch) wants: amortized per-partition setup, streaming rows. */
  def decodeFeatures(assetDf: DataFrame, dim: Int): Dataset[AssetFeatures] = {
    val spark = assetDf.sparkSession
    import spark.implicits._
    assetDf.select("asset_id", "kind", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup happens once (a real codec opens here)
        it.map { case (id, kind, payload) =>
          val (meanByte, features) = MultimodalStub.decode(payload, dim)
          AssetFeatures(id, kind, payload.length.toLong, meanByte, features)
        }
      }
  }

  /** Resize: pure metadata transform here (a real pipeline rewrites the
    * payload too — that call sits behind the same stub boundary). */
  def resize(assetDf: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0), lit(maxSide) / greatest(col("width"), col("height")))
    assetDf
      .withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
  }

  /** Frame sampling for video assets: one output row per sampled frame
    * index (every `stride`-th frame). Pure relational explode — the frame
    * DECODE would be a [[decodeFeatures]]-style pass over (payload, frame_idx). */
  def frameSample(assetDf: DataFrame, stride: Int): DataFrame =
    assetDf.where(col("kind") === "video")
      .select(col("asset_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
}

/** STUB KERNEL — deterministic fake in place of real media codecs (none are
  * installed in this container). Replace `decode` with the real
  * image/audio/video decoder; signature and batch shape stay the same. */
object MultimodalStub {
  /** "Decode" a payload: byte-stream stats + a hash-folded fake embedding.
    * Deterministic in the payload bytes alone. */
  def decode(payload: Array[Byte], dim: Int): (Double, Array[Float]) = {
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
    val mean = if (payload.length == 0) 0.0 else sum.toDouble / payload.length
    val features = new Array[Float](dim)
    i = 0
    while (i < payload.length) {
      // fold bytes into dim buckets — stands in for real feature extraction
      features(i % dim) += ((payload(i) & 0xff) - 128) / 128.0f
      i += 1
    }
    (mean, features)
  }
}
