package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: media as opaque BINARY
  * payloads with typed metadata, flowing through decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The Spark-side plumbing — schema, typed Dataset transforms, partition
  * behavior, batch shape — is real and tested. IMAGE decoding is real too:
  * the JDK ships PNG/BMP/GIF codecs in `javax.imageio` (no external
  * dependency), so image payloads decode to actual pixels
  * ([[decodeImage]] / [[imageStats]], oracle-gated end to end). Audio/video
  * codecs don't exist in this container, so those payloads take the
  * clearly-marked deterministic byte-stub ([[MultimodalStub]]); swapping in
  * a real codec changes one function body, nothing about the dataflow.
  *
  * Scale notes: payloads never shuffle — every stage below is map-side
  * (mapPartitions / projection). Feature vectors (small) are what joins and
  * aggregations see; keep the binary column out of shuffle keys and project
  * it away before any wide operation.
  */
object Multimodal {

  /** Decoded-image integer stats: dimensions read from the DECODED image
    * (not metadata) and exact per-channel pixel sums — the quantities an
    * oracle can recompute without a codec when the pixels are a known
    * function. */
  final case class ImageStats(asset_id: Long, width: Int, height: Int,
                              sum_r: Long, sum_g: Long, sum_b: Long)

  /** The closed-form pixel pattern [[syntheticImages]] encodes: channel
    * values at (x, y) for asset `id`. Public so tests and oracles can
    * recompute what the PNG holds. */
  def patternPixel(id: Long, x: Int, y: Int): (Int, Int, Int) = (
    ((id * 7 + x * 3 + y * 11) % 256).toInt,
    ((id * 13 + x * 5 + y * 2) % 256).toInt,
    ((id * 3 + x + y * 7) % 256).toInt)

  /** Synthesize REAL encoded images from the documents table: one PNG per
    * doc, pixels the deterministic [[patternPixel]] pattern, size
    * (8 + id mod 5) × (8 + 3·id mod 5). The payloads are genuine
    * PNG-container bytes produced by the JDK encoder — what a media lake's
    * BINARY column actually holds — and PNG is lossless, so a real decoder
    * must reproduce the pattern exactly. */
  def syntheticImages(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = (8 + id % 5).toInt
        val h = (8 + (id * 3) % 5).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val (r, g, b) = patternPixel(id, x, y)
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (id, bos.toByteArray)
      }
    }.toDF("asset_id", "payload")
  }

  /** Real image decode via the JDK's ImageIO (PNG/BMP/GIF ship with the
    * JVM). Returns None when the payload isn't a decodable image — the
    * honest codec boundary: callers fall back to the byte-stub only where
    * no codec exists. */
  def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload)))
    catch { case _: java.io.IOException => None }

  /** Decode every payload and emit integer pixel statistics — dimensions
    * and channel sums come from the DECODED image, so this path cannot pass
    * its oracle without genuinely decoding the container bytes. Non-image
    * payloads are dropped (decode-or-skip, a real ingest's quarantine
    * semantics). */
  def imageStats(assetDf: DataFrame): Dataset[ImageStats] = {
    val spark = assetDf.sparkSession
    import spark.implicits._
    assetDf.select(col("asset_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          decodeImage(payload).map { img =>
            var (sr, sg, sb) = (0L, 0L, 0L)
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff
                sb += rgb & 0xff
                x += 1
              }
              y += 1
            }
            ImageStats(id, img.getWidth, img.getHeight, sr, sg, sb)
          }
        }
      }
  }

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
    * codec boundary — the mapPartitions shape a real vectorized decoder
    * (or GPU batch) wants: amortized per-partition setup, streaming rows.
    * Payloads that ImageIO can decode get REAL pixel features
    * ([[MultimodalStub.pixelFeatures]] over decoded RGB); everything else
    * (text-derived assets, audio/video with no JDK codec) falls back to the
    * deterministic byte-stub. */
  def decodeFeatures(assetDf: DataFrame, dim: Int): Dataset[AssetFeatures] = {
    val spark = assetDf.sparkSession
    import spark.implicits._
    assetDf.select("asset_id", "kind", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup happens once (a real codec opens here)
        it.map { case (id, kind, payload) =>
          val (meanByte, features) = decodeImage(payload) match {
            case Some(img) => MultimodalStub.pixelFeatures(img, dim)
            case None      => MultimodalStub.decode(payload, dim)
          }
          AssetFeatures(id, kind, payload.length.toLong, meanByte, features)
        }
      }
  }

  /** REAL pixel resize over decodable image payloads: decode (ImageIO),
    * nearest-neighbor downscale to fit `maxSide` (source pixel
    * (x·w/ow, y·h/oh) — integer arithmetic, deterministic across JVMs,
    * unlike interpolating scalers), re-encode PNG. Emits the resized
    * payload plus DECODED output stats so the whole
    * decode → transform → re-encode loop is oracle-checkable: an oracle
    * that knows the input pixel pattern can recompute every output pixel
    * without a codec. Non-image payloads are dropped (decode-or-skip). */
  def resizeImages(assetDf: DataFrame, maxSide: Int): Dataset[ImageStats] = {
    val spark = assetDf.sparkSession
    import spark.implicits._
    assetDf.select(col("asset_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          decodeImage(payload).map { img =>
            val w = img.getWidth
            val h = img.getHeight
            val scaleDen = math.max(w, h)
            val scaleNum = math.min(maxSide, scaleDen)
            val ow = math.max(1, w * scaleNum / scaleDen)
            val oh = math.max(1, h * scaleNum / scaleDen)
            val out = new java.awt.image.BufferedImage(
              ow, oh, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var (sr, sg, sb) = (0L, 0L, 0L)
            var y = 0
            while (y < oh) {
              var x = 0
              while (x < ow) {
                val rgb = img.getRGB(x * w / ow, y * h / oh)
                out.setRGB(x, y, rgb)
                sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff
                sb += rgb & 0xff
                x += 1
              }
              y += 1
            }
            // re-encode to a genuine PNG payload and DECODE THAT — the
            // emitted stats have passed through the output container too,
            // so the gate covers decode → transform → encode → decode
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            val back = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bos.toByteArray))
            var (br2, bg2, bb2) = (0L, 0L, 0L)
            var yy = 0
            while (yy < back.getHeight) {
              var xx = 0
              while (xx < back.getWidth) {
                val rgb2 = back.getRGB(xx, yy)
                br2 += (rgb2 >> 16) & 0xff; bg2 += (rgb2 >> 8) & 0xff
                bb2 += rgb2 & 0xff
                xx += 1
              }
              yy += 1
            }
            assert(br2 == sr && bg2 == sg && bb2 == sb,
              s"PNG round-trip of resized asset $id not lossless")
            ImageStats(id, back.getWidth, back.getHeight, br2, bg2, bb2)
          }
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

/** Feature kernels behind the codec boundary. [[pixelFeatures]] runs on
  * genuinely DECODED images (ImageIO, see [[Multimodal.decodeImage]]);
  * [[decode]] is the remaining deterministic byte-stub for payload kinds
  * with no JDK codec (audio/video) — replace it with a real decoder;
  * signature and batch shape stay the same. */
object MultimodalStub {

  /** Features from REAL pixels: mean over all channel bytes + the decoded
    * RGB stream folded into `dim` buckets (same fold as the byte-stub, fed
    * by pixels instead of container bytes). */
  def pixelFeatures(img: java.awt.image.BufferedImage,
                    dim: Int): (Double, Array[Float]) = {
    val features = new Array[Float](dim)
    var sum = 0L
    var i = 0
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        var c = 16
        while (c >= 0) {
          val v = (rgb >> c) & 0xff
          sum += v
          features(i % dim) += (v - 128) / 128.0f
          i += 1
          c -= 8
        }
        x += 1
      }
      y += 1
    }
    val n = 3L * img.getWidth * img.getHeight
    (if (n == 0) 0.0 else sum.toDouble / n, features)
  }

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
