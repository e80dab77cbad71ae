package graft

import graft.operators._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sfDir).cache()
  lazy val assets = Multimodal.assets(docs).cache()

  test("stub decode: mean_byte and features match a direct computation") {
    val feats = Multimodal.decodeFeatures(assets, dim = 16).collect()
      .map(f => f.asset_id -> f).toMap
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect()
    texts.take(20).foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val f = feats(id)
      assert(f.n_bytes === bytes.length.toLong)
      val expectedMean = bytes.map(_ & 0xff).sum.toDouble / bytes.length
      assert(math.abs(f.mean_byte - expectedMean) < 1e-12)
      val (_, expectedFeat) = MultimodalStub.decode(bytes, 16)
      assert(f.features.toSeq === expectedFeat.toSeq)
    }
  }

  test("decode is partition-invariant (same rows regardless of layout)") {
    val a = Multimodal.decodeFeatures(assets, 8)
      .collect().map(f => (f.asset_id, f.n_bytes, f.mean_byte)).toSet
    val b = Multimodal.decodeFeatures(assets.repartition(7), 8)
      .collect().map(f => (f.asset_id, f.n_bytes, f.mean_byte)).toSet
    assert(a === b)
  }

  test("frameSample emits ceil(n_frames / stride) rows per video asset") {
    val sampled = Multimodal.frameSample(assets, stride = 2)
      .groupBy("asset_id").agg(count(lit(1)).as("n"), first("n_frames").as("nf"))
    val wrong = sampled.where($"n" =!= ceil($"nf" / 2.0).cast("long"))
    assert(wrong.count() === 0)
    // only video assets are sampled
    val kinds = Multimodal.frameSample(assets, 2).join(assets, "asset_id")
      .select("kind").distinct().as[String].collect().toSeq
    assert(kinds === Seq("video"))
  }

  test("resize never upscales and preserves aspect ordering") {
    val r = Multimodal.resize(assets, maxSide = 48).cache()
    assert(r.where($"out_width" > $"width" || $"out_height" > $"height").count() === 0)
    assert(r.where($"out_width" > 48 && $"out_height" > 48).count() === 0)
  }

  test("real PNG decode: ImageIO round-trips the synthesized pattern exactly") {
    // payloads are genuine PNG containers; stats must equal the closed-form
    // pattern, which only a real decode of the container bytes can produce
    val imgs = Multimodal.syntheticImages(docs.limit(50)).cache()
    // the payload really is a PNG file (magic bytes)
    val magic = imgs.select("payload").as[Array[Byte]].head()
    assert(magic.take(8).toSeq ===
      Seq(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val got = Multimodal.imageStats(imgs).collect()
      .map(s => s.asset_id -> s).toMap
    assert(got.size === 50)
    got.values.foreach { s =>
      val w = (8 + s.asset_id % 5).toInt
      val h = (8 + (s.asset_id * 3) % 5).toInt
      assert((s.width, s.height) === ((w, h)))
      var (er, eg, eb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = Multimodal.patternPixel(s.asset_id, x, y)
        er += r; eg += g; eb += b
      }
      assert((s.sum_r, s.sum_g, s.sum_b) === ((er, eg, eb)),
        s"asset ${s.asset_id}")
    }
  }

  test("real pixel resize: decode, NN-downscale, re-encode round-trips the mapped pattern") {
    val imgs = Multimodal.syntheticImages(docs.limit(30))
    val got = Multimodal.resizeImages(imgs, maxSide = 6).collect()
      .map(s => s.asset_id -> s).toMap
    assert(got.size === 30)
    got.values.foreach { s =>
      val w = (8 + s.asset_id % 5).toInt
      val h = (8 + (s.asset_id * 3) % 5).toInt
      val den = math.max(w, h)
      val num = math.min(6, den)
      val ow = math.max(1, w * num / den)
      val oh = math.max(1, h * num / den)
      assert((s.width, s.height) === ((ow, oh)))
      var (er, eg, eb) = (0L, 0L, 0L)
      for (y <- 0 until oh; x <- 0 until ow) {
        val (r, g, b) =
          Multimodal.patternPixel(s.asset_id, x * w / ow, y * h / oh)
        er += r; eg += g; eb += b
      }
      assert((s.sum_r, s.sum_g, s.sum_b) === ((er, eg, eb)),
        s"asset ${s.asset_id}")
    }
  }

  test("codec boundary: non-image payloads skip imageStats and stub-decode in features") {
    // text bytes are not a decodable image
    assert(Multimodal.decodeImage("not a png".getBytes("UTF-8")).isEmpty)
    val textAssets = assets.limit(20)
    assert(Multimodal.imageStats(textAssets).count() === 0) // decode-or-skip
    // real image payloads flow through decodeFeatures' REAL pixel branch
    val imgAssets = Multimodal.syntheticImages(docs.limit(10))
      .withColumn("kind", lit("image"))
    val feats = Multimodal.decodeFeatures(imgAssets, dim = 8).collect()
    feats.foreach { f =>
      val w = (8 + f.asset_id % 5).toInt
      val h = (8 + (f.asset_id * 3) % 5).toInt
      var sum = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = Multimodal.patternPixel(f.asset_id, x, y)
        sum += r + g + b
      }
      val expected = sum.toDouble / (3L * w * h)
      assert(math.abs(f.mean_byte - expected) < 1e-12,
        s"asset ${f.asset_id}: pixel mean expected, got byte-stub value?")
    }
  }
}
