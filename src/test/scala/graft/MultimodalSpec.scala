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
}
