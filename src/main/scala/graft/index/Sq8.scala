package graft.index

import graft.functions.vectors._
import graft.operators.{Knn, Metric, TopK}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SQ8 scalar quantization — the "SQ8" half of the reference baseline's
  * `indexkey=IVF16384,SQ8` (/root/reference/filter/faiss/config.yaml:50-53):
  * each dimension is affinely mapped to an 8-bit code
  * `code = round(255 · (x − min_d) / (max_d − min_d))`, cutting vector
  * storage 4× (float32 → uint8). Distances on codes are approximate; exact
  * re-ranking of the quantized top candidates restores recall.
  *
  * Spark shape: training is one wide aggregation (per-dim min/max — no
  * explode); encoding is a map-side projection; codes live in ARRAY<SHORT>
  * (uint8 widened — Spark has no unsigned type) so the integer L2 kernel
  * [[graft.functions.VecL2SqInt]] scores them inside whole-stage codegen.
  * At 100 TB the 4× scan-volume cut is the point: candidate generation reads
  * the compact codes; only the re-rank touches float vectors, and only for
  * `rerank`·nq rows.
  */
object Sq8 {

  /** Per-dimension (min, span) trained from the corpus with ONE
    * whole-vector (min, max) aggregate — O(d) buffer, dimension-scalable
    * (the 2·d-column wide-agg form degrades past d≈1000). Min/max are
    * order-independent, so training is exactly deterministic. Span 0 → 1 to
    * avoid div-0. */
  def train(base: DataFrame): (Array[Double], Array[Double]) = {
    val r = base.agg(graft.functions.VectorAggs.vecMinMax(col("vec")).as("mm"))
      .select(col("mm._1").as("lo"), col("mm._2").as("hi")).head()
    val lo = r.getSeq[Float](0)
    val hi = r.getSeq[Float](1)
    val mins = lo.map(_.toDouble).toArray
    val spans = Array.tabulate(mins.length) { i =>
      val s = hi(i).toDouble - mins(i)
      if (s > 0) s else 1.0
    }
    (mins, spans)
  }

  /** Map-side encoder: vec ARRAY<FLOAT> → codes ARRAY<SHORT> in [0, 255]. */
  def encodeCol(vecCol: org.apache.spark.sql.Column,
                mins: Array[Double], spans: Array[Double]): org.apache.spark.sql.Column = {
    val minsC = array(mins.map(lit): _*)
    val spansC = array(spans.map(lit): _*)
    zip_with(vecCol, zip_with(minsC, spansC, (m, s) => struct(m.as("m"), s.as("s"))),
      (x, ms) => round(lit(255.0) * (x.cast("double") - ms.getField("m")) / ms.getField("s"))
        .cast("short"))
  }

  /** Quantized brute-force kNN with exact re-rank: score all codes with the
    * integer kernel, keep `rerank` candidates per query, then re-rank those
    * few with exact float L2. rerank ≥ k; larger rerank → higher recall. */
  def knnSq8(queries: DataFrame, base: DataFrame, k: Int, rerank: Int,
             mins: Array[Double], spans: Array[Double]): DataFrame = {
    val b = base.withColumn("codes", encodeCol(col("vec"), mins, spans))
    val q = queries.withColumn("qcodes", encodeCol(col("qvec"), mins, spans))
    val coarse = b.select("id", "codes").crossJoin(broadcast(q.select("qid", "qcodes")))
      .withColumn("dist", vecL2SqInt(col("qcodes"), col("codes")).cast("double"))
    val cand = TopK.aggTopK(coarse, "qid", "id", "dist", rerank).select("qid", "id")
    val exact = cand
      .join(base.select("id", "vec"), "id")
      .join(broadcast(queries.select("qid", "qvec")), "qid")
      .withColumn("dist", Metric.distColumn(Metric.L2, col("qvec"), col("vec")))
    TopK.aggTopK(exact, "qid", "id", "dist", k)
  }
}
