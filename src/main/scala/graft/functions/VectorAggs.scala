package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Whole-vector aggregates: ONE buffer object per group carrying O(d) state,
  * instead of d separate aggregate columns. The wide-aggregate form
  * (`(0 until dim).map(i => avg($"vec"(i)))`) is fine at d≈64 but becomes a
  * 4096-column aggregate at d=2048 — Catalyst plan size, codegen splitting,
  * and per-column buffer overhead all degrade. These Aggregators keep the
  * plan a single column at any dimensionality and still combine map-side
  * (partial buffers merge elementwise), which is the property that makes
  * the recenter/train shuffles cheap: one buffer per (partition, group).
  *
  * The same role MLlib's Summarizer plays for ML vectors, expressed over
  * plain ARRAY<FLOAT> columns so it composes with this engine's schema. */
object VectorAggs {

  private def seqFloatEnc: Encoder[Seq[Float]] = ExpressionEncoder()

  /** Elementwise mean: ARRAY<FLOAT> rows → ARRAY<FLOAT> of per-dimension
    * averages (double accumulation). Empty groups yield an empty array. */
  val vecMean = udaf(new Aggregator[Seq[Float], (Long, Array[Double]), Seq[Float]] {
    def zero: (Long, Array[Double]) = (0L, Array.empty[Double])
    def reduce(b: (Long, Array[Double]), a: Seq[Float]): (Long, Array[Double]) = {
      val sums = if (b._2.isEmpty) Array.ofDim[Double](a.length) else b._2
      var i = 0
      while (i < a.length && i < sums.length) { sums(i) += a(i); i += 1 }
      (b._1 + 1, sums)
    }
    def merge(x: (Long, Array[Double]), y: (Long, Array[Double])): (Long, Array[Double]) = {
      if (x._2.isEmpty) y
      else if (y._2.isEmpty) x
      else {
        var i = 0
        while (i < x._2.length && i < y._2.length) { x._2(i) += y._2(i); i += 1 }
        (x._1 + y._1, x._2)
      }
    }
    def finish(b: (Long, Array[Double])): Seq[Float] =
      if (b._1 == 0) Seq.empty else b._2.toSeq.map(s => (s / b._1).toFloat)
    def bufferEncoder: Encoder[(Long, Array[Double])] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Float]] = seqFloatEnc
  }, seqFloatEnc)

  /** Elementwise (min, max): ARRAY<FLOAT> rows → struct(mins, maxs). Min and
    * max are order-independent, so the result is exact and deterministic
    * under any partial-aggregation order. */
  val vecMinMax = udaf(new Aggregator[Seq[Float], (Array[Float], Array[Float]), (Seq[Float], Seq[Float])] {
    def zero: (Array[Float], Array[Float]) = (Array.empty[Float], Array.empty[Float])
    def reduce(b: (Array[Float], Array[Float]), a: Seq[Float]): (Array[Float], Array[Float]) = {
      if (b._1.isEmpty) (a.toArray, a.toArray)
      else {
        var i = 0
        while (i < a.length && i < b._1.length) {
          if (a(i) < b._1(i)) b._1(i) = a(i)
          if (a(i) > b._2(i)) b._2(i) = a(i)
          i += 1
        }
        b
      }
    }
    def merge(x: (Array[Float], Array[Float]), y: (Array[Float], Array[Float])): (Array[Float], Array[Float]) = {
      if (x._1.isEmpty) y
      else if (y._1.isEmpty) x
      else {
        var i = 0
        while (i < x._1.length && i < y._1.length) {
          if (y._1(i) < x._1(i)) x._1(i) = y._1(i)
          if (y._2(i) > x._2(i)) x._2(i) = y._2(i)
          i += 1
        }
        x
      }
    }
    def finish(b: (Array[Float], Array[Float])): (Seq[Float], Seq[Float]) =
      (b._1.toSeq, b._2.toSeq)
    def bufferEncoder: Encoder[(Array[Float], Array[Float])] = ExpressionEncoder()
    def outputEncoder: Encoder[(Seq[Float], Seq[Float])] = ExpressionEncoder()
  }, seqFloatEnc)
}
