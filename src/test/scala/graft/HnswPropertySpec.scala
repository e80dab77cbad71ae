package graft

import graft.index.HnswIndex
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the partition-local HNSW index — the one
  * hand-written search structure on the ANN hot path. The load-bearing
  * guarantees, for ANY vector set under BOTH metrics:
  *
  *  - an exhaustive beam (ef ≥ n) returns exactly the brute-force ranking
  *    by (dist asc, id asc) — the degenerate point every `*_exact` driver
  *    gate relies on;
  *  - the filtered search admits ONLY allowed ids, and returns
  *    min(k, |allowed|) results with the exact filtered ranking at the
  *    exhaustive beam (expand-until-k + exact-fallback contract);
  *  - builds are insertion-order deterministic.
  *
  * Vectors are integer-valued (exact in Float/Double), so the model's
  * distances are bit-equal to the index's — no tolerance fudging. */
class HnswPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(120), p)
    assert(res.passed, res.status.toString)
  }

  private val dim = 4
  private val vecGen: Gen[Array[Float]] =
    Gen.listOfN(dim, Gen.chooseNum(-8, 8)).map(_.map(_.toFloat).toArray)
  private val setGen: Gen[List[Array[Float]]] =
    Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n, vecGen))

  private def modelDist(metric: String, a: Array[Float], b: Array[Float]): Double =
    if (metric == "ip") -(a, b).zipped.map((x, y) => x.toDouble * y.toDouble).sum
    else (a, b).zipped.map((x, y) => (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble)).sum

  private def build(vs: List[Array[Float]], metric: String): HnswIndex = {
    val idx = new HnswIndex(m = 4, efConstruction = 20, metric = metric)
    vs.zipWithIndex.foreach { case (v, i) => idx.add(i.toLong, v) }
    idx
  }

  for (metric <- Seq("l2", "ip")) {
    test(s"[$metric] exhaustive beam equals brute force exactly") {
      check(Prop.forAll(setGen, vecGen) { (vs, q) =>
        val idx = build(vs, metric)
        val k = math.min(5, vs.length)
        val got = idx.search(q, k, ef = vs.length).toSeq
        val want = vs.zipWithIndex
          .map { case (v, i) => (i.toLong, modelDist(metric, q, v)) }
          .sortBy { case (id, d) => (d, id) }.take(k)
        got == want
      })
    }

    test(s"[$metric] filtered search: only allowed ids, exact at full beam") {
      check(Prop.forAll(setGen, vecGen, Gen.long) { (vs, q, seed) =>
        val idx = build(vs, metric)
        val rng = new scala.util.Random(seed)
        val allowed = vs.indices.filter(_ => rng.nextBoolean()).map(_.toLong).toSet
        val k = 3
        val got = idx.searchFiltered(q, k, ef0 = vs.length, allowed.contains).toSeq
        val want = vs.zipWithIndex
          .filter { case (_, i) => allowed.contains(i.toLong) }
          .map { case (v, i) => (i.toLong, modelDist(metric, q, v)) }
          .sortBy { case (id, d) => (d, id) }.take(k)
        got == want
      })
    }
  }

  for (metric <- Seq("l2", "ip")) {
    test(s"[$metric] BEAM results carry exact distances, sorted, unique, ≤ k") {
      // ef = 8 < n exercises the graph-walk path (the earlier properties
      // hit the exhaustive exact scan by construction)
      check(Prop.forAll(setGen, vecGen) { (vs, q) =>
        val idx = build(vs, metric)
        val k = math.min(5, vs.length)
        val got = idx.search(q, k, ef = 8).toSeq
        got.nonEmpty && got.size <= k &&
          got.forall { case (id, d) => d == modelDist(metric, q, vs(id.toInt)) } &&
          got == got.sortBy(t => (t._2, t._1)) &&
          got.map(_._1).distinct.size == got.size
      })
    }
  }

  test("builds are insertion-order deterministic") {
    check(Prop.forAll(setGen, vecGen) { (vs, q) =>
      val a = build(vs, "l2").search(q, math.min(5, vs.length), ef = vs.length).toSeq
      val b = build(vs, "l2").search(q, math.min(5, vs.length), ef = vs.length).toSeq
      a == b
    })
  }
}
