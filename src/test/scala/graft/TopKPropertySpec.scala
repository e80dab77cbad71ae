package graft

import graft.operators.{ScoredId, TopKBuffer}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the bounded top-k heap — the one hand-written
  * data structure on the engine's hot path (every kNN result flows through
  * it). Model: sort all inserted (dist, id) pairs by (dist asc, id asc) and
  * take k. The buffer must match the model for ANY insertion order, any
  * duplicate/tie pattern, and any split into partial buffers (map-side
  * combine simulation). */
class TopKPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private def model(xs: Seq[(Long, Double)], k: Int): Seq[ScoredId] =
    xs.sortBy { case (id, d) => (d, id) }.take(k).map { case (id, d) => ScoredId(id, d) }

  private val entryGen: Gen[(Long, Double)] = for {
    id <- Gen.chooseNum(-1000L, 1000L)
    // small value pool → lots of exact ties, the hard case
    d <- Gen.oneOf(Gen.chooseNum(-5, 5).map(_.toDouble),
      Gen.chooseNum(-1000000L, 1000000L).map(_ / 1e3))
  } yield (id, d)

  test("buffer equals sorted-take-k for any input (ties, dups, any k)") {
    check(Prop.forAll(Gen.listOf(entryGen), Gen.chooseNum(1, 12)) { (xs, k) =>
      val buf = new TopKBuffer(k)
      xs.foreach { case (id, d) => buf.add(id, d) }
      buf.result() == model(xs, k)
    })
  }

  test("merge of arbitrarily split partial buffers equals the global result") {
    check(Prop.forAll(Gen.listOf(entryGen), Gen.chooseNum(1, 12), Gen.chooseNum(1, 7)) {
      (xs, k, nSplits) =>
        val parts = xs.zipWithIndex.groupBy(_._2 % nSplits).values.map(_.map(_._1))
        val bufs = parts.map { p =>
          val b = new TopKBuffer(k)
          p.foreach { case (id, d) => b.add(id, d) }
          b
        }
        val merged = bufs.foldLeft(new TopKBuffer(k))((acc, b) => acc.mergeIn(b))
        merged.result() == model(xs, k)
    })
  }

  test("result is idempotent; a full buffer rejects strictly worse elements") {
    check(Prop.forAll(Gen.listOf(entryGen), Gen.chooseNum(1, 8)) { (xs, k) =>
      val buf = new TopKBuffer(k)
      xs.foreach { case (id, d) => buf.add(id, d) }
      val r1 = buf.result()
      val stable = buf.result() == r1
      val rejects = if (r1.size == k) {
        buf.add(Long.MaxValue, Double.MaxValue)
        buf.result() == r1
      } else true
      stable && rejects
    })
  }
}
