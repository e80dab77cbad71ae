package graft

import graft.streaming.{Runbook, RunbookStep}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for [[Runbook.liveRanges]] — the O(#ops) range
  * compression the resident-exact runbook executor serves checkpoints from.
  * The model is the definitional per-id simulation: an id is live iff the
  * latest op covering it is an insert. For ANY op sequence (overlapping,
  * nested, empty, re-inserting, deleting the never-inserted), the range
  * sweep must agree with the model id-for-id, and its output must be
  * canonical: sorted, disjoint, non-adjacent, non-empty segments. */
class LiveRangesPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val domain = 60L
  private val opGen: Gen[RunbookStep] = for {
    op <- Gen.oneOf("insert", "delete")
    a <- Gen.chooseNum(0L, domain)
    b <- Gen.chooseNum(0L, domain)
  } yield RunbookStep(op, math.min(a, b), math.max(a, b))
  private val opsGen: Gen[List[RunbookStep]] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, opGen))

  private def modelLive(ops: Seq[RunbookStep], id: Long): Boolean =
    ops.reverseIterator
      .find(s => s.start <= id && id < s.end)
      .exists(_.op == "insert")

  test("liveRanges equals the per-id latest-op model on random op logs") {
    check(Prop.forAll(opsGen) { ops =>
      val ranges = Runbook.liveRanges(ops)
      def inRanges(id: Long) =
        ranges.exists { case (lo, hi) => lo <= id && id < hi }
      (0L until domain).forall { id =>
        inRanges(id) == modelLive(ops, id)
      }
    })
  }

  test("liveRanges output is canonical: sorted, disjoint, merged, non-empty") {
    check(Prop.forAll(opsGen) { ops =>
      val ranges = Runbook.liveRanges(ops)
      ranges.forall { case (lo, hi) => lo < hi } &&
        ranges.sliding(2).forall {
          // strictly increasing AND non-adjacent (adjacent must merge)
          case Array((_, h1), (l2, _)) => h1 < l2
          case _ => true
        }
    })
  }
}
