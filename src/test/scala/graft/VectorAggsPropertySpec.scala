package graft

import graft.functions.VectorAggs
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the whole-vector aggregates, against
  * scala-side brute-force oracles, under arbitrary group sizes and a forced
  * repartition (which varies the partial-merge tree). Iteration count is
  * modest — each case runs real Spark aggregations. */
class VectorAggsPropertySpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val dim = 5

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), p)
    assert(res.passed, res.status.toString)
  }

  private val rowsGen: Gen[List[(Int, Array[Float])]] =
    Gen.chooseNum(1, 40).flatMap { n =>
      Gen.listOfN(n, for {
        g <- Gen.chooseNum(0, 3)
        v <- Gen.listOfN(dim, Gen.chooseNum(-1000, 1000).map(_ / 64.0f))
      } yield (g, v.toArray))
    }

  test("signPack/hamming: packed popcount equals naive mismatch for arbitrary dims incl. zeros") {
    import graft.functions.vectors._
    // dims beyond one word (65..130) exercise multi-long packing; zeros
    // and exact negations exercise the x > 0 boundary
    val pairGen: Gen[(Array[Float], Array[Float])] = for {
      d <- Gen.chooseNum(1, 130)
      a <- Gen.listOfN(d, Gen.oneOf(Gen.chooseNum(-64, 64).map(_ / 8.0f), Gen.const(0.0f)))
      b <- Gen.listOfN(d, Gen.oneOf(Gen.chooseNum(-64, 64).map(_ / 8.0f), Gen.const(0.0f)))
    } yield (a.toArray, b.toArray)
    check(Prop.forAll(Gen.listOfN(8, pairGen)) { pairs =>
      val df = pairs.toDF("a", "b")
      val got = df.select(
        vecHamming(vecSignPack($"a"), vecSignPack($"b")).as("d"))
        .as[Long].collect().toSeq
      val expect = pairs.map { case (a, b) =>
        a.zip(b).count { case (x, y) => (x > 0f) != (y > 0f) }.toLong
      }
      got == expect
    })
  }

  test("vecMinMax equals per-dimension min/max exactly for any grouping") {
    check(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("g", "vec").repartition(3)
      val got = df.groupBy("g").agg(VectorAggs.vecMinMax($"vec").as("mm"))
        .select($"g", $"mm._1".as("lo"), $"mm._2".as("hi"))
        .as[(Int, Seq[Float], Seq[Float])].collect()
        .map(t => t._1 -> ((t._2, t._3))).toMap
      val expect = rows.groupBy(_._1).map { case (g, vs) =>
        g -> (((0 until dim).map(i => vs.map(_._2(i)).min),
          (0 until dim).map(i => vs.map(_._2(i)).max)))
      }
      got.keySet == expect.keySet && expect.forall { case (g, (lo, hi)) =>
        got(g)._1.toSeq == lo && got(g)._2.toSeq == hi
      }
    })
  }

  test("vecMean matches the brute-force mean within float tolerance") {
    check(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("g", "vec").repartition(3) // force partial merges
      val got = df.groupBy("g").agg(VectorAggs.vecMean($"vec").as("m"))
        .as[(Int, Seq[Float])].collect().toMap
      rows.groupBy(_._1).forall { case (g, vs) =>
        val expect = (0 until dim).map(i => vs.map(_._2(i).toDouble).sum / vs.size)
        got(g).zip(expect).forall { case (a, e) => math.abs(a - e) < 1e-4 }
      }
    })
  }
}
