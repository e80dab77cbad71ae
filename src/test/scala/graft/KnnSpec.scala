package graft

import graft.functions.vectors._
import graft.operators._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KnnSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("vecL2Sq / vecDot match a scala-side brute-force oracle") {
    val df = Seq(
      (Array(1f, 2f, 3f), Array(4f, 6f, 8f)),
      (Array(0f, 0f, 0f), Array(0f, 0f, 0f)),
      (Array(-1.5f, 2.25f, 0f), Array(1.5f, -2.25f, 3f))
    ).toDF("a", "b")
    val got = df.select(vecL2Sq($"a", $"b"), vecDot($"a", $"b")).collect()
    def l2(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    def dot(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val in = df.as[(Array[Float], Array[Float])].collect()
    got.zip(in).foreach { case (Row(gl2: Double, gdot: Double), (a, b)) =>
      assert(gl2 === l2(a, b))
      assert(gdot === dot(a, b))
    }
  }

  test("vecL2SqInt: pure integer accumulation, codegen and interpreted agree") {
    val df = Seq(
      (Array[Short](0, 255, 128), Array[Short](255, 0, 128)),
      (Array[Short](7, 7, 7), Array[Short](7, 7, 7)),
      (Array[Short](-300, 300, 0), Array[Short](300, -300, 1))
    ).toDF("a", "b")
    val got = df.select(vecL2SqInt($"a", $"b")).as[Long].collect()
    def oracle(a: Array[Short], b: Array[Short]) =
      a.zip(b).map { case (x, y) => val d = (x - y).toLong; d * d }.sum
    val in = df.as[(Array[Short], Array[Short])].collect()
    got.zip(in).foreach { case (g, (a, b)) => assert(g === oracle(a, b)) }
    // interpreted path (eval without codegen) must agree
    import graft.functions.VecL2SqInt
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, ShortType}
    in.foreach { case (a, b) =>
      val e = VecL2SqInt(
        Literal(ArrayData.toArrayData(a), ArrayType(ShortType)),
        Literal(ArrayData.toArrayData(b), ArrayType(ShortType)))
      assert(e.eval(null) === oracle(a, b))
    }
  }

  test("aggTopK equals windowTopK on the embeddings table (differential)") {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.where($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val b = e.select($"vec_id".as("id"), $"embedding".as("vec"))
    val scored = b.crossJoin(broadcast(q))
      .withColumn("dist", vecL2Sq($"qvec", $"vec"))
    val viaAgg = TopK.aggTopK(scored, "qid", "id", "dist", 10)
      .select("qid", "id", "rank").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaWin = TopK.windowTopK(scored, "qid", "id", "dist", 10)
      .select("qid", "id", "rank").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaAgg === viaWin)
    assert(viaAgg.size === 50)
  }

  test("filtered kNN honors the label predicate (every neighbor matches)") {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.where($"vec_id" < 20)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"), $"label".as("qlabel"))
    val b = e.select($"vec_id".as("id"), $"embedding".as("vec"), $"label")
    val res = Knn.filteredKnn(q, b, 10)
    val labels = e.select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    res.select("qid", "id").as[(Long, Long)].collect().foreach { case (qid, id) =>
      assert(labels(qid) === labels(id), s"neighbor $id of query $qid violates filter")
    }
  }

  test("self is rank 1 for L2 on unit-normalized embeddings") {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.where($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val b = e.select($"vec_id".as("id"), $"embedding".as("vec"))
    val r1 = Knn.knnJoin(q, b, 10, Metric.L2).where($"rank" === 1)
      .select("qid", "id").as[(Long, Long)].collect()
    r1.foreach { case (qid, id) => assert(qid === id) }
  }

  test("maxSimJoin: handcrafted bag scores; single-vector bags degenerate to MIPS") {
    // two docs of two vectors, one query of two vectors, hand-checkable:
    // doc 0 holds the best match for q-vec 0, doc 1 for q-vec 1
    val base = Seq(
      (0L, 0, Array(1f, 0f)), (0L, 1, Array(0.5f, 0.5f)),
      (1L, 0, Array(0f, 1f)), (1L, 1, Array(0.9f, 0.1f))
    ).toDF("doc_id", "pos", "vec")
    val q = Seq((0L, 0, Array(1f, 0f)), (0L, 1, Array(0f, 1f)))
      .toDF("qid", "pos", "qvec")
    val got = MultiVec.maxSimJoin(q, base, 2)
      .select($"qid", $"doc_id", $"dist", $"rank")
      .as[(Long, Long, Double, Long)].collect().sortBy(_._4)
    // doc 0: max(1.0, 0.5) + max(0.0, 0.5) = 1.5; doc 1: 0.9 + 1.0 = 1.9
    // (expected values go through the same float32 literals the data does)
    assert(got.map(t => (t._2, -t._3)).toSeq ===
      Seq((1L, 0.9f.toDouble + 1.0), (0L, 1.5)))

    // 1-vector bags: maxsim == plain MIPS ranking (score = the single dot)
    val e = Tables.embeddings(spark, sfDir)
    val flat = e.select($"vec_id".as("id"), $"embedding".as("vec"))
    val bags = MultiVec.bagged(flat, 1, "doc_id")
    val qbags = MultiVec.bagged(flat.where($"id" < 5), 1, "qid")
      .select($"qid", $"pos", $"vec".as("qvec"))
    val ms = MultiVec.maxSimJoin(qbags, bags, 10)
      .select($"qid", $"doc_id".as("id"), $"rank")
      .as[(Long, Long, Long)].collect().toSet
    val ip = Knn.knnJoin(
      flat.where($"id" < 5).select($"id".as("qid"), $"vec".as("qvec")),
      flat, 10, Metric.Ip)
      .select($"qid", $"id", $"rank").as[(Long, Long, Long)].collect().toSet
    assert(ms === ip)
  }

  test("maxSimAnn: exhaustive candidates equal exact maxsim; operating point recalls it") {
    val e = Tables.embeddings(spark, sfDir)
    val flat = e.select($"vec_id".as("id"), $"embedding".as("vec"))
    val bags = MultiVec.bagged(flat, 4, "doc_id")
    val qbags = MultiVec.bagged(flat.where($"id" < 8), 2, "qid")
      .select($"qid", $"pos", $"vec".as("qvec"))
    def rs(df: org.apache.spark.sql.DataFrame) =
      df.select($"qid", $"doc_id", $"rank").as[(Long, Long, Long)].collect().toSet
    val exact = MultiVec.maxSimJoin(qbags, bags, 10)
    val n = flat.count().toInt
    assert(rs(MultiVec.maxSimAnn(qbags, bags, 10, c = n, efSearch = 1 << 20))
      === rs(exact))
    // operating point: 32 vector hits per query vector, beam 64
    val approx = MultiVec.maxSimAnn(qbags, bags, 10, c = 32, efSearch = 64)
    val r = Recall.mean(
      approx.withColumnRenamed("doc_id", "id"),
      exact.withColumnRenamed("doc_id", "id"), 10)
    assert(r >= 0.9, s"ANN maxsim recall $r")
  }

  test("rangeJoin: exactly the full-ranking rows within the radius, ranks preserved") {
    val e = Tables.embeddings(spark, sfDir)
    val b = e.select($"vec_id".as("id"), $"embedding".as("vec"))
    val q = e.where($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val radius = 1.6
    val got = Knn.rangeJoin(q, b, radius)
      .select($"qid".cast("long"), $"id".cast("long"), $"rank".cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    // semantic reference: rank the WHOLE corpus per query, keep the prefix
    // inside the radius — in-range rows are exactly a rank prefix
    val n = b.count().toInt
    val full = Knn.knnJoin(q, b, n)
    val want = full.where($"dist" <= radius)
      .select($"qid".cast("long"), $"id".cast("long"), $"rank".cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty, "radius too small for the fixture")
    // every query's own vector is in range at distance 0, rank 1
    assert((0L until 5L).forall(qid => got.contains((qid, qid, 1L))))
  }
}
