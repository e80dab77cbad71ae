package graft

import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite with SparkSuite {

  test("vector kernels resolve from pure SQL via GraftExtensions") {
    val r = spark.sql(
      """SELECT vec_l2sq(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS d,
        |       vec_dot(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS p,
        |       vec_l2sq_int(array(CAST(200 AS SHORT), CAST(0 AS SHORT)),
        |                    array(CAST(0 AS SHORT), CAST(255 AS SHORT))) AS di
        |""".stripMargin).head()
    assert(r.getDouble(0) === 8.0)
    assert(r.getDouble(1) === 11.0)
    assert(r.getLong(2) === 200L * 200 + 255L * 255)
  }

  test("pq_adc_dist resolves from SQL with a literal stride and gathers correctly") {
    // lut stride 2: subspace 0 → [10.0, 20.0], subspace 1 → [1.0, 2.0];
    // codes [1, 0] pick 20.0 + 1.0
    val r = spark.sql(
      """SELECT pq_adc_dist(array(10.0d, 20.0d, 1.0d, 2.0d),
        |                   array(CAST(1 AS SHORT), CAST(0 AS SHORT)), 2) AS d
        |""".stripMargin).head()
    assert(r.getDouble(0) === 21.0)
    // non-literal stride is rejected at resolution
    val err = intercept[Exception] {
      spark.sql(
        """SELECT pq_adc_dist(array(1.0d), array(CAST(0 AS SHORT)), id)
          |FROM range(1)""".stripMargin).head()
    }
    assert(err.getMessage.toLowerCase.contains("literal"))
  }

  test("whole-vector aggregates resolve from SQL and match the DataFrame path") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("emb_agg")
    val viaSql = spark.sql(
      """SELECT label, vec_mean(embedding) AS m FROM emb_agg GROUP BY label""")
      .as[(Int, Seq[Float])].collect().toMap
    val viaDf = Tables.embeddings(spark, sfDir)
      .groupBy("label")
      .agg(graft.functions.VectorAggs.vecMean($"embedding").as("m"))
      .as[(Int, Seq[Float])].collect().toMap
    assert(viaSql.keySet === viaDf.keySet)
    // same groups, same dims; means equal within float tolerance (partial
    // combine order may differ between the two plans)
    viaSql.foreach { case (label, m) =>
      assert(m.length === viaDf(label).length)
      m.zip(viaDf(label)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-4f, s"label $label differs: $a vs $b")
      }
    }
  }

  test("a full SQL kNN query over parquet matches the DataFrame path") {
    import spark.implicits._
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("emb")
    val viaSql = spark.sql(
      """SELECT qid, id AS neighbor_id, rank FROM (
        |  SELECT q.vec_id AS qid, e.vec_id AS id,
        |         row_number() OVER (PARTITION BY q.vec_id
        |           ORDER BY vec_l2sq(q.embedding, e.embedding), e.vec_id) AS rank
        |  FROM emb e CROSS JOIN emb q WHERE q.vec_id < 5)
        |WHERE rank <= 10
        |""".stripMargin)
      .as[(Long, Long, Long)].collect().toSet
    val q = Tables.embeddings(spark, sfDir).where($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val b = Tables.embeddings(spark, sfDir)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val viaDf = graft.operators.Knn.knnJoin(q, b, 10)
      .select("qid", "id", "rank").as[(Long, Long, Long)].collect().toSet
    assert(viaSql === viaDf)
  }
}
