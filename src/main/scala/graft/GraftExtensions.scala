package graft

import graft.functions.{PqAdcDist, VecDot, VecL2Sq, VecL2SqInt}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions installer: exposes the codegen vector kernels to
  * pure-SQL users. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — then
  * `SELECT vec_l2sq(a.vec, b.vec) FROM ...` works in spark.sql, notebooks,
  * and thrift-server sessions with the exact same whole-stage-codegen
  * kernels the DataFrame API uses (no UDF fallback, no extra dialect).
  *
  * This is the library's SparkSessionExtensions surface; the reference's
  * equivalent extension point is its per-track algorithm ABC
  * (/root/reference/filter/base.py:3-12) — ours plugs into the SQL engine
  * itself. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(clazz: Class[_], name: String, usage: String) =
    new ExpressionInfo(clazz.getName, null, name, usage, "", "", "", "", "", "", "built-in")

  private def binary(name: String, f: (Expression, Expression) => Expression,
                     clazz: Class[_], usage: String) =
    (FunctionIdentifier(name), info(clazz, name, usage),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"$name expects 2 arguments, got ${args.length}")
        f(args(0), args(1))
      })

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(binary("vec_l2sq", VecL2Sq.apply, classOf[VecL2Sq],
      "vec_l2sq(a, b) - squared L2 distance between two ARRAY<FLOAT> vectors"))
    ext.injectFunction(binary("vec_dot", VecDot.apply, classOf[VecDot],
      "vec_dot(a, b) - dot product of two ARRAY<FLOAT> vectors"))
    ext.injectFunction(binary("vec_l2sq_int", VecL2SqInt.apply, classOf[VecL2SqInt],
      "vec_l2sq_int(a, b) - integer squared L2 between two ARRAY<SHORT> vectors"))
    // PQ ADC gather: third argument is the LUT stride and must be a
    // literal (it is baked into the generated code)
    ext.injectFunction((FunctionIdentifier("pq_adc_dist"),
      info(classOf[PqAdcDist], "pq_adc_dist",
        "pq_adc_dist(lut, codes, ksub) - PQ ADC distance: per-query ARRAY<DOUBLE> lookup table (stride ksub) gathered by ARRAY<SHORT> codes"),
      (args: Seq[Expression]) => {
        require(args.length == 3, s"pq_adc_dist expects 3 arguments, got ${args.length}")
        require(args(2).foldable, "pq_adc_dist ksub must be a literal")
        val ksub = args(2).eval() match {
          case i: Int  => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"pq_adc_dist ksub must be an integer literal, got $other")
        }
        PqAdcDist(args(0), args(1), ksub)
      }))
  }
}

/** Session-scoped registration for the whole-vector AGGREGATES (UDAFs ride
  * the udf registry, not the extension injector): after
  * `GraftFunctions.register(spark)`, `SELECT cid, vec_mean(vec) FROM t
  * GROUP BY cid` aggregates ARRAY<FLOAT> columns in SQL with the same
  * single-buffer map-side-combining Aggregators the index layer trains
  * with. */
object GraftFunctions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.udf.register("vec_mean", graft.functions.VectorAggs.vecMean)
    spark.udf.register("vec_minmax", graft.functions.VectorAggs.vecMinMax)
  }
}
