package graft.index

import graft.functions.vectors._
import graft.operators.{Metric, TopK}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference baseline's actual index composition: `indexkey=
  * IVF16384,SQ8` (/root/reference/filter/faiss/config.yaml:50-53) — an IVF
  * coarse quantizer OVER SQ8-compressed residuals. Spark shape:
  *
  *   1. route each query to its `nprobe` nearest centroids (broadcast
  *      centroid argmin — map-side);
  *   2. scan ONLY the routed clusters' rows, scoring SQ8 codes with the
  *      codegen integer-L2 kernel — the scan reads 1 byte/component instead
  *      of 4 (the compression is why the reference fits 10M×192 in RAM);
  *   3. exact float re-rank of the `rerank` best candidates per query.
  *
  * Both approximations compose: cluster pruning bounds scan volume,
  * quantization bounds scan width; the exact re-rank restores recall from
  * the union of their errors. nprobe = C and rerank = n degenerate to exact
  * brute force (asserted in IndexSpec). */
object IvfSq8 {

  /** Build both stages and search. For repeated probes build the pieces
    * once ([[IvfIndex.build]], [[Sq8.train]]) and call [[knnWith]]. */
  def knn(queries: DataFrame, base: DataFrame, k: Int, c: Int, iters: Int,
          nprobe: Int, rerank: Int): DataFrame = {
    val ivf = IvfIndex.build(base, c, iters)
    val (mins, spans) = Sq8.train(base)
    knnWith(ivf, queries, base, k, nprobe, rerank, mins, spans)
  }

  def knnWith(ivf: IvfIndex, queries: DataFrame, base: DataFrame, k: Int,
              nprobe: Int, rerank: Int,
              mins: Array[Double], spans: Array[Double]): DataFrame = {
    val routes = TopK.aggTopK(
      queries.select("qid", "qvec").crossJoin(broadcast(ivf.centroids))
        .withColumn("dist", Metric.distColumn(Metric.L2, col("qvec"), col("cvec"))),
      "qid", "cid", "dist", nprobe)
      .select("qid", "cid")
    val cand = routes.join(ivf.assigned, "cid").select("qid", "id")
    val codes = base.select(col("id"),
      Sq8.encodeCol(col("vec"), mins, spans).as("codes"))
    val qcodes = queries.select(col("qid"),
      Sq8.encodeCol(col("qvec"), mins, spans).as("qcodes"))
    val coarse = cand
      .join(codes, "id")
      .join(broadcast(qcodes), "qid")
      .withColumn("dist", vecL2SqInt(col("qcodes"), col("codes")).cast("double"))
    val survivors = TopK.aggTopK(coarse, "qid", "id", "dist", rerank)
      .select("qid", "id")
    val exact = survivors
      .join(base.select("id", "vec"), "id")
      .join(broadcast(queries.select("qid", "qvec")), "qid")
      .withColumn("dist", Metric.distColumn(Metric.L2, col("qvec"), col("vec")))
    TopK.aggTopK(exact, "qid", "id", "dist", k)
  }
}
