package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall@k evaluation — the reference's grading metric (recall of returned
  * ids against exact ground truth, averaged over queries;
  * /root/reference/README.md:241-243). Used by the approximate paths (IVF,
  * HNSW) whose correctness is recall-graded rather than hash-graded. */
object Recall {

  /** Per-query recall@k: (qid, hits, recall_bp). `got` and `truth` carry
    * (qid, id, rank); rows with rank > k are ignored. Queries present in
    * truth but absent from got score 0. */
  def perQuery(got: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    val g = got.where(col("rank") <= k).select("qid", "id")
    val t = truth.where(col("rank") <= k).select("qid", "id")
    val nTruth = t.groupBy("qid").agg(count(lit(1)).as("n_truth"))
    val hits = g.join(t, Seq("qid", "id"), "leftsemi")
      .groupBy("qid").agg(count(lit(1)).as("hits"))
    nTruth.join(hits, Seq("qid"), "left")
      .na.fill(0, Seq("hits"))
      .withColumn("recall_bp", expr("(10000 * hits) div n_truth"))
      .select("qid", "hits", "recall_bp")
  }

  /** Mean recall@k over all queries in `truth`, as a Double in [0, 1]. */
  def mean(got: DataFrame, truth: DataFrame, k: Int): Double = {
    val row = perQuery(got, truth, k).agg(avg(col("recall_bp"))).head()
    if (row.isNullAt(0)) 0.0 else row.getDouble(0) / 10000.0
  }
}
