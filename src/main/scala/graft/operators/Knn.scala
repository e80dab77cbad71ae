package graft.operators

import graft.functions.vectors._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distance/score semantics for kNN. `l2` ranks ascending by squared L2;
  * `ip` / `cosine` rank descending by score (stored negated so one
  * ascending top-k path serves all metrics — mirrors the reference's use of
  * L2 and max-inner-product under one top-k, /root/reference/ood/base.py). */
object Metric {
  val L2 = "l2"
  val Ip = "ip"
  val Cosine = "cosine"

  def distColumn(metric: String, qvec: Column, vec: Column): Column = metric match {
    case L2     => vecL2Sq(qvec, vec)
    case Ip     => -vecDot(qvec, vec)
    case Cosine => -vecCosine(qvec, vec)
    case other  => throw new IllegalArgumentException(s"unknown metric: $other")
  }
}

/** Brute-force k-nearest-neighbor joins — the exact path of the reference's
  * selectivity-adaptive planner (/root/reference/filter/faiss/faiss.py:392-418,
  * AVX kernel filter/uint8_knn_file/uint8_knn.hpp:40-83).
  *
  * Plan shape (scale rationale): the query table is small relative to the
  * base table, so we broadcast it and stream the base side — no shuffle of
  * the big side; per-partition partial top-k heaps combine map-side and only
  * O(k · nq) rows cross the wire.
  */
object Knn {

  /** Exact top-k join. `queries` must have (qid, qvec); `base` (id, vec).
    * `predicate` is an optional join condition (e.g. label equality for the
    * filter track) evaluated BEFORE distance computation so Catalyst can
    * push it into the join. Returns (qid, id, dist, rank). */
  def knnJoin(
      queries: DataFrame,
      base: DataFrame,
      k: Int,
      metric: String = Metric.L2,
      predicate: Option[Column] = None): DataFrame = {
    // cosine: precompute each side's norm ONCE before the join instead of
    // per pair — 3 O(d) kernels per pair become 1 dot + 2 scalar loads.
    // Same doubles (the norm is the identical kernel on the identical row),
    // so results are bit-equal to the naive form.
    val (q, b, distCol) =
      if (metric == Metric.Cosine)
        (queries.withColumn("_qn", vecNorm2(col("qvec"))),
          base.withColumn("_bn", vecNorm2(col("vec"))),
          -(vecDot(col("qvec"), col("vec")) / sqrt(col("_qn") * col("_bn"))))
      else
        (queries, base, Metric.distColumn(metric, col("qvec"), col("vec")))
    val joined = predicate match {
      case Some(p) => b.join(broadcast(q), p)
      case None    => b.crossJoin(broadcast(q))
    }
    val scored = joined.withColumn("dist", distCol)
    TopK.aggTopK(scored, "qid", "id", "dist", k)
  }

  /** Filtered kNN, the flagship "filter track" semantics: nearest neighbors
    * among base rows whose label matches the query's label (conjunctive
    * predicate; reference: filter/faiss/faiss.py:361-426). The equality
    * predicate turns the cross join into an equi-join, so Spark hash-joins
    * on the label — the relational form of the reference's inverted-index
    * prefilter. */
  def filteredKnn(
      queries: DataFrame,
      base: DataFrame,
      k: Int,
      metric: String = Metric.L2): DataFrame =
    knnJoin(queries, base, k, metric, Some(col("qlabel") === col("label")))

  /** Exact range search (faiss's range_search shape): every base row
    * within `radius` of each query under the metric's dist convention
    * (squared L2 ascending, ip/cosine negated — so the predicate is
    * uniformly dist ≤ radius). Rows come back ranked (dist asc, id
    * tie-break) per query; queries with no rows in range simply have none.
    * Unlike top-k, the answer size is DATA-dependent — the filter sits
    * directly on the scored join, Catalyst evaluates it before the
    * per-query window, and no top-k heap state exists at all. The scale
    * path for huge corpora is candidates-first pruning (the hyperplane-LSH
    * bucketing of [[graft.operators.Dedup.embedNearDups]]) feeding this
    * exact predicate as the verify step. */
  def rangeJoin(
      queries: DataFrame,
      base: DataFrame,
      radius: Double,
      metric: String = Metric.L2,
      predicate: Option[Column] = None): DataFrame = {
    val joined = predicate match {
      case Some(p) => base.join(broadcast(queries), p)
      case None    => base.crossJoin(broadcast(queries))
    }
    val inRange = joined
      .withColumn("dist", Metric.distColumn(metric, col("qvec"), col("vec")))
      .where(col("dist") <= lit(radius))
    import org.apache.spark.sql.expressions.Window
    inRange.withColumn("rank",
      row_number().over(Window.partitionBy("qid").orderBy(col("dist"), col("id"))))
      .select("qid", "id", "dist", "rank")
  }
}
