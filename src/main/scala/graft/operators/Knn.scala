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

  /** Exact Hamming top-k over sign-binarized vectors — the binary-hash
    * track (faiss IndexBinaryFlat semantics applied to sign codes). Both
    * sides binarize ONCE in a projection ([[graft.functions.VecSignPack]],
    * 32× smaller rows: one long per 64 dims), then the per-pair kernel is
    * XOR+popcount ([[graft.functions.VecHamming]]) inside whole-stage
    * codegen — the cheapest brute-scan tier there is. Same broadcast-small-
    * side / map-side-top-k plan as [[knnJoin]]; ranking is (dist asc, id
    * asc). Distance = number of coordinates whose signs disagree. */
  def knnHamming(
      queries: DataFrame,
      base: DataFrame,
      k: Int,
      predicate: Option[Column] = None): DataFrame = {
    val q = queries.withColumn("_qcode", vecSignPack(col("qvec")))
    val b = base.withColumn("_code", vecSignPack(col("vec")))
    val joined = predicate match {
      case Some(p) => b.join(broadcast(q), p)
      case None    => b.crossJoin(broadcast(q))
    }
    val scored = joined.withColumn("dist", vecHamming(col("_qcode"), col("_code")))
    TopK.aggTopK(scored, "qid", "id", "dist", k)
  }

  /** Multi-index-hashing Hamming search (Norouzi et al., "Fast Search in
    * Hamming Space with Multi-Index Hashing", CVPR 2012 — public method):
    * the sign code splits into `dim/chunkBits` disjoint substrings; by
    * pigeonhole, any pair within Hamming radius < #chunks matches EXACTLY
    * on at least one substring, so candidate generation is an EQUI-join on
    * (chunk index, substring) — a bucket join, never all-pairs. Candidates
    * then re-rank with the exact popcount kernel; top-k of the candidate
    * set, (dist asc, id asc).
    *
    * This is the binary-embedding sibling of the simhash pigeonhole pairs
    * over text ([[Dedup.simhashPairs]]) and shares its regime: it is a
    * RADIUS-BOUNDED near-duplicate search (complete for radius
    * ≤ #chunks − 1), not a general top-k accelerator — far pairs appear
    * only if a 16-bit substring collides (2⁻¹⁶ per chunk for random
    * codes). Scale: substring buckets shard the join; skewed buckets are
    * ordinary hash-join skew, handled by AQE. */
  def knnHammingMih(
      queries: DataFrame,
      base: DataFrame,
      k: Int,
      dim: Int = 64,
      chunkBits: Int = 16): DataFrame =
    TopK.aggTopK(mihScored(queries, base, dim, chunkBits), "qid", "id", "dist", k)

  /** Two-tier binary→float retrieval — the standard serving composition
    * for binary-compressed corpora: a cheap Hamming first pass over packed
    * sign codes selects `c` candidates per query (popcount kernel, 32×
    * smaller scan), then ONLY those c rows pay the exact float kernel and
    * the top-k re-ranks under the true metric. The candidate rule is
    * deterministic ((hamming asc, id asc) top-c), so the whole composition
    * hash-gates; c = |base| degenerates to exact float kNN.
    *
    * Scale shape: the binary pass is the full scan (packed, cheapest tier);
    * the float gather touches c·nq rows — broadcast the candidate ids and
    * semi-join the float corpus, never re-scanning it. */
  def knnHammingRerank(
      queries: DataFrame,
      base: DataFrame,
      k: Int,
      c: Int,
      metric: String = Metric.L2): DataFrame = {
    val cand = knnHamming(queries, base, c).select(col("qid"), col("id"))
    val gathered = base.select(col("id"), col("vec"))
      .join(broadcast(cand), "id")
      .join(broadcast(queries.select(col("qid"), col("qvec"))), "qid")
    val scored = gathered.withColumn("dist",
      Metric.distColumn(metric, col("qvec"), col("vec")))
    TopK.aggTopK(scored, "qid", "id", "dist", k)
  }

  /** EXACT Hamming range search with NO all-pairs join: for radius <
    * #chunks, pigeonhole guarantees every within-radius pair agrees on at
    * least one substring, so the MIH bucket join is a COMPLETE candidate
    * generator and filtering candidates at the radius IS the exact answer —
    * the same guarantee [[Dedup.simhashPairs]] uses over text simhashes,
    * here as a first-class range operator over embedding sign codes.
    * Returns (qid, id, dist, rank), ranked (dist asc, id asc) per query.
    * Scale: candidate volume is bucket-join-sized (near-dup pairs + 2⁻¹⁶
    * random collisions), so the per-query window ranks a handful of rows. */
  def hammingRange(
      queries: DataFrame,
      base: DataFrame,
      radius: Int,
      dim: Int = 64,
      chunkBits: Int = 16): DataFrame = {
    val m = (dim + chunkBits - 1) / chunkBits
    require(radius < m,
      s"radius $radius needs < #chunks $m for pigeonhole completeness")
    val inRange = mihScored(queries, base, dim, chunkBits)
      .where(col("dist") <= lit(radius.toLong))
    import org.apache.spark.sql.expressions.Window
    inRange.withColumn("rank",
      row_number().over(Window.partitionBy("qid").orderBy(col("dist"), col("id"))))
      .select("qid", "id", "dist", "rank")
  }

  /** MIH candidate pairs with exact popcount distances: substring
    * equi-join (chunk c's key = the sign pattern of components
    * [c·w+1, c·w+w]; ARRAY<BOOLEAN> equality gives exactly substring
    * equality), dedup to distinct (qid, id), re-rank with the packed
    * kernel. */
  private def mihScored(queries: DataFrame, base: DataFrame,
                        dim: Int, chunkBits: Int): DataFrame = {
    val m = (dim + chunkBits - 1) / chunkBits
    def chunked(df: DataFrame, vecCol: String): DataFrame =
      df.withColumn("_ch", explode(array((0 until m).map { c =>
        struct(lit(c).as("c"),
          transform(slice(col(vecCol), c * chunkBits + 1, chunkBits),
            v => v > lit(0.0f)).as("key"))
      }: _*)))
        .withColumn("c", col("_ch.c")).withColumn("key", col("_ch.key"))
        .drop("_ch")
    val qc = chunked(queries.select(col("qid"), col("qvec")), "qvec")
    val bc = chunked(base.select(col("id"), col("vec")), "vec")
    bc.join(broadcast(qc), Seq("c", "key"))
      .select(col("qid"), col("qvec"), col("id"), col("vec"))
      .dropDuplicates("qid", "id")
      .withColumn("dist",
        vecHamming(vecSignPack(col("qvec")), vecSignPack(col("vec"))))
  }

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
