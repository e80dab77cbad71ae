package graft.operators

import graft.functions.vectors._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Late-interaction multi-vector retrieval (the ColBERT scoring model,
  * Khattab & Zaharia, SIGIR 2020 — public): documents and queries are BAGS
  * of vectors (one per token/patch), and
  *
  *   score(Q, D) = Σ_{q ∈ Q} max_{d ∈ D} ⟨q, d⟩
  *
  * — each query vector picks its best-matching document vector, and the
  * per-query-vector maxima add up. Retrieval-quality-wise this sits
  * between single-vector dense retrieval (cheap, coarse) and full
  * cross-attention (accurate, unservable); it is the scoring model modern
  * retrieval stacks serve at scale.
  *
  * The reference is single-vector only — this is a beyond-reference
  * extension of the join family (J1's multi-vector sibling).
  *
  * Spark shape: queries broadcast (bags are small); the doc side never
  * shuffles raw vectors — similarities reduce FIRST by (query-vector, doc)
  * max (map-side combining, the corpus-sized reduction), then by
  * (query, doc) sum (rows ∝ |Q|·candidate docs), then a bounded-heap
  * top-k. At 100 TB the crossJoin scan becomes an ANN candidate pass per
  * query vector (PLAID-style: route each query vector through [[graft
  * .index.HnswRouted]]/IVF, union candidates, exact-maxsim only those) —
  * the exact reduce here is that pipeline's verify stage unchanged.
  *
  * Exactness note for the oracle gate: per-(query-vector, doc-vector)
  * dots are the same sequential double sum both engines compute; max is
  * exact selection; and the final Σ adds ONE double per query vector —
  * with two query vectors the sum is a single a+b, bit-identical
  * regardless of reduction order, so the driver's hash compare is safe.
  * (For larger bags the ordering of a multi-term float sum is
  * engine-dependent; ranks, not hashes, would be the check.) */
object MultiVec {

  /** Group a flat (id, vec) table into bags: bag id = id div `bag`,
    * position = id mod `bag` — the deterministic synthetic bagging used by
    * tests and gates (real corpora carry their own doc/token structure). */
  def bagged(flat: DataFrame, bag: Int, idOut: String): DataFrame =
    flat.select(
      (col("id") / bag).cast("long").as(idOut),
      pmod(col("id"), lit(bag)).cast("int").as("pos"),
      col("vec"))

  /** Exact MaxSim top-k join: `queries` = (qid, pos, qvec) bags,
    * `base` = (doc_id, pos, vec) bags → (qid, doc_id, dist, rank) with
    * dist = NEGATED maxsim score (one ascending top-k path for every
    * metric, the [[Metric]] convention). */
  def maxSimJoin(queries: DataFrame, base: DataFrame, k: Int): DataFrame =
    maxSimScore(queries, base, k, candidates = None)

  /** ANN-accelerated MaxSim — the serving shape (PLAID-style candidate
    * generation, Santhanam et al. 2022): route EACH query vector through a
    * max-inner-product graph over the flat vector table, take the owning
    * docs of its `c` best vector hits, union the candidates per query, and
    * run the exact maxsim reduce over only those documents. Per-query work
    * is |Q|·c graph probes + an exact re-score of the candidate union —
    * independent of corpus size. With `c` ≥ the vector count and an
    * exhaustive beam every doc is a candidate and the result EQUALS
    * [[maxSimJoin]] (the degenerate-point hash gate); the operating-point
    * recall is spec-graded. */
  /** `bagDims` = (qmax, bmax): pass the bag position bounds when the caller
    * already knows them to skip two driver aggregation jobs. `prebuilt`: a
    * resident ip graph over the SAME flat encoding (`id = doc_id·bmax +
    * pos`) — a serving caller builds it once (e.g.
    * [[graft.index.HnswKnn.buildResident]]) and amortizes across batches;
    * when absent a session-resident graph is built (and unloaded) per call,
    * with no persisted artifact or temp directory. */
  def maxSimAnn(queries: DataFrame, base: DataFrame, k: Int, c: Int,
                efSearch: Int = 64, numPartitions: Int = 4,
                prebuilt: Option[graft.index.HnswResident] = None,
                bagDims: Option[(Int, Int)] = None): DataFrame = {
    // flat vector ids that recover (doc, pos): id = doc_id * B + pos
    val (qmax, bmax) = bagDims.getOrElse((
      queries.agg(max(col("pos"))).head().getInt(0) + 1,
      base.agg(max(col("pos"))).head().getInt(0) + 1))
    // the composite-id contract: every bag position must fit its stride, or
    // flat ids collide across docs and the candidate mapping silently
    // returns plausible-but-wrong doc ids. Caller-supplied bagDims (the
    // skip-the-agg fast path) are checked for shape here and for bound
    // violations at first use below — a prebuilt index over a different
    // flat encoding fails loudly instead of mis-routing.
    require(qmax > 0 && bmax > 0, s"bagDims must be positive: ($qmax, $bmax)")
    if (bagDims.isDefined && prebuilt.isDefined) {
      val qBad = queries.where(col("pos") >= qmax || col("pos") < 0).limit(1)
      require(qBad.isEmpty,
        s"query bag position out of range for qmax=$qmax: the prebuilt " +
          "index's flat encoding does not match these bags")
    }
    val resident = prebuilt.getOrElse {
      val flat = base.select(
        (col("doc_id") * bmax + col("pos")).as("id"), col("vec"))
      graft.index.HnswKnn.buildResident(flat,
        numPartitions = numPartitions, metric = "ip")
    }
    try {
      val qflat = queries.select(
        (col("qid") * qmax + col("pos")).as("qid"), col("qvec"))
      val hits = resident.probeLocal(qflat, c, efSearch)
      val cand = hits.select(
        (col("qid") / qmax).cast("long").as("qid"),
        (col("id") / bmax).cast("long").as("doc_id")).distinct()
      maxSimScore(queries, base, k, candidates = Some(cand))
    } finally if (prebuilt.isEmpty) resident.unload()
  }

  /** Serving-form approximate MaxSim from graph hits ALONE — the standard
    * ColBERT serving shortcut: each query vector contributes the best dot
    * among its `c` graph hits per document; (query-vector, doc) pairs the
    * probe never surfaced contribute nothing. One resident-graph probe
    * batch per query batch, then this reduce over the nq·|Q|·c hit rows —
    * no second pass over the corpus at all, which is exactly what a
    * serving tier wants. This array form is the DRIVER regime;
    * [[graft.index.MaxSimServe.probeBatch]] wraps it and switches to a
    * fully distributed two-stage reduce past its `treeAt` partition count
    * (identical rows, spec-asserted). Scores are LOWER BOUNDS of the
    * true maxsim (missing pairs only lose mass), so recall against the
    * exact ranking is the grade (spec ≥ 0.9 at the operating point).
    *
    * `hits` = [[graft.index.HnswKnn.loadResident]].probeBatch output over
    * composite ids (qid·qmax+pos probing vectors id = doc·bmax+pos, dist =
    * negated dot under ip). Returns (qid, doc_id, dist = −score, rank). */
  def maxSimFromHits(hits: Array[(Long, Long, Double, Long)], qmax: Int,
                     bmax: Int, k: Int): Array[(Long, Long, Double, Long)] = {
    val best = scala.collection.mutable.HashMap.empty[(Long, Int, Long), Double]
    hits.foreach { case (cq, vid, dist, _) =>
      val key = (cq / qmax, (cq % qmax).toInt, vid / bmax)
      val dot = -dist
      if (best.getOrElse(key, Double.NegativeInfinity) < dot) best(key) = dot
    }
    // score sum folds in ASCENDING query-vector position — a deterministic
    // float order, identical to MaxSimServe's distributed regime (hash-map
    // iteration order must never decide a float sum)
    best.toArray
      .map { case ((qid, qpos, doc), m) => (qid, doc, qpos, m) }
      .groupBy(t => (t._1, t._2)).toArray
      .map { case ((qid, doc), rs) =>
        var s = 0.0
        rs.sortBy(_._3).foreach(r => s += r._4)
        (qid, doc, -s)
      }
      .groupBy(_._1).toArray.sortBy(_._1)
      .flatMap { case (_, rows) =>
        rows.sortBy(r => (r._3, r._2)).take(k).zipWithIndex
          .map { case ((qid, doc, d), i) => (qid, doc, d, (i + 1).toLong) }
      }
  }

  private def maxSimScore(queries: DataFrame, base: DataFrame, k: Int,
                          candidates: Option[DataFrame]): DataFrame = {
    val q = queries.select(col("qid"), col("pos").as("qpos"), col("qvec"))
    val paired = candidates match {
      // candidate pruning: only (qid, doc_id) pairs that survived the ANN
      // pass reach the similarity kernel — the scan narrows from corpus ×
      // queries to the candidate union
      case Some(cand) => base.join(cand, "doc_id").join(broadcast(q), "qid")
      case None       => base.crossJoin(broadcast(q))
    }
    val sims = paired.withColumn("sim", vecDot(col("qvec"), col("vec")))
    // corpus-sized reduction first: best doc vector per (query vector, doc)
    val best = sims.groupBy("qid", "qpos", "doc_id").agg(max(col("sim")).as("best"))
    // then |Q| rows per (query, doc) collapse to the late-interaction score
    val score = best.groupBy("qid", "doc_id").agg(sum(col("best")).as("score"))
    TopK.aggTopK(score.withColumn("dist", -col("score")),
      "qid", "doc_id", "dist", k)
  }
}
