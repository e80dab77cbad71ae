package graft.index

/** Distributed serving reduce for hits-only MaxSim (the ColBERT serving
  * shortcut — see [[graft.operators.MultiVec]] for the scoring model and
  * the composite-id bag encoding): each query vector takes its global
  * top-`c` hits from a resident max-inner-product graph, each (query, doc)
  * sums the per-query-vector best dots among those hits, and docs rank per
  * query by (score desc → dist asc, doc asc).
  *
  * Two regimes, the [[ProbeMerge]] contract, keyed on resident partition
  * count:
  *  - below `treeAt`: one probe batch (whose own fan-in is ProbeMerge's
  *    two-regime merge) collects the merged top-c per query vector and the
  *    max/sum/top-k reduce runs on the driver — nq·|Q|·c rows, the serving
  *    fast path (the r5 verdict's last driver-side serving reduce, now
  *    bounded to this regime only);
  *  - at/above `treeAt` (the thousand-shard cluster): the reduce is a
  *    two-stage RDD dataflow — colocate candidates by query vector, exact
  *    global top-c per vector (same dedup merge as ProbeMerge), local
  *    per-(query, doc) max, colocate by query, qpos-ordered sum, bounded
  *    top-k — and the driver receives only the nq·k ranked rows.
  *
  * Both regimes produce IDENTICAL rows: the global top-c per vector is the
  * same deduped (dist asc, id asc) merge either way, the per-doc max is
  * exact selection, and the float score sum folds in ascending query-vector
  * position in both (MaxSimServeSpec asserts row equality). */
object MaxSimServe {

  /** Serve one MaxSim batch from `resident` (an ip-metric graph over flat
    * vector ids `doc_id·bmax + pos`; query ids are `qid·qmax + pos`).
    * Returns (qid, doc_id, dist = −score, rank) sorted by (qid, rank). */
  def probeBatch(resident: HnswResident, qs: Array[(Long, Array[Float])],
                 qmax: Int, bmax: Int, k: Int, c: Int, efSearch: Int,
                 treeAt: Int = 64): Array[(Long, Long, Double, Long)] =
    if (resident.numPartitions < treeAt)
      graft.operators.MultiVec.maxSimFromHits(
        resident.probeBatch(qs, c, efSearch), qmax, bmax, k)
    else resident.withCandidates(qs, c, efSearch) { cands =>
      val p = math.max(cands.getNumPartitions, 1)
      // stage 1: exact global top-c per query vector — singleton arrays are
      // (dist, id)-sorted, and ProbeMerge.mergeTwo is associative and
      // commutative over them (duplicate ids carry identical distances)
      val topc = cands
        .map { case (cq, id, d) => (cq, Array((id, d))) }
        .reduceByKey((a, b) => ProbeMerge.mergeTwo(a, b, c), p)
      // stage 2: per-(query, doc) best dot from each vector's top-c, then
      // colocate by query for the qpos-ordered sum + bounded top-k
      val ranked = topc.flatMap { case (cq, top) =>
        val qid = cq / qmax
        val qpos = (cq % qmax).toInt
        val best = scala.collection.mutable.LongMap.empty[Double]
        top.foreach { case (vid, dist) =>
          val doc = vid / bmax
          val dot = -dist
          if (best.getOrElse(doc, Double.NegativeInfinity) < dot) best(doc) = dot
        }
        best.iterator.map { case (doc, m) => (qid, (qpos, doc, m)) }
      }.groupByKey(p).flatMap { case (qid, it) =>
        val rows = it.toArray
        val scored = rows.groupBy(_._2).iterator.map { case (doc, rs) =>
          var s = 0.0
          rs.sortBy(_._1).foreach(r => s += r._3) // ascending qpos: the
          (doc, -s)                               // driver regime's order
        }.toArray
        scored.sortBy { case (doc, d) => (d, doc) }.iterator.take(k)
          .zipWithIndex
          .map { case ((doc, d), i) => (qid, doc, d, (i + 1).toLong) }
      }
      ranked.collect().sortBy(r => (r._1, r._4))
    }
}
