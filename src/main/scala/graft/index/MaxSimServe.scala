package graft.index

/** Distributed serving reduce for hits-only MaxSim (the ColBERT serving
  * shortcut — see [[graft.operators.MultiVec]] for the scoring model and
  * the composite-id bag encoding): each query vector takes its global
  * top-`c` hits from a resident max-inner-product graph, each (query, doc)
  * sums the per-query-vector best dots among those hits, and docs rank per
  * query by (score desc → dist asc, doc asc).
  *
  * Two regimes, the [[ProbeMerge]] contract, keyed on resident partition
  * count AND candidate volume:
  *  - driver regime: one probe batch (whose own fan-in is ProbeMerge's
  *    two-regime merge) collects the merged top-c per query vector and the
  *    max/sum/top-k reduce runs on the driver — nq·|Q|·c rows, the serving
  *    fast path. Taken only below `treeAt` partitions AND below
  *    `maxDriverHits` pre-merge candidate rows: the corpus-relative c knob
  *    grows linearly with corpus size, so at 10× rows the driver collect
  *    becomes tens of millions of boxed tuples per batch and the allocation
  *    debt lands as multi-second GC pauses on random batches (the r6 sf1
  *    spread-23 collapse) — volume, not shard count, is what actually
  *    overwhelms the driver;
  *  - distributed regime (at/above `treeAt` partitions, or any time the
  *    driver volume bound trips): the reduce is a two-stage RDD dataflow —
  *    colocate candidates by query vector, exact global top-c per vector
  *    (same dedup merge as ProbeMerge), per-(query, doc) per-position best
  *    dot held in a fixed qmax-slot accumulator (bounded state — never the
  *    full hit iterable), deterministic ascending-position sum, bounded
  *    per-query top-k merge — and the driver receives only the nq·k ranked
  *    rows.
  *
  * Both regimes produce IDENTICAL rows: the global top-c per vector is the
  * same deduped (dist asc, id asc) merge either way, the per-doc max is
  * exact selection, and the float score sum folds in ascending query-vector
  * position in both (KnnSpec's "MaxSimServe: driver and distributed regimes
  * produce identical rows" test asserts row equality). */
object MaxSimServe {

  /** Serve one MaxSim batch from `resident` (an ip-metric graph over flat
    * vector ids `doc_id·bmax + pos`; query ids are `qid·qmax + pos`).
    * Returns (qid, doc_id, dist = −score, rank) sorted by (qid, rank).
    *
    * `maxDriverHits` bounds the driver regime's collect: the pre-merge
    * candidate stream is |qs|·c·P rows, and past a few million boxed
    * tuples per batch the driver's allocation rate dominates the batch
    * time (the r6 sf1 collapse: 5.1M hits/batch → multi-second GC pauses,
    * spread 23). The default keeps the sf0.1 operating point
    * (500·128·8 ≈ 0.5M) on the fast path with 4× headroom and pushes the
    * 10×-corpus point (500·1,280·8 ≈ 5.1M, where the corpus-relative c
    * knob has scaled 10×) to the distributed regime. */
  def probeBatch(resident: HnswResident, qs: Array[(Long, Array[Float])],
                 qmax: Int, bmax: Int, k: Int, c: Int, efSearch: Int,
                 treeAt: Int = 64,
                 maxDriverHits: Long = 2L * 1000 * 1000): Array[(Long, Long, Double, Long)] = {
    val parts = math.max(resident.numPartitions, 1)
    val driverHits = qs.length.toLong * c * parts
    if (parts < treeAt && driverHits <= maxDriverHits)
      graft.operators.MultiVec.maxSimFromHits(
        resident.probeBatch(qs, c, efSearch), qmax, bmax, k)
    else resident.withCandidateArrays(qs, c, efSearch) { cands =>
      val p = math.max(cands.getNumPartitions, 1)
      // stage 1: exact global top-c per query vector — each (query,
      // partition) row is already a (dist asc, id asc)-sorted array, and
      // ProbeMerge.mergeTwo is associative and commutative over them
      // (duplicate ids carry identical distances), so merging the P arrays
      // per query costs O(P·c) — never the O(c²) a singleton-exploded
      // combine would pay
      val topc = cands.reduceByKey((a, b) => ProbeMerge.mergeTwo(a, b, c), p)
      // stage 2a: per-(query, doc) best dot per query-vector position, held
      // in a fixed qmax-slot accumulator — each position is written by
      // exactly one composite query vector, so elementwise max is a plain
      // fill and per-key state is O(qmax), not O(hits)
      val negInf = Double.NegativeInfinity
      val perDoc = topc.flatMap { case (cq, top) =>
        val qid = cq / qmax
        val qpos = (cq % qmax).toInt
        val best = scala.collection.mutable.LongMap.empty[Double]
        top.foreach { case (vid, dist) =>
          val doc = vid / bmax
          val dot = -dist
          if (best.getOrElse(doc, negInf) < dot) best(doc) = dot
        }
        best.iterator.map { case (doc, m) =>
          val slots = Array.fill(qmax)(negInf)
          slots(qpos) = m
          ((qid, doc), slots)
        }
      }.reduceByKey({ (a, b) =>
        var i = 0
        while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
        a
      }, p)
      // stage 2b: deterministic score — fold hit slots in ASCENDING query-
      // vector position (the driver regime's float order) — then a bounded
      // per-query top-k via the same sorted dedup merge ProbeMerge uses;
      // map-side combining keeps the final shuffle at nq·k rows and the
      // driver receives only the ranked answers
      val ranked = perDoc.map { case ((qid, doc), slots) =>
        var s = 0.0
        var i = 0
        while (i < slots.length) {
          if (slots(i) != negInf) s += slots(i)
          i += 1
        }
        (qid, Array((doc, -s)))
      }.reduceByKey((a, b) => ProbeMerge.mergeTwo(a, b, k), p)
      ranked.collect().sortBy(_._1).flatMap { case (qid, top) =>
        top.iterator.zipWithIndex
          .map { case ((doc, d), i) => (qid, doc, d, (i + 1).toLong) }
      }
    }
  }
}
