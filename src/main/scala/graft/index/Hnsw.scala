package graft.index

import scala.collection.mutable

/** Compact single-threaded HNSW graph index over float vectors — the
  * partition-local ANN structure probed inside `mapPartitions` (see
  * [[HnswKnn]]). Freshly implemented from the HNSW paper's algorithm
  * (Malkov & Yashunin 2016); the reference embeds a heavily modified
  * hnswlib (/root/reference/filter/hnsw/hnswalg.h) whose semantics —
  * leveled small-world graph, ef-bounded best-first search, and a
  * predicate gate on result admission (hnswalg.h:618-703's filter functor)
  * — this reproduces in plain Scala.
  *
  * Design notes:
  *  - levels are drawn from the standard exponential distribution with a
  *    deterministic per-id seed, so builds are reproducible;
  *  - the predicate gates result ADMISSION, not traversal (the reference's
  *    one-stage search, bindings.cpp:724-841, walks through blocked nodes
  *    and re-ranks candidates at the end — post-filtering during traversal
  *    keeps the graph connected under selective filters);
  *  - single-threaded by design: parallelism comes from Spark partitioning,
  *    not intra-index threads (the reference's per-query OMP=1 choice,
  *    faiss.py:374, makes the same call).
  */
final class HnswIndex(m: Int = 16, efConstruction: Int = 100) {
  private val maxM = m
  private val maxM0 = 2 * m
  private val levelMult = 1.0 / math.log(m.toDouble)

  private val ids = mutable.ArrayBuffer.empty[Long]
  private val vecs = mutable.ArrayBuffer.empty[Array[Float]]
  private val levels = mutable.ArrayBuffer.empty[Int]
  // links(node)(level) = neighbor node indices
  private val links = mutable.ArrayBuffer.empty[Array[mutable.ArrayBuffer[Int]]]
  private var entryPoint = -1
  private var maxLevel = -1

  def size: Int = ids.length

  private def dist(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1 }
    acc
  }

  private def randomLevel(id: Long): Int = {
    val rng = new java.util.Random(id * 2654435761L + 987654321L)
    val u = math.max(rng.nextDouble(), 1e-12)
    (-math.log(u) * levelMult).toInt
  }

  /** Best-first search on one layer from `ep`, beam width `ef`.
    * Returns (nodeIdx, dist) ascending by dist, at most ef entries. */
  private def searchLayer(q: Array[Float], ep: Int, ef: Int, level: Int): mutable.ArrayBuffer[(Int, Double)] = {
    val visited = mutable.HashSet[Int](ep)
    val epDist = dist(q, vecs(ep))
    // candidates: min-heap by dist; results: max-heap by dist (bounded by ef)
    implicit val ordAsc: Ordering[(Int, Double)] = Ordering.by[(Int, Double), Double](_._2).reverse
    val candidates = mutable.PriorityQueue[(Int, Double)]((ep, epDist))
    val results = mutable.PriorityQueue[(Int, Double)]((ep, epDist))(Ordering.by(_._2))
    while (candidates.nonEmpty) {
      val (c, cDist) = candidates.dequeue()
      if (cDist > results.head._2 && results.size >= ef) {
        candidates.clear()
      } else {
        val neigh = if (level < links(c).length) links(c)(level) else mutable.ArrayBuffer.empty[Int]
        var i = 0
        while (i < neigh.length) {
          val e = neigh(i)
          if (!visited.contains(e)) {
            visited += e
            val d = dist(q, vecs(e))
            if (results.size < ef || d < results.head._2) {
              candidates.enqueue((e, d))
              results.enqueue((e, d))
              if (results.size > ef) results.dequeue()
            }
          }
          i += 1
        }
      }
    }
    val out = mutable.ArrayBuffer.from(results)
    out.sortInPlaceBy(_._2)
  }

  /** Greedy single-step descent used on layers above the target. */
  private def greedyStep(q: Array[Float], start: Int, level: Int): Int = {
    var cur = start
    var curDist = dist(q, vecs(cur))
    var improved = true
    while (improved) {
      improved = false
      val neigh = if (level < links(cur).length) links(cur)(level) else mutable.ArrayBuffer.empty[Int]
      var i = 0
      while (i < neigh.length) {
        val d = dist(q, vecs(neigh(i)))
        if (d < curDist) { curDist = d; cur = neigh(i); improved = true }
        i += 1
      }
    }
    cur
  }

  def add(id: Long, vec: Array[Float]): Unit = {
    val node = ids.length
    val level = randomLevel(id)
    ids += id; vecs += vec; levels += level
    links += Array.fill(level + 1)(mutable.ArrayBuffer.empty[Int])
    if (entryPoint < 0) { entryPoint = node; maxLevel = level; return }

    var ep = entryPoint
    var l = maxLevel
    while (l > level) { ep = greedyStep(vec, ep, l); l -= 1 }
    l = math.min(level, maxLevel)
    while (l >= 0) {
      val found = searchLayer(vec, ep, efConstruction, l)
      val cap = if (l == 0) maxM0 else maxM
      val selected = found.take(m)
      val lst = links(node)(l)
      selected.foreach { case (n, _) =>
        if (n != node) {
          lst += n
          val back = links(n)(l)
          back += node
          if (back.length > cap) {
            // prune to the cap closest neighbors of n
            val pruned = back.map(x => (x, dist(vecs(n), vecs(x)))).sortInPlaceBy(_._2).take(cap).map(_._1)
            links(n)(l) = pruned
          }
        }
      }
      ep = if (found.nonEmpty) found.head._1 else ep
      l -= 1
    }
    if (level > maxLevel) { maxLevel = level; entryPoint = node }
  }

  /** Top-k search with an optional admission predicate on row ids. The
    * beam explores `ef` candidates regardless of the predicate; only
    * admitted ids reach the result (the reference's functor gate). */
  def search(q: Array[Float], k: Int, ef: Int,
             allowed: Long => Boolean = _ => true): Array[(Long, Double)] = {
    if (entryPoint < 0) return Array.empty
    var ep = entryPoint
    var l = maxLevel
    while (l > 0) { ep = greedyStep(q, ep, l); l -= 1 }
    val found = searchLayer(q, ep, math.max(ef, k), 0)
    found.iterator
      .map { case (n, d) => (ids(n), d) }
      .filter { case (id, _) => allowed(id) }
      .take(k)
      .toArray
  }
}
