package graft.index

import graft.functions.vectors._
import graft.operators.TopK
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Coarse-routed search over packed sign codes — the binary edition of the
  * IVF family (faiss IndexBinaryIVF semantics): Hamming-space k-majority
  * centroids route each query to its `nprobe` nearest clusters, and only
  * those clusters' packed codes pay the popcount scan.
  *
  * Training is Lloyd's with the L1/Hamming centroid update: assignment is
  * a map-side Hamming argmin over the broadcast centroid codes (ties →
  * lowest cid), and the recenter step takes the per-dimension MAJORITY of
  * member sign bits — the Hamming-space analog of the mean, computed from
  * the original float rows as "fraction of positive components > 1/2" with
  * one whole-vector mean aggregate per cluster (indicator sums are exact
  * integers in double, so centroid bits are deterministic; exact ties →
  * bit 0). Empty clusters keep their previous centroid.
  *
  * Scale shape mirrors [[KMeans]]/[[IvfIndex]]: centroids are KB-sized and
  * ship in closures; per iteration the corpus is scanned once map-side and
  * only O(C·d) aggregation state shuffles. At 100 TB you fit on a sample
  * and run one assignment pass over the full table. Probing at
  * nprobe = C degenerates to exact brute Hamming — the
  * `ann_hamming_ivf_exact` hash gate. */
object BinaryIvf {

  /** Trained model: packed centroid codes (driver-sized, C × d/64 longs)
    * and the coded, cluster-assigned corpus (id, code, cid). The coded
    * corpus rides on a cached plan pinned by [[build]]; call [[Model.unload]]
    * when done (mirroring the resident families) so repeated builds in one
    * session don't accumulate executor storage. */
  final case class Model(centroids: Array[Array[Long]], coded: DataFrame,
                         private val pinned: DataFrame) {
    def unload(): Unit = pinned.unpersist()
  }

  private def hamming(a: Array[Long], b: Array[Long]): Long = {
    val n = math.min(a.length, b.length)
    var acc = 0L
    var i = 0
    while (i < n) { acc += java.lang.Long.bitCount(a(i) ^ b(i)); i += 1 }
    acc
  }

  /** Map-side Hamming argmin assignment over the closure's centroid codes
    * (ties → lowest cid). Input must carry (id, vec, code). */
  private def assignCarry(coded: DataFrame,
                          cents: Array[Array[Long]]): DataFrame = {
    val argmin = udf { (code: Seq[Long]) =>
      val q = code.toArray
      var bestCid = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < cents.length) {
        val d = hamming(q, cents(c))
        if (d < bestD) { bestD = d; bestCid = c }
        c += 1
      }
      bestCid
    }
    coded.withColumn("cid", argmin(col("code")))
  }

  /** Train `c` Hamming-majority centroids with `iters` Lloyd iterations
    * and assign every row. `base` needs (id, vec); init = the sign codes
    * of the c smallest ids (deterministic). */
  def build(base: DataFrame, c: Int, iters: Int): Model = {
    val spark = base.sparkSession
    import spark.implicits._
    val coded = base
      .select(col("id"), col("vec"), vecSignPack(col("vec")).as("code"))
      .cache()
    var cents: Array[Array[Long]] = coded.orderBy("id").limit(c)
      .select(col("code")).as[Array[Long]].collect()
    require(cents.nonEmpty, "empty corpus")
    for (_ <- 0 until iters) {
      // per-dim fraction of positive components per cluster; majority =
      // fraction > 1/2 (indicator sums are exact in double → deterministic)
      val fractions = assignCarry(coded, cents)
        .withColumn("ind", transform(col("vec"),
          v => when(v > lit(0.0f), lit(1.0f)).otherwise(lit(0.0f))))
        .groupBy(col("cid"))
        .agg(graft.functions.VectorAggs.vecMean(col("ind")).as("frac"))
        .select(col("cid"), col("frac"))
        .as[(Int, Array[Float])].collect()
      val next = cents.map(identity) // empty clusters keep their centroid
      fractions.foreach { case (cid, frac) =>
        val packed = new Array[Long]((frac.length + 63) >>> 6)
        var i = 0
        while (i < frac.length) {
          if (frac(i) > 0.5f) packed(i >>> 6) |= 1L << (i & 63)
          i += 1
        }
        next(cid) = packed
      }
      cents = next
    }
    Model(cents, assignCarry(coded, cents).select("id", "code", "cid"), coded)
  }

  /** Route each query to its `nprobe` Hamming-nearest centroids ((hd asc,
    * cid asc)) and scan ONLY those clusters; exact popcount ranking within
    * the probed set, (dist asc, id asc). nprobe = C probes everything —
    * exact brute Hamming. Returns (qid, id, dist, rank). */
  def probe(model: Model, queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val cents = model.centroids
    val np = math.max(1, math.min(nprobe, cents.length))
    val route = udf { (code: Seq[Long]) =>
      val q = code.toArray
      cents.indices
        .map(c => (hamming(q, cents(c)), c))
        .sorted.take(np).map(_._2).toArray
    }
    val qCoded = queries
      .select(col("qid"), vecSignPack(col("qvec")).as("qcode"))
      .withColumn("cid", explode(route(col("qcode"))))
    val scored = model.coded.join(broadcast(qCoded), Seq("cid"))
      .withColumn("dist", vecHamming(col("qcode"), col("code")))
    TopK.aggTopK(scored, "qid", "id", "dist", k)
  }
}
