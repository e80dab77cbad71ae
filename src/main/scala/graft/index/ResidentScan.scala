package graft.index

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** One executor-resident corpus shard in struct-of-arrays form: parallel
  * arrays over the shard's rows. The layout a scan server keeps hot in RAM
  * (the reference's filter track pins the float matrix + CSR tag postings +
  * per-row signatures in process memory, faiss.py:97-124,369-371). */
final case class ScanShard(ids: Array[Long], vecs: Array[Array[Float]],
                           tags: Array[Array[Int]], sigs: Array[Long])

/** Executor-resident EXACT filtered-kNN serving: the corpus is pinned once
  * as [[ScanShard]] partitions; each query batch is one broadcast + one
  * narrow job; per-shard bounded top-k candidates merge driver-side. This is
  * the serving shape of the filter track — same results as
  * [[graft.operators.TagFilter.filteredKnn]] (signature test is lossless,
  * distances are the same double kernels), but a probe batch never touches
  * parquet, never shuffles, and pays exactly one stage.
  *
  * Scale story: shards ARE the scale-out axis (1000 executors pin 1000
  * shards); queries broadcast (small by workload definition); k·nq·P
  * candidate rows return — the classic distributed serving fan-out. The
  * signature prefilter does the reference's bloom-skip work
  * (bow_id_selector.swig:107-130) before any distance is computed. */
final class ResidentScan(spark: SparkSession, rdd: RDD[ScanShard],
                         ipMetric: Boolean) {

  /** Serving-form batch probe. `qs` rows are (qid, qvec, qtags, qsig) with
    * qsig = OR of the query tags' signatures (same bit layout as the base
    * side — build with [[graft.operators.TagFilter.withSignature]]).
    * Returns (qid, id, dist, rank) sorted by (qid, rank); ranking is
    * (dist asc, id asc), identical to the dataflow path. */
  def probeBatch(qs: Array[(Long, Array[Float], Array[Int], Long)],
                 k: Int,
                 treeMergeAt: Int = 64): Array[(Long, Long, Double, Long)] = {
    val bq = spark.sparkContext.broadcast(qs)
    val ip = ipMetric
    val local = rdd.flatMap { shard =>
      val queries = bq.value
      val n = shard.ids.length
      queries.iterator.flatMap { case (qid, qv, qt, qsig) =>
        // bounded worst-first insertion buffer: k is small (typically 10),
        // so an insertion sort beats a heap on constant factors
        val bd = new Array[Double](k)
        val bi = new Array[Long](k)
        var filled = 0
        var r = 0
        while (r < n) {
          if ((qsig & ~shard.sigs(r)) == 0L) { // lossless bloom-skip
            val rowTags = shard.tags(r)
            var ti = 0
            var all = true
            while (all && ti < qt.length) {
              if (!rowTags.contains(qt(ti))) all = false
              ti += 1
            }
            if (all) {
              // same double accumulation as the codegen kernels
              val v = shard.vecs(r)
              val d0 = math.min(qv.length, v.length)
              var acc = 0.0
              var i = 0
              if (ip) {
                while (i < d0) { acc += qv(i).toDouble * v(i).toDouble; i += 1 }
                acc = -acc
              } else {
                while (i < d0) {
                  val d = qv(i).toDouble - v(i).toDouble; acc += d * d; i += 1
                }
              }
              val id = shard.ids(r)
              if (filled < k || acc < bd(filled - 1) ||
                  (acc == bd(filled - 1) && id < bi(filled - 1))) {
                var pos = math.min(filled, k - 1)
                while (pos > 0 && (bd(pos - 1) > acc ||
                       (bd(pos - 1) == acc && bi(pos - 1) > id))) {
                  bd(pos) = bd(pos - 1); bi(pos) = bi(pos - 1); pos -= 1
                }
                bd(pos) = acc; bi(pos) = id
                if (filled < k) filled += 1
              }
            }
          }
          r += 1
        }
        (0 until filled).iterator.map(i => (qid, bi(i), bd(i)))
      }
    }
    // driver merge at serving partition counts, two-level tree past
    // `treeMergeAt` shards (ProbeMerge) — identical rows either way
    val out = ProbeMerge.topK(local, k, treeMergeAt,
      estRows = qs.length.toLong * k * local.getNumPartitions)
    bq.destroy() // serving loop: don't accumulate per-batch broadcasts
    out
  }

  /** Exact top-k over the rows whose id falls in one of `ranges` (disjoint,
    * sorted by start) — the serving form of a runbook checkpoint: the live
    * set travels as an O(#ops) range mask, the corpus stays pinned. Tags
    * and signatures are ignored; ranking is (dist asc, id asc), identical
    * to [[graft.operators.Knn.knnJoin]]. */
  def probeBatchRanges(qs: Array[(Long, Array[Float])], k: Int,
                       ranges: Array[(Long, Long)],
                       treeMergeAt: Int = 64): Array[(Long, Long, Double, Long)] = {
    val bq = spark.sparkContext.broadcast(qs)
    val br = spark.sparkContext.broadcast(ranges)
    val ip = ipMetric
    val local = rdd.flatMap { shard =>
      val mask = br.value
      val starts = mask.map(_._1)
      def liveId(id: Long): Boolean = {
        var p = java.util.Arrays.binarySearch(starts, id)
        if (p < 0) p = -p - 2 // last range starting at or before id
        p >= 0 && id < mask(p)._2
      }
      val n = shard.ids.length
      bq.value.iterator.flatMap { case (qid, qv) =>
        val bd = new Array[Double](k)
        val bi = new Array[Long](k)
        var filled = 0
        var r = 0
        while (r < n) {
          val id = shard.ids(r)
          if (liveId(id)) {
            val v = shard.vecs(r)
            val d0 = math.min(qv.length, v.length)
            var acc = 0.0
            var i = 0
            if (ip) {
              while (i < d0) { acc += qv(i).toDouble * v(i).toDouble; i += 1 }
              acc = -acc
            } else {
              while (i < d0) {
                val d = qv(i).toDouble - v(i).toDouble; acc += d * d; i += 1
              }
            }
            if (filled < k || acc < bd(filled - 1) ||
                (acc == bd(filled - 1) && id < bi(filled - 1))) {
              var pos = math.min(filled, k - 1)
              while (pos > 0 && (bd(pos - 1) > acc ||
                     (bd(pos - 1) == acc && bi(pos - 1) > id))) {
                bd(pos) = bd(pos - 1); bi(pos) = bi(pos - 1); pos -= 1
              }
              bd(pos) = acc; bi(pos) = id
              if (filled < k) filled += 1
            }
          }
          r += 1
        }
        (0 until filled).iterator.map(i => (qid, bi(i), bd(i)))
      }
    }
    val out = ProbeMerge.topK(local, k, treeMergeAt,
      estRows = qs.length.toLong * k * local.getNumPartitions)
    bq.destroy(); br.destroy()
    out
  }

  /** [[probeBatch]] with DataFrame plumbing on both ends; results equal
    * [[graft.operators.TagFilter.filteredKnn]] row-for-row. `queries`
    * needs (qid, qvec, qtags, qsig). */
  def probeLocal(queries: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    val qs = queries
      .select(col("qid").cast("long"), col("qvec"), col("qtags"),
        col("qsig").cast("long"))
      .as[(Long, Array[Float], Array[Int], Long)].collect()
    spark.createDataFrame(probeBatch(qs, k).toSeq)
      .toDF("qid", "id", "dist", "rank")
  }

  def unload(): Unit = rdd.unpersist()
}

object ResidentScan {
  /** Pin a tagged corpus — (id, vec, tags) — as resident scan shards with
    * precomputed signatures. Build once, probe many. */
  def load(base: DataFrame, numPartitions: Int,
           metric: String = graft.operators.Metric.L2): ResidentScan = {
    val spark = base.sparkSession
    import spark.implicits._
    val ip = metric match {
      case graft.operators.Metric.L2 => false
      case graft.operators.Metric.Ip => true
      case other => throw new IllegalArgumentException(
        s"ResidentScan supports l2 | ip, got $other")
    }
    val rdd = graft.operators.TagFilter.withSignature(base, "tags")
      .select(col("id").cast("long"), col("vec"), col("tags"),
        col("sig").cast("long"))
      .repartition(numPartitions, col("id"))
      .as[(Long, Array[Float], Array[Int], Long)].rdd
      .mapPartitions { it =>
        val rows = it.toArray
        Iterator.single(ScanShard(rows.map(_._1), rows.map(_._2),
          rows.map(_._3), rows.map(_._4)))
      }
      .persist(StorageLevel.MEMORY_AND_DISK)
    rdd.count() // materialize the shards before the first probe
    new ResidentScan(spark, rdd, ip)
  }
}
