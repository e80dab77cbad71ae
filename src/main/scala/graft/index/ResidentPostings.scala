package graft.index

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** One executor-resident inverted-index shard: dim → (ids, vals) posting
  * arrays over the shard's documents. Postings are already budget-truncated
  * (top-m per dim GLOBALLY, before sharding), so a shard holds each of its
  * docs' surviving postings in full — per-shard scores are complete, never
  * partial, and the driver merge is a plain top-k over per-shard top-ks. */
final case class PostingShard(index: Map[String, (Array[Long], Array[Long])])

/** Executor-resident budgeted sparse MIPS serving — the linscan serving
  * shape (/root/reference/sparse/linscan/linscan.py:19-56: an in-memory
  * inverted index answering query batches), re-expressed as pinned posting
  * shards: build once ([[ResidentPostings.load]] truncates postings to the
  * budget and pins them id-sharded), then each query batch is one broadcast
  * + one narrow job + a driver-side bounded merge. Results equal
  * [[graft.operators.Sparse.budgetedMips]] row-for-row at the same `m`
  * (same integer scores, same (score desc, id asc) ranking) — asserted in
  * SparseSpec — but a probe batch never touches parquet and never shuffles.
  *
  * Scale story: shards are the scale-out axis (docs hash across executors;
  * per-dim postings are bounded by the budget so no shard inherits a hot
  * dim's full fan-out); queries broadcast (small by workload definition);
  * k·nq·P candidate rows return. Same serving economics as
  * [[ResidentScan]] / resident graph probes. */
final class ResidentPostings(spark: SparkSession, rdd: RDD[PostingShard]) {

  /** Serving-form batch probe: `qs` rows are (qid, dims, weights) — the
    * long-form query vector zipped into parallel arrays. Returns
    * (qid, id, score, rank) sorted by (qid, rank); only docs sharing at
    * least one surviving posting dim with the query appear (join
    * semantics, like the dataflow path). */
  def probeBatch(qs: Array[(Long, Array[String], Array[Long])],
                 k: Int,
                 treeMergeAt: Int = 64): Array[(Long, Long, Long, Long)] = {
    val bq = spark.sparkContext.broadcast(qs)
    val local = rdd.flatMap { shard =>
      bq.value.iterator.flatMap { case (qid, qdims, qvs) =>
        val acc = scala.collection.mutable.LongMap.empty[Long] // id → score
        var i = 0
        while (i < qdims.length) {
          shard.index.get(qdims(i)) match {
            case Some((ids, vals)) =>
              val qv = qvs(i)
              var j = 0
              while (j < ids.length) {
                acc(ids(j)) = acc.getOrElse(ids(j), 0L) + qv * vals(j)
                j += 1
              }
            case None =>
          }
          i += 1
        }
        // bounded best-first insertion buffer on (score desc, id asc):
        // k is small, insertion sort beats a heap on constant factors
        val bs = new Array[Long](k)
        val bi = new Array[Long](k)
        var filled = 0
        acc.foreachEntry { (id, s) =>
          if (filled < k || s > bs(filled - 1) ||
              (s == bs(filled - 1) && id < bi(filled - 1))) {
            var pos = math.min(filled, k - 1)
            while (pos > 0 && (bs(pos - 1) < s ||
                   (bs(pos - 1) == s && bi(pos - 1) > id))) {
              bs(pos) = bs(pos - 1); bi(pos) = bi(pos - 1); pos -= 1
            }
            bs(pos) = s; bi(pos) = id
            if (filled < k) filled += 1
          }
        }
        (0 until filled).iterator.map(i => (qid, bi(i), bs(i)))
      }
    }
    // (score desc, id asc) merge in exact Long arithmetic: driver merge at
    // serving shard counts, two-level tree past `treeMergeAt` (ProbeMerge)
    val out = ProbeMerge.topKByScore(local, k, treeMergeAt)
    bq.destroy() // serving loop: don't accumulate per-batch broadcasts
    out
  }

  /** [[probeBatch]] with DataFrame plumbing on both ends; `queries` is the
    * long-form (qid, dim, qv) the dataflow path takes. Results equal
    * `Sparse.budgetedMips(queries, base, k, m)` row-for-row. */
  def probeLocal(queries: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    val qs = queries
      .select(col("qid").cast("long"), col("dim").cast("string"),
        col("qv").cast("long"))
      .as[(Long, String, Long)].collect()
      .groupBy(_._1).toArray.sortBy(_._1)
      .map { case (qid, rows) =>
        (qid, rows.map(_._2), rows.map(_._3))
      }
    spark.createDataFrame(probeBatch(qs, k).toSeq)
      .toDF("qid", "id", "score", "rank")
  }

  def unload(): Unit = rdd.unpersist()
}

object ResidentPostings {
  /** Pin a budget-truncated inverted index over `base` = (id, dim, v)
    * long-form sparse vectors: top-`m` postings per dim (the
    * [[graft.operators.Sparse.truncatePostings]] bound), hash-sharded by
    * doc id into `numPartitions` resident shards. Build once, probe many. */
  def load(base: DataFrame, m: Int, numPartitions: Int): ResidentPostings = {
    val spark = base.sparkSession
    import spark.implicits._
    val rdd = graft.operators.Sparse.truncatePostings(base, m)
      .select(col("id").cast("long"), col("dim").cast("string"),
        col("v").cast("long"))
      .repartition(numPartitions, col("id"))
      .as[(Long, String, Long)].rdd
      .mapPartitions { it =>
        val acc = scala.collection.mutable.HashMap
          .empty[String, (scala.collection.mutable.ArrayBuffer[Long],
                          scala.collection.mutable.ArrayBuffer[Long])]
        it.foreach { case (id, dim, v) =>
          val (ids, vals) = acc.getOrElseUpdate(dim,
            (scala.collection.mutable.ArrayBuffer.empty[Long],
             scala.collection.mutable.ArrayBuffer.empty[Long]))
          ids += id; vals += v
        }
        Iterator.single(PostingShard(acc.iterator.map { case (d, (ids, vals)) =>
          d -> (ids.toArray, vals.toArray)
        }.toMap))
      }
      .persist(StorageLevel.MEMORY_AND_DISK)
    rdd.count() // materialize the shards before the first probe
    new ResidentPostings(spark, rdd)
  }
}
