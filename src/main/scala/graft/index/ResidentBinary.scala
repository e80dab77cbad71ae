package graft.index

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** One executor-resident shard of packed sign codes: parallel arrays of row
  * ids and their [[graft.functions.VecSignPack]] codes (one long per 64
  * dims — a 64-d float row is ONE machine word here, 32× smaller than the
  * float form a [[ScanShard]] pins). `vecs` is empty unless the shard was
  * loaded with `pinFloats` for the two-tier re-rank probe (the
  * [[ResidentAdc]] codes-plus-refine layout, binary edition). */
final case class BinaryShard(ids: Array[Long], codes: Array[Array[Long]],
                             vecs: Array[Array[Float]])

/** Executor-resident EXACT Hamming serving over packed sign codes — the
  * faiss IndexBinaryFlat serving shape: the whole corpus pins as machine
  * words, a probe batch is one broadcast + one narrow job, and the per-pair
  * kernel is XOR+popcount. Results equal
  * [[graft.operators.Knn.knnHamming]] row-for-row (integer distances, no
  * rounding anywhere; ranking (dist asc, id asc)).
  *
  * Scale story: the binary tier is the cheapest resident scan there is —
  * at 100 TB of float vectors the packed corpus is ~3 TB, so a modest
  * cluster pins ALL of it and brute-scans exactly; shards are the
  * scale-out axis and k·nq·P candidates merge through the same two-level
  * [[ProbeMerge]] as every other resident form. Typical use: binary
  * first-pass retrieval feeding a float re-rank (the candidates-first
  * pattern of [[graft.operators.Dedup.embedNearDups]]). */
final class ResidentBinary(spark: SparkSession, rdd: RDD[BinaryShard]) {

  /** Serving-form batch probe: `qs` = (qid, packed query code). Returns
    * (qid, id, dist, rank) sorted by (qid, rank); dist is the integer
    * Hamming distance carried as double (≤ dim, exact). */
  def probeBatch(qs: Array[(Long, Array[Long])], k: Int,
                 treeMergeAt: Int = 64): Array[(Long, Long, Double, Long)] = {
    val bq = spark.sparkContext.broadcast(qs)
    val local = rdd.flatMap { shard =>
      val n = shard.ids.length
      bq.value.iterator.flatMap { case (qid, qc) =>
        val bd = new Array[Double](k)
        val bi = new Array[Long](k)
        var filled = 0
        var r = 0
        while (r < n) {
          val c = shard.codes(r)
          val w = math.min(qc.length, c.length)
          var acc = 0L
          var i = 0
          while (i < w) {
            acc += java.lang.Long.bitCount(qc(i) ^ c(i))
            i += 1
          }
          val d = acc.toDouble
          val id = shard.ids(r)
          if (filled < k || d < bd(filled - 1) ||
              (d == bd(filled - 1) && id < bi(filled - 1))) {
            var pos = math.min(filled, k - 1)
            while (pos > 0 && (bd(pos - 1) > d ||
                   (bd(pos - 1) == d && bi(pos - 1) > id))) {
              bd(pos) = bd(pos - 1); bi(pos) = bi(pos - 1); pos -= 1
            }
            bd(pos) = d; bi(pos) = id
            if (filled < k) filled += 1
          }
          r += 1
        }
        (0 until filled).iterator.map(i => (qid, bi(i), bd(i)))
      }
    }
    val out = ProbeMerge.topK(local, k, treeMergeAt,
      estRows = qs.length.toLong * k * local.getNumPartitions)
    bq.destroy()
    out
  }

  /** Two-tier serving probe: per shard, the packed codes pick the `c`
    * Hamming-nearest candidates ((hd asc, id asc) — the same deterministic
    * rule as [[graft.operators.Knn.knnHammingRerank]]), then ONLY those c
    * rows pay the float L2 kernel in-shard and the per-shard float top-k
    * merges as usual. Requires `pinFloats` at load.
    *
    * Candidate relationship to the dataflow form: the global Hamming top-c
    * is contained in the union of per-shard Hamming top-c's, so the served
    * candidate pool is a SUPERSET of the dataflow's and its fidelity to
    * exact float kNN is ≥ the dataflow's at equal c (spec-asserted); at
    * c ≥ max shard population the result IS exact float kNN (the
    * `knn_hamming_rerank_served_exact` hash gate). `qs` = (qid, packed
    * code, float query). Returns (qid, id, float dist, rank). */
  def probeBatchRerank(qs: Array[(Long, Array[Long], Array[Float])], k: Int,
                       c: Int, treeMergeAt: Int = 64,
                       metric: String = graft.operators.Metric.L2): Array[(Long, Long, Double, Long)] = {
    require(c >= k, s"rerank budget c=$c must be >= k=$k")
    // tier 2's float kernel: L2 or negated inner product (the OOD track's
    // metric — text2image-style corpora rerank by ip, and the binary tier
    // is metric-blind so only this refine step changes)
    val ip = metric == graft.operators.Metric.Ip
    val bq = spark.sparkContext.broadcast(qs)
    val local = rdd.flatMap { shard =>
      require(shard.vecs.nonEmpty || shard.ids.isEmpty,
        "probeBatchRerank needs pinFloats=true at load")
      val n = shard.ids.length
      // per-shard budget never exceeds the shard population (c = ∞ is the
      // exact-degenerate point, not a giant allocation)
      val cc = math.max(1, math.min(c, n))
      if (n == 0) Iterator.empty
      else bq.value.iterator.flatMap { case (qid, qc, qv) =>
        // tier 1: Hamming top-c over packed codes (insertion buffer)
        val cd = new Array[Long](cc)
        val ci = new Array[Int](cc) // shard-local row index, resolves floats
        var filled = 0
        var r = 0
        while (r < n) {
          val code = shard.codes(r)
          val w = math.min(qc.length, code.length)
          var hd = 0L
          var i = 0
          while (i < w) { hd += java.lang.Long.bitCount(qc(i) ^ code(i)); i += 1 }
          val id = shard.ids(r)
          if (filled < cc || hd < cd(filled - 1) ||
              (hd == cd(filled - 1) && id < shard.ids(ci(filled - 1)))) {
            var pos = math.min(filled, cc - 1)
            while (pos > 0 && (cd(pos - 1) > hd ||
                   (cd(pos - 1) == hd && shard.ids(ci(pos - 1)) > id))) {
              cd(pos) = cd(pos - 1); ci(pos) = ci(pos - 1); pos -= 1
            }
            cd(pos) = hd; ci(pos) = r
            if (filled < cc) filled += 1
          }
          r += 1
        }
        // tier 2: exact float L2 on the survivors only, top-k
        val bd = new Array[Double](k)
        val bi = new Array[Long](k)
        var kept = 0
        var s = 0
        while (s < filled) {
          val row = ci(s)
          val v = shard.vecs(row)
          val d0 = math.min(qv.length, v.length)
          var acc = 0.0
          var i = 0
          if (ip) {
            while (i < d0) { acc -= qv(i).toDouble * v(i).toDouble; i += 1 }
          } else {
            while (i < d0) {
              val d = qv(i).toDouble - v(i).toDouble; acc += d * d; i += 1
            }
          }
          val id = shard.ids(row)
          if (kept < k || acc < bd(kept - 1) ||
              (acc == bd(kept - 1) && id < bi(kept - 1))) {
            var pos = math.min(kept, k - 1)
            while (pos > 0 && (bd(pos - 1) > acc ||
                   (bd(pos - 1) == acc && bi(pos - 1) > id))) {
              bd(pos) = bd(pos - 1); bi(pos) = bi(pos - 1); pos -= 1
            }
            bd(pos) = acc; bi(pos) = id
            if (kept < k) kept += 1
          }
          s += 1
        }
        (0 until kept).iterator.map(i => (qid, bi(i), bd(i)))
      }
    }
    val out = ProbeMerge.topK(local, k, treeMergeAt,
      estRows = qs.length.toLong * k * local.getNumPartitions)
    bq.destroy()
    out
  }

  /** [[probeBatchRerank]] with DataFrame plumbing: `queries` needs
    * (qid, qvec). */
  def probeLocalRerank(queries: DataFrame, k: Int, c: Int,
                       metric: String = graft.operators.Metric.L2): DataFrame = {
    import graft.functions.vectors._
    import spark.implicits._
    val qs = queries
      .select(col("qid").cast("long"), vecSignPack(col("qvec")).as("qcode"),
        col("qvec"))
      .as[(Long, Array[Long], Array[Float])].collect()
    spark.createDataFrame(probeBatchRerank(qs, k, c, metric = metric).toSeq)
      .toDF("qid", "id", "dist", "rank")
  }

  /** [[probeBatch]] with DataFrame plumbing: `queries` needs (qid, qvec);
    * packing happens here, results equal
    * [[graft.operators.Knn.knnHamming]]. */
  def probeLocal(queries: DataFrame, k: Int): DataFrame = {
    import graft.functions.vectors._
    import spark.implicits._
    val qs = queries
      .select(col("qid").cast("long"), vecSignPack(col("qvec")).as("qcode"))
      .as[(Long, Array[Long])].collect()
    spark.createDataFrame(probeBatch(qs, k).toSeq)
      .toDF("qid", "id", "dist", "rank")
  }

  def unload(): Unit = rdd.unpersist()
}

object ResidentBinary {
  /** Pack and pin a float corpus — (id, vec) — as resident binary shards.
    * Build once, probe many. `pinFloats` additionally pins the float rows
    * next to their codes for [[ResidentBinary.probeBatchRerank]] (the
    * codes-plus-refine layout; without it only the 32×-compressed codes
    * occupy memory). */
  def load(base: DataFrame, numPartitions: Int,
           pinFloats: Boolean = false): ResidentBinary = {
    import graft.functions.vectors._
    val spark = base.sparkSession
    import spark.implicits._
    // codes-only loads never shuffle the float rows — only the 32×-packed
    // codes cross the exchange
    val rdd = (if (pinFloats)
      base.select(col("id").cast("long"), vecSignPack(col("vec")).as("code"),
          col("vec"))
        .repartition(numPartitions, col("id"))
        .as[(Long, Array[Long], Array[Float])].rdd
    else
      base.select(col("id").cast("long"), vecSignPack(col("vec")).as("code"))
        .repartition(numPartitions, col("id"))
        .as[(Long, Array[Long])].rdd
        .map { case (id, code) => (id, code, null: Array[Float]) })
      .mapPartitions { it =>
        val rows = it.toArray
        Iterator.single(BinaryShard(rows.map(_._1), rows.map(_._2),
          if (pinFloats) rows.map(_._3) else Array.empty))
      }
      .persist(StorageLevel.MEMORY_AND_DISK)
    rdd.count() // materialize the shards before the first probe
    new ResidentBinary(spark, rdd)
  }
}
