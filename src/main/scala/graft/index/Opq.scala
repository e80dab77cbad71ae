package graft.index

import graft.functions.vectors._
import graft.operators.{Metric, TopK}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OPQ-style rotation for product quantization — the parametric
  * "eigenvalue allocation" variant of Optimized Product Quantization
  * (Ge et al., CVPR 2013): PCA-rotate vectors so the coordinates are
  * decorrelated, then PERMUTE the principal components so each PQ subspace
  * receives a balanced share of the total variance (components are dealt
  * greedily to the subspace with the smallest log-variance sum). Plain PQ
  * quantizes whatever correlated dims the original layout happens to group
  * together — redundant coordinates burn codebook budget re-encoding the
  * same information in every subspace; after rotation each subspace
  * carries independent information, so the same (m, ksub) budget buys
  * strictly more precision on correlated corpora (OpqSpec constructs one
  * and asserts the recall ordering).
  *
  * Everything here is public knowledge: the OPQ paper, standard PCA, and
  * cyclic Jacobi eigendecomposition. The reference has no rotation stage
  * (its baseline is IVF+SQ8, filter/faiss/config.yaml:50-53) — this is a
  * beyond-reference extension of the PQ family.
  *
  * Spark shape: the covariance is ONE treeAggregate pass producing a d×d
  * double matrix (embedding dims are small — broadcast-sized); the
  * eigendecomposition is driver-local math (d ≤ a few hundred); the
  * rotation itself is a map-side matrix·vector projection. At 100 TB you
  * estimate the covariance on a sample — the same note as [[KMeans]] —
  * and the rotation matrix still broadcasts in KBs.
  *
  * Exactness structure: the ADC scan runs in ROTATED space, but the final
  * re-rank recomputes exact distances against the ORIGINAL floats, so with
  * a lossless rotated codebook the top-k hash-matches the brute-force
  * oracle (rotation preserves L2 up to float epsilon — far below the
  * candidate margin at rerank ≥ 2k — and the reported distances are the
  * original-space kernel's, bit-identical to [[graft.operators.Knn]]).
  */
object Opq {

  /** An orthonormal rotation, rows = permuted principal components. */
  final case class Rotation(rows: Array[Array[Float]]) {
    def d: Int = rows.length
    def apply(v: Array[Float]): Array[Float] = {
      val out = new Array[Float](rows.length)
      var r = 0
      while (r < rows.length) {
        val row = rows(r)
        var acc = 0.0
        val n = math.min(row.length, v.length)
        var i = 0
        while (i < n) { acc += row(i).toDouble * v(i).toDouble; i += 1 }
        out(r) = acc.toFloat
        r += 1
      }
      out
    }
  }

  /** Map-side projection column: vec → R·vec. */
  def rotateCol(rot: Rotation, vecCol: Column): Column = {
    val u = udf { (v: Seq[Float]) => rot(v.toArray) }
    u(vecCol)
  }

  /** Sample covariance in one treeAggregate pass (upper triangle
    * accumulated, mirrored at the end). d² doubles per accumulator —
    * broadcast-sized for embedding dims. */
  private[graft] def covariance(base: DataFrame): Array[Array[Double]] = {
    val spark = base.sparkSession
    import spark.implicits._
    val d = base.select(size(col("vec"))).head().getInt(0)
    val vecs = base.select(col("vec")).as[Array[Float]].rdd
    val (n, s, ss) = vecs.treeAggregate((0L, new Array[Double](d), new Array[Double](d * d)))(
      { case ((cnt, sum, ssum), v) =>
        var i = 0
        while (i < d) {
          val vi = v(i).toDouble
          sum(i) += vi
          var j = i
          while (j < d) { ssum(i * d + j) += vi * v(j).toDouble; j += 1 }
          i += 1
        }
        (cnt + 1, sum, ssum)
      },
      { case ((c1, s1, ss1), (c2, s2, ss2)) =>
        var i = 0
        while (i < d) { s1(i) += s2(i); i += 1 }
        i = 0
        while (i < d * d) { ss1(i) += ss2(i); i += 1 }
        (c1 + c2, s1, ss1)
      })
    require(n > 0, "covariance of an empty corpus")
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = ss(i * d + j) / n - (s(i) / n) * (s(j) / n)
        cov(i)(j) = c
        cov(j)(i) = c
        j += 1
      }
      i += 1
    }
    cov
  }

  /** Deterministic cyclic Jacobi eigendecomposition of a symmetric matrix:
    * (eigenvalues, eigenvectors as rows), sorted by eigenvalue descending
    * (ties to the lower original index), each vector's sign fixed so its
    * largest-magnitude entry is positive. Driver-local; O(d³) per sweep,
    * fine for embedding dims. */
  private[graft] def jacobiEig(aIn: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = aIn.length
    val a = Array.tabulate(d, d)((i, j) => aIn(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offNorm: Double = {
      var s = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) { s += a(p)(q) * a(p)(q); q += 1 }
        p += 1
      }
      s
    }
    var sweep = 0
    while (sweep < 64 && offNorm > 1e-18) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 0) {
            val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(1 + theta * theta))
              else 1.0 / (theta - math.sqrt(1 + theta * theta))
            val c = 1.0 / math.sqrt(1 + t * t)
            val s = t * c
            var i = 0
            while (i < d) { // column rotation
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) { // row rotation
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
            i = 0
            while (i < d) { // accumulate eigenvectors (columns of v)
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val pairs = Array.tabulate(d) { c =>
      val vec = Array.tabulate(d)(r => v(r)(c))
      var mi = 0
      var i = 1
      while (i < d) { if (math.abs(vec(i)) > math.abs(vec(mi))) mi = i; i += 1 }
      if (vec(mi) < 0) { i = 0; while (i < d) { vec(i) = -vec(i); i += 1 } }
      (a(c)(c), c, vec)
    }
    val sorted = pairs.sortBy { case (ev, c, _) => (-ev, c) }
    (sorted.map(_._1), sorted.map(_._3))
  }

  /** Greedy eigenvalue allocation (the OPQ paper's balancing rule): deal
    * components in variance order to the subspace with the smallest
    * log-variance sum that still has room — the product of per-subspace
    * variances (∝ quantization distortion at equal ksub) ends up balanced.
    * Returns the component index order, grouped by subspace. */
  private[graft] def allocate(eigvals: Array[Double], m: Int): Array[Array[Int]] = {
    val d = eigvals.length
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val dsub = d / m
    val groups = Array.fill(m)(scala.collection.mutable.ArrayBuffer.empty[Int])
    val logSum = new Array[Double](m)
    var i = 0
    while (i < d) {
      var best = -1
      var g = 0
      while (g < m) {
        if (groups(g).length < dsub && (best < 0 || logSum(g) < logSum(best)))
          best = g
        g += 1
      }
      groups(best) += i
      logSum(best) += math.log(math.max(eigvals(i), 1e-12))
      i += 1
    }
    groups.map(_.toArray)
  }

  /** PCA + eigenvalue-allocation rotation for an m-subspace PQ. */
  def trainRotation(base: DataFrame, m: Int): Rotation = {
    val (eigvals, eigvecs) = jacobiEig(covariance(base))
    val order = allocate(eigvals, m).flatten
    Rotation(order.map(i => eigvecs(i).map(_.toFloat)))
  }

  /** Rotation + codebook trained on the rotated corpus. */
  def trainRotated(base: DataFrame, m: Int, ksub: Int, iters: Int): (Rotation, Pq.Codebook) = {
    val rot = trainRotation(base, m)
    val rbase = base.select(col("id"), rotateCol(rot, col("vec")).as("vec"))
    (rot, Pq.train(rbase, m, ksub, iters))
  }

  /** Rotation + lossless rotated codebook — the exact-degenerate gate path
    * (same construction as [[Pq.trainLossless]], in the rotated space). */
  def trainRotatedLossless(base: DataFrame, m: Int): (Rotation, Pq.Codebook) = {
    val rot = trainRotation(base, m)
    val rbase = base.select(col("id"), rotateCol(rot, col("vec")).as("vec"))
    (rot, Pq.trainLossless(rbase, m))
  }

  /** Rotated PQ-ADC kNN: encode and gather-score in the rotated space,
    * re-rank the `rerank` best EXACTLY against the original floats — the
    * reported distances are original-space, so the lossless gate
    * hash-matches the same oracle as [[graft.operators.Knn.knnJoin]].
    * Valid under L2 (‖R(q−x)‖ = ‖q−x‖) AND ip (⟨Rq, Rx⟩ = ⟨q, x⟩ — an
    * orthonormal rotation preserves inner products too). */
  def adcKnnRotated(queries: DataFrame, base: DataFrame, rot: Rotation,
                    cb: Pq.Codebook, k: Int, rerank: Int,
                    metric: String = Metric.L2): DataFrame = {
    val rbase = base.select(col("id"), rotateCol(rot, col("vec")).as("vec"))
    adcKnnRotatedCodes(queries, Pq.encode(rbase, cb).select("id", "codes"),
      base, rot, cb, k, rerank, metric)
  }

  /** [[adcKnnRotated]] over PRE-ENCODED rotated codes (the persisted-index
    * probe path — encoding happened at build time). */
  def adcKnnRotatedCodes(queries: DataFrame, codes: DataFrame,
                         base: DataFrame, rot: Rotation, cb: Pq.Codebook,
                         k: Int, rerank: Int,
                         metric: String = Metric.L2): DataFrame = {
    require(rerank >= k, s"rerank $rerank must be >= k $k")
    val q = queries.select(col("qid"),
      Pq.lutCol(rotateCol(rot, col("qvec")), cb, metric).as("lut"))
    val scored = codes.crossJoin(broadcast(q))
      .withColumn("dist", pqAdcDist(col("lut"), col("codes"), cb.stride))
    val cand = TopK.aggTopK(scored, "qid", "id", "dist", rerank).select("qid", "id")
    val exact = cand
      .join(base.select("id", "vec"), "id")
      .join(broadcast(queries.select("qid", "qvec")), "qid")
      .withColumn("dist", Metric.distColumn(metric, col("qvec"), col("vec")))
    TopK.aggTopK(exact, "qid", "id", "dist", k)
  }

  /** Persist a rotation as a tiny (r, rvec) parquet — KBs at any corpus
    * size (S7 parity for the OPQ family, like [[Pq.saveArtifacts]]). */
  def saveRotation(spark: org.apache.spark.sql.SparkSession, rot: Rotation,
                   path: String): Unit = {
    import spark.implicits._
    rot.rows.zipWithIndex.map { case (row, r) => (r, row) }.toSeq
      .toDF("r", "rvec").coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadRotation(spark: org.apache.spark.sql.SparkSession,
                   path: String): Rotation = {
    import spark.implicits._
    Rotation(spark.read.parquet(path)
      .select(col("r").cast("int"), col("rvec"))
      .as[(Int, Array[Float])].collect().sortBy(_._1).map(_._2))
  }
}
