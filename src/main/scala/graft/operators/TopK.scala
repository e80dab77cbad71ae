package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** One scored candidate flowing into a per-query top-k selection. */
case class ScoredId(id: Long, dist: Double)

/** Bounded top-k buffer: keeps the k smallest (dist, id) pairs seen so far.
  *
  * Spark-native analog of the reference's per-query bounded heaps
  * (/root/reference/filter/uint8_knn_file/uint8_knn.hpp:55-62,74-82 and
  * filter/hnsw/hnswalg.h:2024-2031). Used as an [[Aggregator]] buffer so
  * top-k runs as a hash aggregation with map-side partial combine — at scale
  * this shuffles only k rows per query instead of sorting the full candidate
  * set the way a window `row_number` plan would.
  *
  * Ordering is (dist asc, id asc) — deterministic tie-break by id.
  */
final class TopKBuffer(val k: Int) extends Serializable {
  // flat parallel arrays; compacted whenever occupancy hits capacity
  var dists: Array[Double] = new Array[Double](math.max(4 * k, 16))
  var ids: Array[Long] = new Array[Long](math.max(4 * k, 16))
  var size: Int = 0
  // threshold = current kth-best dist once we have seen >= k candidates
  var bound: Double = Double.PositiveInfinity
  var boundId: Long = Long.MaxValue

  @inline private def worseThanBound(dist: Double, id: Long): Boolean =
    dist > bound || (dist == bound && id >= boundId)

  def add(id: Long, dist: Double): Unit = {
    if (size >= k && worseThanBound(dist, id)) return
    if (size == dists.length) compact()
    dists(size) = dist
    ids(size) = id
    size += 1
    if (size == dists.length) compact()
  }

  /** Sort by (dist, id), truncate to k, refresh the admission bound. */
  def compact(): Unit = {
    val idx = Array.range(0, size).sortInPlaceWith { (a, b) =>
      val da = dists(a); val db = dists(b)
      if (da != db) da < db else ids(a) < ids(b)
    }
    val n = math.min(k, size)
    val nd = new Array[Double](math.max(4 * k, 16))
    val ni = new Array[Long](math.max(4 * k, 16))
    var i = 0
    while (i < n) { nd(i) = dists(idx(i)); ni(i) = ids(idx(i)); i += 1 }
    dists = nd; ids = ni; size = n
    if (size >= k) { bound = dists(k - 1); boundId = ids(k - 1) }
  }

  def mergeIn(other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) { add(other.ids(i), other.dists(i)); i += 1 }
    this
  }

  def result(): Seq[ScoredId] = {
    compact()
    (0 until size).map(i => ScoredId(ids(i), dists(i)))
  }
}

/** Typed aggregator: top-k smallest (dist, id) per group. Register with
  * `functions.udaf` and call as `topk($"id", $"dist")`. */
class TopKAggregator(k: Int) extends Aggregator[ScoredId, TopKBuffer, Seq[ScoredId]] {
  override def zero: TopKBuffer = new TopKBuffer(k)
  override def reduce(b: TopKBuffer, a: ScoredId): TopKBuffer = { b.add(a.id, a.dist); b }
  override def merge(b1: TopKBuffer, b2: TopKBuffer): TopKBuffer = b1.mergeIn(b2)
  override def finish(b: TopKBuffer): Seq[ScoredId] = b.result()
  override def bufferEncoder: Encoder[TopKBuffer] = Encoders.kryo[TopKBuffer]
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}

object TopK {
  /** ObjectHashAggregate (the physical operator behind every
    * TypedImperativeAggregate, incl. [[TopKAggregator]] and the k-means
    * vecMean) falls back to SORT-BASED aggregation once a partition sees
    * more than `fallbackThreshold` distinct keys — Spark's default is 128,
    * sized for large per-group state. Our aggregation states are tiny
    * (k-element heaps, d-length running means), so past the threshold the
    * fallback SORTS THE ENTIRE JOINED INPUT instead of holding a few
    * thousand 100-byte buffers: at 10M rows × 500 query groups the exact
    * truth join spilled ~200 GB of (qid, id, dist) rows where the hash map
    * needed ~1 MB. Raised once per session before building any such agg;
    * 64k buffers × ~1 KB is still driver-memory-trivial. */
  def ensureHashAggKeyRoom(spark: SparkSession): Unit = {
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val cur = scala.util.Try(spark.conf.get(key).toInt).getOrElse(128)
    if (cur < 65536) spark.conf.set(key, "65536")
  }

  /** Hash-aggregation top-k: `df` must carry `groupCol`, `idCol`, `distCol`.
    * Returns (groupCol, id, dist, rank) with rank 1..k ordered by
    * (dist asc, id asc). Scale path: partial heaps combine map-side, the
    * shuffle moves only O(k) rows per group. */
  def aggTopK(df: DataFrame, groupCol: String, idCol: String, distCol: String, k: Int): DataFrame = {
    ensureHashAggKeyRoom(df.sparkSession)
    val topk = udaf(new TopKAggregator(k))
    df.groupBy(col(groupCol))
      .agg(topk(col(idCol).cast("long"), col(distCol).cast("double")).as("topk"))
      .select(col(groupCol), posexplode(col("topk")))
      .select(
        col(groupCol),
        col("col.id").as(idCol),
        col("col.dist").as(distCol),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** Window-based top-k (sort per group). Kept for differential testing
    * against [[aggTopK]]; prefer aggTopK at scale. */
  def windowTopK(df: DataFrame, groupCol: String, idCol: String, distCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(distCol).asc, col(idCol).asc)
    df.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col(groupCol), col(idCol), col(distCol), col("rank"))
  }
}
