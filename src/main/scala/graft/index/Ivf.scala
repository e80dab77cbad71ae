package graft.index

import graft.functions.vectors._
import graft.operators.{Metric, TopK}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic Lloyd's k-means over (id, vec) DataFrames — the trainer
  * behind [[IvfIndex]]. Initialization is the C lowest-id rows (no RNG →
  * byte-reproducible across runs, which keeps driver compares stable).
  *
  * Every step is relational: assignment is a broadcast join of C centroids
  * against the base (map-side, no shuffle of the big table), and the
  * re-centering is a partial-aggregating groupBy on (cluster, dimension).
  * At 100 TB you train on a sample and only the final assignment pass
  * touches the full table — `fit(sample)` then `assign(full)`.
  *
  * Reference analog: the IVF16384 coarse quantizer inside the faiss
  * baseline (/root/reference/filter/faiss/config.yaml:50-53) and the
  * cluster-and-permute data prep (/root/reference/streaming/
  * clustered_data_gen.py:10-42).
  */
object KMeans {

  /** Assign each row to its nearest centroid: (id, cid). */
  def assign(base: DataFrame, centroids: DataFrame): DataFrame =
    TopK.aggTopK(
      base.crossJoin(broadcast(centroids))
        .withColumn("dist", vecL2Sq(col("vec"), col("cvec"))),
      "id", "cid", "dist", 1)
      .select(col("id"), col("cid"))

  /** Train C centroids with `iters` Lloyd iterations: (cid, cvec). */
  def fit(base: DataFrame, c: Int, iters: Int): DataFrame = {
    val spark = base.sparkSession
    var centroids = base.orderBy("id").limit(c)
      .select(col("id").as("cid"), col("vec").as("cvec")).cache()
    centroids.count()
    for (_ <- 0 until iters) {
      val assigned = assign(base, centroids)
      val next = assigned.join(base, "id")
        .select(col("cid"), posexplode(col("vec")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(avg("x").as("m"))
        .groupBy("cid")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cid"),
          transform(col("pm"), p => p.getField("m").cast("float")).as("cvec"))
        .cache()
      next.count()
      centroids.unpersist()
      centroids = next
    }
    centroids
  }
}

/** IVF (inverted-file) vector index: rows bucketed by nearest centroid;
  * probes scan only the `nprobe` clusters nearest to the query vector —
  * partition pruning for vector search. With nprobe = C the probe is
  * exhaustive and exactly equals brute force (the oracle-checked mode);
  * smaller nprobe trades recall for scan volume, the same knob as the
  * reference's `nprobe` (/root/reference/filter/faiss/faiss.py:617-645).
  *
  * At scale the build writes `base.withColumn("cid").write.partitionBy("cid")`
  * so cluster pruning becomes parquet partition pruning — candidate scans
  * never read the other clusters' files.
  */
final case class IvfIndex(centroids: DataFrame, assigned: DataFrame) {

  /** Top-k probe: route each query to its nprobe nearest clusters, scan
    * only those clusters' rows. Returns (qid, id, dist, rank). */
  def probe(queries: DataFrame, base: DataFrame, k: Int, nprobe: Int,
            metric: String = Metric.L2): DataFrame = {
    val routes = TopK.aggTopK(
      queries.crossJoin(broadcast(centroids))
        .withColumn("dist", Metric.distColumn(metric, col("qvec"), col("cvec"))),
      "qid", "cid", "dist", nprobe)
      .select(col("qid"), col("cid"))
    val cand = routes.join(assigned, "cid").select("qid", "id")
    val scored = cand
      .join(base.select("id", "vec"), "id")
      .join(broadcast(queries.select("qid", "qvec")), "qid")
      .withColumn("dist", Metric.distColumn(metric, col("qvec"), col("vec")))
    TopK.aggTopK(scored, "qid", "id", "dist", k)
  }
}

object IvfIndex {
  /** Build: train on the base (or a sample of it) and assign every row. */
  def build(base: DataFrame, c: Int, iters: Int): IvfIndex = {
    val centroids = KMeans.fit(base, c, iters)
    IvfIndex(centroids, KMeans.assign(base, centroids).cache())
  }

  /** Persist the index as parquet artifacts (S7/X4 analog of the
    * reference's saveIndex, /root/reference/filter/hnsw/hnswalg.h:1224-1362):
    * centroids as one small table, assignments partitioned by cluster id so
    * a loaded index's probes prune at the file-listing level. */
  def save(index: IvfIndex, path: String): Unit = {
    index.centroids.write.mode("overwrite").parquet(s"$path/centroids")
    index.assigned.write.mode("overwrite")
      .partitionBy("cid").parquet(s"$path/assigned")
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex =
    IvfIndex(
      spark.read.parquet(s"$path/centroids"),
      spark.read.parquet(s"$path/assigned"))
}
