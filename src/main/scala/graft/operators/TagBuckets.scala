package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-tag bucketed physical layout — the Spark-native form of the
  * reference's hot-tag subindexes (X8: per-tag HNSW subindexes sharing one
  * vector arena, /root/reference/filter/faiss/faiss.py:268-337) and its
  * per-tag partition probe (J8, faiss.py:465-488 commented query path).
  *
  * Instead of duplicating vectors into per-tag index files, the table is
  * written `partitionBy(bucket)` where bucket = the row's primary tag:
  * columnar dedup replaces the shared arena, and directory-level partition
  * pruning replaces the index registry. A probe for tag w reads ONLY the
  * `bucket=w` directory — at 100 TB that's the difference between a full
  * scan and touching one partition; with a queries table joined on the
  * bucket column, Spark's dynamic partition pruning inserts the same skip
  * at runtime for a whole query batch.
  */
object TagBuckets {

  /** Materialize the bucketed layout: (id, vec, tags) partitioned on disk by
    * primary tag. One shuffle-free pass; each output dir is one tag's rows. */
  def writeBucketed(base: DataFrame, path: String): Unit =
    base.withColumn("bucket", col("tags").getItem(0))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  def readBucketed(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Single-tag probe: static partition pruning — the scan's PartitionFilters
    * carry `bucket = tag`, so only that directory is listed and read. */
  def probeTag(spark: SparkSession, path: String, tag: Int): DataFrame =
    readBucketed(spark, path).where(col("bucket") === tag)

  /** Batch conjunctive-filtered kNN over the bucketed layout: queries join
    * the base on the partition column (primary tag), remaining tags checked
    * in-stream. Dynamic partition pruning restricts the scan to the buckets
    * present in the (broadcast) query batch. Results are exactly
    * [[TagFilter.filteredKnn]] on the same data. */
  def bucketedFilteredKnn(spark: SparkSession, path: String, queries: DataFrame,
                          k: Int, metric: String = Metric.L2): DataFrame = {
    val base = readBucketed(spark, path)
    val q = broadcast(
      queries.select(col("qid"), col("qvec"), col("qtags"),
        col("qtags").getItem(0).as("bucket")))
    val scored = base.join(q, "bucket")
      .where(forall(col("qtags"), t => array_contains(col("tags"), t)))
      .withColumn("dist", Metric.distColumn(metric, col("qvec"), col("vec")))
    TopK.aggTopK(scored, "qid", "id", "dist", k)
  }
}
