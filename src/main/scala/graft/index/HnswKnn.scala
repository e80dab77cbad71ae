package graft.index

import graft.operators.TopK
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed approximate kNN: one [[HnswIndex]] per partition of the base
  * table, built inside `mapPartitions`, probed with the broadcast query set,
  * partition-local top-k merged by the bounded-heap global top-k.
  *
  * This is the Spark-native shape of the reference's graph path
  * (/root/reference/filter/hnsw/): the index never crosses the wire, only
  * O(k · nq) candidate rows per partition do. Scale-out is by partition
  * count — 1000 executors build 1000 local graphs concurrently; queries are
  * a broadcast (the query table is small by definition of the workload).
  * Recall composes: the global merge of per-partition top-k is exact over
  * the union of per-partition candidates, so total recall ≈ per-partition
  * graph recall, independent of partition count.
  */
object HnswKnn {

  /** Plain ANN top-k join: (qid, id, dist, rank). */
  def knn(queries: DataFrame, base: DataFrame, k: Int, m: Int = 16,
          efConstruction: Int = 100, efSearch: Int = 64,
          numPartitions: Int = 8): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val qs = queries
      .select(col("qid").cast("long"), col("qvec"))
      .as[(Long, Array[Float])].collect()
    val bq = spark.sparkContext.broadcast(qs)
    val local = base.select(col("id").cast("long"), col("vec"))
      .repartition(numPartitions, col("id"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val idx = new HnswIndex(m, efConstruction)
        it.foreach { case (id, v) => idx.add(id, v) }
        bq.value.iterator.flatMap { case (qid, qv) =>
          idx.search(qv, k, efSearch).iterator.map { case (id, d) => (qid, id, d) }
        }
      }.toDF("qid", "id", "dist")
    TopK.aggTopK(local, "qid", "id", "dist", k)
  }

  /** Label-filtered ANN: the per-query label must equal the base row's
    * label; the predicate gates admission inside the graph search (J3/J4
    * semantics), not traversal. */
  def filteredKnn(queries: DataFrame, base: DataFrame, k: Int, m: Int = 16,
                  efConstruction: Int = 100, efSearch: Int = 64,
                  numPartitions: Int = 8): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val qs = queries
      .select(col("qid").cast("long"), col("qvec"), col("qlabel").cast("int"))
      .as[(Long, Array[Float], Int)].collect()
    val bq = spark.sparkContext.broadcast(qs)
    val local = base.select(col("id").cast("long"), col("vec"), col("label").cast("int"))
      .repartition(numPartitions, col("id"))
      .as[(Long, Array[Float], Int)]
      .mapPartitions { it =>
        val idx = new HnswIndex(m, efConstruction)
        val labels = scala.collection.mutable.HashMap.empty[Long, Int]
        it.foreach { case (id, v, lab) => labels(id) = lab; idx.add(id, v) }
        bq.value.iterator.flatMap { case (qid, qv, qlab) =>
          idx.search(qv, k, efSearch, id => labels(id) == qlab)
            .iterator.map { case (id, d) => (qid, id, d) }
        }
      }.toDF("qid", "id", "dist")
    TopK.aggTopK(local, "qid", "id", "dist", k)
  }
}
