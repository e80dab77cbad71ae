package graft.index

import graft.operators.TagFilter
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's COMPLETE selectivity-adaptive planner
  * (/root/reference/filter/faiss/faiss.py:361-426), graph branch included:
  *
  *  - queries whose rarest tag is below `thresholdBp` basis points take the
  *    exact posting-intersection brute force (the candidate set is provably
  *    small, so exact is also fast — faiss.py:392-404);
  *  - the rest probe the partition-local graphs with the ONE-STAGE
  *    conjunctive-tag search (expand-until-k + exact ranking,
  *    faiss.py:406-418's metadata-aware graph route).
  *
  * Routing is the same O(1)-per-query broadcast stats join as
  * [[TagFilter.routedFilteredKnn]]; that operator keeps both branches exact
  * (oracle-checkable), this one trades the dense branch to the graph for
  * scan-free probes — recall-graded, guaranteed ≥ k results per query via
  * the one-stage expansion. */
object RoutedGraphKnn {

  def knn(queries: DataFrame, base: DataFrame, k: Int, thresholdBp: Long,
          m: Int = 16, efConstruction: Int = 100, efSearch: Int = 64,
          numPartitions: Int = 8): DataFrame = {
    val stats = TagFilter.tagStats(base)
    val qmin = queries.select(col("qid"), explode(col("qtags")).as("tag"))
      .join(broadcast(stats), Seq("tag"), "left")
      .na.fill(0, Seq("freq_bp"))
      .groupBy("qid").agg(min("freq_bp").as("min_freq_bp"))
    val routed = queries.join(broadcast(qmin), "qid")
    val selectiveQ = routed.where(col("min_freq_bp") < thresholdBp)
      .select("qid", "qvec", "qtags")
    val denseQ = routed.where(col("min_freq_bp") >= thresholdBp)
      .select("qid", "qvec", "qtags")

    val exact = TagFilter.filteredKnn(selectiveQ, base, k)
    val graph = HnswKnn.filteredKnnTags(denseQ, base, k, m, efConstruction,
      efSearch, numPartitions)
    exact.select("qid", "id", "dist", "rank")
      .unionByName(graph.select("qid", "id", "dist", "rank"))
  }
}
