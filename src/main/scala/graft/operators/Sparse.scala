package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse-vector maximal-inner-product search (the reference's "sparse
  * track") as relational dataflow.
  *
  * The reference scores queries with a CSC sparse mat-vec product
  * (/root/reference/sparse/spmat/spmat.py:58-74) or a budgeted inverted-index
  * scan (/root/reference/sparse/linscan/linscan.py:19-56). Long-form
  * (id, dim, value) rows are the Spark-native CSR: the MIPS join is an
  * equi-join on `dim` — the exact dataflow of an inverted-index lookup, with
  * the postings table partitioned by dim and the per-(query, doc) partial
  * products combined map-side.
  *
  * Scale notes: the join key `dim` is the only shuffle; hot dims (stopword
  * terms) are handled by [[truncatePostings]], the deterministic analog of
  * linscan's wall-clock budget (budget → top-m postings per dim, ranked by
  * weight — linscan.py:44-56's `budget` knob re-expressed as a data bound).
  */
object Sparse {

  /** Long-form sparse vectors from the documents table: (id, dim, v) with
    * dim = term and v = term frequency (integer weights keep every score
    * exactly representable — oracle-hash-safe). */
  def fromTermFreq(docs: DataFrame): DataFrame =
    Text.termFreq(docs).select(
      col("doc_id").as("id"), col("term").as("dim"), col("tf").cast("long").as("v"))

  /** Sparse MIPS top-k join: queries (qid, dim, qv) × base (id, dim, v) →
    * (qid, id, score, rank), rank by (score desc, id asc), k per query.
    * The reference's SpMat scoring (spmat.py:58-74) + per-query top-k
    * (spmat.py:66-74) as join + partial agg + bounded-heap top-k. */
  def mips(queries: DataFrame, base: DataFrame, k: Int): DataFrame = {
    val scored = base.join(broadcast(queries), "dim")
      .groupBy("qid", "id")
      .agg(sum(col("qv") * col("v")).as("score"))
      .withColumn("dist", -col("score").cast("double"))
    TopK.aggTopK(scored, "qid", "id", "dist", k)
      .withColumn("score", (-col("dist")).cast("long"))
      .select("qid", "id", "score", "rank")
  }

  /** α-sparsification (reference `largest_elements`, spmat.py:16-28): keep
    * the minimal prefix of elements, largest value first, whose sum reaches
    * α·total. Integer form: keep rows whose preceding cumulative sum is
    * < (num/den)·total — exact rational arithmetic, no float thresholds.
    * Per-id window sort is bounded by nnz per row (~120 in the reference
    * corpus), so the window never sees unbounded partitions. */
  def sparsify(vecs: DataFrame, alphaNum: Int, alphaDen: Int): DataFrame = {
    val w = Window.partitionBy("id").orderBy(col("v").desc, col("dim"))
    val tot = Window.partitionBy("id")
    vecs
      .withColumn("cum_before", sum("v").over(w) - col("v"))
      .withColumn("total", sum("v").over(tot))
      .where(col("cum_before") * alphaDen < col("total") * alphaNum)
      .select("id", "dim", "v")
  }

  /** Budgeted inverted-index truncation: keep only the top-m postings per
    * dim ranked by (v desc, id asc). Bounds both the MIPS join fan-out and
    * hot-dim skew; deterministic stand-in for linscan's time budget. */
  def truncatePostings(base: DataFrame, m: Int): DataFrame = {
    val w = Window.partitionBy("dim").orderBy(col("v").desc, col("id"))
    base.withColumn("rn", row_number().over(w)).where(col("rn") <= m)
      .select("id", "dim", "v")
  }

  /** Budgeted MIPS: [[truncatePostings]] then [[mips]] — the linscan
    * dataflow (inverted index, per-dim accumulation, budget bound). */
  def budgetedMips(queries: DataFrame, base: DataFrame, k: Int, m: Int): DataFrame =
    mips(queries, truncatePostings(base, m), k)
}
