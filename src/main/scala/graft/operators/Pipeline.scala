package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-assembly operators a training-data pipeline runs after cleaning
  * and dedup: deterministic splits and token-budget shard packing. Both are
  * pure map-side / single-window dataflows with engine-portable arithmetic
  * (md5-derived hashing, integer division), so they stay oracle-checkable
  * and reproducible across runs and engines — the property that matters
  * when a 100 TB corpus must split identically on every rerun. */
object Pipeline {

  /** Deterministic hash split: bucket in [0, 100) derived from md5 of the
    * id (NOT Spark's `rand()` — reruns and engines must agree). Map-side
    * only. */
  def splitBucket(idCol: Column): Column =
    pmod(conv(substring(md5(idCol.cast("string")), 1, 15), 16, 10).cast("long"),
      lit(100L))

  /** Assign train/val/test by hash bucket: train < trainPct ≤ val <
    * trainPct+valPct ≤ test. Returns the input plus (bucket, split). */
  def deterministicSplit(df: DataFrame, idCol: String, trainPct: Int,
                         valPct: Int): DataFrame =
    df.withColumn("bucket", splitBucket(col(idCol)))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))

  /** Contiguous token-budget shard packing: docs in ascending id order are
    * packed greedily into shards of ≤ `budget` tokens by the cumulative
    * count — shard = floor(cum_before / budget), the deterministic
    * contiguous approximation of bin packing that sequence-packing
    * pipelines use. One window over the id order; at scale the window
    * partitions by a coarse range key and offsets compose (same
    * construction as distributed zipWithIndex). Oversized docs get their
    * own shard(s). Returns (doc_id, n_tokens, shard). */
  def packShards(docs: DataFrame, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Text.tokenStats(docs).select("doc_id", "n_tokens")
    val w = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("cum_before", sum("n_tokens").over(w) - col("n_tokens"))
      .withColumn("shard", expr(s"cum_before div $budget"))
      .select("doc_id", "n_tokens", "shard")
  }
}
