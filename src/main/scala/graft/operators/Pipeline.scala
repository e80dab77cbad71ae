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

  /** Sampling bucket in [0, 10000): md5 of the salted id — same
    * engine-portable construction as [[splitBucket]], salted so mixture
    * sampling is independent of the train/val/test assignment. */
  def sampleBucket10k(idCol: Column, salt: String): Column =
    pmod(conv(substring(md5(concat(idCol.cast("string"), lit(salt))), 1, 15),
      16, 10).cast("long"), lit(10000L))

  /** Per-source mixture sampling — the data-mixing pass that turns raw
    * per-source corpora into a training mixture with configured weights:
    * keep a doc iff its sampling bucket falls below its source's weight
    * (basis points), so each source is independently downsampled to
    * weight_bp/10000 of its rows, deterministically (reruns, retries, and
    * engines agree — no `rand()`). The weight table is tiny → broadcast;
    * the pass is map-side, no shuffle of the corpus. Returns the input
    * plus (weight_bp, sample_bucket, keep). */
  def sampleBySource(df: DataFrame, idCol: String, sourceCol: String,
                     weightsBp: Map[String, Long],
                     salt: String = ":sample"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val w = weightsBp.toSeq.toDF(sourceCol, "weight_bp")
    df.join(broadcast(w), sourceCol)
      .withColumn("sample_bucket", sampleBucket10k(col(idCol), salt))
      .withColumn("keep", (col("sample_bucket") < col("weight_bp")).cast("int"))
  }

  /** The composed corpus-cleaning funnel — the dataflow a training-data
    * pipeline actually runs, as ONE plan: quality filter × exact dedup ×
    * benchmark decontamination × mixture sampling, with every stage's flag
    * carried per doc and `kept` = all four passing. Four independent
    * branches over the corpus join on doc_id; each branch keeps its own
    * scale shape (map-side quality agg, fp-keyed dedup groupBy, broadcast
    * decontam probe, map-side sampling), so the funnel inherits the worst
    * single stage's cost, not a multiplied one. Returns (doc_id,
    * quality_flag, is_dup, contaminated, sample_keep, kept). */
  def cleanFunnel(corpus: DataFrame, bench: DataFrame,
                  weightsBp: Map[String, Long], n: Int): DataFrame = {
    val q = Text.qualityScore(corpus).select("doc_id", "quality_flag")
    val d = Dedup.exactDedup(corpus).select("doc_id", "is_dup")
    val c = Dedup.decontaminate(corpus, bench, n).select("doc_id", "contaminated")
    val s = sampleBySource(corpus, "doc_id", "source", weightsBp)
      .select(col("doc_id"), col("keep").as("sample_keep"))
    corpus.select("doc_id")
      .join(q, "doc_id").join(d, "doc_id").join(c, "doc_id").join(s, "doc_id")
      .withColumn("kept",
        (col("quality_flag") === 1 && col("is_dup") === 0 &&
          col("contaminated") === 0 && col("sample_keep") === 1).cast("int"))
  }

  /** Exact global rank of every row under `order` (append the id as the
    * last sort key for total determinism) WITHOUT a single-task window:
    * range-repartition + in-partition sort puts rows in global order
    * across partitions, one tiny job counts per-partition rows, and the
    * ranked pass adds each partition's broadcast offset — the same
    * distributed two-pass prefix-sum as [[packShards]]. The global sort is
    * Spark's scalable range shuffle; no stage funnels the corpus through
    * one task (a bare `row_number() OVER (ORDER BY …)` does, which is why
    * this exists). Appends `grank` (1-based). */
  def rankGlobal(df: DataFrame, order: Seq[Column]): DataFrame =
    rankGlobalWithTotal(df, order)._1

  /** [[rankGlobal]] plus the total row count — the count is the sum of the
    * per-partition counts pass 1 already collected, so callers that need
    * it ([[ntileExact]]) never pay another job over the ranked lineage. */
  private[graft] def rankGlobalWithTotal(df: DataFrame,
                                         order: Seq[Column]): (DataFrame, Long) = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    // both passes (the count collect, then the offset job) must read the
    // SAME partitioning — RangePartitioner reservoir-samples a shuffle
    // output whose row order is not deterministic across recomputations,
    // so an unpersisted second pass could land rows in different
    // partitions than the offsets were computed for. MEMORY_AND_DISK
    // spills rather than evicts, so a recompute only happens on executor
    // loss; the ContextCleaner drops the persist when the frame dies.
    val sortedRdd = sorted.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val partCounts = sortedRdd
      .mapPartitionsWithIndex { (i, it) =>
        var c = 0L; it.foreach(_ => c += 1); Iterator((i, c))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = spark.sparkContext.broadcast(partCounts.scanLeft(0L)(_ + _))
    val rows = sortedRdd.mapPartitionsWithIndex { (i, it) =>
      var running = offsets.value(i)
      it.map { r =>
        running += 1
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ running)
      }
    }
    // materialize the ranked output while the input persist is live, then
    // drop the intermediate explicitly: relying on the ContextCleaner left
    // the sorted blocks resident for as long as the caller held the
    // returned frame, so a long-lived driver calling rankGlobal repeatedly
    // accumulated MEMORY_AND_DISK blocks. The output pins at the RDD level
    // (NOT DataFrame.persist, which registers in the SQL CacheManager and
    // is held until an explicit unpersist/clearCache — callers that drop
    // the returned frame would leak a full-corpus cache permanently): the
    // ContextCleaner reclaims the RDD blocks when the frame dies, and
    // MEMORY_AND_DISK spills rather than evicts, so the ranked rows are
    // never recomputed through the (nondeterministic) range shuffle while
    // the frame is live. The eager count also guarantees the offsets were
    // applied to the exact persisted partitioning they were computed from.
    rows.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rows.count()
    sortedRdd.unpersist(blocking = false)
    val out = spark.createDataFrame(rows,
      sorted.schema.add("grank", org.apache.spark.sql.types.LongType))
    (out, partCounts.sum)
  }

  /** Exact N-tile bucketing over a global order — quality-percentile
    * assignment for curriculum/mixture selection ("train on the top
    * deciles first"): bucket = (grank−1)·n div total, so bucket sizes
    * differ by at most one and the assignment is engine-portable integer
    * arithmetic (SQL's NTILE distributes remainders differently engine to
    * engine — the explicit formula sidesteps that). Appends (grank,
    * bucket). */
  def ntileExact(df: DataFrame, order: Seq[Column], n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val (ranked, count) = rankGlobalWithTotal(df, order)
    val total = math.max(count, 1L)
    ranked.withColumn("bucket", expr(s"((grank - 1) * $n) div $total"))
  }

  /** Exact per-stratum sampling: the `n` rows of each stratum with the
    * smallest salted-md5 keys — the eval-set construction pass ("30 docs
    * per language, deterministically"). Unlike [[sampleBySource]]'s
    * rate-based thinning this takes an exact COUNT per stratum, and unlike
    * a per-stratum window sort it uses the bounded-heap top-k aggregator —
    * map-side partial heaps of n entries, so a skewed stratum (even one
    * holding the whole corpus) never sorts its rows in one task. The key
    * is the first 60 md5 bits as an integer (same engine-portable
    * construction as [[sampleBucket10k]]; ties — 2⁻⁶⁰ — break to the
    * lower id). Returns (strataCol, idCol, samp_rank). */
  def stratifiedTake(df: DataFrame, strataCol: String, idCol: String, n: Int,
                     salt: String = ":strata"): DataFrame = {
    val key = conv(substring(
      md5(concat(col(idCol).cast("string"), lit(salt))), 1, 15), 16, 10)
      .cast("long")
    TopK.aggTopK(df.withColumn("_sk", key), strataCol, idCol, "_sk", n)
      .withColumnRenamed("rank", "samp_rank")
      .drop("_sk")
  }

  /** Temperature-balanced mixture allocation — the multilingual/multi-source
    * sampling pass (the α-smoothed source weighting of the XLM-R /
    * multilingual-LM lineage, α = 0.5): source s gets a share of the doc
    * `budget` proportional to tot_s^0.5, flattening the head sources and
    * boosting the tail relative to natural frequency.
    *
    * Engine-portable by construction: arbitrary pow(x, α) is NOT identical
    * across engines, but IEEE-754 sqrt IS correctly rounded everywhere, so
    * the weight is floor(sqrt(tot) · 1000) — an integer both engines agree
    * on bit-for-bit (`sqrtTimes` = 2 gives α = 0.25 as sqrt∘sqrt, still
    * exact). Seats then apportion by integer largest-remainder (Hamilton):
    * base = ⌊budget·w / Σw⌋, and the `budget − Σbase` leftover seats go to
    * the largest remainders (ties → lexicographic source). Everything after
    * the sqrt is integer arithmetic — fully oracle-checkable.
    *
    * Scale shape: one map-side-partial groupBy reduces the corpus to the
    * SOURCE DIMENSION TABLE (tens of rows); the window and 1-row sum joins
    * below run on that tiny table, never on the corpus. Returns (source,
    * tot, weight, alloc) with Σ alloc = budget exactly. */
  def temperatureAllocate(df: DataFrame, sourceCol: String, measure: Column,
                          budget: Long, sqrtTimes: Int = 1): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(sqrtTimes >= 1 && sqrtTimes <= 3, s"sqrtTimes in [1,3], got $sqrtTimes")
    val tot = df.groupBy(col(sourceCol))
      .agg(sum(measure).cast("long").as("tot"))
    val rooted = (1 to sqrtTimes)
      .foldLeft(col("tot").cast("double")) { (c, _) => sqrt(c) }
    val w = tot.withColumn("weight", floor(rooted * lit(1000.0)).cast("long"))
    val wsum = w.agg(sum(col("weight")).as("wsum"))
    val based = w.crossJoin(broadcast(wsum))
      .withColumn("base", expr(s"($budget * weight) div wsum"))
      .withColumn("rem", expr(s"($budget * weight) % wsum"))
    val extra = based.agg((lit(budget) - sum(col("base"))).as("extra"))
    // largest-remainder rank WITHOUT a global window (even a 20-row
    // unpartitioned WindowExec trips the single-partition warning): rank =
    // 1 + #rows strictly ahead in (rem desc, source asc) — a dimension-
    // table self-join, still fully declarative
    val ahead = based.select(col(sourceCol).as("_s2"), col("rem").as("_r2"))
    val rr = based.join(broadcast(ahead),
        col("_r2") > col("rem") ||
          (col("_r2") === col("rem") && col("_s2") < col(sourceCol)),
        "left")
      .groupBy(col(sourceCol), col("tot"), col("weight"), col("base"))
      .agg((count(col("_s2")) + 1L).as("_rr"))
    rr.crossJoin(broadcast(extra))
      .withColumn("alloc",
        (col("base") + when(col("_rr") <= col("extra"), 1L).otherwise(0L))
          .cast("long"))
      .select(col(sourceCol), col("tot"), col("weight"), col("alloc"))
  }

  /** Materialize a temperature-balanced mixture: compose
    * [[temperatureAllocate]] (how many docs each source contributes) with a
    * per-source deterministic take (WHICH docs — the alloc_s smallest
    * salted-md5 keys, [[stratifiedTake]]'s construction with a per-stratum
    * n). The end-to-end "build the training mix" pass: α-smoothed source
    * budgets, exact doc selection, rerun/engine-reproducible throughout.
    *
    * A source whose allocation exceeds its population contributes all its
    * docs (the under-supplied-tail case — upsampling past 1 epoch is a
    * repeat-factor decision left to the caller). Scale shape: the
    * allocation table is driver-sized (one row per source — collected
    * deliberately); selection is the bounded-heap per-stratum take with
    * heap bound max(alloc), so no stratum ever sorts its rows in one task.
    * Returns (sourceCol, idCol, samp_rank) with samp_rank ≤ the source's
    * allocation. */
  def materializeMixture(df: DataFrame, sourceCol: String, idCol: String,
                         measure: Column, budget: Long, sqrtTimes: Int = 1,
                         salt: String = ":mix"): DataFrame = {
    val spark = df.sparkSession
    val allocRows = temperatureAllocate(df, sourceCol, measure, budget, sqrtTimes)
      .select(col(sourceCol), col("alloc")).collect()
    require(allocRows.nonEmpty, "empty corpus")
    val nMax = allocRows.map(_.getLong(1)).max
    require(nMax <= Int.MaxValue, s"per-source allocation $nMax exceeds Int range")
    val allocDf = spark.createDataFrame(
      java.util.Arrays.asList(allocRows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(sourceCol,
          df.schema(sourceCol).dataType),
        org.apache.spark.sql.types.StructField("alloc",
          org.apache.spark.sql.types.LongType))))
    stratifiedTake(df, sourceCol, idCol, nMax.toInt, salt)
      .join(broadcast(allocDf), sourceCol)
      .where(col("samp_rank") <= col("alloc"))
      .select(col(sourceCol), col(idCol), col("samp_rank"))
  }

  /** Materialize the packed training sequences: after [[packShards]]
    * assigns docs to token-budget shards, concatenate each shard's texts in
    * doc_id order (a separator byte between docs — the "document packing"
    * writers do before tokenization). Emits (shard, n_docs, seq_md5) with
    * seq_md5 = md5 of the concatenated sequence, so the gate hashes the
    * sequences themselves without megabyte cells. Concat order is pinned by
    * sorting the collected (doc_id, text) structs — collect_list alone is
    * order-nondeterministic. Per-shard state is one shard's docs (budget-
    * bounded by construction), so no task ever holds more than a shard. */
  def buildSequences(docs: DataFrame, budget: Long): DataFrame = {
    val shards = packShards(docs, budget).select(col("doc_id"), col("shard"))
    docs.select(col("doc_id"), col("text")).join(shards, "doc_id")
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("doc_id"), col("text")))),
            s => s.getField("text")),
          "\u001E")).as("seq_md5"))
  }

  /** Contiguous token-budget shard packing: docs in ascending id order are
    * packed greedily into shards of ≤ `budget` tokens by the cumulative
    * count — shard = floor(cum_before / budget), the deterministic
    * contiguous approximation of bin packing that sequence-packing
    * pipelines use.
    *
    * Distributed two-pass prefix sum — NOT a global `Window.orderBy`,
    * which would funnel the whole corpus through one task. Pass 1:
    * range-partition on doc_id, sort within partitions, and reduce each
    * partition to its token total (numPartitions values — tiny). Pass 2:
    * broadcast the exclusive prefix of those totals and stream each
    * partition once, carrying a running sum seeded at its offset. Same
    * construction as distributed zipWithIndex / `ClusterPermute
    * .permutation`; the range shuffle is written once and re-read by both
    * passes. Oversized docs get their own shard(s). Returns
    * (doc_id, n_tokens, shard). */
  def packShards(docs: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = docs.sparkSession
    val counts = Text.tokenStats(docs)
      .select(col("doc_id").cast("long"), col("n_tokens").cast("long"))
      .repartitionByRange(col("doc_id"))
      .sortWithinPartitions("doc_id")
      .rdd.map(r => (r.getLong(0), r.getLong(1)))
    val partTotals = counts
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L; it.foreach(s += _._2); Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = spark.sparkContext.broadcast(partTotals.scanLeft(0L)(_ + _))
    val rows = counts.mapPartitionsWithIndex { (i, it) =>
      var running = offsets.value(i)
      it.map { case (id, n) =>
        val before = running; running += n
        org.apache.spark.sql.Row(id, n, before / budget)
      }
    }
    import org.apache.spark.sql.types._
    spark.createDataFrame(rows, StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_tokens", LongType),
      StructField("shard", LongType))))
  }
}
