package graft

import graft.operators._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions: the properties that decide whether these
  * operators survive a 100× scale-up — dimension broadcasts, parquet filter
  * pushdown, column pruning, codegen'd distance kernels, partial (map-side)
  * top-k aggregation. A correctness-green operator with the wrong plan
  * shape fails here. */
class PlanSpec extends AnyFunSuite with SparkSuite {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q5: dimension side is a broadcast hash join, not a shuffle join") {
    val p = plan(Relational.q5RegionRevenue(
      Tables.region(spark, sfDir), Tables.nation(spark, sfDir),
      Tables.customer(spark, sfDir), Tables.orders(spark, sfDir),
      Tables.lineitem(spark, sfDir), "ASIA"))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
  }

  test("q3: the date predicates are pushed down to the parquet scans") {
    val p = plan(Relational.q3Revenue(
      Tables.customer(spark, sfDir), Tables.orders(spark, sfDir),
      Tables.lineitem(spark, sfDir), "BUILDING", "1998-01-01"))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate"),
      s"lineitem scan must push the shipdate filter:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)"),
      s"customer scan must push the segment filter:\n$p")
  }

  test("q1: lineitem scan prunes to only the referenced columns") {
    val df = SparkEntry.queries("q1_agg")(spark, sfDir)
    val p = plan(df)
    assert(!p.contains("l_partkey") && !p.contains("l_suppkey"),
      s"unreferenced columns must not be read:\n$p")
    assert(p.contains("l_quantity"), "referenced column missing from scan")
  }

  test("shard packing never funnels the corpus through one task") {
    // the round-2 scale-killer was a global Window.orderBy with no
    // partitionBy here; the two-pass distributed prefix sum must keep the
    // plan free of Window nodes and single-partition exchanges
    val df = SparkEntry.queries("pipeline_shards")(spark, sfDir)
    val p = plan(df)
    assert(!p.contains("Window"), s"no Window allowed in shard packing:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no single-partition funnel allowed:\n$p")
    // and the result is still totally ordered by construction
    val rows = df.orderBy("doc_id").select("shard")
      .collect().map(_.getLong(0))
    assert(rows.sameElements(rows.sorted), "shards must be monotone in doc_id")
  }

  test("knn distance kernel runs inside whole-stage codegen") {
    val df = SparkEntry.queries("knn_l2")(spark, sfDir)
    df.collect() // materialize so AQE finalizes the plan with codegen spans
    val p = plan(df)
    // AQE's plan string abbreviates WholeStageCodegen spans as "*(n)"; the
    // distance expression must sit on a starred (codegen'd) operator line,
    // not in an interpreted standalone Project
    val distLine = p.linesIterator.find(_.contains("vec_l2sq"))
    assert(distLine.isDefined, s"distance expr missing:\n$p")
    assert(distLine.get.contains("*("),
      s"vec_l2sq fell out of whole-stage codegen:\n${distLine.get}\n$p")
  }

  test("hamming kNN: popcount kernel in codegen, base table never shuffles") {
    val df = SparkEntry.queries("knn_hamming")(spark, sfDir)
    df.collect()
    val p = plan(df)
    val distLine = p.linesIterator.find(_.contains("vec_hamming"))
    assert(distLine.isDefined, s"hamming expr missing:\n$p")
    assert(distLine.get.contains("*("),
      s"vec_hamming fell out of whole-stage codegen:\n${distLine.get}\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"queries must broadcast:\n$p")
    // same partial-heap contract as the float path: only aggregated
    // buffers cross the qid exchange
    val exchangeIdx = p.indexOf("Exchange hashpartitioning(qid")
    val partialIdx = p.indexOf("ObjectHashAggregate", exchangeIdx)
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"partial top-k must sit below the qid exchange:\n$p")
  }

  test("mixture allocation: corpus aggregates map-side, no unpartitioned window anywhere") {
    val df = SparkEntry.queries("pipeline_mixture_alloc")(spark, sfDir)
    val p = plan(df)
    // the corpus groupBy must partial-aggregate before its exchange
    assert(p.contains("HashAggregate"), s"expected hash agg:\n$p")
    // the largest-remainder rank is a dimension-table count join — an
    // unpartitioned WindowExec would funnel (and warn); none may exist
    assert(!p.contains("Window"), s"window leaked into the allocation plan:\n$p")
  }

  test("knn top-k shuffles only aggregated heaps, not raw candidate rows") {
    val df = SparkEntry.queries("knn_l2")(spark, sfDir)
    val p = plan(df)
    // bounded-heap aggregator: partial aggregation appears below the
    // exchange (ObjectHashAggregate partial_topk), so the shuffle carries
    // one buffer per (partition, qid) instead of nb rows per query
    assert(p.contains("ObjectHashAggregate"), s"expected object hash agg:\n$p")
    val exchangeIdx = p.indexOf("Exchange hashpartitioning(qid")
    val partialIdx = p.indexOf("ObjectHashAggregate", exchangeIdx)
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"partial aggregate must sit below the qid exchange:\n$p")
  }

  test("served signature scan: broadcast queries, partial top-k below the exchange") {
    import graft.operators.TagFilter
    val emb = Tables.embeddings(spark, sfDir)
    val tagged = TagFilter.withTags(emb)
    val sigBase = TagFilter.withSignature(tagged, "tags")
    val qsig = TagFilter.withSignature(TagFilter.tagQueries(emb, 10), "qtags")
      .withColumnRenamed("sig", "qsig")
    val df = TagFilter.filteredKnnSigServed(qsig, sigBase, 10)
    val p = plan(df)
    // the query side must broadcast (base never shuffles for the scan)...
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"expected broadcast of the query side:\n$p")
    assert(!p.contains("Exchange hashpartitioning(id"),
      s"base table must not shuffle:\n$p")
    // ...and the per-partition top-k heaps combine below the qid exchange
    val exchangeIdx = p.indexOf("Exchange hashpartitioning(qid")
    val partialIdx = p.indexOf("ObjectHashAggregate", exchangeIdx)
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"partial top-k must sit below the qid exchange:\n$p")
  }

  test("sparse MIPS: query side broadcasts and the score agg combines map-side") {
    val df = SparkEntry.queries("sparse_mips")(spark, sfDir)
    df.collect()
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), s"dim join must broadcast the query side:\n$p")
    // partial score aggregation must run below the (qid,id) exchange so the
    // shuffle carries per-(query,doc) partial sums, not raw postings pairs
    val exchangeIdx = p.indexOf("Exchange hashpartitioning(qid")
    assert(exchangeIdx >= 0, s"expected qid exchange:\n$p")
    val partialIdx = p.indexOf("partial_sum", exchangeIdx)
    assert(partialIdx > exchangeIdx || p.substring(exchangeIdx).contains("HashAggregate"),
      s"partial aggregation must sit below the exchange:\n$p")
  }

  test("bucketed single-tag probe prunes partitions in the scan") {
    val base = TagFilter.withTags(Tables.embeddings(spark, sfDir))
    val path = java.nio.file.Files.createTempDirectory("graft-bkt").resolve("emb").toString
    TagBuckets.writeBucketed(base, path)
    val p = plan(TagBuckets.probeTag(spark, path, 3))
    assert(p.contains("PartitionFilters: [isnotnull(bucket"),
      s"bucket predicate must be a partition filter, not a data filter:\n$p")
    assert(p.contains("(bucket") && p.contains("= 3)"),
      s"expected bucket=3 partition filter:\n$p")
  }

  test("bucketed batch probe engages dynamic partition pruning") {
    val emb = Tables.embeddings(spark, sfDir)
    val path = java.nio.file.Files.createTempDirectory("graft-bkt").resolve("emb").toString
    TagBuckets.writeBucketed(TagFilter.withTags(emb), path)
    val df = TagBuckets.bucketedFilteredKnn(
      spark, path, TagFilter.tagQueries(emb, 5), k = 10)
    df.collect()
    val p = plan(df)
    assert(p.contains("dynamicpruning") || p.contains("DynamicPruning"),
      s"bucket join should trigger dynamic partition pruning:\n$p")
  }

  test("banded dedup plans contain no cartesian or all-pairs join") {
    for (q <- Seq("dedup_simhash_pairs", "dedup_embed_nn")) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), s"$q has an all-pairs join:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has a nested-loop join:\n$p")
    }
  }

  test("repeated-span plans: gram-keyed shuffle only — no self-join, no countDistinct") {
    for (q <- Seq("dedup_spans", "dedup_spans_trim")) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), s"$q has an all-pairs join:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has a nested-loop join:\n$p")
      // the cross-doc flag is min/max per gram, never a distinct-count
      // (a boilerplate gram in a billion docs must cost two longs)
      assert(!p.toLowerCase.contains("distinct_count") && !p.contains("count(distinct"),
        s"$q counts distinct docs per gram:\n$p")
    }
  }

  test("minhash LSH verification never shuffles materialized shingle sets") {
    val p = plan(SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir))
    assert(!p.contains("collect_set"),
      s"shingle sets must not be collected and shuffled for verification:\n$p")
  }

  test("decontamination probes via broadcast — the corpus never self-joins") {
    val p = plan(SparkEntry.queries("dedup_decontam")(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"),
      s"bench-gram side must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"no all-pairs shape allowed:\n$p")
  }

  test("mixture sampling is map-side: only the weight table joins, broadcast") {
    val p = plan(SparkEntry.queries("pipeline_sample")(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"),
      s"weight table must broadcast:\n$p")
    // no exchange at all: keep decisions are per-row functions of
    // (doc_id, source) — a shuffle here would be a 100 TB regression
    assert(!p.contains("Exchange hashpartitioning"),
      s"sampling must not shuffle the corpus:\n$p")
  }

  test("PQ ADC scan: codes never shuffle; the gather kernel stays in codegen") {
    val df = SparkEntry.queries("ann_pq_exact")(spark, sfDir)
    df.collect() // AQE finalizes codegen spans
    val p = plan(df)
    val adcLine = p.linesIterator.find(_.contains("pq_adc_dist"))
    assert(adcLine.isDefined, s"ADC kernel missing:\n$p")
    assert(adcLine.get.contains("*("),
      s"pq_adc_dist fell out of whole-stage codegen:\n${adcLine.get}\n$p")
  }

  test("range search ranks per query — no single-partition global window") {
    val e = Tables.embeddings(spark, sfDir)
    val p = plan(Knn.rangeJoin(
      e.where(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
      e.select(col("vec_id").as("id"), col("embedding").as("vec")),
      radius = 1.6))
    assert(p.contains("hashpartitioning(qid"),
      s"the rank window must partition by query:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no stage may funnel the in-range rows through one task:\n$p")
  }

  test("global ranking never funnels the corpus through one task") {
    val scored = Tables.documents(spark, sfDir)
      .select(col("doc_id").cast("long"), col("n_chars").cast("long"))
    // rankGlobal's ranked output scans an RDD (the prefix-sum pass), so
    // assert on the stage that establishes the global order: a RANGE
    // exchange + in-partition sort — never a SinglePartition exchange (the
    // two-pass prefix sum replaces the global window a naive
    // row_number() OVER (ORDER BY ...) would need)
    val order = Seq(col("n_chars").desc, col("doc_id").asc)
    val p = plan(scored.repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*))
    assert(!p.contains("Exchange SinglePartition"),
      s"global rank must not single-task the corpus:\n$p")
    assert(p.contains("rangepartitioning"),
      s"expected a range exchange for the global order:\n$p")
    // and the ranked output is total: one rank per row (AQE may coalesce
    // the tiny test corpus to one range partition — partition COUNT is an
    // AQE decision, the plan shape above is the scale property)
    val ranked = graft.operators.Pipeline.rankGlobal(scored, order)
    assert(ranked.count() === scored.count())
  }

  test("broadcast kNN join does not shuffle the base table") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val b = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val p = plan(Knn.knnJoin(q, b, 10, Metric.L2))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query side must broadcast:\n$p")
    // the only exchange should be the final per-qid aggregation, never a
    // repartition of the base scan side
    val firstExchange = p.indexOf("Exchange")
    assert(firstExchange == p.indexOf("Exchange hashpartitioning(qid"),
      s"unexpected extra shuffle:\n$p")
  }
}
