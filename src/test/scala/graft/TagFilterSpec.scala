package graft

import graft.operators._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TagFilterSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  lazy val emb = Tables.embeddings(spark, sfDir).cache()
  lazy val base = TagFilter.withTags(emb).cache()
  lazy val queries = TagFilter.tagQueries(emb, 20).cache()

  private def ids(df: DataFrame) =
    df.select("qid", "id", "rank").as[(Long, Long, Long)].collect().toSet

  test("candidates equals the direct conjunctive array_contains filter") {
    val viaPostings = TagFilter.candidates(queries, base)
      .as[(Long, Long)].collect().toSet
    val direct = queries.crossJoin(base)
      .where(forall($"qtags", t => array_contains($"tags", t)))
      .select("qid", "id").as[(Long, Long)].collect().toSet
    assert(viaPostings === direct)
  }

  test("signature prefilter admits every true match (no false negatives)") {
    val b = TagFilter.withSignature(base, "tags")
    val q = TagFilter.withSignature(queries, "qtags").withColumnRenamed("sig", "qsig")
    val falseNeg = b.crossJoin(q)
      .where(forall($"qtags", t => array_contains($"tags", t)))
      .where(expr("(qsig & ~sig) != 0"))
    assert(falseNeg.count() === 0)
  }

  test("signature prefilter actually prunes non-matching pairs") {
    val b = TagFilter.withSignature(base, "tags")
    val q = TagFilter.withSignature(queries, "qtags").withColumnRenamed("sig", "qsig")
    val nonMatch = b.crossJoin(q)
      .where(!forall($"qtags", t => array_contains($"tags", t)))
    val pruned = nonMatch.where(expr("(qsig & ~sig) != 0")).count()
    assert(pruned > 0, "prefilter should reject at least some non-matching pairs")
  }

  test("filteredKnnSig returns exactly filteredKnn's results") {
    val exact = ids(TagFilter.filteredKnn(queries, base, 10))
    val sig = ids(TagFilter.filteredKnnSig(queries, base, 10))
    assert(sig === exact)
  }

  test("served forms (prebuilt postings / signatures) equal filteredKnn exactly") {
    val exact = ids(TagFilter.filteredKnn(queries, base, 10))
    val post = TagFilter.postings(base).cache()
    val vecs = base.select($"id", $"vec").cache()
    assert(ids(TagFilter.filteredKnnServed(queries, post, vecs, 10)) === exact)
    val sigBase = TagFilter.withSignature(base, "tags").cache()
    val qsig = TagFilter.withSignature(queries, "qtags")
      .withColumnRenamed("sig", "qsig").cache()
    assert(ids(TagFilter.filteredKnnSigServed(qsig, sigBase, 10)) === exact)
    post.unpersist(); vecs.unpersist(); sigBase.unpersist(); qsig.unpersist()
  }

  test("routedFilteredKnn equals filteredKnn at every routing threshold") {
    val exact = ids(TagFilter.filteredKnn(queries, base, 10))
    // 0 → all dense, 1200 → splits label vs mod-7 tag rarity, 20001 → all
    // selective; results must be route-invariant
    for (t <- Seq(0L, 1200L, 20001L)) {
      assert(ids(TagFilter.routedFilteredKnn(queries, base, 10, t)) === exact,
        s"thresholdBp=$t")
    }
  }

  test("routed plan derives routes from tag stats, not materialized candidates") {
    val df = TagFilter.routedFilteredKnn(queries, base, 10, 1200)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("min_freq_bp"), s"routing must join the stats table:\n$p")
    assert(!p.contains("n_cand"),
      s"routing must not count materialized candidate sets:\n$p")
  }

  test("sorted-union disjunctive candidates equal the direct ANY-tag filter") {
    val viaUnion = TagFilter.unionCandidates(queries, base)
      .as[(Long, Long)].collect().toSet
    val direct = queries.crossJoin(base)
      .where(exists($"qtags", t => array_contains($"tags", t)))
      .select("qid", "id").as[(Long, Long)].collect().toSet
    assert(viaUnion === direct)
    // and the per-query id arrays really are sorted unions (ascending)
    val merged = TagFilter.unionCandidates(queries, base)
      .groupBy("qid").agg(collect_list($"id").as("got"))
    // no duplicate ids per query
    val dups = TagFilter.unionCandidates(queries, base)
      .groupBy("qid", "id").count().where($"count" > 1)
    assert(dups.count() === 0)
  }

  test("salted candidates join equals the plain tag-keyed join") {
    val plain = TagFilter.candidates(queries, base)
      .as[(Long, Long)].collect().toSet
    for (salts <- Seq(1, 4, 16)) {
      val salted = TagFilter.candidatesSalted(queries, base, salts)
        .as[(Long, Long)].collect().toSet
      assert(salted === plain, s"salts=$salts")
    }
  }

  test("bucketed layout returns exactly filteredKnn's results") {
    val path = java.nio.file.Files.createTempDirectory("graft-bkt").resolve("emb").toString
    TagBuckets.writeBucketed(base, path)
    val exact = ids(TagFilter.filteredKnn(queries, base, 10))
    val bucketed = ids(TagBuckets.bucketedFilteredKnn(spark, path, queries, 10))
    assert(bucketed === exact)
  }

  test("single-tag probe reads only its bucket's rows") {
    val path = java.nio.file.Files.createTempDirectory("graft-bkt").resolve("emb").toString
    TagBuckets.writeBucketed(base, path)
    val tag = base.select($"tags".getItem(0)).as[Int].head()
    val probed = TagBuckets.probeTag(spark, path, tag)
    val expected = base.where($"tags".getItem(0) === tag).count()
    assert(probed.count() === expected)
    assert(probed.count() > 0)
  }

  test("tagStats frequencies sum to ~#tags-per-row * 10000 bp") {
    val stats = TagFilter.tagStats(base)
    val totalBp = stats.agg(sum("freq_bp")).as[Long].head()
    // 2 tags per row → total freq mass ≈ 20000 bp (integer-division slack)
    assert(totalBp > 19000 && totalBp <= 20000)
  }
}
