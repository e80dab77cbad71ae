package graft

import graft.operators._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sfDir).cache()

  test("exactDedup: canonical id is the min doc_id of its hash group; no false dups") {
    val d = Dedup.exactDedup(docs).cache()
    assert(d.count() === docs.count())
    // canonical rows are never marked dup, and canonical_id <= doc_id
    assert(d.where($"canonical_id" > $"doc_id").count() === 0)
    assert(d.where($"doc_id" === $"canonical_id" && $"is_dup" === 1).count() === 0)
    // dup groups all share identical text
    val joined = d.join(docs, "doc_id")
      .join(docs.select($"doc_id".as("canonical_id"), $"text".as("ctext")), "canonical_id")
    assert(joined.where($"text" =!= $"ctext").count() === 0)
  }

  test("shingles: every shingle has exactly n tokens and appears in the doc text") {
    val sh = Dedup.shingles(docs, 3)
    assert(sh.where(size(split($"shingle", " ")) =!= 3).count() === 0)
    val bad = sh.join(docs, "doc_id")
      .where(!$"text".contains($"shingle")).count()
    assert(bad === 0)
  }

  test("decontaminate: one row per corpus doc; hits iff a shared shingle exists") {
    val bench = docs.where($"doc_id" % 20 === 0)
    val corpus = docs.where($"doc_id" % 20 =!= 0)
    val d = Dedup.decontaminate(corpus, bench, 3).cache()
    assert(d.count() === corpus.count())
    // flag is exactly (n_hits > 0)
    assert(d.where(($"n_hits" > 0) =!= ($"contaminated" === 1)).count() === 0)
    // independent reconstruction: corpus docs sharing any bench shingle
    val expected = Dedup.shingles(corpus, 3)
      .join(Dedup.shingles(bench, 3).select("shingle").distinct(), "shingle")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    val got = d.where($"contaminated" === 1).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got === expected)
    // a benchmark doc duplicated into the corpus must always be flagged
    // (exact dups share every shingle) — sanity that the op catches the
    // textbook leak when one exists
    val leakIds = corpus.as("c").join(bench.as("b"), $"c.text" === $"b.text")
      .select($"c.doc_id").collect().map(_.getLong(0)).toSet
    assert(leakIds.subsetOf(got))
    d.unpersist()
  }

  test("minhashLsh candidates are a subset of all-pairs jaccard at the same threshold") {
    val lsh = Dedup.minhashLsh(docs, 3, 16, 4, 5000)
    val full = Dedup.jaccardPairs(docs, 3, 5000)
    // LSH is a filter on the exact all-pairs result: verified pairs must agree
    assert(lsh.exceptAll(full).count() === 0)
    // and on this corpus (jaccard gap: nothing in [0.3, 0.8)) it finds all of them
    assert(lsh.count() === full.count())
  }

  test("jaccard pairs are symmetric-free (a < b) and within [minBp, 10000]") {
    val j = Dedup.jaccardPairs(docs, 3, 5000).cache()
    assert(j.where($"a_id" >= $"b_id").count() === 0)
    assert(j.where($"jaccard_bp" < 5000 || $"jaccard_bp" > 10000).count() === 0)
  }

  test("maxDf cap drops hot shingles but a loose cap changes nothing") {
    val dfMax = Dedup.shingles(docs, 3).groupBy("shingle").count()
      .agg(max("count")).as[Long].head().toInt
    val uncapped = Dedup.jaccardPairs(docs, 3, 5000)
      .as[(Long, Long, Long)].collect().toSet
    val loose = Dedup.jaccardPairs(docs, 3, 5000, maxDf = dfMax)
      .as[(Long, Long, Long)].collect().toSet
    assert(loose === uncapped, "cap above the max df must be a no-op")
    // df > 1 shingles are exactly the shared ones: capping at 1 removes every
    // intersection, so no pair can reach the threshold
    val all = Dedup.jaccardPairs(docs, 3, 1, maxDf = 1)
    assert(all.count() === 0)
  }

  test("repeatedSpans: positional window counts and cross-doc sharing by hand") {
    val hand = Seq(
      (1L, "a b c d e f"),      // windows: "a b c", "b c d", "c d e", "d e f"
      (2L, "x y z a b c"),      // shares "a b c" with doc 1
      (3L, "p q r s"),          // windows: "p q r", "q r s" — unique
      (4L, "k k k k"),          // "k k k" twice (positional), within-doc only
      (5L, "u v")               // too short: no windows, no row
    ).toDF("doc_id", "text")
    val got = Dedup.repeatedSpans(hand, n = 3)
      .select("doc_id", "n_windows", "n_shared", "shared_bp")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L))
    assert(got(1L) === ((1L, 4L, 1L, 2500L)))
    assert(got(2L) === ((2L, 4L, 1L, 2500L)))
    assert(got(3L) === ((3L, 2L, 0L, 0L)))
    // within-doc repetition is NOT cross-doc sharing (min == max doc)
    assert(got(4L) === ((4L, 2L, 0L, 0L)))
    // corpus sanity: budgets well-formed
    val c = Dedup.repeatedSpans(docs, n = 5).cache()
    assert(c.where($"n_shared" > $"n_windows").count() === 0)
    assert(c.where($"shared_bp" < 0 || $"shared_bp" > 10000).count() === 0)
    c.unpersist()
  }

  test("trimSharedSpans: covered tokens drop, survivors keep order, full-boilerplate empties") {
    val hand = Seq(
      (1L, "a b c d e f"),     // "a b c" shared with doc 2: tokens 0..2 drop
      (2L, "x y z a b c"),     // "a b c" at positions 3..5 drops
      (3L, "p q r s"),         // untouched
      (4L, "a b c")            // the whole doc is the shared span → empty
    ).toDF("doc_id", "text")
    val got = Dedup.trimSharedSpans(hand, n = 3)
      .select("doc_id", "n_tokens", "n_kept", "text_clean")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 6L, 3L, "d e f")))
    assert(got(2L) === ((2L, 6L, 3L, "x y z")))
    assert(got(3L) === ((3L, 4L, 4L, "p q r s")))
    assert(got(4L) === ((4L, 3L, 0L, "")))
    // corpus invariants: kept <= tokens; untouched docs round-trip verbatim
    val c = Dedup.trimSharedSpans(docs, n = 5).cache()
    assert(c.where($"n_kept" > $"n_tokens").count() === 0)
    val verbatim = c.where($"n_kept" === $"n_tokens")
      .join(docs, "doc_id").where($"text_clean" =!= $"text")
    assert(verbatim.count() === 0)
    c.unpersist()
  }

  test("simhash is deterministic and pairs respect the hamming bound") {
    val s1 = Dedup.simhash(docs).orderBy("doc_id").collect()
    val s2 = Dedup.simhash(docs).orderBy("doc_id").collect()
    assert(s1.toSeq === s2.toSeq)
    val p = Dedup.simhashPairs(docs, 2)
    assert(p.where($"hamming" > 2).count() === 0)
  }

  test("simhashPairs regime guard raises before a quadratic bucket join") {
    // the bucket histogram on this corpus estimates > 1 candidate pair, so
    // a cap of 1 must refuse to launch the join and name the hand-off
    val e = intercept[IllegalArgumentException] {
      Dedup.simhashPairs(docs, 2, candidateCap = 1L)
    }
    assert(e.getMessage.contains("minhashLsh"))
    // and under the default cap the operator still runs (same rows as ever)
    assert(Dedup.simhashPairs(docs, 2).count() ===
      Dedup.simhashPairs(docs, 2, candidateCap = Long.MaxValue).count())
  }

  test("dupClusters: components labeled by min id; singletons self-labeled") {
    val d = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a_id", "b_id")
    val got = Dedup.dupClusters(d, pairs).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
    // a chain forces label propagation across multiple iterations
    val d2 = (1L to 8L).toDF("doc_id")
    val chain = (1L until 8L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val got2 = Dedup.dupClusters(d2, chain).as[(Long, Long)].collect()
    assert(got2.forall(_._2 == 1L), got2.mkString(","))
  }

  test("canonical: one keeper per cluster, the longest member, ties to lowest id") {
    // handcrafted clusters + lengths: {1,2,3} lens (5, 9, 9) → keep 2;
    // {4} singleton → keep 4; {5,6} lens (7, 7) → keep 5
    val d = Seq((1L, 5L), (2L, 9L), (3L, 9L), (4L, 3L), (5L, 7L), (6L, 7L))
      .toDF("doc_id", "n_chars")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 5L), (6L, 5L))
      .toDF("doc_id", "cluster_id")
    val got = Dedup.canonical(d, clusters)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 4L -> 4L, 5L -> 5L))
    // corpus-level invariants over the real LSH clusters
    val pairs = Dedup.minhashLsh(docs, 3, 16, 4, 5000)
    val cl = Dedup.dupClusters(docs, pairs).cache()
    val keep = Dedup.canonical(docs, cl)
    assert(keep.count() === cl.select($"cluster_id").distinct().count(),
      "exactly one keeper per cluster")
    // every keeper is a member of its cluster
    assert(keep.join(cl, keep("keep_id") === cl("doc_id") &&
      keep("cluster_id") === cl("cluster_id")).count() === keep.count())
    cl.unpersist()
  }

  test("dupClusters: local union-find and distributed loop agree") {
    val d2 = (1L to 8L).toDF("doc_id")
    val chain = (1L until 8L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val local = Dedup.dupClusters(d2, chain).as[(Long, Long)].collect().toSet
    // cap 0 forces the distributed min-label propagation branch
    val dist = Dedup.dupClusters(d2, chain, localEdgeCap = 0L)
      .as[(Long, Long)].collect().toSet
    assert(dist === local)
  }

  test("dupClusters over LSH pairs: consistent with the pair set") {
    val pairs = Dedup.minhashLsh(docs, 3, 16, 4, 5000).cache()
    val clusters = Dedup.dupClusters(docs, pairs).cache()
    assert(clusters.count() === docs.count())
    // paired docs always share a cluster
    val lab = clusters.withColumnRenamed("doc_id", "x")
    val broken = pairs
      .join(lab.select($"x".as("a_id"), $"cluster_id".as("ca")), "a_id")
      .join(lab.select($"x".as("b_id"), $"cluster_id".as("cb")), "b_id")
      .where($"ca" =!= $"cb")
    assert(broken.count() === 0)
    // cluster label is a member of the cluster
    val members = clusters.select($"cluster_id").distinct()
      .join(clusters.select($"doc_id"), $"cluster_id" === $"doc_id", "left_anti")
    assert(members.count() === 0)
  }

  test("exact embedding NN dedup never returns self and returns one row per vector") {
    val emb = Tables.embeddings(spark, sfDir)
    val nn = Dedup.embeddingNearestNeighborExact(emb, 1).cache()
    assert(nn.where($"qid" === $"id").count() === 0)
    assert(nn.count() === emb.count())
  }

  test("LSH embedding NN: no self pairs, candidates share a signature band") {
    val emb = Tables.embeddings(spark, sfDir)
    val nn = Dedup.embeddingLshNearestNeighbor(emb, dim = 64, k = 1).cache()
    assert(nn.count() > 0)
    assert(nn.where($"qid" === $"id").count() === 0)
    // every returned pair must share at least one 8-bit band of the 32-bit sig
    val sig = emb.select($"vec_id", Dedup.embedLshSig($"embedding", 64).as("sig"))
    val joined = nn
      .join(sig.select($"vec_id".as("qid"), $"sig".as("qsig")), "qid")
      .join(sig.select($"vec_id".as("id"), $"sig".as("nsig")), "id")
    val bandMatch = (0 until 4).map { b =>
      expr(s"(qsig >> ${8 * b}) & 255") === expr(s"(nsig >> ${8 * b}) & 255")
    }.reduce(_ || _)
    assert(joined.where(!bandMatch).count() === 0)
  }

  test("LSH embedding NN finds every true near-duplicate (cosine >= 0.95)") {
    val emb = Tables.embeddings(spark, sfDir)
    // true near-dups agree on almost all hyperplane signs → always candidates
    val exact = Dedup.embeddingNearestNeighborExact(emb, 1)
      .where(-$"dist" >= 0.95).select("qid", "id")
    val lsh = Dedup.embeddingLshNearestNeighbor(emb, dim = 64, k = 1)
      .select("qid", "id")
    assert(exact.exceptAll(lsh).count() === 0)
  }

  test("LSH embedding NN: corpus-relative band width") {
    // the auto rule holds expected bucket occupancy constant: floor 8
    // covers the oracle-gate corpora, one extra bit per doubling after
    // n=4096, capped at 14 so the 4-band signature stays inside a long
    assert(Dedup.autoBandBits(200) === 8)
    assert(Dedup.autoBandBits(2000) === 8)
    assert(Dedup.autoBandBits(20000) === 11)
    assert(Dedup.autoBandBits(200000) === 14)
    assert(Dedup.autoBandBits(1000000000L) === 14)
    // wider bands are strictly finer buckets of the same signs: every
    // returned pair still shares a wide band, no self pairs, and every
    // true near-dup (cosine >= 0.95) still collides — near-dups agree on
    // nearly every hyperplane sign, so band width barely affects them
    val emb = Tables.embeddings(spark, sfDir)
    val wide = Dedup.embeddingLshNearestNeighbor(emb, dim = 64, k = 1,
      bandBits = 11).cache()
    assert(wide.count() > 0)
    assert(wide.where($"qid" === $"id").count() === 0)
    val exact = Dedup.embeddingNearestNeighborExact(emb, 1)
      .where(-$"dist" >= 0.95).select("qid", "id")
    assert(exact.exceptAll(wide.select("qid", "id")).count() === 0)
  }
}
