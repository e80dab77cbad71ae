package graft

import graft.operators.Pipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sfDir).cache()

  test("deterministic split: total partition, stable across runs, sane proportions") {
    val s1 = Pipeline.deterministicSplit(docs, "doc_id", 80, 10)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val s2 = Pipeline.deterministicSplit(docs, "doc_id", 80, 10)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(s1 === s2, "split must be rerun-stable")
    assert(s1.size === docs.count())
    val frac = s1.values.groupBy(identity).view.mapValues(_.size.toDouble / s1.size).toMap
    assert(frac("train") > 0.7 && frac("train") < 0.9, s"train frac ${frac("train")}")
    assert(frac.getOrElse("val", 0.0) > 0.03, s"val frac ${frac.get("val")}")
    assert(frac.getOrElse("test", 0.0) > 0.03, s"test frac ${frac.get("test")}")
  }

  test("temperatureAllocate: seats sum to budget; sqrt flattens the head; skew-consistent") {
    // skewed synthetic measures so temperature has something to flatten
    // (the table's own sources are near-uniform at small SF)
    val m = docs.withColumn("m",
      ($"n_chars" * (substring($"source", 4, 4).cast("long") + lit(1L))))
    val out = Pipeline.temperatureAllocate(m, "source", $"m", budget = 100000L)
      .select($"source", $"tot", $"weight", $"alloc")
      .as[(String, Long, Long, Long)].collect()
    assert(out.map(_._4).sum === 100000L, "largest-remainder must hit budget exactly")
    assert(out.forall(_._4 >= 0))
    // weight is exactly floor(sqrt(tot)*1000)
    out.foreach { case (_, tot, w, _) =>
      assert(w === math.floor(math.sqrt(tot.toDouble) * 1000.0).toLong)
    }
    // allocation order follows measure order (sqrt is monotone)
    val byTot = out.sortBy(_._2)
    assert(byTot.map(_._4).zip(byTot.map(_._4).drop(1)).forall { case (a, b) => a <= b + 1 })
    // temperature flattens: the head/tail allocation ratio must sit well
    // below the raw measure ratio, near its square root
    val head = byTot.last
    val tail = byTot.head
    val rawRatio = head._2.toDouble / tail._2
    val allocRatio = head._4.toDouble / tail._4
    assert(allocRatio < rawRatio * 0.8,
      s"alloc ratio $allocRatio should flatten raw $rawRatio")
    assert(math.abs(allocRatio - math.sqrt(rawRatio)) / math.sqrt(rawRatio) < 0.05,
      s"alloc ratio $allocRatio should track sqrt(raw) ${math.sqrt(rawRatio)}")
    // α=0.25 flattens further
    val out2 = Pipeline.temperatureAllocate(m, "source", $"m",
      budget = 100000L, sqrtTimes = 2)
      .select($"source", $"alloc").as[(String, Long)].collect().toMap
    val allocRatio2 = out2(head._1).toDouble / out2(tail._1)
    assert(allocRatio2 < allocRatio, s"α=0.25 ratio $allocRatio2 vs α=0.5 $allocRatio")
  }

  test("buildSequences: md5 matches a JVM-side rebuild; doc counts total") {
    val out = Pipeline.buildSequences(docs, budget = 2000L)
      .select($"shard", $"n_docs", $"seq_md5")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(out.map(_._2).sum === docs.count())
    val assign = Pipeline.packShards(docs, 2000L)
      .select($"doc_id", $"shard").as[(Long, Long)].collect().toMap
    val texts = docs.select($"doc_id", $"text")
      .as[(Long, String)].collect().toMap
    val expected = assign.toSeq.groupBy(_._2).map { case (shard, docsIn) =>
      val seq = docsIn.map(_._1).sorted.map(texts).mkString("\u001E")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(seq.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      shard -> md
    }
    out.foreach { case (shard, _, got) =>
      assert(got === expected(shard), s"shard $shard sequence hash")
    }
  }

  test("materializeMixture: per-source sizes = min(alloc, population); deterministic; prefix-consistent") {
    val out = Pipeline.materializeMixture(docs, "source", "doc_id",
      $"n_chars", budget = 200L)
      .select($"source", $"doc_id", $"samp_rank")
      .as[(String, Long, Long)].collect()
    val alloc = Pipeline.temperatureAllocate(docs, "source", $"n_chars", 200L)
      .select($"source", $"alloc").as[(String, Long)].collect().toMap
    val pop = docs.groupBy($"source").count()
      .as[(String, Long)].collect().toMap
    val sizes = out.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    alloc.foreach { case (s, a) =>
      assert(sizes.getOrElse(s, 0L) === math.min(a, pop(s)),
        s"source $s: size ${sizes.get(s)} vs alloc $a pop ${pop(s)}")
    }
    // ranks are 1..size per source and the take is the stratifiedTake
    // prefix (same salt ⇒ same keys)
    out.groupBy(_._1).foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq)
    }
    val prefix = Pipeline.stratifiedTake(docs, "source", "doc_id",
      alloc.values.max.toInt, ":mix")
      .select($"source", $"doc_id", $"samp_rank")
      .as[(String, Long, Long)].collect()
      .filter { case (s, _, r) => r <= alloc(s) }.toSet
    assert(out.toSet === prefix)
    // rerun-stable
    val again = Pipeline.materializeMixture(docs, "source", "doc_id",
      $"n_chars", budget = 200L)
      .select($"source", $"doc_id", $"samp_rank")
      .as[(String, Long, Long)].collect().toSet
    assert(again === out.toSet)
  }

  test("sampleBySource: deterministic, keep = bucket < weight, rates track weights") {
    val weights = docs.select("source").distinct().collect().map(_.getString(0))
      .map(s => s -> (2000L + 500L * (s.stripPrefix("src").toLong % 9))).toMap
    val s1 = Pipeline.sampleBySource(docs, "doc_id", "source", weights).cache()
    // keep is exactly the bucket test
    assert(s1.where(($"sample_bucket" < $"weight_bp") =!= ($"keep" === 1)).count() === 0)
    // every input row appears once (the weight join drops nothing)
    assert(s1.count() === docs.count())
    // determinism across invocations
    val s2 = Pipeline.sampleBySource(docs, "doc_id", "source", weights)
    assert(s1.select("doc_id", "keep").except(s2.select("doc_id", "keep")).count() === 0)
    // aggregate keep rate lands near the mean weight (hash uniformity;
    // loose bound — per-source counts are small at this SF)
    val meanW = weights.values.sum.toDouble / weights.size / 10000
    val rate = s1.where($"keep" === 1).count().toDouble / s1.count()
    assert(math.abs(rate - meanW) < 0.1, s"rate $rate vs mean weight $meanW")
    // salt decouples sampling from the split bucket: changing it changes
    // the kept set (overwhelmingly likely on 500 docs)
    val s3 = Pipeline.sampleBySource(docs, "doc_id", "source", weights, salt = ":other")
    assert(s1.select("doc_id", "keep").except(s3.select("doc_id", "keep")).count() > 0)
    s1.unpersist()
  }

  test("cleanFunnel flags equal the standalone operators; kept is their conjunction") {
    val bench = docs.where($"doc_id" % 20 === 0)
    val corpus = docs.where($"doc_id" % 20 =!= 0)
    val weights = docs.select("source").distinct().collect().map(_.getString(0))
      .map(s => s -> (2000L + 500L * (s.stripPrefix("src").toLong % 9))).toMap
    val f = Pipeline.cleanFunnel(corpus, bench, weights, 3).cache()
    assert(f.count() === corpus.count())
    // kept is exactly the conjunction of the four stage flags
    assert(f.where(($"kept" === 1) =!= ($"quality_flag" === 1 && $"is_dup" === 0 &&
      $"contaminated" === 0 && $"sample_keep" === 1)).count() === 0)
    // the funnel is selective but not degenerate at this SF
    val nKept = f.where($"kept" === 1).count()
    assert(nKept > 0 && nKept < corpus.count())
    // each flag equals its standalone operator
    assert(f.select("doc_id", "quality_flag").except(
      graft.operators.Text.qualityScore(corpus).select("doc_id", "quality_flag"))
      .count() === 0)
    assert(f.select("doc_id", "is_dup").except(
      graft.operators.Dedup.exactDedup(corpus).select("doc_id", "is_dup"))
      .count() === 0)
    assert(f.select("doc_id", "contaminated").except(
      graft.operators.Dedup.decontaminate(corpus, bench, 3)
        .select("doc_id", "contaminated")).count() === 0)
    f.unpersist()
  }

  test("repetition: handcrafted scores and corpus invariants") {
    val tiny = Seq((1L, "x y x y x y"), (2L, "a a a a"), (3L, "p q r s"))
      .toDF("doc_id", "text")
    val r = graft.operators.Text.repetition(tiny, 2)
      .select($"doc_id", $"n_grams", $"top_tf", $"rep_bp")
      .as[(Long, Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    // "x y x y x y": grams xy,yx,xy,yx,xy → 5 grams, top 3 → 6000 bp
    assert(r(1L) === ((1L, 5L, 3L, 6000L)))
    // "a a a a": aa×3 → fully repetitious
    assert(r(2L) === ((2L, 3L, 3L, 10000L)))
    // all-distinct grams → 3 grams, top 1
    assert(r(3L) === ((3L, 3L, 1L, 3333L)))
    // corpus invariants: top_tf ≤ n_grams, rep_bp ∈ (0, 10000],
    // n_grams = n_tokens − 1 for every doc with ≥ 2 tokens
    val rep = graft.operators.Text.repetition(docs, 2).cache()
    assert(rep.where($"top_tf" > $"n_grams" || $"rep_bp" <= 0 || $"rep_bp" > 10000)
      .count() === 0)
    val joined = rep.join(graft.operators.Text.tokenStats(docs), "doc_id")
    assert(joined.where($"n_grams" =!= $"n_tokens" - 1).count() === 0)
    rep.unpersist()
  }

  test("lmFamiliarity: handcrafted scores and ranking behavior") {
    // corpus: "a b" appears in docs 1 and 2 (3 occurrences total), every
    // other transition once — docs made of common transitions score high
    val tiny = Seq(
      (1L, "a b a b"),   // grams: ab, ba, ab → fam (3+1+3)/3
      (2L, "a b"),       // gram: ab → fam 3/1
      (3L, "p q"),       // gram: pq → fam 1/1
      (4L, "z"))         // < 2 tokens → drops out
      .toDF("doc_id", "text")
    val r = graft.operators.Text.lmFamiliarity(tiny)
      .select($"doc_id", $"n_bigrams", $"fam_sum", $"centi_fam")
      .as[(Long, Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    assert(r(1L) === ((1L, 3L, 7L, 233L)))
    assert(r(2L) === ((2L, 1L, 3L, 300L)))
    assert(r(3L) === ((3L, 1L, 1L, 100L)))
    assert(!r.contains(4L))
    // the common-transition docs outrank the rare-transition doc — the
    // thresholding use a CCNet-style quality funnel puts it to
    assert(r(2L)._4 > r(3L)._4 && r(1L)._4 > r(3L)._4)
    // corpus invariants: every score ≥ 100 (each gram counts itself),
    // and docs with ≥2 tokens are all present
    val fam = graft.operators.Text.lmFamiliarity(docs).cache()
    assert(fam.where($"centi_fam" < 100).count() === 0)
    val withGrams = graft.operators.Text.tokenStats(docs)
      .where($"n_tokens" >= 2)
    assert(fam.count() === withGrams.count())
    fam.unpersist()
  }

  test("corpusStats exact counts; HLL vocabulary estimate within 5%") {
    val stats = graft.operators.Text.corpusStats(docs).head()
    val nDocs = stats.getLong(0)
    val nVocab = stats.getLong(2)
    assert(nDocs === docs.count())
    assert(stats.getLong(1) > nDocs, "tokens outnumber docs")
    // the 100 TB cardinality path: HyperLogLog++ sketch, one pass — must
    // land within its documented error envelope of the exact answer
    val approx = graft.operators.Text.tokens(docs)
      .agg(approx_count_distinct(col("term"), 0.02).as("v"))
      .head().getLong(0)
    assert(math.abs(approx - nVocab).toDouble / nVocab <= 0.05,
      s"HLL $approx vs exact $nVocab")
  }

  test("rankGlobal/ntileExact equal the single-window reference; buckets balanced") {
    import org.apache.spark.sql.expressions.Window
    val scored = graft.operators.Text.tokenStats(docs)
      .select($"doc_id".cast("long"), $"n_tokens".cast("long"))
    val order = Seq($"n_tokens".desc, $"doc_id".asc)
    val got = Pipeline.ntileExact(scored, order, 10)
      .select($"doc_id", $"grank", $"bucket")
      .as[(Long, Long, Long)].collect().toSet
    val total = scored.count()
    val ref = scored
      .withColumn("grank", row_number().over(
        Window.orderBy($"n_tokens".desc, $"doc_id".asc)).cast("long"))
      .withColumn("bucket", expr(s"((grank - 1) * 10) div $total"))
      .select($"doc_id", $"grank", $"bucket")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === ref)
    // bucket sizes differ by at most one
    val sizes = got.groupBy(_._3).map(_._2.size)
    assert(sizes.max - sizes.min <= 1, s"bucket sizes $sizes")
    assert(sizes.size === 10)
  }

  test("rankGlobal leaves no entry in the SQL CacheManager") {
    // the ranked output pins at the RDD level (ContextCleaner-reclaimed);
    // a DataFrame.persist here would be held until an explicit unpersist,
    // leaking a full-corpus cache to library callers that drop the frame
    // (ADVICE r11). The CacheManager must stay empty through a full
    // rank + consume cycle.
    spark.sqlContext.clearCache()
    val scored = graft.operators.Text.tokenStats(docs)
      .select($"doc_id".cast("long"), $"n_tokens".cast("long"))
    val ranked = Pipeline.rankGlobal(scored,
      Seq($"n_tokens".desc, $"doc_id".asc))
    assert(ranked.count() > 0)
    assert(spark.sharedState.cacheManager.isEmpty,
      "rankGlobal must not register a CacheManager entry")
  }

  test("stratifiedTake: exact per-stratum counts, deterministic, rerun-stable") {
    val take = Pipeline.stratifiedTake(docs, "lang", "doc_id", 7)
    val perLang = take.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val avail = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    avail.foreach { case (lang, n) =>
      assert(perLang.getOrElse(lang, 0L) === math.min(n, 7L), lang)
    }
    // rerun-stable (hash order, not rand())
    val a = take.select("doc_id").as[Long].collect().sorted.toSeq
    val b = Pipeline.stratifiedTake(docs, "lang", "doc_id", 7)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a === b)
    // a different salt draws a different sample (the knob is real)
    val c = Pipeline.stratifiedTake(docs, "lang", "doc_id", 7, salt = ":other")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a !== c)
  }

  test("distributed prefix-sum packing equals the single-window form exactly") {
    // packShards composes per-partition offsets (two-pass distributed
    // prefix sum); the single-task global window is the semantic reference
    import org.apache.spark.sql.expressions.Window
    val budget = 2000L
    val counts = graft.operators.Text.tokenStats(docs)
      .select($"doc_id".cast("long"), $"n_tokens".cast("long"))
    val w = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = counts
      .withColumn("cum_before", sum("n_tokens").over(w) - $"n_tokens")
      .withColumn("shard", expr(s"cum_before div $budget"))
      .select("doc_id", "n_tokens", "shard")
      .as[(Long, Long, Long)].collect().toSet
    val got = Pipeline.packShards(docs, budget)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === ref)
  }

  test("budget >= total tokens packs everything into shard 0") {
    val got = Pipeline.packShards(docs, budget = Long.MaxValue / 4)
      .select("shard").distinct().as[Long].collect().toSeq
    assert(got === Seq(0L))
  }

  test("shard packing: contiguous, budget-bounded up to one document") {
    val budget = 2000L
    val shards = Pipeline.packShards(docs, budget)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(shards.length === docs.count())
    // shard ids are non-decreasing along doc order (contiguous packing)
    assert(shards.map(_._3).toSeq === shards.map(_._3).sorted.toSeq)
    // every shard's total stays under budget + its largest doc (the
    // straddling doc is the only allowed overflow)
    shards.groupBy(_._3).foreach { case (shard, ds) =>
      val total = ds.map(_._2).sum
      val maxDoc = ds.map(_._2).max
      assert(total <= budget + maxDoc, s"shard $shard total $total")
    }
    // no empty shards in the id range
    val ids = shards.map(_._3).distinct.sorted
    assert(ids.toSeq === (ids.min to ids.max).toSeq)
  }
  test("redactPii: counts and replacements on handcrafted edges; clean docs untouched") {
    import graft.operators.Text
    val docs = Seq(
      (0L, "mail a@b.io and c.d+x@e-f.org here"),            // two emails
      (1L, "ips 10.0.0.1 then 255.255.255.255 end"),         // two ips
      (2L, "call 555-123-4567 or 800-555-0199 now"),         // two phones
      (3L, "plain text with no pii at all"),                  // nothing
      (4L, "mixed a@b.co 1.2.3.4 555-000-1111")               // one of each
    ).toDF("doc_id", "text")
    val out = Text.redactPii(docs)
      .select($"doc_id", $"n_emails", $"n_ips", $"n_phones", $"text_clean")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out(0) === ((0L, 2L, 0L, 0L, "mail <EMAIL> and <EMAIL> here")))
    assert(out(1) === ((1L, 0L, 2L, 0L, "ips <IP> then <IP> end")))
    assert(out(2) === ((2L, 0L, 0L, 2L, "call <PHONE> or <PHONE> now")))
    assert(out(3) === ((3L, 0L, 0L, 0L, "plain text with no pii at all")))
    assert(out(4) === ((4L, 1L, 1L, 1L, "mixed <EMAIL> <IP> <PHONE>")))
  }

}
