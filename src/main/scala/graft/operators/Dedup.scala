package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines: exact
  * (content hash), n-gram Jaccard similarity join, MinHash+LSH banding,
  * SimHash, and embedding-space nearest-neighbor dedup.
  *
  * All hashing is md5-based and byte-identical between Spark and DuckDB so
  * the driver's oracle compare is deterministic even for the probabilistic
  * LSH path (same hashes → same buckets → same candidate set on both sides).
  *
  * Scale design: every operator is a pure shuffle-on-key dataflow — no
  * driver-side collections. The all-pairs steps (Jaccard verify, SimHash
  * pair scan) are candidate-driven: LSH banding or band-key grouping bounds
  * the join fan-out, so the quadratic blowup never materializes; a frequency
  * cap on shingles (`maxDf`) bounds hot-key skew the same way the reference
  * caps exploration (/root/reference/filter/hnsw/hnswalg.h:641-647 bounds
  * the ef beam).
  */
object Dedup {

  /** Exact dedup: canonical id = min doc_id per content hash. The
    * hash-groupBy shuffles only (fp, doc_id) pairs; at 100 TB this is the
    * standard first pass before any near-dup method. */
  def exactDedup(docs: DataFrame): DataFrame = {
    val fp = docs.select(col("doc_id"), md5(col("text")).as("fp"))
    val canon = fp.groupBy("fp").agg(min("doc_id").as("canonical_id"))
    fp.join(canon, "fp")
      .select(col("doc_id"), col("canonical_id"),
        (col("doc_id") =!= col("canonical_id")).cast("int").as("is_dup"))
  }

  /** Distinct word n-gram shingles per document: (doc_id, shingle).
    * Dedup happens per-doc with array_distinct BEFORE the explode — set
    * semantics without a global distinct shuffle (a doc's shingles all live
    * in its own row). */
  def shingles(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"), explode(shingleArray(n)).as("shingle"))

  /** Per-doc distinct shingle array as a column (map-side only). */
  private def shingleArray(n: Int): Column = {
    val toks = split(col("text"), " ")
    array_distinct(when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - n + 1),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>")))
  }

  /** Benchmark decontamination: flag corpus documents sharing any word
    * n-gram with an evaluation/benchmark set — the standard pre-training
    * hygiene pass ("drop training docs with n-gram overlap against the
    * test set"). Returns EVERY corpus doc: (doc_id, n_hits = distinct
    * overlapping grams, contaminated 0/1).
    *
    * Scale shape: the benchmark side is small by definition, so its
    * distinct grams BROADCAST and the corpus-side probe is map-side — the
    * only shuffle is the per-doc groupBy of hits; the corpus never joins
    * itself (contrast [[jaccardPairs]]). At 100 TB hash grams to longs
    * (xxhash64) to shrink the broadcast and verify the few hits exactly;
    * here grams join as strings so the driver oracle replicates the
    * comparison byte-for-byte. */
  def decontaminate(corpus: DataFrame, bench: DataFrame, n: Int): DataFrame = {
    // shingles() is per-doc distinct, so count(*) counts distinct overlaps
    val hits = shingles(corpus, n)
      .join(broadcast(shingles(bench, n).select("shingle").distinct()), "shingle")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    corpus.select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).cast("int").as("contaminated"))
  }

  /** Cross-document repeated token spans — the ExactSubstr dedup signal
    * (Lee et al., "Deduplicating Training Data Makes Language Models
    * Better", arXiv:2107.06499) at token-window granularity: every length-n
    * token window of every doc, flagged when the identical window text
    * occurs in at least one OTHER document. Returns one row per doc with
    * windows: (doc_id, n_windows, n_shared, shared_bp) — the per-doc
    * repeated-span budget a span-level trimmer would act on.
    *
    * Scale shape: windows explode map-side (position semantics — duplicate
    * grams within a doc count per occurrence, unlike [[shingles]]); the
    * only shuffle keys on the gram, and the cross-doc flag is
    * min(doc_id) ≠ max(doc_id) per gram — a partial-combining min/max agg,
    * NOT a countDistinct and never a self-join, so a boilerplate gram in a
    * billion docs costs two longs, not a fan-out. */
  def repeatedSpans(docs: DataFrame, n: Int): DataFrame = {
    val toks = split(col("text"), " ")
    val wins = docs.select(col("doc_id"),
      explode(when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - n + 1),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
        .otherwise(array().cast("array<string>"))).as("gram"))
    val gdf = wins.groupBy("gram")
      .agg((min("doc_id") =!= max("doc_id")).as("shared"))
    wins.join(gdf, "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("shared"), 1L).otherwise(0L)).as("n_shared"))
      .withColumn("shared_bp", expr("(10000 * n_shared) div n_windows"))
  }

  /** Span TRIMMING — the action half of ExactSubstr dedup
    * (arXiv:2107.06499 removes the repeated spans it finds): drop every
    * token covered by any length-n window whose text recurs in another
    * document, and re-join the survivors in order. Returns every doc:
    * (doc_id, n_tokens, n_kept, text_clean) — text_clean = '' when the
    * whole doc was cross-doc boilerplate.
    *
    * Same scale shape as [[repeatedSpans]]: the only shuffle keys on the
    * gram (min≠max flag); coverage expansion (window → its n token
    * positions) is map-side; the rebuild is one per-doc aggregation of the
    * kept tokens. */
  def trimSharedSpans(docs: DataFrame, n: Int): DataFrame = {
    val toks = split(col("text"), " ")
    val grams = when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - n + 1),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
    val tokens = docs.select(col("doc_id"),
      posexplode(toks).as(Seq("ti", "tok"))) // ti 0-based
    val wins = docs.select(col("doc_id"),
      posexplode(grams).as(Seq("wi", "gram"))) // wi 0-based
    val sharedGrams = wins.groupBy("gram")
      .agg((min("doc_id") =!= max("doc_id")).as("shared"))
      .where(col("shared")).select("gram")
    val covered = wins.join(sharedGrams, "gram")
      .select(col("doc_id"),
        explode(sequence(col("wi"), col("wi") + (n - 1))).as("ti"))
      .distinct()
    val kept = tokens.join(covered, Seq("doc_id", "ti"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("ti"), col("tok")))),
          x => x.getField("tok")), " ").as("text_clean"))
    docs.select(col("doc_id"), size(toks).cast("long").as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  /** All-pairs n-gram Jaccard similarity join: pairs (a_id < b_id) with
    * Jaccard ≥ minBp basis points. Shuffle is keyed on shingle; a shingle
    * appearing in d docs contributes d² join rows, so at scale drop
    * ultra-frequent shingles first (stopword n-grams carry no dedup
    * signal) — see [[minhashLsh]] for the bounded-fan-out variant.
    *
    * The shingle set is persisted internally (it feeds three plan
    * branches); the pair set is computed EAGERLY (localCheckpoint) so the
    * shingle cache can be released before returning — no caching contract
    * leaks to the caller, and the returned frame's lineage is truncated
    * (the pair set is the operator's output; a dedup pipeline materializes
    * it regardless). */
  def jaccardPairs(docs: DataFrame, n: Int, minBp: Int,
                   maxDf: Int = Int.MaxValue): DataFrame = {
    // the shingle set feeds three plan branches (a-side, b-side, sizes);
    // persist so tokenize+explode+distinct runs once, not three times
    val sh0 = shingles(docs, n).persist()
    // maxDf: drop shingles appearing in more than maxDf docs BEFORE the
    // self-join — a shingle in d docs contributes d² join rows, and
    // stopword-frequency n-grams carry no dedup signal. Jaccard is then
    // computed over the reduced shingle space (sizes too), the standard
    // df-capped construction. Default = uncapped (the oracle baseline).
    // the CAPPED set also feeds all three branches, so persist it too —
    // otherwise the df aggregation + anti-join rerun once per branch (the
    // capped variant measured 2× the uncapped one for strictly less work)
    val sh =
      if (maxDf == Int.MaxValue) sh0
      else {
        val hot = sh0.groupBy("shingle").agg(count(lit(1)).as("df"))
          .where(col("df") > maxDf).select("shingle")
        sh0.join(broadcast(hot), Seq("shingle"), "left_anti").persist()
      }
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
    val inter = sh.select(col("doc_id").as("a_id"), col("shingle"))
      .join(sh.select(col("doc_id").as("b_id"), col("shingle")), "shingle")
      .where(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
    val pairs = jaccardOf(inter, sz).where(col("jaccard_bp") >= minBp)
      .select("a_id", "b_id", "jaccard_bp")
      .localCheckpoint(true) // eager: materialize pairs, then free shingles
    sh0.unpersist()
    if (!(sh eq sh0)) sh.unpersist()
    pairs
  }

  /** (a_id, b_id, inter) × per-doc sizes → integer basis-point Jaccard. */
  private def jaccardOf(inter: DataFrame, sz: DataFrame): DataFrame =
    inter
      .join(sz.select(col("doc_id").as("a_id"), col("nsh").as("na")), "a_id")
      .join(sz.select(col("doc_id").as("b_id"), col("nsh").as("nb")), "b_id")
      .withColumn("jaccard_bp",
        expr("(10000 * inter) div (na + nb - inter)"))

  /** Portable 60-bit hash: first 15 hex digits of md5, as a long. DuckDB
    * equivalent: `('0x' || substr(md5(s), 1, 15))::BIGINT`. */
  private def md5Long60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** MinHash signatures: one row (doc_id, seed, mh) per doc per hash seed,
    * mh = min over the doc's shingles of (H(shingle) XOR mask(seed)) — one
    * md5 per shingle, then a cheap XOR per seed (each mask defines its own
    * permutation of the hash space), instead of numSeeds md5 calls per
    * shingle. The seed expansion is map-side (explode), the min is a
    * partial-aggregating groupBy — shuffle carries numSeeds rows per doc.
    * DuckDB reproduces it exactly: xor(md5_60(shingle), md5_60('seed:'||s)). */
  def minhash(docs: DataFrame, n: Int, numSeeds: Int): DataFrame =
    minhashOf(shingles(docs, n), numSeeds)

  /** MinHash over a prebuilt (doc_id, shingle) set. */
  def minhashOf(sh: DataFrame, numSeeds: Int): DataFrame = {
    // per-seed masks folded to literals (same md5 the oracle recomputes)
    val masks = (0 until numSeeds).map { s =>
      struct(lit(s).as("seed"), lit(md5Long60Local(s"seed:$s")).as("mask"))
    }
    sh
      .withColumn("h0", md5Long60(col("shingle")))
      .withColumn("sm", explode(array(masks: _*)))
      .select(col("doc_id"), col("sm.seed").as("seed"),
        col("h0").bitwiseXOR(col("sm.mask")).as("h"))
      .groupBy("doc_id", "seed").agg(min("h").as("mh"))
  }

  /** Driver-side twin of [[md5Long60]] for literal mask folding. */
  private def md5Long60Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  /** LSH band keys: group the signature into bands of `rowsPerBand` seeds,
    * key = the band's minhash values joined in seed order. Docs sharing any
    * band key are candidate near-dups (the classic banding construction). */
  def lshBands(mh: DataFrame, rowsPerBand: Int): DataFrame =
    mh.withColumn("band", expr(s"seed div $rowsPerBand"))
      .groupBy("doc_id", "band")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("seed"), col("mh")))),
          x => x.getField("mh").cast("string")), "-").as("bkey"))

  /** MinHash+LSH near-dup pairs, exact-verified: band-bucket self-join →
    * distinct candidate pairs → candidate-driven exact Jaccard ≥ minBp.
    * Unlike [[jaccardPairs]] the shingle join here is restricted to LSH
    * candidates, so fan-out is bounded by bucket sizes — this is the path
    * that survives 100 TB. */
  def minhashLsh(docs: DataFrame, n: Int, numSeeds: Int, rowsPerBand: Int,
                 minBp: Int): DataFrame = {
    // ONE wide aggregation computes all numSeeds minhashes per doc, so the
    // signature pipeline shuffles numSeeds longs per doc — never the shingle
    // sets themselves. Band keys derive map-side; the self-join touches only
    // band-key groups. Verification is CANDIDATE-FIRST: the (tiny) candidate
    // doc-id set broadcasts back against the map-side shingle stream, so the
    // exact-Jaccard joins shuffle only candidate docs' shingles — the corpus
    // text is re-SCANNED (map-side, no shuffle) but never re-shuffled.
    val minCols = (0 until numSeeds).map { s =>
      min(col("h0").bitwiseXOR(lit(md5Long60Local(s"seed:$s")))).as(s"mh$s")
    }
    val sh = shingles(docs, n) // map-side: tokenize + n-gram + distinct per row
    val perDoc = sh
      .withColumn("h0", md5Long60(col("shingle")))
      .groupBy("doc_id")
      .agg(minCols.head, minCols.tail: _*)
    val numBands = numSeeds / rowsPerBand
    val bandStructs = (0 until numBands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("-", (0 until rowsPerBand)
          .map(r => col(s"mh${b * rowsPerBand + r}").cast("string")): _*).as("bkey"))
    }
    val bands = perDoc.select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    val cand = bands.select(col("doc_id").as("a_id"), col("band"), col("bkey"))
      .join(bands.select(col("doc_id").as("b_id"), col("band"), col("bkey")),
        Seq("band", "bkey"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    // exact verification restricted to candidate docs: broadcast-semi-join
    // prunes the shingle stream map-side before any shuffle
    val candDocs = cand.select(col("a_id").as("doc_id"))
      .union(cand.select(col("b_id").as("doc_id"))).distinct()
    val shCand = sh.join(broadcast(candDocs), Seq("doc_id"), "left_semi")
    val sz = shCand.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
    val inter = broadcast(cand)
      .join(shCand.select(col("doc_id").as("a_id"), col("shingle")), "a_id")
      .join(shCand.select(col("doc_id").as("b_id"), col("shingle")),
        Seq("b_id", "shingle"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
    jaccardOf(inter, sz).where(col("jaccard_bp") >= minBp)
      .select("a_id", "b_id", "jaccard_bp")
  }

  /** 32-bit SimHash over term frequencies: bit i of the signature is set
    * iff the tf-weighted sum of (±1 per term, sign = bit i of the term's
    * 32-bit hash) is positive. Fully relational: the 32× bit expansion is
    * map-side, both aggregations combine partially. */
  def simhash(docs: DataFrame): DataFrame = {
    // 32 conditional sums in ONE aggregation — no 32× row explosion, one
    // shuffle (keyed on doc_id) instead of two; the signature assembles
    // map-side from the aggregated bit balances
    val bitSums = (0 until 32).map { i =>
      sum(when(expr(s"shiftright(h, $i) & 1") === 1, col("tf"))
        .otherwise(-col("tf"))).as(s"s$i")
    }
    val sig = (0 until 32).map { i =>
      when(col(s"s$i") > 0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)
    Text.termFreq(docs)
      .withColumn("h", conv(substring(md5(col("term")), 1, 8), 16, 10).cast("long"))
      .groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs: Hamming distance ≤ maxHamming, via the
    * pigeonhole byte-band join — the 32-bit signature splits into 4 bytes;
    * hamming ≤ 3 flips at most 3 bytes, so near-dup pairs SHARE at least one
    * byte value. Candidates come from an equi-join on (band, byte) — the
    * shuffle is keyed on byte-band buckets, never all-pairs — and the exact
    * Hamming check then verifies. Lossless for maxHamming ≤ 3.
    *
    * Scale note: 8-bit bands give ≤ 4·256 distinct bucket keys, so bucket
    * populations grow with n/256 and the within-bucket pair check grows
    * quadratically in them — after tens of millions of docs the
    * lossless-hamming construction needs longer signatures with more bands
    * (multi-index hashing), or switch to [[minhashLsh]], whose
    * content-derived band keys keep buckets corpus-size-independent. That
    * boundary is ENFORCED, not just documented: before the join runs, the
    * bucket histogram estimates the candidate-pair volume (Σ count² over
    * buckets — one cheap aggregation), and past `candidateCap` the operator
    * raises with the hand-off instruction rather than launching a join
    * whose cost the caller didn't sign up for. */
  def simhashPairs(docs: DataFrame, maxHamming: Int,
                   candidateCap: Long = 100000000L): DataFrame = {
    require(maxHamming <= 3,
      s"4-byte pigeonhole banding is lossless only for hamming <= 3, got $maxHamming")
    val sig = simhash(docs)
    val bandStructs = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        expr(s"(simhash >> ${8 * b}) & 255").as("bval"))
    }
    // plan leaf: the guard aggregation below materializes the bands once;
    // the join then reuses the same rows instead of recomputing the
    // signature aggregation twice
    val bands = sig.select(col("doc_id"), col("simhash"),
        explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("simhash"),
        col("bk.band").as("band"), col("bk.bval").as("bval"))
      .localCheckpoint()
    val estPairs = bands.groupBy("band", "bval")
      .agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(col("c") * col("c")), lit(0L)))
      .head().getLong(0)
    require(estPairs <= candidateCap,
      s"simhashPairs bucket histogram estimates $estPairs candidate pairs " +
        s"(cap $candidateCap): this corpus is past the 4x256-bucket " +
        "pigeonhole regime — use minhashLsh (content-derived band keys) " +
        "or raise candidateCap explicitly")
    bands.select(col("doc_id").as("a_id"), col("simhash").as("sa"),
        col("band"), col("bval"))
      .join(bands.select(col("doc_id").as("b_id"), col("simhash").as("sb"),
        col("band"), col("bval")), Seq("band", "bval"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "sa", "sb").distinct()
      .withColumn("hamming", expr("bit_count(sa ^ sb)").cast("long"))
      .where(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
  }

  /** Near-duplicate CLUSTERS: connected components over a near-dup pair set
    * (e.g. [[minhashLsh]]'s output) — the canonicalization step every dedup
    * pipeline ends with (keep one doc per component). Returns
    * (doc_id, cluster_id) for EVERY doc; cluster_id = the component's
    * minimum doc_id (singletons cluster to themselves).
    *
    * Iterative min-label propagation: label(v) ← min(label(v), labels of
    * v's neighbors) until fixpoint. Labels only decrease, so convergence is
    * detected by the (cheap, single-agg) label sum. Near-dup components
    * have tiny diameters, so iterations stay in the single digits; each one
    * shuffles the (small) edge set plus one labels pass — no driver-side
    * graph. */
  def dupClusters(docs: DataFrame, pairs: DataFrame,
                  localEdgeCap: Long = 1000000L): DataFrame = {
    // localCheckpoint (not persist) each round: iterative joins grow the
    // lineage linearly, and re-analysis/replanning of the growing plan —
    // not the data — dominates the loop's cost. Checkpointing truncates the
    // plan to the materialized partitions. (At cluster scale pair state
    // with reliable checkpointing; the dataflow is identical.)
    //
    // Checkpoint the PAIRS, not the symmetric closure: a union of two
    // projections over the un-materialized `pairs` plan evaluates the
    // whole upstream candidate pipeline (LSH banding + exact verification)
    // TWICE — Spark does not dedupe common subtrees across union branches.
    // Materializing the half-sized pair set once and deriving both edge
    // directions from the checkpoint halves the dominant cost of this
    // operator (guide §2.4: remove duplicated subtree evaluation).
    val p0 = pairs.select(col("a_id"), col("b_id")).localCheckpoint(true)
    val edges = p0
      .select(col("a_id").as("src"), col("b_id").as("dst"))
      .unionByName(p0.select(col("b_id").as("src"), col("a_id").as("dst")))
    if (p0.isEmpty) return docs.select(col("doc_id"), col("doc_id").as("cluster_id"))
    // iterate ONLY over edge-incident vertices (≤ 2·|pairs|): a doc in no
    // near-dup pair is its own singleton cluster forever, so the corpus
    // never enters the loop — at 100 TB the iterated frame is the near-dup
    // SUBGRAPH (tiny by dedup's premise), not the corpus. Singletons join
    // back once at the end, map-side.
    //
    // Selectivity-adaptive execution (the same two-regime split as the
    // filter-track planner): a subgraph under `localEdgeCap` edges resolves
    // with driver-side union-find — one job instead of 2 per propagation
    // round; larger subgraphs take the distributed min-label loop. Both
    // produce cluster_id = min doc_id of the component.
    val spark = docs.sparkSession
    // the cap semantics stay on the DIRECTED edge count (2·|pairs|), but
    // only the half-sized pair set ever crosses to the driver: union-find
    // is symmetric, so the reverse direction of each pair was a no-op
    val nEdges = 2L * p0.count()
    val labels =
      if (nEdges <= localEdgeCap) {
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x
          while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        p0.select("a_id", "b_id").collect().foreach { row =>
          val (a, b) = (find(row.getLong(0)), find(row.getLong(1)))
          if (a != b) { if (a < b) parent(b) = a else parent(a) = b }
        }
        val keys = parent.keySet.toSeq
        import spark.implicits._
        (keys ++ keys.map(find)).distinct
          .map(v => (v, find(v))).toDF("doc_id", "cluster_id")
      } else {
        var l = edges.select(col("src").as("doc_id")).distinct()
          .withColumn("cluster_id", col("doc_id")).localCheckpoint(true)
        var prevSum = l.agg(sum("cluster_id")).head().getLong(0)
        var converged = false
        while (!converged) {
          val neigh = edges
            .join(l.select(col("doc_id").as("src"), col("cluster_id").as("nl")), "src")
            .groupBy(col("dst").as("doc_id")).agg(min("nl").as("nmin"))
          l = l.join(neigh, Seq("doc_id"), "left")
            .select(col("doc_id"),
              least(col("cluster_id"), coalesce(col("nmin"), col("cluster_id")))
                .as("cluster_id"))
            .localCheckpoint(true)
          val nextSum = l.agg(sum("cluster_id")).head().getLong(0)
          converged = nextSum == prevSum
          prevSum = nextSum
        }
        l
      }
    // singletons re-enter map-side; the label table is broadcastable only
    // in the bounded local regime
    val labelSide = if (nEdges <= localEdgeCap) broadcast(labels) else labels
    docs.select(col("doc_id"))
      .join(labelSide, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
  }

  /** Exact embedding-space dedup scan: each vector's nearest other vector by
    * cosine (k=1, self excluded) — the all-pairs oracle baseline for
    * [[embeddingLshNearestNeighbor]], same role [[jaccardPairs]] plays for
    * [[minhashLsh]]. O(n²): use only to grade the LSH path on samples. */
  def embeddingNearestNeighborExact(emb: DataFrame, k: Int): DataFrame = {
    val q = emb.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val b = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    Knn.knnJoin(q, b, k, Metric.Cosine, Some(col("qid") =!= col("id")))
  }

  /** Driver-side integer hyperplane coefficient in [-1000, 1000], md5-derived
    * so the SQL oracle recomputes it bit-identically:
    * (first-8-hex-of-md5("hp:j:i") % 2001) − 1000. */
  private[graft] def hpCoef(j: Int, i: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"hp:$j:$i".getBytes("UTF-8"))
    val v = java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    (v % 2001) - 1000
  }

  /** 32-bit random-hyperplane (SimHash-for-vectors) signature, pure INTEGER
    * arithmetic: the vector quantizes to floor(x·100) longs, each hyperplane
    * is a literal array of md5-derived integer coefficients, and bit j is
    * sign(⟨q, h_j⟩). Integer dots make the sign decision exact on any
    * engine — no float-accumulation-order hazard — so LSH buckets are
    * oracle-reproducible. Entirely map-side: one projection, no shuffle. */
  def embedLshSig(vecCol: Column, dim: Int, nBits: Int = 32): Column = {
    val qv = transform(vecCol, x => floor(x.cast("double") * lit(100)).cast("long"))
    (0 until nBits).map { j =>
      val hj = array((0 until dim).map(i => lit(hpCoef(j, i))): _*)
      when(aggregate(zip_with(qv, hj, (x, h) => x * h), lit(0L),
        (acc, x) => acc + x) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Corpus-relative LSH band width: wide enough bands that the EXPECTED
    * bucket holds ~16 unrelated vectors regardless of corpus size. The
    * candidate join generates Σ|bucket|² pairs per band; with a FIXED
    * band width buckets grow ∝ n and the join grows ∝ n² — measured: one
    * aggregation task owning 31 CPU-minutes at 200k rows where 20k rows
    * took 20 s. Constant expected occupancy makes candidate volume ∝ n.
    * Floor 8 = the oracle gate's pinned width (sf0.01/sf0.1 corpora sit
    * at or under the floor, so gate semantics never move); cap 14 keeps
    * the 4-band signature inside a long with sign headroom. */
  def autoBandBits(n: Long): Int =
    math.min(14, math.max(8,
      math.ceil(math.log(n / 16.0) / math.log(2)).toInt))

  /** Embedding near-dup dedup, LSH-bucketed (the 100 TB path): signatures
    * map-side, candidates from a 4×`bandBits`-bit band equi-join
    * (bucket-keyed shuffle — never all-pairs), then each vector's nearest
    * CANDIDATE by exact cosine. True near-dups (cosine → 1) agree on
    * nearly every hyperplane sign, so they always share a band; unrelated
    * vectors share one with p ≈ 4/2^bandBits. Returns (qid, id, dist,
    * rank); vectors with no candidate emit no row. Reference analog: the
    * brute-force scan (/root/reference/filter/hnsw/bruteforce.h:10-172)
    * replaced by the banding construction of [[minhashLsh]] applied to
    * vectors. Pass [[autoBandBits]] at scale — the default 8 is the
    * oracle gate's pinned width. */
  def embeddingLshNearestNeighbor(emb: DataFrame, dim: Int, k: Int,
                                  bandBits: Int = 8): DataFrame = {
    require(bandBits >= 1 && bandBits <= 14, s"bandBits out of range: $bandBits")
    val mask = (1L << bandBits) - 1
    val sig = emb.select(col("vec_id"),
      embedLshSig(col("embedding"), dim, nBits = 4 * bandBits).as("sig"))
    val bandStructs = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        expr(s"(sig >> ${bandBits * b}) & $mask").as("bval"))
    }
    val bands = sig.select(col("vec_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("vec_id"), col("bk.band").as("band"), col("bk.bval").as("bval"))
    val cand = bands.select(col("vec_id").as("qid"), col("band"), col("bval"))
      .join(bands.select(col("vec_id").as("id"), col("band"), col("bval")),
        Seq("band", "bval"))
      .where(col("qid") =!= col("id"))
      .select("qid", "id").distinct()
    // exact cosine re-rank over candidates only; id-keyed shuffle joins (no
    // broadcast of the corpus — every row is a query here)
    val scored = cand
      .join(emb.select(col("vec_id").as("id"), col("embedding").as("vec")), "id")
      .join(emb.select(col("vec_id").as("qid"), col("embedding").as("qvec")), "qid")
      .withColumn("dist", Metric.distColumn(Metric.Cosine, col("qvec"), col("vec")))
    TopK.aggTopK(scored, "qid", "id", "dist", k)
  }

  /** Dedup RESOLUTION: one kept representative per near-dup cluster — the
    * step that turns [[dupClusters]]' labeling into an actual keep set.
    * Rule: keep the longest member ((n_chars desc, doc_id asc) — the
    * common keep-the-most-content policy; ties deterministic). The
    * bounded-heap top-1 aggregator means a pathological giant cluster
    * never sorts its members in one task. Returns (cluster_id, keep_id) —
    * one row per cluster. */
  def canonical(docs: DataFrame, clusters: DataFrame): DataFrame =
    TopK.aggTopK(
      clusters.join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
        .withColumn("_neg", -col("n_chars")),
      "cluster_id", "doc_id", "_neg", 1)
      .select(col("cluster_id"), col("doc_id").as("keep_id"))
}
