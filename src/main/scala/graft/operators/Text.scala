package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token/quality stats, stopword language-ID, fingerprinting.
  *
  * Design rules for oracle parity (the driver hash-compares against DuckDB):
  * ratios are emitted as INTEGER basis points via integer division
  * (`(10000*x) div n`), never as rounded doubles; fingerprints are md5 hex
  * strings (identical bytes in Spark and DuckDB).
  */
object Text {

  /** Whitespace tokenizer → long form (doc_id, term). The driver's
    * `documents.text` is single-space separated lowercase words. */
  def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))

  /** Term frequencies: (doc_id, term, tf). The sparse-vector view of a
    * document corpus (CSR analog — SURVEY §1.1 metadata table). */
  def termFreq(docs: DataFrame): DataFrame =
    tokens(docs).groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** BPE-ish subword-boundary tokenizer: splits runs of letters, runs of
    * digits, and single punctuation marks (the pre-tokenization pass every
    * BPE-family tokenizer applies before merges). The pattern uses only
    * portable regex constructs so DuckDB's RE2 tokenizes identically —
    * enabling exact cross-engine token-count parity. */
  val BpeishPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

  def bpeishTokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(expr(s"regexp_extract_all(text, '$BpeishPattern', 0)")).as("piece"))

  /** Per-document BPE-ish token counts — the "how many tokens is this
    * corpus" pass a training pipeline budgets with. */
  def bpeishCounts(docs: DataFrame): DataFrame =
    bpeishTokens(docs).groupBy("doc_id")
      .agg(count(lit(1)).as("n_pieces"),
        countDistinct(col("piece")).as("n_unique_pieces"))

  /** Per-document token statistics (all integer columns). */
  def tokenStats(docs: DataFrame): DataFrame =
    tokens(docs)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        countDistinct(col("term")).as("n_unique"),
        sum(length(col("term"))).as("char_sum"))
      .withColumn("centi_avg_len", expr("(100 * char_sum) div n_tokens"))

  /** Repetition scoring: how much of a document is its single most
    * repeated word n-gram (basis points of all n-gram occurrences) — the
    * classic repetitiousness filter (Gopher/C4-style "drop docs whose top
    * n-gram covers too much of the text"). Unlike [[graft.operators.Dedup
    * .shingles]] this keeps DUPLICATE grams — repetition is the signal.
    * Two keyed aggregations, both map-side combining; docs shorter than n
    * tokens have no n-grams and drop out (callers treat absent as
    * not-repetitious). Returns (doc_id, n_grams, top_tf, rep_bp). */
  def repetition(docs: DataFrame, n: Int): DataFrame = {
    val toks = split(col("text"), " ")
    val grams = docs.select(col("doc_id"),
      explode(when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - n + 1),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
        .otherwise(array().cast("array<string>"))).as("gram"))
    grams.groupBy("doc_id", "gram").agg(count(lit(1)).as("tf"))
      .groupBy("doc_id")
      .agg(sum("tf").as("n_grams"), max("tf").as("top_tf"))
      .withColumn("rep_bp", expr("(10000 * top_tf) div n_grams"))
  }

  /** Corpus-trained bigram-LM familiarity — the CCNet-shaped quality
    * signal (Wenzek et al. 2019 bucket documents by LM perplexity; the
    * public recipe trains the LM on a reference corpus): train bigram
    * counts over the corpus in one keyed agg, then score each document by
    * the MEAN CORPUS FREQUENCY of its word transitions. High = common,
    * fluent/boilerplate transitions; low = rare transitions (garbled text,
    * noise, off-domain). The count-mean surrogate keeps the score a ratio
    * of integers (`centi_fam` via integer division) so the driver's
    * cross-engine hash compare is exact — a true log-perplexity would put
    * a transcendental in the gate; the RANKING use (threshold/bucket docs)
    * is the same. Docs under 2 tokens have no transitions and drop out
    * (same convention as [[repetition]]).
    *
    * Scale shape: the bigram vocabulary is corpus-sized, so the model
    * table JOINS on gram (shuffle both sides), never broadcasts; both
    * inputs are keyed counts with map-side partial aggregation, and the
    * per-doc reduce is a second keyed agg — no all-pairs, no driver state. */
  def lmFamiliarity(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val grams = docs.select(col("doc_id"),
      explode(when(size(toks) >= 2,
        transform(sequence(lit(1), size(toks) - 1),
          i => concat_ws(" ", slice(toks, i, lit(2)))))
        .otherwise(array().cast("array<string>"))).as("gram"))
    val docGrams = grams.groupBy("doc_id", "gram").agg(count(lit(1)).as("tf"))
    // fold the corpus model from the per-doc counts (already keyed and far
    // smaller than the raw gram stream) instead of re-aggregating the
    // exploded grams a second time
    val model = docGrams.groupBy("gram").agg(sum(col("tf")).as("c"))
    docGrams.join(model, "gram")
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_bigrams"),
        sum(col("tf") * col("c")).as("fam_sum"))
      .withColumn("centi_fam", expr("(100 * fam_sum) div n_bigrams"))
  }

  /** Whole-corpus statistics — the numbers a training run budgets against
    * (docs, token occurrences, vocabulary size). Exact distinct term count
    * here (oracle-checkable); at 100 TB the vocabulary cardinality comes
    * from `approx_count_distinct` (HyperLogLog++ — one pass, KBs of sketch,
    * no shuffle of distinct values), which the spec bounds within 5% of
    * this exact answer on the test corpus. One row out. */
  def corpusStats(docs: DataFrame): DataFrame =
    tokens(docs).agg(
      countDistinct(col("doc_id")).as("n_docs"),
      count(lit(1)).as("n_tokens"),
      countDistinct(col("term")).as("n_vocab"))

  /** Stopword list shared with the oracle SQL. */
  val StopWords: Seq[String] = Seq("the", "a")

  /** Quality scoring: token count bounds + stopword/unique ratios in basis
    * points. A standard pre-training corpus filter (length + stopword-rate
    * heuristics). */
  def qualityScore(docs: DataFrame): DataFrame = {
    val stopSet = StopWords.map(w => s"'$w'").mkString(", ")
    tokens(docs)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        countDistinct(col("term")).as("n_unique"),
        sum(when(col("term").isin(StopWords: _*), 1L).otherwise(0L)).as("stop_hits"))
      .withColumn("stop_bp", expr("(10000 * stop_hits) div n_tokens"))
      .withColumn("uniq_bp", expr("(10000 * n_unique) div n_tokens"))
      .withColumn("quality_flag",
        (col("n_tokens").between(20, 90) && col("stop_bp") < lit(2500)).cast("int"))
  }

  /** Per-language stopword lists for the language-ID heuristic (shared with
    * the oracle SQL; tie-break order = this Seq's order). */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a"),
    "es" -> Seq("el", "la", "de", "los", "que"),
    "de" -> Seq("der", "die", "das", "und"),
    "fr" -> Seq("le", "la", "les", "et"))

  /** Stopword-hit language ID: argmax of per-language stopword hits, ties
    * broken by [[LangStopwords]] order; no hits at all → "und". */
  def langId(docs: DataFrame): DataFrame = {
    val hits = LangStopwords.map { case (lang, words) =>
      sum(when(col("term").isin(words: _*), 1L).otherwise(0L)).as(s"hits_$lang")
    }
    val scored = tokens(docs).groupBy("doc_id").agg(hits.head, hits.tail: _*)
    // argmax with fixed tie-break order: a fold of `when` conditions
    val langs = LangStopwords.map(_._1)
    val best = langs.map(l => col(s"hits_$l"))
    val maxHits = greatest(best: _*)
    val pred = langs.foldRight(lit("und")) { (l, acc) =>
      when(col(s"hits_$l") === maxHits && maxHits > 0, lit(l)).otherwise(acc)
    }
    // foldRight gives earlier langs precedence (their `when` wraps outermost)
    scored.withColumn("pred_lang", pred)
      .select(col("doc_id"), col("pred_lang"), maxHits.cast("long").as("max_hits"))
  }

  /** Content fingerprint: md5 of the raw text (byte-identical to DuckDB's
    * md5) + exact length. Basis for exact dedup. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(col("text")).as("fp"),
      length(col("text")).cast("long").as("text_len"))

  /** PII patterns shared verbatim with the DuckDB oracle: only portable
    * constructs — character classes, greedy counted repetition, literal
    * dot as `[.]`, NO backslash escapes — so Java regex (Spark codegen)
    * and RE2 (DuckDB) match byte-identically. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  val Ipv4Pattern = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
  val PhonePattern = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** PII redaction — the standard pre-training scrub pass: emails, IPv4
    * addresses, and NANP-style phone numbers are replaced with typed
    * placeholder tokens, with per-doc match counts for audit (counts are
    * over the ORIGINAL text, each pattern independently; replacement runs
    * email → ip → phone). One projection of codegen regexp kernels over
    * the corpus — embarrassingly parallel, no shuffle, the 100 TB shape
    * of every scrub pass. */
  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(
      col("doc_id"),
      size(expr(s"regexp_extract_all($textCol, '$EmailPattern', 0)"))
        .cast("long").as("n_emails"),
      size(expr(s"regexp_extract_all($textCol, '$Ipv4Pattern', 0)"))
        .cast("long").as("n_ips"),
      size(expr(s"regexp_extract_all($textCol, '$PhonePattern', 0)"))
        .cast("long").as("n_phones"),
      regexp_replace(
        regexp_replace(
          regexp_replace(t, EmailPattern, "<EMAIL>"),
          Ipv4Pattern, "<IP>"),
        PhonePattern, "<PHONE>").as("text_clean"))
  }
}
