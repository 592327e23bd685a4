package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text analysis for large-scale training-data pipelines: tokenization,
  * quality scoring, language identification, fingerprinting.
  *
  * Everything is built from codegen'd builtin expressions (split/transform/
  * aggregate/xxhash64) — no UDFs — so a 100 TB corpus pays one scan and no
  * serialization boundary. Higher-order functions keep the work per-row
  * (no explode/shuffle) until an aggregation is explicitly requested.
  */
object TextAnalysis {

  /** whitespace tokens (single-space split, matches simple oracles) */
  def tokens(text: Column): Column = split(text, " ")

  /** whitespace-run tokens with empties dropped — THE shared tokenizer for
    * the oracle-replayed corpus ops (DSIR, BM25, repeated-span removal):
    * one definition so the Spark side and every DuckDB oracle's
    * `list_filter(regexp_split_to_array(...), x -> x <> '')` can never
    * drift apart per-operator */
  def wsTokens(text: Column, lowercase: Boolean = false): Column = {
    val t = if (lowercase) lower(text) else text
    filter(split(t, "\\s+"), x => x =!= "")
  }

  /** word tokens: letters/digits runs — BPE-ish pre-tokenization regex */
  def wordTokens(text: Column): Column =
    split(text, "[^\\p{L}\\p{N}]+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** count of regex-token matches (words + standalone punctuation), the
    * usual BPE pre-token count proxy */
  def bpeishTokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => length(t) > 0)) +
      length(regexp_replace(text, "[\\p{L}\\p{N}\\s]", "")).cast(IntegerType)

  /** mean token length: chars-without-spaces / token count */
  def meanTokenLength(text: Column): Column =
    length(regexp_replace(text, " ", "")).cast(DoubleType) /
      greatest(tokenCount(text).cast(DoubleType), lit(1.0))

  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,!?;:'\"()\\[\\]{}]", "")))
      .cast(DoubleType) / greatest(length(text).cast(DoubleType), lit(1.0))

  def digitRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[0-9]", ""))).cast(DoubleType) /
      greatest(length(text).cast(DoubleType), lit(1.0))

  def uppercaseRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[A-Z]", ""))).cast(DoubleType) /
      greatest(length(text).cast(DoubleType), lit(1.0))

  /** fraction of tokens found in `stopwords` */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    stopwordHits(text, stopwords).cast(DoubleType) /
      greatest(tokenCount(text).cast(DoubleType), lit(1.0))

  /** number of tokens found in `stopwords` (lower-cased match) */
  def stopwordHits(text: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(lower(text)), t => t.isin(stopwords.map(lit): _*)))

  /** number of DISTINCT stopwords present — the Gopher "contains at least
    * 2 stop words" naturalness rule (Rae et al. 2021 §A1.1) needs the
    * distinct count, not total hits */
  def distinctStopwordHits(text: Column, stopwords: Seq[String]): Column =
    size(array_intersect(array_distinct(tokens(lower(text))),
      array(stopwords.map(lit): _*)))

  /** Composite quality score in [0,1] for corpus filtering: favors texts of
    * reasonable length, low punctuation/digit noise, plausible word length.
    * The exact recipe mirrors common web-corpus quality heuristics
    * (length / punct / stopword ratio features). */
  def qualityScore(text: Column, stopwords: Seq[String] = englishStopwords): Column = {
    val lenScore = least(length(text).cast(DoubleType) / lit(500.0), lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val digitScore = lit(1.0) - least(digitRatio(text) * 5.0, lit(1.0))
    val wordLen = meanTokenLength(text)
    val wordLenScore = when(wordLen.between(2.5, 9.0), 1.0).otherwise(0.3)
    val stopScore = least(stopwordRatio(text, stopwords) * 4.0, lit(1.0))
    (lenScore * 0.25 + punctScore * 0.2 + digitScore * 0.15 +
      wordLenScore * 0.2 + stopScore * 0.2)
  }

  val englishStopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "it", "that", "was", "for", "on", "with", "as", "at", "by", "be", "this")

  /** per-language stopword profiles for n-gram/stopword language ID */
  val stopwordProfiles: Map[String, Seq[String]] = Map(
    "en" -> englishStopwords,
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "für", "auf", "ein",
      "eine", "nicht", "den", "des", "im", "zu", "sich", "dass", "auch", "wird"),
    "es" -> Seq("el", "la", "los", "las", "de", "que", "y", "en", "un", "una",
      "es", "por", "con", "para", "del", "se", "su", "al", "lo", "como"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "est", "un", "une", "du",
      "dans", "que", "qui", "pour", "sur", "avec", "au", "pas", "ce", "il"))

  /** CJK character ratio (for zh/ja/ko detection) */
  def cjkRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\x{4e00}-\\x{9fff}]", "")))
      .cast(DoubleType) / greatest(length(text).cast(DoubleType), lit(1.0))

  /** Language identification by stopword-profile scoring + CJK ratio.
    * Returns the language code with the highest score, 'und' if no signal.
    * Deterministic tie-break: profile order en,de,es,fr (strict >).
    *
    * CSE-staged: HOFs are interpreted with no common-subexpression
    * elimination (see the repetition-signal notes below), and the naive
    * fold duplicated each profile's tokenize+filter ~5× across the
    * when/greatest chains. Tokenization happens ONCE (a lambda-bound
    * array), each profile scores once into a staged score array, and the
    * argmax reads staged elements. */
  def langId(text: Column): Column = {
    val ordered = Seq("en", "de", "es", "fr")
    // bind the token array once; emit the four scores as one array
    val scoresArr = org.apache.spark.sql.functions.transform(
      array(tokens(lower(text))),
      toks => array(ordered.map { l =>
        size(filter(toks, t => t.isin(stopwordProfiles(l).map(lit): _*))).cast(DoubleType) /
          greatest(size(toks).cast(DoubleType), lit(1.0))
      }: _*))
    // stage the score array under a lambda too, so the argmax below reads
    // each score from the bound variable instead of re-evaluating it
    val result = org.apache.spark.sql.functions.transform(
      scoresArr,
      s => {
        val scores = ordered.indices.map(i => element_at(s, i + 1))
        val bestLatin = ordered.zip(scores).foldLeft((lit("und"), lit(0.0))) {
          case ((bestL, bestS), (l, sc)) =>
            (when(sc > bestS, lit(l)).otherwise(bestL), greatest(sc, bestS))
        }
        when(cjkRatio(text) > 0.25, "zh")
          .when(bestLatin._2 > 0.05, bestLatin._1)
          .otherwise("und")
      })
    element_at(result, 1)
  }

  /** 64-bit document fingerprint of normalized text (rolling-hash family:
    * xxhash64 over the whitespace-normalized, lower-cased body). */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(text), "\\s+", " "))

  /** array of window fingerprints (rolling hash over `n`-char windows) —
    * substrate for shingle-based dedup */
  def rollingFingerprints(text: Column, n: Int): Column =
    transform(
      sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
      i => xxhash64(text.substr(i, lit(n))))

  // ------------------------------------------------------------------
  // Repetition signals (Gopher-style "repetitious text" quality filters,
  // Rae et al. 2021 §A1.1): fraction of duplicate tokens / n-grams within
  // a document. Pure per-row HOF expressions — one scan, no shuffle.
  // ------------------------------------------------------------------

  /** word n-grams as strings (space-joined); n >= 1; empty array when the
    * text has fewer than n tokens (guarded — ANSI element_at throws on an
    * out-of-range index) */
  def wordNgrams(text: Column, n: Int): Column =
    if (n == 1) tokens(text) else ngramsOfTokens(tokens(text), n)

  /** fraction of occurrences of word n-grams that are repeats:
    * 1 - distinct/total (0 when fewer than n tokens) */
  def duplicateNgramFraction(text: Column, n: Int): Column =
    duplicateFraction(wordNgrams(text, n))

  private def duplicateFraction(grams: Column): Column = {
    val total = size(grams).cast(DoubleType)
    when(total > 0,
      lit(1.0) - size(array_distinct(grams)).cast(DoubleType) / total)
      .otherwise(lit(0.0))
  }

  /** Append `dup_word_frac` / `dup_<n>gram_frac` columns for n in 1..maxN.
    * Staged through intermediate projections so each n-gram array is built
    * ONCE per row: higher-order functions are interpreted (no whole-stage
    * codegen), so they get no common-subexpression elimination — inlining
    * the array into both size() and array_distinct() doubles the work, and
    * CollapseProject keeps the stages separate exactly because each staged
    * array is referenced more than once by non-cheap consumers. */
  def withRepetitionSignals(df: org.apache.spark.sql.DataFrame, textCol: String,
                            maxN: Int = 3): org.apache.spark.sql.DataFrame = {
    val gramCols = (1 to maxN).map(n => s"_grams$n")
    val staged0 = df.withColumn("_toks", tokens(col(textCol)))
    val staged = (2 to maxN).foldLeft(staged0)((d, n) =>
      d.withColumn(s"_grams$n", ngramsOfTokens(col("_toks"), n)))
      .withColumnRenamed("_toks", "_grams1")
    val named = Seq("dup_word_frac") ++ (2 to maxN).map(n => s"dup_${n}gram_frac")
    gramCols.zip(named).foldLeft(staged) { case (d, (g, out)) =>
      d.withColumn(out, duplicateFraction(col(g)))
    }.drop(gramCols: _*)
  }

  /** Corpus-relative vocabulary coverage (the CCNet-style signal: how much
    * of a document is made of the corpus' common words — boilerplate and
    * gibberish both score low). Three-stage plan, each stage bounded:
    * (1) token counts — one shuffle, map-side partial agg collapses each
    * partition to its distinct tokens; (2) top-K vocab — TakeOrdered with a
    * total (count desc, token asc) order, K rows to the driver, broadcast
    * back; (3) per-doc coverage — broadcast semijoin + one (id)-keyed
    * partial-agg shuffle. The corpus text never shuffles; only (id, counts)
    * pairs do. Coverage is a single int/int IEEE division — bit-identical
    * in any engine. */
  def vocabularyCoverage(df: org.apache.spark.sql.DataFrame, idCol: String,
                         textCol: String, topK: Int = 1000): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc).limit(topK)
      .select(col("tok"), lit(1).as("_in"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("_in"), lit(0))).cast(LongType).as("n_in_topk"))
      .select(col("id").as(idCol), col("n_tokens"), col("n_in_topk"),
        (col("n_in_topk").cast(DoubleType) / col("n_tokens").cast(DoubleType))
          .as("topk_coverage"))
  }

  /** Corpus-wide duplicated n-gram hot spots: the `topK` word n-grams that
    * appear in the most DOCUMENTS (boilerplate banners, license headers,
    * navigation chrome — the stuff passage dedup later removes; this is the
    * diagnostic view). Per-doc distinct n-grams (array_distinct before the
    * explode bounds skew: one vote per document, so a million-repeat spam
    * page can't dominate), one map-side-combinable count shuffle, then a
    * total-ordered (df desc, ngram asc) TakeOrdered top-K — per-partition
    * top-K + driver merge, no global sort. */
  def ngramHotspots(df: org.apache.spark.sql.DataFrame, textCol: String,
                    n: Int, topK: Int): org.apache.spark.sql.DataFrame =
    // stage the token array: the n-gram lambda reads it n times per gram,
    // and an inlined split(text) would re-tokenize the document on every
    // element_at (same staging lesson as withRepetitionSignals)
    df.select(tokens(col(textCol)).as("_toks"))
      .select(explode(array_distinct(
        if (n == 1) col("_toks") else ngramsOfTokens(col("_toks"), n))).as("ngram"))
      .groupBy(col("ngram")).agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("ngram").asc).limit(topK)

  /** C4-style LINE-LEVEL cleaning (Raffel et al. 2020, "Exploring the
    * Limits of Transfer Learning…", §2.2 — the public C4 heuristics):
    * keep only lines that end in a terminal punctuation mark (.!? or a
    * closing quote) AND have at least `minWordsPerLine` words; the kept
    * lines re-join with newlines. Pure codegen'd column expression
    * (split → filter HOF → array_join), one scan, no UDF — and every
    * step is portable (regex + word split), so an external engine
    * replicates the cleaning byte-for-byte. */
  def c4CleanLines(text: Column, minWordsPerLine: Int = 3): Column = {
    val kept = filter(split(text, "\n"), l =>
      l.rlike("[.!?\"']\\s*$") &&
        size(filter(split(l, "\\s+"), w => length(w) > 0)) >= minWordsPerLine)
    array_join(kept, "\n")
  }

  /** The C4 DOCUMENT-level drops that accompany the line cleaning: no
    * "lorem ipsum", no curly brace (code leakage). Applied to the cleaned
    * text; a document may also empty out entirely under the line rules. */
  def c4DocumentAccept(cleanedText: Column): Column =
    !contains(lower(cleanedText), lit("lorem ipsum")) &&
      !contains(cleanedText, lit("{")) && length(cleanedText) > 0

  /** the Gopher repetition/naturalness stop-word list (Rae et al. 2021
    * §A1.1: "the, be, to, of, and, that, have, with") */
  val gopherStopwords: Seq[String] = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher document-quality signals (Rae et al. 2021, "Scaling Language
    * Models…", §A1.1 — the public rule set), one codegen'd projection:
    *  - `word_count`, `mean_word_len` (whitespace words)
    *  - `symbol_word_ratio`: (# of '#' + # of '...') / words
    *  - `bullet_line_frac` / `ellipsis_line_frac`: lines starting with a
    *    bullet / ending with an ellipsis
    *  - `alpha_word_frac`: words containing ≥1 alphabetic char
    *  - `stopword_hits`: DISTINCT Gopher stop words present
    *  - `gopher_accept`: the paper's conjunction — 50 ≤ words ≤ 100000,
    *    3 ≤ mean len ≤ 10, symbol ratio ≤ 0.1, bullets ≤ 0.9,
    *    ellipses ≤ 0.3, alpha frac ≥ 0.8, ≥ 2 stop words.
    * Every signal is int/int or count arithmetic an external engine
    * reproduces bit-for-bit. */
  def withGopherSignals(df: org.apache.spark.sql.DataFrame, textCol: String): org.apache.spark.sql.DataFrame = {
    // stage arrays once: HOFs are interpreted — no CSE across consumers
    // (same staging lesson as withRepetitionSignals)
    val staged = df
      .withColumn("_words", filter(split(col(textCol), "\\s+"), w => length(w) > 0))
      .withColumn("_lines", filter(split(col(textCol), "\n"), l => length(trim(l)) > 0))
    val wc = size(col("_words")).cast(DoubleType)
    val lc = greatest(size(col("_lines")).cast(DoubleType), lit(1.0))
    staged
      .withColumn("word_count", size(col("_words")))
      .withColumn("mean_word_len",
        aggregate(col("_words"), lit(0L), (acc, w) => acc + length(w)).cast(DoubleType) /
          greatest(wc, lit(1.0)))
      .withColumn("symbol_word_ratio",
        (countPattern(col(textCol), "#") + countPattern(col(textCol), "\\.\\.\\."))
          .cast(DoubleType) / greatest(wc, lit(1.0)))
      .withColumn("bullet_line_frac",
        size(filter(col("_lines"), l => trim(l).rlike("^[-•*]"))).cast(DoubleType) / lc)
      .withColumn("ellipsis_line_frac",
        size(filter(col("_lines"), l => trim(l).rlike("(\\.\\.\\.|…)$"))).cast(DoubleType) / lc)
      .withColumn("alpha_word_frac",
        size(filter(col("_words"), w => w.rlike("[A-Za-z]"))).cast(DoubleType) /
          greatest(wc, lit(1.0)))
      .withColumn("stopword_hits", distinctStopwordHits(col(textCol), gopherStopwords))
      .withColumn("gopher_accept",
        col("word_count").between(50, 100000) &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("symbol_word_ratio") <= 0.1 &&
          col("bullet_line_frac") <= 0.9 &&
          col("ellipsis_line_frac") <= 0.3 &&
          col("alpha_word_frac") >= 0.8 &&
          col("stopword_hits") >= 2)
      .drop("_words", "_lines")
  }

  /** Strip HTML to text (the boilerplate-removal head of a web-corpus
    * pipeline): drop tags, unescape the five predefined entities (&amp;
    * LAST, so "&amp;lt;" correctly yields "&lt;" and not a re-parsed tag),
    * squash whitespace. Chained codegen'd regexp/replace — one scan, no
    * UDF; every step is portable regex so an external engine replicates
    * the cleaning byte-for-byte. */
  def stripHtml(html: Column): Column = {
    val untagged = regexp_replace(html, "<[^>]*>", " ")
    val unescaped = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(untagged, "&lt;", "<"), "&gt;", ">"), "&quot;", "\""),
      "&#39;", "'"), "&amp;", "&")
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  /** BPE first-merge candidates (tokenizer induction over the corpus): the
    * `topK` adjacent character pairs by total occurrence count, weighted by
    * word frequency. Two-stage: (1) collapse the corpus to its distinct
    * words + counts — ONE map-side-combinable shuffle, after which all
    * character work scales with |vocabulary|, not corpus size (the BPE
    * trick); (2) explode each distinct word's adjacent char pairs, weight
    * by the word's count, re-aggregate, TakeOrdered top-K with a total
    * (count desc, pair asc) order. */
  def bpeMergeCandidates(df: org.apache.spark.sql.DataFrame, textCol: String,
                         topK: Int): org.apache.spark.sql.DataFrame = {
    val words = df.select(explode(tokens(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("wcnt"))
    // sequence(1, len-1) DESCENDS for len < 2 (sequence(1,0) = [1,0]) —
    // guard single-char words to an empty pair array
    val pairs = words.select(col("wcnt"), explode(
      when(length(col("w")) >= 2,
        transform(sequence(lit(1), length(col("w")) - 1), i => col("w").substr(i, lit(2))))
        .otherwise(array().cast(ArrayType(StringType)))).as("pair"))
    pairs.groupBy(col("pair")).agg(sum(col("wcnt")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc).limit(topK)
  }

  /** Unicode NFC canonical normalization (codegen'd expression; see
    * [[graft.plans.NfcKernel]]) — the head-of-pipeline pass that makes
    * hash-keyed dedup/fingerprinting insensitive to combining-mark vs
    * precomposed encodings of identical glyphs. */
  def nfcNormalize(text: Column): Column =
    graft.plans.UnicodeExpressions.nfcNormalize(text)

  /** n-grams from an already-split token array (n >= 2) */
  private def ngramsOfTokens(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array().cast(ArrayType(StringType)))

  /** fraction of lines (split on \n) that are duplicates of an earlier line */
  def duplicateLineFraction(text: Column): Column = {
    val lines = split(text, "\n")
    lit(1.0) - size(array_distinct(lines)).cast(DoubleType) /
      greatest(size(lines).cast(DoubleType), lit(1.0))
  }

  // ------------------------------------------------------------------
  // PII scrubbing: regex detection + redaction, the standard pre-training
  // privacy pass. Codegen'd regexp expressions; patterns kept to syntax
  // portable across RE2/PCRE-class engines so oracles can mirror them.
  // ------------------------------------------------------------------

  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}"
  val ipPattern = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  def countPattern(text: Column, pattern: String): Column =
    // idx=0 (whole match): Spark's 2-arg form defaults to capture group 1,
    // which throws on groupless patterns
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** redact every match of `pattern` with `replacement` */
  def redact(text: Column, pattern: String, replacement: String): Column =
    regexp_replace(text, pattern, replacement)

  /** one-pass standard PII scrub: emails, then phones, then IPv4 */
  def redactPII(text: Column): Column =
    redact(redact(redact(text, emailPattern, "<EMAIL>"),
      phonePattern, "<PHONE>"), ipPattern, "<IP>")
}
