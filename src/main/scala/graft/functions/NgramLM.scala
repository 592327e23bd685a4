package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hashed bigram language-model perplexity scoring — the CCNet quality
  * head (Wenzek et al. 2020 filter web crawl by the perplexity of a
  * KenLM model trained on a clean seed corpus; low perplexity = looks
  * like the seed). Reduced to its distributable core: an add-1-smoothed
  * bigram model over HASHED token buckets (the hash-kernel trick bounds
  * the vocabulary at `numBuckets` regardless of corpus size), so
  * training is two map-side-combined aggregations and the model is a
  * pair of broadcast array literals.
  *
  * Per-document negative log-likelihood over bigram positions i:
  *   nll = Σ_i ln(C1(h(w_i)) + m) − ln(C2(h(w_i w_{i+1})) + 1)
  * i.e. −ln of the smoothed conditional (C2+1)/(C1+m). Both tables are
  * quantized to integer MICRO-NATS on the driver, so the document score
  * is a sum of longs — exact, order-free, partitioning-free, replayable
  * bit-for-bit by any engine (the same design as the NB classifier;
  * raw-double log-prob sums can never survive an exact cross-engine
  * compare). `ppl_micro` is the integer mean nll per bigram.
  *
  * Scale shape: train = two bounded groupBys (≤ numBuckets rows each,
  * driver-collected — the codebook/DSIR norm); score = one narrow
  * projection, two O(1) dense-array lookups per bigram, zero shuffles,
  * zero joins.
  */
object NgramLM {

  private def toks(text: Column): Column = TextAnalysis.wsTokens(text, lowercase = true)

  /** md5-derived token bucket (the portable hash every sampler here uses) */
  private def bucket(w: Column, m: Int): Column =
    pmod(conv(substring(md5(w), 1, 8), 16, 10).cast(LongType), lit(m.toLong))

  /** unigram buckets (every token) for one document */
  private def uniBuckets(text: Column, m: Int): Column =
    element_at(transform(array(toks(text)), t => transform(t, w => bucket(w, m))), 1)

  /** bigram-pair buckets (token_i ++ " " ++ token_{i+1}) for one document */
  private def pairBuckets(text: Column, m: Int): Column =
    element_at(transform(array(toks(text)), t =>
      when(size(t) >= 2,
        transform(sequence(lit(0), size(t) - 2),
          i => bucket(concat(element_at(t, i + 1), lit(" "), element_at(t, i + 2)), m)))
        .otherwise(array().cast("array<long>"))), 1)

  /** bucket → count over a corpus: one map-side-combined groupBy, ≤ m rows */
  private def countsOf(df: DataFrame, grams: Column): (Map[Long, Long]) =
    df.select(explode(grams).as("bucket")).groupBy("bucket")
      .agg(count(lit(1)).as("cnt")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Score `docs` against a model trained on `seed`. Appends
    * (n_bigrams int, nll_micro long, ppl_micro long): total negative
    * log-likelihood in micro-nats and its integer per-bigram mean.
    * Lower ppl_micro = more seed-like (the CCNet keep signal). */
  def perplexity(docs: DataFrame, text: Column,
                 seed: DataFrame, seedText: Column,
                 numBuckets: Int = 4096): DataFrame = {
    require(numBuckets > 0 && numBuckets <= (1 << 20),
      s"numBuckets=$numBuckets: the model tables are driver-collected, bounded at 2^20")
    val c1 = countsOf(seed, uniBuckets(seedText, numBuckets))
    val c2 = countsOf(seed, pairBuckets(seedText, numBuckets))
    def microLn(x: Double): Long = math.floor(math.log(x) * 1e6 + 0.5).toLong
    // two dense micro-nat tables: per bigram position the contribution is
    // lnPrev[h(w_i)] − lnPair[h(w_i w_{i+1})] — pure long arithmetic
    val lnPrev = typedLit((0L until numBuckets.toLong).map(b =>
      microLn((c1.getOrElse(b, 0L) + numBuckets).toDouble)))
    val lnPair = typedLit((0L until numBuckets.toLong).map(b =>
      microLn((c2.getOrElse(b, 0L) + 1).toDouble)))
    // token array lambda-bound once; each position does two md5s and two
    // O(1) array lookups — O(tokens) per document, no re-tokenization
    val res = element_at(transform(array(toks(text)), t => {
      val terms = when(size(t) >= 2,
        transform(sequence(lit(0), size(t) - 2), i =>
          element_at(lnPrev, (bucket(element_at(t, i + 1), numBuckets) + 1).cast(IntegerType)) -
            element_at(lnPair, (bucket(concat(element_at(t, i + 1), lit(" "),
              element_at(t, i + 2)), numBuckets) + 1).cast(IntegerType))))
        .otherwise(array().cast("array<long>"))
      struct(greatest(size(t) - 1, lit(0)).as("n"),
        aggregate(terms, lit(0L), (a, x) => a + x).as("s"))
    }), 1)
    docs
      .withColumn("_graft_lm", res)
      .withColumn("n_bigrams", col("_graft_lm.n"))
      // clamped at 0: pair-bucket hash collisions can push C2(pair)+1 above
      // C1(unigram)+m, making a position's (and rarely a doc's) nll
      // negative — a smoothing-floor artifact carrying no signal. The clamp
      // also keeps the integer division below on NON-NEGATIVE operands,
      // where Spark's `div` (truncate toward zero) and floor division
      // agree — an unclamped negative sum would differ by 1 between
      // engines (r12 ADVICE).
      .withColumn("nll_micro", greatest(col("_graft_lm.s"), lit(0L)))
      .withColumn("ppl_micro",
        when(col("n_bigrams") > 0, expr("nll_micro div n_bigrams"))
          .otherwise(lit(0L)).cast(LongType))
      .drop("_graft_lm")
  }

  /** CCNet's head/middle/tail split (Wenzek et al. 2020 §4.3: rank each
    * language's documents by LM perplexity, keep the lowest-perplexity
    * "head" tercile as the high-quality slice). Appends `bucket`
    * ('head'|'middle'|'tail') to [[perplexity]]'s output. The cut is pure
    * integer arithmetic over (ppl_micro, id) ranks — a deterministic
    * function of the corpus, replayed exactly by any engine.
    *
    * Scale shape: ONE shuffle — the per-language window (hash partition
    * by lang + in-partition spill-backed sort). Fine while each language
    * fits a sort budget; for a web-scale single language use the CCNet
    * production recipe instead: compute the two cutoff VALUES on a sample
    * of [[perplexity]] output, then assign with the zero-shuffle
    * [[assignByPplCutoffs]]. */
  def pplBuckets(docs: DataFrame, idCol: String, text: Column, langCol: String,
                 seed: DataFrame, seedText: Column,
                 numBuckets: Int = 4096): DataFrame = {
    val scored = perplexity(docs, text, seed, seedText, numBuckets)
    val byLang = Window.partitionBy(col(langCol))
    // row_number() is IntegerType — cast to long BEFORE the ×3 so a
    // language with >715M documents can't silently overflow the int
    // multiply into wrong buckets (count() is already LongType)
    val rn = row_number().over(byLang.orderBy(col("ppl_micro"), col(idCol)))
      .cast(LongType)
    val n = count(lit(1)).over(byLang)
    scored.withColumn("bucket",
      when(rn * 3 <= n, lit("head"))
        .when(rn * 3 <= n * 2, lit("middle"))
        .otherwise(lit("tail")))
  }

  /** The zero-shuffle CCNet assignment: given per-language cutoffs
    * (headMax, middleMax) — typically trained once on a sample — bucket
    * every scored document with a broadcast lookup. Unknown languages
    * fall to 'tail' (the conservative CCNet default: unscorable = drop). */
  def assignByPplCutoffs(scored: DataFrame, langCol: String,
                         cutoffs: Map[String, (Long, Long)]): DataFrame = {
    val rows = cutoffs.toSeq.map { case (l, (h, m)) => (l, h, m) }
    val cutDf = broadcast(scored.sparkSession.createDataFrame(rows)
      .toDF(langCol, "_head_max", "_mid_max"))
    scored.join(cutDf, Seq(langCol), "left")
      .withColumn("bucket",
        when(col("ppl_micro") <= col("_head_max"), lit("head"))
          .when(col("ppl_micro") <= col("_mid_max"), lit("middle"))
          .otherwise(lit("tail")))
      .drop("_head_max", "_mid_max")
  }
}
