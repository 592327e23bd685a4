package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Binary Naive Bayes quality classifier over hashed n-gram buckets — the
  * CCNet "wiki-vs-crawl" quality-filter design (Wenzek et al. 2020,
  * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
  * Data"; LLaMA's fastText quality gate is the same shape), reduced to
  * its multinomial-NB core: no gradient loop, no model artifact — train
  * IS two aggregations, the model IS a broadcast literal.
  *
  * Scale + determinism design:
  *  - TRAIN: one map-side-combined bucket-count per class seed (bounded
  *    at `numBuckets` rows, driver-collected — the codebook/DSIR norm)
  *    plus two scalar doc counts for the prior;
  *  - the per-bucket log-likelihood-ratio table is computed ON THE
  *    DRIVER and quantized to integer MICRO-NATS, so per-document
  *    evidence is a SUM OF LONGS — exact, order-free and
  *    partitioning-free. Raw-double log scores can never survive an
  *    exact cross-engine compare (libm last-ulp variance); integer
  *    micro-nats dodge the entire problem, with the quantization
  *    boundary confined to the `numBuckets`-entry table;
  *  - SCORE: one narrow projection — dense array-literal lookup + long
  *    fold inside the row, zero shuffles and zero joins (the DSIR
  *    scoring shape).
  *
  * Score: Σ_grams micro_ln[p(b|target)/p(b|background)] + micro-prior;
  * predicted target-class iff score > 0.
  */
object QualityClassifier {

  /** Score `docs` against target/background seed corpora.
    * Appends (n_grams int, score_micro long, predicted boolean). */
  def scoreNB(docs: DataFrame, text: Column,
              targetSeed: DataFrame, targetText: Column,
              backgroundSeed: DataFrame, backgroundText: Column,
              numBuckets: Int = 256): DataFrame = {
    // doc counts ride the SAME aggregation as the bucket counts (sentinel
    // bucket): ONE pass per seed — a separate count() would re-evaluate
    // each seed's filter+scan, 2× the training I/O at real seed scale
    val (tCnt, nT, dT) =
      ImportanceResampling.collectedCountsWithDocs(targetSeed, targetText, numBuckets)
    val (bCnt, nB, dB) =
      ImportanceResampling.collectedCountsWithDocs(backgroundSeed, backgroundText, numBuckets)
    val nTm = (nT + numBuckets).toDouble
    val nBm = (nB + numBuckets).toDouble
    // micro-nat log ratio per bucket, fixed operation order for replay:
    // ln( ((ct+1)*nBm) / ((cb+1)*nTm) ) — the add-1-smoothed class-
    // conditional ratio, quantized floor(x*1e6 + 0.5)
    def microLn(x: Double): Long = math.floor(math.log(x) * 1e6 + 0.5).toLong
    val lrArr = typedLit((0L until numBuckets.toLong).map(b =>
      microLn(((tCnt.getOrElse(b, 0L) + 1).toDouble * nBm) /
        ((bCnt.getOrElse(b, 0L) + 1).toDouble * nTm))))
    val priorMicro = microLn((dT + 1).toDouble / (dB + 1).toDouble)
    // long sum needs no sort — integer addition is order-free, unlike the
    // double folds in DSIR scoring
    val res = ImportanceResampling.foldOverBuckets(text, numBuckets, lrArr,
      lit(priorMicro), sortTerms = false)
    docs
      .withColumn("_graft_nb", res)
      .withColumn("n_grams", col("_graft_nb.n"))
      .withColumn("score_micro", col("_graft_nb.s"))
      .withColumn("predicted", col("score_micro") > 0L)
      .drop("_graft_nb")
  }
}
