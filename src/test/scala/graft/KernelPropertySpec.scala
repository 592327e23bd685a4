package graft

import graft.functions.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-style cross-checks (scalacheck generators, deterministic
  * seeds): every native codegen kernel must be bit-identical (hashes,
  * signatures, doubles) to its higher-order-function reference formulation
  * on arbitrary input — including unicode text with multi-byte codepoints,
  * surrogate pairs, combining marks and empty strings. The fixed-corpus
  * specs catch regressions; these catch edge classes nobody planted.
  */
class KernelPropertySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  // text mixing ASCII words, multi-byte unicode, surrogate-pair emoji,
  // combining marks, spaces and empties
  private val textGen: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.oneOf("é", "漢", "字", "à", "😀", "ß", "İ", "é"),
    Gen.const(" "))).map(_.mkString).map(_.take(120))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.apply(Gen.Parameters.default, Seed(i.toLong)).get)

  test("char/word shingles + simhash + minhash: native == HOF on arbitrary unicode") {
    val texts = samples(textGen, 60)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val sh = Dedup.shingleHashes(col("text"), 3)
    val shHof = Dedup.shingleHashesHof(col("text"), 3)
    val rows = df.select(
      array_sort(sh).as("n_sh"), array_sort(shHof).as("h_sh"),
      Dedup.simhash64(sh).as("n_sim"), Dedup.simhash64Hof(shHof).as("h_sim"),
      Dedup.minhashSignature(sh, 8).as("n_mh"), Dedup.minhashSignatureHof(shHof, 8).as("h_mh"),
      array_sort(Dedup.wordShingleHashes(col("text"), 2)).as("n_w"),
      array_sort(Dedup.wordShingleHashesHof(col("text"), 2)).as("h_w")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), "char shingles differ")
      assert(r.getLong(2) == r.getLong(3), "simhash differs")
      assert(r.getSeq[Long](4) == r.getSeq[Long](5), "minhash differs")
      assert(r.getSeq[Long](6) == r.getSeq[Long](7), "word shingles differ")
    }
  }

  test("OPH minhash: matches an independent reference implementation, " +
       "is permutation-invariant, and leaves no undensified bin") {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    // independent re-statement of the algorithm (bin = hash mod k keeping
    // min rehash; empty bins borrow right circularly with distance offset)
    def reference(hashes: Seq[Long], k: Int): Seq[Long] = {
      val sig = Array.fill(k)(Long.MaxValue)
      hashes.foreach { h =>
        val bin = java.lang.Long.remainderUnsigned(h, k).toInt
        val v = XXH64.hashLong(h, 42L)
        if (v < sig(bin)) sig(bin) = v
      }
      val filled = sig.map(_ != Long.MaxValue)
      (0 until k).map { b =>
        if (filled(b)) sig(b)
        else {
          val d = (1 until k).find(d => filled((b + d) % k)).get
          sig((b + d) % k) + d * 0x9E3779B97F4A7C15L
        }
      }
    }
    val texts = samples(textGen, 60).filter(_.nonEmpty)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val sh = Dedup.shingleHashes(col("text"), 3)
    val k = 8
    val rows = df.select(col("id"), sh.as("sh"),
      graft.plans.SignatureExpressions.minhashOphSignature(sh, k).as("oph"),
      // permutation invariance: the kernel over the REVERSED shingle array
      graft.plans.SignatureExpressions.minhashOphSignature(reverse(sh), k).as("oph_rev"))
      .collect()
    rows.foreach { r =>
      val shingles = r.getSeq[Long](1)
      val oph = r.getSeq[Long](2)
      assert(oph.size == k)
      assert(oph == reference(shingles, k), "kernel != reference implementation")
      assert(oph == r.getSeq[Long](3), "OPH not permutation-invariant")
      assert(!oph.contains(Long.MaxValue), "undensified bin survived")
    }
  }

  test("nfcNormalize agrees with java.text.Normalizer on arbitrary unicode") {
    val texts = samples(textGen, 60)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val got = df.select(col("id"), TextAnalysis.nfcNormalize(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) ==
        java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC))
    }
  }

  test("vector kernels: native == HOF on arbitrary float vectors incl. zeros") {
    val vecGen: Gen[Array[Float]] = Gen.frequency(
      9 -> Gen.listOfN(16, Gen.chooseNum(-1.0f, 1.0f)).map(_.toArray),
      1 -> Gen.const(Array.fill(16)(0.0f)))
    val pairs = samples(Gen.zip(vecGen, vecGen), 60)
    val df = pairs.toDF("a", "b")
    val rows = df.select(
      Similarity.cosineSimilarity(col("a"), col("b")).as("cn"),
      Similarity.cosineSimilarityHof(col("a"), col("b")).as("ch"),
      Similarity.euclideanDistance(col("a"), col("b")).as("en"),
      Similarity.euclideanDistanceHof(col("a"), col("b")).as("eh")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), "cosine differs")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)), "euclidean differs")
    }
    val sigRows = df.select(
      Similarity.hyperplaneSignature(col("a"), 16, 16).as("sn"),
      Similarity.hyperplaneSignatureHof(col("a"), 16, 16).as("sh")).collect()
    sigRows.foreach(r =>
      assert(r.getLong(0) == r.getLong(1), "hyperplane signature differs"))
  }

  test("rolling window fingerprints: the O(T) roll equals direct per-window evaluation") {
    // the kernel's roll-out step fp(w+1) = (fp(w) − h(w)·B^{l−1})·B +
    // h(w+l) must agree with evaluating each window's polynomial from
    // scratch — catches roll-out arithmetic bugs (mask/overflow/power
    // off-by-one) on arbitrary token content and window lengths
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val B1 = 0x9E3779B97F4A7C15L
    val B2 = 0xC2B2AE3D27D4EB4FL
    def direct(toks: Array[String], l: Int): Seq[(Long, Long)] = {
      def tok(t: String, seed: Long): Long = {
        val b = UTF8String.fromString(t)
        org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(b.getBaseObject, b.getBaseOffset, b.numBytes, seed)
      }
      (0 to toks.length - l).map { w =>
        var f1 = 0L; var f2 = 0L
        for (j <- 0 until l) {
          f1 = f1 * B1 + tok(toks(w + j), 42L)
          f2 = f2 * B2 + tok(toks(w + j), 0x5DEECE66DL)
        }
        (f1, f2)
      }
    }
    val tokGen = Gen.listOfN(30, Gen.oneOf(
      Gen.alphaNumStr.map(s => if (s.isEmpty) "x" else s.take(6)),
      Gen.oneOf("é", "漢字", "😀", "ß", "a", "bb"))).map(_.toArray)
    for (seed <- 0 until 40; l <- Seq(2, 3, 8, 13)) {
      val toks = tokGen.apply(Gen.Parameters.default, Seed(seed.toLong)).get
      val kernel = graft.plans.WindowFingerprintKernel.fingerprints(
        new GenericArrayData(toks.map(t => UTF8String.fromString(t)).asInstanceOf[Array[Any]]), l)
      val expect = direct(toks, l)
      assert(kernel.numElements() == expect.length, s"count mismatch at seed=$seed l=$l")
      for (i <- expect.indices) {
        val row = kernel.getStruct(i, 2)
        assert((row.getLong(0), row.getLong(1)) == expect(i),
          s"fingerprint $i differs at seed=$seed l=$l")
      }
    }
  }
}
