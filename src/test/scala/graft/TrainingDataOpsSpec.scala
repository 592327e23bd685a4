package graft

import graft.functions.{Decontamination, Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dedup / similarity / text-analysis operators with planted ground truth. */
class TrainingDataOpsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  val baseText = "the quick brown fox jumps over the lazy dog and runs far away " * 5

  test("minhash LSH finds planted near-duplicates and skips unrelated docs") {
    val docs = Seq(
      (1L, baseText),
      (2L, baseText + " slightly changed tail"),
      (3L, "completely different content about databases and query engines " * 5),
      (4L, "another unrelated document discussing weather patterns in spring " * 5))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashDuplicatePairs(docs, "doc_id", "text",
      shingleSize = 5, numHashes = 32, bands = 8, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("simhash near-dup pairs: planted pair within hamming distance") {
    val docs = Seq(
      (1L, baseText),
      (2L, baseText + " tail"),
      (3L, "totally different text about mountains rivers and oceans everywhere " * 5))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDupPairs(docs, "doc_id", "text", shingleSize = 5, maxHamming = 8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("incremental minhash: delta batch finds its corpus twin via the signature store") {
    val corpus = Seq(
      (1L, baseText),
      (2L, "completely different content about databases and query engines " * 5),
      (3L, "another unrelated document discussing weather patterns in spring " * 5))
      .toDF("doc_id", "text")
    val newBatch = Seq(
      (101L, baseText + " second crawl tail"),     // near-dup of corpus doc 1
      (102L, "entirely novel text about deep sea exploration and marine biology " * 5))
      .toDF("doc_id", "text")
    val store = Dedup.minhashSignatures(corpus, "doc_id", "text", shingleSize = 5, numHashes = 32)
    val pairs = Dedup.minhashIncrementalPairs(newBatch, store, "doc_id", "text",
      shingleSize = 5, numHashes = 32, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((101L, 1L)))
  }

  test("portable simhash blocked pairs equal brute-force all-pairs hamming") {
    val docs = Seq(
      (1L, baseText),
      (2L, baseText + " tail"),
      (3L, "totally different text about mountains rivers and oceans everywhere " * 5),
      (4L, baseText + " other tail"),
      (5L, "short"))
      .toDF("doc_id", "text")
    val bits = 32
    val maxH = 6
    // the native kernel must match the HOF reference formulation exactly
    val cmp = docs.select(
      Dedup.portableSimhash(col("text"), 5, bits).as("native"),
      Dedup.portableSimhashHof(Dedup.portableShingleHashes(col("text"), 5), bits).as("hof"))
      .collect()
    cmp.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // brute force over the SAME portable signatures
    val sigs = docs.select(col("doc_id"),
      Dedup.portableSimhash(col("text"), 5, bits).as("s"))
    val expected = sigs.alias("a").join(sigs.alias("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(col("a.s").bitwiseXOR(col("b.s"))).as("hamming"))
      .where(col("hamming") <= maxH)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val got = Dedup.simhashNearDupPairsPortable(docs, "doc_id", "text",
      shingleSize = 5, bits = bits, maxHamming = maxH, blocksPerKey = 2,
      failOnCappedBuckets = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected)
    assert(got.map(p => (p._1, p._2)).contains((1L, 2L)))
  }

  test("native simhash/minhash expressions match the HOF reference formulation") {
    val docs = Seq((1L, baseText), (2L, baseText + " tail"),
      (3L, "short text"), (4L, "unrelated words entirely different content here"))
      .toDF("doc_id", "text")
    val sh = Dedup.shingleHashes(col("text"), 5)
    val shHof = Dedup.shingleHashesHof(col("text"), 5)
    val rows = docs.select(
      Dedup.simhash64(sh).as("native_sim"), Dedup.simhash64Hof(shHof).as("hof_sim"),
      Dedup.minhashSignature(sh, 16).as("native_mh"), Dedup.minhashSignatureHof(shHof, 16).as("hof_mh"),
      sh.as("native_sh"), shHof.as("hof_sh"))
      .collect()
    rows.foreach { r =>
      // native shingle kernel produces the same distinct-hash multiset
      assert(r.getSeq[Long](4).sorted == r.getSeq[Long](5).sorted)
      assert(r.getLong(0) == r.getLong(1))
      assert(r.getSeq[Long](2) == r.getSeq[Long](3))
    }
  }

  test("native word-shingle kernel matches the HOF reference formulation") {
    val docs = Seq(
      (1L, baseText),
      (2L, "one two three"),            // fewer tokens than n → one window
      (3L, ""),                          // empty → one hash-of-"" window
      (4L, "  Spaced,   and Punctuated!  text  here  now ok "),
      (5L, "unicode Ünïcødé tökens ß mixed in 中文 body")).toDF("doc_id", "text")
    for (n <- Seq(2, 5, 8)) {
      val rows = docs.select(
        graft.functions.Dedup.wordShingleHashes(col("text"), n).as("native"),
        graft.functions.Dedup.wordShingleHashesHof(col("text"), n).as("hof")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1).distinct.sorted,
          s"n=$n mismatch")
      }
    }
  }

  test("sorted intersect count matches array_intersect size on sorted-distinct arrays") {
    val df = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 9L, 11L)),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(4L, 8L), Seq(4L, 8L)),
      (Seq(-5L, 0L, 7L), Seq(-5L, 6L, 7L, 8L, 9L))).toDF("a", "b")
    val rows = df.select(
      graft.plans.SignatureExpressions.sortedIntersectCount(col("a"), col("b")).as("n"),
      size(array_intersect(col("a"), col("b"))).as("ref"),
      graft.functions.Dedup.sortedJaccard(col("a"), col("b")).as("sj"),
      graft.functions.Dedup.jaccard(col("a"), col("b")).as("j")).collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getInt(1).toLong)
      assert(r.getDouble(2) == r.getDouble(3))
    }
  }

  test("exact dedup collapses normalized variants") {
    val docs = Seq(
      (10L, "Hello, World!"),
      (11L, "hello   world"),
      (12L, "different text")).toDF("doc_id", "text")
    val got = Dedup.exactDedup(docs, "doc_id", "text")
      .select("canonical_id", "n_copies").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 2L), (12L, 1L)))
  }

  test("embedding near-dup pairs via hyperplane LSH + cosine verification") {
    val vecA = Array.tabulate(16)(i => math.sin(i + 1).toFloat)
    val vecA2 = vecA.map(v => v * 1.001f) // same direction → cosine ~1
    val vecB = Array.tabulate(16)(i => math.cos(3 * i + 2).toFloat)
    val df = Seq((1L, vecA.toSeq), (2L, vecA2.toSeq), (3L, vecB.toSeq)).toDF("id", "emb")
    val pairs = Dedup.embeddingNearDupPairs(df, "id", "emb", dim = 16, numPlanes = 8, threshold = 0.99)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("embedding LSH: hot bucket is capped, exact-copy star recovers recall 1.0") {
    // degenerate corpus: 60 IDENTICAL embeddings (one exact-duplicate
    // cluster — the dedup target) collapse into one hyperplane bucket.
    // Uncapped, the self-join is 60²; with maxBucketSize=10 the bucket is
    // dropped from the join and the linear exact-copy star pass recovers
    // every (head → member) pair.
    val hot = Array.tabulate(16)(i => math.sin(i + 1).toFloat)
    val other1 = Array.tabulate(16)(i => math.cos(5 * i + 2).toFloat)
    val other2 = Array.tabulate(16)(i => math.sin(9 * i + 4).toFloat * (if (i % 2 == 0) 1 else -1))
    val df = ((1L to 60L).map(i => (i, hot.toSeq)) ++
      Seq((100L, other1.toSeq), (101L, other2.toSeq))).toDF("id", "emb")
    val pairs = Dedup.embeddingNearDupPairs(df, "id", "emb", dim = 16, numPlanes = 8,
        threshold = 0.95, maxBucketSize = 10)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (2L to 60L).map(j => (1L, j)).toSet
    assert(pairs == expected, s"star must recover exactly the exact-copy pairs, got ${pairs.size}")
    // exhaustive pipelines can demand a loud failure instead of the cap
    val e = intercept[IllegalStateException] {
      Dedup.embeddingNearDupPairs(df, "id", "emb", dim = 16, numPlanes = 8,
        threshold = 0.95, maxBucketSize = 10, failOnCappedBuckets = true).collect()
    }
    assert(e.getMessage.contains("maxBucketSize"))
    // no hot bucket → the cap changes nothing vs the uncapped r11 output
    val small = Seq((1L, hot.toSeq), (2L, hot.map(v => v * 1.001f).toSeq),
      (3L, other1.toSeq)).toDF("id", "emb")
    val capped = Dedup.embeddingNearDupPairs(small, "id", "emb", dim = 16, numPlanes = 8,
        threshold = 0.99, maxBucketSize = 10)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 2L)))
  }

  test("image dHash: invariant to resize/re-encode and brightness shift; distinct images differ") {
    import graft.operators.Multimodal
    val base = Multimodal.Codecs.synthImage(7L, 32, 32)
    val h0 = Multimodal.Codecs.dHash64(base)
    assert(h0 != null)
    // resize + re-encode: same gradients → identical (or near) hash
    val resized = Multimodal.Codecs.resizeImage(base, 64, 64)
    val hr = Multimodal.Codecs.dHash64(resized)
    assert(java.lang.Long.bitCount(h0 ^ hr) <= 6, s"resize moved ${java.lang.Long.bitCount(h0 ^ hr)} bits")
    // uniform brightness shift preserves every gradient SIGN → hash-equal
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(base))
    val bright = new java.awt.image.BufferedImage(img.getWidth, img.getHeight,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val rgb = img.getRGB(x, y)
      def lift(c: Int) = math.min(255, c + 20)
      bright.setRGB(x, y, (lift((rgb >> 16) & 0xff) << 16) |
        (lift((rgb >> 8) & 0xff) << 8) | lift(rgb & 0xff))
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bright, "png", bos)
    val hb = Multimodal.Codecs.dHash64(bos.toByteArray)
    assert(java.lang.Long.bitCount(h0 ^ hb) <= 6,
      s"brightness shift moved ${java.lang.Long.bitCount(h0 ^ hb)} bits")
    // a different image is far away; non-image bytes are null
    val other = Multimodal.Codecs.dHash64(Multimodal.Codecs.synthImage(8L, 32, 32))
    assert(java.lang.Long.bitCount(h0 ^ other) > 10)
    assert(Multimodal.Codecs.dHash64("not an image".getBytes) == null)
    // end-to-end pairing: copies + a brightness variant group together
    val rows = Seq((1L, base), (2L, base), (3L, bos.toByteArray),
      (4L, Multimodal.Codecs.synthImage(9L, 32, 32)),
      (5L, "junk bytes".getBytes)).toDF("id", "content")
    val pairs = Multimodal.imageNearDupPairs(rows, "id", "content", maxHamming = 6)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)), s"got $pairs")
  }

  test("audio fingerprint: gain-invariant energy contour; distinct clips differ; non-audio null") {
    import graft.operators.Multimodal
    val a = Multimodal.Codecs.synthWav(3L, 4000, gain = 0.8)
    val aQuiet = Multimodal.Codecs.synthWav(3L, 4000, gain = 0.3)
    val b = Multimodal.Codecs.synthWav(4L, 4000, gain = 0.8)
    val ha = Multimodal.Codecs.audioFingerprint64(a)
    val hq = Multimodal.Codecs.audioFingerprint64(aQuiet)
    val hb = Multimodal.Codecs.audioFingerprint64(b)
    assert(ha != null && hq != null && hb != null)
    val gainBits = java.lang.Long.bitCount(ha ^ hq)
    assert(gainBits <= 4, s"gain scaling moved $gainBits bits (must be near-invariant)")
    assert(java.lang.Long.bitCount(ha ^ hb) > 10, "different clips must be far apart")
    assert(Multimodal.Codecs.audioFingerprint64("not audio".getBytes) == null)
    // end-to-end: exact copy + gain variant group; the distinct clip doesn't
    val rows = Seq((1L, a), (2L, a), (3L, aQuiet), (4L, b),
      (5L, "junk".getBytes)).toDF("id", "content")
    val pairs = Multimodal.audioNearDupPairs(rows, "id", "content", maxHamming = 4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)), s"got $pairs")
  }

  test("video frame dedup: shared decodable frames pair videos; hot frames are capped out") {
    import graft.operators.Multimodal
    val fs = 2048
    val v1 = Multimodal.Codecs.synthVideo(1L, 5, fs)
    val v1copy = Multimodal.Codecs.synthVideo(1L, 5, fs)
    // partial overlap: frames of seed 1 for f=0..4 vs seed... build a
    // hybrid by concatenation: 3 frames of video 1 + 2 of video 2
    val v2 = Multimodal.Codecs.synthVideo(2L, 5, fs)
    val hybrid = v1.take(3 * fs) ++ v2.take(2 * fs)
    val rows = Seq((1L, v1), (2L, v1copy), (3L, hybrid), (4L, v2),
      (5L, "not video bytes at all".getBytes)).toDF("id", "content")
    val pairs = Multimodal.videoNearDupPairs(rows, "id", "content", frameSize = fs,
        minSharedFrames = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((1L, 2L)) == 5L)   // full copy: all 5 frames shared
    assert(pairs((1L, 3L)) == 3L && pairs((2L, 3L)) == 3L) // hybrid shares 3 with v1
    assert(pairs((3L, 4L)) == 2L)   // and 2 with v2
    assert(!pairs.contains((1L, 4L)), "disjoint videos must not pair")
    assert(pairs.keySet.forall(p => p._1 != 5L && p._2 != 5L))
    // a frame present in EVERY video (boilerplate) is capped out of
    // candidate generation: with maxFrameOccurrences=2 the shared-by-3
    // frames stop generating pairs
    val intro = Multimodal.Codecs.synthImage(99L, 16, 16)
    val padded = intro ++ new Array[Byte](fs - intro.length)
    val withIntro = Seq((1L, padded ++ v1), (2L, padded ++ v2),
      (3L, padded ++ Multimodal.Codecs.synthVideo(3L, 5, fs))).toDF("id", "content")
    val capped = Multimodal.videoNearDupPairs(withIntro, "id", "content", frameSize = fs,
        minSharedFrames = 1, maxFrameOccurrences = 2)
      .collect()
    assert(capped.isEmpty, s"the corpus-wide intro frame must not pair everything: ${capped.toSeq}")
  }

  test("incremental image dedup: store-backed pairs; corpus content is NEVER re-materialized") {
    import graft.operators.Multimodal
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val binSchema = StructType(Seq(StructField("id", LongType), StructField("content", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(binSchema)
    // content generation is instrumented: any plan that touches the
    // corpus's content column must re-run this mapPartitions and bump the
    // accumulator — so accumulator==0 after the incremental call PROVES
    // the corpus was not re-decoded (stronger than the by-construction
    // argument: it would catch a regression that sneaks content back in)
    val corpusReads = spark.sparkContext.longAccumulator("corpusContentReads")
    val corpus = Seq((1L, 10L), (2L, 11L), (3L, 12L)).toDF("id", "seed")
      .mapPartitions { rows => rows.map { r =>
        corpusReads.add(1)
        Row(r.getLong(0), Multimodal.Codecs.synthImage(r.getLong(1), 16, 16))
      } }(enc)
    val dir = java.nio.file.Files.createTempDirectory("imgstore").toString
    Multimodal.imageFingerprintStore(corpus, "id")
      .write.mode("overwrite").parquet(dir)
    Thread.sleep(300)
    val decodesDuringStoreBuild = corpusReads.value.longValue
    assert(decodesDuringStoreBuild >= 3, "store build decodes the corpus once")
    corpusReads.reset()
    val store = spark.read.parquet(dir)
    // delta: id 4 duplicates corpus seed 10, id 5 is novel
    val delta = Seq((4L, 10L), (5L, 99L)).toDF("id", "seed")
      .mapPartitions { rows => rows.map(r =>
        Row(r.getLong(0), Multimodal.Codecs.synthImage(r.getLong(1), 16, 16))) }(enc)
    val pairs = Multimodal.imageIncrementalPairs(delta, store, "id", maxHamming = 0)
      .select("id_new", "id_corpus").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((4L, 1L)), s"got $pairs")
    Thread.sleep(300) // listener/accumulator updates are async
    assert(corpusReads.value.longValue == 0,
      s"incremental dedup re-materialized the corpus content ${corpusReads.value} time(s)")
  }

  test("incremental audio and video dedup against fingerprint stores") {
    import graft.operators.Multimodal
    // audio: delta clip 4 duplicates stored clip 1 (gain variant — the
    // energy contour is gain-invariant); clip 5 is novel
    val a1 = Multimodal.Codecs.synthWav(3L, 4000, gain = 0.8)
    val store = Multimodal.audioFingerprintStore(
      Seq((1L, a1), (2L, Multimodal.Codecs.synthWav(4L, 4000))).toDF("id", "content"), "id")
    val delta = Seq(
      (4L, Multimodal.Codecs.synthWav(3L, 4000, gain = 0.3)),
      (5L, Multimodal.Codecs.synthWav(9L, 4000))).toDF("id", "content")
    val aPairs = Multimodal.audioIncrementalPairs(delta, store, "id", maxHamming = 4)
      .select("id_new", "id_corpus").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(aPairs == Set((4L, 1L)), s"got $aPairs")

    // video: delta video shares 3 frames with stored video 1; the
    // store-side hot-frame cap still applies (intro frame in every video)
    val fs = 2048
    val v1 = Multimodal.Codecs.synthVideo(1L, 5, fs)
    val v2 = Multimodal.Codecs.synthVideo(2L, 5, fs)
    val vStore = Multimodal.videoFrameHashStore(
      Seq((1L, v1), (2L, v2)).toDF("id", "content"), "id", "content", frameSize = fs)
    val hybrid = v1.take(3 * fs) ++ Multimodal.Codecs.synthVideo(7L, 2, fs)
    val vPairs = Multimodal.videoIncrementalPairs(
      Seq((10L, hybrid)).toDF("id", "content"), vStore, "id", "content",
      frameSize = fs, minSharedFrames = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(vPairs == Map((10L, 1L) -> 3L), s"got $vPairs")

    // hot-frame cap on the STORE side: a frame in every stored video
    // (cap 1) generates no candidates
    val intro = Multimodal.Codecs.synthImage(99L, 16, 16)
    val padded = intro ++ new Array[Byte](fs - intro.length)
    val hotStore = Multimodal.videoFrameHashStore(
      Seq((1L, padded ++ v1), (2L, padded ++ v2)).toDF("id", "content"),
      "id", "content", frameSize = fs)
    val capped = Multimodal.videoIncrementalPairs(
      Seq((10L, padded)).toDF("id", "content"), hotStore, "id", "content",
      frameSize = fs, minSharedFrames = 1, maxFrameOccurrences = 1).collect()
    assert(capped.isEmpty, s"hot intro frame must be capped out: ${capped.toSeq}")
  }

  test("video near-dup pairs from a user-supplied frame table (external decoder plug-in)") {
    import graft.operators.Multimodal
    // frames as an external decoder would deliver them: (id, frame_idx,
    // content) — video 1 and 2 share two frame images, video 3 is
    // disjoint; video 1 repeats a frame (counts ONCE: distinct
    // semantics match the raw-layout path); one frame is undecodable
    val fA = Multimodal.Codecs.synthImage(1L, 16, 16)
    val fB = Multimodal.Codecs.synthImage(2L, 16, 16)
    val fC = Multimodal.Codecs.synthImage(3L, 16, 16)
    val fD = Multimodal.Codecs.synthImage(4L, 16, 16)
    val frames = Seq(
      (1L, 0, fA), (1L, 1, fB), (1L, 2, fA), (1L, 3, "junk".getBytes),
      (2L, 0, fA), (2L, 1, fB), (2L, 2, fC),
      (3L, 0, fD), (3L, 1, Multimodal.Codecs.synthImage(5L, 16, 16)))
      .toDF("id", "frame_idx", "content")
    val pairs = Multimodal.videoNearDupPairsFromFrames(frames, "id", "content",
        minSharedFrames = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs == Map((1L, 2L) -> 2L), s"got $pairs")
    // equivalence with the raw fixed-size layout on the same frame content
    val fs = 2048
    def pad(b: Array[Byte]) = b ++ new Array[Byte](fs - b.length)
    val raw = Seq(
      (1L, pad(fA) ++ pad(fB) ++ pad(fA)),
      (2L, pad(fA) ++ pad(fB) ++ pad(fC)),
      (3L, pad(fD) ++ pad(Multimodal.Codecs.synthImage(5L, 16, 16))))
      .toDF("id", "content")
    val rawPairs = Multimodal.videoNearDupPairs(raw, "id", "content", frameSize = fs,
        minSharedFrames = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rawPairs == pairs, s"frame-table and raw-layout paths disagree: $rawPairs vs $pairs")
  }

  test("NearDedupTransformer exact method: drop set without clustering, zero jobs at plan time") {
    import graft.core._
    import graft.operators.NearDedupTransformer
    implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, new InstanceRegistry)
    val docs = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "ccc"), (5L, "bbb"), (6L, "aaa"))
      .toDF("doc_id", "text")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val plan =
      try {
        // exact pairs are already canonical stars — deriving the drop set
        // must NOT run duplicateClusters' probe/union-find jobs: the whole
        // transform is plan construction, zero Spark jobs
        val p = NearDedupTransformer("doc_id", "text", method = "exact").transform(docs)
        Thread.sleep(1000) // async listener bus: nothing should arrive
        assert(jobs.get() == 0, s"exact drop-set derivation ran ${jobs.get()} job(s) at plan time")
        p
      } finally spark.sparkContext.removeSparkListener(listener)
    // and the result keeps exactly the min-id member of each text group
    assert(plan.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 4L))
  }

  test("incremental simhash blocking parity: delta-vs-store pairs == batch pairs restricted to delta×corpus") {
    // randomized (fixed seed): plant near-dup signatures across the
    // delta/corpus boundary, then require the incremental path to find
    // EXACTLY the cross-boundary subset the batch self-join finds —
    // blocking recall must not depend on which side of the store a
    // signature lives on
    val rnd = new scala.util.Random(20260815L)
    val corpusSigs = (1L to 200L).map(i => (i, rnd.nextLong()))
    // delta: 30 fresh randoms + 20 near-copies of corpus sigs (≤3 bits flipped)
    val deltaFresh = (1001L to 1030L).map(i => (i, rnd.nextLong()))
    val deltaNear = (1L to 20L).map { j =>
      val (src, sig) = corpusSigs((j * 7 % 200).toInt)
      var s = sig
      (0 until (j % 4).toInt).foreach(b => s ^= 1L << ((j * 13 + b * 17) % 64))
      (2000L + src, s)
    }
    val delta = (deltaFresh ++ deltaNear).toDF("id", "simhash")
    val corpus = corpusSigs.toDF("id", "simhash")
    val inc = Dedup.simhashIncrementalPairsFromSigs(delta, corpus, maxHamming = 3)
      .select("id_new", "id_corpus").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = Dedup.simhashNearDupPairsFromSigs(
        corpus.unionByName(delta), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      // batch emits id_a < id_b over the union; keep only cross-boundary
      // pairs, oriented (delta, corpus)
      .collect { case (a, b) if a <= 200 && b >= 1000 => (b, a) }
      .toSet
    assert(inc == batch, s"incremental ${inc.size} vs batch-restricted ${batch.size}: " +
      s"missing=${(batch -- inc).take(5)} extra=${(inc -- batch).take(5)}")
    assert(inc.nonEmpty, "planted near-dups must produce pairs")
  }

  test("incremental image dedup plan shape: store rows never shuffle, delta broadcasts") {
    import graft.operators.Multimodal
    val dir = java.nio.file.Files.createTempDirectory("incplan").toString
    val corpus = Multimodal.withSynthImage(
      (0L until 300L).map(i => (i, i)).toDF("media_id", "seed"), "seed", 16, 16)
    Multimodal.imageFingerprintStore(corpus, "media_id")
      .write.mode("overwrite").parquet(s"$dir/store")
    val delta = Multimodal.withSynthImage(
      (1000L until 1020L).map(i => (i, i % 10)).toDF("media_id", "seed"), "seed", 16, 16)
    val pairs = Multimodal.imageIncrementalPairs(delta, spark.read.parquet(s"$dir/store"),
      "media_id", maxHamming = 2)
    // collect() finalizes THIS frame's adaptive plan (a count() would
    // execute a different QueryExecution and leave this one pre-AQE)
    assert(pairs.collect().length == 20) // each delta image dups exactly one stored seed
    val plan = pairs.queryExecution.executedPlan.toString
    // the store's blocked rows must reach both the over-cap anti-join and
    // the pair join WITHOUT a shuffle: the only hash exchanges allowed are
    // the slim over-cap key aggregate and the output-sized pair dedup
    // toString prints Final Plan THEN Initial Plan — audit the final only
    val finalPlan = plan.split("== Initial Plan ==").head
    val shuffles = "Exchange hashpartitioning".r.findAllIn(finalPlan).length
    assert(shuffles <= 2,
      s"store rows shuffled: $shuffles hash exchanges in\n${finalPlan.take(3000)}")
    assert(!finalPlan.contains("SortMergeJoin"),
      "delta-vs-store pair join must broadcast the delta side at this scale")
  }

  test("lsh top-k recall vs brute force on identical-direction vectors") {
    val rnd = new scala.util.Random(7)
    val corpus = (1L to 200L).map(i => (i, Array.fill(32)(rnd.nextGaussian().toFloat).toSeq))
    val query = corpus.head._2.toArray // vec 1 itself → its bucket must match
    val df = corpus.toDF("vec_id", "embedding")
    val brute = Similarity.bruteForceTopK(df, "vec_id", "embedding", query, 1).collect()
    assert(brute.head.getLong(0) == 1L && math.abs(brute.head.getDouble(1) - 1.0) < 1e-9)
    val lsh = Similarity.lshTopK(df, "vec_id", "embedding", query, k = 5, dim = 32,
      numPlanes = 12, probeHamming = 3).collect()
    // the identical vector falls in the query's own bucket (hamming 0)
    assert(lsh.head.getLong(0) == 1L)
  }

  test("duplicate clusters: connected components of pair graph") {
    // components: {1,2,3}, {5,6}, {9}
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (9L, 9L)).toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    assert(got(5L) == 5L && got(6L) == 5L)
    assert(got(9L) == 9L)
    // a longer chain converges too (diameter > 1 hop)
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val chained = Dedup.duplicateClusters(chain).collect().map(_.getLong(1)).distinct
    assert(chained.toSeq == Seq(1L))
    // driver union-find (default) and distributed label propagation
    // (forced via localThreshold = 0) agree exactly
    val viaLocal = Dedup.duplicateClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    val viaIter = Dedup.duplicateClusters(pairs, localThreshold = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(viaLocal == viaIter)
  }

  test("ivf index: identical vector found via nearest cells; recall vs brute force") {
    val rnd = new scala.util.Random(11)
    val corpus = (1L to 300L).map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat).toSeq))
    val df = corpus.toDF("vec_id", "embedding")
    val query = corpus(41)._2.toArray
    val index = Similarity.buildIvfIndex(df, "vec_id", "embedding", nlist = 8)
    val hits = index.topK(query, k = 5, nprobe = 2).collect()
    assert(hits.head.getLong(0) == 42L) // its own cell is always probed first
    assert(math.abs(hits.head.getDouble(1) - 1.0) < 1e-9)
    // probing all cells == brute force
    val all = index.topK(query, k = 5, nprobe = 8).collect().map(_.getLong(0)).toSeq
    val brute = Similarity.bruteForceTopK(df, "vec_id", "embedding", query, 5)
      .collect().map(_.getLong(0)).toSeq
    assert(all == brute)
  }

  test("passage dup stats: shared token windows counted per doc, unique ones not") {
    // docs 1 and 2 share the passage "p q r"; doc 3 shares nothing
    val docs = Seq(
      (1L, "a b c p q r"),
      (2L, "x y z p q r"),
      (3L, "h i j k l m")).toDF("doc_id", "text")
    val got = Dedup.passageDupStats(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // 4 windows per 6-token doc; exactly one ("p q r") is cross-doc for 1 and 2
    assert(got(1L) == ((4L, 1L)) && got(2L) == ((4L, 1L)) && got(3L) == ((4L, 0L)))
  }

  test("distinct stopword hits counts distinct matches, not occurrences") {
    val df = Seq((1L, "the the the cat"), (2L, "the cat and a dog")).toDF("id", "text")
    val got = df.select(col("id"),
        TextAnalysis.distinctStopwordHits(col("text"), TextAnalysis.englishStopwords))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(1L) == 1 && got(2L) == 3) // the, and, a
  }

  test("batch ANN joins: self-queries rank themselves first; full probing matches brute force") {
    val rnd = new scala.util.Random(19)
    val corpus = (1L to 240L).map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat).toSeq))
    val df = corpus.toDF("vec_id", "embedding")
    val queries = df.where(col("vec_id") % 30 === 0)

    // LSH join: every query is a corpus row → probe 0 (own bucket) holds it
    val lsh = Similarity.lshTopKJoin(df, queries, "vec_id", "vec_id", "embedding",
      k = 1, dim = 16, numPlanes = 10, probeBits = 1).collect()
    assert(lsh.length == 8)
    assert(lsh.forall(r => r.getLong(0) == r.getLong(1) && r.getInt(2) == 1))

    // IVF join: own cell ranks first; probing ALL cells == per-query brute force
    val index = Similarity.buildIvfIndex(df, "vec_id", "embedding", nlist = 6)
    val ivf1 = Similarity.ivfTopKJoin(index, queries, "vec_id", "embedding", k = 1, nprobe = 1)
      .collect()
    assert(ivf1.forall(r => r.getLong(0) == r.getLong(1) && r.getInt(2) == 1))
    val ivfAll = Similarity.ivfTopKJoin(index, queries, "vec_id", "embedding", k = 3, nprobe = 6)
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    queries.collect().map(_.getLong(0)).foreach { q =>
      val brute = Similarity.bruteForceTopK(df, "vec_id", "embedding",
        corpus(q.toInt - 1)._2.toArray, 3).collect().map(_.getLong(0)).toSeq
      val got = (1 to 3).map(r => ivfAll((q, r)))
      assert(got == brute, s"query $q: ivf=$got brute=$brute")
    }
  }

  test("ivf index write/load: probe is a partition-pruned scan (PartitionFilters on _ivf_cell)") {
    implicit val s = spark
    val rnd = new scala.util.Random(7)
    val corpus = (1L to 300L).map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat).toSeq))
    val df = corpus.toDF("vec_id", "embedding")
    val query = corpus(41)._2.toArray
    val built = Similarity.buildIvfIndex(df, "vec_id", "embedding", nlist = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    built.write(dir)
    val loaded = Similarity.IvfIndex.load(spark, dir, "vec_id", "embedding")
    assert(loaded.centroids.length == 8 && loaded.centroids.forall(_.length == 16))
    // identical results from the persisted index
    val fromLoaded = loaded.topK(query, k = 5, nprobe = 8).collect().map(_.getLong(0)).toSeq
    val fromBuilt = built.topK(query, k = 5, nprobe = 8).collect().map(_.getLong(0)).toSeq
    assert(fromLoaded == fromBuilt)
    // the probe plan must prune at the partition level: the cell filter
    // shows up as PartitionFilters on the file scan, NOT a post-scan Filter
    val probe = loaded.topK(query, k = 5, nprobe = 2)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("_ivf_cell"))
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).get
    assert(pf.contains("_ivf_cell"), s"cell filter not in PartitionFilters: $pf")
    // and only nprobe of the 8 cell directories are actually read
    val scanned = probe.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }
    assert(scanned.nonEmpty && scanned.head == 2, s"expected 2 cells scanned, got $scanned")
  }

  test("decontamination flags docs sharing word n-grams with a benchmark") {
    val bench = Seq("the quick brown fox jumps over the lazy dog tonight").toDF("text")
    val corpus = Seq(
      (1L, "something about the quick brown fox jumps over the lazy dog again"), // 5-gram overlap
      (2L, "completely unrelated content with no shared phrases at all here"),
      (3L, "the quick brown fox jumps over the lazy dog tonight")                // the benchmark doc itself
    ).toDF("doc_id", "text")
    val got = Decontamination.contaminationReport(corpus, "doc_id", "text", bench, "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.contains(1L) && got.contains(3L) && !got.contains(2L))
    // doc 3 is identical: every one of its 5-grams overlaps (6 five-grams in 10 tokens)
    assert(got(3L) == 6L)
    assert(got(1L) >= 1L && got(1L) < got(3L))
  }

  test("language id identifies real multilingual samples") {
    implicit val ctx = graft.core.ActionPipelineContext(spark, new graft.core.InstanceRegistry())
    val samples = Seq(
      ("en", "the cat sat on the mat and it was a good day for all of us"),
      ("de", "der hund und die katze sind nicht mit dem auto auf der straße gefahren"),
      ("es", "el perro y el gato están en la casa de mi madre con los niños"),
      ("fr", "le chien et le chat sont dans la maison avec les enfants du village"),
      ("zh", "今天天气很好我们一起去公园散步吧这是一个美丽的城市")).toDF("expected", "text")
    val got = samples.withColumn("pred", TextAnalysis.langId(col("text")))
      .where(col("pred") === col("expected")).count()
    assert(got == 5)
  }

  test("quality score separates clean text from noise") {
    val clean = baseText
    val noisy = "x@#$ 1234 !!!! ???? 9876 @@@@ ## $$ %% 3.14159 0000000"
    val df = Seq(("clean", clean), ("noisy", noisy)).toDF("kind", "text")
    val scores = df.select(col("kind"), TextAnalysis.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(scores("clean") > scores("noisy") + 0.2)
  }

  test("multimodal plumbing: metadata, features, frames have correct shape") {
    implicit val ctx = graft.core.ActionPipelineContext(spark, new graft.core.InstanceRegistry())
    val media = Seq((1L, "some binary payload content here".getBytes),
      (2L, Array.fill[Byte](256)(42))).toDF("id", "content")
    val out = graft.operators.Multimodal.sampleFrames(
      graft.operators.Multimodal.withImageFeatures(
        graft.operators.Multimodal.withImageMetadata(media), dim = 16),
      "content", frameSize = 8, stride = 2)
    // non-image payloads carry honest stub metadata (width 0, no decode)
    val rows = out.select(col("image_meta.width"), size(col("features")), size(col("frames"))).collect()
    assert(rows.forall(r => r.getInt(0) == 0 && r.getInt(1) == 16 && r.getInt(2) >= 1))
    // determinism: same content → same stub features
    val f1 = out.where(col("id") === 1).select(col("features")).collect().head.getSeq[Float](0)
    val f2 = out.where(col("id") === 1).select(col("features")).collect().head.getSeq[Float](0)
    assert(f1 == f2)
  }

  test("DSIR importance resampling: planted target-like docs rank exactly on top; scores bit-stable") {
    import graft.functions.ImportanceResampling
    // target distribution: ML-ish vocabulary; corpus: 5 planted ML docs
    // among 50 cooking docs (same length, so the TF-weighted score can't
    // win on length alone) → the planted 5 must be exactly the top 5
    val target = (1 to 20).map(i => (1000L + i, s"neural network training loss gradient step $i"))
      .toDF("doc_id", "text")
    val planted = (1 to 5).map(i => (i.toLong, s"gradient descent neural network loss curve $i"))
    val noise = (6 to 55).map(i => (i.toLong, s"chop the onions and simmer the broth gently $i"))
    val corpus = scala.util.Random.shuffle(planted ++ noise).toDF("doc_id", "text")
    val top = ImportanceResampling.resampleTopK(corpus, target, col("doc_id"), col("text"),
      numBuckets = 512, k = 5)
    assert(top.select("doc_id").as[Long].collect().toSet == (1L to 5L).toSet)
    assert(top.select("rank").as[Int].collect().sorted.toSeq == Seq(1, 2, 3, 4, 5))
    // determinism: identical score BITS across partitionings (the
    // ascending-sorted fold makes the double addition order a pure
    // function of the document)
    def scores(d: org.apache.spark.sql.DataFrame) =
      ImportanceResampling.scored(d, target, col("text"), 512)
        .select("doc_id", "score").collect()
        .map(r => r.getLong(0) -> java.lang.Double.doubleToLongBits(r.getDouble(1))).toMap
    assert(scores(corpus) == scores(corpus.repartition(13)))
  }

  test("sampleFrames counts every FULL frame, not full stride blocks") {
    implicit val ctx = graft.core.ActionPipelineContext(spark, new graft.core.InstanceRegistry())
    // frameSize=16, stride=4: frame i reads [i*64, i*64+16) — emitted iff
    // it fits. len 16 → 1 frame (the old len/64 formula said 0); len 63 →
    // still 1; len 80 → 2 (offsets 0 and 64); len 15 → 0.
    val media = Seq(
      (16L, Array.fill[Byte](16)(1)), (63L, Array.fill[Byte](63)(2)),
      (80L, Array.fill[Byte](80)(3)), (15L, Array.fill[Byte](15)(4)),
      (0L, Array.empty[Byte])).toDF("id", "content")
    val got = graft.operators.Multimodal.sampleFrames(media, "content", frameSize = 16, stride = 4)
      .select(col("id"), size(col("frames"))).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(16L -> 1, 63L -> 1, 80L -> 2, 15L -> 0, 0L -> 0))
    // every emitted frame is exactly frameSize bytes
    val lens = graft.operators.Multimodal.sampleFrames(media, "content", 16, 4)
      .select(explode(col("frames")).as("f")).select(length(col("f"))).collect().map(_.getInt(0))
    assert(lens.nonEmpty && lens.forall(_ == 16))
  }

  test("multimodal decode is REAL for JDK-supported formats: PNG metadata equals encoded dimensions") {
    // author an actual 20x10 PNG in-memory (javax.imageio, JDK built-in)
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = Seq(
      (1L, png(20, 10, 0xff0000)),                       // real PNG
      (2L, "definitely not an image".getBytes("UTF-8"))  // undecodable → stub fallback
    ).toDF("id", "content")
    val out = graft.operators.Multimodal.withImageFeatures(
      graft.operators.Multimodal.withImageMetadata(media), dim = 12)
    val byId = out.select(col("id"), col("image_meta.width"), col("image_meta.height"),
        col("image_meta.format"), col("features"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3), r.getSeq[Float](4)))).toMap
    val (w1, h1, fmt1, feat1) = byId(1L)
    assert(w1 == 20 && h1 == 10 && fmt1 == "png")
    // pure red image → R channel samples saturate to +1, G/B to -1
    assert(feat1.zipWithIndex.forall { case (v, i) =>
      if (i % 3 == 0) math.abs(v - 1f) < 0.02f else math.abs(v + 1f) < 0.02f })
    val (_, _, fmt2, feat2) = byId(2L)
    assert(fmt2 == "stub" && feat2.size == 12)
  }

  test("multimodal audio decode is REAL for WAV: metadata and RMS energy from actual PCM") {
    // author a 16-bit mono WAV: 0.5s of a loud sine then 0.5s of silence
    val sampleRate = 8000
    val n = sampleRate // 1 second
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n / 2) {
      val s = (math.sin(2 * math.Pi * 440 * i / sampleRate) * 30000).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val media = Seq((1L, bos.toByteArray), (2L, "not audio at all".getBytes("UTF-8")))
      .toDF("id", "content")
    val out = graft.operators.Multimodal.withAudioFeatures(
      graft.operators.Multimodal.withAudioMetadata(media), dim = 8)
    val rows = out.select(col("id"), col("audio_meta.sample_rate"), col("audio_meta.channels"),
        col("audio_meta.frames"), col("audio_meta.format"), col("audio_features"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getString(4), r.getSeq[Float](5)))).toMap
    val (sr, ch, frames, f, feat) = rows(1L)
    assert(sr == 8000 && ch == 1 && frames == 8000L && f == "wav")
    // first half (sine) carries energy, second half (silence) none
    assert(feat.take(4).forall(_ > 0.3f) && feat.drop(4).forall(_ < 0.01f))
    val (_, _, _, f2, feat2) = rows(2L)
    assert(f2 == "stub" && feat2.size == 8)
  }

  test("multimodal resize: real PNG scales to target dims; non-image maps to null") {
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, 0x00ff00)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = Seq((1L, png(64, 32)), (2L, "not an image".getBytes("UTF-8"))).toDF("id", "content")
    val out = graft.operators.Multimodal.withResizedImage(media, width = 16, height = 16)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("content_resized")).toMap
    val resized = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out(1L)))
    assert(resized.getWidth == 16 && resized.getHeight == 16)
    assert((resized.getRGB(8, 8) & 0xffffff) == 0x00ff00) // color survives the scale
    assert(out(2L) == null)
  }

  test("capped LSH buckets route exact dups through the fallback instead of dropping them") {
    // 40 identical boilerplate docs with maxBucketSize=10: every band bucket
    // holds all 40 → every bucket is capped and the banding path yields
    // NOTHING. The exact-content fallback must still surface the dups as
    // star pairs (head=1), verified at jaccard 1.0 — recall on a
    // boilerplate-heavy corpus no longer depends on reading the cap warning.
    val boiler = (1L to 40L).map(i => (i, baseText)).toDF("doc_id", "text")
    val pairs = Dedup.minhashDuplicatePairs(boiler, "doc_id", "text",
      shingleSize = 5, numHashes = 32, bands = 8, threshold = 0.5, maxBucketSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs == (2L to 40L).map(j => (1L, j, 1.0)).toSet)

    // fallback off → the old drop semantics (documented trade-off) remain
    val dropped = Dedup.minhashDuplicatePairs(boiler, "doc_id", "text",
      shingleSize = 5, numHashes = 32, bands = 8, threshold = 0.5, maxBucketSize = 10,
      cappedBucketExactFallback = false)
    assert(dropped.isEmpty)

    // incremental shape: a delta twin of capped-corpus boilerplate surfaces
    val store = Dedup.minhashSignatures(boiler, "doc_id", "text", 5, 32)
    val delta = Seq((100L, baseText)).toDF("doc_id", "text")
    val inc = Dedup.minhashIncrementalPairs(delta, store, "doc_id", "text",
      shingleSize = 5, numHashes = 32, bands = 8, threshold = 0.5, maxBucketSize = 10)
      .select("id_new", "id_corpus").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc == (1L to 40L).map(j => (100L, j)).toSet)
  }

  test("uncapped buckets: probe-gated batch path emits exact-copy pairs without the star union") {
    // NO bucket is capped here, so the probe gate skips the anti-join and
    // the exact-star fallback entirely — recall must be unaffected because
    // exact copies share every band and pair through their own (uncapped)
    // buckets. The CONTROL arm drives minhashPairsFromSigs directly with
    // probeGateUncapped = false, which genuinely takes the lazy
    // star-union branch (the r19 spec compared the gated path with itself
    // — both arms went through minhashDuplicatePairs, whose probe gate is
    // hardwired on; ADVICE r19 #1). Same sigs frame feeds both arms.
    val docs = ((1L to 6L).map(i => (i, s"$baseText unique tail $i")) ++
      Seq((101L, baseText), (102L, baseText))).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", shingleSize = 5, numHashes = 32)
      .persist()
    try {
      def run(probe: Boolean) = Dedup.minhashPairsFromSigs(sigs, bands = 8, rowsPerBand = 4,
          threshold = 0.5, cappedBucketExactFallback = true, probeGateUncapped = probe)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val gated = run(probe = true)     // probe branch: no anti-join, no star union
      val starred = run(probe = false)  // lazy branch: anti-join + star union + pair dedup
      assert(gated == starred,
        s"gated and star-unioned arms must agree on an uncapped corpus: $gated vs $starred")
      assert(gated.contains((101L, 102L, 1.0)))
    } finally sigs.unpersist()
  }

  test("capped corpus with probe gate: ONE over-cap aggregate, reused as the anti-join build") {
    // r19 VERDICT #3: with the probe ON and a bucket actually capped, the
    // old shape ran the eager probe aggregate AND an identical lazy
    // over-cap aggregate inside the plan — one redundant full pass over
    // the banded view, paid exactly on the skewed corpora the guard
    // exists for. Now the probe's collected key list IS the anti-join
    // build side: the executed plan must contain NO over-cap aggregate
    // (no `_n > cap` filter — the keys arrive as a LocalRelation) while
    // the output still routes the capped boilerplate through the star
    // fallback unchanged.
    val boiler = (1L to 40L).map(i => (i, baseText)).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(boiler, "doc_id", "text", shingleSize = 5, numHashes = 32)
      .persist()
    try {
      val pairs = Dedup.minhashPairsFromSigs(sigs, bands = 8, rowsPerBand = 4,
        threshold = 0.5, maxBucketSize = 10, probeGateUncapped = true)
      val plan = pairs.queryExecution.optimizedPlan.toString
      // the lazy shape's rebuild aggregates over the banded view — its
      // signature is `Aggregate [band, bucket]`; the star fallback's head
      // aggregate (over _ck) legitimately remains
      assert(!plan.contains("Aggregate [band"),
        s"probe-gated capped plan must not rebuild the over-cap aggregate:\n$plan")
      assert(plan.contains("LocalRelation"),
        s"probe's collected keys must arrive as a LocalRelation build side:\n$plan")
      val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == (2L to 40L).map(j => (1L, j, 1.0)).toSet)
    } finally sigs.unpersist()
  }

  test("simhash capped bucket: exact-fingerprint fallback recovers exact copies") {
    // ADVICE r18: the simhash pair paths dropped over-cap buckets with NO
    // exact-copy fallback — exact duplicates of corpus-wide boilerplate
    // re-entered the store as 'novel'. The delta-broadcast exact join (the
    // minhash fallback's shape) now recovers them.
    val store = (1L to 40L).map(i => (i, 0x1234567890abcdefL)).toDF("id", "simhash")
    val delta = Seq((100L, 0x1234567890abcdefL), (101L, 0x0f0f0f0f0f0f0f0fL))
      .toDF("id", "simhash")
    val pairs = Dedup.simhashIncrementalPairsFromSigs(delta, store,
        maxHamming = 3, maxBucketSize = 10)
      .select("id_new", "id_corpus").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == (1L to 40L).map(j => (100L, j)).toSet,
      s"exact copies in a capped bucket must be recovered, got ${pairs.size} pairs")
    // opting out restores the silent-prune shape
    assert(Dedup.simhashIncrementalPairsFromSigs(delta, store,
      maxHamming = 3, maxBucketSize = 10, cappedBucketExactFallback = false).isEmpty)
    // and the BLOCKED-store layout path recovers them too
    val blockedStore = Dedup.simhashBlockedStore(store, maxHamming = 3)
    val blockedPairs = Dedup.simhashIncrementalPairsFromBlockedStore(delta, blockedStore,
        maxHamming = 3, maxBucketSize = 10)
      .select("id_new", "id_corpus").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blockedPairs == (1L to 40L).map(j => (100L, j)).toSet)
  }

  test("fused media pass: a bucket tipped over the cap by DELTA rows still catches store duplicates") {
    // the ADVICE failure class: the fused store+intra corpus counts store
    // and delta rows TOGETHER for the cap, so a store bucket under the cap
    // alone could be anti-joined away once the delta's own copies pushed it
    // over — delta re-posts of stored content re-entered as 'novel'
    import graft.operators.{IncrementalMediaDedupTransformer, Multimodal}
    implicit val ctx: core.ActionPipelineContext =
      core.ActionPipelineContext(spark, new core.InstanceRegistry)
    val t = IncrementalMediaDedupTransformer("b", "s", "media_id",
      modality = "image", maxHamming = 0, maxBucketSize = 10)
    // store: 8 fingerprints of the seed-10 image (under the cap alone)
    val store = Multimodal.imageFingerprintStore(
      Multimodal.withSynthImage((1L to 8L).map(i => (i, 10L)).toDF("media_id", "seed"),
        "seed", 16, 16), "media_id", "content")
    // batch: 5 re-posts of seed 10 (8 + 5 = 13 > cap) + one novel
    val batch = Multimodal.withSynthImage(
      ((100L to 104L).map(i => (i, 10L)) :+ (200L, 99L)).toDF("media_id", "seed"),
      "seed", 16, 16)
    val out = t.transform(Map("b" -> batch, "s" -> store))
    assert(out("b").select("media_id").as[Long].collect().toSet == Set(200L),
      "store duplicates in a combined-count over-cap bucket must still drop")
  }

  test("failOnCappedBuckets fails at construction with the capped-bucket count") {
    // the eager probe replaces the old lazy raise_error carrier: a corpus
    // whose every bucket is capped must throw when the pair frame is BUILT
    // (not when some downstream action finally runs), carrying the count
    val boiler = (1L to 40L).map(i => (i, baseText)).toDF("doc_id", "text")
    val e = intercept[IllegalStateException](
      Dedup.minhashDuplicatePairs(boiler, "doc_id", "text",
        shingleSize = 5, numHashes = 32, bands = 8, threshold = 0.5,
        maxBucketSize = 10, failOnCappedBuckets = true))
    assert(e.getMessage.contains("exceeded maxBucketSize"))
  }

  test("C4 line cleaning: terminal punctuation + min words per line, document drops") {
    import TextAnalysis._
    val df = Seq(
      (1, "Good line stays right here.\nno\nalso no punctuation\nAnother keeper line!"),
      (2, "lorem ipsum dolor sit amet."),     // kept line, doc dropped (lorem)
      (3, "short.\nA brace { appears inline."), // 'short.' 1 word dropped; brace rejects doc
      (4, "nothing survives this one")        // no terminal punctuation at all
    ).toDF("id", "text")
    val got = df.select(col("id"), c4CleanLines(col("text")).as("c"))
      .withColumn("a", c4DocumentAccept(col("c")))
      .collect().map(r => r.getInt(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
    assert(got(1) == ("Good line stays right here.\nAnother keeper line!", true))
    assert(got(2) == ("lorem ipsum dolor sit amet.", false))
    assert(got(3) == ("A brace { appears inline.", false))
    assert(got(4) == ("", false))
  }

  test("Gopher quality signals fire the paper's reject rules") {
    import TextAnalysis._
    val longGood = (("the data be flowing to all of them and that they have fun with it " * 5) + "done.").trim
    val hashNoise = ("word " * 60).trim + " # # # # # # # # # # # # # # #"
    val tooShort = "the and that of it."
    val bullets = "the one and that have to be of with them here now\n- a\n- b\n- c\n- d\n- e\n- f\n- g\n- h\n- i\n- j"
    val df = Seq((1, longGood), (2, hashNoise), (3, tooShort), (4, bullets)).toDF("id", "t")
    val sig = withGopherSignals(df, "t").collect()
      .map(r => r.getAs[Int]("id") -> r).toMap
    assert(sig(1).getAs[Boolean]("gopher_accept"))
    assert(!sig(2).getAs[Boolean]("gopher_accept") &&
      sig(2).getAs[Double]("symbol_word_ratio") > 0.1)
    assert(!sig(3).getAs[Boolean]("gopher_accept") && sig(3).getAs[Int]("word_count") < 50)
    assert(!sig(4).getAs[Boolean]("gopher_accept") &&
      sig(4).getAs[Double]("bullet_line_frac") > 0.9)
    assert(sig(1).getAs[Int]("stopword_hits") >= 2)
  }

  test("duplicateClusters converges when propagation needs exactly maxIter change rounds") {
    // chain 0-1-2-3-4: min label needs 4 change rounds to reach node 4;
    // the verification round must not count against maxIter
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(pairs, maxIter = 4, localThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }

  test("duplicateClusters pointer doubling: a 32-hop chain converges in O(log d) rounds") {
    // chain 0-1-…-32 (diameter 32) through the DISTRIBUTED path with
    // maxIter = 9: one-hop propagation alone moves the min label one edge
    // per round and would need 32 change rounds — only the
    // label-of-label shortcut (distance doubles per round) can converge
    // inside this budget. Pins the O(log diameter) round complexity, not
    // just the fixed point.
    val chain = (0L until 32L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(chain, maxIter = 9, localThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length == 33 && got.forall(_._2 == 0L))
  }

  test("minhash banding rejects degenerate parameters loudly") {
    val docs = Seq((1L, baseText)).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.minhashDuplicatePairs(docs, "doc_id", "text", numHashes = 0, bands = 1)
    }
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.minhashPairsFromSigs(sigs, bands = 64, rowsPerBand = 0)
    }
  }

  test("topKForQueries: null ids are never self-matches, even null against null") {
    val corpus = Seq((Some(1L), Array(1f, 0f)), (Option.empty[Long], Array(0.9f, 0.1f)))
      .toDF("id", "emb")
    val queries = Seq((Option.empty[Long], Array(1f, 0f))).toDF("qid", "emb")
    val got = Similarity.topKForQueries(corpus, queries, "id", "qid", "emb", k = 5)
    // the null-id corpus row must appear among the null-id query's
    // neighbors — it is a distinct row, not a self match
    assert(got.count() == 2)
  }

  test("IncrementalDedupTransformer wires as a DAG action: bootstrap run, then incremental dedup") {
    import graft.core._
    import graft.operators._
    import graft.sources._
    val dir = java.nio.file.Files.createTempDirectory("incdedup").toString
    val reg = new InstanceRegistry
    reg.register(ParquetFileDataObject("batch", s"$dir/batch"))
    reg.register(ParquetFileDataObject("novel", s"$dir/novel"))
    reg.register(ParquetFileDataObject("store", s"$dir/store"))
    implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, reg)
    // saveMode Append: the transformer emits the store DELTA (novel docs'
    // signatures) and the action APPENDS it — per-run store I/O is
    // O(increment), and the novel sink accumulates survivors across runs
    val action = CustomDataFrameAction("inc", Seq("batch"), Seq("novel", "store"),
      Seq(IncrementalDedupTransformer("batch", "store", "doc_id", "text",
        threshold = 0.5, bands = 16, novelOutput = Some("novel"))),
      saveMode = Some(SdlSaveMode.Append),
      recursiveInputIds = Seq("store"))

    // run 1: store doesn't exist yet — bootstrap from empty, all docs novel
    Seq((1L, baseText),
        (2L, "completely different content about databases and query engines " * 5))
      .toDF("doc_id", "text").write.parquet(s"$dir/batch")
    new ActionDAGRun(Seq(action)).run()
    assert(spark.read.parquet(s"$dir/novel").count() == 2)
    // store rows are (id, shingles, sig) — minhashSignatures' schema
    assert(spark.read.parquet(s"$dir/store").select("id").distinct().count() == 2)

    // run 2: one near-dup of corpus doc 1, one novel — only the novel survives
    Seq((101L, baseText + " second crawl tail"),
        (102L, "entirely novel text about deep sea exploration and marine biology " * 5))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/batch")
    new ActionDAGRun(Seq(action)).run()
    val novel = spark.read.parquet(s"$dir/novel").select("doc_id").as[Long].collect().toSet
    assert(novel == Set(1L, 2L, 102L))       // accumulated survivors (append sink)
    val storeIds = spark.read.parquet(s"$dir/store").select("id").distinct()
      .as[Long].collect().toSet
    assert(storeIds == Set(1L, 2L, 102L))    // grown by the survivor only

    // wiring guard: the delta-emitting transformer with a non-append save
    // mode would silently truncate the store — rejected at construction
    intercept[IllegalArgumentException] {
      CustomDataFrameAction("bad", Seq("batch"), Seq("novel", "store"),
        Seq(IncrementalDedupTransformer("batch", "store", "doc_id", "text",
          novelOutput = Some("novel"))),
        recursiveInputIds = Seq("store"))
    }
  }

  test("IncrementalMediaDedupTransformer wires as a DAG action: bootstrap, then delta dedup, corpus never re-decoded") {
    import graft.core._
    import graft.operators._
    import graft.sources._
    val dir = java.nio.file.Files.createTempDirectory("incmedia").toString
    val reg = new InstanceRegistry
    reg.register(ParquetFileDataObject("mbatch", s"$dir/batch"))
    reg.register(ParquetFileDataObject("mnovel", s"$dir/novel"))
    reg.register(ParquetFileDataObject("mstore", s"$dir/store"))
    implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, reg)
    val action = CustomDataFrameAction("incm", Seq("mbatch"), Seq("mnovel", "mstore"),
      dfsTransformers = Seq(IncrementalMediaDedupTransformer("mbatch", "mstore", "media_id",
        modality = "image", maxHamming = 0, novelOutput = Some("mnovel"))),
      saveMode = Some(SdlSaveMode.Append),
      recursiveInputIds = Seq("mstore"))

    def batchOf(rows: Seq[(Long, Long)]): Unit =
      Multimodal.withSynthImage(rows.toDF("media_id", "seed"), "seed", 16, 16)
        .write.mode("overwrite").parquet(s"$dir/batch")
    def storeFiles(): Set[String] = {
      val d = new java.io.File(s"$dir/store")
      if (!d.exists()) Set.empty
      else d.listFiles().map(_.getName).filter(n => n.endsWith(".parquet")).toSet
    }

    // run 1: bootstrap — all novel, store created with (id, dhash64)
    batchOf(Seq((1L, 10L), (2L, 11L)))
    new ActionDAGRun(Seq(action)).run()
    assert(spark.read.parquet(s"$dir/novel").count() == 2)
    assert(spark.read.parquet(s"$dir/store").columns.toSet == Set("id", "dhash64"))
    assert(spark.read.parquet(s"$dir/store").count() == 2)
    val filesAfterRun1 = storeFiles()

    // run 2: one perceptual dup of stored image (seed 10), one novel —
    // only the novel survives and grows the store (8 bytes/item of
    // state; run 2 never touches run 1's image bytes). Decode-once is
    // pinned by the JVM-local decode counter: run 2's batch of 2 images
    // is fingerprinted exactly ONCE each (not once for the pair join and
    // again for store growth).
    batchOf(Seq((3L, 10L), (4L, 99L)))
    Multimodal.Codecs.fingerprintDecodes.reset()
    new ActionDAGRun(Seq(action)).run()
    assert(Multimodal.Codecs.fingerprintDecodes.sum() == 2L,
      s"decodes-per-batch must equal batch size, got ${Multimodal.Codecs.fingerprintDecodes.sum()}")
    val novel = spark.read.parquet(s"$dir/novel").select("media_id").as[Long].collect().toSet
    assert(novel == Set(1L, 2L, 4L), s"got $novel")  // accumulated survivors (append sink)
    assert(spark.read.parquet(s"$dir/store").select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 4L))
    // append-shaped store growth: run 2 ADDED files (run 1's untouched),
    // and the added files hold exactly the novel fingerprints — per-batch
    // store write volume is O(novel), never O(store)
    val added = (storeFiles() -- filesAfterRun1).toSeq.map(n => s"$dir/store/$n")
    assert(filesAfterRun1.subsetOf(storeFiles()), "append must not rewrite run 1's files")
    assert(added.nonEmpty)
    assert(spark.read.parquet(added: _*).select("id").as[Long].collect().toSet == Set(4L),
      "run 2's store write must contain exactly the novel fingerprints")

    // audio modality: gain-variant of a stored clip drops (the energy
    // contour is gain-invariant), novel clip survives with afp64 state
    val aDir = java.nio.file.Files.createTempDirectory("incaudio").toString
    val aReg = new InstanceRegistry
    aReg.register(ParquetFileDataObject("abatch", s"$aDir/batch"))
    aReg.register(ParquetFileDataObject("anovel", s"$aDir/novel"))
    aReg.register(ParquetFileDataObject("astore", s"$aDir/store"))
    val aCtx = ActionPipelineContext(spark, aReg)
    val aAction = CustomDataFrameAction("inca", Seq("abatch"), Seq("anovel", "astore"),
      dfsTransformers = Seq(IncrementalMediaDedupTransformer("abatch", "astore", "media_id",
        modality = "audio", maxHamming = 4, novelOutput = Some("anovel"))),
      saveMode = Some(SdlSaveMode.Append),
      recursiveInputIds = Seq("astore"))
    Seq((1L, Multimodal.Codecs.synthWav(3L, 4000, gain = 0.8)))
      .toDF("media_id", "content").write.mode("overwrite").parquet(s"$aDir/batch")
    new ActionDAGRun(Seq(aAction)).run()(aCtx)
    Seq((2L, Multimodal.Codecs.synthWav(3L, 4000, gain = 0.3)),
        (3L, Multimodal.Codecs.synthWav(9L, 4000)))
      .toDF("media_id", "content").write.mode("overwrite").parquet(s"$aDir/batch")
    new ActionDAGRun(Seq(aAction)).run()(aCtx)
    assert(spark.read.parquet(s"$aDir/novel").select("media_id").as[Long].collect().toSet ==
      Set(1L, 3L))                           // accumulated survivors (append sink)
    assert(spark.read.parquet(s"$aDir/store").columns.toSet == Set("id", "afp64"))
  }

  test("round-13 curation transformers wire through HOCON config into a DAG run") {
    import graft.core._
    val dir = java.nio.file.Files.createTempDirectory("r13cfg").toString
    val shared = "one two three four five six seven eight nine ten"
    Seq(
      (1L, s"Cookie banner line.\nalpha $shared omega"),
      (2L, s"Cookie banner line.\nbeta $shared zeta"),
      (3L, "Cookie banner line.\nunrelated unique content here"))
      .toDF("doc_id", "text").write.parquet(s"$dir/in")
    Seq((1L, "benchmark only words nobody leaked anywhere at all"))
      .toDF("bid", "btext").write.parquet(s"$dir/bench")
    val conf = s"""
      |dataObjects {
      |  in   { type = ParquetFileDataObject, path = "$dir/in" }
      |  bench{ type = ParquetFileDataObject, path = "$dir/bench" }
      |  out  { type = ParquetFileDataObject, path = "$dir/out" }
      |  out2 { type = ParquetFileDataObject, path = "$dir/out2" }
      |}
      |actions {
      |  clean {
      |    type = CopyAction, inputId = in, outputId = out
      |    transformers = [
      |      { type = lineDedup,   idColumn = doc_id, textColumn = text },
      |      { type = spanRemoval, idColumn = doc_id, textColumn = text, windowTokens = 8 }
      |    ]
      |  }
      |  decon {
      |    type = CustomDataFrameAction, inputIds = [out, bench], outputIds = [out2]
      |    dfsTransformers = [{ type = decontaminateSpans, corpusInput = out,
      |      benchmarkInput = bench, idColumn = doc_id, textColumn = text,
      |      benchTextColumn = btext, cleanOutput = out2 }]
      |  }
      |}""".stripMargin
    val reg = ConfigParser.parse(conf)
    implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, reg)
    new ActionDAGRun(reg.allActions).run()
    val out = spark.read.parquet(s"$dir/out2")
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // line dedup stripped the corpus-wide banner; span removal stripped the
    // cross-doc 10-token passage; the clean benchmark stripped nothing more
    assert(out(1L) == "alpha omega", s"got ${out(1L)}")
    assert(out(2L) == "beta zeta")
    assert(out(3L) == "unrelated unique content here")
  }

  test("scoring-family transformers wire through HOCON config into a DAG run") {
    import graft.core._
    val dir = java.nio.file.Files.createTempDirectory("r14cfg").toString
    val good = "encyclopedia science history knowledge research method evidence theory " * 4
    val junk = "win casino lottery click here free prize money jackpot bonus spins " * 4
    Seq((1L, good + "alpha", "en"), (2L, good + "beta", "en"),
        (3L, junk + "gamma", "en"), (4L, junk + "delta", "xx"))
      .toDF("doc_id", "text", "lang").write.parquet(s"$dir/corpus")
    Seq((100L, good), (101L, good + " archive journal")).toDF("sid", "stext")
      .write.parquet(s"$dir/tseed")
    Seq((200L, junk), (201L, junk + " unsubscribe now")).toDF("sid", "stext")
      .write.parquet(s"$dir/bseed")
    val conf = s"""
      |dataObjects {
      |  corpus { type = ParquetFileDataObject, path = "$dir/corpus" }
      |  tseed  { type = ParquetFileDataObject, path = "$dir/tseed" }
      |  bseed  { type = ParquetFileDataObject, path = "$dir/bseed" }
      |  nbout  { type = ParquetFileDataObject, path = "$dir/nbout" }
      |  pplout { type = ParquetFileDataObject, path = "$dir/pplout" }
      |  cutout { type = ParquetFileDataObject, path = "$dir/cutout" }
      |  dsirout{ type = ParquetFileDataObject, path = "$dir/dsirout" }
      |}
      |actions {
      |  nb {
      |    type = CustomDataFrameAction, inputIds = [corpus, tseed, bseed], outputIds = [nbout]
      |    dfsTransformers = [{ type = nbQuality, corpusInput = corpus,
      |      targetSeedInput = tseed, backgroundSeedInput = bseed,
      |      textColumn = text, targetTextColumn = stext, backgroundTextColumn = stext,
      |      keepOnlyPredicted = true, scoredOutput = nbout }]
      |  }
      |  ppl {
      |    type = CustomDataFrameAction, inputIds = [corpus, tseed], outputIds = [pplout]
      |    dfsTransformers = [{ type = perplexityBuckets, corpusInput = corpus,
      |      seedInput = tseed, idColumn = doc_id, textColumn = text,
      |      langColumn = lang, seedTextColumn = stext, scoredOutput = pplout }]
      |  }
      |  cut {
      |    type = CopyAction, inputId = pplout, outputId = cutout
      |    transformers = [{ type = pplCutoffAssign, langColumn = lang,
      |      cutoffs = { en = [1, 100000000000] } }]
      |  }
      |  dsir {
      |    type = CustomDataFrameAction, inputIds = [corpus, tseed], outputIds = [dsirout]
      |    dfsTransformers = [{ type = dsirResample, corpusInput = corpus,
      |      targetSeedInput = tseed, idColumn = doc_id, textColumn = text,
      |      targetTextColumn = stext, k = 2, selectedOutput = dsirout }]
      |  }
      |}""".stripMargin
    val reg = ConfigParser.parse(conf)
    implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, reg)
    new ActionDAGRun(reg.allActions).run()
    // NB gate keeps exactly the seed-like docs
    val kept = spark.read.parquet(s"$dir/nbout").select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L), s"NB gate kept $kept")
    // perplexity buckets: within 'en', the junk doc ranks strictly worse
    // (tail) than at least one good doc (head tercile of 3 en docs = 1 doc)
    val buckets = spark.read.parquet(s"$dir/pplout")
      .select("doc_id", "bucket").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(buckets(3L) == "tail", s"junk doc bucketed ${buckets(3L)}")
    assert(Set(buckets(1L), buckets(2L)).contains("head"))
    // cutoff assignment: en docs fall under middleMax -> middle; unknown
    // language 'xx' falls to tail (the conservative CCNet default)
    val cut = spark.read.parquet(s"$dir/cutout")
      .select("doc_id", "bucket").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cut(1L) == "middle" && cut(2L) == "middle" && cut(3L) == "middle", s"got $cut")
    assert(cut(4L) == "tail", s"unknown lang must fall to tail, got ${cut(4L)}")
    // DSIR top-2 selects the two target-like docs, ranked
    val dsir = spark.read.parquet(s"$dir/dsirout")
      .select("doc_id", "rank").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(dsir.keySet == Set(1L, 2L), s"DSIR selected ${dsir.keySet}")
    assert(dsir.values.toSet == Set(1, 2))
  }
}
