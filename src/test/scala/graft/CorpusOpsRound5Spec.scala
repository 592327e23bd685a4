package graft

import graft.functions.{Sampling, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 corpus operators: split freeze, shard assignment, n-gram
  * hot spots, NFC normalization, HLL sketch union. */
class CorpusOpsRound5Spec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("splitLabel: deterministic, partitioning-independent, fractions roughly honored") {
    val docs = (0L until 2000L).toDF("id")
    val labeled = docs.select(col("id"),
      Sampling.splitLabel(col("id"), Seq("val" -> 0.05, "test" -> 0.05)).as("split"))
    val counts = labeled.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("train") > 1600 && counts("val") > 50 && counts("test") > 50)
    // repartitioning must not move any row between splits
    val relabeled = docs.repartition(17).select(col("id"),
      Sampling.splitLabel(col("id"), Seq("val" -> 0.05, "test" -> 0.05)).as("split"))
    assert(labeled.except(relabeled).isEmpty && relabeled.except(labeled).isEmpty)
  }

  test("shardAssignment: positions are a dense 0..n-1 sequence per shard") {
    val docs = (0L until 500L).toDF("id")
    val sharded = Sampling.shardAssignment(docs, col("id"), numShards = 4)
    assert(sharded.count() == 500)
    val bad = sharded.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
      .where(col("lo") =!= 0 || col("hi") =!= col("n") - 1)
    assert(bad.isEmpty)
    assert(sharded.select("shard").distinct().count() == 4)
  }

  test("ngramHotspots: planted boilerplate trigram dominates document frequency") {
    val banner = "subscribe to our newsletter"
    val docs = (0 until 50).map(i =>
      (i.toLong, s"unique words $i here padding tokens $banner closing line $i"))
      .toDF("doc_id", "text")
    val top = TextAnalysis.ngramHotspots(docs, "text", n = 3, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top.head._2 == 50)
    assert(top.map(_._1).contains("subscribe to our"))
  }

  test("nfcNormalize composes combining marks and is identity on ASCII") {
    val df = Seq(
      (1L, "plain ascii text"),
      (2L, "café au lait"),     // e + combining acute -> é
      (3L, "à la carte")        // a + combining grave -> à
    ).toDF("id", "t")
    val out = df.select(col("id"),
      TextAnalysis.nfcNormalize(col("t")).as("n"),
      length(col("t")).as("lr"), length(TextAnalysis.nfcNormalize(col("t"))).as("ln"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getInt(3))).toMap
    assert(out(1L)._1 == "plain ascii text" && out(1L)._2 == out(1L)._3)
    assert(out(2L)._1 == "café au lait" && out(2L)._3 == out(2L)._2 - 1)
    assert(out(3L)._1 == "à la carte" && out(3L)._3 == out(3L)._2 - 1)
  }

  test("split/shard/nfc transformers are declarable in HOCON and transform correctly") {
    import graft.core._
    import graft.operators._
    val hocon =
      """dataObjects { d { type = parquet, path = "/tmp/unused" } }
        |actions {
        |  a {
        |    type = copy, inputId = d, outputId = d
        |    transformers = [
        |      {type = trainSplit, keyColumn = id, valFraction = 0.1, testFraction = 0.1},
        |      {type = shardAssignment, keyColumn = id, numShards = 4},
        |      {type = nfcNormalize, textColumn = t}
        |    ]
        |  }
        |}""".stripMargin
    val reg = ConfigParser.parse(hocon)
    implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, reg)
    val chain = reg.action("a").asInstanceOf[CopyAction].transformers
    assert(chain.map(_.getClass.getSimpleName) == Seq(
      "TrainSplitTransformer", "ShardAssignmentTransformer", "NfcNormalizeTransformer"))
    val in = Seq((1L, "café"), (2L, "plain")).toDF("id", "t")
    val out = chain.foldLeft(in)((d, tr) => tr.asInstanceOf[DfTransformer].transform(d))
    assert(out.columns.toSet == Set("id", "t", "split", "shard", "pos"))
    assert(out.where(col("id") === 1L).select("t").head.getString(0) == "café")
  }

  test("stripHtml: tags dropped, entities unescaped in the right order, whitespace squashed") {
    val df = Seq(
      (1L, "<html><body><p>hello   <b>world</b></p></body></html>"),
      (2L, "a &amp;lt; b means a &lt; b &quot;quoted&quot; &#39;x&#39;"),
      (3L, "no markup at all")
    ).toDF("id", "h")
    val out = df.select(col("id"), TextAnalysis.stripHtml(col("h")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "hello world")
    // &amp;lt; must become the literal string "&lt;" (amp unescaped LAST),
    // while the real &lt; becomes "<"
    assert(out(2L) == "a &lt; b means a < b \"quoted\" 'x'")
    assert(out(3L) == "no markup at all")
  }

  test("near-dedup survivors: planted duplicates dropped, canonical + unrelated kept") {
    import graft.functions.Dedup
    val base = "the quick brown fox jumps over the lazy dog and runs far away " * 5
    val corpus = Seq(
      (1L, base), (2L, base + " tail words"),
      (3L, "completely different content about databases and query engines " * 5))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashDuplicatePairs(corpus, "doc_id", "text",
      shingleSize = 5, numHashes = 32, bands = 16, threshold = 0.5)
      .select("id_a", "id_b")
    val drop = Dedup.duplicateClusters(pairs)
      .where(col("id") =!= col("cluster_id")).select(col("id").as("doc_id"))
    val survivors = corpus.join(broadcast(drop), Seq("doc_id"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == Set(1L, 3L))
  }

  test("bpeMergeCandidates: repeated word's pairs dominate; single-char words ignored") {
    val docs = Seq(
      (1L, "aaab aaab aaab x"),
      (2L, "aaab zq")).toDF("doc_id", "text")
    val top = TextAnalysis.bpeMergeCandidates(docs, "text", topK = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // "aaab" occurs 4 times: pairs aa(×2 per word → 8), aa+ab; "x" contributes nothing
    assert(top.head == ("aa", 8L))
    assert(top.map(_._1).contains("ab"))
  }

  test("splitContamination: planted leak flagged, clean held-out doc is not") {
    import graft.functions.Decontamination
    val shared = "one two three four five six seven eight nine ten eleven twelve"
    val docs = Seq(
      (1L, s"$shared and some extra training material here", "train"),
      (2L, s"$shared with a different continuation", "val"),   // leaks the 8-gram prefix
      (3L, "completely unrelated held out text about oceans rivers mountains and valleys", "test"))
      .toDF("doc_id", "text", "split")
    val rep = Decontamination.splitContamination(docs, "doc_id", "text", "split", n = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(rep.keySet == Set(2L, 3L))
    assert(rep(2L)._2 && rep(2L)._1 > 0, "shared 8-gram run must flag doc 2")
    assert(!rep(3L)._2 && rep(3L)._1 == 0)
  }

  test("native vector kernels are bit-identical to the HOF formulation") {
    import graft.functions.Similarity
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)((
      Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val cmp = df.select(
      Similarity.cosineSimilarity(col("a"), col("b")).as("c_native"),
      Similarity.cosineSimilarityHof(col("a"), col("b")).as("c_hof"),
      Similarity.dotProduct(col("a"), col("b")).as("d_native"),
      Similarity.dotProductHof(col("a"), col("b")).as("d_hof"),
      Similarity.euclideanDistance(col("a"), col("b")).as("e_native"),
      Similarity.euclideanDistanceHof(col("a"), col("b")).as("e_hof")).collect()
    cmp.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), "cosine differs")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)), "dot differs")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(4)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(5)), "euclidean differs")
    }
    // mixed float-array × double-literal-array side (the query-vector case)
    val q = Array.fill(64)(rnd.nextDouble() * 2 - 1)
    val qLit = array(q.map(lit).toIndexedSeq: _*)
    val mixed = df.select(
      Similarity.cosineSimilarity(col("a"), qLit).as("n"),
      Similarity.cosineSimilarityHof(col("a"), qLit).as("h")).collect()
    mixed.foreach(r => assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
      java.lang.Double.doubleToLongBits(r.getDouble(1)), "mixed cosine differs"))
  }

  test("hll union across groups lands within the error envelope of exact") {
    val toks = (0L until 10000L).map(i => (s"g${i % 3}", s"s${i % 5}", s"tok${i % 700}"))
      .toDF("g", "src", "tok")
    val est = toks.groupBy("g", "src").agg(hll_sketch_agg(col("tok"), lit(12)).as("sk"))
      .groupBy("g").agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val exact = toks.groupBy("g").agg(countDistinct(col("tok")).as("n_exact"))
    val rows = exact.join(est, Seq("g")).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (n, e) = (r.getLong(1), r.getLong(2).toDouble)
      assert(math.abs(e - n) <= math.max(n * 0.05, 8.0), s"group ${r.getString(0)}: est $e vs exact $n")
    }
  }
}
