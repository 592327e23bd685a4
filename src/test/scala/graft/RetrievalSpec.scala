package graft

import graft.functions.{Dedup, Retrieval}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Repeated-span removal (ExactSubstr shape) + BM25 ranked retrieval. */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def spans(docs: Seq[(Long, String)], l: Int) =
    Dedup.removeRepeatedSpans(docs.toDF("id", "text"), "id", "text", l = l)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toMap

  test("cross-doc duplicated run ≥ l is removed from every occurrence; unique text survives") {
    val shared = "one two three four five six seven eight nine ten" // 10 tokens
    val out = spans(Seq(
      1L -> s"alpha beta $shared gamma delta",
      2L -> s"epsilon $shared zeta",
      3L -> "totally unrelated words with no duplication at all here"), l = 8)
    assert(out(1L)._4 == "alpha beta gamma delta")
    assert(out(2L)._4 == "epsilon zeta")
    assert(out(1L)._3 == 10 && out(2L)._3 == 10)
    assert(out(3L)._3 == 0 && out(3L)._4.startsWith("totally unrelated"))
  }

  test("duplicated runs shorter than l are kept (the cut-off contract)") {
    val short = "one two three four five" // 5 tokens < l=8
    val out = spans(Seq(
      1L -> s"alpha $short beta gamma delta epsilon zeta eta",
      2L -> s"theta $short iota kappa lambda mu nu xi"), l = 8)
    assert(out.values.forall(_._3 == 0))
  }

  test("within-doc repetition is removed too, overlapping spans merge") {
    val run = "a b c d e f g h" // 8 tokens, repeated twice inside one doc
    val out = spans(Seq(1L -> s"start $run middle $run finish"), l = 8)
    assert(out(1L)._4 == "start middle finish")
    assert(out(1L)._3 == 16)
  }

  test("docs shorter than l, and empty docs, pass through") {
    val out = spans(Seq(1L -> "tiny doc", 2L -> "", 3L -> "   "), l = 8)
    assert(out(1L) == ((2, 0, 0, "tiny doc")))
    assert(out(2L) == ((0, 0, 0, "")))
    assert(out(3L) == ((0, 0, 0, "")))
  }

  test("portable (md5) and production (rolling-hash kernel) fingerprints yield identical span sets") {
    // planted cross-doc + within-doc duplication, overlap merges, short
    // docs, empty docs — the full branch surface of the span remover. The
    // two modes hash differently but must agree on WHICH windows are
    // duplicated, hence on every output column.
    val shared = "one two three four five six seven eight nine ten"
    val run = "a b c d e f g h"
    val docs = Seq(
      1L -> s"alpha beta $shared gamma delta",
      2L -> s"epsilon $shared zeta",
      3L -> "totally unrelated words with no duplication at all here",
      4L -> s"start $run middle $run finish",
      5L -> "tiny doc",
      6L -> "",
      7L -> s"$shared",
      8L -> s"prefix $shared $shared suffix").toDF("id", "text")
    def runMode(portable: Boolean) =
      Dedup.removeRepeatedSpans(docs, "id", "text", l = 8, portableFingerprints = portable)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
        .toSet
    assert(runMode(portable = true) == runMode(portable = false))
  }

  test("lm perplexity nll is clamped at zero (collision artifacts carry no signal)") {
    import graft.functions.NgramLM
    // tiny bucket table forces pair-bucket collisions: C2(pair)+1 can
    // exceed C1(unigram)+m, which unclamped would go negative (and split
    // Spark `div` from DuckDB `//` on the integer mean)
    val seed = Seq((1L, "x y x y x y x y x y x y x y x y")).toDF("id", "text")
    val docs = Seq((10L, "x y"), (11L, "x y x y x y")).toDF("id", "text")
    val out = NgramLM.perplexity(docs, col("text"), seed, col("text"), numBuckets = 2)
      .collect().map(r => (r.getAs[Long]("nll_micro"), r.getAs[Long]("ppl_micro")))
    assert(out.forall { case (nll, ppl) => nll >= 0L && ppl >= 0L && ppl <= nll })
  }

  test("bm25: more distinct query-term hits outrank fewer; scores deterministic") {
    val docs = Seq(
      (1L, "spark shuffle join merge spark"),
      (2L, "spark only here with filler words padding length out"),
      (3L, "merge join shuffle spark all four terms present"),
      (4L, "nothing relevant whatsoever in this document")).toDF("doc_id", "text")
    val q = Seq((7, "spark shuffle join merge")).toDF("qid", "qtext")
    def run() = Retrieval.bm25TopK(docs, "doc_id", "text", q, "qid", "qtext", k = 4)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val a = run()
    assert(a.map(_._2).take(2).toSet == Set(1L, 3L)) // 4-term docs first
    assert(a.head._3 >= a.last._3)                   // hits non-increasing down the ranking
    assert(!a.map(_._2).contains(4L))                // no-hit doc absent
    assert(a.toSeq == run().toSeq)                   // bit-identical rerun
  }

  test("bm25: empty corpus returns empty, no NPE on the null stats row") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val q = Seq((1, "anything")).toDF("qid", "qtext")
    assert(Retrieval.bm25TopK(docs, "doc_id", "text", q, "qid", "qtext").count() == 0)
  }

  test("nb classifier: disjoint vocabularies separate; empty doc falls back to the prior") {
    import graft.functions.QualityClassifier
    val target = Seq((1L, "aa bb cc aa bb"), (2L, "bb cc aa")).toDF("id", "text")
    val bg = Seq((3L, "xx yy zz xx"), (4L, "yy zz")).toDF("id", "text")
    val docs = Seq((10L, "aa bb cc"), (11L, "xx yy zz"), (12L, "")).toDF("id", "text")
    def run() = QualityClassifier.scoreNB(docs, col("text"),
        target, col("text"), bg, col("text"), numBuckets = 64)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Int]("n_grams"), r.getAs[Long]("score_micro"), r.getAs[Boolean]("predicted"))).toMap
    val out = run()
    assert(out(10L)._3, s"target-vocab doc must classify target: ${out(10L)}")
    assert(!out(11L)._3, s"background-vocab doc must classify background: ${out(11L)}")
    // balanced seeds: prior = ln(3/3) = 0; empty doc scores exactly the prior
    assert(out(12L) == ((0, 0L, false)))
    assert(run() == out) // bit-identical rerun (integer evidence)
  }

  test("lm perplexity: seed-like text scores below unseen text; short docs are safe") {
    import graft.functions.NgramLM
    val seed = Seq((1L, "the cat sat on the mat"), (2L, "the dog sat on the rug"),
      (3L, "a cat and a dog sat")).toDF("id", "text")
    val docs = Seq(
      (10L, "the cat sat on the rug"),   // seed-like bigrams
      (11L, "zz qq ww ee rr tt"),        // unseen vocabulary
      (12L, "word"),                     // one token: zero bigrams
      (13L, "")).toDF("id", "text")      // empty
    def run() = NgramLM.perplexity(docs, col("text"), seed, col("text"), numBuckets = 512)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Int]("n_bigrams"), r.getAs[Long]("nll_micro"), r.getAs[Long]("ppl_micro"))).toMap
    val out = run()
    assert(out(10L)._3 < out(11L)._3,
      s"seed-like doc must have lower perplexity than unseen-vocab doc: $out")
    assert(out(12L) == ((0, 0L, 0L)) && out(13L) == ((0, 0L, 0L)),
      s"sub-bigram docs carry zero evidence: $out")
    assert(out(10L)._1 == 5 && out(11L)._1 == 5)
    assert(run() == out) // bit-identical rerun (integer evidence)
  }

  test("ccnet ppl buckets: per-language terciles; cutoff assignment matches the exact split") {
    import graft.functions.NgramLM
    val seed = Seq((1L, "the cat sat on the mat"), (2L, "the dog sat on the rug")).toDF("id", "text")
    // 6 docs per language with distinct perplexities → clean 2/2/2 terciles
    val docs = (10L to 15L).map(i =>
        (i, "en", "the cat sat " + ("zz qq " * (i - 9).toInt).trim)) ++
      (20L to 25L).map(i =>
        (i, "de", "the dog sat " + ("ww ee " * (i - 19).toInt).trim))
    val df = docs.toDF("id", "lang", "text")
    val out = NgramLM.pplBuckets(df, "id", col("text"), "lang", seed, col("text"), numBuckets = 512)
    val got = out.collect().map(r => r.getAs[Long]("id") ->
      (r.getAs[String]("lang"), r.getAs[Long]("ppl_micro"), r.getAs[String]("bucket"))).toMap
    Seq("en", "de").foreach { l =>
      val inLang = got.values.filter(_._1 == l).toSeq
      assert(inLang.count(_._3 == "head") == 2 && inLang.count(_._3 == "middle") == 2 &&
        inLang.count(_._3 == "tail") == 2, s"$l terciles: $inLang")
      // head holds the LOWEST perplexities (most seed-like)
      assert(inLang.filter(_._3 == "head").map(_._2).max <=
        inLang.filter(_._3 == "tail").map(_._2).min)
    }
    // zero-shuffle cutoff assignment reproduces the exact split when the
    // cutoffs are the exact tercile boundaries
    val cutoffs = Seq("en", "de").map { l =>
      val sorted = got.values.filter(_._1 == l).map(_._2).toSeq.sorted
      l -> (sorted(1), sorted(3))
    }.toMap
    val scored = NgramLM.perplexity(df, col("text"), seed, col("text"), numBuckets = 512)
    val byCut = NgramLM.assignByPplCutoffs(scored, "lang", cutoffs)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("bucket")).toMap
    got.foreach { case (id, (_, _, b)) => assert(byCut(id) == b, s"doc $id: $b vs ${byCut(id)}") }
    // unknown language falls to tail (the conservative CCNet default)
    val stranger = NgramLM.assignByPplCutoffs(
      NgramLM.perplexity(Seq((9L, "fr", "le chat")).toDF("id", "lang", "text"),
        col("text"), seed, col("text"), numBuckets = 512), "lang", cutoffs)
    assert(stranger.collect().head.getAs[String]("bucket") == "tail")
  }

  test("soft dedup weights: inverse multiplicity over normalized content") {
    val docs = Seq(
      (1L, "Hello, World!"), (2L, "hello   world"), (3L, "hello world"),
      (4L, "unique text here")).toDF("id", "text")
    val got = Dedup.duplicationWeights(docs, "id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == ((3L, 333333L)) && got(2L) == ((3L, 333333L)) && got(3L) == ((3L, 333333L)))
    assert(got(4L) == ((1L, 1000000L)))
    // weights of a duplicate group sum to ~1e6 (each unique content gets
    // equal total mass — the SoftDeDup contract, up to floor loss)
    assert(got.values.filter(_._1 == 3L).map(_._2).sum == 999999L)
  }

  test("span decontamination strips benchmark leaks; organic duplication is untouched") {
    val leak = "question one two three four five six seven answer"
    val organic = "repeat me repeat me repeat me repeat me please thanks"
    val bench = Seq((1L, leak)).toDF("bid", "btext")
    val docs = Seq(
      1L -> s"intro $leak outro",       // leaked verbatim → stripped
      2L -> s"alpha $organic beta",     // duplicated ACROSS docs but not in bench
      3L -> s"gamma $organic delta",    //   → must survive (not dedup's job here)
      4L -> "short doc").toDF("id", "text")
    for (portable <- Seq(true, false)) {
      val out = Dedup.removeContaminatedSpans(docs, "id", "text", bench, "btext",
          l = 8, portableFingerprints = portable)
        .collect().map(r => r.getLong(0) -> (r.getInt(3), r.getString(4))).toMap
      assert(out(1L) == ((9, "intro outro")), s"portable=$portable: ${out(1L)}")
      assert(out(2L)._1 == 0 && out(2L)._2.contains(organic))
      assert(out(3L)._1 == 0)
      assert(out(4L) == ((0, "short doc")))
    }
  }

  test("temperature mix: integer rates, partitioning-invariant, alpha lifts low-resource domains") {
    import graft.functions.Sampling
    val docs = (1L to 900L).map(i => (i, "big", 100L)) ++
      (1001L to 1100L).map(i => (i, "small", 100L))
    val df = docs.toDF("id", "domain", "toks")
    def ratesOf(d: org.apache.spark.sql.DataFrame, alpha: Double) =
      Sampling.temperatureMix(d, col("id"), col("domain"), col("toks"),
          budgetTokens = 50000L, alpha = alpha)
        .select("domain", "_mix_rate_e6").distinct()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val r1 = ratesOf(df, 1.0)
    val r5 = ratesOf(df, 0.5)
    // alpha=1: proportional — both domains get the same keep rate
    assert(r1("big") == r1("small"))
    // alpha=0.5: the small domain's share rises, the big one's falls
    assert(r5("small") > r1("small") && r5("big") < r1("big"))
    // the survivor SET is a pure function of the data — identical under
    // any partitioning (the frozen-mix contract)
    val a = Sampling.temperatureMix(df, col("id"), col("domain"), col("toks"), 50000L, 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.temperatureMix(df.repartition(7, col("toks")), col("id"), col("domain"),
        col("toks"), 50000L, 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
  }

  test("token chunking: stride windows cover the doc, last window reaches the end") {
    import graft.functions.Packing
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks
      (2L, "a b c"),                                   // shorter than maxLen
      (3L, "")).toDF("id", "text")                     // empty → no chunks
    val out = Packing.chunkTokens(docs, col("id"), col("text"), maxLen = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getAs[Int]("chunk_idx"),
        r.getAs[Int]("chunk_tokens"), r.getAs[String]("chunk_text")))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(_._4).toSeq == Seq("t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    assert(d1.forall(_._3 == 4))
    // consecutive chunks share exactly `overlap` tokens
    assert(d1(0)._4.split(" ").last == d1(1)._4.split(" ").head)
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0, 3, "a b c")))
    assert(!out.exists(_._1 == 3L))
  }

  test("incremental span removal: delta cleaned against the history store, corpus never re-read") {
    val passage = "pack my box with five dozen liquor jugs" // 8 tokens
    val hist = Seq((1L, s"history doc with $passage inside"),
      (2L, "other history content entirely unrelated")).toDF("id", "text")
    val store = Dedup.spanFingerprintStore(hist, "id", "text", l = 8)
    val delta = Seq(
      (10L, s"alpha $passage omega"),        // history dup → stripped
      (11L, "fresh delta words never seen anywhere before today"),
      (12L, "c d e f g h i j repeated"),     // within-delta dup (with 13)
      (13L, "x c d e f g h i j")).toDF("id", "text")
    val out = Dedup.removeRepeatedSpansIncremental(delta, "id", "text", store, l = 8)
      .collect().map(r => r.getLong(0) -> (r.getInt(3), r.getString(4))).toMap
    assert(out(10L) == ((8, "alpha omega")))
    assert(out(11L)._1 == 0)
    assert(out(12L)._1 == 8 && out(12L)._2 == "repeated")
    assert(out(13L)._1 == 8 && out(13L)._2 == "x")
    // store update for the next batch = groupBy-sum union, no text re-read
    val updated = store.unionByName(Dedup.spanFingerprintStore(delta, "id", "text", l = 8))
      .groupBy("h", "h2").agg(sum("c").as("c"))
    assert(updated.agg(sum("c")).head.getLong(0) ==
      store.agg(sum("c")).head.getLong(0) +
        Dedup.spanFingerprintStore(delta, "id", "text", l = 8).agg(sum("c")).head.getLong(0))
  }

  test("line dedup: corpus-wide boilerplate dropped, unique lines and blanks survive in place") {
    val docs = Seq(
      (1L, "Cookie banner here.\nreal content one\n\nCookie banner here."),
      (2L, "cookie banner here.\nreal content two"),  // normalized match (case)
      (3L, "totally unique document text")).toDF("id", "text")
    val out = Dedup.removeDuplicatedLines(docs, "id", "text")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    // the banner appears 3× corpus-wide (twice in doc 1, once in doc 2 —
    // case-insensitively) → every occurrence dropped; the EMPTY line in
    // doc 1 is structure, not content — kept
    assert(out(1L) == ((4, 2, "real content one\n")))
    assert(out(2L) == ((2, 1, "real content two")))
    assert(out(3L) == ((1, 0, "totally unique document text")))
    // maxOccurrences=3 tolerates the banner
    val lax = Dedup.removeDuplicatedLines(docs, "id", "text", maxOccurrences = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(lax.values.forall(_ == 0))
  }

  test("bm25: query terms absent from the corpus contribute nothing") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha delta")).toDF("doc_id", "text")
    val q = Seq((1, "alpha zzz_unseen")).toDF("qid", "qtext")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", q, "qid", "qtext", k = 5).collect()
    assert(out.length == 2 && out.forall(_.getLong(3) == 1L))
  }
}
