package graft

import graft.functions.{Packing, Sampling, TemporalJoins, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** As-of / range joins, sessionization, deterministic sampling, repetition
  * and PII text signals. */
class TemporalJoinsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOfJoin: latest right at-or-before each left row, per key") {
    val left = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")),
      (1L, 101L, ts("2024-01-01 12:00:00")),
      (2L, 200L, ts("2024-01-01 09:00:00")))
      .toDF("k", "lid", "lts")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 1.0),
      (1L, ts("2024-01-01 11:00:00"), 2.0),
      (2L, ts("2024-01-01 09:30:00"), 9.0)) // after 2's only left row
      .toDF("k", "rts", "v")
    val out = TemporalJoins.asOfJoin(left, right, Seq("k"), "lts", "rts", Seq("v"))
      .select("lid", "v_asof").collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(out == Map(100L -> Some(1.0), 101L -> Some(2.0), 200L -> None))
  }

  test("asOfJoin tie semantics: equal timestamps match unless strict") {
    val left = Seq((1L, 100L, ts("2024-01-01 10:00:00"))).toDF("k", "lid", "lts")
    val right = Seq((1L, ts("2024-01-01 10:00:00"), 7.0)).toDF("k", "rts", "v")
    val loose = TemporalJoins.asOfJoin(left, right, Seq("k"), "lts", "rts", Seq("v"))
      .select("v_asof").collect().head
    assert(loose.getDouble(0) == 7.0)
    val strict = TemporalJoins.asOfJoin(left, right, Seq("k"), "lts", "rts", Seq("v"), strict = true)
      .select("v_asof").collect().head
    assert(strict.isNullAt(0))
  }

  test("asOfJoin plan is a single window, not a join") {
    val left = Seq((1L, 1L, ts("2024-01-01 00:00:00"))).toDF("k", "lid", "lts")
    val right = Seq((1L, ts("2024-01-01 00:00:00"), 1.0)).toDF("k", "rts", "v")
    val plan = TemporalJoins.asOfJoin(left, right, Seq("k"), "lts", "rts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"))
    assert(!plan.toLowerCase.contains("join"), s"unexpected join in plan:\n$plan")
  }

  test("rangeJoin: matches across bucket boundaries, bounds inclusive") {
    val points = Seq((1L, 0.5), (2L, 3.0), (3L, 5.0), (4L, 9.99), (5L, 20.0))
      .toDF("pid", "x")
    // [0,5] spans buckets 0..1 at width 3; [9.99,12] starts mid-bucket
    val intervals = Seq((10L, 0.0, 5.0), (20L, 9.99, 12.0)).toDF("iid", "lo", "hi")
    val got = TemporalJoins.rangeJoin(points, "x", intervals, "lo", "hi", bucketWidth = 3.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L)))
  }

  test("sessionize: gap splits sessions; ids are per-key cumulative") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:10:00")),  // same session (gap 10m < 30m)
      (1L, ts("2024-01-01 11:00:00")),  // new session (50m gap)
      (2L, ts("2024-01-01 10:00:00")))
      .toDF("k", "t")
    val got = TemporalJoins.sessionize(df, Seq("k"), "t", maxGapSeconds = 1800)
      .select("k", "t", "session_id").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2))).toSet
    assert(got == Set(
      (1L, "2024-01-01 10:00:00.0", 1L), (1L, "2024-01-01 10:10:00.0", 1L),
      (1L, "2024-01-01 11:00:00.0", 2L), (2L, "2024-01-01 10:00:00.0", 1L)))
  }

  test("deterministic sampling is stable under repartitioning and matches the hash rule") {
    val df = spark.range(0, 1000).toDF("id")
    val a = Sampling.sampleByKey(df, col("id"), 0.3).select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.sampleByKey(df.repartition(17), col("id"), 0.3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)                       // partitioning-independent
    assert(a.size > 200 && a.size < 400) // ≈ 30%
    val strat = Sampling.stratifiedSample(df, col("id"), (col("id") % 2).cast("string"),
      Map("0" -> 1.0), defaultRate = 0.0).select("id").collect().map(_.getLong(0)).toSet
    assert(strat == (0L until 1000L by 2).toSet) // rate 1 keeps all, default 0 drops all
  }

  test("capPerStratum keeps at most n rows per stratum, stably") {
    val df = spark.range(0, 100).toDF("id").withColumn("s", col("id") % 4)
    val a = Sampling.capPerStratum(df, col("id"), col("s"), 5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a.size == 20)
    val b = Sampling.capPerStratum(df.repartition(13), col("id"), col("s"), 5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("tokenBudgetMix: over-budget strata downsampled to rate, under-budget kept whole") {
    val df = spark.range(0, 2000).toDF("id")
      .withColumn("d", (col("id") % 2).cast("string"))
      .withColumn("n", lit(10L)) // each domain holds 10k tokens
    val out = Sampling.tokenBudgetMix(df, col("id"), col("d"), col("n"),
      Map("0" -> 100000L, "1" -> 2500L)) // 0 uncapped, 1 → rate 0.25
    val byDomain = out.groupBy("d").agg(count(lit(1)).as("n"), min("_mix_rate").as("r"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(byDomain("0") == ((1000L, 1.0)))          // under budget: all kept
    val (kept1, rate1) = byDomain("1")
    assert(rate1 == 0.25)
    assert(kept1 > 150 && kept1 < 350)               // ≈ 25% of 1000
    // reproducible across partitionings (the freeze property)
    val again = Sampling.tokenBudgetMix(df.repartition(13), col("id"), col("d"), col("n"),
      Map("0" -> 100000L, "1" -> 2500L)).select("id").collect().map(_.getLong(0)).toSet
    assert(again == out.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("packSequences: offsets are exact shard-local cumsums; pack ids cut at seqLen") {
    val df = Seq((1L, 0L, 300L), (2L, 0L, 300L), (3L, 0L, 300L), (4L, 1L, 700L))
      .toDF("id", "shard", "n")
    val got = Packing.packSequences(df, col("id"), col("shard"), col("n"), seqLen = 512)
      .select("id", "start_offset", "pack_id", "pack_offset")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((0L, 0L, 0L)))
    assert(got(2L) == ((300L, 0L, 300L)))   // starts in pack 0, straddles into 1
    assert(got(3L) == ((600L, 1L, 88L)))
    assert(got(4L) == ((0L, 0L, 0L)))       // shard 1 is an independent stream
    // stability under repartitioning (window orders by id within shard)
    val again = Packing.packSequences(df.repartition(7), col("id"), col("shard"), col("n"), 512)
      .select("id", "start_offset").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == got.map { case (k, (s, _, _)) => k -> s })
  }

  test("packSequences: row→offset ASSIGNMENT is content-stable for duplicate (id, tokenCount)") {
    // two rows share (id, n) but differ in payload: the whole-row hash
    // tie-break must pin WHICH content lands at WHICH offset across
    // partitionings — the offset SET alone isn't the frozen-corpus
    // contract, the bytes at each offset are
    val df = Seq((1L, 0L, 100L, "payload-A"), (1L, 0L, 100L, "payload-B"), (2L, 0L, 50L, "c"))
      .toDF("id", "shard", "n", "text")
    def assign(d: org.apache.spark.sql.DataFrame): Map[String, Long] =
      Packing.packSequences(d, col("id"), col("shard"), col("n"), seqLen = 512)
        .select("text", "start_offset").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = assign(df)
    assert(a.values.toSet == Set(0L, 100L, 200L))
    (1 to 3).foreach(i => assert(assign(df.repartition(i * 3 + 2)) == a,
      s"row→offset assignment drifted under repartition($i)"))
  }

  test("repetition fractions: exact on crafted strings, 0 on short text") {
    val df = Seq(
      (1L, "a a a b"),        // words: 4 total, 2 distinct → 0.5; bigrams: "a a","a a","a b" → 1/3 dup
      (2L, "x"),              // single token: no bigrams → 0.0
      (3L, "u v w"))          // all distinct → 0.0
      .toDF("id", "t")
    val got = df.select(col("id"),
      TextAnalysis.duplicateNgramFraction(col("t"), 1).as("w"),
      TextAnalysis.duplicateNgramFraction(col("t"), 2).as("b"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val (w1, b1) = got(1L)
    assert(w1 == 0.5 && math.abs(b1 - 1.0 / 3.0) < 1e-15)
    assert(got(2L) == ((0.0, 0.0)) && got(3L) == ((0.0, 0.0)))
  }

  test("PII redaction replaces emails/phones/IPs and counts match") {
    val df = Seq((1L, "mail me at jo.doe+x@test.org or call +41 555 0199, host 10.0.0.1 ok"))
      .toDF("id", "t")
    val r = df.select(
      TextAnalysis.countPattern(col("t"), TextAnalysis.emailPattern).as("e"),
      TextAnalysis.countPattern(col("t"), TextAnalysis.phonePattern).as("p"),
      TextAnalysis.redactPII(col("t")).as("red")).collect().head
    assert(r.getInt(0) == 1 && r.getInt(1) == 1)
    val red = r.getString(2)
    assert(red.contains("<EMAIL>") && red.contains("<PHONE>") && red.contains("<IP>"))
    assert(!red.contains("jo.doe") && !red.contains("555 0199") && !red.contains("10.0.0.1"))
  }
}
