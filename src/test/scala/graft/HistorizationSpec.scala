package graft

import graft.operators.Historization
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Golden-logic tests for SCD2 historization/dedup, scenarios from the
  * reference's `FullHistorizationTest` / `IncrementalHistorizationTest` /
  * `IncrementalCDCHistorizationTest` with the `(id, name, age, health_state)`
  * fixture (`HistorizationTestUtils.scala:50`, see FIXTURES.md §1). */
class HistorizationSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  val t1 = Timestamp.valueOf("2024-01-01 10:00:00")
  val t2 = Timestamp.valueOf("2024-01-02 10:00:00")
  val t3 = Timestamp.valueOf("2024-01-03 10:00:00")
  val dd = Historization.doomsday
  def tick(t: Timestamp) = new Timestamp(t.getTime - 1)

  def person(rows: (Int, String, Int, String)*): DataFrame =
    rows.toDF("id", "name", "age", "health_state")

  def snapshot(df: DataFrame): Set[(Int, String, Int, String, Timestamp, Timestamp)] =
    df.select("id", "name", "age", "health_state", "dl_ts_captured", "dl_ts_delimited")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2), r.getString(3),
        r.getTimestamp(4), r.getTimestamp(5))).toSet

  def initialLoad(feed: DataFrame, ts: Timestamp): DataFrame = {
    import org.apache.spark.sql.functions._
    feed.withColumn("dl_ts_captured", lit(ts)).withColumn("dl_ts_delimited", lit(dd))
  }

  test("full historize: initial load opens all records") {
    val h = initialLoad(person((1, "alice", 30, "good"), (2, "bob", 40, "bad")), t1)
    assert(snapshot(h) == Set(
      (1, "alice", 30, "good", t1, dd),
      (2, "bob", 40, "bad", t1, dd)))
  }

  test("full historize: unchanged record keeps original capture ts") {
    val existing = initialLoad(person((1, "alice", 30, "good")), t1)
    val result = Historization.fullHistorize(existing, person((1, "alice", 30, "good")), Seq("id"), t2)
    assert(snapshot(result) == Set((1, "alice", 30, "good", t1, dd)))
  }

  test("full historize: changed attribute closes old version and opens new") {
    val existing = initialLoad(person((1, "alice", 30, "good")), t1)
    val result = Historization.fullHistorize(existing, person((1, "alice", 31, "good")), Seq("id"), t2)
    assert(snapshot(result) == Set(
      (1, "alice", 30, "good", t1, tick(t2)),
      (1, "alice", 31, "good", t2, dd)))
  }

  test("full historize: record missing from snapshot is closed (delete)") {
    val existing = initialLoad(person((1, "alice", 30, "good"), (2, "bob", 40, "bad")), t1)
    val result = Historization.fullHistorize(existing, person((1, "alice", 30, "good")), Seq("id"), t2)
    assert(snapshot(result) == Set(
      (1, "alice", 30, "good", t1, dd),
      (2, "bob", 40, "bad", t1, tick(t2))))
  }

  test("full historize: re-appearing record gets a new open version") {
    val existing = initialLoad(person((1, "alice", 30, "good"), (2, "bob", 40, "bad")), t1)
    val afterDelete = Historization.fullHistorize(existing, person((1, "alice", 30, "good")), Seq("id"), t2)
    val reappeared = Historization.fullHistorize(afterDelete,
      person((1, "alice", 30, "good"), (2, "bob", 41, "bad")), Seq("id"), t3)
    assert(snapshot(reappeared) == Set(
      (1, "alice", 30, "good", t1, dd),
      (2, "bob", 40, "bad", t1, tick(t2)),
      (2, "bob", 41, "bad", t3, dd)))
  }

  test("full historize: closed history rows pass through untouched") {
    val existing = initialLoad(person((1, "alice", 30, "good")), t1)
    val v2 = Historization.fullHistorize(existing, person((1, "alice", 31, "good")), Seq("id"), t2)
    val v3 = Historization.fullHistorize(v2, person((1, "alice", 32, "good")), Seq("id"), t3)
    assert(snapshot(v3) == Set(
      (1, "alice", 30, "good", t1, tick(t2)),
      (1, "alice", 31, "good", t2, tick(t3)),
      (1, "alice", 32, "good", t3, dd)))
  }

  test("incremental historize: absent keys are NOT closed") {
    val existing = initialLoad(person((1, "alice", 30, "good"), (2, "bob", 40, "bad")), t1)
    val result = Historization.incrementalHistorize(existing, person((1, "alice", 31, "good")), Seq("id"), t2)
    assert(snapshot(result) == Set(
      (1, "alice", 30, "good", t1, tick(t2)),
      (1, "alice", 31, "good", t2, dd),
      (2, "bob", 40, "bad", t1, dd)))
  }

  test("cdc historize: versions delimited by next change; deletes close without insert") {
    val cdc = Seq(
      (1, "alice", 30, "good", t1, "i"),
      (1, "alice", 31, "good", t2, "u"),
      (2, "bob", 40, "bad", t1, "i"),
      (2, "bob", 40, "bad", t2, "d"),
      (3, "carol", 20, "good", t3, "i"))
      .toDF("id", "name", "age", "health_state", "ts", "op")
    val result = Historization.cdcHistorize(cdc, Seq("id"), "ts", "op").drop("ts")
    assert(snapshot(result) == Set(
      (1, "alice", 30, "good", t1, tick(t2)),
      (1, "alice", 31, "good", t2, dd),
      (2, "bob", 40, "bad", t1, tick(t2)),
      (3, "carol", 20, "good", t3, dd)))
  }

  test("deduplicate: newest record per key wins") {
    val existing = person((1, "alice", 30, "good"), (2, "bob", 40, "bad"))
      .withColumn("dl_ts_captured", org.apache.spark.sql.functions.lit(t1))
    val result = Historization.deduplicate(existing, person((1, "alice", 31, "good")), Seq("id"), t2)
    val got = result.select("id", "age", "dl_ts_captured").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getTimestamp(2))).toSet
    assert(got == Set((1, 31, t2), (2, 40, t1)))
  }

  test("cdc historize at scale: zero joins, one shuffle, correct under heavy key skew") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // 200k changes, 30% of them on ONE hot key (the pathological CDC shape:
    // a chatty entity), the rest over 20k keys. The algorithm must stay
    // join-free with a single pk shuffle — its cost scales with the changes,
    // never the table, and skew concentrates in one window partition
    // without affecting correctness.
    val n = 200000L
    val cdc = spark.range(n).select(
      when(col("id") % 10 < 3, lit(0L)).otherwise(col("id") % 20000L).as("k"),
      expr("timestampadd(SECOND, cast(id as int), timestamp'2024-01-01 00:00:00')").as("ts"),
      when(col("id") % 97 === 0, lit("d")).otherwise(lit("u")).as("op"),
      (col("id") * 7 % 1000).as("v"))
    val out = Historization.cdcHistorize(cdc, Seq("k"), "ts", "op")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"CDC historize must not join:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"expected exactly one pk shuffle:\n$plan")
    out.persist()
    try {
      // every non-delete change becomes exactly one version
      val deletes = n / 97 + 1 // ids 0, 97, 194, ...
      assert(out.count() == n - deletes)
      // versions of a key never overlap: each closes before the next opens
      val w = Window.partitionBy("k").orderBy("dl_ts_captured")
      val overlaps = out.withColumn("_nxt", lead(col("dl_ts_captured"), 1).over(w))
        .where(col("_nxt").isNotNull && col("dl_ts_delimited") >= col("_nxt")).count()
      assert(overlaps == 0, s"$overlaps overlapping validity intervals")
      // exactly one open record per key, iff the key's last op is not a delete
      val openKeys = out.where(col("dl_ts_delimited") === lit(dd))
        .groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(openKeys.values.forall(_ == 1), "key with multiple open records")
      val lastW = Window.partitionBy("k").orderBy(col("ts").desc)
      val expectedOpen = cdc.withColumn("_rn", row_number().over(lastW))
        .where(col("_rn") === 1 && col("op") =!= "d")
        .select("k").collect().map(_.getLong(0)).toSet
      assert(openKeys.keySet == expectedOpen,
        "open-record keys differ from keys whose latest change is not a delete")
    } finally out.unpersist()
  }

  test("deduplicate: unchanged values keep original captured ts when configured") {
    val existing = person((1, "alice", 30, "good"))
      .withColumn("dl_ts_captured", org.apache.spark.sql.functions.lit(t1))
    val result = Historization.deduplicate(existing, person((1, "alice", 30, "good")), Seq("id"), t2,
      keepCapturedTsWhenUnchanged = true)
    val got = result.select("id", "dl_ts_captured").collect().map(r => (r.getInt(0), r.getTimestamp(1))).toSet
    assert(got == Set((1, t1)))
  }

  test("full historize: NULL primary keys join null-safely and survive") {
    // pk joins use <=>, so a NULL key is a legitimate key value — the
    // existence test must not misread it as "side absent"
    val rows = Seq((Some(1), "alice", 30, "good"), (None, "nullkey", 50, "odd"))
      .toDF("id", "name", "age", "health_state")
    val h = initialLoad(rows, t1)
    // unchanged NULL-key row stays open; changed NULL-key row versions
    val feed = Seq((Some(1), "alice", 30, "good"), (Option.empty[Int], "nullkey", 51, "odd"))
      .toDF("id", "name", "age", "health_state")
    val out = Historization.fullHistorize(h, feed, Seq("id"), t2)
    val got = out.select("id", "age", "dl_ts_captured", "dl_ts_delimited")
      .collect().map(r => (Option(r.get(0)), r.getInt(1), r.getTimestamp(2), r.getTimestamp(3))).toSet
    assert(got == Set(
      (Some(1), 30, t1, dd),          // unchanged
      (None, 50, t1, tick(t2)),       // NULL key closed
      (None, 51, t2, dd)))            // NULL key re-inserted
  }

  test("incremental historize: NULL primary key row not in feed passes through") {
    val h = initialLoad(
      Seq((Option.empty[Int], "nullkey", 50, "odd")).toDF("id", "name", "age", "health_state"), t1)
    val feed = Seq((Some(2), "carol", 20, "good")).toDF("id", "name", "age", "health_state")
    val out = Historization.incrementalHistorize(h, feed, Seq("id"), t2)
    val got = out.select("id", "dl_ts_delimited").collect()
      .map(r => (Option(r.get(0)), r.getTimestamp(1))).toSet
    assert(got == Set((None, dd), (Some(2), dd)))
  }
}
