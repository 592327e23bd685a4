package graft

import graft.core._
import graft.operators._
import graft.sources._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp

/** Reference-parity options of Historize/DeduplicateAction:
  * historizeBlacklist/Whitelist, filterClause, ignoreOldDeletedColumns,
  * mergeModeEnable + mergeModeAdditionalJoinPredicate
  * (reference `HistorizeAction.scala:89-306`, `DeduplicateAction.scala:71-229`). */
class HistorizeParitySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  val t1 = Timestamp.valueOf("2024-01-01 00:00:00")
  val t2 = Timestamp.valueOf("2024-01-02 00:00:00")
  val dd = Historization.doomsday
  def tick(t: Timestamp) = new Timestamp(t.getTime - 1)
  def newCtx(reg: InstanceRegistry) = ActionPipelineContext(spark, reg)
  def tmpDir() = Files.createTempDirectory("graft-hp").toString

  test("historizeBlacklist: change only in a blacklisted column opens no new version") {
    val dir = tmpDir()
    val reg = new InstanceRegistry()
    reg.register(ParquetFileDataObject("feed", s"$dir/feed"))
    reg.register(ParquetFileDataObject("hist", s"$dir/hist"))
    implicit val ctx: ActionPipelineContext = newCtx(reg)
    def action(ts: Timestamp) = HistorizeAction("h", "feed", "hist", Seq("id"),
      historizeBlacklist = Some(Seq("load_job")), referenceTimestamp = () => ts)

    Seq((1, "a", "job1"), (2, "b", "job1")).toDF("id", "name", "load_job")
      .write.parquet(s"$dir/feed")
    new ActionDAGRun(Seq(action(t1))).run()
    // load 2: id=1 changes ONLY the volatile column; id=2 changes name
    Seq((1, "a", "job2"), (2, "b2", "job2")).toDF("id", "name", "load_job")
      .write.mode("overwrite").parquet(s"$dir/feed")
    new ActionDAGRun(Seq(action(t2))).run()

    val got = spark.read.parquet(s"$dir/hist")
      .select("id", "name", "load_job", "dl_ts_captured", "dl_ts_delimited").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getTimestamp(3), r.getTimestamp(4))).toSet
    assert(got == Set(
      (1, "a", "job1", t1, dd),               // untouched: blacklisted change invisible
      (2, "b", "job1", t1, tick(t2)),
      (2, "b2", "job2", t2, dd)))
  }

  test("historizeWhitelist: only listed columns participate in change detection") {
    val cmp = Some(Seq("name"))
    val existing = Seq((1, "a", 10), (2, "b", 20)).toDF("id", "name", "score")
      .withColumn("dl_ts_captured", lit(t1)).withColumn("dl_ts_delimited", lit(dd))
    val feed = Seq((1, "a", 99), (2, "B", 20)).toDF("id", "name", "score")
    val got = Historization.fullHistorize(existing, feed, Seq("id"), t2, cmp)
      .select("id", "name", "score", "dl_ts_captured", "dl_ts_delimited").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2), r.getTimestamp(3), r.getTimestamp(4))).toSet
    assert(got == Set(
      (1, "a", 10, t1, dd),                   // score change ignored (not whitelisted)
      (2, "b", 20, t1, tick(t2)),
      (2, "B", 20, t2, dd)))
  }

  test("filterClause: out-of-clause history passes through and is NOT closed as deleted") {
    val dir = tmpDir()
    val reg = new InstanceRegistry()
    reg.register(ParquetFileDataObject("feed", s"$dir/feed"))
    reg.register(ParquetFileDataObject("hist", s"$dir/hist"))
    implicit val ctx: ActionPipelineContext = newCtx(reg)

    Seq((1, "a", "EU"), (2, "b", "US")).toDF("id", "name", "region")
      .write.parquet(s"$dir/feed")
    new ActionDAGRun(Seq(HistorizeAction("h", "feed", "hist", Seq("id"),
      referenceTimestamp = () => t1))).run()
    // load 2 carries ONLY the EU slice; without filterClause the missing
    // US key would be closed as deleted
    Seq((1, "a2", "EU")).toDF("id", "name", "region")
      .write.mode("overwrite").parquet(s"$dir/feed")
    new ActionDAGRun(Seq(HistorizeAction("h", "feed", "hist", Seq("id"),
      filterClause = Some("region = 'EU'"), referenceTimestamp = () => t2))).run()

    val got = spark.read.parquet(s"$dir/hist")
      .select("id", "name", "dl_ts_captured", "dl_ts_delimited").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getTimestamp(2), r.getTimestamp(3))).toSet
    assert(got == Set(
      (1, "a", t1, tick(t2)),
      (1, "a2", t2, dd),
      (2, "b", t1, dd)))                      // out-of-clause: untouched, still open
  }

  test("incrementalHistorizeOps emits only the rows a merge must write") {
    val current = Seq((1, "a"), (2, "b")).toDF("id", "name")
      .withColumn("dl_ts_captured", lit(t1)).withColumn("dl_ts_delimited", lit(dd))
    val feed = Seq((1, "a"), (2, "b2"), (3, "c")).toDF("id", "name")
    val ops = Historization.incrementalHistorizeOps(current, feed, Seq("id"), t2)
      .select("id", "name", "dl_ts_captured", "dl_ts_delimited", Historization.operationCol)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getTimestamp(2), r.getTimestamp(3), r.getString(4))).toSet
    assert(ops == Set(
      (2, "b", t1, tick(t2), "updateClose"),  // changed: close carries OLD captured
      (2, "b2", t2, dd, "insertNew"),
      (3, "c", t2, dd, "insertNew")))         // unchanged id=1 emits nothing
  }

  test("mergeModeEnable: historize upserts through a versioned-table MERGE, state equals full historize") {
    val dir = tmpDir()
    val reg = new InstanceRegistry()
    reg.register(ParquetFileDataObject("feed", s"$dir/feed"))
    reg.register(VersionedTableDataObject("hist", s"$dir/hist", primaryKey = Seq("id")))
    implicit val ctx: ActionPipelineContext = newCtx(reg)
    def action(ts: Timestamp) = HistorizeAction("h", "feed", "hist", Seq("id"),
      mergeModeEnable = true, referenceTimestamp = () => ts)

    Seq((1, "a"), (2, "b")).toDF("id", "name").write.parquet(s"$dir/feed")
    new ActionDAGRun(Seq(action(t1))).run()
    Seq((1, "a"), (2, "b2"), (3, "c")).toDF("id", "name")
      .write.mode("overwrite").parquet(s"$dir/feed")
    new ActionDAGRun(Seq(action(t2))).run()

    val vt = reg.dataObject("hist").asInstanceOf[VersionedTableDataObject]
    val got = vt.getDataFrame()
      .select("id", "name", "dl_ts_captured", "dl_ts_delimited").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getTimestamp(2), r.getTimestamp(3))).toSet
    assert(got == Set(
      (1, "a", t1, dd),                       // unchanged: no write at all
      (2, "b", t1, tick(t2)),
      (2, "b2", t2, dd),
      (3, "c", t2, dd)))
    // merge mode wrote ONLY the 3 op rows in load 2 (close + 2 inserts),
    // not the 4-row full state — the O(changes) contract
    assert(vt.latestVersion.contains(1))
  }

  test("CopyAction.deleteDataAfterRead: unpartitioned input is emptied after a successful copy") {
    val dir = tmpDir()
    val reg = new InstanceRegistry()
    reg.register(ParquetFileDataObject("src", s"$dir/src"))
    reg.register(ParquetFileDataObject("dst", s"$dir/dst"))
    implicit val ctx: ActionPipelineContext = newCtx(reg)
    Seq((1, "a"), (2, "b")).toDF("id", "v").write.parquet(s"$dir/src")
    new ActionDAGRun(Seq(CopyAction("c", "src", "dst", deleteDataAfterRead = true))).run()
    assert(spark.read.parquet(s"$dir/dst").count() == 2)
    assert(!reg.dataObject("src").asInstanceOf[ParquetFileDataObject].exists)
  }

  test("CopyAction.deleteDataAfterRead: partitioned run deletes only the copied partitions") {
    val dir = tmpDir()
    val reg = new InstanceRegistry()
    reg.register(ParquetFileDataObject("psrc", s"$dir/src", partitions = Seq("dt")))
    reg.register(ParquetFileDataObject("pdst", s"$dir/dst", partitions = Seq("dt")))
    implicit val ctx: ActionPipelineContext = newCtx(reg)
    Seq((1, "a", "d1"), (2, "b", "d2")).toDF("id", "v", "dt")
      .write.partitionBy("dt").parquet(s"$dir/src")
    new ActionDAGRun(Seq(CopyAction("c", "psrc", "pdst", deleteDataAfterRead = true,
      executionMode = Some(graft.operators.modes.FailIfNoPartitionValuesMode())))).run(
      Seq(SubFeed("psrc", partitionValues = Seq(PartitionValues("dt" -> "d1")))))
    assert(spark.read.parquet(s"$dir/dst").count() == 1)
    // only dt=d1 deleted; dt=d2 still readable at the source
    val left = spark.read.parquet(s"$dir/src").select("dt").as[String].collect().toSet
    assert(left == Set("d2"))
  }

  test("ignoreOldDeletedColumns: a column the feed dropped leaves the stored state") {
    val dir = tmpDir()
    val reg = new InstanceRegistry()
    reg.register(ParquetFileDataObject("feed", s"$dir/feed"))
    reg.register(ParquetFileDataObject("dedup", s"$dir/dedup"))
    implicit val ctx: ActionPipelineContext = newCtx(reg)

    Seq((1, "a", "x")).toDF("id", "name", "legacy").write.parquet(s"$dir/feed")
    new ActionDAGRun(Seq(DeduplicateAction("d", "feed", "dedup", Seq("id"),
      ignoreOldDeletedColumns = true, referenceTimestamp = () => t1))).run()
    Seq((1, "a"), (2, "b")).toDF("id", "name").write.mode("overwrite").parquet(s"$dir/feed")
    new ActionDAGRun(Seq(DeduplicateAction("d", "feed", "dedup", Seq("id"),
      ignoreOldDeletedColumns = true, referenceTimestamp = () => t2))).run()

    val out = spark.read.parquet(s"$dir/dedup")
    assert(out.columns.toSet == Set("id", "name", "dl_ts_captured"))
    assert(out.count() == 2)
  }

  test("filterClause: history rows where the clause evaluates to NULL are preserved") {
    val dir = tmpDir()
    val reg = new InstanceRegistry()
    reg.register(ParquetFileDataObject("feed", s"$dir/feed"))
    reg.register(ParquetFileDataObject("hist", s"$dir/hist"))
    implicit val ctx: ActionPipelineContext = newCtx(reg)

    // id=3 has region NULL: `region = 'EU'` evaluates to NULL for it —
    // it must land in the passthrough slice, not silently vanish
    Seq((1, "a", Some("EU")), (2, "b", Some("US")), (3, "c", Option.empty[String]))
      .toDF("id", "name", "region").write.parquet(s"$dir/feed")
    new ActionDAGRun(Seq(HistorizeAction("h", "feed", "hist", Seq("id"),
      referenceTimestamp = () => t1))).run()
    Seq((1, "a2", Some("EU"))).toDF("id", "name", "region")
      .write.mode("overwrite").parquet(s"$dir/feed")
    new ActionDAGRun(Seq(HistorizeAction("h", "feed", "hist", Seq("id"),
      filterClause = Some("region = 'EU'"), referenceTimestamp = () => t2))).run()

    val got = spark.read.parquet(s"$dir/hist")
      .select("id", "name", "dl_ts_captured", "dl_ts_delimited").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getTimestamp(2), r.getTimestamp(3))).toSet
    assert(got == Set(
      (1, "a", t1, tick(t2)),
      (1, "a2", t2, dd),
      (2, "b", t1, dd),
      (3, "c", t1, dd)))                      // NULL-clause row: untouched, still present
  }

  test("DeduplicateAction merge mode: duplicate keys in the feed collapse to one row before the merge") {
    val dir = tmpDir()
    val reg = new InstanceRegistry()
    reg.register(ParquetFileDataObject("feed", s"$dir/feed"))
    reg.register(VersionedTableDataObject("dedup", s"$dir/dedup", primaryKey = Seq("id")))
    implicit val ctx: ActionPipelineContext = newCtx(reg)
    def action(ts: Timestamp) = DeduplicateAction("d", "feed", "dedup", Seq("id"),
      mergeModeEnable = true, referenceTimestamp = () => ts)

    Seq((1, "a")).toDF("id", "name").write.parquet(s"$dir/feed")
    new ActionDAGRun(Seq(action(t1))).run()
    // feed carries id=2 TWICE — without the pk-collapse the merge would
    // write duplicate keys into the dedup table
    Seq((2, "b"), (2, "b"), (1, "a")).toDF("id", "name")
      .write.mode("overwrite").parquet(s"$dir/feed")
    new ActionDAGRun(Seq(action(t2))).run()

    val vt = reg.dataObject("dedup").asInstanceOf[VersionedTableDataObject]
    val ids = vt.getDataFrame().select("id").as[Int].collect().toSeq
    assert(ids.sorted == Seq(1, 2))           // exactly one row per key
  }
}
