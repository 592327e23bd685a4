package graft

import graft.core._
import graft.sources._
import org.scalatest.funsuite.AnyFunSuite

/** Real JDBC round-trip against embedded Derby (ships with Spark), like the
  * reference's HSQLDB-backed JdbcTableDataObjectTest. */
class JdbcSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  implicit lazy val ctx: ActionPipelineContext =
    ActionPipelineContext(spark, new InstanceRegistry)

  def newDb(): JdbcConnection = {
    val dir = java.nio.file.Files.createTempDirectory("graft_derby")
    JdbcConnection("c1", s"jdbc:derby:${dir}/db;create=true", "org.apache.derby.jdbc.EmbeddedDriver")
  }

  test("jdbc write, read back, append") {
    import spark.implicits._
    val obj = JdbcTableDataObject("t1", Table(None, "people"), newDb())
    assert(!obj.isTableExisting)
    obj.writeDataFrame(Seq((1, "ann"), (2, "bob")).toDF("id", "name"),
      Seq.empty, Some(SdlSaveMode.Overwrite))
    assert(obj.isTableExisting)
    assert(obj.getDataFrame().count() == 2)
    obj.writeDataFrame(Seq((3, "cee")).toDF("id", "name"), Seq.empty, Some(SdlSaveMode.Append))
    assert(obj.getDataFrame().orderBy("id").collect().map(_.getInt(0)).toSeq == Seq(1, 2, 3))
  }

  test("jdbc merge: temp table + MERGE INTO updates and inserts") {
    import spark.implicits._
    val obj = JdbcTableDataObject("t2", Table(None, "accounts", Some(Seq("id"))), newDb())
    val m0 = obj.writeDataFrame(Seq((1, "ann", 100), (2, "bob", 200)).toDF("id", "name", "bal"),
      Seq.empty, Some(SdlSaveMode.Overwrite))
    assert(m0.recordsWritten == 2)                               // observed write count
    // merge: update id=2, insert id=3
    val m1 = obj.writeDataFrame(Seq((2, "bob", 250), (3, "cee", 50)).toDF("id", "name", "bal"),
      Seq.empty, Some(SdlSaveMode.Merge))
    assert(m1.recordsWritten == 2)                               // MERGE affected-row count
    val got = obj.getDataFrame().orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq
    assert(got == Seq((1, "ann", 100), (2, "bob", 250), (3, "cee", 50)))
  }

  test("jdbc merge honors delete/update conditions and updateColumns") {
    import spark.implicits._
    val obj = JdbcTableDataObject("t4", Table(None, "accts2", Some(Seq("id"))), newDb())
    obj.writeDataFrame(Seq((1, "ann", 100), (2, "bob", 200), (3, "cee", 300)).toDF("id", "name", "bal"),
      Seq.empty, Some(SdlSaveMode.Overwrite))
    obj.mergeDataFrame(
      Seq((1, "xxx", 999), (2, "bobby", 150), (3, "ceecee", 350), (4, "dan", 50)).toDF("id", "name", "bal"),
      Seq("id"),
      SaveModeMergeOptions(
        deleteCondition = Some("new.bal = 999"),
        updateCondition = Some("new.bal > existing.bal"),
        updateColumns = Seq("bal")))
    val got = obj.getDataFrame().orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq
    assert(got == Seq(
      (2, "bob", 200),    // update condition false (150 < 200) → untouched
      (3, "cee", 350),    // updated: bal only, name preserved (updateColumns)
      (4, "dan", 50)))    // inserted; id=1 deleted by deleteCondition
  }

  test("jdbc merge: updateExistingCondition fires as the second matched clause") {
    import spark.implicits._
    val obj = JdbcTableDataObject("t5", Table(None, "accts3", Some(Seq("id"))), newDb())
    obj.writeDataFrame(Seq((1, "a", 10, "-"), (2, "b", 20, "-")).toDF("id", "name", "bal", "op"),
      Seq.empty, Some(SdlSaveMode.Overwrite))
    obj.mergeDataFrame(
      Seq((1, "A1", 11, "upd"), (2, "B2", 22, "fix")).toDF("id", "name", "bal", "op"),
      Seq("id"),
      SaveModeMergeOptions(
        updateCondition = Some("new.op = 'upd'"),
        updateColumns = Seq("bal"),
        updateExistingCondition = Some("new.op = 'fix'")))
    val got = obj.getDataFrame().orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2), r.getString(3))).toSeq
    assert(got == Seq(
      (1, "a", 11, "-"),     // primary clause: bal only
      (2, "B2", 22, "fix"))) // second clause: ALL columns
  }

  test("jdbc merge: insert condition/ignore/override and additionalMergePredicate") {
    import spark.implicits._
    val obj = JdbcTableDataObject("t6", Table(None, "accts4", Some(Seq("id"))), newDb())
    obj.writeDataFrame(Seq((1, "ann", 100, "A")).toDF("id", "name", "bal", "status"),
      Seq.empty, Some(SdlSaveMode.Overwrite))
    obj.mergeDataFrame(
      Seq((1, "ann2", 150, "b"), (2, "eve", 50, "c")).toDF("id", "name", "bal", "status"),
      Seq("id"),
      SaveModeMergeOptions(
        additionalMergePredicate = Some("existing.status = new.status"),
        insertCondition = Some("new.bal > 120"),
        insertColumnsToIgnore = Seq("name"),
        insertValuesOverride = Map("status" -> "upper(new.status) || '!'")))
    val got = obj.getDataFrame().orderBy("bal").collect()
      .map(r => (r.getInt(0), Option(r.getString(1)), r.getInt(2), r.getString(3))).toSeq
    assert(got == Seq(
      (1, Some("ann"), 100, "A"),  // status mismatch → NOT matched, untouched
      (1, None, 150, "B!")))       // inserted: name ignored, status overridden; id=2 failed insertCondition
  }

  test("jdbc merge conditions: alias rewriting never touches string literals") {
    import spark.implicits._
    val obj = JdbcTableDataObject("t7", Table(None, "accts5", Some(Seq("id"))), newDb())
    obj.writeDataFrame(Seq((1, "new.order", 10), (2, "other", 20)).toDF("id", "tag", "bal"),
      Seq.empty, Some(SdlSaveMode.Overwrite))
    // the literal 'new.order' must survive verbatim — a naive alias
    // rewrite would turn it into s."order" and match the wrong rows
    obj.mergeDataFrame(Seq((1, "new.order", 11), (2, "other", 21)).toDF("id", "tag", "bal"),
      Seq("id"),
      SaveModeMergeOptions(updateCondition = Some("new.tag = 'new.order'")))
    val got = obj.getDataFrame().orderBy("id").collect()
      .map(r => (r.getInt(0), r.getInt(2))).toSeq
    assert(got == Seq((1, 11), (2, 20)))   // only the literal-matching row updated
  }

  test("HistorizeAction merge mode runs unchanged against a JDBC sink (SCD2 parity)") {
    import spark.implicits._
    import graft.operators._
    import java.sql.Timestamp
    val t1 = Timestamp.valueOf("2024-01-01 00:00:00")
    val t2 = Timestamp.valueOf("2024-02-01 00:00:00")
    val dd = Historization.doomsday
    def tick(t: Timestamp) = new Timestamp(t.getTime - 1)
    val dir = java.nio.file.Files.createTempDirectory("graft_jdbc_hist").toString
    val reg = new InstanceRegistry()
    reg.register(ParquetFileDataObject("feed", s"$dir/feed"))
    reg.register(JdbcTableDataObject("hist", Table(None, "history", Some(Seq("id"))), newDb()))
    implicit val ctx2: ActionPipelineContext = ActionPipelineContext(spark, reg)
    def action(ts: Timestamp) = HistorizeAction("h", "feed", "hist", Seq("id"),
      mergeModeEnable = true, referenceTimestamp = () => ts)

    Seq((1, "a"), (2, "b")).toDF("id", "name").write.parquet(s"$dir/feed")
    new ActionDAGRun(Seq(action(t1))).run()(ctx2)
    Seq((1, "a"), (2, "b2"), (3, "c")).toDF("id", "name")
      .write.mode("overwrite").parquet(s"$dir/feed")
    new ActionDAGRun(Seq(action(t2))).run()(ctx2)

    val got = reg.dataObject("hist").asInstanceOf[JdbcTableDataObject].getDataFrame()(ctx2)
      .select("id", "name", "dl_ts_captured", "dl_ts_delimited").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getTimestamp(2), r.getTimestamp(3))).toSet
    assert(got == Set(
      (1, "a", t1, dd),                       // unchanged: the captured-ts join predicate left it alone
      (2, "b", t1, tick(t2)),                 // closed by updateClose
      (2, "b2", t2, dd),                      // new version inserted
      (3, "c", t2, dd)))                      // new key inserted
  }

  test("pre/post sql hooks execute over the connection") {
    import spark.implicits._
    val conn = newDb()
    val obj = JdbcTableDataObject("t3", Table(None, "audited"), conn,
      postWriteSql = Some("INSERT INTO audit_log VALUES (1)"))
    // create audit table via a sibling object's prepare hook
    val prep = JdbcTableDataObject("t3p", Table(None, "prep"), conn,
      preReadSql = Some("CREATE TABLE audit_log (x INT)"))
    prep.prepare
    obj.writeDataFrame(Seq((1, "x")).toDF("id", "v"), Seq.empty, Some(SdlSaveMode.Overwrite))
    val audit = JdbcTableDataObject("t3a", Table(None, "audit_log"), conn)
    assert(audit.getDataFrame().count() == 1)
  }
}
