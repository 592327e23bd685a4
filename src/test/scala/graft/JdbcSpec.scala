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
