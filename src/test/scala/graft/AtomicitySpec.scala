package graft

import graft.core._
import graft.sources._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Crash-window behavior of the staged-swap write paths: a failure at ANY
  * point between staging and commit must leave the previous state fully
  * readable (reference guards failed writes the same way,
  * `SparkFileDataObject.scala:537-542`; TickTock commit is a marker flip).
  */
class AtomicitySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  def tmpDir(): String = java.nio.file.Files.createTempDirectory("graft_atomic").toString

  test("hive staged swap: crash between rename-away and rename-in is recovered on next read") {
    implicit val ctx: ActionPipelineContext =
      ActionPipelineContext(spark, new InstanceRegistry())
    val t = HiveTableDataObject("t1", Table(None, "atomic_t1"))
    t.writeDataFrame(Seq((1, "v1"), (2, "v1")).toDF("id", "payload"))
    // simulate the worst crash window of writeDataFrameStaged: staging is
    // written, target has been renamed away, staging NOT yet renamed in
    Seq((1, "v2")).toDF("id", "payload")
      .write.mode("overwrite").saveAsTable("atomic_t1_graft_staging")
    spark.sql("ALTER TABLE atomic_t1 RENAME TO atomic_t1_graft_old")
    assert(!spark.catalog.tableExists("atomic_t1"))
    // next reader (isTableExisting / getDataFrame) must restore the backup
    assert(t.isTableExisting)
    val rows = t.getDataFrame().collect().map(_.getString(1)).toSeq
    assert(rows == Seq("v1", "v1"))
    spark.sql("DROP TABLE IF EXISTS atomic_t1_graft_staging")
    spark.sql("DROP TABLE IF EXISTS atomic_t1")
  }

  test("hive staged swap: completed swap leaves no backup and serves new state") {
    implicit val ctx: ActionPipelineContext =
      ActionPipelineContext(spark, new InstanceRegistry())
    val t = HiveTableDataObject("t2", Table(None, "atomic_t2"))
    t.writeDataFrame(Seq((1, "old")).toDF("id", "payload"))
    // staged overwrite whose plan READS the table being replaced
    t.writeDataFrameStaged(t.getDataFrame().withColumn("payload", lit("new")))
    assert(t.getDataFrame().collect().map(_.getString(1)).toSeq == Seq("new"))
    assert(!spark.catalog.tableExists("atomic_t2_graft_old"))
    assert(!spark.catalog.tableExists("atomic_t2_graft_staging"))
    spark.sql("DROP TABLE IF EXISTS atomic_t2")
  }

  test("file staged write: failure while writing staging leaves previous data intact") {
    implicit val ctx: ActionPipelineContext =
      ActionPipelineContext(spark, new InstanceRegistry())
    val dir = tmpDir()
    val d = ParquetFileDataObject("f1", s"$dir/data")
    d.writeDataFrame(Seq((1, "keep"), (2, "keep")).toDF("id", "payload"))
    // a plan that fails mid-write (raise_error on one row)
    val poison = d.getDataFrame()
      .withColumn("payload",
        when(col("id") === 2, raise_error(lit("boom"))).otherwise(col("payload")))
    intercept[Exception](d.writeDataFrameStaged(poison))
    // old state still served — the failed write only touched the staging dir
    val rows = d.getDataFrame().orderBy("id").collect().map(_.getString(1)).toSeq
    assert(rows == Seq("keep", "keep"))
  }

  test("partition-scoped hive merge: untouched partition files are byte-identical after merge") {
    implicit val ctx: ActionPipelineContext =
      ActionPipelineContext(spark, new InstanceRegistry())
    val t = HiveTableDataObject("t3", Table(None, "atomic_t3"), partitions = Seq("dt"))
    t.writeDataFrame(Seq(
      (1, "a", "2024-01-01"), (2, "b", "2024-01-01"),
      (3, "c", "2024-01-02"), (4, "d", "2024-01-02")).toDF("id", "payload", "dt"))
    // fingerprint the files of the partition the merge won't touch
    val loc = spark.sql("DESCRIBE TABLE EXTENDED atomic_t3").where(col("col_name") === "Location")
      .collect().head.getString(1).stripPrefix("file:")
    def files(p: String): Map[String, (Long, Long)] = {
      val d = new java.io.File(p)
      if (!d.exists) Map.empty
      else d.listFiles.filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> ((f.length, f.lastModified))).toMap
    }
    val before = files(s"$loc/dt=2024-01-01")
    assert(before.nonEmpty)
    // merge feed touches only dt=2024-01-02
    t.mergeDataFrame(
      Seq((3, "c2", "2024-01-02"), (5, "e", "2024-01-02")).toDF("id", "payload", "dt"),
      joinCols = Seq("id"))
    val after = files(s"$loc/dt=2024-01-01")
    assert(after == before, "untouched partition was rewritten")
    val got = t.getDataFrame().orderBy("id").collect()
      .map(r => (r.getAs[Int]("id"), r.getAs[String]("payload"))).toSeq
    assert(got == Seq((1, "a"), (2, "b"), (3, "c2"), (4, "d"), (5, "e")))
    spark.sql("DROP TABLE IF EXISTS atomic_t3")
  }

  test("jdbc staged write: historize-style self-referencing overwrite keeps history") {
    implicit val ctx: ActionPipelineContext =
      ActionPipelineContext(spark, new InstanceRegistry())
    val conn = JdbcConnection("c1", "jdbc:derby:memory:atomicdb;create=true",
      "org.apache.derby.jdbc.EmbeddedDriver")
    val t = JdbcTableDataObject("j1", Table(None, "atomic_j1"), conn)
    t.writeDataFrame(Seq((1, "2024-01-01")).toDF("id", "seen"), saveMode = Some(SdlSaveMode.Overwrite))
    // overwrite from a plan that reads the SAME table (union of old + new):
    // Spark's raw jdbc overwrite would drop the table before the plan runs
    // and the union would silently lose row 1
    val newState = t.getDataFrame().unionByName(Seq((2, "2024-01-02")).toDF("id", "seen"))
    t.writeDataFrameStaged(newState)
    val got = t.getDataFrame().orderBy("id").collect().map(_.getInt(0)).toSeq
    assert(got == Seq(1, 2))
  }
}
