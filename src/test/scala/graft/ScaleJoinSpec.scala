package graft

import graft.core._
import graft.functions.Relational
import graft.sources._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage- and plan-level join scaling: bucketed co-located joins (no
  * shuffle at read time) and salted joins for skewed keys. */
class ScaleJoinSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  def newCtx(reg: InstanceRegistry = new InstanceRegistry()) =
    ActionPipelineContext(spark, reg)

  test("co-bucketed tables join without any exchange") {
    implicit val ctx: ActionPipelineContext = newCtx()
    val facts = (1L to 1000L).map(i => (i % 100, i, i * 2.0)).toDF("k", "id", "v")
    val dims = (0L until 100L).map(i => (i, s"dim$i")).toDF("k", "name")
    val factObj = HiveTableDataObject("facts_b", Table(None, "facts_bucketed"),
      bucketCols = Seq("k"), numBuckets = 8)
    val dimObj = HiveTableDataObject("dims_b", Table(None, "dims_bucketed"),
      bucketCols = Seq("k"), numBuckets = 8)
    factObj.writeDataFrame(facts)
    dimObj.writeDataFrame(dims)

    // disable auto-broadcast so the join would otherwise shuffle both sides
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = factObj.getDataFrame().join(dimObj.getDataFrame(), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-bucketed join still shuffles:\n$plan")
      assert(joined.count() == 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed aggregation on the bucket key needs no exchange") {
    implicit val ctx: ActionPipelineContext = newCtx()
    val obj = HiveTableDataObject("agg_b", Table(None, "agg_bucketed"),
      bucketCols = Seq("k"), numBuckets = 4)
    obj.writeDataFrame((1L to 500L).map(i => (i % 50, i)).toDF("k", "v"))
    val agg = obj.getDataFrame().groupBy("k").agg(sum("v").as("s"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed groupBy still shuffles:\n$plan")
    assert(agg.count() == 50)
  }

  test("saltedJoin equals the plain join and partitions on (key, salt)") {
    val big = (1L to 2000L).map(i => (if (i % 10 == 0) 1L else i % 500, i)).toDF("k", "id")
    val small = (0L until 500L).map(i => (i, s"n$i")).toDF("k", "name")
    val plain = big.join(small, "k").select("k", "id", "name")
    val salted = Relational.saltedJoin(big, small, Seq("k"), saltFactor = 4)
      .select("k", "id", "name")
    assert(plain.except(salted).isEmpty && salted.except(plain).isEmpty)
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), "join key not salted")
  }

  test("bucket layout declared via config surface (HOCON)") {
    val hocon =
      """dataObjects {
        |  tbl { type = hive, table = { name = cfg_bucketed }, bucketCols = [k], numBuckets = 4 }
        |}
        |actions {}
        |""".stripMargin
    val reg = ConfigParser.parse(hocon)
    val obj = reg.dataObject("tbl").asInstanceOf[HiveTableDataObject]
    assert(obj.bucketCols == Seq("k") && obj.numBuckets == 4)
  }
}
