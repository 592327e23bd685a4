package graft

import graft.core._
import graft.operators._
import graft.sources._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Auto-caching of multi-consumer outputs (reference
  * `Environment.enableAutomaticDataFrameCaching` +
  * `DataFrameActionImpl.writeSubFeed:456-462`): a SubFeed carries the
  * producer's LINEAGE DataFrame, so without a persist each of N consumers
  * re-executes the producer's whole plan. The DAG persists such outputs
  * before the producer's write and unpersists after the last consumer. */
class DagCachingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  def tmpDir(): String = Files.createTempDirectory("graft-cache").toString

  /** build src -> mid -> {out1, out2} diamond; returns (registry, accumulator) */
  private def diamond(dir: String) = {
    val reg = new InstanceRegistry()
    val acc = spark.sparkContext.longAccumulator(s"srcEvals_$dir")
    reg.register(CustomDfDataObject("cache_src", { s =>
      import s.implicits._
      s.range(100).map { i => acc.add(1); i }.toDF("v")
    }))
    reg.register(ParquetFileDataObject("cache_mid", s"$dir/mid"))
    reg.register(ParquetFileDataObject("cache_out1", s"$dir/out1"))
    reg.register(ParquetFileDataObject("cache_out2", s"$dir/out2"))
    reg.register(CopyAction("mk_mid", "cache_src", "cache_mid"))
    reg.register(CopyAction("mk_out1", "cache_mid", "cache_out1"))
    reg.register(CopyAction("mk_out2", "cache_mid", "cache_out2"))
    (reg, acc)
  }

  test("multi-consumer output evaluated once with caching, once per consumer without") {
    val dir1 = tmpDir()
    val (reg1, acc1) = diamond(dir1)
    val ctx1: ActionPipelineContext = ActionPipelineContext(spark, reg1)
    val results = new ActionDAGRun(reg1.allActions, parallelism = 2).run()(ctx1)
    assert(acc1.value == 100L,
      s"with auto-caching the source plan must evaluate once (write populates the cache); saw ${acc1.value} row-evals")
    // cache must be dropped once both consumers completed
    val midDf = results("mk_mid").head.dataFrame.get
    assert(midDf.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "multi-consumer output still cached after the run")
    assert(spark.read.parquet(s"$dir1/out1").count() == 100)
    assert(spark.read.parquet(s"$dir1/out2").count() == 100)

    val (reg2, acc2) = diamond(tmpDir())
    val ctx2: ActionPipelineContext = ActionPipelineContext(spark, reg2)
    new ActionDAGRun(reg2.allActions, parallelism = 2,
      enableAutomaticDataFrameCaching = false).run()(ctx2)
    assert(acc2.value == 300L,
      s"without caching each consumer re-executes the producer plan; saw ${acc2.value} row-evals")
  }

  test("producer failing AFTER the persist (metricsFailCondition) still unpersists its frame") {
    val dir = tmpDir()
    val (reg, _) = diamond(dir)
    // the producer writes (persist happened before the write), then its
    // metrics gate fails — it never publishes a results entry, yet the
    // cached blocks must not outlive the run
    val failing = CopyAction("mk_mid", "cache_src", "cache_mid",
      metricsFailCondition = Some("key = 'records_written' and value = 100"))
    reg.register(failing) // replaces the plain producer (same id)
    val ctx: ActionPipelineContext = ActionPipelineContext(spark, reg)
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    intercept[IllegalStateException](new ActionDAGRun(reg.allActions, parallelism = 2).run()(ctx))
    val cachedAfter = spark.sparkContext.getPersistentRDDs.keySet
    assert(cachedAfter.subsetOf(cachedBefore),
      s"cached blocks leaked past the failed run: ${cachedAfter -- cachedBefore}")
  }

  test("single-consumer outputs are not persisted") {
    val dir = tmpDir()
    val reg = new InstanceRegistry()
    import spark.implicits._
    Seq(1, 2, 3).toDF("v").write.parquet(s"$dir/src")
    reg.register(ParquetFileDataObject("nc_src", s"$dir/src"))
    reg.register(ParquetFileDataObject("nc_mid", s"$dir/mid"))
    reg.register(ParquetFileDataObject("nc_out", s"$dir/out"))
    reg.register(CopyAction("nc_a", "nc_src", "nc_mid"))
    reg.register(CopyAction("nc_b", "nc_mid", "nc_out"))
    implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, reg)
    val results = new ActionDAGRun(reg.allActions).run()
    val midDf = results("nc_a").head.dataFrame.get
    assert(midDf.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "linear chain output must not be persisted")
    assert(spark.read.parquet(s"$dir/out").count() == 3)
  }
}
