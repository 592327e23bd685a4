package graft

import graft.core._
import graft.operators._
import graft.operators.modes.SparkStreamingMode
import graft.sources._
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Housekeeping over the streaming action's batchId-keyed sinks: the
  * novel output and the signature store accumulate one `ingest_batch=N`
  * partition per micro-batch FOREVER — archive-compaction re-bins old
  * batch partitions into a coarse one without changing a single dedup
  * decision or store row, and retention can drop old NOVEL partitions
  * (downstream already consumed them) without touching the store.
  *
  * Constraint pinned here: only archive batches the checkpoint can no
  * longer replay. [[StreamingIncrementalDedupAction.processBatch]]
  * excludes the batch's OWN partition from the store view for replay
  * safety; a replayed batch whose rows were re-binned under another
  * partition value would see its own rows as store content. Streaming
  * batchIds are monotonic, so "older than the last committed batch" is
  * always safe — the spec archives batches 0..1 after batch 2 committed. */
class StreamingRetentionSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def img(rows: Seq[(Long, Long)]) =
    operators.Multimodal.withSynthImage(rows.toDF("media_id", "seed"), "seed", 16, 16)

  private def setup(dir: String): (StreamingIncrementalDedupAction, InstanceRegistry) = {
    val reg = new InstanceRegistry
    reg.register(ParquetFileDataObject("in", s"$dir/src"))
    reg.register(ParquetFileDataObject("novel", s"$dir/out", partitions = Seq("ingest_batch")))
    reg.register(ParquetFileDataObject("store", s"$dir/store", partitions = Seq("ingest_batch")))
    val action = StreamingIncrementalDedupAction("ingest",
      IncrementalMediaDedupTransformer("in", "store", "media_id",
        modality = "image", maxHamming = 0, novelOutput = Some("novel")),
      SparkStreamingMode(checkpointLocation = s"$dir/cp", triggerType = "AvailableNow"))
    (action, reg)
  }

  // batch 0: seeds 10/11 novel; batch 1: 10 re-posted + 99 novel;
  // batch 2: 11/99 re-posted + 77 novel
  private val batches = Seq(
    Seq((1L, 10L), (2L, 11L)),
    Seq((3L, 10L), (4L, 99L)),
    Seq((5L, 11L), (6L, 99L), (7L, 77L)))

  test("archive-compaction of old batch partitions preserves store contents and decisions") {
    val dirA = java.nio.file.Files.createTempDirectory("sret_a").toString
    val dirC = java.nio.file.Files.createTempDirectory("sret_c").toString
    val (actionA, regA) = setup(dirA)
    val (actionC, regC) = setup(dirC)
    batches.zipWithIndex.foreach { case (rows, i) =>
      actionA.processBatch(img(rows), i.toLong)(ActionPipelineContext(spark, regA))
      actionC.processBatch(img(rows), i.toLong)(ActionPipelineContext(spark, regC))
    }

    // archive batches OLDER than the last committed one (0 and 1) into
    // the coarse partition '0', and compact it to one file — on both the
    // store and the novel output of the 'a' instance
    implicit val ctxA: ActionPipelineContext = ActionPipelineContext(spark, regA)
    val archive = PartitionArchiveCompactionMode(
      archiveCondition = Some("ingest_batch < 2"),
      archiveExpression = Some("named_struct('ingest_batch', '0')"),
      compactCondition = Some("ingest_batch = 0"), compactNumFiles = 1)
    archive.exec(regA.dataObject("store").asInstanceOf[SparkFileDataObject])
    archive.exec(regA.dataObject("novel").asInstanceOf[SparkFileDataObject])

    // content preserved byte-for-byte modulo the partition re-bin: same
    // (id, fingerprint) store rows, same novel survivor rows
    def store(dir: String): Set[(Long, Long)] = spark.read.parquet(s"$dir/store")
      .select("id", "dhash64").as[(Long, Long)].collect().toSet
    def novel(dir: String): Set[Long] = spark.read.parquet(s"$dir/out")
      .select("media_id").as[Long].collect().toSet
    assert(store(dirA) == store(dirC), "archive must not change store contents")
    assert(novel(dirA) == novel(dirC) && novel(dirA) == Set(1L, 2L, 4L, 7L))
    // and it actually re-binned: batches 0/1 collapsed into partition 0
    val parts = regA.dataObject("store").asInstanceOf[SparkFileDataObject]
      .listPartitions.map(_.elements("ingest_batch")).toSet
    assert(parts == Set("0", "2"), s"got $parts")

    // batch 3 dedups identically on the archived and control layouts:
    // 8 re-posts seed 10 (archived partition!), 9 novel
    val b3 = img(Seq((8L, 10L), (9L, 55L)))
    actionA.processBatch(b3, 3L)(ActionPipelineContext(spark, regA))
    actionC.processBatch(b3, 3L)(ActionPipelineContext(spark, regC))
    assert(novel(dirA) == novel(dirC) && novel(dirA) == Set(1L, 2L, 4L, 7L, 9L),
      s"archived store must still dedup against re-binned fingerprints, got ${novel(dirA)}")
    assert(store(dirA) == store(dirC))
  }

  test("checkpoint clamp: over-aggressive housekeeping touches nothing the stream can replay") {
    // the machine-checked version of this suite's doc constraint ("only
    // archive batches older than the checkpoint's last committed one"):
    // the modes read the commit log themselves instead of trusting the
    // user's condition. Batches 0..2 ran; the checkpoint committed 0 and 1
    // (batch 2's writes landed but its commit didn't — the replay window).
    val dir = java.nio.file.Files.createTempDirectory("sret_clamp").toString
    val (action, reg) = setup(dir)
    implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, reg)
    batches.zipWithIndex.foreach { case (rows, i) => action.processBatch(img(rows), i.toLong) }
    val commits = new java.io.File(s"$dir/cp/commits")
    assert(commits.mkdirs())
    Seq("0", "1").foreach(b => assert(new java.io.File(commits, b).createNewFile()))

    // archive EVERYTHING, says the user — the clamp lets only batch 0
    // (strictly older than last-committed 1) re-bin; 1 and 2 stay put
    PartitionArchiveCompactionMode(
      archiveCondition = Some("true"),
      archiveExpression = Some("named_struct('ingest_batch', 'old')"),
      streamingCheckpoint = Some(s"$dir/cp"))
      .exec(reg.dataObject("store").asInstanceOf[SparkFileDataObject])
    val storeParts = reg.dataObject("store").asInstanceOf[SparkFileDataObject]
      .listPartitions.map(_.elements("ingest_batch")).toSet
    assert(storeParts == Set("old", "1", "2"), s"got $storeParts")

    // retain NOTHING, says the user — the clamp deletes only batch 0's
    // novel partition ('old' doesn't parse as a batchId → protected too)
    PartitionRetentionMode("false", streamingCheckpoint = Some(s"$dir/cp"))
      .exec(reg.dataObject("novel").asInstanceOf[SparkFileDataObject])
    assert(spark.read.parquet(s"$dir/out").select("media_id").as[Long].collect().toSet ==
      Set(4L, 7L), "only batch 0's novel partition may be retained away")

    // the protected layout keeps the replay lossless: batch 2 re-runs
    // (its partition was NOT re-binned, so the own-partition exclusion
    // still hides its first-poster rows) — novel row 7 survives
    action.processBatch(img(batches(2)), 2L)
    assert(spark.read.parquet(s"$dir/out").select("media_id").as[Long].collect().toSet ==
      Set(4L, 7L), "replay after clamped housekeeping must not lose first-poster rows")

    // negative control: WITHOUT the clamp the same archive re-bins batch
    // 2's NOVEL partition too, and the replay — whose dynamic overwrite
    // targets exactly `ingest_batch=2` — rewrites the partition next to
    // the archived copy: row 7 is now duplicated (and had the replay
    // produced a DIFFERENT novel set, e.g. after a partial store commit,
    // the archived copy would diverge from the rewritten one — the
    // replay contract is broken either way once a replayable partition
    // moves)
    val dirU = java.nio.file.Files.createTempDirectory("sret_unclamped").toString
    val (actionU, regU) = setup(dirU)
    val ctxU = ActionPipelineContext(spark, regU)
    batches.zipWithIndex.foreach { case (rows, i) => actionU.processBatch(img(rows), i.toLong)(ctxU) }
    PartitionArchiveCompactionMode(
      archiveCondition = Some("true"),
      archiveExpression = Some("named_struct('ingest_batch', 'old')"))
      .exec(regU.dataObject("novel").asInstanceOf[SparkFileDataObject])(ctxU)
    actionU.processBatch(img(batches(2)), 2L)(ctxU)
    assert(spark.read.parquet(s"$dirU/out").where(col("media_id") === 7L).count() == 2,
      "control: unclamped archive + replay duplicates the re-binned novel rows")

    // no commit log at all → everything replayable → housekeeping no-ops
    val dirN = java.nio.file.Files.createTempDirectory("sret_nocommits").toString
    val (actionN, regN) = setup(dirN)
    val ctxN = ActionPipelineContext(spark, regN)
    actionN.processBatch(img(batches(0)), 0L)(ctxN)
    PartitionRetentionMode("false", streamingCheckpoint = Some(s"$dirN/cp"))
      .exec(regN.dataObject("novel").asInstanceOf[SparkFileDataObject])(ctxN)
    assert(spark.read.parquet(s"$dirN/out").count() == 2,
      "without a commit log nothing may be deleted")
  }

  test("retention can drop consumed NOVEL partitions without touching the store") {
    val dir = java.nio.file.Files.createTempDirectory("sret_r").toString
    val (action, reg) = setup(dir)
    implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, reg)
    batches.zipWithIndex.foreach { case (rows, i) =>
      action.processBatch(img(rows), i.toLong)
    }
    val storeBefore = spark.read.parquet(s"$dir/store")
      .select("id", "dhash64").as[(Long, Long)].collect().toSet
    // downstream consumed batches < 2 → retention drops those output
    // partitions; the STORE keeps every signature (forgetting one would
    // re-admit its duplicates)
    PartitionRetentionMode("ingest_batch >= 2")
      .exec(reg.dataObject("novel").asInstanceOf[SparkFileDataObject])
    assert(spark.read.parquet(s"$dir/out").select("media_id").as[Long].collect().toSet ==
      Set(7L), "only batch 2's novel rows remain after retention")
    assert(spark.read.parquet(s"$dir/store")
      .select("id", "dhash64").as[(Long, Long)].collect().toSet == storeBefore)
    // dedup decisions unaffected: re-post of a seed whose NOVEL row was
    // retained away is still a duplicate (the store remembers)
    action.processBatch(img(Seq((8L, 10L), (9L, 55L))), 3L)
    val out = spark.read.parquet(s"$dir/out").select("media_id").as[Long].collect().toSet
    assert(out == Set(7L, 9L), s"got $out")
  }
}
