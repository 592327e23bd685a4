package graft.core

import com.fasterxml.jackson.databind.ObjectMapper
import graft.operators.Action
import graft.sources.CanCreateIncrementalOutput
import org.apache.hadoop.fs.Path
import scala.jdk.CollectionConverters._

/** Per-run state: which actions finished, their metrics, and the
  * incremental state of each DataObject (offsets / watermarks / file
  * mod-times). Reference: `ActionDAGRunState` +
  * `HadoopFileActionDAGRunStateStore` (per-node checkpointing
  * `ActionDAGRun.scala:237-246`) and recovery `recoverRun`
  * (`app/SmartDataLakeBuilder.scala:377-396`).
  */
case class ActionState(state: String, recordsWritten: Long = -1,
                       /** streaming run totals absorbed from the action's
                         * continuously-written metrics snapshot — one
                         * artifact carries the whole run (reference folds
                         * streaming metrics into the same state,
                         * `sdl-core/.../metrics/SparkStreamingQueryListener
                         * .scala`) */
                       observedMetrics: Map[String, Long] = Map.empty)
case class RunState(
    appName: String, runId: Int, attemptId: Int,
    actionsState: Map[String, ActionState] = Map.empty,
    dataObjectStates: Map[String, String] = Map.empty,
    finished: Boolean = false,
    /** the run's partition scope (the CLI's --partition-values),
      * checkpointed so RECOVERY re-runs the crashed run's exact selection
      * — without it, an action downstream of an already-succeeded (and so
      * recovery-filtered) producer would fall back to reading ALL
      * partitions and e.g. re-append every historical partition (the
      * reference checkpoints partitionValues in ActionDAGRunState for the
      * same reason). Run-global, like the CLI flag. */
    initialPartitionValues: Seq[Map[String, String]] = Seq.empty)

/** JSON state files on any Hadoop FS:
  * `<statePath>/current/<app>.<runId>.<attemptId>.json` while running,
  * moved to `<statePath>/succeeded/` when the run completes. */
class RunStateStore(statePath: String, appName: String,
                    hadoopConf: org.apache.hadoop.conf.Configuration) {
  private val mapper = new ObjectMapper()
  private def fs = new Path(statePath).getFileSystem(hadoopConf)
  private def currentDir = new Path(statePath, "current")
  private def succeededDir = new Path(statePath, "succeeded")
  private def fileFor(dir: Path, runId: Int, attemptId: Int) =
    new Path(dir, s"$appName.$runId.$attemptId.json")

  def save(rs0: RunState): Unit = {
    val rs = absorbStreamingMetrics(rs0)
    val root = mapper.createObjectNode()
    root.put("appName", rs.appName); root.put("runId", rs.runId)
    root.put("attemptId", rs.attemptId); root.put("finished", rs.finished)
    val as = root.putObject("actionsState")
    rs.actionsState.foreach { case (id, st) =>
      val n = as.putObject(id); n.put("state", st.state); n.put("recordsWritten", st.recordsWritten)
      if (st.observedMetrics.nonEmpty) {
        val om = n.putObject("observedMetrics")
        st.observedMetrics.toSeq.sortBy(_._1).foreach { case (k, v) => om.put(k, v) }
      }
    }
    val ds = root.putObject("dataObjectStates")
    rs.dataObjectStates.foreach { case (id, st) => ds.put(id, st) }
    if (rs.initialPartitionValues.nonEmpty) {
      val arr = root.putArray("initialPartitionValues")
      rs.initialPartitionValues.foreach { m =>
        val o = arr.addObject(); m.foreach { case (k, v) => o.put(k, v) } }
    }
    val target = fileFor(if (rs.finished) succeededDir else currentDir, rs.runId, rs.attemptId)
    fs.mkdirs(target.getParent)
    // ATOMIC REPLACE: temp-file + atomic rename-over. save() runs on every
    // action completion — a crash mid-write must not leave a truncated
    // JSON, and a crash mid-REPLACE must not leave NO state file at all
    // (delete-then-rename has exactly that window: recovery would then
    // allocate a fresh runId and re-execute every action, duplicating
    // appends — the failure the store exists to prevent). Local FS gets
    // NIO ATOMIC_MOVE; HDFS gets FileContext's atomic Rename.OVERWRITE.
    val tmp = new Path(target.getParent,
      s"_tmp_${target.getName}.${java.util.UUID.randomUUID.toString.take(8)}")
    try {
      val out = fs.create(tmp, true)
      try out.write(mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
      finally out.close()
      if ("file".equalsIgnoreCase(fs.getUri.getScheme)) {
        val dir = java.nio.file.Paths.get(target.getParent.toUri.getPath)
        java.nio.file.Files.move(dir.resolve(tmp.getName), dir.resolve(target.getName),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      } else {
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(target.toUri, hadoopConf)
        fc.rename(tmp, target, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      }
    } catch { case e: Throwable => fs.delete(tmp, false); throw e }
    // a finished run clears ALL its attempts from current/ (earlier failed
    // attempts' files would otherwise read as unfinished forever) — EXACT
    // app+runId match, not a prefix (startsWith("etl.1.") would delete
    // sibling app "etl.1"'s live recovery state); plus this app's leftover
    // _tmp_ files from crashed writes (same-app runs are serialized, so
    // any tmp here is dead)
    if (rs.finished && fs.exists(currentDir)) {
      val own = (java.util.regex.Pattern.quote(appName) + s"\\.${rs.runId}\\.\\d+\\.json").r
      val stale = ("_tmp_" + java.util.regex.Pattern.quote(appName) + """\.\d+\.\d+\.json\..*""").r
      fs.listStatus(currentDir)
        .filter(s => own.matches(s.getPath.getName) || stale.matches(s.getPath.getName))
        .foreach(s => fs.delete(s.getPath, false))
    }
  }

  /** Fold each action's continuously-written streaming metrics snapshot
    * (`<statePath>/streaming/<actionId>.json`, refreshed by
    * [[graft.operators.StreamingMetricsSupport.persistStreamMetrics]] on
    * every progress event) into its ActionState, so the run-state artifact
    * the CLI reports carries the stream's run totals — previously the
    * snapshot lived ONLY in the sidecar and the main state file never
    * referenced it. Runs on every save: the final (finished) state absorbs
    * the totals as of run end; a torn or unparseable snapshot is skipped,
    * never fails a checkpoint.
    *
    * STALENESS: the snapshot is stamped with its writer's runId, and a
    * snapshot from ANOTHER run is skipped — the file is never cleaned up
    * (a ProcessingTime stream legitimately outlives its launching run and
    * keeps refreshing it), so a later run whose action did not refresh it
    * (skipped on no-data, or converted to a batch action under the same
    * id) must not inherit the previous run's totals. Unstamped snapshots
    * (pre-r19) absorb as before.
    *
    * FS traffic: ONE listStatus of the streaming dir per save instead of
    * an exists()+open() probe per action — on a large DAG with per-node
    * checkpointing the per-action round-trips were O(actions) per save. */
  private def absorbStreamingMetrics(rs: RunState): RunState = {
    if (rs.actionsState.isEmpty) return rs
    val dir = new Path(statePath, "streaming")
    val files: Map[String, Path] =
      try fs.listStatus(dir).filter(_.isFile).map(s => s.getPath.getName -> s.getPath).toMap
      catch { case _: java.io.FileNotFoundException => return rs }
    if (files.isEmpty) return rs
    rs.copy(actionsState = rs.actionsState.map { case (id, st) =>
      files.get(s"$id.json") match {
        case None => id -> st
        case Some(f) => try {
          val in = fs.open(f)
          val root = try mapper.readTree(in) finally in.close()
          val sameRun = Option(root.get("runId")).forall(_.asInt == rs.runId)
          val t = root.get("totals")
          if (!sameRun || t == null) id -> st
          else {
            // absorb EVERY totals field (the generic progress accumulator
            // and the dedup action publish different metric names)
            val b = Map.newBuilder[String, Long]
            t.properties().forEach(e =>
              if (e.getValue.isNumber) b += (e.getKey -> e.getValue.asLong()))
            val m = b.result()
            id -> st.copy(
              recordsWritten = m.get("novelRows").orElse(m.get("recordsWritten"))
                .getOrElse(st.recordsWritten),
              observedMetrics = st.observedMetrics ++ m)
          }
        } catch { case scala.util.control.NonFatal(_) => id -> st }
      }
    })
  }

  private def read(p: Path): RunState = {
    val in = fs.open(p)
    val root = try mapper.readTree(in) finally in.close()
    RunState(
      root.get("appName").asText, root.get("runId").asInt, root.get("attemptId").asInt,
      Option(root.get("actionsState")).map(_.properties().asScala.map { e =>
        e.getKey -> ActionState(e.getValue.get("state").asText,
          e.getValue.get("recordsWritten").asLong,
          Option(e.getValue.get("observedMetrics")).map(_.properties().asScala.map(kv =>
            kv.getKey -> kv.getValue.asLong()).toMap).getOrElse(Map.empty))
      }.toMap).getOrElse(Map.empty),
      Option(root.get("dataObjectStates")).map(_.properties().asScala.map(e =>
        e.getKey -> e.getValue.asText).toMap).getOrElse(Map.empty),
      root.get("finished").asBoolean,
      Option(root.get("initialPartitionValues")).map(_.elements().asScala.map(o =>
        o.properties().asScala.map(kv => kv.getKey -> kv.getValue.asText).toMap).toSeq)
        .getOrElse(Seq.empty))
  }

  private def listStates(dir: Path): Seq[RunState] = {
    // EXACT app-name match with a numeric runId.attemptId tail: a prefix
    // check would let app 'etl' pick up 'etl.daily's state files and
    // resume the wrong app's run
    val pat = (java.util.regex.Pattern.quote(appName) + """\.(\d+)\.(\d+)\.json""").r
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(s => pat.matches(s.getPath.getName))
      .map(s => read(s.getPath))
  }

  /** unfinished run to recover, if any (highest runId/attemptId in current/) */
  def unfinishedRun: Option[RunState] =
    listStates(currentDir).sortBy(s => (s.runId, s.attemptId)).lastOption

  def latestSucceeded: Option[RunState] =
    listStates(succeededDir).sortBy(s => (s.runId, s.attemptId)).lastOption

  /** next run coordinates: recover (same runId, attemptId+1) or new runId */
  def nextRun(): RunState = unfinishedRun match {
    case Some(prev) => prev.copy(attemptId = prev.attemptId + 1, finished = false)
    case None =>
      val runId = latestSucceeded.map(_.runId + 1).getOrElse(1)
      RunState(appName, runId, 1)
  }
}

/** Synchronous streaming: re-execute the whole DAG every trigger interval,
  * runId incrementing per iteration, caches cleared between runs — the
  * reference's `execActionDAG` loop (`app/SmartDataLakeBuilder.scala:
  * 566-623`). Actions with incremental execution modes process only the
  * new increment each iteration; a NoDataToProcessWarning iteration is a
  * cheap no-op. Stop via `maxIterations` or the `stopSignal` flag. */
object SyncStreamingRunner {
  def runLoop(actions: Seq[Action], triggerIntervalSec: Long,
              maxIterations: Int = Int.MaxValue,
              stopSignal: () => Boolean = () => false,
              parallelism: Int = 1,
              /** partition scope applied to EVERY iteration (the CLI's
                * --partition-values must not be silently dropped in
                * streaming mode) */
              initialSubFeeds: Seq[SubFeed] = Seq.empty)
             (implicit ctx: ActionPipelineContext): Int = {
    var iteration = 0
    while (iteration < maxIterations && !stopSignal()) {
      val iterCtx = ctx.copy(runId = ctx.runId + iteration)
      val dag = new ActionDAGRun(actions, parallelism)
      val t0 = System.currentTimeMillis()
      dag.run(initialSubFeeds)(iterCtx)
      ctx.spark.sqlContext.clearCache() // reference clears cache between runs
      iteration += 1
      if (iteration < maxIterations && !stopSignal()) {
        val elapsed = System.currentTimeMillis() - t0
        val sleepMs = triggerIntervalSec * 1000 - elapsed
        if (sleepMs > 0) Thread.sleep(sleepMs)
      }
    }
    iteration
  }
}

/** Stateful pipeline run: restores DataObject incremental state, skips
  * actions already succeeded in a recovered attempt, checkpoints per
  * action, and marks the run finished — the reference's
  * `SmartDataLakeBuilder.run/recoverRun` semantics on top of
  * [[ActionDAGRun]]. */
object StatefulRun {
  def run(actions: Seq[Action], store: RunStateStore, parallelism: Int = 1,
          initialSubFeeds: Seq[SubFeed] = Seq.empty)
         (implicit ctx: ActionPipelineContext): Map[String, Seq[SubFeed]] = {
    val rs1 = store.nextRun()
    // partition scope: a FRESH run checkpoints the caller's selection
    // (run-global, CLI semantics); a RECOVERY with no caller selection
    // restores the crashed run's scope — otherwise an already-succeeded
    // upstream is filtered from the DAG and its downstream falls back to
    // reading ALL partitions (re-appending every historical partition)
    val callerPvs = initialSubFeeds.flatMap(_.partitionValues.map(_.elements)).distinct
    val effectivePvs =
      if (callerPvs.nonEmpty || rs1.attemptId == 1) callerPvs
      else rs1.initialPartitionValues
    val rs0 = rs1.copy(initialPartitionValues = effectivePvs)
    // restored scope applies to every DAG-start input of the REMAINING
    // actions: after the succeeded ones are filtered out, their OUTPUTS
    // become start inputs of the recovery DAG — inputs the caller's
    // initialSubFeeds (built for the full DAG's start inputs, and always
    // non-empty from the CLI) never cover. Caller subfeeds are matched by
    // dataObjectId where they apply; every other start input gets the
    // run's partition scope synthesized, so a recovery keeps the crashed
    // run's exact selection instead of falling back to ALL partitions.
    def scopedSubFeeds(remaining: Seq[Action]): Seq[SubFeed] = {
      val produced = remaining.flatMap(_.outputIds).toSet
      val starts = remaining.flatMap(_.inputIds).distinct.filterNot(produced)
      val byId = initialSubFeeds.groupBy(_.dataObjectId)
      starts.flatMap { in =>
        byId.get(in) match {
          // a recovery re-run invoked WITHOUT --partition-values still has
          // caller subfeeds (empty-pv, one per original start input) — the
          // restored scope fills them, it never overrides an explicit one
          case Some(sfs) if effectivePvs.nonEmpty =>
            sfs.map(sf => if (sf.partitionValues.nonEmpty) sf
              else sf.copy(partitionValues = effectivePvs.map(PartitionValues(_))))
          case Some(sfs) => sfs
          case None if effectivePvs.nonEmpty =>
            Seq(SubFeed(in, partitionValues = effectivePvs.map(PartitionValues(_))))
          case None => Seq.empty
        }
      }
    }
    // restore incremental DataObject states (offsets/watermarks) from the
    // last state (recovered attempt or latest succeeded run)
    val baseState = if (rs0.attemptId > 1) Some(rs0) else store.latestSucceeded
    baseState.foreach(_.dataObjectStates.foreach { case (doId, st) =>
      try ctx.registry.dataObject(doId) match {
        case inc: CanCreateIncrementalOutput => inc.setState(Some(st))
        case _ => ()
      } catch { case _: NoSuchElementException => () }
    })
    val doneBefore = rs0.actionsState.filter(_._2.state == "SUCCEEDED")
    val remaining = actions.filterNot(a => doneBefore.contains(a.id))
    val runCtx = ctx.copy(runId = rs0.runId, attemptId = rs0.attemptId)
    @volatile var rs = rs0
    // actions complete concurrently (DAG pool threads): the read-modify-write
    // below must be atomic or completions overwrite each other's entries —
    // a lost SUCCEEDED entry re-executes its action on recovery (duplicate
    // writes for Append/merge sinks)
    val rsLock = new Object
    store.save(rs)
    def snapshotDoStates(): Map[String, String] =
      ctx.registry.allDataObjects.collect {
        case inc: CanCreateIncrementalOutput if inc.getState.isDefined =>
          inc.asInstanceOf[graft.sources.DataObject].id -> inc.getState.get
      }.toMap
    val dag = new ActionDAGRun(remaining, parallelism, onActionComplete = (id, feeds) => {
      // SUM across outputs (a multi-output action's checkpoint must agree
      // with the live console total); unknown (-1) metrics excluded
      val counts = feeds.flatMap(_.metrics.map(_.recordsWritten)).filter(_ >= 0)
      val written = if (counts.isEmpty) -1L else counts.sum
      val st = if (feeds.exists(_.isSkipped)) "SKIPPED" else "SUCCEEDED"
      rsLock.synchronized {
        rs = rs.copy(actionsState = rs.actionsState + (id -> ActionState(st, written)),
          dataObjectStates = rs.dataObjectStates ++ snapshotDoStates())
        store.save(rs)
      }
    })
    val result =
      try dag.run(scopedSubFeeds(remaining))(runCtx)
      catch {
        case e: Throwable =>
          store.save(rs) // leave the partial state in current/ for recovery
          throw e
      }
    store.save(rs.copy(finished = true, dataObjectStates = rs.dataObjectStates ++ snapshotDoStates()))
    result
  }
}
