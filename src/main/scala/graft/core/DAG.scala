package graft.core

import graft.operators.Action
import graft.operators.modes.NoDataToProcessWarning
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Topologically-ordered pipeline DAG with three-phase execution
  * (prepare → init → exec). Nodes are actions; edges derived from shared
  * DataObject ids (producer's output = consumer's input). Reference:
  * `sdl-core/workflow/ActionDAGRun.scala:318-355` (DAG build),
  * `util/dag/DAG.scala:67-141` (topo sort + task graph), monix replaced by
  * a plain fixed thread pool — Spark jobs from independent branches overlap
  * and keep a big cluster busy (pair with `spark.scheduler.mode=FAIR`).
  */
class ActionDAGRun(actions: Seq[Action], parallelism: Int = 1,
                   /** exec-phase checkpoint hook (run-state store) — called
                     * after each action completes with its output SubFeeds */
                   onActionComplete: (String, Seq[SubFeed]) => Unit = (_, _) => (),
                   /** persist produced DataFrames consumed by >=2 actions
                     * for the duration of their consumers (reference
                     * `Environment.enableAutomaticDataFrameCaching`) */
                   enableAutomaticDataFrameCaching: Boolean = true) {

  // producer map: dataObjectId -> action producing it
  private val producers: Map[String, Action] =
    actions.flatMap(a => a.outputIds.map(_ -> a)).toMap

  // produced dataObjectIds consumed by >=2 actions: without a persist,
  // every consumer re-executes the producer's whole plan (the SubFeed
  // carries the lineage DataFrame, not materialized data). writeOutput
  // persists these before the producer's own write; the consumer counters
  // below drive the unpersist once the last consumer settles.
  private val reuseCounts: Map[String, Int] = {
    val consumed = actions.flatMap(_.inputIds.distinct)
      .groupBy(identity).view.mapValues(_.size).toMap
    consumed.filter { case (doId, n) => n >= 2 && producers.contains(doId) }
  }

  // A FileIncrementalMoveMode action consumes (moves/deletes) its input in
  // postExec — another action reading the same DataObject would race the
  // move and see a partial or empty source. Reject at build time.
  actions.foreach { a =>
    a.executionMode match {
      case Some(_: graft.operators.modes.FileIncrementalMoveMode) =>
        val moved = a.inputIds.head
        val others = actions.filter(o => o.id != a.id && o.inputIds.contains(moved))
        require(others.isEmpty,
          s"Action ${a.id}: FileIncrementalMoveMode consumes input '$moved', but " +
            s"${others.map(_.id).mkString(", ")} also read(s) it — the move would race their reads")
      case _ => ()
    }
  }

  /** edges: predecessor action -> successor action */
  private val edges: Map[String, Seq[String]] = {
    val e = for {
      consumer <- actions
      inId <- consumer.inputIds
      producer <- producers.get(inId)
    } yield producer.id -> consumer.id
    e.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
  }
  private val indegree0: Map[String, Int] = {
    val inc = edges.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    actions.map(a => a.id -> inc.getOrElse(a.id, 0)).toMap
  }

  /** Kahn topological sort into parallel layers; fails on cycles. */
  val layers: Seq[Seq[Action]] = {
    val byId = actions.map(a => a.id -> a).toMap
    var indeg = indegree0
    var remaining = actions.map(_.id).toSet
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Action]]
    while (remaining.nonEmpty) {
      val ready = remaining.filter(indeg(_) == 0).toSeq.sorted
      if (ready.isEmpty) throw new IllegalArgumentException(
        s"Pipeline DAG has a cycle among: ${remaining.mkString(", ")}")
      out += ready.map(byId)
      remaining --= ready
      ready.foreach(r => edges.getOrElse(r, Nil).foreach(s => indeg = indeg.updated(s, indeg(s) - 1)))
    }
    out.toSeq
  }

  def prepare(implicit ctx: ActionPipelineContext): Unit = {
    val c = ctx.copy(phase = ExecutionPhase.Prepare)
    actions.foreach(_.prepare(c))
  }

  /** Runs phase Init (schema propagation, no data) then phase Exec.
    * Returns final SubFeeds per action id. Skipped actions (NoData) are
    * recorded with isSkipped=true and their outputs propagate as skipped.
    */
  def run(initialSubFeeds: Seq[SubFeed] = Seq.empty)
         (implicit ctx: ActionPipelineContext): Map[String, Seq[SubFeed]] = {
    prepare
    runPhase(ExecutionPhase.Init, initialSubFeeds)(ctx)
    runPhase(ExecutionPhase.Exec, initialSubFeeds)(ctx)
  }

  /** Init-only run with injected SubFeeds — the reference's simulation mode
    * (`app/SmartDataLakeBuilder.scala:398-426`), used to unit-test whole
    * pipelines in memory. */
  def simulate(initialSubFeeds: Seq[SubFeed])
              (implicit ctx: ActionPipelineContext): Map[String, Seq[SubFeed]] =
    runPhase(ExecutionPhase.Init, initialSubFeeds)(ctx)

  /** Is [[graft.plans.PlanHasNoDataException]] anywhere in the cause
    * chain? Executor-side throws arrive wrapped in SparkException. */
  private def planHasNoData(e: Throwable): Boolean = {
    var c: Throwable = e
    var depth = 0
    while (c != null && depth < 10) {
      if (c.isInstanceOf[graft.plans.PlanHasNoDataException]) return true
      c = c.getCause; depth += 1
    }
    false
  }

  /** Dependency-triggered scheduling: an action starts the moment ITS
    * predecessors complete, not when a whole topological layer drains
    * (reference `util/dag/DAG.scala:106-141` schedules per-task the same
    * way). With heterogeneous branch costs a layer barrier idles the
    * cluster behind the slowest sibling — at 100-action scale the fast
    * branch's downstream work should overlap the slow branch's tail. */
  private def runPhase(phase: ExecutionPhase, initialSubFeeds: Seq[SubFeed])
                      (ctx0: ActionPipelineContext): Map[String, Seq[SubFeed]] = {
    val cacheOn = enableAutomaticDataFrameCaching && phase == ExecutionPhase.Exec
    implicit val c: ActionPipelineContext = ctx0.copy(phase = phase,
      dataFrameReuseCounts = if (cacheOn) reuseCounts else Map.empty,
      persistedFrames = scala.collection.concurrent.TrieMap.empty,
      // fresh per phase like persistedFrames: a FAILED run's un-applied
      // batch-fingerprint registration must not leak into a later run's
      // staged append (it would record a batch that never landed and
      // falsely refuse its legitimate rerun — loud, but avoidable)
      pendingStoreMetaUpdates = scala.collection.concurrent.TrieMap.empty)
    val pool = Executors.newFixedThreadPool(math.max(1, parallelism))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val results = scala.collection.concurrent.TrieMap.empty[String, Seq[SubFeed]]
    val skipped = scala.collection.concurrent.TrieMap.empty[String, Boolean]
    // countdown per auto-cached dataObjectId; 0 => safe to unpersist
    val pendingConsumers = new scala.collection.concurrent.TrieMap[String, java.util.concurrent.atomic.AtomicInteger]()
    if (cacheOn) reuseCounts.foreach { case (doId, n) =>
      pendingConsumers(doId) = new java.util.concurrent.atomic.AtomicInteger(n) }
    // unpersist via the persist-time record (Action.writeOutput registers
    // the df in ctx.persistedFrames BEFORE writing) — not via the
    // producer's results entry, which never exists when the producer
    // failed after the persist (write error, metricsFailCondition,
    // postExec throw) and would leak the cached blocks into the session
    def releaseConsumed(action: Action): Unit = if (cacheOn) {
      action.inputIds.distinct.foreach { inId =>
        pendingConsumers.get(inId).foreach { ctr =>
          if (ctr.decrementAndGet() == 0)
            c.persistedFrames.remove(inId).foreach(_.unpersist(false))
        }
      }
    }

    def runAction(action: Action): Unit = try {
      val inputs = action.inputIds.flatMap { inId =>
        producers.get(inId) match {
          case Some(p) => results.getOrElse(p.id, Seq.empty).filter(_.dataObjectId == inId)
          case None => initialSubFeeds.filter(_.dataObjectId == inId)
        }
      }
      // skip decision (reference Action.checkExecutionCondition:186-207):
      // a custom executionCondition REPLACES the default "skip if any
      // input is skipped" rule — condition true = run
      val shouldSkip = action.executionCondition match {
        case Some(cond) if phase == ExecutionPhase.Exec =>
          // every declared input is visible to the expression, source
          // inputs (no producer) as non-skipped placeholders
          val condInputs = action.inputIds.map(inId =>
            inputs.find(_.dataObjectId == inId).getOrElse(SubFeed(inId)))
          !ConditionEvaluator.evalExecutionCondition(cond, condInputs)
        case Some(_) => false // condition needs exec-phase metrics; run init
        case None =>
          action.inputIds.exists(inId => producers.get(inId).exists(p => skipped.getOrElse(p.id, false)))
      }
      if (shouldSkip) {
        skipped(action.id) = true
        val out = action.outputIds.map(SubFeed(_, isSkipped = true))
        results(action.id) = out
        // skipped actions are still RUN-STATE facts: without this, a
        // downstream skip propagated from a NoData source is missing from
        // the persisted actionsState and reads as "never attempted"
        if (phase == ExecutionPhase.Exec) onActionComplete(action.id, out)
      } else try {
        val out = phase match {
          case ExecutionPhase.Init => action.init(inputs)
          case ExecutionPhase.Exec => action.exec(inputs)
          case ExecutionPhase.Prepare => Seq.empty
        }
        // metricsFailCondition: a matching metric row fails the run
        // AFTER the write (reference Action.scala:119) — data landed,
        // but the run is marked failed for the operator to inspect
        if (phase == ExecutionPhase.Exec) action.metricsFailCondition.foreach { expr =>
          val failing = ConditionEvaluator.failingMetrics(expr, out)
          if (failing.nonEmpty) throw new IllegalStateException(
            s"Action ${action.id}: metricsFailCondition '$expr' matched: ${failing.mkString(", ")}")
        }
        // mode post-processing (move processed files, advance mod-time
        // watermarks) only after the write landed AND the metrics gate
        // passed — a failed run must not consume inputs. Destructive hooks
        // (fileMove) are additionally guarded at DAG build: no other action
        // may consume the same input.
        if (phase == ExecutionPhase.Exec)
          action.executionMode.foreach(_.postExec(action))
        results(action.id) = out
        if (phase == ExecutionPhase.Exec) onActionComplete(action.id, out)
      } catch {
        // PlanHasNoDataException is AssertNotEmpty's executor-side signal
        // (documented contract: the DAG marks the action SKIPPED, like the
        // reference's SparkPlanNoDataWarning → NoDataToProcessWarning
        // mapping); it surfaces wrapped in a SparkException, so the cause
        // chain is walked
        case e: Throwable if e.isInstanceOf[NoDataToProcessWarning] ||
            planHasNoData(e) =>
          // the mode's apply may already have installed shared read state
          // (a mod-time upper bound, a file snapshot) before the skip was
          // decided — release it without advancing any watermark
          if (phase == ExecutionPhase.Exec) action.executionMode.foreach(_.postExecFailed(action))
          skipped(action.id) = true
          val out = action.outputIds.map(SubFeed(_, isSkipped = true))
          results(action.id) = out
          if (phase == ExecutionPhase.Exec) onActionComplete(action.id, out)
        case e: Throwable =>
          // failed exec: same shared-state release, then propagate — a
          // failed run must neither consume inputs nor leak a bounded
          // read view into sibling actions sharing the DataObject
          if (phase == ExecutionPhase.Exec)
            try action.executionMode.foreach(_.postExecFailed(action))
            catch { case scala.util.control.NonFatal(_) => }
          throw e
      }
    } finally releaseConsumed(action) // last consumer done/skipped/failed -> drop the cache

    try {
      // Build one future per action chained on its predecessors' futures.
      // `layers` (topo order) guarantees every predecessor is registered
      // before its dependents; a failed predecessor future fails the
      // dependent chain without running it, while INDEPENDENT branches
      // keep running to completion.
      val futures = scala.collection.mutable.LinkedHashMap.empty[String, Future[Unit]]
      layers.flatten.foreach { action =>
        val preds = action.inputIds.flatMap(producers.get).map(_.id).distinct.flatMap(futures.get)
        futures(action.id) =
          if (preds.isEmpty) Future(runAction(action))
          else Future.sequence(preds).map(_ => runAction(action))
      }
      // settle EVERY action (in-flight work is not abandoned on the first
      // failure), then surface the first failure in scheduling order
      val settled = futures.values.toSeq.map(_.transform(scala.util.Success(_)))
      val outcomes = Await.result(Future.sequence(settled), Duration.Inf)
      outcomes.collectFirst { case scala.util.Failure(e) => throw e }
      results.toMap
    } finally {
      pool.shutdown()
      // every action has settled: ANY frame still registered (failed
      // consumers left their countdown above zero, the producer failed
      // after persisting, or a transformer handed an expensive per-batch
      // intermediate to the run — IncrementalStoreDfsTransformer's
      // persistForRun) is unpersisted — nothing cached outlives the run.
      // Unconditional: transformer registrations happen with caching off
      // too, and sweeping an empty map is free.
      c.persistedFrames.keys.toSeq
        .foreach(doId => c.persistedFrames.remove(doId).foreach(_.unpersist(false)))
    }
  }
}

object ActionDAGRun {
  /** Select actions by feed/id regex like the reference's `feedSel`
    * (`AppUtil.filterActionList`). */
  def fromRegistry(registry: InstanceRegistry, actionSel: Option[String] = None,
                   parallelism: Int = 1): ActionDAGRun = {
    val all = registry.allActions
    val selected = actionSel.fold(all)(sel => all.filter(_.id.matches(sel)))
    new ActionDAGRun(selected, parallelism)
  }
}
