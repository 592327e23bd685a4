package graft.app

import graft.core._
import org.apache.spark.sql.SparkSession

/** Command-line entry point — the reference's `LocalSmartDataLakeBuilder`
  * (`app/LocalSmartDataLakeBuilder.scala`, option surface
  * `app/SmartDataLakeBuilder.scala:226-286`) re-expressed over this
  * engine's runners. One JVM, one SparkSession, three phases
  * (prepare/init/exec) over the HOCON-declared DAG.
  *
  * ```
  * graft.app.GraftApp \
  *   --config pipeline.conf[,more.conf|confDir] \
  *   [--feed-sel <regex>] [--parallelism N] \
  *   [--partition-values col=val[,col=val]] \
  *   [--multi-partition-values col=val[,col=val][;col=val...]] \
  *   [--state-path dir --name app]      # stateful run + crash recovery
  *   [--simulate]                       # init-only dry run (schemas, no data)
  *   [--streaming] [--trigger-interval-sec N] [--max-iterations N]
  *   [--master local[*]]
  * ```
  */
object GraftApp {

  case class CliArgs(
      configPaths: Seq[String] = Seq.empty,
      feedSel: Option[String] = None,
      parallelism: Int = 1,
      partitionValues: Seq[PartitionValues] = Seq.empty,
      statePath: Option[String] = None,
      appName: String = "graft",
      simulate: Boolean = false,
      streaming: Boolean = false,
      triggerIntervalSec: Long = 60,
      maxIterations: Int = Int.MaxValue,
      master: Option[String] = None)

  private def parsePv(s: String): PartitionValues =
    PartitionValues(s.split(',').map { kv =>
      val Array(k, v) = kv.split("=", 2)
      k.trim -> v.trim
    }.toMap)

  def parseArgs(argv: Array[String]): CliArgs = {
    def loop(args: List[String], acc: CliArgs): CliArgs = args match {
      case Nil => acc
      case ("--config" | "-c") :: v :: rest =>
        loop(rest, acc.copy(configPaths = v.split(',').toSeq))
      case ("--feed-sel" | "-f") :: v :: rest => loop(rest, acc.copy(feedSel = Some(v)))
      case ("--parallelism" | "-p") :: v :: rest => loop(rest, acc.copy(parallelism = v.toInt))
      case "--partition-values" :: v :: rest =>
        loop(rest, acc.copy(partitionValues = Seq(parsePv(v))))
      case "--multi-partition-values" :: v :: rest =>
        loop(rest, acc.copy(partitionValues = v.split(';').toSeq.map(parsePv)))
      case ("--state-path" | "-s") :: v :: rest => loop(rest, acc.copy(statePath = Some(v)))
      case ("--name" | "-n") :: v :: rest => loop(rest, acc.copy(appName = v))
      case "--simulate" :: rest => loop(rest, acc.copy(simulate = true))
      case "--streaming" :: rest => loop(rest, acc.copy(streaming = true))
      case "--trigger-interval-sec" :: v :: rest =>
        loop(rest, acc.copy(triggerIntervalSec = v.toLong))
      case "--max-iterations" :: v :: rest => loop(rest, acc.copy(maxIterations = v.toInt))
      case "--master" :: v :: rest => loop(rest, acc.copy(master = Some(v)))
      case other :: _ =>
        throw new IllegalArgumentException(s"unknown argument '$other'")
    }
    val parsed = loop(argv.toList, CliArgs())
    require(parsed.configPaths.nonEmpty, "--config is required")
    parsed
  }

  /** Load and concatenate config text from files and directories (a
    * directory contributes its *.conf files in name order — the
    * reference's `ConfigLoader.loadConfigFromFilesystem` merge). HOCON
    * concatenation merges top-level `dataObjects`/`actions` blocks. */
  def loadConfigText(paths: Seq[String]): String = {
    val files = paths.flatMap { p =>
      val f = new java.io.File(p)
      if (f.isDirectory)
        f.listFiles((_, name) => name.endsWith(".conf")).sortBy(_.getName).toSeq
      else Seq(f)
    }
    files.map { f =>
      require(f.isFile, s"config file not found: ${f.getPath}")
      new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8)
    }.mkString("\n")
  }

  /** Build the session with `global.sparkOptions` applied at BUILD time, so
    * static confs (shuffle partitions for AQE, warehouse dir, extensions)
    * take effect — on an already-running session only dynamic confs can
    * apply (reference `GlobalConfig.createSparkSession`). */
  def buildSession(configText: String, master: Option[String], appName: String): SparkSession = {
    val b0 = SparkSession.builder().appName(appName)
    val b1 = master.fold(b0)(b0.master)
    val b2 = ConfigParser.parseGlobalSparkOptions(configText)
      .foldLeft(b1) { case (b, (k, v)) => b.config(k, v) }
    b2.getOrCreate()
  }

  /** Run a parsed CLI invocation on an existing session. Returns final
    * SubFeeds per action id (empty map for pure streaming loops). */
  def run(args: CliArgs, spark: SparkSession): Map[String, Seq[SubFeed]] = {
    val configText = loadConfigText(args.configPaths)
    val registry = ConfigParser.parse(configText)
    // --state-path doubles as the run-state dir for continuously-updated
    // streaming metrics (StreamingIncrementalDedupAction persists
    // per-batch rows to <statePath>/streaming/<actionId>.json on every
    // progress event — without this wiring an async run records nothing)
    implicit val ctx: ActionPipelineContext =
      ActionPipelineContext(spark, registry, runStateDir = args.statePath)
    graft.sources.GraftZipCodec.register(ctx)
    ConfigParser.parseGlobalSparkOptions(configText).foreach { case (k, v) =>
      try spark.conf.set(k, v)
      catch { case _: org.apache.spark.sql.AnalysisException => () } // static conf already applied at build
    }
    val feeds = ConfigParser.parseFeeds(configText)
    val selected = args.feedSel.map { sel =>
      val re = sel.r
      feeds.collect { case (aid, feed) if re.pattern.matcher(feed).matches => aid }.toSet
    }
    val actions = registry.allActions.filter(a => selected.forall(_.contains(a.id)))
    require(actions.nonEmpty, s"no actions selected (feedSel=${args.feedSel})")

    // partition values enter as initial SubFeeds on DAG-start inputs
    val produced = actions.flatMap(_.outputIds).toSet
    val startInputs = actions.flatMap(_.inputIds).distinct.filterNot(produced)
    val initialSubFeeds = startInputs.map(in =>
      SubFeed(in, partitionValues = args.partitionValues))

    if (args.simulate) {
      val dag = new ActionDAGRun(actions, args.parallelism)
      dag.prepare
      dag.simulate(initialSubFeeds)
    } else if (args.streaming) {
      // combining --streaming with --state-path is not implemented: fail
      // loudly instead of silently running stateless (a user relying on
      // checkpointed offsets would double-process on restart)
      require(args.statePath.isEmpty,
        "--streaming with --state-path is not supported: streaming actions checkpoint " +
          "through their own execution modes (checkpointLocation / incremental state)")
      val n = SyncStreamingRunner.runLoop(actions, args.triggerIntervalSec,
        maxIterations = args.maxIterations, parallelism = args.parallelism,
        initialSubFeeds = initialSubFeeds)
      System.err.println(s"[graft] streaming loop finished after $n iterations")
      Map.empty
    } else args.statePath match {
      case Some(sp) =>
        val store = new RunStateStore(sp, args.appName,
          spark.sparkContext.hadoopConfiguration)
        StatefulRun.run(actions, store, args.parallelism, initialSubFeeds)
      case None =>
        // dag.run prepares internally (phase Prepare → Init → Exec)
        new ActionDAGRun(actions, args.parallelism).run(initialSubFeeds)
    }
  }

  def main(argv: Array[String]): Unit = {
    val args = parseArgs(argv)
    val configText = loadConfigText(args.configPaths)
    val spark = buildSession(configText, args.master, args.appName)
    val results = run(args, spark)
    results.toSeq.sortBy(_._1).foreach { case (aid, feeds) =>
      val rows = feeds.flatMap(_.metrics.map(_.recordsWritten)).sum
      val skipped = feeds.exists(_.isSkipped)
      System.err.println(s"[graft] $aid: ${if (skipped) "SKIPPED" else s"$rows records"}")
    }
  }
}
