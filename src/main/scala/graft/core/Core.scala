package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Execution phase of a pipeline run.
  *
  * Mirrors the reference's three-phase model (prepare/init/exec) — see
  * smart-data-lake `sdl-core/workflow/ExecutionPhase` usage in
  * `workflow/action/Action.scala:157-244`: Prepare validates config and
  * endpoints, Init traverses the whole DAG lazily (schema propagation, no
  * data movement), Exec moves data.
  */
sealed trait ExecutionPhase
object ExecutionPhase {
  case object Prepare extends ExecutionPhase
  case object Init extends ExecutionPhase
  case object Exec extends ExecutionPhase
}

/** A single partition-column→value assignment set: the unit of incremental
  * processing. Reference: `sdl-core/util/hdfs/Partition.scala:37`.
  *
  * At 100 TB scale partitions are the coarse parallelism/pruning unit —
  * every read of a partitioned DataObject turns `PartitionValues` into a
  * pushed-down filter so only the matching directories/row-groups are
  * scanned.
  */
case class PartitionValues(elements: Map[String, String]) {
  def isEmpty: Boolean = elements.isEmpty
  def keys: Set[String] = elements.keySet
  def apply(col: String): String = elements(col)
  def get(col: String): Option[String] = elements.get(col)
  /** Hive-style relative path, e.g. `dt=2024-01-01/region=EU`. */
  def asPath(partitionCols: Seq[String]): String =
    partitionCols.flatMap(c => elements.get(c).map(v => s"$c=$v")).mkString("/")
  /** SQL predicate selecting this partition, e.g. `dt='2024-01-01' AND region='EU'`.
    * A null value selects the null partition (`k IS NULL`). */
  def asFilterExpr: String =
    elements.map { case (k, v) =>
      if (v == null) s"$k IS NULL" else s"$k = '${v.replace("'", "''")}'"
    }.mkString(" AND ")
}
object PartitionValues {
  def apply(elems: (String, String)*): PartitionValues = PartitionValues(elems.toMap)
  /** One OR-of-ANDs predicate for a set of partition values (partition pruning). */
  def filterExpr(pvs: Seq[PartitionValues]): Option[String] =
    if (pvs.isEmpty) None
    else Some(pvs.map(pv => s"(${pv.asFilterExpr})").mkString(" OR "))
}

/** Save modes, superset of Spark's. Reference:
  * `sdl-core/definitions/SDLSaveMode.scala:32-99`.
  */
sealed trait SdlSaveMode
object SdlSaveMode {
  case object Overwrite extends SdlSaveMode
  case object Append extends SdlSaveMode
  case object ErrorIfExists extends SdlSaveMode
  case object Ignore extends SdlSaveMode
  /** Overwrite only the partitions present in the written DataFrame
    * (dynamic partition overwrite); non-partitioned: same as Overwrite.
    * Reference `SDLSaveMode.OverwriteOptimized:79`. */
  case object OverwriteOptimized extends SdlSaveMode
  /** Delete files but preserve directory structure/ACLs. Reference
    * `SDLSaveMode.OverwritePreserveDirectories:65`. */
  case object OverwritePreserveDirectories extends SdlSaveMode
  /** Upsert by primary key. Reference `SDLSaveMode.Merge:88`. */
  case object Merge extends SdlSaveMode

  def toSpark(m: SdlSaveMode): org.apache.spark.sql.SaveMode = m match {
    case Overwrite | OverwritePreserveDirectories => org.apache.spark.sql.SaveMode.Overwrite
    case Append => org.apache.spark.sql.SaveMode.Append
    case ErrorIfExists => org.apache.spark.sql.SaveMode.ErrorIfExists
    case Ignore => org.apache.spark.sql.SaveMode.Ignore
    case other => throw new IllegalArgumentException(s"$other has no direct Spark SaveMode")
  }
}

/** Fine-grained control of Merge behaviour. Reference:
  * `sdl-core/definitions/SDLSaveMode.scala:126-146` (SaveModeMergeOptions).
  * All conditions are SQL expressions over `existing.*` / `new.*` aliases.
  */
case class SaveModeMergeOptions(
    deleteCondition: Option[String] = None,
    updateCondition: Option[String] = None,
    updateColumns: Seq[String] = Seq.empty,
    /** condition for a SECOND matched-update clause that updates ALL
      * columns — fires when the primary update clause didn't (reference
      * `SDLSaveMode.scala:129`; used by HistorizeAction's CDC merge for
      * its `updateExisting` operation class). */
    updateExistingCondition: Option[String] = None,
    insertCondition: Option[String] = None,
    insertColumnsToIgnore: Seq[String] = Seq.empty,
    insertValuesOverride: Map[String, String] = Map.empty,
    additionalMergePredicate: Option[String] = None)

/** Runtime metrics of one action output write. Reference records
  * records_written / bytes / duration per action via
  * `metrics/SparkStageMetricsListener.scala:35-90`. */
case class ActionMetrics(
    recordsWritten: Long = -1,
    durationMillis: Long = -1,
    observedMetrics: Map[String, Any] = Map.empty)

/** Token flowing along DAG edges: which DataObject, which partitions, and —
  * once init/exec has run — the DataFrame. Reference:
  * `sdl-core/workflow/SubFeed.scala:32-73` and `DataFrameSubFeed.scala:35-80`.
  * We are Spark-only, so the DataFrame is carried directly.
  */
case class SubFeed(
    dataObjectId: String,
    dataFrame: Option[DataFrame] = None,
    partitionValues: Seq[PartitionValues] = Seq.empty,
    isStreaming: Boolean = false,
    isSkipped: Boolean = false,
    metrics: Option[ActionMetrics] = None) {
  def withDataFrame(df: DataFrame): SubFeed = copy(dataFrame = Some(df))
}

/** A Spark-SQL boolean expression with an optional human description.
  * Reference `definitions/Condition.scala` (used by `executionCondition`
  * and friends; evaluated via SparkExpressionUtil). */
case class Condition(expression: String, description: Option[String] = None)

/** Evaluates [[Condition]]s against pipeline state by compiling the
  * expression with Spark SQL over literal rows — the same expression
  * language users already write in transformers (reference
  * `util/misc/SparkExpressionUtil.scala`). */
object ConditionEvaluator {

  /** `executionCondition` data model: `inputSubFeeds.<dataObjectId>` struct
    * with isSkipped / numRecords (reference SubFeedsExpressionData).
    * The state is bound via the DataFrame API (struct field names are
    * metadata, never parsed), so dataObjectIds containing quotes can't
    * break — or inject into — the SQL regardless of the session's
    * string-literal parser mode (escapedStringLiterals etc.); only the
    * user's expression itself goes through the parser. */
  def evalExecutionCondition(cond: Condition, subFeeds: Seq[SubFeed])
                            (implicit ctx: ActionPipelineContext): Boolean = {
    import org.apache.spark.sql.functions.{expr, lit, struct}
    def one(s: SubFeed) = struct(
      lit(s.isSkipped).as("isSkipped"),
      lit(s.metrics.map(_.recordsWritten).getOrElse(-1L)).as("numRecords")
    ).as(s.dataObjectId)
    val data =
      if (subFeeds.isEmpty) struct(lit(true).as("_empty"))
      else struct(subFeeds.map(one): _*)
    val df = ctx.spark.range(1).select(data.as("inputSubFeeds"))
      .select(expr(cond.expression).cast("boolean").as("_r"))
    Option(df.collect().head.get(0)).exists(_.asInstanceOf[Boolean])
  }

  /** `metricsFailCondition` data model: one row per metric with
    * (dataObjectId, key, value); rows matching the expression fail the
    * action (reference Action.scala:119 + evaluateMetricsFailCondition). */
  def failingMetrics(expression: String, out: Seq[SubFeed])
                    (implicit ctx: ActionPipelineContext): Seq[String] = {
    val rows: Seq[(String, String, Double)] = out.flatMap { sf =>
      sf.metrics.toSeq.flatMap { m =>
        (("records_written", m.recordsWritten.toDouble) +:
          m.observedMetrics.toSeq.collect { case (k, v: java.lang.Number) => (k, v.doubleValue) })
          .map { case (k, v) => (sf.dataObjectId, k, v) }
      }
    }
    if (rows.isEmpty) return Seq.empty
    // bind values as a DataFrame (ids/keys never hit the SQL parser;
    // NaN/Infinity doubles survive as values, where a bare NaN literal in
    // SQL text would parse as a column reference)
    import ctx.spark.implicits._
    ctx.spark.createDataset(rows).toDF("dataObjectId", "key", "value")
      .where(expression)
      .collect().map(r => s"${r.getString(0)}.${r.getString(1)}=${r.getDouble(2)}").toSeq
  }
}

/** Context threaded through every prepare/init/exec call. Reference:
  * `ActionPipelineContext` in `sdl-core/workflow/ActionPipelineContext.scala`.
  */
case class ActionPipelineContext(
    spark: SparkSession,
    registry: InstanceRegistry,
    phase: ExecutionPhase = ExecutionPhase.Exec,
    runId: Int = 1,
    attemptId: Int = 1,
    runStateDir: Option[String] = None,
    /** arbitrary runtime options usable in transformer expressions */
    runtimeOptions: Map[String, String] = Map.empty,
    /** dataObjectId -> number of downstream actions consuming it, for the
      * ids the DAG decided to auto-cache (reference
      * `dataFrameReuseStatistics` + `Environment.
      * enableAutomaticDataFrameCaching`): an output whose lineage
      * DataFrame feeds >=2 consumers recomputes its whole plan per
      * consumer unless persisted. Populated by [[ActionDAGRun]] for the
      * exec phase; empty = caching off. */
    dataFrameReuseCounts: Map[String, Int] = Map.empty,
    /** dataObjectId -> the DataFrame writeOutput actually persisted for
      * multi-consumer reuse, recorded AT PERSIST TIME so [[ActionDAGRun]]
      * can always unpersist it — even when the producer fails after the
      * persist (write error / metricsFailCondition / postExec throw) and
      * never publishes a results entry. Shared mutable map scoped to one
      * phase run. */
    persistedFrames: scala.collection.concurrent.TrieMap[String, org.apache.spark.sql.DataFrame] =
      scala.collection.concurrent.TrieMap.empty,
    /** dataObjectId -> store-meta sidecar keys to merge in when that
      * object's staged APPEND commits (registered by the incremental
      * store transformers' rerun guard, applied by
      * [[graft.sources.SparkFileDataObject.writeDataFrameStagedAppend]]
      * at its commit point): the last-applied batch fingerprint must
      * become durable WITH the append, not before the write (a failed
      * write must stay rerunnable) and not after the moves (a crash
      * between them would leave a committed batch unguarded). Shared
      * mutable map scoped to one phase run, like [[persistedFrames]]. */
    pendingStoreMetaUpdates: scala.collection.concurrent.TrieMap[String, Map[String, String]] =
      scala.collection.concurrent.TrieMap.empty) {
  def isExecPhase: Boolean = phase == ExecutionPhase.Exec
}

/** Registry of named DataObjects / Actions / Connections parsed from config
  * or registered programmatically. Reference:
  * `sdl-core/config/InstanceRegistry.scala`.
  */
/** Catalog metadata attached to a DataObject in config (reference
  * `DataObjectMetadata`: name/description/layer/subjectArea/tags) —
  * surfaced through the exporter objects for catalog/lineage UIs. */
case class DataObjectMetadata(
    name: Option[String] = None, description: Option[String] = None,
    layer: Option[String] = None, subjectArea: Option[String] = None,
    tags: Seq[String] = Seq.empty)

class InstanceRegistry {
  import graft.sources.DataObject
  import graft.operators.Action

  private val dataObjects = scala.collection.mutable.LinkedHashMap.empty[String, DataObject]
  private val actions = scala.collection.mutable.LinkedHashMap.empty[String, Action]
  private val connections = scala.collection.mutable.LinkedHashMap.empty[String, Connection]
  private val dataObjectMeta = scala.collection.mutable.LinkedHashMap.empty[String, DataObjectMetadata]

  def setMetadata(dataObjectId: String, meta: DataObjectMetadata): this.type = {
    dataObjectMeta(dataObjectId) = meta; this
  }
  def metadata(dataObjectId: String): Option[DataObjectMetadata] = dataObjectMeta.get(dataObjectId)

  def register(d: DataObject): this.type = { dataObjects(d.id) = d; this }
  def register(a: Action): this.type = { actions(a.id) = a; this }
  def register(c: Connection): this.type = { connections(c.id) = c; this }
  def dataObject(id: String): DataObject =
    dataObjects.getOrElse(id, throw new NoSuchElementException(s"DataObject '$id' not registered"))
  def dataObjectOption(id: String): Option[DataObject] = dataObjects.get(id)
  def action(id: String): Action =
    actions.getOrElse(id, throw new NoSuchElementException(s"Action '$id' not registered"))
  def connection(id: String): Connection =
    connections.getOrElse(id, throw new NoSuchElementException(s"Connection '$id' not registered"))
  def allDataObjects: Seq[DataObject] = dataObjects.values.toSeq
  def allActions: Seq[Action] = actions.values.toSeq
}

/** Secret resolution for config-carried credentials. Reference
  * `util/secrets/SecretsUtil.scala:41-60`: values of the form
  * `###<PROVIDERID>#<NAME>###` resolve through a provider —
  * `###ENV#VAR###` (environment), `###FILE#/path###` (file content,
  * trimmed) built in, custom providers registrable by id. Plain values
  * pass through, so secrets are opt-in per field. Resolution happens at
  * USE time (a missing env var only fails the pipeline that needs it). */
object SecretsUtil {
  private val WithProvider = "^###([^#]*)#(.*)###$".r
  private val custom = scala.collection.concurrent.TrieMap.empty[String, String => String]
  def registerProvider(id: String, resolver: String => String): Unit = custom(id) = resolver
  def resolve(value: String): String = value match {
    case WithProvider("ENV", name) => sys.env.getOrElse(name,
      throw new IllegalArgumentException(s"secret: environment variable '$name' not set"))
    case WithProvider("FILE", path) =>
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path.trim)), "UTF-8").trim
    case WithProvider(provider, name) => custom.get(provider).map(_(name)).getOrElse(
      throw new IllegalArgumentException(s"secret: unknown provider '$provider' (registered: ${custom.keys.mkString(",")})"))
    case v => v
  }
}

/** Shared endpoint configuration (JDBC url, Kafka brokers, …). Reference:
  * `sdl-core/workflow/connection/`. */
trait Connection { def id: String }

/** JDBC connection (url/driver/user). Reference `connection/JdbcTableConnection.scala`.
  * user/password accept `###ENV#...###`-style secret references. */
case class JdbcConnection(
    id: String, url: String, driver: String,
    user: Option[String] = None, password: Option[String] = None) extends Connection {
  def resolvedUser: Option[String] = user.map(SecretsUtil.resolve)
  def resolvedPassword: Option[String] = password.map(SecretsUtil.resolve)
}

/** Table identity for table-like DataObjects; primaryKey drives
  * dedup/historize/merge. Reference `sdl-core/workflow/dataobject/Table.scala:50`. */
case class Table(db: Option[String], name: String, primaryKey: Option[Seq[String]] = None) {
  def fullName: String = db.map(_ + ".").getOrElse("") + name
}
