package graft.core

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import graft.operators._
import graft.operators.modes._
import graft.quality.{Constraint, CountExpectation, Expectation, SQLExpectation, SQLFractionExpectation, UniqueKeyExpectation}
import graft.sources._
import org.apache.spark.sql.types.StructType
import scala.jdk.CollectionConverters._

/** Declarative pipeline configuration: connections / dataObjects / actions
  * declared in YAML (or JSON — YAML 1.2 superset), parsed into an
  * [[InstanceRegistry]], from which [[ActionDAGRun]] builds the pipeline.
  *
  * Mirrors the reference's HOCON config layer
  * (`sdl-core/config/ConfigParser.scala:53-187`: one factory per `type`,
  * ids as map keys, feed selection). Reference-style HOCON
  * `application.conf` is accepted natively (typesafe-config: includes,
  * substitutions, `=` syntax) — HOCON input is resolved and rendered to
  * JSON, then flows through the same jackson tree the YAML path uses.
  * The YAML structure matches the reference's `application.conf`:
  *
  * {{{
  * dataObjects:
  *   src-orders:  {type: CsvFileDataObject, path: /data/in}
  *   stg-orders:  {type: ParquetFileDataObject, path: /data/out, partitions: [dt]}
  * actions:
  *   load-orders:
  *     type: CopyAction
  *     inputId: src-orders
  *     outputId: stg-orders
  *     transformers:
  *       - {type: SQLDfTransformer, sql: "select * from %{inputViewName}"}
  *     metadata: {feed: staging}
  * }}}
  */
object ConfigParser {

  private val mapper = new ObjectMapper(new YAMLFactory())

  /** HOCON → JSON (resolving includes + `${}` substitutions), so the
    * reference's `application.conf` syntax flows through the same tree. */
  private def hoconToJson(configText: String): String =
    com.typesafe.config.ConfigFactory.parseString(configText).resolve().root()
      .render(com.typesafe.config.ConfigRenderOptions.concise())

  /** Config text → jackson tree. Text using HOCON-only features
    * (`${}` substitutions, `include`) goes straight to the HOCON parser —
    * colon-style HOCON is often ALSO valid YAML, and a YAML parse would
    * silently keep `${basePath}` as a literal string. Otherwise YAML/JSON
    * is tried first (historical default) with HOCON as fallback. Parses are
    * memoized (PipelineRunner consults the same text for registry, feeds
    * and global options). */
  // access-order LinkedHashMap = LRU: a long-lived session parsing many
  // distinct configs evicts only the stalest entry instead of dumping the
  // whole cache (the previous full clear() re-parsed every live config on
  // the next touch). Synchronized: parse volume is driver-side and tiny.
  private val treeCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, JsonNode](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[String, JsonNode]): Boolean =
        size > 64
    })
  private def tree(configText: String): JsonNode = {
    treeCache.computeIfAbsent(configText, { text =>
      val hoconOnly = text.contains("${") || text.linesIterator.exists(_.trim.startsWith("include "))
      def hocon = mapper.readTree(hoconToJson(text))
      val sections = Seq("dataObjects", "actions", "connections", "global")
      def yamlTry =
        try {
          val t = mapper.readTree(text)
          if (t != null && t.isObject && sections.exists(s => t.has(s))) Some(t) else None
        } catch { case _: Exception => None }
      if (hoconOnly)
        // the sniff is a heuristic: `${` may be literal content inside a
        // YAML string (a regex or SQL fragment), so a failed HOCON parse
        // still falls back to YAML instead of rejecting a valid config
        try hocon catch { case e: Exception => yamlTry.getOrElse(throw e) }
      else yamlTry.getOrElse(hocon)
    })
  }

  /** Parse config text (HOCON, YAML or JSON) into a fresh registry. */
  def parse(configText: String): InstanceRegistry = {
    val root = tree(configText)
    val registry = new InstanceRegistry
    val connections = obj(root, "connections").map { case (id, n) => id -> parseConnection(id, n) }
    connections.values.foreach(registry.register)
    obj(root, "dataObjects").foreach { case (id, n) =>
      registry.register(parseDataObject(id, n, connections))
      get(n, "metadata").foreach { m =>
        registry.setMetadata(id, DataObjectMetadata(
          name = str(m, "name"), description = str(m, "description"),
          layer = str(m, "layer"), subjectArea = str(m, "subjectArea"),
          tags = strSeq(m, "tags")))
      }
    }
    obj(root, "actions").foreach { case (id, n) => registry.register(parseAction(id, n)) }
    registry
  }

  /** `global.sparkOptions` of the config (reference `GlobalConfig.sparkOptions`,
    * `app/GlobalConfig.scala`) — applied by [[PipelineRunner]] to the session
    * for runtime-settable confs. Unquoted dotted HOCON keys
    * (`spark.sql.shuffle.partitions = 7`) arrive as NESTED objects — flatten
    * them back to dotted keys instead of silently dropping them. */
  def parseGlobalSparkOptions(configText: String): Map[String, String] = {
    def flatten(prefix: String, n: JsonNode): Seq[(String, String)] =
      if (n.isObject)
        n.properties().asScala.toSeq.flatMap(e =>
          flatten(if (prefix.isEmpty) e.getKey else s"$prefix.${e.getKey}", e.getValue))
      else Seq(prefix -> n.asText)
    get(tree(configText), "global.sparkOptions")
      .map(flatten("", _).toMap).getOrElse(Map.empty)
  }

  def parseFile(path: String): InstanceRegistry = {
    val p = java.nio.file.Paths.get(path)
    if (path.endsWith(".conf")) {
      // native HOCON file parse so `include` resolves relative to the file
      // (reference CLI accepts a list of .conf files/dirs the same way)
      val json = com.typesafe.config.ConfigFactory.parseFile(p.toFile).resolve().root()
        .render(com.typesafe.config.ConfigRenderOptions.concise())
      parse(json)
    } else parse(new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
  }

  /** Feed membership of each parsed action (`metadata.feed`), for feedSel. */
  def parseFeeds(configText: String): Map[String, String] =
    obj(tree(configText), "actions").map { case (id, n) =>
      id -> str(n, "metadata.feed").getOrElse("default")
    }

  // ----------------------------------------------------------------- helpers

  private def obj(n: JsonNode, field: String): Map[String, JsonNode] =
    Option(n.get(field)).map(_.properties().asScala.map(e => e.getKey -> e.getValue).toMap)
      .getOrElse(Map.empty)

  private def get(n: JsonNode, path: String): Option[JsonNode] =
    path.split('.').foldLeft(Option(n))((acc, f) => acc.flatMap(x => Option(x.get(f))))
  private def str(n: JsonNode, f: String): Option[String] = get(n, f).map(_.asText)
  private def int(n: JsonNode, f: String): Option[Int] = get(n, f).map(_.asInt)
  private def dbl(n: JsonNode, f: String): Option[Double] = get(n, f).map(_.asDouble)
  private def bool(n: JsonNode, f: String, dflt: Boolean = false): Boolean =
    get(n, f).map(_.asBoolean).getOrElse(dflt)
  private def strSeq(n: JsonNode, f: String): Seq[String] =
    get(n, f).map(_.elements().asScala.map(_.asText).toSeq).getOrElse(Seq.empty)
  private def strMap(n: JsonNode, f: String): Map[String, String] =
    get(n, f).map(_.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap)
      .getOrElse(Map.empty)
  private def nodeSeq(n: JsonNode, f: String): Seq[JsonNode] =
    get(n, f).map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
  private def require(o: Option[String], id: String, field: String): String =
    o.getOrElse(throw new IllegalArgumentException(s"config '$id': missing required field '$field'"))
  private def typeName(n: JsonNode, id: String): String = require(str(n, "type"), id, "type")
  private def ddlSchema(n: JsonNode, f: String): Option[StructType] =
    str(n, f).map(spec => graft.sources.SchemaUtil.resolve(spec,
      new org.apache.hadoop.conf.Configuration()))

  // ------------------------------------------------------------- connections

  private def parseConnection(id: String, n: JsonNode): Connection =
    typeName(n, id) match {
      case "JdbcConnection" | "jdbc" =>
        JdbcConnection(id, require(str(n, "url"), id, "url"),
          require(str(n, "driver"), id, "driver"), str(n, "user"), str(n, "password"))
      case t => throw new IllegalArgumentException(s"connection '$id': unknown type '$t'")
    }

  // ------------------------------------------------------------- dataObjects

  private def parseDataObject(id: String, n: JsonNode,
                              connections: Map[String, Connection]): DataObject = {
    def constraints = nodeSeq(n, "constraints").map(c =>
      Constraint(require(str(c, "name"), id, "constraints.name"),
        require(str(c, "expression"), id, "constraints.expression"),
        strSeq(c, "errorMsgCols")))
    def expectations: Seq[Expectation] = nodeSeq(n, "expectations").map(parseExpectation(id, _))
    typeName(n, id) match {
      case "ParquetFileDataObject" | "parquet" =>
        ParquetFileDataObject(id, require(str(n, "path"), id, "path"),
          partitions = strSeq(n, "partitions"), schema = ddlSchema(n, "schema"),
          schemaMin = ddlSchema(n, "schemaMin"), options = strMap(n, "options"),
          filenameColumn = str(n, "filenameColumn"),
          numberOfTasksPerPartition = int(n, "numberOfTasksPerPartition"),
          constraints = constraints, expectations = expectations,
          housekeepingMode = get(n, "housekeepingMode").map(parseHousekeeping(id, _)))
      case "CsvFileDataObject" | "csv" =>
        CsvFileDataObject(id, require(str(n, "path"), id, "path"),
          csvOptions = strMap(n, "csvOptions"), partitions = strSeq(n, "partitions"),
          schema = ddlSchema(n, "schema"), schemaMin = ddlSchema(n, "schemaMin"),
          filenameColumn = str(n, "filenameColumn"),
          numberOfTasksPerPartition = int(n, "numberOfTasksPerPartition"))
      case "JsonFileDataObject" | "json" =>
        JsonFileDataObject(id, require(str(n, "path"), id, "path"),
          jsonOptions = strMap(n, "jsonOptions"), partitions = strSeq(n, "partitions"),
          schema = ddlSchema(n, "schema"))
      case "AvroFileDataObject" | "avro" =>
        AvroFileDataObject(id, require(str(n, "path"), id, "path"),
          partitions = strSeq(n, "partitions"), schema = ddlSchema(n, "schema"))
      case "OrcFileDataObject" | "orc" =>
        OrcFileDataObject(id, require(str(n, "path"), id, "path"),
          partitions = strSeq(n, "partitions"), schema = ddlSchema(n, "schema"))
      case "XmlFileDataObject" | "xml" =>
        XmlFileDataObject(id, require(str(n, "path"), id, "path"),
          rowTag = str(n, "rowTag").getOrElse("row"), xmlOptions = strMap(n, "xmlOptions"),
          partitions = strSeq(n, "partitions"), schema = ddlSchema(n, "schema"))
      case "CustomDfDataObject" | "customDf" =>
        CustomDfDataObject.fromClassName(id,
          require(str(n, "className"), id, "className"), strMap(n, "options"))
      case "JmsDataObject" | "jms" =>
        // reference config surface (sdl-jms JmsDataObject.scala:40-58):
        // connection params travel in `options` to the named provider;
        // batch knobs keep the reference's second-granular names
        JmsDataObject.fromClassName(id,
          require(str(n, "consumerFactoryClassName"), id, "consumerFactoryClassName"),
          strMap(n, "options"),
          batchSize = int(n, "batchSize").getOrElse(100000),
          maxWaitMs = int(n, "maxWaitSec").map(_ * 1000L).getOrElse(1000L),
          maxBatchAgeMs = int(n, "maxBatchAgeSec").map(_ * 1000L).getOrElse(120000L),
          txBatchSize = int(n, "txBatchSize").getOrElse(100),
          schema = ddlSchema(n, "schema"))
      case "FileRefDataObject" | "fileRef" =>
        FileRefDataObject.fromClassName(id,
          require(str(n, "pattern"), id, "pattern"),
          transportClassName = str(n, "transportClassName"),
          options = strMap(n, "options"),
          targetDir = str(n, "targetDir"))
      case "RelaxedCsvFileDataObject" | "relaxedCsv" =>
        RelaxedCsvFileDataObject(id, require(str(n, "path"), id, "path"),
          csvOptions = strMap(n, "csvOptions"), schema = ddlSchema(n, "schema"),
          corruptRecordColumn = str(n, "corruptRecordColumn"),
          filenameColumn = str(n, "filenameColumn"))
      case "TickTockHiveTableDataObject" | "tickTock" =>
        TickTockHiveTableDataObject(id, parseTable(n, id),
          require(str(n, "basePath"), id, "basePath"),
          format = str(n, "format").getOrElse("parquet"),
          partitions = strSeq(n, "partitions"))
      case "RawFileDataObject" | "raw" =>
        RawFileDataObject(id, require(str(n, "path"), id, "path"), str(n, "pathGlobFilter"))
      case "VersionedTableDataObject" | "versionedTable" =>
        VersionedTableDataObject(id, require(str(n, "path"), id, "path"),
          primaryKey = strSeq(n, "primaryKey"),
          checkpointInterval = int(n, "checkpointInterval").getOrElse(10),
          partitions = strSeq(n, "partitions"),
          changeDataFeed = bool(n, "changeDataFeed"),
          deletionVectors = bool(n, "deletionVectors"),
          columnMapping = bool(n, "columnMapping"),
          // name-sorted for deterministic population order (JSON objects
          // are unordered); generation expressions reference FEED columns,
          // not other generated columns
          generatedColumns = strMap(n, "generatedColumns").toSeq.sortBy(_._1),
          identityColumns = strSeq(n, "identityColumns"),
          optimizedWrite = bool(n, "optimizedWrite"),
          constraints = constraints, expectations = expectations)
      case "KafkaTopicDataObject" | "kafka" =>
        KafkaTopicDataObject(id, require(str(n, "topic"), id, "topic"),
          brokers = str(n, "brokers").getOrElse("localhost:9092"),
          keyType = str(n, "keyType").getOrElse("string"),
          valueType = str(n, "valueType").getOrElse("string"),
          valueSchema = ddlSchema(n, "valueSchema"),
          valueAvroSchema = str(n, "valueAvroSchema"),
          keyAvroSchema = str(n, "keyAvroSchema"),
          schemaRegistry = strMap(n, "schemaRegistry").map { case (k, v) => k.toInt -> v },
          selectCols = strSeq(n, "selectCols"),
          datePartitionCol = str(n, "datePartitionCol"),
          datePartitionFormat = str(n, "datePartitionFormat").getOrElse("yyyyMMdd"),
          startingOffsets = str(n, "startingOffsets").getOrElse("earliest"),
          endingOffsets = str(n, "endingOffsets").getOrElse("latest"),
          kafkaOptions = strMap(n, "kafkaOptions"),
          archivePath = str(n, "archivePath"))
      case "ExcelFileDataObject" | "excel" =>
        ExcelFileDataObject(id, require(str(n, "path"), id, "path"),
          sheetName = str(n, "sheetName"),
          useHeader = bool(n, "useHeader", dflt = true),
          schema = ddlSchema(n, "schema"))
      case "HiveTableDataObject" | "hive" =>
        HiveTableDataObject(id, parseTable(n, id),
          partitions = strSeq(n, "partitions"),
          format = str(n, "format").getOrElse("parquet"),
          analyzeTableAfterWrite = bool(n, "analyzeTableAfterWrite"),
          bucketCols = strSeq(n, "bucketCols"),
          numBuckets = int(n, "numBuckets").getOrElse(0))
      case "JdbcTableDataObject" | "jdbcTable" =>
        val connId = require(str(n, "connectionId"), id, "connectionId")
        val conn = connections.getOrElse(connId,
          throw new IllegalArgumentException(s"dataObject '$id': unknown connectionId '$connId'")) match {
          case j: JdbcConnection => j
          case other => throw new IllegalArgumentException(
            s"dataObject '$id': connection '${other.id}' is not a JdbcConnection")
        }
        JdbcTableDataObject(id, parseTable(n, id), conn,
          preReadSql = str(n, "preReadSql"), postWriteSql = str(n, "postWriteSql"),
          jdbcOptions = strMap(n, "jdbcOptions"))
      case "PKViolatorsDataObject" | "pkViolators" => PKViolatorsDataObject(id)
      case "DataObjectsExporterDataObject" => DataObjectsExporterDataObject(id)
      case "ActionsExporterDataObject" => ActionsExporterDataObject(id)
      case t => throw new IllegalArgumentException(s"dataObject '$id': unknown type '$t'")
    }
  }

  private def parseTable(n: JsonNode, id: String): Table = {
    val t = get(n, "table").getOrElse(
      throw new IllegalArgumentException(s"dataObject '$id': missing 'table'"))
    Table(str(t, "db"), require(str(t, "name"), id, "table.name"),
      Some(strSeq(t, "primaryKey")).filter(_.nonEmpty))
  }

  private def parseHousekeeping(id: String, n: JsonNode): HousekeepingMode =
    typeName(n, id) match {
      case "PartitionRetentionMode" | "retention" =>
        PartitionRetentionMode(require(str(n, "retentionCondition"), id, "retentionCondition"),
          streamingCheckpoint = str(n, "streamingCheckpoint"),
          batchIdColumn = str(n, "batchIdColumn").getOrElse("ingest_batch"))
      case "PartitionArchiveCompactionMode" | "archiveCompaction" =>
        PartitionArchiveCompactionMode(
          archiveCondition = str(n, "archiveCondition"),
          archiveExpression = str(n, "archiveExpression"),
          compactCondition = str(n, "compactCondition"),
          compactNumFiles = int(n, "compactNumFiles").getOrElse(1),
          streamingCheckpoint = str(n, "streamingCheckpoint"),
          batchIdColumn = str(n, "batchIdColumn").getOrElse("ingest_batch"))
      case "FileCompactionMode" | "fileCompaction" =>
        FileCompactionMode(
          minFiles = int(n, "minFiles").getOrElse(16),
          targetNumFiles = int(n, "targetNumFiles").getOrElse(1))
      case t => throw new IllegalArgumentException(s"dataObject '$id': unknown housekeeping type '$t'")
    }

  private def parseExpectation(id: String, n: JsonNode): Expectation =
    typeName(n, id) match {
      case "CountExpectation" | "count" =>
        CountExpectation(str(n, "name").getOrElse("count"), str(n, "expectation"))
      case "SQLExpectation" | "sql" =>
        SQLExpectation(require(str(n, "name"), id, "expectation.name"),
          require(str(n, "aggregationExpression"), id, "aggregationExpression"),
          str(n, "expectation"))
      case "SQLFractionExpectation" | "sqlFraction" =>
        SQLFractionExpectation(require(str(n, "name"), id, "expectation.name"),
          require(str(n, "countConditionExpression"), id, "countConditionExpression"),
          str(n, "expectation"))
      case "UniqueKeyExpectation" | "uniqueKey" =>
        UniqueKeyExpectation(str(n, "name").getOrElse("uniqueKey"),
          keyCols = strSeq(n, "keyCols"), approximate = bool(n, "approximate"))
      case t => throw new IllegalArgumentException(s"dataObject '$id': unknown expectation type '$t'")
    }

  // ----------------------------------------------------------------- actions

  private def parseAction(id: String, n: JsonNode): Action = {
    def transformers = nodeSeq(n, "transformers").map(parseTransformer(id, _))
    def saveMode = str(n, "saveMode").map(parseSaveMode(id, _))
    // reference SDLSaveMode.scala:126-146 — all fields optional
    def saveModeOptions = get(n, "saveModeOptions").map(o => SaveModeMergeOptions(
      deleteCondition = str(o, "deleteCondition"),
      updateCondition = str(o, "updateCondition"),
      updateColumns = strSeq(o, "updateColumns"),
      updateExistingCondition = str(o, "updateExistingCondition"),
      insertCondition = str(o, "insertCondition"),
      insertColumnsToIgnore = strSeq(o, "insertColumnsToIgnore"),
      insertValuesOverride = strMap(o, "insertValuesOverride"),
      additionalMergePredicate = str(o, "additionalMergePredicate")))
    def execMode = get(n, "executionMode").map(parseExecutionMode(id, _))
    def execCond = get(n, "executionCondition").map(c =>
      Condition(require(str(c, "expression"), id, "executionCondition.expression"),
        str(c, "description")))
    def metricsFail = str(n, "metricsFailCondition")
    typeName(n, id) match {
      case "CopyAction" | "copy" =>
        CopyAction(id, require(str(n, "inputId"), id, "inputId"),
          require(str(n, "outputId"), id, "outputId"), transformers,
          deleteDataAfterRead = bool(n, "deleteDataAfterRead"),
          saveMode = saveMode, executionMode = execMode,
          executionCondition = execCond, metricsFailCondition = metricsFail,
          breakDataFrameLineage = bool(n, "breakDataFrameLineage"),
          saveModeOptions = saveModeOptions)
      case "CustomDataFrameAction" | "customDataFrame" =>
        val sqls = strMap(n, "outputSql")
        val dfs: Seq[DfsTransformer] =
          (if (sqls.nonEmpty) Seq(SQLDfsTransformer(sqls)) else Seq.empty) ++
            nodeSeq(n, "dfsTransformers").map(parseDfsTransformer(id, _))
        CustomDataFrameAction(id, strSeq(n, "inputIds"), strSeq(n, "outputIds"), dfs, saveMode,
          execCond, metricsFail, recursiveInputIds = strSeq(n, "recursiveInputIds"),
          breakDataFrameLineage = bool(n, "breakDataFrameLineage"),
          saveModeOptions = saveModeOptions,
          executionMode = execMode,
          mainInputId = str(n, "mainInputId"))
      case "DeduplicateAction" | "deduplicate" =>
        DeduplicateAction(id, require(str(n, "inputId"), id, "inputId"),
          require(str(n, "outputId"), id, "outputId"),
          primaryKey = strSeq(n, "primaryKey"), transformers = transformers,
          mergeModeEnable = bool(n, "mergeModeEnable"),
          updateCapturedColumnOnlyWhenChanged = bool(n, "updateCapturedColumnOnlyWhenChanged"),
          ignoreOldDeletedColumns = bool(n, "ignoreOldDeletedColumns"),
          mergeModeAdditionalJoinPredicate = str(n, "mergeModeAdditionalJoinPredicate"),
          executionMode = execMode,
          executionCondition = execCond, metricsFailCondition = metricsFail)
      case "HistorizeAction" | "historize" =>
        HistorizeAction(id, require(str(n, "inputId"), id, "inputId"),
          require(str(n, "outputId"), id, "outputId"),
          primaryKey = strSeq(n, "primaryKey"), transformers = transformers,
          incrementalUpdate = bool(n, "incrementalUpdate"),
          cdcOptions = get(n, "cdcOptions").map(c => CdcOptions(
            require(str(c, "timestampColumn"), id, "cdcOptions.timestampColumn"),
            require(str(c, "operationColumn"), id, "cdcOptions.operationColumn"),
            str(c, "deleteValue").getOrElse("d"))),
          filterClause = str(n, "filterClause"),
          historizeBlacklist = Some(strSeq(n, "historizeBlacklist")).filter(_.nonEmpty),
          historizeWhitelist = Some(strSeq(n, "historizeWhitelist")).filter(_.nonEmpty),
          ignoreOldDeletedColumns = bool(n, "ignoreOldDeletedColumns"),
          mergeModeEnable = bool(n, "mergeModeEnable"),
          mergeModeAdditionalJoinPredicate = str(n, "mergeModeAdditionalJoinPredicate"),
          executionMode = execMode,
          executionCondition = execCond, metricsFailCondition = metricsFail)
      case "FileTransferAction" | "fileTransfer" =>
        FileTransferAction(id, require(str(n, "inputId"), id, "inputId"),
          require(str(n, "outputId"), id, "outputId"))
      case "StreamingIncrementalDedupAction" | "streamingIncrementalDedup" =>
        val t = parseDfsTransformer(id,
          get(n, "transformer").getOrElse(throw new IllegalArgumentException(
            s"action '$id': missing required field 'transformer'")))
        val inc = t match {
          case i: IncrementalStoreDfsTransformer => i
          case other => throw new IllegalArgumentException(s"action '$id': transformer " +
            s"${other.getClass.getSimpleName} is not a store-backed incremental dedup transformer")
        }
        val m = get(n, "mode").map(parseExecutionMode(id, _)).getOrElse(
          throw new IllegalArgumentException(s"action '$id': missing required field 'mode'")) match {
          case s: SparkStreamingMode => s
          case other => throw new IllegalArgumentException(
            s"action '$id': mode must be a SparkStreamingMode, got ${other.getClass.getSimpleName}")
        }
        StreamingIncrementalDedupAction(id, inc, m,
          batchIdColumn = str(n, "batchIdColumn").getOrElse("ingest_batch"),
          executionCondition = execCond, metricsFailCondition = metricsFail)
      case "CustomScriptAction" | "script" =>
        CustomScriptAction(id, strSeq(n, "cmd"),
          inputIds = strSeq(n, "inputIds"), outputIds = strSeq(n, "outputIds"))
      case t => throw new IllegalArgumentException(s"action '$id': unknown type '$t'")
    }
  }

  private def parseSaveMode(id: String, s: String): SdlSaveMode = s match {
    case "Overwrite" | "overwrite" => SdlSaveMode.Overwrite
    case "Append" | "append" => SdlSaveMode.Append
    case "ErrorIfExists" | "error" => SdlSaveMode.ErrorIfExists
    case "Ignore" | "ignore" => SdlSaveMode.Ignore
    case "OverwriteOptimized" | "overwrite_optimized" => SdlSaveMode.OverwriteOptimized
    case "OverwritePreserveDirectories" | "overwrite_preserve_directories" =>
      SdlSaveMode.OverwritePreserveDirectories
    case "Merge" | "merge" => SdlSaveMode.Merge
    case other => throw new IllegalArgumentException(s"action '$id': unknown saveMode '$other'")
  }

  private def parseExecutionMode(id: String, n: JsonNode): ExecutionMode =
    typeName(n, id) match {
      case "PartitionDiffMode" | "partitionDiff" =>
        PartitionDiffMode(partitionColNb = int(n, "partitionColNb"),
          nbOfPartitionValuesPerRun = int(n, "nbOfPartitionValuesPerRun"),
          failConditionOnMissingInput = bool(n, "failConditionOnMissingInput"),
          applyCondition = str(n, "applyCondition"),
          failCondition = str(n, "failCondition"),
          selectExpression = str(n, "selectExpression"),
          alternativeOutputId = str(n, "alternativeOutputId"))
      case "DataFrameIncrementalMode" | "incremental" =>
        DataFrameIncrementalMode(require(str(n, "compareCol"), id, "compareCol"))
      case "DataObjectStateIncrementalMode" | "stateIncremental" =>
        DataObjectStateIncrementalMode()
      case "FileIncrementalMoveMode" | "fileMove" =>
        FileIncrementalMoveMode(str(n, "archivePath"))
      case "KafkaStateIncrementalMode" | "kafkaStateIncremental" =>
        KafkaStateIncrementalMode(str(n, "delayedMaxTimestampExpr"))
      case "CdcIncrementalMode" | "cdcIncremental" =>
        CdcIncrementalMode()
      case "ProcessAllMode" | "processAll" => ProcessAllMode()
      case "FailIfNoPartitionValuesMode" | "failIfNoPartitionValues" =>
        FailIfNoPartitionValuesMode()
      case "SparkStreamingMode" | "streaming" =>
        SparkStreamingMode(
          checkpointLocation = require(str(n, "checkpointLocation"), id, "checkpointLocation"),
          triggerType = str(n, "triggerType").getOrElse("Once"),
          triggerIntervalSec = get(n, "triggerIntervalSec").map(_.asLong),
          inputOptions = strMap(n, "inputOptions"),
          outputOptions = strMap(n, "outputOptions"),
          outputMode = str(n, "outputMode").getOrElse("append"))
      case t => throw new IllegalArgumentException(s"action '$id': unknown executionMode type '$t'")
    }

  private def parseTransformer(id: String, n: JsonNode): DfTransformer =
    typeName(n, id) match {
      case "SQLDfTransformer" | "sql" =>
        SQLDfTransformer(require(str(n, "sql"), id, "transformer.sql"), str(n, "inputViewName"))
      case "FilterTransformer" | "filter" =>
        FilterTransformer(require(str(n, "filterClause"), id, "filterClause"))
      case "AdditionalColumnsTransformer" | "additionalColumns" =>
        AdditionalColumnsTransformer(strMap(n, "additionalColumns"))
      case "BlacklistTransformer" | "blacklist" => BlacklistTransformer(strSeq(n, "columnBlacklist"))
      case "WhitelistTransformer" | "whitelist" => WhitelistTransformer(strSeq(n, "columnWhitelist"))
      case "StandardizeColNamesTransformer" | "standardizeColNames" => StandardizeColNamesTransformer()
      case "StandardizeDatatypesTransformer" | "standardizeDatatypes" => StandardizeDatatypesTransformer()
      case "DataValidationTransformer" | "dataValidation" =>
        DataValidationTransformer(nodeSeq(n, "rules").map(r =>
          ValidationRule(require(str(r, "condition"), id, "rule.condition"), str(r, "errorMsg"))),
          str(n, "errorsColumn").getOrElse("errors"))
      case "DeduplicateTransformer" | "deduplicateTransformer" =>
        DeduplicateTransformer(strSeq(n, "keyColumns"),
          require(str(n, "rankingExpression"), id, "rankingExpression"))
      case "ConvertNullValuesTransformer" | "convertNullValues" =>
        ConvertNullValuesTransformer(str(n, "valueForString").getOrElse(""),
          int(n, "valueForNumber").getOrElse(0), strSeq(n, "columnBlacklist"))
      case "FlattenTransformer" | "flatten" =>
        FlattenTransformer(bool(n, "explodeArrays", dflt = true),
          str(n, "separator").getOrElse("_"))
      case "RepartitionTransformer" | "repartition" =>
        RepartitionTransformer(int(n, "numberOfTasksPerPartition").getOrElse(1), strSeq(n, "keyCols"))
      case "DebugTransformer" | "debug" => DebugTransformer(int(n, "numRows").getOrElse(5))
      case "ScalaCodeDfTransformer" | "scalaCode" =>
        ScalaCodeDfTransformer(require(str(n, "code"), id, "transformer.code"))
      case "EncryptColumnsTransformer" | "encryptColumns" =>
        EncryptColumnsTransformer(strSeq(n, "encryptColumns"), require(str(n, "key"), id, "key"))
      case "DecryptColumnsTransformer" | "decryptColumns" =>
        DecryptColumnsTransformer(strSeq(n, "decryptColumns"), require(str(n, "key"), id, "key"))
      case "NearDedupTransformer" | "nearDedup" =>
        NearDedupTransformer(
          require(str(n, "idColumn"), id, "idColumn"),
          require(str(n, "textColumn"), id, "textColumn"),
          method = str(n, "method").getOrElse("minhash"),
          threshold = dbl(n, "threshold").getOrElse(0.7),
          shingleSize = int(n, "shingleSize").getOrElse(5),
          numHashes = int(n, "numHashes").getOrElse(32),
          bands = int(n, "bands").getOrElse(8),
          maxHamming = int(n, "maxHamming").getOrElse(3))
      case "SessionizeTransformer" | "sessionize" =>
        SessionizeTransformer(strSeq(n, "keyColumns"),
          require(str(n, "tsColumn"), id, "tsColumn"),
          maxGapSeconds = get(n, "maxGapSeconds").map(_.asLong).getOrElse(1800L))
      case "DeterministicSampleTransformer" | "sample" =>
        DeterministicSampleTransformer(
          require(str(n, "keyColumn"), id, "keyColumn"),
          rate = dbl(n, "rate").getOrElse(1.0),
          stratumColumn = str(n, "stratumColumn"),
          rates = strMap(n, "rates").map { case (k, v) => k -> v.toDouble },
          defaultRate = dbl(n, "defaultRate").getOrElse(0.0))
      case "TextQualityTransformer" | "textQuality" =>
        TextQualityTransformer(require(str(n, "textColumn"), id, "textColumn"),
          repetitionMaxN = int(n, "repetitionMaxN").getOrElse(3))
      case "PiiRedactTransformer" | "piiRedact" =>
        PiiRedactTransformer(require(str(n, "textColumn"), id, "textColumn"))
      case "TrainSplitTransformer" | "trainSplit" =>
        TrainSplitTransformer(require(str(n, "keyColumn"), id, "keyColumn"),
          valFraction = dbl(n, "valFraction").getOrElse(0.05),
          testFraction = dbl(n, "testFraction").getOrElse(0.05),
          labelColumn = str(n, "labelColumn").getOrElse("split"))
      case "ShardAssignmentTransformer" | "shardAssignment" =>
        ShardAssignmentTransformer(require(str(n, "keyColumn"), id, "keyColumn"),
          numShards = int(n, "numShards").getOrElse(throw new IllegalArgumentException(
            s"config '$id': missing required field 'numShards'")))
      case "NfcNormalizeTransformer" | "nfcNormalize" =>
        NfcNormalizeTransformer(require(str(n, "textColumn"), id, "textColumn"))
      case "SpanRemovalTransformer" | "spanRemoval" =>
        SpanRemovalTransformer(
          require(str(n, "idColumn"), id, "idColumn"),
          require(str(n, "textColumn"), id, "textColumn"),
          windowTokens = int(n, "windowTokens").getOrElse(8),
          portableFingerprints = bool(n, "portableFingerprints", dflt = true))
      case "LineDedupTransformer" | "lineDedup" =>
        LineDedupTransformer(
          require(str(n, "idColumn"), id, "idColumn"),
          require(str(n, "textColumn"), id, "textColumn"),
          maxOccurrences = int(n, "maxOccurrences").getOrElse(1))
      case "TokenChunkTransformer" | "tokenChunk" =>
        TokenChunkTransformer(
          require(str(n, "idColumn"), id, "idColumn"),
          require(str(n, "textColumn"), id, "textColumn"),
          maxLen = int(n, "maxLen").getOrElse(throw new IllegalArgumentException(
            s"config '$id': missing required field 'maxLen'")),
          overlap = int(n, "overlap").getOrElse(0))
      case "TemperatureMixTransformer" | "temperatureMix" =>
        TemperatureMixTransformer(
          require(str(n, "keyColumn"), id, "keyColumn"),
          require(str(n, "stratumColumn"), id, "stratumColumn"),
          require(str(n, "tokenCountColumn"), id, "tokenCountColumn"),
          budgetTokens = get(n, "budgetTokens").map(_.asLong).getOrElse(
            throw new IllegalArgumentException(s"config '$id': missing required field 'budgetTokens'")),
          alpha = dbl(n, "alpha").getOrElse(0.5))
      case "EventTimeWindowTransformer" | "eventTimeWindow" =>
        graft.streaming.EventTimeWindowTransformer(
          require(str(n, "eventTimeColumn"), id, "eventTimeColumn"),
          require(str(n, "windowDuration"), id, "windowDuration"),
          slideDuration = str(n, "slideDuration"),
          watermarkDuration = str(n, "watermarkDuration").getOrElse("0 seconds"),
          groupByColumns = strSeq(n, "groupByColumns"),
          aggExpressions = strMap(n, "aggExpressions"))
      case "SessionWindowTransformer" | "sessionWindow" =>
        graft.streaming.SessionWindowTransformer(
          require(str(n, "eventTimeColumn"), id, "eventTimeColumn"),
          require(str(n, "gapDuration"), id, "gapDuration"),
          watermarkDuration = str(n, "watermarkDuration").getOrElse("0 seconds"),
          groupByColumns = strSeq(n, "groupByColumns"),
          aggExpressions = strMap(n, "aggExpressions"))
      case "StreamingDedupTransformer" | "streamingDedup" =>
        graft.streaming.StreamingDedupTransformer(strSeq(n, "keyColumns"),
          eventTimeColumn = str(n, "eventTimeColumn"),
          withinWatermark = str(n, "withinWatermark"))
      case "PplCutoffAssignTransformer" | "pplCutoffAssign" =>
        PplCutoffAssignTransformer(
          require(str(n, "langColumn"), id, "langColumn"),
          cutoffs = get(n, "cutoffs").map(_.properties().asScala.map(e =>
            e.getKey -> e.getValue.elements().asScala.map(_.asLong).toSeq).toMap)
            .getOrElse(throw new IllegalArgumentException(
              s"config '$id': missing required field 'cutoffs'")))
      case t => throw new IllegalArgumentException(s"action '$id': unknown transformer type '$t'")
    }

  /** N:M transformers available to CustomDataFrameAction's `dfsTransformers` */
  private def parseDfsTransformer(id: String, n: JsonNode): DfsTransformer =
    typeName(n, id) match {
      case "SQLDfsTransformer" | "sqlDfs" => SQLDfsTransformer(strMap(n, "outputSql"))
      case "IncrementalDedupTransformer" | "incrementalDedup" =>
        IncrementalDedupTransformer(
          require(str(n, "batchInput"), id, "batchInput"),
          require(str(n, "storeInput"), id, "storeInput"),
          require(str(n, "idColumn"), id, "idColumn"),
          require(str(n, "textColumn"), id, "textColumn"),
          threshold = dbl(n, "threshold").getOrElse(0.7),
          shingleSize = int(n, "shingleSize").getOrElse(5),
          numHashes = int(n, "numHashes").getOrElse(32),
          bands = int(n, "bands").getOrElse(8),
          novelOutput = str(n, "novelOutput"),
          signatureScheme = str(n, "signatureScheme").getOrElse("minhash"),
          intraBatch = bool(n, "intraBatch", dflt = true),
          storeLayout = str(n, "storeLayout").getOrElse("compact"),
          storePartitions = int(n, "storePartitions").getOrElse(0),
          novelBatchKeyColumn = str(n, "novelBatchKeyColumn"),
          novelBatchKeyValue = str(n, "novelBatchKeyValue"),
          allowRerun = bool(n, "allowRerun"),
          rerunGuardRingSize = int(n, "rerunGuardRingSize").getOrElse(16))
      case "IncrementalSpanRemovalTransformer" | "incrementalSpanRemoval" =>
        IncrementalSpanRemovalTransformer(
          require(str(n, "batchInput"), id, "batchInput"),
          require(str(n, "storeInput"), id, "storeInput"),
          require(str(n, "idColumn"), id, "idColumn"),
          require(str(n, "textColumn"), id, "textColumn"),
          windowTokens = int(n, "windowTokens").getOrElse(8),
          portableFingerprints = bool(n, "portableFingerprints", dflt = true),
          cleanOutput = str(n, "cleanOutput"),
          storePartitions = int(n, "storePartitions").getOrElse(0),
          novelBatchKeyColumn = str(n, "novelBatchKeyColumn"),
          novelBatchKeyValue = str(n, "novelBatchKeyValue"),
          allowRerun = bool(n, "allowRerun"),
          rerunGuardRingSize = int(n, "rerunGuardRingSize").getOrElse(16))
      case "IncrementalLineDedupTransformer" | "incrementalLineDedup" =>
        IncrementalLineDedupTransformer(
          require(str(n, "batchInput"), id, "batchInput"),
          require(str(n, "storeInput"), id, "storeInput"),
          require(str(n, "idColumn"), id, "idColumn"),
          require(str(n, "textColumn"), id, "textColumn"),
          maxOccurrences = int(n, "maxOccurrences").getOrElse(1),
          cleanOutput = str(n, "cleanOutput"),
          storePartitions = int(n, "storePartitions").getOrElse(0),
          novelBatchKeyColumn = str(n, "novelBatchKeyColumn"),
          novelBatchKeyValue = str(n, "novelBatchKeyValue"),
          allowRerun = bool(n, "allowRerun"),
          rerunGuardRingSize = int(n, "rerunGuardRingSize").getOrElse(16))
      case "DecontaminateSpansTransformer" | "decontaminateSpans" =>
        DecontaminateSpansTransformer(
          require(str(n, "corpusInput"), id, "corpusInput"),
          require(str(n, "benchmarkInput"), id, "benchmarkInput"),
          require(str(n, "idColumn"), id, "idColumn"),
          require(str(n, "textColumn"), id, "textColumn"),
          require(str(n, "benchTextColumn"), id, "benchTextColumn"),
          windowTokens = int(n, "windowTokens").getOrElse(8),
          cleanOutput = str(n, "cleanOutput"))
      case "IncrementalMediaDedupTransformer" | "incrementalMediaDedup" =>
        IncrementalMediaDedupTransformer(
          require(str(n, "batchInput"), id, "batchInput"),
          require(str(n, "storeInput"), id, "storeInput"),
          require(str(n, "idColumn"), id, "idColumn"),
          contentColumn = str(n, "contentColumn").getOrElse("content"),
          modality = str(n, "modality").getOrElse("image"),
          maxHamming = int(n, "maxHamming").getOrElse(2),
          maxBucketSize = int(n, "maxBucketSize").getOrElse(1000),
          novelOutput = str(n, "novelOutput"),
          frameSize = int(n, "frameSize").getOrElse(0),
          stride = int(n, "stride").getOrElse(1),
          minSharedFrames = int(n, "minSharedFrames").getOrElse(2),
          maxFrameOccurrences = int(n, "maxFrameOccurrences").getOrElse(1000),
          intraBatch = bool(n, "intraBatch", dflt = true),
          storePartitions = int(n, "storePartitions").getOrElse(0),
          novelBatchKeyColumn = str(n, "novelBatchKeyColumn"),
          novelBatchKeyValue = str(n, "novelBatchKeyValue"),
          allowRerun = bool(n, "allowRerun"),
          rerunGuardRingSize = int(n, "rerunGuardRingSize").getOrElse(16))
      case "IncrementalEmbeddingDedupTransformer" | "incrementalEmbeddingDedup" =>
        IncrementalEmbeddingDedupTransformer(
          require(str(n, "batchInput"), id, "batchInput"),
          require(str(n, "storeInput"), id, "storeInput"),
          require(str(n, "idColumn"), id, "idColumn"),
          require(str(n, "embColumn"), id, "embColumn"),
          dim = int(n, "dim").getOrElse(throw new IllegalArgumentException(
            s"config '$id': missing required field 'dim'")),
          numPlanes = int(n, "numPlanes").getOrElse(16),
          threshold = dbl(n, "threshold").getOrElse(0.95),
          maxBucketSize = int(n, "maxBucketSize").getOrElse(1000),
          novelOutput = str(n, "novelOutput"),
          intraBatch = bool(n, "intraBatch", dflt = true),
          storePartitions = int(n, "storePartitions").getOrElse(0),
          novelBatchKeyColumn = str(n, "novelBatchKeyColumn"),
          novelBatchKeyValue = str(n, "novelBatchKeyValue"),
          allowRerun = bool(n, "allowRerun"),
          rerunGuardRingSize = int(n, "rerunGuardRingSize").getOrElse(16))
      case "NbQualityTransformer" | "nbQuality" =>
        NbQualityTransformer(
          require(str(n, "corpusInput"), id, "corpusInput"),
          require(str(n, "targetSeedInput"), id, "targetSeedInput"),
          require(str(n, "backgroundSeedInput"), id, "backgroundSeedInput"),
          require(str(n, "textColumn"), id, "textColumn"),
          targetTextColumn = str(n, "targetTextColumn"),
          backgroundTextColumn = str(n, "backgroundTextColumn"),
          numBuckets = int(n, "numBuckets").getOrElse(256),
          keepOnlyPredicted = bool(n, "keepOnlyPredicted"),
          scoredOutput = str(n, "scoredOutput"))
      case "PerplexityBucketsTransformer" | "perplexityBuckets" =>
        PerplexityBucketsTransformer(
          require(str(n, "corpusInput"), id, "corpusInput"),
          require(str(n, "seedInput"), id, "seedInput"),
          require(str(n, "idColumn"), id, "idColumn"),
          require(str(n, "textColumn"), id, "textColumn"),
          require(str(n, "langColumn"), id, "langColumn"),
          seedTextColumn = str(n, "seedTextColumn"),
          numBuckets = int(n, "numBuckets").getOrElse(4096),
          scoredOutput = str(n, "scoredOutput"))
      case "DsirResampleTransformer" | "dsirResample" =>
        DsirResampleTransformer(
          require(str(n, "corpusInput"), id, "corpusInput"),
          require(str(n, "targetSeedInput"), id, "targetSeedInput"),
          require(str(n, "idColumn"), id, "idColumn"),
          require(str(n, "textColumn"), id, "textColumn"),
          k = int(n, "k").getOrElse(throw new IllegalArgumentException(
            s"config '$id': missing required field 'k'")),
          targetTextColumn = str(n, "targetTextColumn"),
          numBuckets = int(n, "numBuckets").getOrElse(256),
          selectedOutput = str(n, "selectedOutput"))
      case t => throw new IllegalArgumentException(s"action '$id': unknown dfs transformer type '$t'")
    }
}

/** Programmatic equivalent of the reference's `LocalSmartDataLakeBuilder`
  * CLI entry (`app/SmartDataLakeBuilder.scala:315-…`): parse config, select
  * actions by feed (`feedSel` regex over `metadata.feed`), run the 3-phase
  * DAG. */
object PipelineRunner {
  def run(configText: String, spark: org.apache.spark.sql.SparkSession,
          feedSel: Option[String] = None, parallelism: Int = 1,
          runtimeOptions: Map[String, String] = Map.empty): Map[String, Seq[SubFeed]] = {
    val registry = ConfigParser.parse(configText)
    // zip-packed text inputs read transparently in config-driven pipelines
    // (additive codec registration — only .zip-suffixed files are affected)
    graft.sources.GraftZipCodec.register(
      ActionPipelineContext(spark, registry))
    // global.sparkOptions: runtime-settable confs (shuffle partitions, AQE
    // flags, session timezone, …) — reference GlobalConfig applies them at
    // session build; on an existing session only dynamic confs apply
    ConfigParser.parseGlobalSparkOptions(configText).foreach { case (k, v) =>
      try spark.conf.set(k, v)
      catch { case e: org.apache.spark.sql.AnalysisException =>
        System.err.println(s"[config] global.sparkOptions: cannot set static conf '$k' on a running session: ${e.getMessage}") }
    }
    val feeds = ConfigParser.parseFeeds(configText)
    val selected = feedSel.map { sel =>
      val re = sel.r
      feeds.collect { case (aid, feed) if re.pattern.matcher(feed).matches => aid }.toSet
    }
    val actions = registry.allActions.filter(a => selected.forall(_.contains(a.id)))
    require(actions.nonEmpty, s"no actions selected (feedSel=$feedSel)")
    implicit val ctx: ActionPipelineContext =
      ActionPipelineContext(spark, registry, runtimeOptions = runtimeOptions)
    val dag = new ActionDAGRun(actions, parallelism)
    dag.prepare
    dag.run()
  }
}
