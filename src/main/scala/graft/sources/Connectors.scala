package graft.sources

import graft.core._
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import java.nio.charset.StandardCharsets.UTF_8

/** External connectors (webservice / OData / Splunk / Airbyte / file-ref
  * transfer / Kafka / JMS), each built around an injectable transport so
  * the Spark-side logic is fully testable offline and endpoints are
  * swappable.
  *
  * Design rule shared by most of them: the TRANSPORT runs on the driver
  * and must only move modest control-plane volumes (API pages, search
  * results); bulk data always lands in a file/table DataObject and flows
  * through distributed scans. This matches the reference, whose
  * webservice/OData objects also fetch driver-side
  * (`sdl-core/workflow/dataobject/WebserviceFileDataObject.scala:63-108`,
  * `ODataDataObject.scala`). Splunk is the exception on both sides: the
  * reference distributes time-windowed searches across executors, and so
  * does [[SplunkDataObject]] here.
  */
trait HttpTransport {
  def get(url: String, headers: Map[String, String]): Array[Byte]
}

/** java.net.http implementation (JDK built-in, no extra dependency). */
class JavaHttpTransport(timeoutSec: Long = 60) extends HttpTransport {
  import java.net.http.{HttpClient, HttpRequest, HttpResponse}
  private lazy val client = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(timeoutSec)).build()
  override def get(url: String, headers: Map[String, String]): Array[Byte] = {
    val b = HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofSeconds(timeoutSec)).GET()
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofByteArray())
    require(resp.statusCode() / 100 == 2, s"HTTP ${resp.statusCode()} for $url")
    resp.body()
  }
}

/** Auth modes of the reference's webservice object (basic / bearer /
  * custom header / none) as header providers. Credential fields accept
  * `###ENV#...###`-style secret references (resolved at request time). */
sealed trait AuthMode { def headers: Map[String, String] }
case object NoAuthMode extends AuthMode { val headers = Map.empty[String, String] }
case class BasicAuthMode(user: String, password: String) extends AuthMode {
  def headers = Map("Authorization" -> ("Basic " + java.util.Base64.getEncoder
    .encodeToString(s"${graft.core.SecretsUtil.resolve(user)}:${graft.core.SecretsUtil.resolve(password)}"
      .getBytes(UTF_8))))
}
case class TokenAuthMode(token: String) extends AuthMode {
  def headers = Map("Authorization" -> s"Bearer ${graft.core.SecretsUtil.resolve(token)}")
}
case class HeaderAuthMode(headerName: String, value: String) extends AuthMode {
  def headers = Map(headerName -> graft.core.SecretsUtil.resolve(value))
}

/** REST reader: one GET per partition-value combination (query params),
  * JSON payloads parsed into a DataFrame, binary kept opaque. Reference:
  * `WebserviceFileDataObject.scala:63-108` (auth modes, query-param
  * partitions). */
case class WebserviceFileDataObject(
    id: String, url: String,
    authMode: AuthMode = NoAuthMode,
    additionalHeaders: Map[String, String] = Map.empty,
    /** partition col -> list of values; one request per combination, the
      * partition values become query parameters AND result columns */
    queryParameters: Map[String, Seq[String]] = Map.empty,
    responseFormat: String = "json", // json | binary
    schema: Option[StructType] = None,
    transport: HttpTransport = new JavaHttpTransport())
  extends DataObject with CanCreateDataFrame with CanHandlePartitions {

  override def partitions: Seq[String] = queryParameters.keys.toSeq

  override def listPartitions(implicit ctx: ActionPipelineContext): Seq[PartitionValues] =
    combinations.map(PartitionValues(_))

  private def combinations: Seq[Map[String, String]] =
    queryParameters.foldLeft(Seq(Map.empty[String, String])) { case (acc, (k, vs)) =>
      for { m <- acc; v <- vs } yield m + (k -> v)
    }

  private def urlFor(params: Map[String, String]): String =
    if (params.isEmpty) url
    else url + (if (url.contains("?")) "&" else "?") + params.map { case (k, v) =>
      s"$k=${java.net.URLEncoder.encode(v, "UTF-8")}"
    }.mkString("&")

  override def getDataFrame(partitionValues: Seq[PartitionValues] = Seq.empty)
                           (implicit ctx: ActionPipelineContext): DataFrame = {
    val spark = ctx.spark
    import spark.implicits._
    val wanted =
      if (partitionValues.nonEmpty) partitionValues.map(_.elements)
      else combinations
    val headers = authMode.headers ++ additionalHeaders
    responseFormat match {
      case "binary" =>
        val rows = wanted.map(p => (urlFor(p), transport.get(urlFor(p), headers)))
        rows.toDF("url", "content")
      case _ =>
        val payloads: Seq[(Map[String, String], String)] =
          wanted.map(p => p -> new String(transport.get(urlFor(p), headers), UTF_8))
        val dfs = payloads.map { case (params, body) =>
          val ds: Dataset[String] = spark.createDataset(Seq(body))
          val parsed = schema.fold(spark.read.json(ds))(s => spark.read.schema(s).json(ds))
          params.foldLeft(parsed) { case (df, (k, v)) => df.withColumn(k, lit(v)) }
        }
        dfs.reduce(_.unionByName(_, allowMissingColumns = true))
    }
  }
}

/** OData V4 paginated reader: follows `@odata.nextLink` until exhausted,
  * each page's `value` array parsed as JSON rows. Reference:
  * `ODataDataObject.scala` (640 LoC — pagination + auth + flatten). */
case class ODataDataObject(
    id: String, baseUrl: String, entity: String,
    select: Option[String] = None, filter: Option[String] = None,
    authMode: AuthMode = NoAuthMode,
    maxPages: Int = 1000,
    schema: Option[StructType] = None,
    transport: HttpTransport = new JavaHttpTransport())
  extends DataObject with CanCreateDataFrame {

  private def firstUrl: String = {
    // URL-encode the parameter VALUES: virtually every real $filter
    // contains spaces ("Price gt 20"), which URI.create rejects raw
    def enc(v: String) = java.net.URLEncoder.encode(v, "UTF-8").replace("+", "%20")
    val params = select.map(s => s"$$select=${enc(s)}").toSeq ++
      filter.map(f => s"$$filter=${enc(f)}")
    val q = if (params.isEmpty) "" else params.mkString("?", "&", "")
    s"${baseUrl.stripSuffix("/")}/$entity$q"
  }

  override def getDataFrame(partitionValues: Seq[PartitionValues] = Seq.empty)
                           (implicit ctx: ActionPipelineContext): DataFrame = {
    val spark = ctx.spark
    import spark.implicits._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val pages = scala.collection.mutable.ArrayBuffer.empty[String]
    var next: Option[String] = Some(firstUrl)
    var n = 0
    while (next.isDefined && n < maxPages) {
      val body = new String(transport.get(next.get, authMode.headers), UTF_8)
      val root = mapper.readTree(body)
      val value = root.get("value")
      require(value != null, s"ODataDataObject $id: response has no 'value' array")
      value.elements().forEachRemaining(e => pages += e.toString)
      // a JSON-null nextLink ('"@odata.nextLink": null') terminates paging
      // like an absent one — asText on a NullNode would yield the string
      // "null" and the next request would target the URI "null"
      next = Option(root.get("@odata.nextLink")).filterNot(_.isNull).map(_.asText)
      n += 1
    }
    if (next.isDefined) System.err.println(
      s"[warn] ODataDataObject $id: stopped at maxPages=$maxPages with more pages available — result truncated")
    val ds: Dataset[String] = spark.createDataset(pages.toSeq)
    schema.fold(spark.read.json(ds))(s => spark.read.schema(s).json(ds))
  }
}

/** Splunk search reader. Reference: `sdl-splunk/.../SplunkDataObject.scala`
  * (227 LoC) splits `[queryFrom, queryTo)` into `queryTimeInterval`-sized
  * windows, distributes the windows over `parallelRequests` Spark tasks,
  * and runs one bounded export search per window EXECUTOR-SIDE (ref :74-80:
  * `splitQueryTimes(...).repartition(parallelRequests).map(readRows...)`) —
  * a month-long pull parallelizes across the cluster instead of
  * serializing through the driver. Window bounds are half-open `[from,
  * to)`, matching Splunk's inclusive `earliest_time` / exclusive
  * `latest_time`, so windows never double-fetch a boundary event.
  *
  * The client is injectable for offline tests; [[HttpSplunkClient]] is the
  * live implementation (REST export endpoint). The windowed path takes an
  * all-string `schema` (results are field->string maps, missing fields
  * default to ""), defaulting to the reference's `(_raw, _time)`
  * (ref :61) whenever from/to are set — bounds ALWAYS engage windowing.
  * Only without from/to does it degrade to a single driver-side search
  * with inferred string columns. */
trait SplunkClient extends Serializable {
  /** run a search bounded to [from, to), rows as field->value maps */
  def search(query: String, from: String, to: String): Seq[Map[String, String]]
}

/** Live Splunk REST client: one POST to `services/search/jobs/export` per
  * window (form-encoded `search`/`earliest_time`/`latest_time`,
  * `output_mode=json`), response parsed as NDJSON with one `result` object
  * per event. Serializable — each Spark task opens its own connection. */
case class HttpSplunkClient(baseUrl: String, user: String, password: String,
                            timeoutSec: Long = 60) extends SplunkClient {
  override def search(query: String, from: String, to: String): Seq[Map[String, String]] = {
    import java.net.http.{HttpClient, HttpRequest, HttpResponse}
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    val form = s"search=${enc(query)}&earliest_time=${enc(from)}" +
      s"&latest_time=${enc(to)}&output_mode=json"
    val auth = "Basic " + java.util.Base64.getEncoder.encodeToString(
      s"${SecretsUtil.resolve(user)}:${SecretsUtil.resolve(password)}".getBytes(UTF_8))
    val req = HttpRequest.newBuilder(java.net.URI.create(
        s"${baseUrl.stripSuffix("/")}/services/search/jobs/export"))
      .timeout(java.time.Duration.ofSeconds(timeoutSec))
      .header("Authorization", auth)
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString(form)).build()
    val resp = HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(timeoutSec)).build()
      .send(req, HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() / 100 == 2,
      s"Splunk export returned HTTP ${resp.statusCode()}")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    resp.body().linesIterator.filter(_.nonEmpty).flatMap { line =>
      Option(mapper.readTree(line).get("result")).map { r =>
        val b = Map.newBuilder[String, String]
        val it = r.fields()
        while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText }
        b.result()
      }
    }.toSeq
  }
}

case class SplunkDataObject(
    id: String, query: String,
    queryFrom: java.time.LocalDateTime = null,
    queryTo: java.time.LocalDateTime = null,
    queryTimeInterval: java.time.Duration = java.time.Duration.ofMinutes(10),
    parallelRequests: Int = 2,
    schema: Option[StructType] = None,
    client: SplunkClient)
  extends DataObject with CanCreateDataFrame {
  import SplunkDataObject._

  override def getDataFrame(partitionValues: Seq[PartitionValues] = Seq.empty)
                           (implicit ctx: ActionPipelineContext): DataFrame = {
    val spark = ctx.spark
    val q = validateQuery(query)
    // schema defaults to (_raw, _time) like the reference
    // (`SplunkDataObject.scala:61`: `Seq(_raw, _time)`) so setting
    // from/to ALWAYS engages the windowed executor-side path — a missing
    // schema must not silently collapse windowing + parallelism into one
    // driver-side search
    val effectiveSchema = schema.orElse(Option(queryFrom).flatMap(_ => Option(queryTo)).map(_ =>
      StructType(Seq(
        org.apache.spark.sql.types.StructField("_raw", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("_time", org.apache.spark.sql.types.StringType)))))
    (Option(queryFrom), Option(queryTo), effectiveSchema) match {
      case (Some(f), Some(t), Some(sc)) =>
        require(sc.fields.forall(_.dataType == org.apache.spark.sql.types.StringType),
          s"SplunkDataObject $id: schema fields must all be StringType (Splunk events are field->string maps)")
        val names = sc.fieldNames.toSeq
        val windows = splitQueryTimes(f, t, queryTimeInterval)
          .map { case (a, b) => (fmt(a), fmt(b)) }
        val cl = client
        val rdd = spark.sparkContext
          .parallelize(windows, math.max(1, math.min(parallelRequests, windows.size)))
          .flatMap { case (a, b) =>
            cl.search(q, a, b).map(m =>
              org.apache.spark.sql.Row.fromSeq(names.map(n => m.getOrElse(n, ""))))
          }
        spark.createDataFrame(rdd, sc)
      case _ =>
        // degraded single-search path (no window bounds): driver-side
        // fetch, columns inferred from the result keys
        val rows = client.search(q,
          Option(queryFrom).map(fmt).getOrElse(""),
          Option(queryTo).map(fmt).getOrElse(""))
        val cols = rows.flatMap(_.keys).distinct.sorted
        val data = rows.map(r => cols.map(c => r.getOrElse(c, null)))
        val rdd = spark.sparkContext.parallelize(data.map(org.apache.spark.sql.Row.fromSeq))
        spark.createDataFrame(rdd, StructType(cols.map(c =>
          org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.StringType))))
    }
  }
}

object SplunkDataObject {
  private val Fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")
  def fmt(t: java.time.LocalDateTime): String = Fmt.format(t)

  /** Queries must name an index (ref :127-133) and carry the `search`
    * command prefix Splunk's parser expects. */
  def validateQuery(q: String): String = {
    require(q.contains("index="),
      "Splunk queries must define the index the search should work on")
    if (q.startsWith("search")) q else "search " + q
  }

  /** Tumbling half-open windows covering [from, to): every window but the
    * last spans exactly `interval`; the last is clipped to `to`. */
  def splitQueryTimes(from: java.time.LocalDateTime, to: java.time.LocalDateTime,
                      interval: java.time.Duration): Seq[(java.time.LocalDateTime, java.time.LocalDateTime)] = {
    require(!interval.isZero && !interval.isNegative, "queryTimeInterval must be positive")
    require(from.isBefore(to), s"queryFrom $from must precede queryTo $to")
    val b = Seq.newBuilder[(java.time.LocalDateTime, java.time.LocalDateTime)]
    var cur = from
    while (cur.isBefore(to)) {
      val next = cur.plus(interval)
      b += ((cur, if (next.isBefore(to)) next else to))
      cur = next
    }
    b.result()
  }
}

/** Runs an Airbyte-protocol source as a subprocess and parses its JSON-line
  * protocol stream (RECORD / STATE / LOG messages), keeping records of the
  * configured stream. Reference: `AirbyteDataObject.scala:66-195` (242 LoC,
  * docker runner + protocol parse). The `cmd` is any command emitting the
  * protocol on stdout (docker run …, or a script — tested with a stub). */
case class AirbyteDataObject(
    id: String, cmd: Seq[String], streamName: String,
    schema: Option[StructType] = None)
  extends DataObject with CanCreateDataFrame with CanCreateIncrementalOutput {

  private var state: Option[String] = None
  override def setState(s: Option[String])(implicit ctx: ActionPipelineContext): Unit = state = s
  override def getState: Option[String] = state

  override def getDataFrame(partitionValues: Seq[PartitionValues] = Seq.empty)
                           (implicit ctx: ActionPipelineContext): DataFrame = {
    val spark = ctx.spark
    import spark.implicits._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    // stderr merges into stdout: a connector logging more than the OS
    // pipe buffer to an undrained stderr would block, deadlocking the
    // read; non-JSON lines are filtered below anyway
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val records = scala.collection.mutable.ArrayBuffer.empty[String]
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream, UTF_8))
    try {
      var line = reader.readLine()
      while (line != null) {
        if (line.nonEmpty && line.startsWith("{")) {
          val msg = mapper.readTree(line)
          Option(msg.get("type")).map(_.asText) match {
            case Some("RECORD") =>
              val rec = msg.get("record")
              if (rec != null && Option(rec.get("stream")).exists(_.asText == streamName))
                records += rec.get("data").toString
            case Some("STATE") => state = Option(msg.get("state")).map(_.toString)
            case _ => () // LOG / SPEC / CATALOG / TRACE ignored
          }
        }
        line = reader.readLine()
      }
    } finally reader.close()
    val exit = proc.waitFor()
    require(exit == 0, s"AirbyteDataObject $id: connector exited with $exit")
    val ds: Dataset[String] = spark.createDataset(records.toSeq)
    schema.fold(spark.read.json(ds))(s => spark.read.schema(s).json(ds))
  }
}

/** File-reference layer: list/read/write opaque files on a remote system.
  * Reference models SFTP and webservice downloads as `FileRef` DataObjects
  * (`SFtpFileRefDataObject.scala`, 244 LoC). The transport abstracts the
  * protocol; `HadoopFileRefTransport` covers local/HDFS/S3A paths, an SFTP
  * transport plugs in the same interface (needs an ssh jar at runtime). */
case class FileRef(path: String, size: Long, modifiedAt: Long)
trait FileRefTransport {
  def list(pattern: String): Seq[FileRef]
  def open(path: String): java.io.InputStream
  def put(path: String, in: java.io.InputStream): Unit
}
class HadoopFileRefTransport(conf: org.apache.hadoop.conf.Configuration)
  extends FileRefTransport {
  import org.apache.hadoop.fs.Path
  override def list(pattern: String): Seq[FileRef] = {
    val p = new Path(pattern)
    val fs = p.getFileSystem(conf)
    Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
      .filter(_.isFile)
      .map(s => FileRef(s.getPath.toString, s.getLen, s.getModificationTime))
  }
  override def open(path: String): java.io.InputStream =
    new Path(path).getFileSystem(conf).open(new Path(path))
  override def put(path: String, in: java.io.InputStream): Unit = {
    val p = new Path(path)
    val out = p.getFileSystem(conf).create(p, true)
    try org.apache.commons.io.IOUtils.copy(in, out) finally out.close()
  }
}

/** Config seam for [[FileRefDataObject]]: resolves the protocol
  * dependency by class name (an SFTP transport where the ssh jar is on
  * the runtime classpath, the Hadoop transport by default — the
  * reference's SFtpFileRefDataObject binds its transport through a
  * connection config the same way,
  * `sdl-core/.../connection/SFtpFileRefConnection.scala`). */
trait FileRefTransportProvider {
  def create(conf: org.apache.hadoop.conf.Configuration,
             options: Map[String, String]): FileRefTransport
}

object FileRefDataObject {
  /** resolve `transportClassName` at CONFIG-PARSE time; absent, the
    * Hadoop transport covers local/HDFS/S3A patterns */
  def fromClassName(id: String, pattern: String,
                    transportClassName: Option[String] = None,
                    options: Map[String, String] = Map.empty,
                    targetDir: Option[String] = None): FileRefDataObject = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val transport = transportClassName match {
      case None => new HadoopFileRefTransport(conf)
      case Some(cn) =>
        try Class.forName(cn).getDeclaredConstructor().newInstance()
          .asInstanceOf[FileRefTransportProvider].create(conf, options)
        catch {
          case e: ClassNotFoundException => throw new IllegalArgumentException(
            s"DataObject $id: transport class '$cn' not found", e)
          case e: ClassCastException => throw new IllegalArgumentException(
            s"DataObject $id: '$cn' does not implement graft.sources.FileRefTransportProvider", e)
        }
    }
    FileRefDataObject(id, pattern, transport, targetDir)
  }
}

/** FileRef DataObject over any transport: the SFTP-shaped surface
  * (list/transfer, incremental by modification time) without a protocol
  * dependency baked in. */
case class FileRefDataObject(
    id: String, pattern: String, transport: FileRefTransport,
    targetDir: Option[String] = None)
  extends DataObject with CanCreateIncrementalOutput {

  private var state: Option[String] = None
  override def setState(s: Option[String])(implicit ctx: ActionPipelineContext): Unit = state = s
  override def getState: Option[String] = state

  def listFiles: Seq[FileRef] = {
    val all = transport.list(pattern)
    state.map(_.toLong).fold(all)(ts => all.filter(_.modifiedAt > ts))
  }

  /** copy listed files to `toDir` via the transports; returns transferred refs */
  def transferTo(other: FileRefDataObject): Seq[FileRef] = {
    val dir = other.targetDir.getOrElse(
      throw new IllegalArgumentException(s"FileRefDataObject ${other.id}: targetDir required as transfer destination"))
    val files = listFiles
    // basenames must be unique in the flat target: a glob like
    // '*/data.csv' matches N same-named files — flattening would keep only
    // the last AND advance the watermark past the silently-lost ones
    val names = files.map(f => f.path.substring(f.path.lastIndexOf('/') + 1))
    val dupes = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    require(dupes.isEmpty,
      s"FileRefDataObject $id: transfer would flatten ${dupes.size} duplicate filename(s) " +
        s"(${dupes.take(3).mkString(",")}…) into ${other.id} — files would overwrite each other; " +
        "narrow the pattern or transfer per subdirectory")
    files.zip(names).foreach { case (f, name) =>
      val in = transport.open(f.path)
      try other.transport.put(s"${dir.stripSuffix("/")}/$name", in) finally in.close()
    }
    if (files.nonEmpty) state = Some(files.map(_.modifiedAt).max.toString)
    files
  }
}

/** Kafka topic as batch + streaming source/sink. Maps 1:1 to Spark's kafka
  * source options; key/value decoded as string, JSON, Avro (`from_avro`
  * with an explicit writer schema) or Confluent-framed Avro
  * (`avro-registry`: 1-byte magic + 4-byte big-endian schema id header,
  * id resolved against `schemaRegistry`, every known schema aligned to the
  * LATEST one — the engine-side form of the reference's
  * `KafkaColumnType.Avro` / `AvroSchemaRegistry`,
  * `sdl-kafka/.../KafkaTopicDataObject.scala:129-151`; the live REST
  * registry client is out-of-env, so the id→schema map is provided in
  * config, which is also what an offline archive re-process wants).
  * Reference: `sdl-kafka/.../KafkaTopicDataObject.scala:102-230`. NOTE:
  * requires the spark-sql-kafka connector jars on the runtime classpath
  * (not present in the offline test environment, so the broker surface is
  * compile-checked and option-mapping-tested only; decode paths are
  * exercised over wire archives). */
case class KafkaTopicDataObject(
    id: String, topic: String, brokers: String,
    keyType: String = "string",   // string | binary | avro
    valueType: String = "string", // string | binary | json | avro | avro-registry
    valueSchema: Option[StructType] = None,
    /** Avro writer schema JSON for `valueType=avro` / `keyType=avro`. */
    valueAvroSchema: Option[String] = None,
    keyAvroSchema: Option[String] = None,
    /** schema-id → Avro schema JSON for `valueType=avro-registry`
      * (Confluent wire framing); the highest id is the reader schema. */
    schemaRegistry: Map[Int, String] = Map.empty,
    /** columns to surface on read (reference `selectCols`, default there
      * key+value; empty here = all of key/value/topic/partition/offset/
      * timestamp). `datePartitionCol` is always included when set. */
    selectCols: Seq[String] = Seq.empty,
    /** derived date partition column from the frame timestamp (reference
      * `datePartitionCol` — used to partition topic archives by day). */
    datePartitionCol: Option[String] = None,
    datePartitionFormat: String = "yyyyMMdd",
    startingOffsets: String = "earliest",
    endingOffsets: String = "latest",
    batchReadMaxOffsetsPerTrigger: Option[Long] = None,
    kafkaOptions: Map[String, String] = Map.empty,
    /** When set, batch reads come from a parquet ARCHIVE of wire frames at
      this path instead of the broker (offline re-processing of archived
      topics); the offset-range/decode semantics are identical. */
    archivePath: Option[String] = None)
  extends DataObject with CanCreateDataFrame with CanWriteDataFrame
  with CanCreateStreamingDataFrame with CanWriteStreamingDataFrame
  with CanCreateIncrementalOutput {

  /** committed consumer offsets (KafkaStateIncrementalMode) — an
    * endingOffsets-shaped JSON spec, exclusive upper bounds */
  @transient private var committedOffsets: Option[String] = None
  override def setState(state: Option[String])(implicit ctx: ActionPipelineContext): Unit =
    committedOffsets = state
  override def getState: Option[String] = committedOffsets

  private[graft] def readOptions: Map[String, String] =
    Map("kafka.bootstrap.servers" -> brokers, "subscribe" -> topic,
      "startingOffsets" -> startingOffsets, "endingOffsets" -> endingOffsets) ++
      batchReadMaxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString) ++ kafkaOptions

  private def sqlTypeOf(avroJson: String): StructType =
    org.apache.spark.sql.avro.SchemaConverters
      .toSqlType(new org.apache.avro.Schema.Parser().parse(avroJson))
      .dataType.asInstanceOf[StructType]

  /** Confluent-framed decode: strip the 5-byte header, dispatch on the
    * schema id against `schemaRegistry`, align every writer schema's
    * struct to the LATEST registry schema (added fields null-fill — the
    * backward-compatible evolution the reference's registry connector
    * performs). Unknown ids and bad magic bytes fail LOUDLY per row via
    * raise_error, never silently null. All plain column expressions —
    * codegen'd, no UDFs. */
  private def registryDecode(c: String): Column = {
    require(schemaRegistry.nonEmpty,
      s"KafkaTopicDataObject $id: valueType=avro-registry requires schemaRegistry")
    val latestId = schemaRegistry.keys.max
    val reader = sqlTypeOf(schemaRegistry(latestId))
    val payload = expr(s"substring($c, 6, 2147483647)")
    val sid = conv(hex(expr(s"substring($c, 2, 4)")), 16, 10).cast("int")
    val magicOk = expr(s"substring($c, 1, 1)") === lit(Array[Byte](0))
    val dispatch = schemaRegistry.toSeq.sortBy(_._1).map { case (wid, schemaJson) =>
      val d = org.apache.spark.sql.avro.GraftAvroFunctions.from_avro(payload, schemaJson)
      val writerFields = sqlTypeOf(schemaJson).fieldNames.toSet
      val aligned = struct(reader.fields.toSeq.map { f =>
        (if (writerFields.contains(f.name)) d.getField(f.name).cast(f.dataType)
         else lit(null).cast(f.dataType)).as(f.name)
      }: _*)
      (wid, aligned)
    }.foldRight(raise_error(concat(
        lit(s"KafkaTopicDataObject $id: schema id "), sid.cast("string"),
        lit(s" not in registry ${schemaRegistry.keys.toSeq.sorted.mkString("[", ",", "]")}")))
      .cast(reader): Column) {
      case ((wid, aligned), acc) => when(sid === wid, aligned).otherwise(acc)
    }
    when(!magicOk, raise_error(lit(s"KafkaTopicDataObject $id: bad confluent magic byte")).cast(reader))
      .otherwise(dispatch)
  }

  private def decodeCol(c: String, typ: String, avroSchema: Option[String]): Column = typ match {
    case "string" => col(c).cast("string").as(c)
    case "json" =>
      val s = valueSchema.getOrElse(
        throw new IllegalArgumentException(s"KafkaTopicDataObject $id: valueType=json requires valueSchema"))
      from_json(col(c).cast("string"), s).as(c)
    case "avro" =>
      val s = avroSchema.getOrElse(throw new IllegalArgumentException(
        s"KafkaTopicDataObject $id: ${c}Type=avro requires ${c}AvroSchema"))
      org.apache.spark.sql.avro.GraftAvroFunctions.from_avro(col(c), s).as(c)
    case "avro-registry" => registryDecode(c).as(c)
    case _ => col(c)
  }

  private[graft] def decode(df: DataFrame): DataFrame = {
    val base = df.select(decodeCol("key", keyType, keyAvroSchema),
      decodeCol("value", valueType, valueAvroSchema),
      col("topic"), col("partition"), col("offset"), col("timestamp"))
    val withDate = datePartitionCol.fold(base)(c =>
      base.withColumn(c, date_format(col("timestamp"), datePartitionFormat)))
    if (selectCols.isEmpty) withDate
    else withDate.select((selectCols ++ datePartitionCol.filterNot(selectCols.contains))
      .map(c => col(s"`$c`")): _*)
  }

  override def getDataFrame(partitionValues: Seq[PartitionValues] = Seq.empty)
                           (implicit ctx: ActionPipelineContext): DataFrame =
    archivePath match {
      case Some(p) => decodeWire(ctx.spark.read.parquet(p))
      case None => decode(ctx.spark.read.format("kafka").options(readOptions).load())
    }

  /** Current end offsets (exclusive) as an endingOffsets-shaped spec. On
    * the archive path this is one tiny per-partition max agg; against a
    * broker it maps to the consumer end-offsets API at runtime. */
  def currentEndOffsets(implicit ctx: ActionPipelineContext): String =
    currentEndOffsets(None)

  /** End offsets bounded by a max frame timestamp (the reference's
    * `delayedMaxTimestampExpr` — `KafkaStateIncrementalMode.scala:39`):
    * per partition, the highest offset whose `timestamp <= maxTimestamp`
    * plus one (the broker-side analogue is `offsetsForTimes`). A
    * partition with no qualifying frames gets end 0 → empty range, never
    * unbounded. */
  def currentEndOffsets(maxTimestamp: Option[java.sql.Timestamp])
                       (implicit ctx: ActionPipelineContext): String = {
    val p = archivePath.getOrElse(throw new UnsupportedOperationException(
      s"DataObject $id: end-offset snapshot needs the archive path in-env (broker consumer API at runtime)"))
    val hi = maxTimestamp
      .map(t => max(when(col("timestamp") <= lit(t), col("offset"))))
      .getOrElse(max(col("offset")))
    val ends = ctx.spark.read.parquet(p).groupBy(col("partition"))
      .agg(hi.as("hi"))
      .collect().map(r => (r.getInt(0), if (r.isNullAt(1)) 0L else r.getLong(1) + 1))
      .sortBy(_._1)
    ends.map { case (part, end) => s""""$part":$end""" }
      .mkString(s"""{"$topic":{""", ",", "}}")
  }

  /** Bounded batch read [starting, ending) — the consume step of
    * [[graft.operators.modes.KafkaStateIncrementalMode]]. */
  def getDataFrameBetween(starting: String, ending: String)
                         (implicit ctx: ActionPipelineContext): DataFrame =
    copy(startingOffsets = starting, endingOffsets = ending).getDataFrame()

  /** Offset bounds from a `startingOffsets`/`endingOffsets` JSON spec
    * (`{"topic":{"0":23,"1":-1}}`), restricted to this object's topic.
    * `earliest`/`latest` → no bounds. Reference
    * `KafkaTopicDataObject.scala:102-230` does this broker-side; the
    * engine-side form below makes the same semantics applicable to
    * wire-format archives (parquet dumps of kafka frames), which is also
    * how offset-bounded re-processing works without re-reading the broker. */
  private[graft] def offsetBounds(spec: String): Map[Int, Long] = spec match {
    case "earliest" | "latest" => Map.empty
    case js =>
      import scala.jdk.CollectionConverters._
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(js)
      Option(root.get(topic)).map { parts =>
        parts.fields().asScala.map(e => e.getKey.toInt -> e.getValue.asLong).toMap
      }.getOrElse(Map.empty)
  }

  /** Kafka range semantics over a wire frame: starting offset inclusive,
    * ending offset exclusive, -1 = unbounded; partitions absent from the
    * spec are unbounded. A plain column predicate, so it pushes down to the
    * parquet scan of an archived wire dump. */
  private[graft] def offsetRangeFilter: Column = {
    val startOk = offsetBounds(startingOffsets).filter(_._2 >= 0)
      .foldLeft(lit(true)) { case (acc, (p, o)) =>
        acc && (col("partition") =!= p || col("offset") >= o) }
    val endOk = offsetBounds(endingOffsets).filter(_._2 >= 0)
      .foldLeft(lit(true)) { case (acc, (p, o)) =>
        acc && (col("partition") =!= p || col("offset") < o) }
    startOk && endOk
  }

  /** Decode a WIRE-shaped frame (the exact schema the kafka source emits:
    * key/value binary, topic, partition, offset, timestamp) applying the
    * configured offset ranges — the broker-free half of [[getDataFrame]],
    * usable on archived wire dumps. */
  def decodeWire(wire: DataFrame): DataFrame = decode(wire.where(offsetRangeFilter))

  /** Offset-range BATCHING over a wire frame: splits the configured range
    * into chunks of at most `maxOffsets` per partition (the batch-read
    * analogue of `maxOffsetsPerTrigger`), returning per-batch
    * starting/ending specs in the same JSON form the kafka source takes.
    * One tiny per-partition min/max agg (numPartitions rows) plans the
    * chunking; each chunk is then a pushed-down range scan. */
  def wireBatchSpecs(wire: DataFrame, maxOffsets: Long): Seq[(String, String)] = {
    // one small agg: per-partition bounded lo/hi PLUS which partitions
    // exist at all — partitions with no rows inside the configured range
    // must appear in every chunk spec as an EMPTY range (absent would
    // mean unbounded, silently re-admitting excluded partitions)
    val ranges = wire.groupBy(col("partition"))
      .agg(min(when(offsetRangeFilter, col("offset"))).as("lo"),
           max(when(offsetRangeFilter, col("offset"))).as("hi"))
      .collect().map(r => (r.getInt(0),
        if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2))))).sortBy(_._1)
    val nBatches = ranges.collect { case (_, Some((lo, hi))) =>
      ((hi - lo) / maxOffsets + 1).toInt }.maxOption.getOrElse(0)
    (0 until nBatches).map { b =>
      def spec(f: (Long, Long) => Long): String =
        ranges.map {
          case (p, Some((lo, hi))) => s""""$p":${math.min(f(lo, hi), hi + 1)}"""
          case (p, None) => s""""$p":0"""
        }.mkString(s"""{"$topic":{""", ",", "}}")
      (spec((lo, _) => lo + b * maxOffsets), spec((lo, _) => lo + (b + 1) * maxOffsets))
    }
  }

  override def getStreamingDataFrame(extraOptions: Map[String, String], schema: Option[StructType])
                                    (implicit ctx: ActionPipelineContext): DataFrame =
    decode(ctx.spark.readStream.format("kafka")
      .options(readOptions - "endingOffsets" ++ extraOptions).load())

  override def writeDataFrame(df: DataFrame, partitionValues: Seq[PartitionValues] = Seq.empty,
                              saveMode: Option[SdlSaveMode] = None)
                             (implicit ctx: ActionPipelineContext): ActionMetrics = {
    val t0 = System.currentTimeMillis()
    val obs = org.apache.spark.sql.Observation(s"graft_kafka_${id}_${System.nanoTime()}")
    encodeForWrite(df).observe(obs, count(lit(1)).as("records_written"))
      .write.format("kafka")
      .option("kafka.bootstrap.servers", brokers).option("topic", topic)
      .options(kafkaOptions).save()
    ActionMetrics(
      try obs.get("records_written").asInstanceOf[Long] catch { case _: Throwable => -1L },
      System.currentTimeMillis() - t0)
  }

  override def writeStreamingDataFrame(df: DataFrame, trigger: org.apache.spark.sql.streaming.Trigger,
                                       options: Map[String, String], checkpointLocation: String,
                                       queryName: String, outputMode: String)
                                      (implicit ctx: ActionPipelineContext): org.apache.spark.sql.streaming.StreamingQuery =
    encodeForWrite(df).writeStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers).option("topic", topic)
      .option("checkpointLocation", checkpointLocation)
      .options(kafkaOptions ++ options)
      .queryName(queryName).outputMode(outputMode).trigger(trigger).start()

  /** Write-side encode, symmetric with [[decode]]: JSON by default; Avro
    * (`to_avro` under the configured writer schema) for `valueType=avro`;
    * Confluent framing (header with the LATEST registry id + avro payload)
    * for `avro-registry` — so an archive written by this object is
    * decodable by it. */
  private[graft] def encodeForWrite(df: DataFrame): DataFrame = {
    val payloadCols = df.columns.filterNot(_ == "key").map(col)
    val record = struct((if (payloadCols.nonEmpty) payloadCols else df.columns.map(col)).toIndexedSeq: _*)
    val value = valueType match {
      case "avro" =>
        val s = valueAvroSchema.getOrElse(throw new IllegalArgumentException(
          s"KafkaTopicDataObject $id: valueType=avro requires valueAvroSchema"))
        org.apache.spark.sql.avro.GraftAvroFunctions.to_avro(record, s)
      case "avro-registry" =>
        require(schemaRegistry.nonEmpty,
          s"KafkaTopicDataObject $id: valueType=avro-registry requires schemaRegistry")
        val latestId = schemaRegistry.keys.max
        val header = Array[Byte](0,
          (latestId >> 24).toByte, (latestId >> 16).toByte, (latestId >> 8).toByte, latestId.toByte)
        concat(lit(header),
          org.apache.spark.sql.avro.GraftAvroFunctions.to_avro(record, schemaRegistry(latestId)))
      case _ => to_json(record)
    }
    df.select((if (df.columns.contains("key")) col("key").cast("string") else lit(null).cast("string")).as("key"),
      value.as("value"))
  }
}

/** One received queue message: text payload plus a CLIENT_ACKNOWLEDGE-style
  * ack — acknowledging a message acknowledges EVERY message delivered on
  * the session so far (the javax.jms contract the reference relies on:
  * `sdl-jms/.../SynchronousJmsReceiver.scala:96-99` acks `buffer.last`). */
trait JmsMessage { def text: String; def acknowledge(): Unit }

/** Minimal consumer surface the receiver loop needs (javax.jms
  * MessageConsumer shape); `receive` returns null when nothing arrived
  * within `maxWaitMs`. The factory abstracts the broker dependency — a
  * javax.jms session adapter plugs in where the jar is available, a
  * loopback stub where it is not. */
trait JmsConsumer extends AutoCloseable { def receive(maxWaitMs: Long): JmsMessage }

/** Config seam for [[JmsDataObject]]: resolves the broker dependency by
  * class name, so a HOCON-only pipeline can wire a JMS source the way the
  * reference does (its config carries jndiContextFactory/providerUrl/
  * connectionFactory/queue, `sdl-jms/.../JmsDataObject.scala:40-58`; the
  * javax.jms jar is out-of-env here, so those connection params pass
  * through `options` to a provider implementation). */
trait JmsConsumerProvider { def create(options: Map[String, String]): JmsConsumer }

object JmsDataObject {
  /** resolve `className` to a [[JmsConsumerProvider]] at CONFIG-PARSE
    * time — a typo fails the parse, not the first exec (the
    * CustomDfCreator discipline) */
  def fromClassName(id: String, className: String,
                    options: Map[String, String] = Map.empty,
                    batchSize: Int = 100000, maxWaitMs: Long = 1000L,
                    maxBatchAgeMs: Long = 120000L, txBatchSize: Int = 100,
                    schema: Option[StructType] = None): JmsDataObject = {
    val provider =
      try Class.forName(className).getDeclaredConstructor().newInstance()
        .asInstanceOf[JmsConsumerProvider]
      catch {
        case e: ClassNotFoundException => throw new IllegalArgumentException(
          s"DataObject $id: provider class '$className' not found", e)
        case e: ClassCastException => throw new IllegalArgumentException(
          s"DataObject $id: '$className' does not implement graft.sources.JmsConsumerProvider", e)
      }
    JmsDataObject(id, () => provider.create(options),
      batchSize, maxWaitMs, maxBatchAgeMs, txBatchSize, schema)
  }
}

/** JMS queue reader with the reference's synchronous batch-receive
  * semantics (`sdl-jms/.../SynchronousJmsReceiver.scala:62-125`,
  * `JmsDataObject.scala`): poll the consumer with `maxWaitMs` per
  * message, collect until `batchSize` messages arrived or `maxBatchAgeMs`
  * elapsed, acknowledge every `txBatchSize` collected messages (an
  * intermediate commit bounds redelivery after a crash) and once more
  * when the batch is stored. Payloads parse as JSON rows. */
case class JmsDataObject(id: String, consumerFactory: () => JmsConsumer,
                         batchSize: Int = 100000,
                         maxWaitMs: Long = 1000L,
                         maxBatchAgeMs: Long = 120000L,
                         txBatchSize: Int = 100,
                         schema: Option[StructType] = None)
  extends DataObject with CanCreateDataFrame {
  override def getDataFrame(partitionValues: Seq[PartitionValues] = Seq.empty)
                           (implicit ctx: ActionPipelineContext): DataFrame = {
    val spark = ctx.spark
    import spark.implicits._
    val buffer = scala.collection.mutable.ArrayBuffer.empty[JmsMessage]
    var lastCommitted = 0
    val start = System.currentTimeMillis()
    val consumer = consumerFactory()
    try {
      var running = true
      while (running) {
        val msg = if (maxWaitMs > 0) consumer.receive(maxWaitMs) else consumer.receive(0L)
        if (msg != null) buffer += msg
        if (System.currentTimeMillis() - start >= maxBatchAgeMs || buffer.size >= batchSize)
          running = false
        else if (lastCommitted + txBatchSize == buffer.size) {
          buffer.last.acknowledge()
          lastCommitted = buffer.size
        }
      }
      // batch complete: the final ack commits the tail past the last
      // intermediate commit (cumulative CLIENT_ACKNOWLEDGE semantics)
      if (buffer.nonEmpty) buffer.last.acknowledge()
    } finally consumer.close()
    val ds: Dataset[String] = spark.createDataset(buffer.map(_.text).toSeq)
    schema.fold(spark.read.json(ds))(s => spark.read.schema(s).json(ds))
  }
}
