package graft.operators

import graft.core._
import graft.sources.{DataObject, RawFileDataObject, SparkFileDataObject}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Runtime-compiled and typed custom logic. Reference:
  * `sdl-core/util/misc/CustomCodeUtil.scala` (toolbox compile of
  * user-provided Scala source), `ScalaCodeSparkDfTransformer.scala`,
  * `ScalaClassSparkDsNTo1Transformer.scala`.
  */
object CustomCode {
  import scala.tools.reflect.ToolBox
  private lazy val toolbox =
    scala.reflect.runtime.currentMirror.mkToolBox()
  private val cache = scala.collection.concurrent.TrieMap.empty[String, Any]

  /** compile a Scala source string to its value (e.g. a function literal);
    * compiled once per distinct source (toolbox compilation is expensive) */
  def compile[T](code: String): T =
    cache.getOrElseUpdate(code, {
      toolbox.eval(toolbox.parse(code))
    }).asInstanceOf[T]
}

/** Transformer from a Scala source string evaluating to
  * `(SparkSession, DataFrame) => DataFrame`. Reference
  * `ScalaCodeSparkDfTransformer.scala` (70 LoC). */
case class ScalaCodeDfTransformer(code: String, override val name: String = "scalaCode")
  extends DfTransformer {
  override def transform(df: DataFrame, dataObjectId: String = "")
                        (implicit ctx: ActionPipelineContext): DataFrame =
    CustomCode.compile[(SparkSession, DataFrame) => DataFrame](code)(ctx.spark, df)
}

/** Typed N-to-1 transformer: named inputs decoded to `Dataset[A]`/
  * `Dataset[B]`, combined to one typed output. Reference
  * `ScalaClassSparkDsNTo1Transformer.scala` (216 LoC) matches inputs by
  * type/name; here the mapping is explicit (inputA/inputB ids). */
class TypedDs2To1Transformer[A: org.apache.spark.sql.Encoder,
                             B: org.apache.spark.sql.Encoder,
                             C: org.apache.spark.sql.Encoder](
    inputA: String, inputB: String, outputId: String,
    fn: (SparkSession, Dataset[A], Dataset[B]) => Dataset[C])
  extends DfsTransformer {
  override def transform(dfs: Map[String, DataFrame])
                        (implicit ctx: ActionPipelineContext): Map[String, DataFrame] = {
    val a = dfs(inputA).as[A]
    val b = dfs(inputB).as[B]
    Map(outputId -> fn(ctx.spark, a, b).toDF())
  }
}

/** File-level transform: streams every input file through `transformFn`
  * into the output location, preserving names, with driver-side thread
  * parallelism. Reference `CustomFileAction.scala` (145 LoC). Intended for
  * control-plane file munging (unzip, re-encode); bulk row data belongs in
  * DataFrame actions. */
case class CustomFileAction(
    id: String, inputId: String, outputId: String,
    transformFn: (java.io.InputStream, java.io.OutputStream) => Unit,
    parallelism: Int = 4)
  extends Action {
  def inputIds: Seq[String] = Seq(inputId)
  def outputIds: Seq[String] = Seq(outputId)

  override def init(subFeeds: Seq[SubFeed])(implicit ctx: ActionPipelineContext): Seq[SubFeed] =
    Seq(SubFeed(outputId))

  override def exec(subFeeds: Seq[SubFeed])(implicit ctx: ActionPipelineContext): Seq[SubFeed] = {
    import org.apache.hadoop.fs.Path
    def pathOf(d: DataObject): Path = d match {
      case f: SparkFileDataObject => new Path(f.path)
      case r: RawFileDataObject => new Path(r.path)
      case other => throw new IllegalArgumentException(s"${other.id} is not file-based")
    }
    val conf = ctx.spark.sparkContext.hadoopConfiguration
    val (srcPath, dstPath) = (pathOf(ctx.registry.dataObject(inputId)),
      pathOf(ctx.registry.dataObject(outputId)))
    val (sfs, dfs) = (srcPath.getFileSystem(conf), dstPath.getFileSystem(conf))
    // (relativePath, absolutePath): output mirrors the input's directory
    // layout — flattening to basenames would let same-named files in
    // different subdirs (dt=A/data.csv, dt=B/data.csv) overwrite each other
    val srcUri = srcPath.toUri.getPath.stripSuffix("/")
    val files = {
      val it = sfs.listFiles(srcPath, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Path)]
      while (it.hasNext) {
        val f = it.next().getPath
        val rel = f.toUri.getPath.stripPrefix(srcUri).stripPrefix("/")
        // hidden/metadata filter applies to EVERY path component (a file
        // inside .staging/ or _temporary/ is metadata too)
        val hidden = rel.split('/').exists(c => c.startsWith("_") || c.startsWith("."))
        if (!hidden) buf += (rel -> f)
      }
      buf.toSeq
    }
    dfs.mkdirs(dstPath)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.max(1, parallelism))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      val futures = files.map { case (rel, f) =>
        scala.concurrent.Future {
          val in = sfs.open(f)
          val out = dfs.create(new Path(dstPath, rel), true)
          try transformFn(in, out) finally { in.close(); out.close() }
        }
      }
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures), scala.concurrent.duration.Duration.Inf)
    } finally pool.shutdown()
    Seq(SubFeed(outputId, metrics = Some(ActionMetrics(recordsWritten = files.size))))
  }
}
