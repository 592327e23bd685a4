package graft.operators

import graft.core._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** 1:1 DataFrame transformer, chainable inside an action. Reference:
  * `sdl-core/workflow/action/generic/transformer/GenericDfTransformerDef.scala`.
  * Transformers must stay declarative (Column expressions, no collect) so
  * the whole chain folds into ONE Catalyst plan — at 100 TB a chain of ten
  * transformers still costs a single scan.
  */
trait DfTransformer extends Serializable {
  def name: String = getClass.getSimpleName
  def transform(df: DataFrame, dataObjectId: String = "")(implicit ctx: ActionPipelineContext): DataFrame
  /** Inverse mapping of output partition values to input partition values
    * (identity by default), reference `GenericDfTransformerDef.transformPartitionValues`. */
  def transformPartitionValues(pvs: Seq[PartitionValues]): Seq[PartitionValues] = pvs
}

/** Many-to-many transformer (N named inputs → M named outputs). Reference:
  * `GenericDfsTransformer` / `SQLDfsTransformer.scala`. */
trait DfsTransformer extends Serializable {
  def name: String = getClass.getSimpleName
  def transform(dfs: Map[String, DataFrame])(implicit ctx: ActionPipelineContext): Map[String, DataFrame]
}

/** Substitute %{token} with runtime options + standard tokens. Reference:
  * SQLDfTransformer's `%{inputViewName}` + runtimeOptions substitution
  * (`SQLDfTransformer.scala:56-68`). */
private[graft] object TokenSubstitution {
  def apply(s: String, tokens: Map[String, String]): String =
    tokens.foldLeft(s) { case (acc, (k, v)) => acc.replace(s"%{$k}", v) }
}

/** SQL over the input registered as a temp view. This is where general
  * relational algebra (joins/aggregations/windows) enters the pipeline —
  * delegated wholesale to Spark SQL / Catalyst, as in the reference
  * (`SQLDfTransformer.scala:56-68`).
  */
case class SQLDfTransformer(sql: String, inputViewName: Option[String] = None)
  extends DfTransformer {
  override def transform(df: DataFrame, dataObjectId: String = "")(implicit ctx: ActionPipelineContext): DataFrame = {
    val view = inputViewName.getOrElse(
      if (dataObjectId.nonEmpty) SqlViews.sanitize(dataObjectId) else "input")
    val resolved = TokenSubstitution(sql, ctx.runtimeOptions + ("inputViewName" -> view))
    SqlViews.withViews(ctx.spark, Seq(view -> df))(ctx.spark.sql(resolved))
  }
}

/** N:M SQL transformer: all inputs become temp views; one SQL per output.
  * Reference `SQLDfsTransformer.scala`. */
case class SQLDfsTransformer(outputSql: Map[String, String]) extends DfsTransformer {
  override def transform(dfs: Map[String, DataFrame])(implicit ctx: ActionPipelineContext): Map[String, DataFrame] = {
    val views = dfs.toSeq.map { case (id, df) => SqlViews.sanitize(id) -> df }
    SqlViews.withViews(ctx.spark, views) {
      outputSql.map { case (out, sql) =>
        out -> ctx.spark.sql(TokenSubstitution(sql, ctx.runtimeOptions))
      }
    }
  }
}

/** Temp-view registration for the SQL transformers. Temp views live in the
  * SparkSession-wide catalog, so two actions running concurrently in one
  * ActionDAGRun pool that both register a view for dataObject `src` race:
  * action A's `spark.sql` could resolve the name to action B's DataFrame.
  * `spark.sql` analyzes EAGERLY (the returned DataFrame's plan is bound at
  * call time), so making register+analyze atomic under one JVM-wide lock is
  * sufficient — after `withViews` returns, later replacements can't affect
  * the resolved plan. */
private[graft] object SqlViews {
  private val lock = new Object
  def sanitize(id: String): String = id.replaceAll("[^A-Za-z0-9_]", "_")
  def withViews[T](spark: org.apache.spark.sql.SparkSession,
                   views: Seq[(String, DataFrame)])(body: => T): T = {
    // distinct ids may mangle to one view name ('a-b' and 'a_b' → 'a_b'):
    // within one transform that is silent mis-wiring — fail loudly
    val dup = views.groupBy(_._1).collect { case (n, vs) if vs.size > 1 => n }
    require(dup.isEmpty,
      s"temp view name collision after sanitizing dataObject ids: ${dup.mkString(", ")}")
    lock.synchronized {
      views.foreach { case (n, df) => df.createOrReplaceTempView(n) }
      body
    }
  }
}

/** Filter by SQL expression. Reference `FilterTransformer.scala:42-49`. */
case class FilterTransformer(filterClause: String) extends DfTransformer {
  override def transform(df: DataFrame, dataObjectId: String = "")(implicit ctx: ActionPipelineContext): DataFrame =
    df.where(expr(filterClause))
}

/** Add columns from SQL expressions (runId, partition values, derived
  * columns…). Reference `AdditionalColumnsTransformer.scala:40`. */
case class AdditionalColumnsTransformer(additionalColumns: Map[String, String]) extends DfTransformer {
  override def transform(df: DataFrame, dataObjectId: String = "")(implicit ctx: ActionPipelineContext): DataFrame = {
    val withTokens = additionalColumns.view.mapValues(e =>
      TokenSubstitution(e, ctx.runtimeOptions + ("runId" -> ctx.runId.toString))).toMap
    withTokens.foldLeft(df) { case (acc, (name, e)) => acc.withColumn(name, expr(e)) }
  }
}

/** Drop listed columns. Reference `BlacklistTransformer.scala:36`. */
case class BlacklistTransformer(columnBlacklist: Seq[String]) extends DfTransformer {
  override def transform(df: DataFrame, dataObjectId: String = "")(implicit ctx: ActionPipelineContext): DataFrame =
    df.drop(columnBlacklist: _*)
}

/** Keep only listed columns. Reference `WhitelistTransformer.scala:37`. */
case class WhitelistTransformer(columnWhitelist: Seq[String]) extends DfTransformer {
  override def transform(df: DataFrame, dataObjectId: String = "")(implicit ctx: ActionPipelineContext): DataFrame =
    df.select(columnWhitelist.map(col): _*)
}

/** camelCase→snake_case, ascii-fold, strip non-SQL chars. Reference
  * `StandardizeColNamesTransformer.scala:41` with impl
  * `GenericDataFrame.standardizeColNames:175-193`. */
case class StandardizeColNamesTransformer(
    camelCaseToLower: Boolean = true, normalizeToAscii: Boolean = true,
    removeNonStandardSQLNameChars: Boolean = true) extends DfTransformer {
  private def normalize(n: String): String = {
    var s = n
    if (normalizeToAscii) {
      s = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
        .replaceAll("\\p{M}", "")
    }
    if (camelCaseToLower)
      s = s.replaceAll("([a-z0-9])([A-Z])", "$1_$2").toLowerCase
    if (removeNonStandardSQLNameChars)
      // case-aware: with camelCaseToLower=false uppercase letters are
      // legitimate name chars, not chars to strip ("MyCol" must not
      // become "yol")
      s = s.replaceAll(if (camelCaseToLower) "[^a-z0-9_]" else "[^a-zA-Z0-9_]", "")
    s
  }
  override def transform(df: DataFrame, dataObjectId: String = "")(implicit ctx: ActionPipelineContext): DataFrame =
    df.select(df.columns.map(c => col(s"`$c`").as(normalize(c))).toSeq: _*)
}

/** Downcast/standardize datatypes (decimal→int/long/float/double where
  * lossless). Reference `StandardizeSparkDatatypesTransformer.scala`. */
case class StandardizeDatatypesTransformer() extends DfTransformer {
  private def target(dt: DataType): DataType = dt match {
    case d: DecimalType if d.scale == 0 && d.precision <= 9 => IntegerType
    case d: DecimalType if d.scale == 0 && d.precision <= 18 => LongType
    case d: DecimalType => DoubleType
    case ShortType | ByteType => IntegerType
    case FloatType => DoubleType
    case other => other
  }
  override def transform(df: DataFrame, dataObjectId: String = "")(implicit ctx: ActionPipelineContext): DataFrame =
    df.select(df.schema.fields.map { f =>
      val t = target(f.dataType)
      if (t == f.dataType) col(s"`${f.name}`") else col(s"`${f.name}`").cast(t).as(f.name)
    }.toSeq: _*)
}

/** Row-level validation rules appended as an `errors` array column.
  * Reference `DataValidationTransformer.scala:41-67`. */
case class ValidationRule(condition: String, errorMsg: Option[String] = None) {
  def msg: String = errorMsg.getOrElse(s"Validation rule failed: $condition")
}
case class DataValidationTransformer(rules: Seq[ValidationRule], errorsColumn: String = "errors")
  extends DfTransformer {
  override def transform(df: DataFrame, dataObjectId: String = "")(implicit ctx: ActionPipelineContext): DataFrame = {
    val errs = rules.map(r => when(!coalesce(expr(r.condition), lit(false)), lit(r.msg)))
    // array of failed-rule messages with nulls compacted (reference uses
    // array_construct_compact)
    df.withColumn(errorsColumn, filter(array(errs: _*), _.isNotNull))
  }
}

/** Keep best record per key by ranking expression. Reference
  * `DeduplicateTransformer.scala:43`.
  *
  * Scale: one shuffle on the key; `row_number` over a composite sort is
  * Tungsten-friendly. For heavily skewed keys AQE skew handling applies
  * because this compiles to a plain window.
  */
case class DeduplicateTransformer(keyColumns: Seq[String], rankingExpression: String,
    descending: Boolean = true) extends DfTransformer {
  override def transform(df: DataFrame, dataObjectId: String = "")(implicit ctx: ActionPipelineContext): DataFrame = {
    val ord = if (descending) expr(rankingExpression).desc else expr(rankingExpression).asc
    val w = Window.partitionBy(keyColumns.map(col): _*).orderBy(ord)
    val rnCol = "dl_rn_" + math.abs(rankingExpression.hashCode)
    df.withColumn(rnCol, row_number().over(w)).where(col(rnCol) === 1).drop(rnCol)
  }
}

/** null → default value per type. Reference `ConvertNullValuesTransformer.scala:38`. */
case class ConvertNullValuesTransformer(
    valueForString: String = "", valueForNumber: Int = 0,
    columnBlacklist: Seq[String] = Seq.empty) extends DfTransformer {
  override def transform(df: DataFrame, dataObjectId: String = "")(implicit ctx: ActionPipelineContext): DataFrame = {
    val cols = df.schema.fields.filterNot(f => columnBlacklist.contains(f.name))
    val stringCols = cols.collect { case f if f.dataType == StringType => f.name }
    val numCols = cols.collect { case f if f.dataType.isInstanceOf[NumericType] => f.name }
    df.na.fill(valueForString, stringCols).na.fill(valueForNumber, numCols)
  }
}

/** Recursively flatten structs to dot-names and explode arrays. Reference
  * `SparkFlattenDfTransformer.scala:64-79`. */
case class FlattenTransformer(explodeArrays: Boolean = true, separator: String = "_") extends DfTransformer {
  override def transform(df: DataFrame, dataObjectId: String = "")(implicit ctx: ActionPipelineContext): DataFrame = {
    def step(d: DataFrame): Option[DataFrame] = {
      d.schema.fields.collectFirst {
        case f if f.dataType.isInstanceOf[StructType] =>
          val st = f.dataType.asInstanceOf[StructType]
          val others = d.columns.filterNot(_ == f.name).map(c => col(s"`$c`"))
          d.select(others.toSeq ++ st.fieldNames.map(n =>
            col(s"`${f.name}`.`$n`").as(s"${f.name}$separator$n")): _*)
        case f if explodeArrays && f.dataType.isInstanceOf[ArrayType] =>
          d.withColumn(f.name, explode_outer(col(s"`${f.name}`")))
      }
    }
    var cur = df
    var next = step(cur)
    while (next.isDefined) { cur = next.get; next = step(cur) }
    cur
  }
}

/** Repartition before write: tasks per partition via hash(keyCols) % n.
  * Reference `SparkRepartitionTransformer.scala` + `SparkRepartitionDef.scala:50`. */
case class RepartitionTransformer(numberOfTasksPerPartition: Int, keyCols: Seq[String] = Seq.empty)
  extends DfTransformer {
  override def transform(df: DataFrame, dataObjectId: String = "")(implicit ctx: ActionPipelineContext): DataFrame =
    if (keyCols.nonEmpty)
      df.repartition(numberOfTasksPerPartition, keyCols.map(col): _*)
    else df.repartition(numberOfTasksPerPartition)
}

/** Log schema + sample rows. Reference `DebugTransformer.scala`. */
case class DebugTransformer(numRows: Int = 5) extends DfTransformer {
  override def transform(df: DataFrame, dataObjectId: String = "")(implicit ctx: ActionPipelineContext): DataFrame = {
    // schema printing is driver-side and cheap; row sampling only outside Exec
    println(s"[DebugTransformer] $dataObjectId schema: ${df.schema.treeString}")
    df
  }
}

/** User Scala function transformer. Reference `ScalaClassSparkDfTransformer.scala`. */
case class ScalaFnDfTransformer(fn: (SparkSession, DataFrame) => DataFrame, override val name: String = "scalaFn")
  extends DfTransformer {
  override def transform(df: DataFrame, dataObjectId: String = "")(implicit ctx: ActionPipelineContext): DataFrame =
    fn(ctx.spark, df)
}

/** Typed Dataset transformer: DataFrame→Dataset[A]→Dataset[B]→DataFrame.
  * Reference `ScalaClassSparkDsTransformer.scala`. */
class TypedDsTransformer[A: org.apache.spark.sql.Encoder, B: org.apache.spark.sql.Encoder](
    fn: org.apache.spark.sql.Dataset[A] => org.apache.spark.sql.Dataset[B]) extends DfTransformer {
  override def transform(df: DataFrame, dataObjectId: String = "")(implicit ctx: ActionPipelineContext): DataFrame =
    fn(df.as[A]).toDF()
}

/** AES-GCM column encryption, key from caller (reference reads it from a
  * secret provider). Reference `EncryptColumnsTransformer.scala:43-61`.
  * Uses Spark's builtin `aes_encrypt`/`aes_decrypt` (codegen'd) instead of
  * the reference's Scala UDF — stays inside whole-stage codegen.
  */
case class EncryptColumnsTransformer(encryptColumns: Seq[String], key: String,
    mode: String = "GCM") extends DfTransformer {
  override def transform(df: DataFrame, dataObjectId: String = "")(implicit ctx: ActionPipelineContext): DataFrame =
    encryptColumns.foldLeft(df)((acc, c) =>
      acc.withColumn(c, base64(aes_encrypt(col(c).cast(StringType), lit(key), lit(mode)))))
}
case class DecryptColumnsTransformer(decryptColumns: Seq[String], key: String,
    mode: String = "GCM") extends DfTransformer {
  override def transform(df: DataFrame, dataObjectId: String = "")(implicit ctx: ActionPipelineContext): DataFrame =
    decryptColumns.foldLeft(df)((acc, c) =>
      acc.withColumn(c, aes_decrypt(unbase64(col(c)), lit(key), lit(mode)).cast(StringType)))
}

/** Apply a 1:1 transformer to selected inputs of an N:M action. Reference
  * `DfTransformerWrapperDfsTransformer.scala`. */
case class DfTransformerWrapper(transformer: DfTransformer, subFeedsToApply: Seq[String])
  extends DfsTransformer {
  override def transform(dfs: Map[String, DataFrame])(implicit ctx: ActionPipelineContext): Map[String, DataFrame] =
    dfs.map { case (id, df) =>
      id -> (if (subFeedsToApply.contains(id)) transformer.transform(df, id) else df)
    }
}
