package org.apache.spark.sql.graftshims

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Cast, Expression, Literal, Predicate}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.datasources.{DataSourceStrategy, FileIndex, FileStatusWithMetadata, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** A [[FileIndex]] whose file listing is pruned by a caller-supplied
  * predicate over translated pushed filters — the extension point Spark's
  * `FileSourceStrategy` consults for every scan of the relation. This is
  * how lakehouse formats implement DATA SKIPPING in Spark (the public
  * Delta design: a log-backed index serving `listFiles` from commit
  * metadata instead of a filesystem listing, pruning by per-file
  * min/max stats): any `.where(...)` a user writes reaches `dataFilters`
  * here, gets translated to `sources.Filter`s, and files whose stats
  * can't satisfy them are never planned — automatically, with no special
  * read API. File sizes come from the commit log, so planning performs
  * ZERO filesystem RPCs (`FileStatus` is synthesized).
  *
  * With a non-empty `partSchema`, files carry LOGGED partition values
  * (the Delta `add.partitionValues` design): partition columns are not
  * stored in the data files — the scan materializes them from the
  * per-[[PartitionDirectory]] row, and `partitionFilters` are evaluated
  * here against those rows, so partition pruning never touches a file.
  *
  * Lives under `org.apache.spark.sql` for `private[sql]` access to the
  * datasources internals — the standard extension-library shim pattern.
  * Used by `graft.sources.VersionedTableDataObject`.
  */
class GraftPrunedFileIndex(
    root: Path,
    /** (table-relative path, absolute path, size in bytes) of every live file */
    files: Seq[(String, Path, Long)],
    /** rel-paths that MAY satisfy the filters, per the caller's stats */
    prune: Seq[Filter] => Set[String],
    /** partition columns served from the log (empty = unpartitioned) */
    partSchema: StructType = StructType(Nil),
    /** rel-path → raw partition-value strings aligned with `partSchema` */
    filePartValues: Map[String, Seq[String]] = Map.empty) extends FileIndex {

  private def status(abs: Path, len: Long): FileStatusWithMetadata =
    FileStatusWithMetadata(new FileStatus(len, false, 1, 128L * 1024 * 1024, 0L, abs), Map.empty)

  override def rootPaths: Seq[Path] = Seq(root)
  override def partitionSchema: StructType = partSchema

  /** raw path string → typed partition value (standard string-cast rules).
    * The cast zone must be the SESSION timezone: partitionBy formats
    * timestamp partition values in the write session's zone, so casting
    * back under a hardcoded UTC would shift the materialized column and
    * mis-prune session-zone filters. */
  private def partValue(raw: String, i: Int): Any =
    if (raw == null) null
    else if (partSchema(i).dataType == StringType) UTF8String.fromString(raw)
    else Cast(Literal(UTF8String.fromString(raw), StringType),
      partSchema(i).dataType,
      Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)).eval(null)

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // untranslatable predicates simply don't prune (conservative)
    val translated = dataFilters.flatMap(e =>
      DataSourceStrategy.translateFilter(e, supportNestedPredicatePushdown = true))
    val keep = prune(translated)
    val kept = files.filter { case (rel, _, _) => keep(rel) }
    if (partSchema.isEmpty)
      Seq(PartitionDirectory(InternalRow.empty,
        kept.map { case (_, abs, len) => status(abs, len) }.toIndexedSeq))
    else {
      // FileSourceStrategy does NOT re-apply partition filters after the
      // scan — the index must honor them (PartitioningAwareFileIndex's
      // prunePartitions contract)
      val predicate = partitionFilters.reduceOption(And).map { e =>
        Predicate.create(e.transform {
          case a: AttributeReference =>
            val i = partSchema.fieldIndex(a.name)
            BoundReference(i, partSchema(i).dataType, nullable = true)
        })
      }
      kept.groupBy(f => filePartValues.getOrElse(f._1, Seq.fill(partSchema.size)(null: String)))
        .toSeq.map { case (raw, fs) =>
          (InternalRow.fromSeq(raw.zipWithIndex.map { case (v, i) => partValue(v, i) }), fs)
        }
        .filter { case (row, _) => predicate.forall(_.eval(row)) }
        .map { case (row, fs) =>
          PartitionDirectory(row, fs.map { case (_, abs, len) => status(abs, len) }.toIndexedSeq)
        }
    }
  }

  override def inputFiles: Array[String] = files.map(_._2.toString).toArray
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = files.map(_._3).sum
}

object GraftFileIndexShims {
  /** DataFrame over a parquet [[HadoopFsRelation]] backed by the given
    * index, under an explicit schema (files missing later columns
    * null-fill, same as `spark.read.schema(...).parquet`). The relation's
    * output is dataSchema ++ index.partitionSchema — callers reorder. */
  def parquetDataFrame(spark: SparkSession, index: FileIndex, schema: StructType): DataFrame = {
    val cs = spark.asInstanceOf[ClassicSession]
    // asNullable: DataFrameReader.schema does the same — a non-nullable
    // field in the caller's schema would make the vectorized reader
    // REJECT older files that null-fill it instead of evolving
    val relation = HadoopFsRelation(index, index.partitionSchema, schema.asNullable, None,
      new ParquetFileFormat, Map.empty)(cs)
    ClassicDataset.ofRows(cs, LogicalRelation(relation, isStreaming = false))
  }
}
