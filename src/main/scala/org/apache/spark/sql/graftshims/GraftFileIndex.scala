package org.apache.spark.sql.graftshims

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.datasources.{DataSourceStrategy, FileIndex, FileStatusWithMetadata, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

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
  * Lives under `org.apache.spark.sql` for `private[sql]` access to the
  * datasources internals — the standard extension-library shim pattern.
  * Used by `graft.sources.VersionedTableDataObject`.
  */
class GraftPrunedFileIndex(
    root: Path,
    /** (table-relative path, absolute path, size in bytes) of every live file */
    files: Seq[(String, Path, Long)],
    /** rel-paths that MAY satisfy the filters, per the caller's stats */
    prune: Seq[Filter] => Set[String]) extends FileIndex {

  private def status(abs: Path, len: Long): FileStatusWithMetadata =
    FileStatusWithMetadata(new FileStatus(len, false, 1, 128L * 1024 * 1024, 0L, abs), Map.empty)

  override def rootPaths: Seq[Path] = Seq(root)
  override def partitionSchema: StructType = StructType(Nil)

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // untranslatable predicates simply don't prune (conservative)
    val translated = dataFilters.flatMap(e =>
      DataSourceStrategy.translateFilter(e, supportNestedPredicatePushdown = true))
    val keep = prune(translated)
    Seq(PartitionDirectory(InternalRow.empty,
      files.collect { case (rel, abs, len) if keep(rel) => status(abs, len) }.toIndexedSeq))
  }

  override def inputFiles: Array[String] = files.map(_._2.toString).toArray
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = files.map(_._3).sum
}

object GraftFileIndexShims {
  /** DataFrame over a parquet [[HadoopFsRelation]] backed by the given
    * index, under an explicit schema (files missing later columns
    * null-fill, same as `spark.read.schema(...).parquet`). */
  def parquetDataFrame(spark: SparkSession, index: FileIndex, schema: StructType): DataFrame = {
    val cs = spark.asInstanceOf[ClassicSession]
    // asNullable: DataFrameReader.schema does the same — a non-nullable
    // field in the caller's schema would make the vectorized reader
    // REJECT older files that null-fill it instead of evolving
    val relation = HadoopFsRelation(index, StructType(Nil), schema.asNullable, None,
      new ParquetFileFormat, Map.empty)(cs)
    ClassicDataset.ofRows(cs, LogicalRelation(relation, isStreaming = false))
  }
}
