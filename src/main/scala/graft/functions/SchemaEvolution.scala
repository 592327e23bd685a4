package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema evolution: align an existing table and a new feed to one merged
  * schema, including nested structs/arrays/maps. Reference:
  * `sdl-core/util/evolution/SchemaEvolution.scala:151` (process) with
  * nested logic in `ComplexTypeEvolution.scala`/`ValueProjector.scala`.
  *
  * Semantics (mirrors reference):
  *  - columns only in the new feed → added to old data as typed nulls;
  *  - columns only in the old data ("deleted") → kept and null-filled in
  *    the new feed, unless `ignoreOldDeletedColumns`;
  *  - both present with different types → new type wins when Spark can
  *    cast, else error;
  *  - struct fields evolve recursively; array/map element types evolve.
  *
  * Column order: old columns first (original order), newly added at the
  * end — so evolved parquet/table layouts stay append-friendly.
  *
  * Everything is a pure projection (`select` with nested `struct()`
  * rebuilds) — no UDFs, fully codegen'd, zero extra shuffles.
  */
object SchemaEvolution {

  /** merged target type of two types at the same position */
  private def mergeType(oldT: DataType, newT: DataType): DataType = (oldT, newT) match {
    case (o, n) if o == n => o
    case (o: StructType, n: StructType) =>
      val oldFields = o.fields.map(f => f.name -> f).toMap
      val newFields = n.fields.map(f => f.name -> f).toMap
      val keptOld = o.fields.map { f =>
        newFields.get(f.name).map(nf => StructField(f.name, mergeType(f.dataType, nf.dataType), nullable = true))
          .getOrElse(f.copy(nullable = true))
      }
      val added = n.fields.filterNot(f => oldFields.contains(f.name)).map(_.copy(nullable = true))
      StructType(keptOld ++ added)
    case (o: ArrayType, n: ArrayType) =>
      ArrayType(mergeType(o.elementType, n.elementType), containsNull = true)
    case (o: MapType, n: MapType) =>
      MapType(o.keyType, mergeType(o.valueType, n.valueType), valueContainsNull = true)
    case (_, n) => n // type changed → new type wins (cast at projection)
  }

  /** merged schema of old+new top-level schemas */
  def mergedSchema(oldS: StructType, newS: StructType, ignoreOldDeletedColumns: Boolean = false): StructType = {
    val newByName = newS.fields.map(f => f.name -> f).toMap
    val oldKept = oldS.fields.flatMap { f =>
      newByName.get(f.name) match {
        case Some(nf) => Some(StructField(f.name, mergeType(f.dataType, nf.dataType), nullable = true))
        case None if ignoreOldDeletedColumns => None
        case None => Some(f.copy(nullable = true))
      }
    }
    val added = newS.fields.filterNot(f => oldS.fieldNames.contains(f.name)).map(_.copy(nullable = true))
    StructType(oldKept ++ added)
  }

  /** projection of a (possibly missing) source column to a target type */
  private def project(src: Option[Column], srcT: Option[DataType], tgt: DataType): Column = (src, srcT) match {
    case (None, _) => lit(null).cast(tgt)
    case (Some(c), Some(s)) if s == tgt => c
    case (Some(c), Some(s: StructType)) =>
      tgt match {
        case t: StructType =>
          val srcFields = s.fields.map(f => f.name -> f).toMap
          when(c.isNull, lit(null).cast(t)).otherwise(struct(t.fields.map { tf =>
            val sf = srcFields.get(tf.name)
            project(sf.map(f => c.getField(f.name)), sf.map(_.dataType), tf.dataType).as(tf.name)
          }.toIndexedSeq: _*))
        case other => c.cast(other)
      }
    case (Some(c), Some(s: ArrayType)) =>
      tgt match {
        case t: ArrayType =>
          transform(c, el => project(Some(el), Some(s.elementType), t.elementType))
        case other => c.cast(other)
      }
    case (Some(c), Some(s: MapType)) =>
      tgt match {
        case t: MapType =>
          transform_values(c, (_, v) => project(Some(v), Some(s.valueType), t.valueType))
        case other => c.cast(other)
      }
    case (Some(c), _) => c.cast(tgt)
  }

  /** align one DataFrame to a target schema */
  def alignTo(df: DataFrame, target: StructType): DataFrame = {
    val srcByName = df.schema.fields.map(f => f.name -> f).toMap
    df.select(target.fields.map { tf =>
      val sf = srcByName.get(tf.name)
      project(sf.map(f => col(s"`${f.name}`")), sf.map(_.dataType), tf.dataType).as(tf.name)
    }.toIndexedSeq: _*)
  }

  /** Align old and new DataFrames to their merged schema. Reference
    * `SchemaEvolution.process`. */
  def process(oldDf: DataFrame, newDf: DataFrame,
              ignoreOldDeletedColumns: Boolean = false): (DataFrame, DataFrame) = {
    val target = mergedSchema(oldDf.schema, newDf.schema, ignoreOldDeletedColumns)
    (alignTo(oldDf, target), alignTo(newDf, target))
  }

  /** true if writing `newDf` into a table of schema `existing` requires evolution */
  def hasSchemaChanged(existing: StructType, newS: StructType): Boolean =
    existing.fields.map(f => (f.name, f.dataType)).toSeq !=
      newS.fields.map(f => (f.name, f.dataType)).toSeq
}
