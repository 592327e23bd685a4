package graft

import graft.functions.SchemaEvolution
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema evolution incl. nested types (reference
  * `util/evolution/SchemaEvolutionTest.scala` scenarios). */
class SchemaEvolutionSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("new column added as null to old data; deleted column kept") {
    val oldDf = Seq((1, "a", 10.0)).toDF("id", "name", "score")
    val newDf = Seq((2, "b", "EU")).toDF("id", "name", "region")
    val (o, n) = SchemaEvolution.process(oldDf, newDf)
    assert(o.columns.toSeq == Seq("id", "name", "score", "region"))
    assert(n.columns.toSeq == o.columns.toSeq)
    val all = o.unionByName(n).orderBy("id").collect()
    assert(all(0).getDouble(2) == 10.0 && all(0).isNullAt(3))
    assert(all(1).isNullAt(2) && all(1).getString(3) == "EU")
  }

  test("deleted column dropped when ignoreOldDeletedColumns") {
    val oldDf = Seq((1, 10.0)).toDF("id", "gone")
    val newDf = Seq((2, "x")).toDF("id", "fresh")
    val (o, n) = SchemaEvolution.process(oldDf, newDf, ignoreOldDeletedColumns = true)
    assert(o.columns.toSeq == Seq("id", "fresh"))
  }

  test("nested struct evolution: field added inside struct") {
    val oldDf = spark.sql("SELECT 1 AS id, named_struct('a', 1, 'b', 'x') AS s")
    val newDf = spark.sql("SELECT 2 AS id, named_struct('a', 5, 'b', 'y', 'c', 2.5) AS s")
    val (o, n) = SchemaEvolution.process(oldDf, newDf)
    val st = o.schema("s").dataType.asInstanceOf[StructType]
    assert(st.fieldNames.toSeq == Seq("a", "b", "c"))
    val oldRow = o.collect().head.getStruct(1)
    assert(oldRow.getInt(0) == 1 && oldRow.getString(1) == "x" && oldRow.isNullAt(2))
  }

  test("array element struct evolution") {
    val oldDf = spark.sql("SELECT 1 AS id, array(named_struct('a', 1)) AS arr")
    val newDf = spark.sql("SELECT 2 AS id, array(named_struct('a', 2, 'b', 'z')) AS arr")
    val (o, n) = SchemaEvolution.process(oldDf, newDf)
    val el = o.schema("arr").dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    assert(el.fieldNames.toSeq == Seq("a", "b"))
    assert(o.selectExpr("arr[0].b").collect().head.isNullAt(0))
    assert(n.selectExpr("arr[0].b").collect().head.getString(0) == "z")
  }

  test("type widening: int -> long via new type wins") {
    val oldDf = Seq((1, 10)).toDF("id", "v")
    val newDf = Seq((2, 20L)).toDF("id", "v")
    val (o, n) = SchemaEvolution.process(oldDf, newDf)
    assert(o.schema("v").dataType == LongType)
    assert(o.collect().head.getLong(1) == 10L)
  }
}
