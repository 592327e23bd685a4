package graft

import graft.core._
import graft.operators._
import graft.sources._
import org.scalatest.funsuite.AnyFunSuite

object CustomLogicSpec {
  case class L(id: Int, v: String)
  case class R(id: Int, w: Int)
  case class O(id: Int, v: String, w: Int)
}

class CustomLogicSpec extends AnyFunSuite {
  import CustomLogicSpec._
  lazy val spark = TestSession.spark
  implicit lazy val ctx: ActionPipelineContext =
    ActionPipelineContext(spark, new InstanceRegistry)

  test("scala code transformer compiles and runs a source-string function") {
    import spark.implicits._
    val t = ScalaCodeDfTransformer(
      """(spark: org.apache.spark.sql.SparkSession, df: org.apache.spark.sql.DataFrame) =>
        |  df.select(org.apache.spark.sql.functions.col("x"),
        |    (org.apache.spark.sql.functions.col("x") * 10).as("x10"))
        |""".stripMargin)
    val out = t.transform(Seq(1, 2, 3).toDF("x"))
    assert(out.selectExpr("sum(x10)").collect().head.getLong(0) == 60)
    // second use hits the compile cache (same object, no recompilation error)
    assert(t.transform(Seq(5).toDF("x")).selectExpr("sum(x10)").collect().head.getLong(0) == 50)
  }

  test("typed 2-to-1 transformer joins datasets with encoders") {
    import spark.implicits._
    val t = new TypedDs2To1Transformer[L, R, O]("l", "r", "out",
      (s, l, r) => {
        import s.implicits._
        l.joinWith(r, l("id") === r("id")).map { case (a, b) => O(a.id, a.v, b.w) }
      })
    val got = t.transform(Map(
      "l" -> Seq(L(1, "a"), L(2, "b")).toDF(),
      "r" -> Seq(R(1, 10)).toDF()))
    val rows = got("out").collect()
    assert(rows.length == 1 && rows.head.getAs[String]("v") == "a" && rows.head.getAs[Int]("w") == 10)
  }

  test("custom file action streams files through a transform with parallelism") {
    val srcDir = java.nio.file.Files.createTempDirectory("cfa_src")
    val dstDir = java.nio.file.Files.createTempDirectory("cfa_dst")
    java.nio.file.Files.writeString(srcDir.resolve("one.txt"), "hello")
    java.nio.file.Files.writeString(srcDir.resolve("two.txt"), "world")
    val reg = new InstanceRegistry
    reg.register(RawFileDataObject("src", srcDir.toString))
    reg.register(RawFileDataObject("dst", dstDir.toString))
    implicit val c2: ActionPipelineContext = ActionPipelineContext(spark, reg)
    val action = CustomFileAction("upper", "src", "dst", (in, out) => {
      val content = new String(in.readAllBytes(), "UTF-8").toUpperCase
      out.write(content.getBytes("UTF-8"))
    })
    val feeds = action.exec(Seq.empty)(c2)
    assert(feeds.head.metrics.exists(_.recordsWritten == 2))
    assert(java.nio.file.Files.readString(dstDir.resolve("one.txt")) == "HELLO")
    assert(java.nio.file.Files.readString(dstDir.resolve("two.txt")) == "WORLD")
  }

  test("custom file action preserves subdirectory layout and skips hidden dirs") {
    val srcDir = java.nio.file.Files.createTempDirectory("cfa_src2")
    val dstDir = java.nio.file.Files.createTempDirectory("cfa_dst2")
    // same basename in two partition dirs — flattening would lose one
    java.nio.file.Files.createDirectories(srcDir.resolve("dt=a"))
    java.nio.file.Files.createDirectories(srcDir.resolve("dt=b"))
    java.nio.file.Files.createDirectories(srcDir.resolve(".staging"))
    java.nio.file.Files.writeString(srcDir.resolve("dt=a/data.csv"), "aa")
    java.nio.file.Files.writeString(srcDir.resolve("dt=b/data.csv"), "bb")
    java.nio.file.Files.writeString(srcDir.resolve(".staging/part-0"), "tmp")
    val reg = new InstanceRegistry
    reg.register(RawFileDataObject("src", srcDir.toString))
    reg.register(RawFileDataObject("dst", dstDir.toString))
    implicit val c2: ActionPipelineContext = ActionPipelineContext(spark, reg)
    val action = CustomFileAction("copy", "src", "dst", (in, out) => in.transferTo(out))
    val feeds = action.exec(Seq.empty)(c2)
    assert(feeds.head.metrics.exists(_.recordsWritten == 2))   // hidden dir skipped
    assert(java.nio.file.Files.readString(dstDir.resolve("dt=a/data.csv")) == "aa")
    assert(java.nio.file.Files.readString(dstDir.resolve("dt=b/data.csv")) == "bb")
    assert(!java.nio.file.Files.exists(dstDir.resolve(".staging")))
  }

  test("file transfer action re-run overwrites instead of nesting") {
    val srcDir = java.nio.file.Files.createTempDirectory("fta_src")
    val dstDir = java.nio.file.Files.createTempDirectory("fta_dst").resolve("out")
    java.nio.file.Files.writeString(srcDir.resolve("a.bin"), "v1")
    val reg = new InstanceRegistry
    reg.register(RawFileDataObject("src", srcDir.toString))
    reg.register(RawFileDataObject("dst", dstDir.toString))
    implicit val c2: ActionPipelineContext = ActionPipelineContext(spark, reg)
    val action = FileTransferAction("ft", "src", "dst")
    action.exec(Seq.empty)(c2)
    java.nio.file.Files.writeString(srcDir.resolve("a.bin"), "v2")
    action.exec(Seq.empty)(c2)    // second run: dst dir already exists
    assert(java.nio.file.Files.readString(dstDir.resolve("a.bin")) == "v2")
    // FileUtil.copy's checkDest would have produced dst/<srcDirName>/a.bin
    val srcName = srcDir.getFileName.toString
    assert(!java.nio.file.Files.exists(dstDir.resolve(srcName)))
  }
}
