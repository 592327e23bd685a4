package graft

import graft.core._
import graft.operators._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Per-transformer behavior, mirroring the reference's transformer tests
  * under workflow/action/generic/transformer/. */
class TransformersSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  implicit lazy val ctx: ActionPipelineContext =
    ActionPipelineContext(spark, new InstanceRegistry,
      runtimeOptions = Map("runEnv" -> "test"))

  test("encrypt then decrypt round-trips column values; ciphertext differs") {
    import spark.implicits._
    val df = Seq((1, "secret-a"), (2, "secret-b")).toDF("id", "v")
    val enc = EncryptColumnsTransformer(Seq("v"), "0123456789abcdef").transform(df)
    val cipher = enc.select("v").collect().map(_.getString(0))
    assert(!cipher.contains("secret-a"))
    val dec = DecryptColumnsTransformer(Seq("v"), "0123456789abcdef").transform(enc)
    assert(dec.orderBy("id").select("v").collect().map(_.getString(0)).toSeq ==
      Seq("secret-a", "secret-b"))
  }

  test("standardize column names: camelCase, accents, illegal chars") {
    import spark.implicits._
    val df = Seq((1, 2, 3)).toDF("orderId", "prixUnité", "weird col!")
    val out = StandardizeColNamesTransformer().transform(df)
    assert(out.columns.toSeq == Seq("order_id", "prix_unite", "weirdcol"))
  }

  test("standardize column names: camelCaseToLower=false keeps uppercase letters") {
    import spark.implicits._
    val df = Seq((1, 2)).toDF("MyCol", "ID x")
    val out = StandardizeColNamesTransformer(camelCaseToLower = false).transform(df)
    assert(out.columns.toSeq == Seq("MyCol", "IDx"))   // not "yol" / ""
  }

  test("SQL transformers reject dataObject ids that collide after sanitizing") {
    import spark.implicits._
    implicit val ctx: ActionPipelineContext =
      ActionPipelineContext(spark, new graft.core.InstanceRegistry())
    val t = SQLDfsTransformer(Map("out" -> "select * from a_b"))
    val dfs = Map("a-b" -> Seq(1).toDF("x"), "a_b" -> Seq(2).toDF("x"))
    val e = intercept[IllegalArgumentException](t.transform(dfs))
    assert(e.getMessage.contains("collision"))
  }

  test("standardize datatypes downcasts decimals and widens float") {
    import spark.implicits._
    val df = Seq((BigDecimal(5), BigDecimal("1234567890123"), 1.5f))
      .toDF("small", "big", "f")
      .select(col("small").cast("decimal(9,0)"), col("big").cast("decimal(18,0)"), col("f"))
    val out = StandardizeDatatypesTransformer().transform(df)
    assert(out.schema("small").dataType == org.apache.spark.sql.types.IntegerType)
    assert(out.schema("big").dataType == org.apache.spark.sql.types.LongType)
    assert(out.schema("f").dataType == org.apache.spark.sql.types.DoubleType)
  }

  test("data validation appends error messages without dropping rows") {
    import spark.implicits._
    val df = Seq((1, 50), (2, -5), (3, 2000)).toDF("id", "v")
    val out = DataValidationTransformer(Seq(
      ValidationRule("v >= 0", Some("negative")),
      ValidationRule("v < 1000", Some("too big")))).transform(df)
    val errs = out.orderBy("id").select("errors").collect().map(_.getSeq[String](0))
    assert(errs(0).isEmpty && errs(1) == Seq("negative") && errs(2) == Seq("too big"))
  }

  test("convert nulls, additional columns with runtime options, white/blacklist") {
    import spark.implicits._
    val df = Seq((Some(1), Option.empty[String], Some(2.0)), (None, Some("x"), None))
      .toDF("a", "b", "c")
    val filled = ConvertNullValuesTransformer(valueForString = "?", valueForNumber = -1)
      .transform(df)
    val r = filled.orderBy(desc("a")).collect()
    assert(r(0).getString(1) == "?" && r(1).getInt(0) == -1 && r(1).getDouble(2) == -1.0)
    val extra = AdditionalColumnsTransformer(Map("env" -> "'%{runEnv}'", "twice_a" -> "a * 2"))
      .transform(df)
    assert(extra.columns.contains("env") && extra.where(col("env") === "test").count() == 2)
    assert(WhitelistTransformer(Seq("a", "b")).transform(df).columns.toSeq == Seq("a", "b"))
    assert(BlacklistTransformer(Seq("b")).transform(df).columns.toSeq == Seq("a", "c"))
  }

  test("flatten explodes arrays and dots-out structs") {
    import spark.implicits._
    val df = Seq((1, ("x", 9), Seq("t1", "t2"))).toDF("id", "meta", "tags")
    val out = FlattenTransformer().transform(df)
    assert(out.columns.toSet == Set("id", "meta__1", "meta__2", "tags"))
    assert(out.count() == 2) // exploded tags
  }

  test("deduplicate transformer keeps best-ranked row per key") {
    import spark.implicits._
    val df = Seq((1, "old", 10), (1, "new", 20), (2, "only", 5)).toDF("id", "v", "score")
    val out = DeduplicateTransformer(Seq("id"), "score DESC").transform(df)
    assert(out.orderBy("id").collect().map(_.getString(1)).toSeq == Seq("new", "only"))
  }

  test("file incremental move mode archives input after processing") {
    import spark.implicits._
    import graft.sources._
    val inDir = java.nio.file.Files.createTempDirectory("fim_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("fim_out").toString
    val archive = java.nio.file.Files.createTempDirectory("fim_arch").toString + "/moved"
    Seq((1, "a")).toDF("id", "v").write.mode("overwrite").parquet(inDir)
    val reg = new InstanceRegistry
    reg.register(ParquetFileDataObject("in", inDir))
    reg.register(ParquetFileDataObject("out", outDir))
    implicit val c2: ActionPipelineContext = ActionPipelineContext(spark, reg)
    val mode = graft.operators.modes.FileIncrementalMoveMode(Some(archive))
    val action = CopyAction("c", "in", "out", saveMode = Some(SdlSaveMode.Overwrite),
      executionMode = Some(mode))
    action.exec(Seq.empty)(c2)
    mode.postExec(action)(c2)
    assert(!new java.io.File(inDir).exists())
    assert(new java.io.File(archive).exists())
    assert(spark.read.parquet(outDir).count() == 1)
  }

  test("file incremental move is file-granular: late-landing file survives and is ingested next run") {
    import spark.implicits._
    import graft.sources._
    val inDir = java.nio.file.Files.createTempDirectory("fim2_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("fim2_out").toString
    Seq((1, "gen1")).toDF("id", "v").write.mode("overwrite").parquet(inDir)
    val reg = new InstanceRegistry
    reg.register(ParquetFileDataObject("in", inDir))
    reg.register(ParquetFileDataObject("out", outDir))
    implicit val c2: ActionPipelineContext = ActionPipelineContext(spark, reg)
    val mode = graft.operators.modes.FileIncrementalMoveMode()
    val action = CopyAction("c", "in", "out", saveMode = Some(SdlSaveMode.Append),
      executionMode = Some(mode))
    action.exec(Seq.empty)(c2)
    // a file lands AFTER the read snapshot but BEFORE postExec — the race
    // the whole-directory move would lose (deleted unprocessed)
    val late = java.nio.file.Files.createTempDirectory("fim2_late").toString
    Seq((2, "late")).toDF("id", "v").write.mode("overwrite").parquet(late)
    val lateFile = new java.io.File(late).listFiles().filter(f =>
      f.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(lateFile.toPath,
      java.nio.file.Paths.get(inDir, "late-landing.parquet"))
    mode.postExec(action)(c2)
    // snapshot files consumed, late file survives in place
    assert(new java.io.File(inDir, "late-landing.parquet").exists())
    assert(spark.read.parquet(outDir).as[(Int, String)].collect().toSet == Set((1, "gen1")))
    // next run ingests exactly the late file and the landing zone empties
    action.exec(Seq.empty)(c2)
    mode.postExec(action)(c2)
    assert(!new java.io.File(inDir).exists())
    assert(spark.read.parquet(outDir).as[(Int, String)].collect().toSet ==
      Set((1, "gen1"), (2, "late")))
  }

  test("DAG rejects a fileMove input that another action also reads") {
    import graft.sources._
    val reg = new InstanceRegistry
    val a1 = CopyAction("mv", "lz", "o1",
      executionMode = Some(graft.operators.modes.FileIncrementalMoveMode()))
    val a2 = CopyAction("sibling", "lz", "o2")
    val ex = intercept[IllegalArgumentException](new graft.core.ActionDAGRun(Seq(a1, a2)))
    assert(ex.getMessage.contains("sibling"))
  }

  test("state incremental mode: watermark snapshots at read time, file landing during exec is picked up next run") {
    import spark.implicits._
    import graft.sources._
    val inDir = java.nio.file.Files.createTempDirectory("sim_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("sim_out").toString
    Seq((1, "gen1")).toDF("id", "v").write.mode("overwrite").parquet(inDir)
    Thread.sleep(5) // ensure gen-1 mod time < the read snapshot
    val reg = new InstanceRegistry
    val src = ParquetFileDataObject("in", inDir)
    reg.register(src)
    reg.register(ParquetFileDataObject("out", outDir))
    implicit val c2: ActionPipelineContext = ActionPipelineContext(spark, reg)
    val mode = graft.operators.modes.DataObjectStateIncrementalMode()
    val action = CopyAction("c", "in", "out", saveMode = Some(SdlSaveMode.Append),
      executionMode = Some(mode))
    action.exec(Seq.empty)(c2)
    // lands between the exec read and postExec: must fall ABOVE the
    // persisted watermark (read-time snapshot), not below a post-write
    // re-listing
    Thread.sleep(5)
    Seq((2, "during")).toDF("id", "v").write.mode("append").parquet(inDir)
    mode.postExec(action)(c2)
    assert(src.getState.isDefined)
    Thread.sleep(5)
    action.exec(Seq.empty)(c2)
    mode.postExec(action)(c2)
    assert(spark.read.parquet(outDir).as[(Int, String)].collect().toSet ==
      Set((1, "gen1"), (2, "during")))
  }
}
