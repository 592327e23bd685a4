package graft

import graft.core._
import graft.sources._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement of the three deletion-vector read strategies at a
  * tombstone volume big enough to matter (r12 VERDICT #4: justify the
  * above-threshold path with data): a 4M-row table across many files,
  * DELETE of every 3rd row (~1.33M tombstones), then the same full-scan
  * aggregation read through (a) the broadcast predicate, (b) the per-file
  * sidecar scan predicate, (c) the shuffle anti-join — selected via the
  * graft.dv.broadcastMaxBytes threshold knob on fresh table instances.
  * Results recorded in SCALE.md round-13.
  *
  * Run: sbt "runMain graft.BenchDv"
  */
object BenchDv {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val ctx: ActionPipelineContext =
      ActionPipelineContext(spark, new InstanceRegistry)

    val dir = java.nio.file.Files.createTempDirectory("graft-benchdv").toString
    val t = VersionedTableDataObject("benchdv", s"$dir/t", primaryKey = Seq("k"),
      deletionVectors = true)
    val rows = 4000000L
    t.writeDataFrame(spark.range(rows).select(col("id").as("k"),
      (col("id") * 37 % 1000).as("v"), md5(col("id").cast("string")).as("pad"))
      .repartition(32))
    val t0 = System.nanoTime()
    val deleted = t.deleteWhere("k % 3 = 0")
    println(f"""{"op":"delete_dv","rows":$deleted,"sec":${(System.nanoTime() - t0) / 1e9}%.3f}""")

    def read(name: String, thresholdBytes: Option[Long]): Unit = {
      thresholdBytes match {
        case Some(b) => System.setProperty("graft.dv.broadcastMaxBytes", b.toString)
        case None => System.clearProperty("graft.dv.broadcastMaxBytes")
      }
      // fresh instance: the threshold and broadcast cache are per-instance
      val ti = VersionedTableDataObject(s"benchdv-$name", s"$dir/t",
        deletionVectors = true)
      def pass(): (Double, Long) = {
        val s = System.nanoTime()
        val n = ti.getDataFrame().agg(count(lit(1)), sum(col("v"))).head().getLong(0)
        ((System.nanoTime() - s) / 1e9, n)
      }
      pass() // warmup
      val runs = (1 to 3).map(_ => pass())
      val plan = ti.getDataFrame().queryExecution.executedPlan.toString
      val shape =
        if (plan.contains("dv_tombstoned_scan")) "sidecar_scan"
        else if (plan.contains("dv_tombstoned")) "broadcast_pred"
        else if (plan.contains("Join")) "anti_join"
        else "?"
      println(f"""{"read":"$name","shape":"$shape","sec":${runs.map(_._1).min}%.3f,"rows":${runs.head._2}}""")
    }

    read("broadcast", None)          // default 64 MB: tombstones fit → broadcast
    read("sidecar", Some(0L))        // force above-threshold → sidecar scan
    // strip sidecars → anti-join fallback
    val fs = new org.apache.hadoop.fs.Path(s"$dir/t").getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/t/_graft_dv")).foreach { d =>
      fs.delete(new org.apache.hadoop.fs.Path(d.getPath, "_sidecar"), true)
    }
    read("antijoin", Some(0L))
    System.clearProperty("graft.dv.broadcastMaxBytes")
    spark.stop()
  }
}
