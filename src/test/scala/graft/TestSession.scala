package graft

import org.apache.spark.sql.SparkSession

/** Shared local SparkSession for all specs (reference pattern:
  * `sdl-core/src/test/scala/io/smartdatalake/testutils/TestUtil.scala`). */
object TestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.warehouse.dir", s"/tmp/graft-test-warehouse-${ProcessHandle.current().pid()}")
    .getOrCreate()
}
