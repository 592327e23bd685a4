package graft
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = TestSession.spark
    val n = SparkEntry.entry(spark).count()
    println(s"ENTRY_ROWS=$n")
    require(n > 0, "entry returned no rows")
  }
}
