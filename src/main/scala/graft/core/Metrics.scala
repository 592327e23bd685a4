package graft.core

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** Spark-stage metrics for one labelled unit of work (an action's write):
  * records/bytes written, executor time, shuffle volume. Reference:
  * `sdl-core/metrics/SparkStageMetricsListener.scala:35-90` (task-metric
  * accumulation keyed by job group).
  */
class StageMetricsListener(jobGroup: String) extends SparkListener {
  private val stages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
  val recordsWritten = new AtomicLong; val bytesWritten = new AtomicLong
  val executorRunTimeMs = new AtomicLong
  val shuffleReadBytes = new AtomicLong; val shuffleWriteBytes = new AtomicLong

  override def onJobStart(jobStart: SparkListenerJobStart): Unit = {
    val group = Option(jobStart.properties)
      .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
    if (group.contains(jobGroup)) jobStart.stageIds.foreach(stages.add(_))
  }
  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit =
    if (stages.contains(taskEnd.stageId) && taskEnd.taskMetrics != null) {
      val m = taskEnd.taskMetrics
      recordsWritten.addAndGet(m.outputMetrics.recordsWritten)
      bytesWritten.addAndGet(m.outputMetrics.bytesWritten)
      executorRunTimeMs.addAndGet(m.executorRunTime)
      shuffleReadBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      shuffleWriteBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
    }

  def snapshot: Map[String, Any] = Map(
    "stage_records_written" -> recordsWritten.get,
    "stage_bytes_written" -> bytesWritten.get,
    "stage_executor_run_time_ms" -> executorRunTimeMs.get,
    "stage_shuffle_read_bytes" -> shuffleReadBytes.get,
    "stage_shuffle_write_bytes" -> shuffleWriteBytes.get)
}

object StageMetrics {
  /** run `body` under a job group and return its stage metrics */
  def collect[T](sc: SparkContext, label: String)(body: => T): (T, Map[String, Any]) = {
    val group = s"graft_$label"
    val listener = new StageMetricsListener(group)
    sc.addSparkListener(listener)
    val prevGroup = sc.getLocalProperty("spark.jobGroup.id")
    sc.setJobGroup(group, label, interruptOnCancel = false)
    try {
      val result = body
      org.apache.spark.graftshims.GraftCoreShims.waitListenerBusEmpty(sc, 5000)
      (result, listener.snapshot)
    } finally {
      sc.removeSparkListener(listener)
      sc.setLocalProperty("spark.jobGroup.id", prevGroup)
    }
  }
}
