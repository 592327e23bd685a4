package org.apache.spark.graftshims

import org.apache.spark.SparkContext

/** Access to `private[spark]` SparkContext internals needed for
  * deterministic metrics collection (flush the async listener bus before
  * reading accumulated task metrics). Same package-placement pattern as the
  * SQL shims. */
object GraftCoreShims {
  def waitListenerBusEmpty(sc: SparkContext, timeoutMillis: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMillis)
    catch { case _: Throwable => () } // best effort — metrics, not correctness

  /** wrap a Hadoop Configuration for task-side use (the class is
    * `private[spark]`) — needed to open files on executors with the
    * session's filesystem settings (S3 credentials, defaultFS, …) */
  def serializableConf(conf: org.apache.hadoop.conf.Configuration): org.apache.spark.util.SerializableConfiguration =
    new org.apache.spark.util.SerializableConfiguration(conf)
}
