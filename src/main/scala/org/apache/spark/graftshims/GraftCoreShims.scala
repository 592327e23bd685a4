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
}
