package org.apache.spark

/** Bridge into `private[spark]` listener-bus draining so instrumentation
  * (graft.table.ScanMetrics) can read task input metrics synchronously
  * after an action.
  */
object GraftSparkShim {
  def drainListeners(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
