package org.apache.spark

/** Test-only bridge: `SparkContext.listenerBus` is `private[spark]`, so
  * specs that assert on the status store (job groups, stage metrics) reach
  * it from this package to drain the event queue DETERMINISTICALLY —
  * replacing fixed `Thread.sleep` waits that flake on loaded machines.
  * Same trick Spark's own test tree uses. */
object GraftTestListenerBus {
  /** Block until every queued listener event has been processed (bounded:
    * throws TimeoutException after `timeoutMillis`). */
  def drain(sc: SparkContext, timeoutMillis: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
