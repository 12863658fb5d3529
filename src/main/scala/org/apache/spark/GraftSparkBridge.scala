package org.apache.spark

/** Compile-time bridge into `private[spark]` scheduler internals.
  *
  * [[graft.Bench]] snapshots per-query task metrics from a SparkListener;
  * listener events post asynchronously, so a snapshot taken right after an
  * action could miss the last tasks' metrics. The public API offers no
  * flush, but the listener bus has one behind `private[spark]`. */
object GraftSparkBridge {
  /** Block until all queued listener events are delivered (bounded wait —
    * metrics are diagnostic; never fail a bench run over a slow bus). */
  def drainListenerBus(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty(5000) catch { case _: Throwable => () }
}
