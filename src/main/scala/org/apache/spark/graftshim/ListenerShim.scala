package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Minimal bridge to the `private[spark]` listener bus: build-metric
  * snapshots read byte counters fed by async SparkListener events, so
  * without a drain the tail of a stage's TaskEnd events can be missed
  * (undercounted gauges; a flaky `inputBytes > 0` assertion). Nothing
  * else from the internal API is exposed. */
object ListenerShim {
  /** Block until the listener bus has delivered all queued events (or
    * the timeout elapses); returns whether the queue fully drained. */
  def drain(sc: SparkContext, timeoutMillis: Long = 5000L): Boolean =
    try {
      sc.listenerBus.waitUntilEmpty(timeoutMillis)
      true
    } catch {
      case _: Exception => false // timeout or unsupported — gauges stay best-effort
    }
}
