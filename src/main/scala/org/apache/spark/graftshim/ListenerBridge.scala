package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** `SparkListener` events are delivered asynchronously; attributing
  * per-query stage metrics to the query that just finished requires
  * draining the bus first. `listenerBus` is `private[spark]`, so this
  * shim (same technique as the sql-side bridges) re-exports the one
  * call the bench's metrics accounting needs.
  */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
