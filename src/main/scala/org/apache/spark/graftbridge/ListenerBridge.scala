package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Bridge into `private[spark]` listener-bus API (the ColumnBridge pattern):
  * graft.JobProfile must drain the async listener bus before reading its
  * per-job accumulators, or late stage-completed events under-count the
  * final job's shuffle metrics. */
object ListenerBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
