package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Spark keeps the listener-bus drain (`LiveListenerBus.waitUntilEmpty`)
  * behind `private[spark]`; a metrics audit that snapshots
  * listener-accumulated counters between sequential queries needs the
  * happens-before edge from "query finished" to "all of its task-end
  * events delivered" (without it, a late event bleeds one query's
  * bytes into the next row). Same narrow re-export discipline as
  * [[org.apache.spark.sql.graftbridge.ColumnBridge]] /
  * [[org.apache.spark.sql.graftbridge.PlanBridge]] — nothing else
  * from internals is touched. */
object ListenerBridge {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
