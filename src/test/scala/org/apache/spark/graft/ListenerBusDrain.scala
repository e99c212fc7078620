package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only bridge: `SparkContext.listenerBus` is `private[spark]`, so the
  * deterministic "all listener events delivered" barrier the job-count spec
  * needs lives in this two-liner inside the spark package (same pattern as
  * the ColumnShim expression bridge). */
object ListenerBusDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
