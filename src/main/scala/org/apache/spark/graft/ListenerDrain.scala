package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`; the bench needs to drain
  * it between queries so per-query shuffle metrics don't bleed into the next
  * entry. This package-located accessor is the standard escape hatch (same
  * trick Spark's own test utilities use).
  */
object ListenerDrain {
  def drain(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
