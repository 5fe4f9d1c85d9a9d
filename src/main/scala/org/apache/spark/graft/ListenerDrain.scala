package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Spark's listener bus is asynchronous: a job-start event posted by a
  * driver-side action may not have reached our counting listener by the
  * time the constructing call returns. `listenerBus.waitUntilEmpty()` is
  * the deterministic drain, but it is `private[spark]` — this one-line
  * shim lives in an `org.apache.spark` subpackage solely to expose it to
  * the graft plan audit (no other Spark internals are touched). */
object ListenerDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
