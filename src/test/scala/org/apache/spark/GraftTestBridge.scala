package org.apache.spark

/** Test-only accessor for `private[spark]` listener-bus draining: job-count
  * assertions (AnnIndexSpec's constant-job-waves contract) must wait until
  * every queued SparkListener event has been delivered before reading the
  * counter, and `LiveListenerBus.waitUntilEmpty` is the only reliable way.
  * Lives in the test tree — production code must not depend on it.
  */
object GraftTestBridge {
  def drainListenerBus(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
