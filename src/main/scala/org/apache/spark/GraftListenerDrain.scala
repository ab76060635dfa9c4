package org.apache.spark

/** Deterministic drain of the async SparkListener bus (the members are
  * `private[spark]`, hence this package-located accessor — the standard
  * pattern Spark's own test utilities use). DevScale's shuffle-bytes
  * meter samples listener-accumulated state after a job completes; the
  * bus delivers `SparkListenerTaskEnd` asynchronously, so a fixed sleep
  * can under-report tail events on a loaded host (r14 advice). This
  * blocks until every queued event has been delivered (or the timeout
  * elapses, in which case it returns normally — a meter read beats an
  * aborted ledger run).
  */
object GraftListenerDrain {
  def drain(sc: SparkContext, timeoutMillis: Long = 30000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMillis)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
