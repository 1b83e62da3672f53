package org.apache.spark

/** Package-private accessor shim (the sql.classic.GraftExprColumn device):
  * QueryExecutionListener callbacks arrive via the async listener bus, so a
  * measurement that registers a listener, runs work, and reads the result
  * must drain the bus first. `SparkContext.listenerBus` is private[spark];
  * no Spark internals are modified.
  */
object GraftSparkInternals {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
