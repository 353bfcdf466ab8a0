package org.apache.spark

/** Test-only crossing into `private[spark]`: drain the listener bus so
  * a spec can assert a NEGATIVE ("no job was launched") without a
  * sleep-and-hope race. Kept in test scope — main source's only
  * non-public crossing remains org.apache.spark.sql.GraftSqlShims. */
object GraftTestShims {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
