package org.apache.spark.sql.graftshim

import org.apache.spark.SparkRuntimeException

/** Bridge to Spark's `private[spark]` error-class exception type (same
  * contract as ColumnBridge/PlanBridge: the narrowest possible surface,
  * no behavior). Engine expressions that fail fast inside tasks raise
  * through the USER_RAISED_EXCEPTION condition — the raise_error()
  * channel — so the message survives driver-side error wrapping as a
  * proper SparkThrowable instead of an opaque wrapped RuntimeException. */
object ErrorBridge {
  def userRaised(message: String): RuntimeException =
    new SparkRuntimeException(
      errorClass = "USER_RAISED_EXCEPTION",
      messageParameters = Map("errorMessage" -> message))
}
