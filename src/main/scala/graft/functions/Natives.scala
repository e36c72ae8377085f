package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Shared registration gate for the native functions' `register(spark)`
  * entry points: sessions built with `GraftExtensions` already carry every
  * function, so a per-query direct registration must be a no-op there —
  * `registerFunction` unconditionally replaces and logs a
  * "replaced a previously registered function" WARN per call, which
  * polluted every bench tail before this gate existed.
  */
private[functions] object Natives extends org.apache.spark.internal.Logging {
  def registerOnce(spark: SparkSession, name: String, info: ExpressionInfo,
                   builder: Seq[Expression] => Expression): Unit = {
    val id = FunctionIdentifier(name)
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(id)) { reg.registerFunction(id, info, builder); return }
    // Skip ONLY when the existing registration is graft's own (same expression
    // class); a foreign occupant (user UDF, stale session state) under our name
    // would make queries silently run the wrong implementation, so replace it
    // with a clear warning instead of no-opping.
    val existingClass = reg.lookupFunction(id).map(_.getClassName).getOrElse("")
    if (existingClass != info.getClassName) {
      logWarning(s"function '$name' was registered to $existingClass; replacing with graft's ${info.getClassName}")
      reg.registerFunction(id, info, builder)
    }
  }
}
