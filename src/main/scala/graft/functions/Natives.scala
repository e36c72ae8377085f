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
private[functions] object Natives {
  def registerOnce(spark: SparkSession, name: String, info: ExpressionInfo,
                   builder: Seq[Expression] => Expression): Unit = {
    val id = FunctionIdentifier(name)
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(id)) reg.registerFunction(id, info, builder)
  }
}
