package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Package-placed accessor for `Dataset.ofRows` (private[sql]): lets the
  * query layer re-plan a fixture projection below a repartition (see
  * FormatQueries.spread) without re-expressing Catalyst expressions through
  * the public Column API.
  */
object GraftInternals {
  def ofRows(s: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], plan)
}
