package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Queries with no exact SQL oracle (driver records a rows>0 check):
  * multimodal feature extraction runs through float32 features whose
  * bit-exact value DuckDB cannot reproduce portably.
  */
object Extras {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_features" -> { (s, d) => graft.multimodal.Multimodal.featureSummary(s, d) }
  )
  def oracles: Map[String, String] = Map.empty
}
