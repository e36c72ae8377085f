package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The reference (tomwhite/disq-original) is a genomics-format I/O library;
  * its relational capability is "the genomics Datasets compose with Spark
  * SQL" (SURVEY.md §2.5). `queries` therefore spans:
  *   - the generic relational layer ([[graft.queries.Relational]]),
  *   - the format layer exercised through SQL-checkable round-trips
  *     ([[graft.queries.FormatQueries]], added as the format layer lands),
  *   - LLM-data-pipeline operators (dedup / similarity / text analysis)
  *     over the `documents` / `embeddings` tables.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Registry.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Registry.oracles
}
