package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loading helpers shared by all query modules.
  *
  * Tables live as one parquet file/dir per table under an sf directory
  * (see TESTDATA.md). Loading through here keeps the path convention in
  * one place and lets every query benefit from parquet column pruning /
  * predicate pushdown (we never cache — the driver harness measures
  * cold plans).
  */
object Tables {
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  /** Normalizes `events.ts` to TIMESTAMP (ltz) whatever the parquet
    * carries. Seen in the wild across driver data generations:
    *  - TIMESTAMP(NANOS): with `spark.sql.legacy.parquet.nanosAsLong=true`
    *    it surfaces as LongType nanos → truncate to a micros timestamp
    *    (DuckDB's native precision, so the oracle agrees);
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
    *    TIMESTAMP_NTZ, which `unix_millis`/`unix_micros`/watermarks
    *    reject → cast to TIMESTAMP. Sessions pin UTC, so the wall-clock
    *    reinterpretation preserves the stored micros value exactly and
    *    the DuckDB oracle (naive timestamps) sees identical numbers.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = t(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", df("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
