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

  /** Scale-adaptive scan spread (guide §2.5 "input skew: one huge
    * unsplittable file → repartition immediately after the read"): when the
    * plan's input is SMALLER than one scan split (`files.maxPartitionBytes`),
    * the whole scan — and every narrow operation above it, including the map
    * side of the first exchange — runs as ONE task; a round-robin
    * repartition of the pruned base columns moves that work onto every core.
    * When the input is bigger than a split the scan parallelizes by itself
    * and the extra exchange would be pure cost, so nothing is inserted —
    * the decision derives from input size, not from the local core count
    * (at 100 TB this is always a no-op). The repartition lands BELOW a
    * deterministic final projection (same plan surgery as
    * FormatQueries.spread) so heavy row construction also moves off the
    * scan task and only pruned base columns cross the exchange.
    * Row-for-row output is unchanged — only partition placement moves.
    */
  def spreadSmall(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    val dp = s.sparkContext.defaultParallelism
    val maxPB = s.sessionState.conf.filesMaxPartitionBytes
    val bytes = df.queryExecution.analyzed.stats.sizeInBytes
    if (dp <= 1 || bytes >= BigInt(maxPB)) df
    else {
      import org.apache.spark.sql.catalyst.plans.logical.{Project, Repartition}
      df.queryExecution.logical match {
        case Project(exprs, child) if exprs.forall(_.deterministic) =>
          org.apache.spark.sql.GraftInternals.ofRows(s,
            Project(exprs, Repartition(dp, shuffle = true, child)))
        case other =>
          org.apache.spark.sql.GraftInternals.ofRows(s,
            Repartition(dp, shuffle = true, other))
      }
    }
  }
}
