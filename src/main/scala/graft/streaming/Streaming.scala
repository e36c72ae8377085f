package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.cents

/** Structured Streaming operators — the streaming twins of the batch event
  * queries. The reference has no streaming surface (SURVEY.md §2.5); these
  * exist because a 100 TB training-data pipeline ingests continuously: the
  * same declarative transforms run over `readStream` sources with watermarked
  * event-time state.
  *
  * All functions take/return DataFrames so they compose with any streaming
  * source (file, Kafka-shaped, rate, MemoryStream in tests) and any sink.
  */
object Streaming {

  /** Hourly tumbling-window counts/value per event type with a 2h watermark:
    * the streaming twin of q_events_hourly. State is bounded by the
    * watermark; the aggregation is partial-aggregated map-side before the
    * window shuffle, so it scales with #(window × type), not #events.
    */
  def hourlyEventCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_c"))
      .select(col("win.start").as("hour"), col("event_type"), col("n"), col("value_c"))

  /** Sliding 15-minute hot-key detector: event counts per user over a
    * 1h window sliding every 15m, emitting users above `threshold`.
    */
  def hotUsers(events: DataFrame, threshold: Long = 100L): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("win"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
      .select(col("win.start").as("win_start"), col("user_id"), col("n"))

  /** Streaming dedup on a content key within the watermark horizon —
    * the streaming face of exact dedup (dropDuplicates keeps state per key
    * until the watermark passes it).
    */
  def dedupByKey(events: DataFrame, keyCol: String, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates(keyCol, "ts")
}
