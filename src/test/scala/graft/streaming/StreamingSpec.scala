package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

case class Ev(ts: Timestamp, event_type: String, user_id: Long, value: Double)

class StreamingSpec extends AnyFunSuite with SparkFixture {

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  test("hourlyEventCounts: streaming result equals the batch twin") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = (0 until 600).map(i => Ev(ts(i), if (i % 3 == 0) "click" else "view", i % 7, i * 0.5))

    val stream = MemoryStream[Ev]
    val q = Streaming.hourlyEventCounts(stream.toDF())
      .writeStream.format("memory").queryName("hourly").outputMode("complete").start()
    try {
      stream.addData(events)
      q.processAllAvailable()
      val got = spark.table("hourly")
        .select($"hour", $"event_type", $"n", $"value_c")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      // batch twin over the same rows
      val want = spark.createDataset(events).toDF()
        .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
        .agg(count(lit(1)).as("n"),
          sum(graft.functions.GraftFunctions.cents($"value")).as("value_c"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == want)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("dedupByKey drops in-horizon duplicates") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = (0 until 100).map(i => Ev(ts(i), s"k${i % 10}", i % 10, 1.0))
    val stream = MemoryStream[Ev]
    val q = Streaming.dedupByKey(stream.toDF(), "event_type")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      stream.addData(base ++ base) // exact duplicates (same key AND ts)
      q.processAllAvailable()
      assert(spark.table("dedup").count() == base.size)
    } finally q.stop()
  }
}

class MultimodalSpec extends AnyFunSuite with SparkFixture {
  import graft.multimodal.Multimodal

  test("feature extraction: deterministic, fixed width, batched") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "image", Array[Byte](0, 15, 16, 31, 32), 64, 64, "fake"),
      Multimodal.MediaRow(2L, "audio", "hello world".getBytes("UTF-8"), 0, 0, "fake"),
      Multimodal.MediaRow(3L, "image", Array.empty[Byte], 0, 0, "fake"))
    val feats = Multimodal.extractFeatures(spark.createDataset(media)).collect()
      .sortBy(_.media_id)
    assert(feats.length == 3)
    assert(feats.forall(_.features.length == Multimodal.FakeCodec.FeatureDim))
    // deterministic: same input twice → identical features
    val again = Multimodal.extractFeatures(spark.createDataset(media)).collect().sortBy(_.media_id)
    assert(feats.map(_.features.toSeq).toSeq == again.map(_.features.toSeq).toSeq)
    // empty payload → all zeros
    assert(feats(2).features.forall(_ == 0f))
  }

  test("featureSummary over the documents table") {
    val df = Multimodal.featureSummary(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.length == 2) // image + audio kinds
    assert(rows.map(_.getLong(1)).sum > 0)
  }
}
