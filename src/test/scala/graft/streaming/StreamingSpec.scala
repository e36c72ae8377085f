package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

case class Ev(ts: Timestamp, event_type: String, user_id: Long, value: Double)
case class Rd(readName: String, contig: String, pos: Long, rev: Int, ts: Timestamp)
case class IdEv(event_id: Long, ts: Timestamp, event_type: String, user_id: Long, value: Double)
case class VcfGt(sample: String, gt: String, fields: Map[String, String])
case class VcfSite(contig: String, start: Int, genotypes: Seq[VcfGt])
case class QualRead(readName: String, qual: String)
case class RgRead(rg: String, contig: String)
case class FqRead(readName: String, seq: String, qual: String)
case class TumorVar(contig: String, start: Int, af_pm: Long)

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

  test("hourlyEventCounts: restart from checkpoint neither drops nor double-counts") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val events = (0 until 600).map(i =>
      Ev(ts(i), if (i % 3 == 0) "click" else "view", i % 7, i * 0.5))
    val stream = MemoryStream[Ev]
    def start() = Streaming.hourlyEventCounts(stream.toDF())
      .writeStream.format("memory").queryName("hourly_ckpt")
      .option("checkpointLocation", ckpt)
      .outputMode("complete").start()
    val q1 = start()
    stream.addData(events.take(300)); q1.processAllAvailable()
    q1.stop() // simulated driver loss mid-stream
    val q2 = start() // recovery: offsets + state come from the checkpoint
    try {
      stream.addData(events.drop(300)); q2.processAllAvailable()
      val got = spark.table("hourly_ckpt")
        .select($"hour", $"event_type", $"n", $"value_c")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      val want = spark.createDataset(events).toDF()
        .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
        .agg(count(lit(1)).as("n"),
          sum(graft.functions.GraftFunctions.cents($"value")).as("value_c"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == want,
        "post-restart totals diverge from the batch truth — state or offsets were lost/replayed")
    } finally q2.stop()
  }

  test("windowedQuantiles: restart from checkpoint rebuilds the HISTOGRAM state") {
    // the native TypedImperativeAggregate's buffer lives in the state
    // store across micro-batches — this pins that serialize → checkpoint
    // → restore → merge round-trips the histogram (a buffer-layout or
    // serialization change that breaks recovery passes the stateless
    // equality test but fails here)
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-hq").toString
    val events = (0 until 600).map { i =>
      Ev(Timestamp.valueOf(f"2026-01-05 ${10 + i % 3}%02d:15:00"),
        if (i % 2 == 0) "view" else "sale", i % 9, (i * i % 97) * 0.5)
    }
    val stream = MemoryStream[Ev]
    def start() = Streaming.windowedQuantiles(stream.toDF())
      .writeStream.format("memory").queryName("wq_ckpt")
      .option("checkpointLocation", ckpt)
      .outputMode("complete").start()
    val q1 = start()
    stream.addData(events.take(300)); q1.processAllAvailable()
    q1.stop() // simulated driver loss with live histogram buffers
    val q2 = start()
    try {
      stream.addData(events.drop(300)); q2.processAllAvailable()
      val got = spark.table("wq_ckpt").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      graft.functions.HistQuantileAgg.register(spark)
      val want = spark.createDataset(events).toDF()
        .select(date_trunc("hour", $"ts").as("hour"), $"event_type",
          graft.functions.GraftFunctions.cents($"value").as("value_c"))
        .groupBy($"hour", $"event_type")
        .agg(expr("graft_hist_quantile(value_c, 1, 500)").as("median_c"),
          expr("graft_hist_quantile(value_c, 1, 900)").as("p90_c"),
          count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      assert(got == want,
        "post-restart quantiles diverge from batch truth — histogram state lost in recovery")
    } finally q2.stop()
  }

  test("pathing: streaming transitions equal the batch lead() window") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // user count (7) coprime with the type cycle (3): every user sees a
    // VARYING type sequence, so the transition counts are order-SENSITIVE
    // (with 3 | users each user would emit only (T,T) pairs and any
    // processing order would pass). ts = i/4 gives in-order arrival with
    // timestamp ties, which the event_id tie-break must resolve like the
    // batch window; cross-batch out-of-order arrivals are the documented
    // arrival-order divergence and are deliberately not fed here.
    val events = (0 until 400).map(i =>
      IdEv(i, ts(i / 4), Seq("view", "click", "purchase")(i % 3), i % 7, 1.0))

    val stream = MemoryStream[IdEv]
    val q = Streaming.pathing(stream.toDF())
      .writeStream.format("memory").queryName("pathing").outputMode("append").start()
    try {
      // two batches: transitions must also link ACROSS the batch boundary
      stream.addData(events.take(200)); q.processAllAvailable()
      stream.addData(events.drop(200)); q.processAllAvailable()
      val got = spark.table("pathing")
        .groupBy($"from_type", $"to_type").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts", $"event_id")
      val want = spark.createDataset(events).toDF()
        .withColumn("to_type", lead($"event_type", 1).over(w))
        .filter($"to_type".isNotNull)
        .groupBy($"event_type".as("from_type"), $"to_type").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(got == want)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("cmsSketch: streaming grid equals the batch cells, estimate ≥ exact") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = (0 until 500).map(i => Ev(ts(i % 60), "click", i % 11, 1.0))

    val stream = MemoryStream[Ev]
    val q = Streaming.cmsSketch(stream.toDF(), "user_id")
      .writeStream.format("memory").queryName("cms").outputMode("complete").start()
    try {
      stream.addData(events)
      q.processAllAvailable()
      val got = spark.table("cms")
        .collect().map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
      // batch twin: the shared probe-cell definition over the same rows
      val cells = graft.functions.GraftFunctions.cmsCells($"user_id", 1024L)
      val want = spark.createDataset(events).toDF()
        .select(date_trunc("hour", $"ts").as("hour"),
          posexplode(array(cells: _*)).as(Seq("row", "cell")))
        .groupBy($"hour", $"row", $"cell").agg(count(lit(1)).as("cnt"))
        .collect().map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == want)
      // the CMS guarantee on the assembled sketch: estimate ≥ exact count
      val sketch = got.groupBy(t => (t._2, t._3)).map { case (k, v) => k -> v.map(_._4).sum }
      val exact = events.groupBy(_.user_id).map { case (u, es) => u -> es.size.toLong }
      exact.foreach { case (u, n) =>
        val est = (0 until 4).map { j =>
          val cell = java.lang.Long.parseLong(
            new java.math.BigInteger(
              java.security.MessageDigest.getInstance("MD5")
                .digest(s"cms$j|$u".getBytes("UTF-8")).map("%02x".format(_)).mkString
                .substring(0, 15), 16).toString) % 1024L
          sketch.getOrElse((j, cell), 0L)
        }.min
        assert(est >= n, s"user $u: estimate $est < exact $n")
      }
    } finally q.stop()
  }

  test("sessionize: streaming session_window equals the batch twin") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // 3 users, bursts with >30m gaps between them
    val events = (0 until 300).map { i =>
      val burst = i / 100           // 0,1,2
      val within = i % 100          // minutes inside the burst
      Ev(ts(burst * 200 + within / 3), "click", i % 3, 1.0)
    }
    val stream = MemoryStream[Ev]
    val q = Streaming.sessionize(stream.toDF())
      .writeStream.format("memory").queryName("sessions").outputMode("complete").start()
    try {
      stream.addData(events)
      q.processAllAvailable()
      val got = spark.table("sessions")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3), r.getLong(4))).toSet
      val want = spark.createDataset(events).toDF()
        .groupBy(session_window($"ts", "30 minutes").as("sw"), $"user_id")
        .agg(count(lit(1)).as("n_events"),
          sum(graft.functions.GraftFunctions.cents($"value")).as("value_c"))
        .collect().map(r => (r.getAs[Long]("user_id"),
          r.getStruct(0).getTimestamp(0), r.getAs[Long]("n_events"), r.getAs[Long]("value_c"))).toSet
      assert(got == want)
      assert(got.size >= 9, s"3 users x 3 bursts expected, got ${got.size}") // sessions split at gaps
    } finally q.stop()
  }

  test("enrich: stream-static broadcast join matches batch join") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = (0 until 100).map(i => Ev(ts(i), "click", i % 5, 1.0))
    val dim = Seq((0L, "gold"), (1L, "silver"), (2L, "bronze")).toDF("user_id", "tier")
    val stream = MemoryStream[Ev]
    val q = Streaming.enrich(stream.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    try {
      stream.addData(events)
      q.processAllAvailable()
      val got = spark.table("enriched").groupBy($"tier").count()
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == Map("gold" -> 20L, "silver" -> 20L, "bronze" -> 20L, (null: String) -> 40L))
    } finally q.stop()
  }

  test("slidingRevenue: streaming 7-day windows equal the batch trailing sums") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // events across ~20 days with day gaps (day 7 empty) so the sliding
    // windows genuinely differ from a per-day rollup
    val events = (0 until 500).map { i =>
      val day = (i % 21) match { case 7 => 8; case dd => dd }
      Ev(Timestamp.valueOf(f"2026-01-${day + 1}%02d 12:00:00"), "sale", i % 9, i * 0.25)
    }
    val stream = MemoryStream[Ev]
    val q = Streaming.slidingRevenue(stream.toDF())
      .writeStream.format("memory").queryName("sliding").outputMode("complete").start()
    try {
      stream.addData(events.take(250)); q.processAllAvailable()
      stream.addData(events.drop(250)); q.processAllAvailable()
      val got = spark.table("sliding")
        .collect().map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2), r.getLong(3))).toSet
      // batch twin: expand each event into the 7 windows covering it
      val want = spark.createDataset(events).toDF()
        .select($"ts", $"value",
          explode(sequence(lit(0), lit(6))).as("k"))
        .select(
          (date_trunc("day", $"ts").cast("long") - $"k" * 86400L).cast("timestamp").as("win_start"),
          $"value")
        .groupBy($"win_start")
        .agg(count(lit(1)).as("n_events"),
          sum(graft.functions.GraftFunctions.cents($"value")).as("rev_c"))
        .select($"win_start",
          ($"win_start".cast("long") + 7 * 86400L).cast("timestamp").as("win_end"),
          $"n_events", $"rev_c")
        .collect().map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == want)
      assert(got.size > 20) // every covering window surfaced, not just per-day rows
    } finally q.stop()
  }

  test("windowedQuantiles: streaming exact medians equal the batch aggregate") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // skewed values across 3 hours × 2 types so medians differ per group;
    // delivered across two triggers so state-store buffer serialize/merge
    // is actually exercised
    val events = (0 until 600).map { i =>
      Ev(Timestamp.valueOf(f"2026-01-05 ${10 + i % 3}%02d:15:00"),
        if (i % 2 == 0) "view" else "sale", i % 9, (i * i % 97) * 0.5)
    }
    val stream = MemoryStream[Ev]
    val q = Streaming.windowedQuantiles(stream.toDF())
      .writeStream.format("memory").queryName("wq").outputMode("complete").start()
    try {
      stream.addData(events.take(300)); q.processAllAvailable()
      stream.addData(events.drop(300)); q.processAllAvailable()
      val got = spark.table("wq").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      graft.functions.HistQuantileAgg.register(spark)
      val want = spark.createDataset(events).toDF()
        .select(date_trunc("hour", $"ts").as("hour"), $"event_type",
          graft.functions.GraftFunctions.cents($"value").as("value_c"))
        .groupBy($"hour", $"event_type")
        .agg(expr("graft_hist_quantile(value_c, 1, 500)").as("median_c"),
          expr("graft_hist_quantile(value_c, 1, 900)").as("p90_c"),
          count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      assert(got == want)
      assert(got.size == 6)
    } finally q.stop()
  }

  test("decontamGate: streaming Bloom hits equal the batch prefilter") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    graft.functions.FingerprintsExpr.register(spark)
    val holdoutTexts = (0 until 5).map(i =>
      s"the quick brown fox $i jumps over the lazy dog wearing hat $i again today somehow")
    // every 4th stream doc replays a holdout text verbatim — those must
    // flag; the fresh docs share no 8-gram window with the holdout
    val docs = (0 until 40).map { i =>
      val text = if (i % 4 == 0) holdoutTexts(i % 5)
        else s"completely fresh content $i with plenty of distinct words to fingerprint nicely ${i * 7} and ${i * 13}"
      (i.toLong, ts(i), text)
    }
    val holdoutFps = holdoutTexts.toDF("text")
      .select(explode(expr("graft_fingerprints(text)")).as("fp"))
    val mBits = graft.queries.BloomFilter.sizeFor(math.max(64L, holdoutFps.count()))
    val bloom = graft.queries.BloomFilter.build(holdoutFps, "fp", mBits)
    val stream = MemoryStream[(Long, Timestamp, String)]
    val q = Streaming.decontamGate(
        stream.toDF().toDF("doc_id", "ts", "text"), bloom, mBits)
      .writeStream.format("memory").queryName("decontam").outputMode("complete").start()
    try {
      stream.addData(docs.take(20)); q.processAllAvailable()
      stream.addData(docs.drop(20)); q.processAllAvailable()
      val got = spark.table("decontam")
        .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
      val want = docs.toDF("doc_id", "ts", "text")
        .select(date_trunc("hour", $"ts").as("hour"), $"doc_id",
          explode(expr("graft_fingerprints(text)")).as("fp"))
        .crossJoin(broadcast(bloom))
        .filter(graft.queries.BloomFilter.mightContain($"bloom", $"fp", mBits))
        .groupBy($"hour", $"doc_id").agg(count(lit(1)).as("n_hits"))
        .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want)
      val flagged = got.map(_._2)
      assert((0 until 40 by 4).forall(i => flagged.contains(i.toLong)),
        s"a replayed holdout doc escaped the gate: $flagged")
      assert(flagged.size < 40, "every doc flagged — the Bloom gate is not selective")
    } finally q.stop()
  }

  test("vocabCoverage: streaming OOV rollup equals the batch twin") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // two langs, drifting token mix: later docs introduce terms outside
    // the frozen vocab so the per-window oov_ppm actually moves
    val docs = (0 until 240).map { i =>
      val lang = if (i % 2 == 0) "en" else "de"
      val text = if (i < 120) s"alpha beta gamma t$lang" else s"alpha zz$i qq${i % 7} beta"
      (i.toLong, ts(i), lang, text)
    }
    val vocab = Seq("alpha", "beta", "gamma", "ten", "tde").toDF("term")
    val stream = MemoryStream[(Long, Timestamp, String, String)]
    val q = Streaming.vocabCoverage(
        stream.toDF().toDF("doc_id", "ts", "lang", "text"), vocab)
      .writeStream.format("memory").queryName("vocabcov").outputMode("complete").start()
    try {
      stream.addData(docs.take(100)); q.processAllAvailable()
      stream.addData(docs.drop(100)); q.processAllAvailable()
      val got = spark.table("vocabcov")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      val want = docs.toDF("doc_id", "ts", "lang", "text")
        .select(date_trunc("hour", $"ts").as("hour"), $"lang",
          explode(filter(split($"text", " "), w => length(w) > 0)).as("term"))
        .join(broadcast(vocab.withColumn("in_vocab", lit(1L))), Seq("term"), "left")
        .groupBy($"hour", $"lang")
        .agg(count(lit(1)).as("n_tok"),
          sum(when($"in_vocab".isNull, 1L).otherwise(0L)).as("n_oov"))
        .select($"hour", $"lang", $"n_tok", $"n_oov",
          expr("n_oov * 1000000 div n_tok").as("oov_ppm"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(got == want)
      // the drift actually registers: some window has a nonzero OOV rate
      assert(got.exists(_._5 > 0))
      assert(got.size >= 4) // ≥2 hours × 2 langs
    } finally q.stop()
  }

  test("attribution: stream-stream interval join equals the batch join") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // views every minute across 5 users; purchases every 3 minutes offset 1
    val views = (0 until 120).map(i => IdEv(1000L + i, ts(i), "view", i % 5, i * 1.0))
    val purch = (0 until 40).map(i => IdEv(2000L + i, ts(i * 3 + 1), "purchase", i % 5, 0.0))
    val vs = MemoryStream[IdEv]
    val ps = MemoryStream[IdEv]
    val q = Streaming.attribution(vs.toDF(), ps.toDF(), horizonSec = 1800L)
      .writeStream.format("memory").queryName("attrib").outputMode("append").start()
    try {
      vs.addData(views)
      ps.addData(purch)
      q.processAllAvailable()
      val got = spark.table("attrib")
        .select($"purchase_id", $"v_ts").as[(Long, Timestamp)].collect().toSet
      val expected = purch.toDF().as("p").join(views.toDF().as("v"),
        $"p.user_id" === $"v.user_id" && $"v.ts" <= $"p.ts" &&
          $"v.ts" >= $"p.ts" - expr("INTERVAL 1800 SECONDS"))
        .select($"p.event_id", $"v.ts").as[(Long, Timestamp)].collect().toSet
      assert(got.nonEmpty && got == expected)
    } finally q.stop()
  }

  test("pairMates: stateful reunification matches the batch SV classification") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // 40 templates spanning all four classes, mates split ACROSS batches
    // in shuffled order; template t39 is a planted widow (no second mate)
    def mates(i: Int): (Rd, Rd) = {
      val c1 = s"chr${i % 3}"
      val c2 = if (i % 11 == 0) s"chr${(i + 1) % 3}" else c1
      val gap = if (i % 7 == 0) 20000L + i else 200L + i
      val rev2 = if (i % 13 == 0) 0 else 1
      (Rd(s"t$i", c1, 1000L + i * 37, 0, ts(i)),
        Rd(s"t$i", c2, 1000L + i * 37 + gap, rev2, ts(i + 1)))
    }
    val pairs = (0 until 40).map(mates)
    val first = pairs.map(_._1) :+ Rd("t39w", "chr0", 500L, 0, ts(5))
    val second = pairs.map(_._2)
    val stream = MemoryStream[Rd]
    val q = Streaming.pairMates(stream.toDF(), idleTtlMs = Some(60L * 60000))
      .writeStream.format("memory").queryName("mates").outputMode("append").start()
    try {
      stream.addData(scala.util.Random.shuffle(first))
      q.processAllAvailable()
      stream.addData(scala.util.Random.shuffle(second))
      q.processAllAvailable()
      // push the watermark far past every template + TTL: the widow orphans
      stream.addData(Rd("wm", "chr0", 1L, 0, ts(100000)))
      q.processAllAvailable()
      val got = spark.table("mates")
        .select($"template", $"sv_class").as[(String, String)].collect().toMap
      val expected = (0 until 40).map { i =>
        val cls =
          if (i % 11 == 0) "interchrom"
          else if (i % 7 == 0) "long_insert"
          else if (i % 13 == 0) "inverted"
          else "proper"
        s"t$i" -> cls
      }.toMap
      assert((0 until 40).forall(i => got.get(s"t$i") == expected.get(s"t$i")),
        s"got=$got")
      assert(got.get("t39w").contains("orphan"), s"widow not surfaced: $got")
      assert(Set("interchrom", "long_insert", "inverted", "proper")
        .subsetOf(expected.values.toSet), "test data must cover all classes")
    } finally q.stop()
  }

  test("attributionOuter: unmatched purchases emit null-side rows after watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // views only for users 0-2; purchases for users 0-4, so users 3-4 are
    // structurally unattributable and must surface via the outer side
    val views = (0 until 60).map(i => IdEv(1000L + i, ts(i), "view", i % 3, i * 1.0))
    val purch = (0 until 20).map(i => IdEv(2000L + i, ts(i * 3 + 1), "purchase", i % 5, 0.0))
    val vs = MemoryStream[IdEv]
    val ps = MemoryStream[IdEv]
    val q = Streaming.attributionOuter(vs.toDF(), ps.toDF(), horizonSec = 1800L)
      .writeStream.format("memory").queryName("attrib_outer").outputMode("append").start()
    try {
      vs.addData(views)
      ps.addData(purch)
      q.processAllAvailable()
      // outer null-side rows only finalize once event time proves no view
      // can still match: push both watermarks far past every purchase
      vs.addData(IdEv(9990L, ts(3000), "view", 99, 0.0))
      ps.addData(IdEv(9991L, ts(3000), "purchase", 99, 0.0))
      q.processAllAvailable()
      vs.addData(IdEv(9992L, ts(6000), "view", 99, 0.0))
      ps.addData(IdEv(9993L, ts(6000), "purchase", 99, 0.0))
      q.processAllAvailable()
      val got = spark.table("attrib_outer")
        .filter($"purchase_id" < 9000)
        .select($"purchase_id", $"unattributed").as[(Long, Boolean)].collect()
      val expected = purch.toDF().as("p").join(views.toDF().as("v"),
        $"p.user_id" === $"v.user_id" && $"v.ts" <= $"p.ts" &&
          $"v.ts" >= $"p.ts" - expr("INTERVAL 1800 SECONDS"), "left_outer")
        .select($"p.event_id", $"v.ts".isNull).as[(Long, Boolean)].collect()
      assert(got.sorted.toSeq == expected.sorted.toSeq)
      assert(got.exists(_._2), "no unattributed purchase surfaced")
      assert(got.exists(!_._2), "no attributed purchase surfaced")
    } finally q.stop()
  }

  test("spikes: streaming rolling anomaly equals the batch rolling-window test") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // hour h carries (h % 5) + 1 events, except hour 28 spikes at 12
    def countAt(h: Int): Int = if (h == 28) 12 else (h % 5) + 1
    val evs = (0 until 32).flatMap { h =>
      (0 until countAt(h)).map(j => Ev(ts(h * 60 + j % 60), "click", j, 1.0))
    }
    val stream = MemoryStream[Ev]
    val q = Streaming.spikes(stream.toDF())
      .writeStream.format("memory").queryName("spikes").outputMode("append").start()
    try {
      stream.addData(evs)
      q.processAllAvailable()
      // watermark push: a far-future event finalizes every loaded hour
      stream.addData(Ev(ts(40 * 60), "click", 0, 1.0))
      q.processAllAvailable()
      val got = spark.table("spikes")
        .select($"hour_ms", $"n", $"prev_sum").as[(Long, Long, Long)].collect().toSet
      // the batch query's exact formula over the same hourly series
      val expected = (24 until 32).flatMap { h =>
        val n = countAt(h).toLong
        val prevSum = (h - 24 until h).map(countAt(_).toLong).sum
        if (n * 24 * 2 >= prevSum * 3) Some((ts(h * 60).getTime, n, prevSum)) else None
      }.toSet
      assert(got == expected, s"got=$got expected=$expected")
      assert(got.exists(_._1 == ts(28 * 60).getTime), "planted spike not flagged")
    } finally q.stop()
  }

  test("spikes: the finalized baseline survives an idle gap (batch rows-frame)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // 25 quiet baseline hours (1 event each), then a >25h GAP with no
    // events for this type, then a spiking hour. The batch rows-frame
    // rolls over hours PRESENT in the series, so the post-gap hour must
    // still flag against the pre-gap baseline — state that dropped its
    // ring on idle timeout would emit nothing for another 24 hours.
    val base = (0 until 25).map(h => Ev(ts(h * 60), "click", 0, 1.0))
    val spike = (0 until 9).map(j => Ev(ts(60 * 60 + j), "click", j, 1.0))
    val stream = MemoryStream[Ev]
    val q = Streaming.spikes(stream.toDF())
      .writeStream.format("memory").queryName("spikes_gap").outputMode("append").start()
    try {
      stream.addData(base)
      q.processAllAvailable()
      // idle wake-ups during the gap (watermark advances, timeout fires)
      stream.addData(Ev(ts(59 * 60), "other", 0, 1.0))
      q.processAllAvailable()
      stream.addData(spike)
      q.processAllAvailable()
      stream.addData(Ev(ts(70 * 60), "click", 0, 1.0)) // finalize the spike hour
      q.processAllAvailable()
      val got = spark.table("spikes_gap").filter($"event_type" === "click")
        .select($"hour_ms", $"n", $"prev_sum").as[(Long, Long, Long)].collect().toSet
      // prev = the 24 series-hours before hour 60 = baseline hours 1..24
      assert(got.contains((ts(60 * 60).getTime, 9L, 24L)),
        s"post-gap spike lost its pre-gap baseline: $got")
    } finally q.stop()
  }

  test("latestState: streaming upsert converges to the batch latest-event winners") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // batch 1: events at minutes 0..59; batch 2: later events that
    // overtake every user's winner, plus one stale arrival that must not
    val b1 = (0 until 60).map(i => IdEv(100L + i, ts(i), s"t${i % 3}", i % 5, i * 1.0))
    val b2 = (0 until 5).map(u => IdEv(500L + u, ts(120 + u), "late", u, 9.0)) :+
      IdEv(999L, ts(1), "stale", 0, 1.0)
    val stream = MemoryStream[IdEv]
    val q = Streaming.latestState(stream.toDF())
      .writeStream.format("memory").queryName("latest").outputMode("append").start()
    try {
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val emitted = spark.table("latest")
        .select($"user_id", $"event_id", $"event_type", $"value_c")
        .as[(Long, Long, String, Long)].collect().toSet
      // the batch winners over ALL data must each have been emitted
      val winners = (b1 ++ b2).groupBy(_.user_id).map { case (u, evs) =>
        val w = evs.maxBy(e => (e.ts.getTime, e.event_id))
        (u, w.event_id, w.event_type, math.round(w.value * 100))
      }.toSet
      assert(winners.subsetOf(emitted), s"missing winners: ${winners -- emitted}")
      // the stale arrival never became anyone's state
      assert(!emitted.exists(_._2 == 999L), emitted)
    } finally q.stop()
  }

  test("userProfiles: custom state accumulates across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = Streaming.userProfiles(stream.toDF())
      .writeStream.format("memory").queryName("profiles").outputMode("append").start()
    try {
      stream.addData((0 until 10).map(i => Ev(ts(i), "click", 1, 1.0)))
      q.processAllAvailable()
      stream.addData((0 until 5).map(i => Ev(ts(i), "view", 1, 1.0)))
      q.processAllAvailable()
      val rows = spark.table("profiles")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // first batch: 10 clicks; second batch: state carried over → 15 events, 2 types
      assert(rows.contains((1L, 10L, 1L)), rows)
      assert(rows.contains((1L, 15L, 2L)), rows)
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

  test("funnel: streaming state machine equals the batch per-stage min-joins") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // users exercising every shape: full funnel, view-only, click-before-
    // view (ignored), purchase-before-click (ignored), multiple clicks
    // (first AFTER the view wins, not the first overall)
    val events = Seq(
      Ev(ts(10), "view", 1, 1.0), Ev(ts(20), "click", 1, 1.0), Ev(ts(30), "purchase", 1, 1.0),
      Ev(ts(10), "view", 2, 1.0), // view only
      Ev(ts(5), "click", 3, 1.0), Ev(ts(10), "view", 3, 1.0), Ev(ts(40), "click", 3, 1.0),
      Ev(ts(5), "purchase", 4, 1.0), Ev(ts(10), "view", 4, 1.0), Ev(ts(20), "click", 4, 1.0),
        Ev(ts(60), "purchase", 4, 1.0),
      Ev(ts(10), "view", 5, 1.0), Ev(ts(12), "click", 5, 1.0), Ev(ts(25), "click", 5, 1.0),
        Ev(ts(26), "purchase", 5, 1.0))
    val stream = MemoryStream[Ev]
    val q = Streaming.funnel(stream.toDF())
      .writeStream.format("memory").queryName("funnel").outputMode("append").start()
    try {
      // two batches split at t=15, respecting cross-batch event order
      val (b1, b2) = events.partition(_.ts.getTime <= ts(15).getTime)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      // latest emitted row per user = the funnel state
      val got = spark.table("funnel")
        .groupBy($"user_id")
        .agg(max_by(struct($"t_view_ms", $"t_click_ms", $"t_purchase_ms"),
          struct(coalesce($"t_purchase_ms", lit(-1L)), coalesce($"t_click_ms", lit(-1L)),
            coalesce($"t_view_ms", lit(-1L)))).as("s"))
        .select($"user_id", $"s.*")
        .collect().map(r => r.getLong(0) ->
          ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))).toMap
      def ms(min: Int): Long = ts(min).getTime
      assert(got(1L) == ((Some(ms(10)), Some(ms(20)), Some(ms(30)))))
      assert(got(2L) == ((Some(ms(10)), None, None)))
      assert(got(3L) == ((Some(ms(10)), Some(ms(40)), None)))
      assert(got(4L) == ((Some(ms(10)), Some(ms(20)), Some(ms(60)))))
      assert(got(5L) == ((Some(ms(10)), Some(ms(12)), Some(ms(26)))))
      // batch twin agrees on the same complete data
      val ev = spark.createDataset(events).toDF()
        .select($"user_id", $"event_type", unix_millis($"ts").as("ms"))
      val v = ev.filter($"event_type" === "view").groupBy($"user_id").agg(min($"ms").as("tv"))
      val c = ev.filter($"event_type" === "click").join(v, "user_id")
        .filter($"ms" > $"tv").groupBy($"user_id").agg(min($"ms").as("tc"))
      val p = ev.filter($"event_type" === "purchase").join(c, "user_id")
        .filter($"ms" > $"tc").groupBy($"user_id").agg(min($"ms").as("tp"))
      val want = v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
        .collect().map(r => r.getLong(0) ->
          ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))).toMap
      assert(got == want)
    } finally q.stop()
  }

  test("funnel: event-time TTL evicts idle users; a return starts a fresh funnel") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Ev]
    // 1h watermark delay + 1h idle TTL
    val q = Streaming.funnel(stream.toDF(), watermark = "1 hour",
        idleTtlMs = Some(3600000L))
      .writeStream.format("memory").queryName("funnel_ttl").outputMode("append").start()
    try {
      def rowsFor(uid: Long): Set[(Option[Any], Option[Any], Option[Any])] =
        spark.table("funnel_ttl").filter($"user_id" === uid)
          .collect().map(r => (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toSet
      def ms(min: Int): Long = ts(min).getTime
      // user 1 reaches view+click at t≈20m
      stream.addData(Seq(Ev(ts(10), "view", 1, 1.0), Ev(ts(20), "click", 1, 1.0)))
      q.processAllAvailable()
      assert(rowsFor(1L) == Set((Some(ms(10)), Some(ms(20)), None)))
      // an unrelated user 10h later advances the watermark to 9h — far past
      // user 1's newest event (20m) + 1h TTL; the NEXT batch fires timeouts
      stream.addData(Seq(Ev(ts(600), "view", 99, 1.0)))
      q.processAllAvailable()
      stream.addData(Seq(Ev(ts(601), "view", 98, 1.0)))
      q.processAllAvailable()
      // user 1's purchase after eviction must NOT complete the old funnel
      // (fresh state: purchase without a prior click is ignored, no row)
      stream.addData(Seq(Ev(ts(602), "purchase", 1, 1.0)))
      q.processAllAvailable()
      assert(rowsFor(1L) == Set((Some(ms(10)), Some(ms(20)), None)),
        s"evicted funnel state leaked: ${rowsFor(1L)}")
      // a later view starts a FRESH funnel
      stream.addData(Seq(Ev(ts(603), "view", 1, 1.0)))
      q.processAllAvailable()
      assert(rowsFor(1L) == Set(
        (Some(ms(10)), Some(ms(20)), None),
        (Some(ms(603)), None, None)), rowsFor(1L).toString)
    } finally q.stop()
  }

  test("funnel: DEFAULT TTL is on — a user idle past 30d of event time is evicted") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // no idleTtlMs argument: the default contract must bound state
    assert(Streaming.DefaultIdleTtlMs == 30L * 24 * 3600 * 1000)
    val stream = MemoryStream[Ev]
    val q = Streaming.funnel(stream.toDF(), watermark = "1 hour")
      .writeStream.format("memory").queryName("funnel_default_ttl")
      .outputMode("append").start()
    try {
      val base = ts(10).getTime
      def dayTs(d: Int): Timestamp = new Timestamp(base + d * 86400000L)
      def rowsFor(uid: Long): Set[(Option[Any], Option[Any], Option[Any])] =
        spark.table("funnel_default_ttl").filter($"user_id" === uid)
          .collect().map(r => (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toSet
      stream.addData(Seq(Ev(dayTs(0), "view", 1, 1.0), Ev(new Timestamp(base + 60000L), "click", 1, 1.0)))
      q.processAllAvailable()
      assert(rowsFor(1L) == Set((Some(base), Some(base + 60000L), None)))
      // 40 days later an unrelated user advances the watermark far past
      // user 1's newest event + the 30d default; the next batch evicts
      stream.addData(Seq(Ev(dayTs(40), "view", 99, 1.0)))
      q.processAllAvailable()
      stream.addData(Seq(Ev(dayTs(41), "view", 98, 1.0)))
      q.processAllAvailable()
      // the purchase after default-horizon eviction cannot complete the
      // old funnel (fresh state: purchase without a click is ignored)
      stream.addData(Seq(Ev(dayTs(42), "purchase", 1, 1.0)))
      q.processAllAvailable()
      assert(rowsFor(1L) == Set((Some(base), Some(base + 60000L), None)),
        s"default TTL did not evict: ${rowsFor(1L)}")
    } finally q.stop()
  }

  test("userProfiles: event-time TTL evicts idle users; a return starts fresh") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = Streaming.userProfiles(stream.toDF(), idleTtlMs = Some(3600000L),
        watermark = "1 hour")
      .writeStream.format("memory").queryName("profiles_ttl").outputMode("append").start()
    try {
      def rowsFor(uid: Long): Set[(Long, Long)] =
        spark.table("profiles_ttl").filter($"user_id" === uid)
          .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
      stream.addData((0 until 10).map(i => Ev(ts(i), "click", 1, 1.0)))
      q.processAllAvailable()
      assert(rowsFor(1L) == Set((10L, 1L)))
      // advance the watermark far past user 1's newest event + TTL, then
      // give timeouts a batch to fire
      stream.addData(Seq(Ev(ts(600), "view", 99, 1.0)))
      q.processAllAvailable()
      stream.addData(Seq(Ev(ts(601), "view", 98, 1.0)))
      q.processAllAvailable()
      // the returning user accumulates from scratch — 1 event, not 11
      stream.addData(Seq(Ev(ts(602), "click", 1, 1.0)))
      q.processAllAvailable()
      assert(rowsFor(1L) == Set((10L, 1L), (1L, 1L)),
        s"evicted profile state leaked: ${rowsFor(1L)}")
    } finally q.stop()
  }

  test("nearDupCandidates: streaming LSH pairs equal the batch band join") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // 40 docs over 10 templates → exact repeats share every band; all within
    // the watermark horizon so eviction can't fire during the equality check
    val docs = (0 until 40).map { i =>
      (i.toLong, s"alpha beta gamma delta t${i % 10} epsilon zeta eta theta word${i % 10}", ts(i))
    }
    val stream = MemoryStream[(Long, String, Timestamp)]
    val q = Streaming.nearDupCandidates(stream.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("neardup").outputMode("append").start()
    try {
      stream.addData(docs.take(20))
      q.processAllAvailable()
      stream.addData(docs.drop(20)) // state carries across micro-batches
      q.processAllAvailable()
      val got = spark.table("neardup")
        .select($"doc_a", $"doc_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch twin: band-hash self-join over the same documents
      graft.functions.MinhashSigExpr.register(spark)
      val banded = docs.toDF("doc_id", "text", "ts")
        .withColumn("sig", expr("graft_minhash_sig(text)"))
        .filter($"sig".isNotNull)
        .select($"doc_id",
          posexplode(transform(sequence(lit(0), lit(3)),
            b => graft.functions.GraftFunctions.hash60(concat_ws(",",
              transform(slice($"sig", b * lit(4) + 1, lit(4)),
                v => v.cast("string")))))).as(Seq("band", "bandhash")))
      val want = banded.as("a").join(banded.as("b"),
          $"a.band" === $"b.band" && $"a.bandhash" === $"b.bandhash" &&
            $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id", $"b.doc_id").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want)
      assert(got.size >= 60, s"10 templates x 4 identical copies → >=60 pairs, got ${got.size}")
    } finally q.stop()
  }

  test("nearDupCandidates: an over-cap arrival star-pairs with the bucket minimum") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tpl = "alpha beta gamma delta shared epsilon zeta eta theta words"
    val stream = MemoryStream[(Long, String, Timestamp)]
    // cap of 3: docs 1..3 fill the bucket with all pairs; doc 4 is over-cap
    val q = Streaming.nearDupCandidates(stream.toDF().toDF("doc_id", "text", "ts"),
        maxBucket = 3)
      .writeStream.format("memory").queryName("neardup_star").outputMode("append").start()
    try {
      def pairs(): Set[(Long, Long)] = spark.table("neardup_star")
        .select($"doc_a", $"doc_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      stream.addData(Seq((1L, tpl, ts(0)), (2L, tpl, ts(1)), (3L, tpl, ts(2))))
      q.processAllAvailable()
      assert(pairs() == Set(1L -> 2L, 1L -> 3L, 2L -> 3L))
      // doc 4 arrives at the full bucket: pre-fix it vanished from the
      // candidate graph entirely; the star rule links it to the minimum
      stream.addData(Seq((4L, tpl, ts(3))))
      q.processAllAvailable()
      assert(pairs() == Set(1L -> 2L, 1L -> 3L, 2L -> 3L, 1L -> 4L),
        s"over-cap arrival not star-paired: ${pairs()}")
      // and a fifth links to the same anchor — star shape, O(1) per arrival
      stream.addData(Seq((5L, tpl, ts(4))))
      q.processAllAvailable()
      assert(pairs().contains(1L -> 5L))
      assert(!pairs().contains(4L -> 5L), "over-cap arrivals must not pair with each other")
      // a late arrival SMALLER than every admitted member: it pairs with
      // the previous anchor, then becomes the anchor itself (running min
      // over all arrivals — converges to the batch rule's global minimum)
      stream.addData(Seq((0L, tpl, ts(5))))
      q.processAllAvailable()
      assert(pairs().contains(0L -> 1L), s"new-minimum arrival not linked: ${pairs()}")
      stream.addData(Seq((6L, tpl, ts(6))))
      q.processAllAvailable()
      assert(pairs().contains(0L -> 6L),
        s"anchor did not converge to the global bucket minimum: ${pairs()}")
    } finally q.stop()
  }

  test("fuzzyLinkHits: streaming link pairs equal the batch gram-block join") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // name families with small typo distances; every gram block stays far
    // below the cap so the prefix-cap and batch stop-gram semantics agree
    val names = (0 until 30).map(i => (s"host-${100 + i}.example", ts(i))) ++
      Seq(("host-100.exumple", ts(40)), ("gateway-7.net", ts(41)), ("gateway-9.net", ts(42)))
    val stream = MemoryStream[(String, Timestamp)]
    val q = Streaming.fuzzyLinkHits(stream.toDF().toDF("name", "ts"))
      .writeStream.format("memory").queryName("fuzzy").outputMode("append").start()
    try {
      stream.addData(names.take(20))
      q.processAllAvailable()
      stream.addData(names.drop(20)) // state carries across micro-batches
      q.processAllAvailable()
      val got = spark.table("fuzzy")
        .select($"name_a", $"name_b").distinct()
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      // batch twin: the q_fuzzy_linkage rule over the same names
      val n = names.toDF("name", "ts").filter(length($"name") >= 3)
      val g = n.select($"name", explode(array_distinct(expr(
        "transform(sequence(1, length(name) - 2), i -> substring(name, i, 3))"))).as("gram"))
      val want = g.as("a").join(g.as("b"), "gram")
        .filter($"a.name" < $"b.name")
        .select($"a.name".as("name_a"), $"b.name".as("name_b")).distinct()
        .withColumn("dist", levenshtein($"name_a", $"name_b"))
        .filter($"dist" <= 2)
        .select($"name_a", $"name_b")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(got == want, s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
      assert(got.exists { case (a, b) => a.contains("gateway") && b.contains("gateway") },
        "the gateway family should link")
    } finally q.stop()
  }

  test("nearDupCandidates: event-time TTL evicts stale buckets; arrivals re-open them") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tpl = "alpha beta gamma delta shared epsilon zeta eta theta words"
    def other(i: Int) = s"totally different unrelated content number$i with enough words here"
    val stream = MemoryStream[(Long, String, Timestamp)]
    // 1h watermark delay + 1h TTL (the defaults)
    val q = Streaming.nearDupCandidates(stream.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("neardup_ttl").outputMode("append").start()
    try {
      def pairs(): Set[(Long, Long)] = spark.table("neardup_ttl")
        .select($"doc_a", $"doc_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch 1: two copies of the template at t≈0 → pair (1,2)
      stream.addData(Seq((1L, tpl, ts(0)), (2L, tpl, ts(1))))
      q.processAllAvailable()
      assert(pairs() == Set((1L -> 2L)))
      // batch 2: an unrelated doc 10h later advances the watermark to 9h —
      // far past the template bucket's newest member (t=1m) + 1h TTL
      stream.addData(Seq((100L, other(0), ts(600))))
      q.processAllAvailable()
      // batch 3: another unrelated doc triggers the timed-out bucket's
      // eviction (timeouts fire in the batch after the watermark moves)
      stream.addData(Seq((101L, other(1), ts(601))))
      q.processAllAvailable()
      // batch 4: a fresh copy of the template re-opens the (now empty)
      // bucket — NO pair against 1/2 may appear; a second fresh copy then
      // pairs against the re-opened bucket's first member only
      stream.addData(Seq((3L, tpl, ts(602))))
      q.processAllAvailable()
      assert(pairs() == Set((1L -> 2L)), s"evicted bucket leaked state: ${pairs()}")
      stream.addData(Seq((4L, tpl, ts(603))))
      q.processAllAvailable()
      assert(pairs() == Set((1L, 2L), (3L, 4L)), pairs().toString)
    } finally q.stop()
  }

  test("nearDupCandidates: out-of-order members never pull the TTL earlier") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tpl = "alpha beta gamma delta shared epsilon zeta eta theta words"
    def other(i: Int) = s"totally different unrelated content number$i with enough words here"
    val stream = MemoryStream[(Long, String, Timestamp)]
    val q = Streaming.nearDupCandidates(stream.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("neardup_ooo").outputMode("append").start()
    try {
      def pairs(): Set[(Long, Long)] = spark.table("neardup_ooo")
        .select($"doc_a", $"doc_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // newest member at 10:05 → TTL anchor must stay 10:05 + 1h = 11:05
      stream.addData(Seq((1L, tpl, ts(600)), (2L, tpl, ts(605))))
      q.processAllAvailable()
      // out-of-order (but in-watermark) member at 9:35: pre-fix this reset
      // the timeout to 9:35 + 1h = 10:35, AHEAD of the newest member's TTL
      stream.addData(Seq((3L, tpl, ts(575))))
      q.processAllAvailable()
      // advance the watermark to 10:40 — past the buggy 10:35 timeout but
      // before the correct 11:05 one — and give timeouts a batch to fire
      stream.addData(Seq((100L, other(0), ts(700))))
      q.processAllAvailable()
      stream.addData(Seq((101L, other(1), ts(705))))
      q.processAllAvailable()
      // a 10:50 member is still inside the bucket's true TTL: it must pair
      // against ALL previous members — an early-evicted bucket would not
      stream.addData(Seq((4L, tpl, ts(650))))
      q.processAllAvailable()
      assert(Set((1L, 4L), (2L, 4L), (3L, 4L)).subsetOf(pairs()),
        s"bucket was evicted early: ${pairs()}")
    } finally q.stop()
  }

  private def salad(seed: String, n: Int): String =
    (0 until n).map(i => s"w${math.abs((seed + i).hashCode) % 5000}").mkString(" ")

  test("substrDupHits: streaming hits equal the batch registry") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // docs 1 and 2 share a 64-word paragraph; doc 3 is unrelated — all
    // inside the watermark horizon so eviction can't fire mid-check
    val para = salad("stream-shared", 64)
    val docs = Seq(
      (1L, s"${salad("s-one", 20)} $para ${salad("s-one-b", 20)}", ts(0)),
      (2L, s"${salad("s-two", 25)} $para", ts(5)),
      (3L, salad("s-three", 120), ts(10)))
    val stream = MemoryStream[(Long, String, Timestamp)]
    val q = Streaming.substrDupHits(stream.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("substrdup").outputMode("append").start()
    try {
      stream.addData(docs.take(1))
      q.processAllAvailable()
      stream.addData(docs.drop(1)) // state carries across micro-batches
      q.processAllAvailable()
      val got = spark.table("substrdup")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // batch twin: the q_dedup_substr registry over the same documents
      graft.functions.SubstrFpsExpr.register(spark)
      val reg = docs.toDF("doc_id", "text", "ts")
        .select($"doc_id", explode(expr("graft_substr_fps(text)")).as("fp"))
        .groupBy($"fp").agg(countDistinct($"doc_id").as("n"))
        .filter($"n" >= 2)
        .collect().map(_.getLong(0)).toSet
      assert(got.nonEmpty, "planted shared paragraph produced no streaming hits")
      assert(got.map(_._1) == reg, s"streaming fps ${got.map(_._1)} != batch registry $reg")
      assert(got.forall { case (_, d, f) => d == 2L && f == 1L },
        s"hit attributed outside the planted pair: $got")
    } finally q.stop()
  }

  test("substrDupHits: non-admitted arrivals past maxDocs still emit their hit") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val para = salad("cap-shared", 64)
    val stream = MemoryStream[(Long, String, Timestamp)]
    // cap of 2: docs 1-2 admit; doc 3 is over-cap but must still be flagged
    val q = Streaming.substrDupHits(stream.toDF().toDF("doc_id", "text", "ts"),
        maxDocs = 2)
      .writeStream.format("memory").queryName("substrdup_cap").outputMode("append").start()
    try {
      def hits(): Set[(Long, Long)] = spark.table("substrdup_cap")
        .select($"doc_id", $"first_doc").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      stream.addData(Seq((1L, para, ts(0)), (2L, para, ts(1))))
      q.processAllAvailable()
      assert(hits() == Set((2L, 1L)))
      // pre-fix, doc 3 vanished (cap reached); it must hit the first holder
      stream.addData(Seq((3L, para, ts(2))))
      q.processAllAvailable()
      assert(hits() == Set((2L, 1L), (3L, 1L)), s"over-cap arrival not flagged: ${hits()}")
    } finally q.stop()
  }

  test("substrDupHits: event-time TTL evicts stale fingerprints; arrivals re-open") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val para = salad("ttl-shared", 64)
    def other(i: Int) = salad(s"ttl-other-$i", 40)
    val stream = MemoryStream[(Long, String, Timestamp)]
    val q = Streaming.substrDupHits(stream.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("substrdup_ttl").outputMode("append").start()
    try {
      def hits(): Set[(Long, Long)] = spark.table("substrdup_ttl")
        .select($"doc_id", $"first_doc").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      stream.addData(Seq((1L, para, ts(0)), (2L, para, ts(1))))
      q.processAllAvailable()
      assert(hits() == Set((2L, 1L)))
      // unrelated docs 10h later advance the watermark far past
      // (newest member t=1m) + 1h TTL, then trigger the eviction tick
      stream.addData(Seq((100L, other(0), ts(600))))
      q.processAllAvailable()
      stream.addData(Seq((101L, other(1), ts(601))))
      q.processAllAvailable()
      // a fresh copy re-opens the evicted fingerprints — no hit against 1/2
      stream.addData(Seq((3L, para, ts(602))))
      q.processAllAvailable()
      assert(hits() == Set((2L, 1L)), s"evicted fingerprint leaked state: ${hits()}")
      stream.addData(Seq((4L, para, ts(603))))
      q.processAllAvailable()
      assert(hits() == Set((2L, 1L), (4L, 3L)), hits().toString)
    } finally q.stop()
  }

  test("chunkDocs: streaming chunks equal the batch q_text_chunk projection") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Seq(
      (1L, salad("chunk-a", 100), ts(0)),
      (2L, salad("chunk-b", 33), ts(1)),
      (3L, salad("chunk-c", 7), ts(2)))
    val stream = MemoryStream[(Long, String, Timestamp)]
    val q = Streaming.chunkDocs(stream.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("chunks").outputMode("append").start()
    try {
      stream.addData(docs)
      q.processAllAvailable()
      val got = spark.table("chunks")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      val want = graft.queries.Pipeline.chunked(docs.toDF("doc_id", "text", "ts"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      assert(got == want && got.nonEmpty)
    } finally q.stop()
  }

  test("boilerplateSegments: threshold crossing emits every holder, then new docs directly") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val shared = salad("stream-boiler", 8) // one full 8-word block
    val docs = Seq(
      (1L, s"$shared ${salad("sb-one", 24)}", ts(0)),
      (2L, s"$shared ${salad("sb-two", 16)}", ts(5)),
      (3L, s"$shared ${salad("sb-three", 16)}", ts(10)),
      (4L, salad("sb-unique", 40), ts(12)))
    val stream = MemoryStream[(Long, String, Timestamp)]
    val q = Streaming.boilerplateSegments(stream.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("boiler").outputMode("append").start()
    try {
      // doc 1 alone: below threshold, nothing emitted yet
      stream.addData(docs.take(1)); q.processAllAvailable()
      assert(spark.table("boiler").isEmpty)
      // doc 2 crosses the df>=2 threshold: BOTH holders emit (state
      // carried across the batch boundary); doc 3 then emits directly
      stream.addData(docs.drop(1)); q.processAllAvailable()
      val got = spark.table("boiler")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch expectation: distinct (seg, doc) pairs of segments carried
      // by >= 2 distinct docs — exactly the planted block in docs 1..3
      val segs = graft.queries.Pipeline.segmented(docs.toDF("doc_id", "text", "ts"))
        .select($"doc_id", explode(array_distinct($"segs")).as("h"))
      val boiler = segs.groupBy($"h").agg(countDistinct($"doc_id").as("n")).filter($"n" >= 2)
      val want = segs.join(boiler.select($"h"), "h")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want && got.map(_._2) == Set(1L, 2L, 3L), s"got $got want $want")
    } finally q.stop()
  }
}

class MultimodalSpec extends AnyFunSuite with SparkFixture {
  import graft.multimodal.Multimodal

  test("feature extraction decodes REAL PNG and WAV payloads, fails loudly otherwise") {
    import spark.implicits._
    import graft.multimodal.{Png, Wav}
    // 4x2 raster with pixel i = i*0x010203: R=i, G=2i, B=3i (no byte carry)
    val img = Png.Image(4, 2, Array.tabulate(8)(i => (0xff << 24) | (i * 0x010203)),
      hasAlpha = false)
    val media = Seq(
      Multimodal.MediaRow(1L, "image", Png.encode(img), 4, 2, "png"),
      Multimodal.MediaRow(2L, "audio",
        Wav.encode(8000, 1, 16, Array(100, -100, 50, -50), junkBytes = 3), 0, 0, "wav"))
    val feats = Multimodal.extractFeatures(spark.createDataset(media)).collect()
      .sortBy(_.media_id)
    assert(feats.length == 2)
    // image: n_units = pixels; f0 = meanR/255 from DECODED pixels
    assert(feats(0).n_units == 8)
    assert(feats(0).features(0) == (28.0 / 8 / 255.0).toFloat) // sum R = 0+..+7
    assert(feats(0).features(1) == (56.0 / 8 / 255.0).toFloat)
    assert(feats(0).features(2) == (84.0 / 8 / 255.0).toFloat)
    // audio: n_units = samples; peak 100, 3 sign changes in 4 samples
    assert(feats(1).n_units == 4)
    assert(feats(1).features(0) == (100.0 / 2048.0).toFloat)
    assert(feats(1).features(1) == 0.75f)
    // deterministic: same input twice → identical features
    val again = Multimodal.extractFeatures(spark.createDataset(media)).collect().sortBy(_.media_id)
    assert(feats.map(_.features.toSeq).toSeq == again.map(_.features.toSeq).toSeq)
    // no fake path left: an undecodable format is an error, not zeros
    val bad = Seq(Multimodal.MediaRow(3L, "image", Array[Byte](1, 2, 3), 0, 0, "jpeg"))
    assertThrows[org.apache.spark.SparkException](
      Multimodal.extractFeatures(spark.createDataset(bad)).collect())
  }

  test("featureSummary over the documents table") {
    val df = Multimodal.featureSummary(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.length == 2) // image + audio kinds
    assert(rows.map(_.getLong(1)).sum > 0)
  }

  test("mediaFeaturesByKind: streaming media ingest equals the batch twin") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.multimodal.{Png, Wav}
    import graft.streaming.Streaming
    val media = (0L until 60L).map { id =>
      if (id % 2 == 0) {
        val img = Multimodal.rasterFor(id)
        Multimodal.MediaRow(id, "image",
          Png.encode(img, filterFor = r => ((r + id) % 5).toInt),
          img.width, img.height, "png")
      } else {
        Multimodal.MediaRow(id, "audio",
          Wav.encode(16000, 1, 16, Multimodal.waveFor(id), junkBytes = (id % 13).toInt),
          0, 0, "wav")
      }
    }
    val stream = MemoryStream[Multimodal.MediaRow]
    val q = Streaming.mediaFeaturesByKind(stream.toDS())
      .writeStream.format("memory").queryName("mmfeat")
      .outputMode("complete").start()
    try {
      stream.addData(media.take(25)); q.processAllAvailable()
      stream.addData(media.drop(25)); q.processAllAvailable()
      def snap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      val got = snap(spark.table("mmfeat"))
      val want = snap(Streaming.mediaFeaturesByKind(spark.createDataset(media)))
      assert(got == want)
      assert(got.toSeq.map(_._2).sum == 60L, "every media item counted exactly once")
      assert(got.map(_._1) == Set("image", "audio"))
    } finally q.stop()
  }

  test("gtCensusSpectrum: streaming census equals the batch twin, native expr both sides") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // 12-sample cohort over 400 sites, same derivation family as q_vcf_hwe
    val sites = (0 until 400).map { i =>
      VcfSite(s"chr${i % 3}", i + 1,
        (1 to 12).map { j =>
          val code = (i + j * (i % 7) + j * j * (i % 5)) % 3
          VcfGt(f"s$j%02d", code match {
            case 0 => "0/0"
            case 1 => "0/1"
            case _ => "1/1"
          }, Map.empty)
        })
    }
    val stream = MemoryStream[VcfSite]
    val q = Streaming.gtCensusSpectrum(stream.toDF())
      .writeStream.format("memory").queryName("gt_census")
      .outputMode("complete").start()
    try {
      stream.addData(sites.take(150)); q.processAllAvailable()
      stream.addData(sites.drop(150)); q.processAllAvailable()
      val got = spark.table("gt_census").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val want = Streaming.gtCensusSpectrum(spark.createDataset(sites).toDF())
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == want)
      assert(got.nonEmpty)
      // every pattern sums to the cohort width — the census saw all 12
      assert(got.forall { case (a, b, c, _) => a + b + c == 12L })
      // state is the pattern space, not the site count
      assert(got.size < 100)
    } finally q.stop()
  }

  test("gtCensusSpectrum: restart from checkpoint neither drops nor double-counts sites") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-gtc").toString
    val sites = (0 until 300).map { i =>
      VcfSite(s"chr${i % 3}", i + 1,
        (1 to 12).map { j =>
          val code = (i * 5 + j * (i % 11) + j * j) % 3
          VcfGt(f"s$j%02d", code match {
            case 0 => "0/0"
            case 1 => "0/1"
            case _ => "1/1"
          }, Map.empty)
        })
    }
    val stream = MemoryStream[VcfSite]
    def start() = Streaming.gtCensusSpectrum(stream.toDF())
      .writeStream.format("memory").queryName("gtc_ckpt")
      .option("checkpointLocation", ckpt)
      .outputMode("complete").start()
    val q1 = start()
    stream.addData(sites.take(120)); q1.processAllAvailable()
    q1.stop() // simulated driver loss between micro-batches
    val q2 = start()
    try {
      stream.addData(sites.drop(120)); q2.processAllAvailable()
      val got = spark.table("gtc_ckpt").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val want = Streaming.gtCensusSpectrum(spark.createDataset(sites).toDF())
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == want,
        "post-restart spectrum diverges from batch truth — state or offsets lost/replayed")
      assert(got.map(_._4).sum == 300L, "every site counted exactly once")
    } finally q2.stop()
  }

  test("baseqByCycle: streaming per-cycle census equals the batch twin") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // variable-length reads so the cycle key space is ragged
    val reads = (0 until 300).map { i =>
      val len = 20 + i % 17
      QualRead(s"r$i",
        (0 until len).map(c => (33 + (i * 7 + c * 3) % 40).toChar).mkString)
    }
    val stream = MemoryStream[QualRead]
    val q = Streaming.baseqByCycle(stream.toDF())
      .writeStream.format("memory").queryName("baseq")
      .outputMode("complete").start()
    try {
      stream.addData(reads.take(100)); q.processAllAvailable()
      stream.addData(reads.drop(100)); q.processAllAvailable()
      val got = spark.table("baseq").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      val want = Streaming.baseqByCycle(spark.createDataset(reads).toDF())
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      assert(got == want)
      // ragged tail: the longest read defines the cycle space
      assert(got.map(_._1).max == 36)
      assert(got.forall { case (_, _, _, mn, mx) => mn >= 0 && mx <= 39 })
    } finally q.stop()
  }

  test("sexCoverageByRg: streaming X/Y census equals the batch twin; calls stabilize") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // two female-shaped RGs (X only) and two male-shaped (X≈Y), like the
    // batch query's cohort construction
    val reads = (0 until 400).map { i =>
      val rg = i % 4
      val c = (i * 13 + 7) % 40
      val contig =
        if (c < 32) s"chr${c % 24}"
        else if (rg % 2 == 0) "chrX"
        else if (c < 36) "chrX" else "chrY"
      RgRead(s"rg$rg", contig)
    }
    val stream = MemoryStream[RgRead]
    val q = Streaming.sexCoverageByRg(stream.toDF())
      .writeStream.format("memory").queryName("sexcov")
      .outputMode("complete").start()
    try {
      stream.addData(reads.take(150)); q.processAllAvailable()
      stream.addData(reads.drop(150)); q.processAllAvailable()
      def snap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4), r.getString(5))).toSet
      val got = snap(spark.table("sexcov"))
      val want = snap(Streaming.sexCoverageByRg(spark.createDataset(reads).toDF()))
      assert(got == want)
      val calls = got.map(t => t._1 -> t._6).toMap
      assert(calls("rg0") == "F" && calls("rg2") == "F")
      assert(calls("rg1") == "M" && calls("rg3") == "M")
    } finally q.stop()
  }

  test("somaticGate: streaming tumor triage equals the batch twin; planted somatic survives") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.Streaming
    // static normal callset: every 3rd site per contig
    val normal = (0 until 200).filter(_ % 3 == 0)
      .map(i => (s"chr${i % 4}", i + 1)).toDF("contig", "start")
    // tumor stream: all sites, AF varying; site 100 is the planted somatic
    // (not in normal since 100 % 3 != 0; AF 600 >= 50)
    val tumor = (0 until 200).map(i =>
      TumorVar(s"chr${i % 4}", i + 1, if (i == 100) 600L else (i * 7 % 100).toLong))
    val stream = MemoryStream[TumorVar]
    val q = Streaming.somaticGate(stream.toDF(), normal)
      .writeStream.format("memory").queryName("somgate")
      .outputMode("complete").start()
    try {
      stream.addData(tumor.take(80)); q.processAllAvailable()
      stream.addData(tumor.drop(80)); q.processAllAvailable()
      def snap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      val got = snap(spark.table("somgate"))
      val want = snap(Streaming.somaticGate(tumor.toDF(), normal))
      assert(got == want)
      assert(got.toSeq.map(_._3).sum == 200L, "every tumor site classified exactly once")
      // the planted somatic site: chr0 (100 % 4 == 0), class somatic, its AF in the sum
      val som = got.filter(x => x._1 == "chr0" && x._2 == "somatic")
      assert(som.nonEmpty && som.head._4 >= 600L, s"planted somatic missing: $got")
    } finally q.stop()
  }

  test("jpegIngestGate: streaming JPEG decode equals the batch twin") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.Streaming
    val ids = (0L until 48L)
    val stream = MemoryStream[Long]
    val q = Streaming.jpegIngestGate(stream.toDS())
      .writeStream.format("memory").queryName("jpeggate")
      .outputMode("complete").start()
    try {
      stream.addData(ids.take(20)); q.processAllAvailable()
      stream.addData(ids.drop(20)); q.processAllAvailable()
      def snap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      val got = snap(spark.table("jpeggate"))
      val want = snap(Streaming.jpegIngestGate(spark.createDataset(ids)))
      assert(got == want)
      assert(got.toSeq.map(_._2).sum == 48L, "every doc decoded exactly once")
      assert(got.size == 8, "8-bucket census")
      // DC-exact decode: sum_lum of bucket rows must be the block-formula
      // value, re-derived here independently of the codec
      val wantLum = ids.map { id =>
        val wb = (4 + 2 * (id % 3)).toInt; val hb = (2 + 2 * (id % 2)).toInt
        (id % 8, (0 until wb * hb).map { g =>
          64L * 1000L * ((id * 7 + (g % wb) * 13 + (g / wb) * 29) % 256)
        }.sum)
      }.groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).sum }
      got.foreach { case (b, _, _, lum, _) => assert(lum == wantLum(b), s"bucket $b") }
    } finally q.stop()
  }

  test("videoFrameGate: streaming MJPEG-AVI decode equals the batch twin and the analytic form") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.Streaming
    val ids = (0L until 40L)
    val stream = MemoryStream[Long]
    val q = Streaming.videoFrameGate(stream.toDS())
      .writeStream.format("memory").queryName("videogate")
      .outputMode("complete").start()
    try {
      stream.addData(ids.take(15)); q.processAllAvailable()
      stream.addData(ids.drop(15)); q.processAllAvailable()
      def snap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val got = snap(spark.table("videogate"))
      val want = snap(Streaming.videoFrameGate(spark.createDataset(ids)))
      assert(got == want)
      assert(got.size == 8, "8-bucket census")
      // DC-exact frames: luma re-derived from the block formula, codec-free
      val wantLum = ids.flatMap { id =>
        (0 until (3 + id % 5).toInt).filter(_ % 2 == 0).map { fi =>
          (id % 8, (0 until 4).map(b => 64L * ((id * 31 + fi * 7 + b * 13) % 256)).sum)
        }
      }.groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).sum }
      got.foreach { case (b, _, _, lum) => assert(lum == wantLum(b), s"bucket $b") }
    } finally q.stop()
  }

  test("kinshipPairCounts: streaming pair census equals the batch twin; state is width-bounded") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // 4-sample cohort where s3 duplicates s1 (a planted twin/swap):
    // their het-het count must equal their marginal het counts
    def gt(h: Long) = if (h % 24 < 21) "0/0" else if (h % 24 < 23) "0/1" else "1/1"
    val sites = (0 until 400).map { k =>
      val gts = (1 to 4).map { j =>
        val idx = if (j == 3) 1 else j // s3 == s1
        VcfGt(f"s$j%02d", gt((k.toLong * 7 + 3) * (17 * idx + 1) % 1000003), Map.empty)
      }
      VcfSite(s"chr${k % 3}", k + 1, gts)
    }
    val stream = MemoryStream[VcfSite]
    val q = Streaming.kinshipPairCounts(stream.toDF(), width = 4)
      .writeStream.format("memory").queryName("kin")
      .outputMode("complete").start()
    try {
      stream.addData(sites.take(150)); q.processAllAvailable()
      stream.addData(sites.drop(150)); q.processAllAvailable()
      def snap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
        .toMap
      val got = snap(spark.table("kin"))
      val want = snap(Streaming.kinshipPairCounts(
        spark.createDataset(sites).toDF(), width = 4))
      assert(got == want)
      assert(got.size == 6, "pair state is width-bounded: C(4,2) rows")
      val (hh13, ibs13, het1, het3) = got((1, 3))
      assert(ibs13 == 0L && hh13 == het1 && hh13 == het3,
        "planted duplicate pair must be IBS0-free with het-het == marginal hets")
    } finally q.stop()
  }

  test("fastqQcByLength: streaming per-length QC equals the batch twin") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val reads = (0 until 300).map { i =>
      val len = 15 + i % 9
      FqRead(s"f$i",
        (0 until len).map(j => "ACGT".charAt((i * 3 + j) % 4)).mkString,
        (0 until len).map(j => (33 + (i + j * 5) % 40).toChar).mkString)
    }
    val stream = MemoryStream[FqRead]
    val q = Streaming.fastqQcByLength(stream.toDF())
      .writeStream.format("memory").queryName("fqqc")
      .outputMode("complete").start()
    try {
      stream.addData(reads.take(120)); q.processAllAvailable()
      stream.addData(reads.drop(120)); q.processAllAvailable()
      def snap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val got = snap(spark.table("fqqc"))
      val want = snap(Streaming.fastqQcByLength(spark.createDataset(reads).toDF()))
      assert(got == want)
      assert(got.toSeq.map(_._2).sum == 300L, "every read counted exactly once")
    } finally q.stop()
  }
}
