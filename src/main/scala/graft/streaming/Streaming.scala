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

  /** Default idle-state horizon for the per-user stateful operators
    * ([[funnel]], [[userProfiles]], [[latestState]]): 30 days of event
    * time. Default-ON with a generous horizon is the safer contract at
    * pipeline scale — user populations grow monotonically, so unbounded
    * per-user state is a slow OOM with a fuse measured in weeks. Callers
    * with known-bounded key populations opt OUT with `idleTtlMs = None`
    * (logged once, loudly, below).
    */
  val DefaultIdleTtlMs: Long = 30L * 24 * 3600 * 1000

  private val warnedUnbounded =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** One-time warning PER OPERATOR when a caller opts into unbounded keyed
    * state — each operator's warning must appear so a later OOM on any of
    * them traces back to its own named opt-out.
    */
  private def warnUnbounded(op: String): Unit =
    if (warnedUnbounded.add(op))
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"graft.streaming.$op called with idleTtlMs=None: keyed state grows " +
          "with every key ever seen and NEVER shrinks. Only safe for " +
          "known-bounded key populations; otherwise keep the default " +
          s"event-time TTL (${DefaultIdleTtlMs} ms).")

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

  /** Event-time sessionization per user with a gap timeout: the streaming
    * twin of q_events_sessions, expressed with the DECLARATIVE
    * `session_window` (Catalyst manages merging/state/watermark eviction —
    * no hand-rolled state needed when the built-in fits).
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
                 watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(cents(col("value"))).as("value_c"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("value_c"))

  /** Windowed count-min sketch — the streaming twin of q_profile_cms: per
    * hourly window, the 4×`width` counter grid estimating per-key event
    * frequencies in bounded state. Each event explodes to 4 (row, cell)
    * probes (the portable md5-based hash60, same cells as the batch
    * query); the windowed aggregate is partial-aggregated map-side, so the
    * shuffle AND the state store carry at most window × 4 × width rows —
    * per-key counting of an unbounded key space in O(grid) memory, which
    * is the reason CMS exists. Consumers estimate a key's frequency as
    * min over its 4 probed cells of that window's sketch.
    */
  def cmsSketch(events: DataFrame, keyCol: String, width: Long = 1024L,
                watermark: String = "2 hours"): DataFrame = {
    // the probe-cell expression is ONE definition shared with the batch
    // query (GraftFunctions.cmsCells) — the grid-equality property the
    // spec pins depends on it
    val cells = graft.functions.GraftFunctions.cmsCells(col(keyCol), width)
    events
      .withWatermark("ts", watermark)
      .select(col("ts"), posexplode(array(cells: _*)).as(Seq("row", "cell")))
      .groupBy(window(col("ts"), "1 hour").as("win"), col("row"), col("cell"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("win.start").as("hour"), col("row"), col("cell"), col("cnt"))
  }

  /** Sliding-window trailing revenue — the streaming twin of
    * q_daily_moving_revenue: each event lands in the 7 one-day-step
    * 7-day windows covering it (`window(ts, "7 days", "1 day")` — Spark
    * expands the slide narrowly before the aggregate, so an event costs 7
    * pre-aggregated rows, never a re-scan), and every window's final row
    * IS the trailing-7-day total as of that window's end. State is the
    * open windows only, evicted by the watermark; no RANGE frame and no
    * ordered pass exist anywhere — the batch query's window-function
    * shape rewrites to pure windowed aggregation when the frame step is
    * fixed, which is the only form an unbounded stream can run.
    */
  def slidingRevenue(events: DataFrame, watermark: String = "2 days"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "7 days", "1 day").as("win"))
      .agg(count(lit(1)).as("n_events"), sum(cents(col("value"))).as("rev_c"))
      .select(col("win.start").as("win_start"), col("win.end").as("win_end"),
        col("n_events"), col("rev_c"))

  /** Windowed EXACT value-quantiles on a stream, via the native histogram
    * aggregate (graft_hist_quantile): the streaming state per (window,
    * event_type) group is a bounded value→weight histogram buffer — the
    * TypedImperativeAggregate serializes into the state store exactly as
    * it does into a batch shuffle — so the stream computes exact medians/
    * p90s with per-group state proportional to the value DOMAIN, not the
    * event count. Watermark bounds state lifetime; the batch twin is the
    * same aggregate over the same windows.
    */
  def windowedQuantiles(events: DataFrame, watermark: String = "2 hours"): DataFrame = {
    graft.functions.HistQuantileAgg.register(events.sparkSession)
    events
      .withWatermark("ts", watermark)
      .withColumn("value_c", cents(col("value")))
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(expr("graft_hist_quantile(value_c, 1, 500)").as("median_c"),
        expr("graft_hist_quantile(value_c, 1, 900)").as("p90_c"),
        count(lit(1)).as("n"))
      .select(col("win.start").as("hour"), col("event_type"),
        col("median_c"), col("p90_c"), col("n"))
  }

  /** Stream-static enrichment: events joined against a small static
    * dimension. The static side is broadcast — the stream never shuffles,
    * which is the only join shape that scales on an unbounded source.
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Streaming DECONTAMINATION gate — the streaming twin of
    * q_decontam_bloom's prefilter: an incoming document stream
    * (doc_id, ts, text) is fingerprinted (the same winnowed
    * `graft_fingerprints` pass the batch registry uses — register
    * [[graft.functions.FingerprintsExpr]] on the session first) and each
    * fingerprint is probed against a STATIC broadcast Bloom of the
    * holdout/eval set, exactly how an ingest pipeline blocks test-set
    * leakage at the door. The Bloom rides along as one broadcast row; the
    * probe is k codegen'd word lookups per fingerprint — the stream never
    * shuffles to meet the filter, and the only keyed state is the
    * watermarked per-(window, doc) hit rollup. Hits are a superset of
    * true leaks (Bloom false positives ≈ the batch query's documented
    * ~0.3%); the emitted count is the triage signal, the exact re-check
    * stays batch-side.
    */
  def decontamGate(docs: DataFrame, bloom: DataFrame, mBits: Long,
                   watermark: String = "2 hours"): DataFrame =
    docs
      .withWatermark("ts", watermark)
      .select(col("ts"), col("doc_id"),
        explode(expr("graft_fingerprints(text)")).as("fp"))
      .crossJoin(broadcast(bloom))
      .filter(graft.queries.BloomFilter.mightContain(col("bloom"), col("fp"), mBits))
      .groupBy(window(col("ts"), "1 hour").as("win"), col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
      .select(col("win.start").as("hour"), col("doc_id"), col("n_hits"))

  /** Streaming tokenizer-coverage monitor — the streaming twin of
    * q_vocab_oov: an incoming document stream (doc_id, ts, lang, text) is
    * scored against a FIXED vocabulary (one `term` column, derived batch-
    * side and frozen, exactly how production pins a tokenizer vocab), and
    * per-(window, lang) OOV rates are emitted on hourly event-time
    * windows. Stateless per row before the windowed aggregate: tokens
    * explode narrowly, the vocab side is broadcast (the stream never
    * shuffles to meet it), and the only keyed state is the windowed
    * rollup itself, evicted by the watermark. A rising oov_ppm on a live
    * crawl is the drift alarm that says the frozen vocab no longer covers
    * what's arriving.
    */
  def vocabCoverage(docs: DataFrame, vocab: DataFrame,
                    watermark: String = "2 hours"): DataFrame = {
    val terms = docs
      .withWatermark("ts", watermark)
      .select(col("ts"), col("lang"),
        explode(filter(split(col("text"), " "), w => length(w) > 0)).as("term"))
    terms
      .join(broadcast(vocab.select(col("term"), lit(1L).as("in_vocab"))),
        Seq("term"), "left")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("lang"))
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("win.start").as("hour"), col("lang"), col("n_tok"), col("n_oov"),
        expr("n_oov * 1000000 div n_tok").as("oov_ppm"))
  }

  /** Stream-stream interval join: each purchase joined to the same user's
    * views in the trailing `horizonSec` window — the streaming face of the
    * batch as-of attribution (q_events_asof's candidate set). Both sides
    * carry watermarks and the join condition bounds event time on BOTH
    * ends, so Spark derives a state-eviction horizon for each side — the
    * only stream-stream join shape whose state doesn't grow forever.
    * Co-partitioned on user_id: one shuffle per side, no broadcast needed.
    *
    * Inputs are raw event frames (`user_id`, `ts`, `event_type`, `value`,
    * `event_id`); emits one row per (purchase, qualifying view).
    */
  def attribution(views: DataFrame, purchases: DataFrame,
                  horizonSec: Long = 3600L,
                  watermark: String = "2 hours"): DataFrame = {
    val v = views
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        cents(col("value")).as("v_value"))
      .withWatermark("v_ts", watermark)
    val p = purchases
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", watermark)
    p.join(v,
      col("p_user") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr(s"INTERVAL $horizonSec SECONDS"))
      .select(col("p_user").as("user_id"), col("purchase_id"),
        col("v_ts"), col("p_ts"), col("v_value"))
  }

  /** LEFT-OUTER attribution — same stream-stream interval join as
    * [[attribution]], but purchases that found NO view inside the horizon
    * still emit (null view columns, `unattributed = true`) once the
    * watermark passes their join-state horizon. This is the Structured
    * Streaming outer-join semantic: the null-side row is held in state
    * until event time proves no match can still arrive, so emission lag is
    * bounded by `watermark + horizonSec`, and state per purchase is O(1).
    */
  def attributionOuter(views: DataFrame, purchases: DataFrame,
                       horizonSec: Long = 3600L,
                       watermark: String = "2 hours"): DataFrame = {
    val v = views
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        cents(col("value")).as("v_value"))
      .withWatermark("v_ts", watermark)
    val p = purchases
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", watermark)
    p.join(v,
      col("p_user") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr(s"INTERVAL $horizonSec SECONDS"),
      "leftOuter")
      .select(col("p_user").as("user_id"), col("purchase_id"),
        col("v_ts"), col("p_ts"), col("v_value"),
        col("v_ts").isNull.as("unattributed"))
  }

  /** Streaming NEAR-DUPLICATE candidate detection — the streaming twin of
    * the batch LSH pass (`Pipeline.lshCandidatePairs`): each arriving
    * document's minhash signature (native expression, one codegen'd pass)
    * is banded, and per-(band, bandhash) state holds the bucket's previously
    * seen doc ids; a new member emits a candidate pair against each of them.
    * `docs` must carry `doc_id`, `text`, and an event-time `ts`.
    *
    * State is bounded on BOTH axes on an unbounded stream:
    *  - per bucket, the cap mirrors the batch `MaxBucket` skew guard with
    *    the same STAR fallback as the batch `bucketPairs`: a bucket at the
    *    cap stops ADMITTING members, and an over-cap arrival emits ONE
    *    pair against the bucket minimum — a dense near-identical family
    *    stays connected through its anchor at O(1) per arrival instead of
    *    silently vanishing from the candidate graph (over-cap arrivals
    *    are not remembered, so their star pair is at-least-once);
    *  - across buckets, an EVENT-TIME TTL evicts any bucket once the
    *    watermark passes its newest member by `bucketTtlMs` — without it the
    *    number of (band, bandhash) groups, and so total state-store size,
    *    grows with the distinct-content cardinality of the stream forever.
    *    An arrival after eviction re-opens the bucket fresh (it pairs only
    *    against members seen from then on — the trade for bounded state).
    * Pairs can repeat across bands — dedupe downstream if exact-once pairs
    * matter.
    */
  def nearDupCandidates(docs: DataFrame, maxBucket: Int = 64,
                        watermark: String = "1 hour",
                        bucketTtlMs: Long = 3600000L): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val s = docs.sparkSession
    import s.implicits._
    graft.functions.MinhashSigExpr.register(s)
    // the batch pass's banding EXPRESSION is reused verbatim
    // (Pipeline.bandsCol) so the streaming twin can never silently diverge
    val banded = docs
      .withWatermark("ts", watermark)
      .withColumn("sig", expr("graft_minhash_sig(text)"))
      .filter(col("sig").isNotNull)
      .select(col("doc_id").cast("long").as("doc_id"), col("ts"),
        posexplode(graft.queries.Pipeline.bandsCol).as(Seq("band", "bandhash")))
      .as[(Long, java.sql.Timestamp, Int, Long)]
    banded
      .groupByKey { case (_, _, band, bandhash) => (band, bandhash) }
      .flatMapGroupsWithState[(Seq[Long], Long, Long), (Long, Long, Int)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case ((band, _), rows, state: GroupState[(Seq[Long], Long, Long)]) =>
          if (state.hasTimedOut) {
            // watermark passed this bucket's newest member by the TTL —
            // drop the whole bucket
            state.remove()
            Iterator.empty
          } else {
            var (seen, newestTs, minSeen) =
              state.getOption.getOrElse((Vector.empty[Long], Long.MinValue, Long.MaxValue))
            val out = Seq.newBuilder[(Long, Long, Int)]
            rows.foreach { case (docId, t, _, _) =>
              // the NEWEST member ever seen rides along in state: an
              // out-of-order (but in-watermark) batch must not pull the
              // TTL earlier than a previous member already pushed it
              if (t != null && t.getTime > newestTs) newestTs = t.getTime
              if (!seen.contains(docId)) {
                if (seen.size < maxBucket) {
                  seen.foreach { prev =>
                    val (a, b) = if (prev < docId) (prev, docId) else (docId, prev)
                    out += ((a, b, band))
                  }
                  seen = seen :+ docId
                } else {
                  // bucket at the cap: the STAR rule (the batch
                  // bucketPairs fallback) — the arrival pairs with the
                  // bucket-minimum anchor only, and is NOT admitted, so
                  // state stays O(maxBucket) while a dense boilerplate
                  // family keeps every member reachable from one anchor
                  // instead of silently dropping off the candidate graph.
                  // The anchor is the running minimum over EVERY arrival
                  // (admitted or not, O(1) extra state), so it converges
                  // to the batch rule's global bucket minimum once that
                  // doc has arrived — in any order. The arrival is not
                  // remembered, so a re-arrival re-emits its pair:
                  // at-least-once, dedupe downstream.
                  val anchor =
                    if (minSeen != Long.MaxValue && minSeen != docId) minSeen else seen.min
                  val (a, b) = if (anchor < docId) (anchor, docId) else (docId, anchor)
                  out += ((a, b, band))
                }
              }
              if (docId < minSeen) minSeen = docId
            }
            state.update((seen, newestTs, minSeen))
            // evict once the watermark passes the newest member by the TTL;
            // the timestamp must sit strictly above the current watermark
            // (late rows can carry ts already below it). A bucket that has
            // never seen a non-null ts keeps a full TTL from the watermark
            // instead of being evicted on the next tick.
            val anchor = if (newestTs == Long.MinValue) state.getCurrentWatermarkMs() else newestTs
            state.setTimeoutTimestamp(
              math.max(anchor + bucketTtlMs, state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
      .toDF("doc_a", "doc_b", "band")
  }

  /** Streaming SUBSTRING-duplicate detection — the streaming twin of
    * q_dedup_substr: each arriving document's winnowed word-8-gram
    * fingerprints (native graft_substr_fps, one codegen'd pass) key
    * per-fingerprint state holding the docs that carried the span before;
    * a new doc arriving on an occupied fingerprint emits a hit against the
    * span's FIRST holder. `docs` must carry `doc_id`, `text`, `ts`.
    *
    * State bounds mirror [[nearDupCandidates]] exactly: per fingerprint the
    * member list stops admitting at `maxDocs` (a span shared by thousands
    * of docs is boilerplate — the skew guard), but non-admitted arrivals
    * STILL emit their hit against the first holder (at-least-once — they
    * are not remembered), so the cap bounds state without hiding exactly
    * the spans shared widely enough to matter; an event-time TTL evicts a
    * fingerprint once the watermark passes its newest member by `ttlMs`
    * (re-opened fresh by later arrivals).
    */
  /** Streaming FUZZY-LINKAGE hits — the streaming twin of q_fuzzy_linkage:
    * each arriving name's distinct character 3-grams key per-gram state
    * holding the names that carried the gram before; an arrival pairs with
    * every held name, and pairs within edit distance 2 (levenshtein runs
    * NARROW, after the stateful op) are the link hits. `names` must carry
    * `name`, `ts`.
    *
    * State bounds mirror [[nearDupCandidates]]: per gram the member list
    * stops admitting at `maxBucket`. The batch query drops over-cap gram
    * blocks entirely (stop-gram removal) — a stream cannot retract pairs
    * it already emitted, so the twin's cap is admission-prefix semantics:
    * arrivals at a full bucket emit nothing and are not remembered. On
    * data where no gram reaches the cap the two are pair-for-pair equal
    * (the spec-equality contract); near the cap the stream keeps the
    * earliest members' links where batch would drop the gram. Pairs may
    * repeat across grams and batches: at-least-once, dedupe downstream.
    * An event-time TTL evicts a gram once the watermark passes its newest
    * member by `bucketTtlMs`.
    */
  def fuzzyLinkHits(names: DataFrame, maxBucket: Int = 64,
                    watermark: String = "1 hour",
                    bucketTtlMs: Long = 3600000L): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val s = names.sparkSession
    import s.implicits._
    val grams = names
      .withWatermark("ts", watermark)
      .filter(length(col("name")) >= 3)
      .select(col("name"), col("ts"), explode(array_distinct(expr(
        "transform(sequence(1, length(name) - 2), i -> substring(name, i, 3))"))).as("gram"))
      .as[(String, java.sql.Timestamp, String)]
    grams
      .groupByKey(_._3)
      .flatMapGroupsWithState[(Seq[String], Long), (String, String)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, rows, state: GroupState[(Seq[String], Long)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var (seen, newestTs) =
              state.getOption.getOrElse((Vector.empty[String], Long.MinValue))
            val out = Seq.newBuilder[(String, String)]
            rows.foreach { case (name, t, _) =>
              if (t != null && t.getTime > newestTs) newestTs = t.getTime
              if (!seen.contains(name) && seen.size < maxBucket) {
                seen.foreach { prev =>
                  val (a, b) = if (prev < name) (prev, name) else (name, prev)
                  out += ((a, b))
                }
                seen = seen :+ name
              }
            }
            state.update((seen, newestTs))
            val anchor = if (newestTs == Long.MinValue) state.getCurrentWatermarkMs() else newestTs
            state.setTimeoutTimestamp(
              math.max(anchor + bucketTtlMs, state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
      .toDF("name_a", "name_b")
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= 2)
  }

  def substrDupHits(docs: DataFrame, maxDocs: Int = 64,
                    watermark: String = "1 hour",
                    ttlMs: Long = 3600000L): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val s = docs.sparkSession
    import s.implicits._
    graft.functions.SubstrFpsExpr.register(s)
    val fps = docs
      .withWatermark("ts", watermark)
      .select(col("doc_id").cast("long").as("doc_id"), col("ts"),
        explode(expr("graft_substr_fps(text)")).as("fp"))
      .as[(Long, java.sql.Timestamp, Long)]
    fps
      .groupByKey { case (_, _, fp) => fp }
      .flatMapGroupsWithState[(Seq[Long], Long), (Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (fp, rows, state: GroupState[(Seq[Long], Long)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var (seen, newestTs) = state.getOption.getOrElse((Vector.empty[Long], Long.MinValue))
            val out = Seq.newBuilder[(Long, Long, Long)]
            rows.foreach { case (docId, t, _) =>
              if (t != null && t.getTime > newestTs) newestTs = t.getTime
              if (!seen.contains(docId)) {
                // the span's first holder is the stable attribution target
                // (the batch registry's first_doc). The hit does not
                // require ADMISSION: past maxDocs the member list stops
                // growing (the skew guard) but arrivals still emit their
                // hit against the first holder — a boilerplate span
                // carried by thousands of docs keeps flagging every one
                // of them at O(1) state (at-least-once for the
                // non-admitted: a re-arrival re-emits)
                if (seen.nonEmpty) out += ((fp, docId, seen.head))
                if (seen.size < maxDocs) seen = seen :+ docId
              }
            }
            state.update((seen, newestTs))
            val anchor = if (newestTs == Long.MinValue) state.getCurrentWatermarkMs() else newestTs
            state.setTimeoutTimestamp(
              math.max(anchor + ttlMs, state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
      .toDF("fp", "doc_id", "first_doc")
  }

  /** Streaming chunking — the stateless streaming twin of q_text_chunk:
    * each arriving document fans out into its overlapping word windows.
    * The projection IS the batch definition ([[graft.queries.Pipeline
    * .chunked]]) applied to a stream — no state, no watermark, no shuffle,
    * so chunk ids (portable content hashes) agree with the batch corpus
    * bit-for-bit and a chunk-level dedup/ANN index can be maintained
    * incrementally from this stream.
    */
  def chunkDocs(docs: DataFrame): DataFrame =
    graft.queries.Pipeline.chunked(docs)

  /** Streaming boilerplate detection — the streaming twin of
    * q_boilerplate's corpus-frequency rule: per-segment-hash state counts
    * the DISTINCT docs that carried the segment; the arrival that lifts a
    * segment to the threshold emits a (seg, doc) hit for every holder, and
    * every later distinct doc on a flagged segment emits immediately. The
    * segment expression is the batch definition ([[graft.queries.Pipeline
    * .segmented]]) verbatim. Output rows are (seg_hash, doc_id) pairs —
    * "this doc contains a segment known to be boilerplate" — delivered
    * AT-LEAST-ONCE per pair: once a segment is flagged its member list is
    * dropped (that is what bounds hot-segment state to O(1)), so a doc
    * that re-arrives on a flagged segment in a later micro-batch re-emits
    * the same pair. Dedupe downstream (e.g. a watermark-scoped
    * dropDuplicates) if exactly-once pairs are required.
    *
    * State is bounded on both axes: below the threshold a segment holds at
    * most `boilerDf - 1` doc ids; once FLAGGED the member list is dropped
    * and only the flag rides (so hot boilerplate segments — the ones with
    * unbounded membership — carry O(1) state), and an event-time TTL
    * evicts idle segments once the watermark passes their newest member
    * by `ttlMs` (a later arrival re-opens the segment fresh — the trade
    * for bounded state, same as [[nearDupCandidates]]).
    */
  def boilerplateSegments(docs: DataFrame,
                          boilerDf: Int = graft.queries.Pipeline.boilerDfThreshold,
                          watermark: String = "1 hour",
                          ttlMs: Long = 3600000L): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val s = docs.sparkSession
    import s.implicits._
    val segs = graft.queries.Pipeline.segmented(docs.withWatermark("ts", watermark))
      .select(col("doc_id").cast("long").as("doc_id"), col("ts"),
        explode(array_distinct(col("segs"))).as("h"))
      .as[(Long, java.sql.Timestamp, Long)]
    // state: (docs seen below threshold, flagged, newest event-time)
    segs
      .groupByKey { case (_, _, h) => h }
      .flatMapGroupsWithState[(Seq[Long], Boolean, Long), (Long, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (h, rows, state: GroupState[(Seq[Long], Boolean, Long)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var (seen, flagged, newestTs) =
              state.getOption.getOrElse((Vector.empty[Long], false, Long.MinValue))
            val out = Seq.newBuilder[(Long, Long)]
            rows.foreach { case (docId, t, _) =>
              if (t != null && t.getTime > newestTs) newestTs = t.getTime
              if (flagged) {
                // already boilerplate: every distinct doc emits once; the
                // member list is gone, so emission is at-least-once per
                // doc across micro-batches — dedupe downstream if needed
                out += ((h, docId))
              } else if (!seen.contains(docId)) {
                seen = seen :+ docId
                if (seen.size >= boilerDf) {
                  // threshold crossed: every holder becomes a hit, and the
                  // member list is dropped for O(1) state from here on
                  seen.foreach(d => out += ((h, d)))
                  seen = Vector.empty
                  flagged = true
                }
              }
            }
            state.update((seen, flagged, newestTs))
            val anchor = if (newestTs == Long.MinValue) state.getCurrentWatermarkMs() else newestTs
            state.setTimeoutTimestamp(
              math.max(anchor + ttlMs, state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
      .toDF("seg_hash", "doc_id")
  }

  /** Streaming MATE-PAIR reunification + discordance triage — the streaming
    * twin of q_sv_signals' fixmate shuffle: per-template state holds the
    * first mate until its partner arrives, then the completed pair emits
    * with the BATCH classification rules (interchrom > long-insert >
    * inverted > proper, `span` 0 for interchrom). State is ONE held mate
    * per open template; the event-time TTL evicts widowed templates,
    * emitting an `orphan` row (the observability a sequencing stream wants
    * — a mate that never arrived IS a signal). `reads` must carry
    * `readName, contig, pos, rev (0/1), ts`.
    */
  def pairMates(reads: DataFrame, longInsert: Long = 5000L,
                watermark: String = "2 hours",
                idleTtlMs: Option[Long] = Some(DefaultIdleTtlMs)): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val s = reads.sparkSession
    import s.implicits._
    val timeoutConf =
      if (idleTtlMs.isDefined) GroupStateTimeout.EventTimeTimeout()
      else { warnUnbounded("pairMates"); GroupStateTimeout.NoTimeout() }
    reads
      .withWatermark("ts", watermark)
      .select(col("readName").cast("string"), col("contig").cast("string"),
        col("pos").cast("long"), col("rev").cast("int"),
        unix_millis(col("ts")).as("ms"), col("ts"))
      .as[(String, String, Long, Int, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(String, Long, Int, Long), (String, String, Long)](
        OutputMode.Append(), timeoutConf) {
        case (name, rows, state: GroupState[(String, Long, Int, Long)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.single((name, "orphan", 0L))
          } else {
            val out = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
            var held = state.getOption
            var newest = held.map(_._4).getOrElse(Long.MinValue)
            rows.toSeq.sortBy(_._5).foreach { case (_, c, p, rv, ms, _) =>
              if (ms > newest) newest = ms
              held match {
                case None => held = Some((c, p, rv, ms))
                case Some((c1, p1, rv1, _)) =>
                  val span = math.abs(p - p1)
                  val cls =
                    if (c1 != c) "interchrom"
                    else if (span > longInsert) "long_insert"
                    else if (rv + rv1 != 1) "inverted"
                    else "proper"
                  out += ((name, cls, if (c1 != c) 0L else span))
                  held = None
              }
            }
            held match {
              case Some(h) =>
                state.update((h._1, h._2, h._3, newest))
                idleTtlMs.foreach(ttl => state.setTimeoutTimestamp(
                  math.max(newest + ttl, state.getCurrentWatermarkMs() + 1)))
              case None => if (state.exists) state.remove()
            }
            out.iterator
          }
      }
      .toDF("template", "sv_class", "span")
  }

  /** Streaming ordered funnel — the streaming twin of q_events_funnel:
    * per-user state machine tracking first view → first later click →
    * first later purchase, emitting the user's funnel row whenever a stage
    * advances (Append mode: downstream keeps the latest row per user).
    * Rows within a micro-batch are processed in event-time order, so
    * in-batch disorder cannot skip a stage; an event arriving in a LATER
    * batch than a stage it should precede is a miss (the inherent
    * approximation of single-pass streaming funnels — the batch twin over
    * the same complete data is the exact answer).
    *
    * State is three timestamps per user, but user populations at pipeline
    * scale grow monotonically — so by default an EVENT-TIME TTL evicts a
    * user once the watermark passes their newest event by `idleTtlMs`
    * (the [[nearDupCandidates]] shape: eviction anchored to the newest
    * member ever seen, never pulled earlier by out-of-order arrivals). A
    * user who returns after eviction starts a FRESH funnel — the trade
    * for bounded state. Pass `idleTtlMs = None` for the old unbounded
    * semantics: funnels can then complete across arbitrary idle gaps, but
    * state grows with every user ever seen, FOREVER — only safe when the
    * key population is known-bounded.
    */
  def funnel(events: DataFrame, watermark: String = "2 hours",
             idleTtlMs: Option[Long] = Some(DefaultIdleTtlMs)): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val s = events.sparkSession
    import s.implicits._
    val timeoutConf =
      if (idleTtlMs.isDefined) GroupStateTimeout.EventTimeTimeout()
      else { warnUnbounded("funnel"); GroupStateTimeout.NoTimeout() }
    events
      .withWatermark("ts", watermark)
      // the watermark column must SURVIVE the projection for event-time
      // timeouts — dropping `ts` here fails analysis under EventTimeTimeout
      .select(col("user_id").cast("long"), col("event_type").cast("string"),
        unix_millis(col("ts")).as("ms"), col("ts"))
      .as[(Long, String, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Option[Long], Option[Long], Option[Long], Long),
        (Long, Option[Long], Option[Long], Option[Long])](
        OutputMode.Append(), timeoutConf) {
        case (uid, rows, state: GroupState[(Option[Long], Option[Long], Option[Long], Long)]) =>
          if (state.hasTimedOut) {
            // watermark passed this user's newest event by the TTL
            state.remove()
            Iterator.empty
          } else {
            var (v, c, p, newest) = state.getOption.getOrElse(
              (Option.empty[Long], Option.empty[Long], Option.empty[Long], Long.MinValue))
            val before = (v, c, p)
            rows.toSeq.sortBy(_._3).foreach { case (_, et, ms, _) =>
              if (ms > newest) newest = ms // ANY event keeps the user alive
              et match {
                case "view" if v.isEmpty => v = Some(ms)
                case "click" if c.isEmpty && v.exists(ms > _) => c = Some(ms)
                case "purchase" if p.isEmpty && c.exists(ms > _) => p = Some(ms)
                case _ => // stage already reached, precondition unmet, or other event type
              }
            }
            val advanced = (v, c, p) != before
            idleTtlMs match {
              case Some(ttl) =>
                // always update: the timeout anchor must track the newest
                // event even when no stage advanced
                state.update((v, c, p, newest))
                val anchor = if (newest == Long.MinValue) state.getCurrentWatermarkMs() else newest
                state.setTimeoutTimestamp(
                  math.max(anchor + ttl, state.getCurrentWatermarkMs() + 1))
              case None =>
                if (advanced) state.update((v, c, p, newest))
            }
            if (advanced) Iterator((uid, v, c, p)) else Iterator.empty
          }
      }
      .toDF("user_id", "t_view_ms", "t_click_ms", "t_purchase_ms")
  }

  /** Streaming rolling-spike detection — the streaming twin of
    * q_events_spikes: per event type, an hour is flagged when its count
    * reaches ≥1.5× the mean of the 24 preceding complete hours (full
    * windows only, cross-multiplied so the threshold is integer-exact
    * like the batch query). Rolling rows-frames don't exist in streaming,
    * so the state function keeps the per-type hour→count map itself:
    * hours FINALIZE when the watermark passes their end (late events
    * within the watermark still count; later ones are dropped by the
    * watermark), and state holds at most ~25 hours per type — bounded
    * regardless of stream length, since finalized hours beyond the
    * trailing window are evicted immediately. The finalized ring is
    * RETAINED across idle gaps (matching the batch rows-frame, which
    * rolls over hours present in the series, gap or no gap); state is
    * bounded by type cardinality, so retention costs ~25 entries per
    * type ever seen.
    */
  def spikes(events: DataFrame, watermark: String = "2 hours"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val s = events.sparkSession
    import s.implicits._
    val HourMs = 3600000L
    events
      .withWatermark("ts", watermark)
      .select(col("event_type").cast("string"),
        unix_millis(date_trunc("hour", col("ts"))).as("hourMs"), col("ts"))
      .as[(String, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      // state: (open hour→count map, finalized (hour, count) ring newest-last)
      .flatMapGroupsWithState[(Map[Long, Long], Seq[(Long, Long)]), (String, Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (etype, rows, state: GroupState[(Map[Long, Long], Seq[(Long, Long)])]) =>
          val timedOut = state.hasTimedOut
          var (open, done) = state.getOption
            .getOrElse((Map.empty[Long, Long], Seq.empty[(Long, Long)]))
          rows.foreach { case (_, h, _) => open = open.updated(h, open.getOrElse(h, 0L) + 1L) }
          val wm = state.getCurrentWatermarkMs()
          // finalize complete hours in order; emit spikes against the 24
          // finalized hours preceding each (the batch query's exact test)
          val out = Seq.newBuilder[(String, Long, Long, Long)]
          open.keys.toSeq.sorted.foreach { h =>
            if (h + HourMs <= wm) {
              val n = open(h)
              val prev = done.takeRight(24)
              // rows-frame semantics: the 24 immediately preceding HOURS
              // present in the series (gap hours don't exist in the batch
              // rollup either), full windows only
              if (prev.length == 24) {
                val prevSum = prev.map(_._2).sum
                if (n * 24L * 2L >= prevSum * 3L) out += ((etype, h, n, prevSum))
              }
              done = (done :+ ((h, n))).takeRight(25)
              open = open - h
            }
          }
          // keep the finalized ring across idle gaps: the batch rows-frame
          // rolls over hours PRESENT in the series, so a type resuming
          // after a quiet day must still spike against its pre-gap
          // baseline. State is ≤ ~25 entries per type EVER seen — bounded
          // by type cardinality (a rollup key, not a user key), so
          // retention is safe where per-user state would not be.
          if (timedOut && open.isEmpty && done.isEmpty) state.remove()
          else {
            state.update((open, done))
            // wake when the next open hour can finalize (or idle-expire
            // after a trailing window with no live hours)
            state.setTimeoutTimestamp(
              math.max(open.keys.minOption.map(_ + HourMs).getOrElse(wm + 25 * HourMs), wm + 1))
          }
          out.result().iterator
      }
      .toDF("event_type", "hour_ms", "n", "prev_sum")
  }

  /** Streaming latest-state upsert — the streaming twin of
    * q_events_latest: per user, the most recent event (ts, then event_id
    * as the tie-break) wins; each batch emits the user's refreshed row.
    * State is one tiny tuple per user, evicted by the same event-time TTL
    * shape as [[userProfiles]] (anchored to the user's newest event), so
    * a month-long stream doesn't hold every user ever seen. Late arrivals
    * older than the current winner are absorbed without an emit.
    */
  def latestState(events: DataFrame,
                  idleTtlMs: Option[Long] = Some(DefaultIdleTtlMs),
                  watermark: String = "2 hours"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val s = events.sparkSession
    import s.implicits._
    // state: (ms, event_id, event_type, value_c)
    val rows = events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("event_type").cast("string"), cents(col("value")).as("value_c"),
        unix_millis(col("ts")).as("ms"), col("ts"))
      .as[(Long, Long, String, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
    val timeout =
      if (idleTtlMs.isDefined) GroupStateTimeout.EventTimeTimeout()
      else { warnUnbounded("latestState"); GroupStateTimeout.NoTimeout() }
    rows.flatMapGroupsWithState[(Long, Long, String, Long), (Long, Long, String, Long)](
      OutputMode.Append(), timeout) {
      case (uid, it, state: GroupState[(Long, Long, String, Long)]) =>
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else {
          var cur = state.getOption.getOrElse((Long.MinValue, Long.MinValue, "", 0L))
          var changed = false
          it.foreach { case (_, eid, t, vc, ms, _) =>
            if (ms > cur._1 || (ms == cur._1 && eid > cur._2)) {
              cur = (ms, eid, t, vc); changed = true
            }
          }
          state.update(cur)
          idleTtlMs.foreach { ttl =>
            state.setTimeoutTimestamp(
              math.max(cur._1 + ttl, state.getCurrentWatermarkMs() + 1))
          }
          if (changed) Iterator((uid, cur._2, cur._3, cur._4)) else Iterator.empty
        }
    }.toDF("user_id", "event_id", "event_type", "value_c")
  }

  /** Streaming event pathing — the streaming twin of q_events_pathing:
    * per-user state holds only the LAST event's type; each arrival emits
    * the (from, to) transition and replaces the state, so downstream
    * windowed counts assemble the same transition matrix the batch lead()
    * window produces. In-batch rows are processed in event-time order
    * (ties by event_id) to match the batch ordering. State is ONE tuple
    * per user, evicted by an event-time TTL anchored to the user's newest
    * event.
    *
    * Two documented streaming-vs-batch divergences: (1) a chain broken by
    * an idle gap past the TTL restarts instead of linking; (2) an event
    * that arrives in a LATER micro-batch with an EARLIER timestamp than
    * the stored last event (out-of-order across batches, inside the
    * watermark) links in arrival order, where the batch window links in
    * event-time order — inherent to emitting transitions online with
    * O(1) state; holding a reorder buffer per user would be [[funnel]]'s
    * job, not a pathing rollup's.
    */
  def pathing(events: DataFrame, watermark: String = "2 hours",
              ttlMs: Long = 3600000L): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val s = events.sparkSession
    import s.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        unix_millis(col("ts")).as("ms"), col("event_type").cast("string"), col("ts"))
      .as[(Long, Long, Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(String, Long), (Long, String, String)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, rows, state: GroupState[(String, Long)]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val ordered = rows.toSeq.sortBy(r => (r._3, r._2))
            var last = state.getOption
            val out = Seq.newBuilder[(Long, String, String)]
            ordered.foreach { case (_, _, ms, typ, _) =>
              last.foreach { case (ptyp, _) => out += ((uid, ptyp, typ)) }
              last = Some((typ, ms))
            }
            last.foreach { l =>
              state.update(l)
              state.setTimeoutTimestamp(
                math.max(l._2 + ttlMs, state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }.toDF("user_id", "from_type", "to_type")
  }

  /** Per-user running profile via flatMapGroupsWithState — custom state the
    * declarative operators cannot express: cumulative event count and the
    * set of distinct event types per user, emitted on every update.
    *
    * Same state-bound story as [[funnel]]: by default an event-time TTL
    * evicts users idle past `idleTtlMs` (anchored to the newest event ever
    * seen; a returning user starts a fresh profile). `idleTtlMs = None`
    * restores the unbounded accumulate-forever semantics — state then
    * grows with every user ever seen and never shrinks; only safe for
    * known-bounded key populations. The TTL path requires an event-time
    * `ts` column; the unbounded path does not.
    */
  def userProfiles(events: DataFrame,
                   idleTtlMs: Option[Long] = Some(DefaultIdleTtlMs),
                   watermark: String = "2 hours"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val s = events.sparkSession
    import s.implicits._
    idleTtlMs match {
      case Some(ttl) =>
        events
          .withWatermark("ts", watermark)
          // keep `ts`: the watermark column must survive the projection
          .select(col("user_id").cast("long"), col("event_type").cast("string"),
            unix_millis(col("ts")).as("ms"), col("ts"))
          .as[(Long, String, Long, java.sql.Timestamp)]
          .groupByKey(_._1)
          .flatMapGroupsWithState[(Long, Set[String], Long), (Long, Long, Long)](
            OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
            case (uid, rows, state: GroupState[(Long, Set[String], Long)]) =>
              if (state.hasTimedOut) {
                state.remove()
                Iterator.empty
              } else {
                var (n, types, newest) = state.getOption
                  .getOrElse((0L, Set.empty[String], Long.MinValue))
                rows.foreach { case (_, t, ms, _) =>
                  n += 1; types += t
                  if (ms > newest) newest = ms
                }
                state.update((n, types, newest))
                val anchor = if (newest == Long.MinValue) state.getCurrentWatermarkMs() else newest
                state.setTimeoutTimestamp(
                  math.max(anchor + ttl, state.getCurrentWatermarkMs() + 1))
                Iterator((uid, n, types.size.toLong))
              }
          }
          .toDF("user_id", "n_events", "n_distinct_types")
      case None =>
        warnUnbounded("userProfiles")
        events.select(col("user_id").cast("long"), col("event_type").cast("string"))
          .as[(Long, String)]
          .groupByKey(_._1)
          .flatMapGroupsWithState[(Long, Set[String]), (Long, Long, Long)](
            OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
            case (uid, rows, state: GroupState[(Long, Set[String])]) =>
              val (n0, t0) = state.getOption.getOrElse((0L, Set.empty[String]))
              var n = n0
              var types = t0
              rows.foreach { case (_, t) => n += 1; types += t }
              state.update((n, types))
              Iterator((uid, n, types.size.toLong))
          }
          .toDF("user_id", "n_events", "n_distinct_types")
    }
  }

  /** Streaming genotype-census spectrum — the twin of the `q_vcf_hwe`
    * family's first stage: a stream of VCF-shaped rows (a `genotypes`
    * array-of-structs per site) is censused with the SAME native
    * `graft_gt_census` codegen expression the batch queries use (one array
    * pass per site, no explode, no interpreted lambdas), then the running
    * (homRef, het, homAlt)-pattern spectrum aggregates in complete mode.
    * State is the set of distinct census patterns — bounded by cohort
    * width (O(n²) patterns for n samples), NOT by stream length — so a
    * continuous variant feed never grows the store.
    */
  def gtCensusSpectrum(variants: DataFrame): DataFrame = {
    graft.functions.GtCensusExpr.register(variants.sparkSession)
    variants
      .select(expr("graft_gt_census(genotypes)").as("cen"))
      .select(col("cen").getItem(0).as("a"), col("cen").getItem(1).as("b"),
        col("cen").getItem(2).as("c"))
      .groupBy("a", "b", "c")
      .agg(count(lit(1)).as("n_sites"))
  }

  /** Streaming base-quality-by-cycle — q_bam_baseq_cycle's twin, the live
    * run-monitoring panel a sequencer dashboard polls while the flow cell
    * is still writing: each read's phred+33 `qual` string explodes into
    * (cycle, quality) pairs — a read-length-bounded fan-out — and the
    * running per-cycle census aggregates in complete mode. State is one
    * row per cycle (read length), never per read.
    */
  def baseqByCycle(reads: DataFrame): DataFrame =
    reads
      .select(explode(expr("sequence(1, length(qual))")).as("cycle"), col("qual"))
      .select(col("cycle"),
        (expr("ascii(substring(qual, cycle, 1))") - lit(33)).cast("long").as("q"))
      .groupBy("cycle")
      .agg(count(lit(1)).as("n_reads"), sum(col("q")).as("sum_q"),
        min(col("q")).as("min_q"), max(col("q")).as("max_q"))

  /** Streaming pairwise kinship counts — q_vcf_kinship_pairs' twin, the
    * live cohort-integrity monitor an incremental joint-calling pipeline
    * runs as new sites land: running het-het / IBS0 / marginal-het counts
    * for every sample pair. State is the pair matrix — cohort-width²
    * rows (n·(n−1)/2), NEVER per site — so a continuous variant feed
    * updates a fixed-size table; a pair whose IBS0 rate drifts mid-batch
    * signals a sample swap or contamination event while it's happening.
    * `width` must match the genotypes arrays' length.
    */
  def kinshipPairCounts(variants: DataFrame, width: Int = 12): DataFrame = {
    val pairLits = for { i <- 1 to width; j <- (i + 1) to width }
      yield struct(lit(i).as("i"), lit(j).as("j"))
    variants
      .select(expr("transform(genotypes, g -> CASE WHEN g.gt = '0/1' THEN 1" +
        " WHEN g.gt = '1/1' THEN 2 ELSE 0 END)").as("gc"))
      .select(explode(array(pairLits: _*)).as("p"), col("gc"))
      .select(col("p.i").as("i"), col("p.j").as("j"),
        element_at(col("gc"), col("p.i")).as("gi"),
        element_at(col("gc"), col("p.j")).as("gj"))
      .groupBy("i", "j")
      .agg(
        sum(when(col("gi") === 1 && col("gj") === 1, 1L).otherwise(0L)).as("n_hethet"),
        sum(when((col("gi") === 0 && col("gj") === 2) ||
          (col("gi") === 2 && col("gj") === 0), 1L).otherwise(0L)).as("n_ibs0"),
        sum(when(col("gi") === 1, 1L).otherwise(0L)).as("n_het_i"),
        sum(when(col("gj") === 1, 1L).otherwise(0L)).as("n_het_j"))
  }

  /** Streaming FASTQ QC by read length — q_fastq_roundtrip's aggregate as
    * the live basecaller-output monitor: per-length read counts, GC bases,
    * and low-quality (phred < 20) base counts, aggregated in complete
    * mode. State is one row per distinct read length (instrument-bounded),
    * never per read — a flow cell can stream forever.
    */
  def fastqQcByLength(reads: DataFrame): DataFrame =
    reads
      .select(length(col("seq")).as("len"),
        length(regexp_replace(col("seq"), "[^GC]", "")).cast("long").as("gc"),
        length(regexp_replace(col("qual"), "[^!-4]", "")).cast("long").as("lowq"))
      .groupBy("len")
      .agg(count(lit(1)).as("n_reads"), sum(col("gc")).as("n_gc"),
        sum(col("lowq")).as("n_lowq"))

  /** Streaming X/Y coverage by read group — q_bam_sex_infer's twin, the
    * live sample-swap / contamination check a sequencing facility runs
    * while the flow cell is writing: per-RG chrX/chrY/autosome counts and
    * the running X-fraction. State is one row per read group (sample
    * count), never per read; an inconsistent sex call against the sample
    * sheet stops the run before a mislabeled sample reaches the cohort.
    * Expects `rg` and `contig` columns (the BAM reader exposes RG via the
    * attributes map; project it before handing the stream in).
    */
  def sexCoverageByRg(reads: DataFrame): DataFrame =
    reads
      .groupBy("rg")
      .agg(
        sum(when(col("contig") === "chrX", 1L).otherwise(0L)).as("n_x"),
        sum(when(col("contig") === "chrY", 1L).otherwise(0L)).as("n_y"),
        sum(when(col("contig") =!= "chrX" && col("contig") =!= "chrY", 1L)
          .otherwise(0L)).as("n_auto"))
      .withColumn("x_fraction_milli",
        when(col("n_x") + col("n_y") > 0,
          expr("n_x * 1000 div (n_x + n_y)")).otherwise(lit(null).cast("long")))
      .withColumn("sex_call", when(col("n_y") * 20 < col("n_x"), "F").otherwise("M"))

  /** Streaming media features by kind — q_multimodal_features' live face:
    * the multimodal ingest gate decoding REAL PNG/WAV payloads as they
    * land and keeping per-kind running feature sums (complete mode). The
    * decode is the SAME batched extractFeatures the batch query uses (a
    * codec defect surfaces identically live and offline); state is one row
    * per kind, never per media item, so the ingest can stream forever.
    */
  def mediaFeaturesByKind(
      media: org.apache.spark.sql.Dataset[graft.multimodal.Multimodal.MediaRow]): DataFrame = {
    def milli(k: Int) =
      sum(round(element_at(col("features"), k).cast("double") * 1000).cast("long"))
    graft.multimodal.Multimodal.extractFeatures(media).toDF()
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_units")).as("total_units"),
        milli(1).as("f0_milli_sum"),
        milli(2).as("f1_milli_sum"))
  }

  /** Streaming somatic gate — q_vcf_somatic's live face: tumor variants
    * stream in from the caller and are triaged against the STATIC normal
    * callset (a stream-static left join: the normal side is a bounded
    * batch relation, so there is NO stream-stream state) into the running
    * per-(contig, class) census a molecular tumor board watches during a
    * sequencing run. Classes mirror the batch query: normal-absent with
    * AF ≥ 5% → somatic candidate, normal-absent below → low-AF artifact,
    * shared → germline (normal-only is unobservable on a tumor stream —
    * the batch query reports it from the full-outer join). State is the
    * complete-mode (contig × class) rollup, bounded by contigs × 3.
    * Expects `contig`, `start`, `af_pm` on the stream and
    * `contig`, `start` on the static side.
    */
  def somaticGate(tumor: DataFrame, normalSites: DataFrame): DataFrame =
    tumor
      .join(normalSites.select(col("contig"), col("start"), lit(1).as("in_n"))
        .dropDuplicates("contig", "start"), Seq("contig", "start"), "left_outer")
      .withColumn("cls",
        when(col("in_n").isNull && col("af_pm") >= 50, "somatic")
          .when(col("in_n").isNull, "low_af_artifact")
          .otherwise("germline"))
      .groupBy(col("contig"), col("cls"))
      .agg(count(lit(1)).as("n_sites"), sum(col("af_pm")).as("sum_af_pm"))

  /** Twin 30 — the JPEG ingest gate (q_jpeg_features' live face): each
    * arriving doc id becomes a real JPEG (block-constant gray, alternating
    * 4:2:0 / 4:4:4) that is encoded AND decoded on arrival by the pure-JVM
    * baseline codec; luma/gradient features come from the DECODED pixels
    * (the q75 DC-exact property makes them deterministic), rolled up into
    * the same 8-bucket census as the batch twin. The decode is a stateless
    * narrow map; state is the complete-mode 8-row rollup.
    */
  def jpegIngestGate(docIds: org.apache.spark.sql.Dataset[Long]): DataFrame = {
    val s = docIds.sparkSession
    import s.implicits._
    docIds.map { id =>
      val wb = (4 + 2 * (id % 3)).toInt
      val hb = (2 + 2 * (id % 2)).toInt
      val w = wb * 8; val h = hb * 8
      val px = Array.tabulate(w * h) { i =>
        val g = ((id * 7 + (i % w / 8) * 13 + (i / w / 8) * 29) % 256).toInt
        (g << 16) | (g << 8) | g
      }
      val back = graft.multimodal.Jpeg.decode(graft.multimodal.Jpeg.encode(
        graft.multimodal.Jpeg.Image(w, h, px),
        quality = 75, subsample420 = id % 2 == 0))
      var sumLum = 0L; var grad = 0L
      var y = 0
      while (y < back.height) {
        var prev = -1L
        var x = 0
        while (x < back.width) {
          val p = back.pixels(y * back.width + x)
          val lum = ((p >> 16) & 0xff) * 299L + ((p >> 8) & 0xff) * 587L +
            (p & 0xff) * 114L
          sumLum += lum
          if (prev >= 0) grad += math.abs(lum - prev)
          prev = lum
          x += 1
        }
        y += 1
      }
      (id % 8, (w * h).toLong, sumLum, grad)
    }.toDF("bucket", "n_px", "sum_lum", "grad")
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_px")).as("sum_px"),
        sum(col("sum_lum")).as("sum_lum"),
        sum(col("grad")).as("sum_grad"))
  }

  /** Twin 31 — the video ingest gate (q_multimodal_frames' live face): each
    * arriving doc id becomes a real MJPEG-in-AVI file that is container-
    * walked and frame-decoded on arrival (RIFF chunk walk + per-frame T.81
    * baseline decode — a corrupt container or stream fails loudly instead
    * of passing wrong frames downstream); every 2nd frame's decoded luma
    * rolls up into an 8-bucket census. The decode is a stateless narrow
    * flatMap; state is the complete-mode 8-row rollup.
    */
  def videoFrameGate(docIds: org.apache.spark.sql.Dataset[Long]): DataFrame = {
    val s = docIds.sparkSession
    import s.implicits._
    docIds.flatMap { id =>
      val nf = (3 + id % 5).toInt
      val avi = graft.multimodal.Avi.encodeGrayFrames(16, 16, 10,
        (fi, b) => ((id * 31 + fi.toLong * 7 + b.toLong * 13) % 256).toInt, nf)
      val (_, frames) = graft.multimodal.Avi.decodePixels(avi)
      frames.iterator.zipWithIndex.filter(_._2 % 2 == 0).map { case (img, _) =>
        var lum = 0L
        var k = 0
        while (k < img.pixels.length) { lum += (img.pixels(k) >> 16) & 0xff; k += 1 }
        (id % 8, img.pixels.length.toLong, lum)
      }
    }.toDF("bucket", "n_px", "lum")
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_frames"),
        sum(col("n_px")).as("sum_px"),
        sum(col("lum")).as("sum_lum"))
  }
}
