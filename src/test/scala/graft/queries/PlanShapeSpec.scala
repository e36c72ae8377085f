package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Pins the SCALE-CRITICAL physical-plan shapes of the pipeline queries the
  * same way IndexPruningGuardSpec pins index pruning: a refactor that
  * silently turns a broadcast join into a corpus shuffle, or re-evaluates a
  * native expression per consumer, would pass the correctness gate (same
  * rows) while destroying the 100×-scale story — so the plan itself is the
  * asserted contract.
  */
class PlanShapeSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  /** FINAL plan after execution — AQE's initial plan may still show
    * sort-merge joins that the runtime replaces, so assert on what ran
    * (the adaptive plan's toString appends the initial plan; cut it off).
    */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val cut = s.indexOf("== Initial Plan ==")
    if (cut >= 0) s.substring(0, cut) else s
  }

  test("ANN queries join the corpus against a BROADCAST query side") {
    for (q <- Seq("q_ann_bruteforce", "q_ann_lsh", "q_ann_multiprobe")) {
      val p = finalPlan(Pipeline.queries(q)(spark, sf))
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
        s"$q: query side is not broadcast\n$p")
      // the corpus must never shuffle to MEET a join: a bucket-keyed hash
      // exchange would mean the join degraded to sort-merge/shuffled-hash
      // (the post-join window legitimately exchanges on query_id)
      val bucketExchanges = p.linesIterator
        .filter(_.contains("Exchange hashpartitioning"))
        .filterNot(_.contains("query_id")).toSeq
      assert(bucketExchanges.isEmpty,
        s"$q: corpus-side shuffle appeared: ${bucketExchanges.mkString("; ")}\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q: join degraded to sort-merge\n$p")
    }
  }

  test("q_ann_ivf centroid assignment is narrow — no corpus-sized exchange") {
    // the codebook rides along as ONE broadcast row and the argmax is a
    // projection, so no Exchange may hash-partition the corpus by vec_id
    // (the old broadcast-join + groupBy(vec_id) shape shipped every vector
    // — including its full 64-long q array — through a shuffle that only
    // merged an already-complete partial aggregate)
    val p = finalPlan(Pipeline.queries("q_ann_ivf")(spark, sf))
    val vecExchanges = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .filter(_.contains("vec_id")).toSeq
    assert(vecExchanges.isEmpty,
      s"q_ann_ivf: corpus shuffled on vec_id: ${vecExchanges.mkString("; ")}\n$p")
    assert(!p.contains("SortMergeJoin"), s"q_ann_ivf: join degraded to sort-merge\n$p")
  }

  test("q_ann_ivfpq: coarse assign + residual + PQ encode stay narrow") {
    // the IVF-PQ corpus pass composes three kernels in one projection with
    // both codebooks broadcast — like q_ann_ivf/q_ann_pq, no Exchange may
    // hash-partition the corpus by vec_id, and no join may degrade to
    // sort-merge (the probe side is 10 broadcast rows)
    val p = finalPlan(Pipeline.queries("q_ann_ivfpq")(spark, sf))
    val vecExchanges = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .filter(_.contains("vec_id")).toSeq
    assert(vecExchanges.isEmpty,
      s"q_ann_ivfpq: corpus shuffled on vec_id: ${vecExchanges.mkString("; ")}\n$p")
    assert(!p.contains("SortMergeJoin"), s"q_ann_ivfpq: join degraded to sort-merge\n$p")
  }

  test("q_dedup_semantic: assignment narrow, pairs bucket-generated — no join") {
    // SemDeDup's cell assignment must be the same broadcast-codebook argmax
    // projection the IVF family uses (no Exchange on vec_id), and the
    // in-cell pair walk must be the collect_list bucket shape — a plan with
    // a SortMergeJoin means someone rewrote it as a corpus self-join on
    // cid, which shuffles the corpus TWICE and skews on hot cells
    val p = finalPlan(Pipeline.queries("q_dedup_semantic")(spark, sf))
    val vecExchanges = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .filter(_.contains("vec_id")).toSeq
    assert(vecExchanges.isEmpty,
      s"q_dedup_semantic: corpus shuffled on vec_id: ${vecExchanges.mkString("; ")}\n$p")
    assert(!p.contains("SortMergeJoin"), s"q_dedup_semantic: pair walk degraded to a join\n$p")
  }

  test("q_decontam_bloom: membership prefilter sits under the confirm join") {
    // the point of the Bloom variant is the train side shrinking BEFORE the
    // fp-join shuffle: the physical plan must carry a Filter with the
    // word-probe shape (shiftleft bit test) — if the filter is optimized
    // away or hoisted above the join, the plan degrades to q_decontaminate
    // (Catalyst folds the filter into the 1-row crossJoin's condition, so
    // the probe appears as a BroadcastNestedLoopJoin condition — either
    // rendering is the wanted plan, as long as it sits BELOW the fp join)
    val p = finalPlan(Pipeline.queries("q_decontam_bloom")(spark, sf))
    val lines = p.linesIterator.toVector
    val probeLine = lines.indexWhere(_.contains("shiftleft"))
    val confirmLine = lines.indexWhere(l =>
      (l.contains("BroadcastHashJoin") || l.contains("SortMergeJoin") ||
        l.contains("ShuffledHashJoin")) && l.contains("fp"))
    assert(probeLine >= 0, s"q_decontam_bloom: no Bloom word-probe in the plan\n$p")
    assert(confirmLine >= 0 && probeLine > confirmLine,
      s"q_decontam_bloom: prefilter not below the confirm join (probe@$probeLine, join@$confirmLine)\n$p")
  }

  test("funnel stages join broadcast per-user aggregates, not stream-vs-stream") {
    val p = finalPlan(Relational.queries("q_events_funnel")(spark, sf))
    // the scale contract: every join the RAW event stream participates in
    // (the stage joins, recognizable by their ms > bound condition) builds
    // a broadcast of the per-user aggregate — the stream itself never
    // shuffles to meet a join. Aggregate-vs-aggregate assembly joins may
    // be sort-merge; both sides are user-cardinality and co-partitioned.
    val stageJoins = p.linesIterator
      .filter(l => l.contains("Join") && l.contains("(ms#")).toSeq
    assert(stageJoins.nonEmpty, s"no stage joins found\n$p")
    assert(stageJoins.forall(_.contains("BroadcastHashJoin")),
      s"a stage join shuffles the event stream: ${stageJoins.mkString("; ")}\n$p")
  }

  test("q_events_asof contains no join — the as-of runs as union + window") {
    // the distributed as-of contract: a refactor that reintroduces a range
    // join (per-row probe) or any join at all has destroyed the
    // one-shuffle-linear shape, even though the rows stay identical
    val p = finalPlan(Relational.queries("q_events_asof")(spark, sf))
    assert(!p.contains("Join"), s"q_events_asof plans a join\n$p")
    assert(p.contains("Window"), s"q_events_asof lost its window\n$p")
  }

  test("q_interval_join_binned joins on equi-keys, never a nested loop") {
    // both sides are corpus-sized at scale: the overlap must ride the
    // (contig, bin) equi-join (hash or sort-merge — AQE may broadcast at
    // this SF, also fine); BroadcastNestedLoopJoin/CartesianProduct means
    // the binning stopped reaching the join keys
    val p = finalPlan(Relational.queries("q_interval_join_binned")(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q_interval_join_binned degraded to a non-equi join\n$p")
  }

  test("q_bucketed_join reads bucket-to-bucket — no Exchange on either side") {
    // the layout contract: both fact tables are written bucketed on the
    // join key, so the sort-merge join must consume the scans directly —
    // an Exchange on either orderkey means the bucketing metadata was
    // lost and the nightly fact-fact join pays a full corpus shuffle
    val p = finalPlan(Relational.queries("q_bucketed_join")(spark, sf))
    assert(p.contains("SortMergeJoin"), s"q_bucketed_join lost its merge join\n$p")
    val keyExchanges = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .filter(l => l.contains("l_orderkey") || l.contains("o_orderkey")).toSeq
    assert(keyExchanges.isEmpty,
      s"q_bucketed_join shuffles a bucketed side: ${keyExchanges.mkString("; ")}\n$p")
    assert(p.contains("Bucketed: true"), s"scan does not report bucketed read\n$p")
  }

  test("q_skew_salted_join exchanges on the SALTED pair, never the raw key") {
    // the skew contract: the join's shuffle key must be (event_type, salt)
    // — an exchange on event_type alone means the salt was optimized away
    // and the hottest type pins a single reducer again at scale
    // the post-join aggregate merge and the dim-distinct legitimately
    // exchange on bare event_type (aggregate-tiny rows) — the contract is
    // on the JOIN's own keys, so assert on the join operator lines
    val p = finalPlan(Relational.queries("q_skew_salted_join")(spark, sf))
    val joins = p.linesIterator
      .filter(l => l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")).toSeq
    assert(joins.nonEmpty, s"no shuffle join found\n$p")
    assert(joins.forall(_.contains("salt")),
      s"join keys lost the salt: ${joins.mkString("; ")}\n$p")
  }

  test("q_events_latest plans a WindowGroupLimit (top-1 before the shuffle)") {
    // the compaction contract: per-partition top-1 pushdown must survive —
    // losing WindowGroupLimit means the full corpus crosses the user_id
    // exchange just to be discarded by the rn = 1 filter
    val p = finalPlan(Relational.queries("q_events_latest")(spark, sf))
    assert(p.contains("WindowGroupLimit"), s"q_events_latest lost WindowGroupLimit\n$p")
  }

  test("q_profile_cms probes join the sketch via broadcast") {
    // the sketch is ≤ depth × width rows by construction — the 80 probe
    // rows must meet it in a broadcast join, never a shuffle of either side
    val p = finalPlan(Relational.queries("q_profile_cms")(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"q_profile_cms: sketch probe join not broadcast\n$p")
    assert(!p.contains("SortMergeJoin"), s"q_profile_cms: join degraded to sort-merge\n$p")
  }

  test("q_sample_pergroup plans a WindowGroupLimit (top-5 before the shuffle)") {
    // same contract as q_events_latest for the per-stratum sample: each map
    // task keeps its local top-5 per lang, so the lang exchange carries
    // ≤ 5 × #langs × #partitions rows instead of the corpus
    val p = finalPlan(Pipeline.queries("q_sample_pergroup")(spark, sf))
    assert(p.contains("WindowGroupLimit"), s"q_sample_pergroup lost WindowGroupLimit\n$p")
  }

  test("q_profile_hll estimate lands within the HLL error band of exact counts") {
    // not a plan shape, but the sketch's reason to exist: the corrected
    // estimate (raw, or linear counting m·ln(m/V) when raw < 2.5m — the
    // transcendental branch the oracled query leaves presentation-side)
    // must land within ~2σ of HLL's standard error at m=256 (6.5%)
    import org.apache.spark.sql.functions._
    val m = 256
    val rows = Relational.queries("q_profile_hll")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    val exact = Tables.events(spark, sf)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == exact.keySet)
    for ((t, e) <- exact) {
      val (nb, raw) = rows(t)
      val corrected =
        if (raw < 5 * m / 2 && nb < m) m * math.log(m.toDouble / (m - nb))
        else raw.toDouble
      assert(math.abs(corrected - e) / e <= 0.15,
        s"$t: hll=$corrected exact=$e (${math.abs(corrected - e) / e * 100}%)")
    }
  }

  test("q_dedup_incremental pairs inside buckets — no join anywhere") {
    // batch-vs-corpus pairing happens INSIDE each band bucket (two filtered
    // arrays of one collect_list); a refactor that joins the batch against
    // the corpus band table would re-shuffle the corpus per increment
    val p = finalPlan(Pipeline.queries("q_dedup_incremental")(spark, sf))
    assert(!p.contains("Join"), s"q_dedup_incremental plans a join\n$p")
  }

  test("q_mix_sample joins the corpus only against broadcast totals") {
    // the per-lang totals are aggregate-tiny at any corpus size; the
    // corpus-sided pass must stay a narrow filter (no exchange to meet a
    // sort-merge/shuffled-hash join on lang — a near-constant key space
    // that would also skew catastrophically)
    val p = finalPlan(Pipeline.queries("q_mix_sample")(spark, sf))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"q_mix_sample shuffles the corpus to meet a join\n$p")
    assert(p.contains("BroadcastHashJoin"), s"q_mix_sample lost its broadcast joins\n$p")
  }

  test("q_kmeans_train: corpus is never hash-partitioned by vec_id") {
    // every Lloyd round must keep the shape the IVF query pins: codebook
    // collapsed to one broadcast row, assignment a narrow argmax
    // projection; the only shuffle merges (#centroids × 64) partial sums.
    // An Exchange on vec_id would mean assignment regressed to the
    // join + groupBy shape that ships the whole corpus per round.
    val p = finalPlan(Pipeline.queries("q_kmeans_train")(spark, sf))
    val vecExchanges = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .filter(_.contains("vec_id")).toSeq
    assert(vecExchanges.isEmpty,
      s"q_kmeans_train: corpus shuffled on vec_id: ${vecExchanges.mkString("; ")}\n$p")
    assert(!p.contains("SortMergeJoin"), s"q_kmeans_train join degraded to sort-merge\n$p")
  }

  test("q_fuzzy_linkage: gram-blocked pairs, never a cartesian/nested-loop join") {
    val p = finalPlan(Pipeline.queries("q_fuzzy_linkage")(spark, sf))
    assert(!p.contains("CartesianProduct"), s"q_fuzzy_linkage went cartesian\n$p")
    // a name-vs-name comparison without the gram equi-key would surface as
    // a nested-loop join over the inequality filter
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"q_fuzzy_linkage pair space is not gram-keyed\n$p")
  }

  test("q_text_lm_score: count tables join the doc-bigram table on keys") {
    val p = finalPlan(Pipeline.queries("q_text_lm_score")(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q_text_lm_score joins degraded\n$p")
    // the scoring rollup must aggregate on doc_id (partial + final), not
    // collect per-doc rows anywhere
    assert(p.contains("HashAggregate"), s"q_text_lm_score rollup missing\n$p")
  }

  test("q_ann_recall composes the two top-k pipelines without widening") {
    val p = finalPlan(Pipeline.queries("q_ann_recall")(spark, sf))
    // both inputs end TakeOrdered-small upstream; the overlap join of two
    // k-row sides must not re-shuffle a corpus-sized relation
    assert(!p.contains("CartesianProduct"), s"q_ann_recall went cartesian\n$p")
    assert(p.contains("BroadcastHashJoin") || !p.contains("SortMergeJoin"),
      s"q_ann_recall overlap join degraded\n$p")
  }

  test("q_vocab_bigrams top-k runs as TakeOrdered, not a global sort") {
    // per-partition heaps ship k rows to the driver; a full Sort before
    // the limit would materialize the entire bigram vocabulary ordered
    val p = finalPlan(Pipeline.queries("q_vocab_bigrams")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"),
      s"q_vocab_bigrams lost its TakeOrdered top-k\n$p")
  }

  test("q_cluster_purity: corpus is never hash-partitioned by vec_id") {
    // same contract as IVF/k-means: centroid assignment must stay a
    // narrow broadcast-codebook argmax; an Exchange on vec_id means the
    // cross-modal join degraded into shipping the assigned corpus twice
    val p = finalPlan(Pipeline.queries("q_cluster_purity")(spark, sf))
    val vecExchanges = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .filter(_.contains("vec_id")).toSeq
    assert(vecExchanges.isEmpty,
      s"assignment shuffled on vec_id: ${vecExchanges.mkString("; ")}\n$p")
  }

  test("q_dedup_minhash_sig evaluates the native expression exactly once") {
    val analyzed = Pipeline.queries("q_dedup_minhash_sig")(spark, sf)
      .queryExecution.optimizedPlan.toString
    val evals = "graft_minhash_sig".r.findAllIn(analyzed).length
    assert(evals == 1,
      s"graft_minhash_sig appears $evals times in the optimized plan — " +
        s"projection collapse re-inlined the non-cheap expression\n$analyzed")
  }

  test("single-consumer native expressions evaluate exactly once each") {
    // (the LSH bucket legitimately appears twice in the ANN plans: once on
    // the corpus side, once on the query side of the self-derived join)
    // (q_ann_ivf's graft_ivf_argmax is deliberately NOT pinned to one: the
    // probes side carries a cid < 16 constraint, and InferFiltersFromConstraints
    // pushes `argmax < 16 AND isnotnull(argmax)` below the aliasing
    // projection — up to 3 evals of a ~1k-madd kernel per row, measured
    // harmless; the load-bearing IVF guard is the no-Exchange test above)
    val oncePer = Seq(
      "q_text_langid" -> "graft_stop_hits",
      "q_text_quality" -> "graft_stop_hits",
      "q_dedup_simhash" -> "graft_simhash",
      "q_dedup_simhash_pairs" -> "graft_simhash",
      "q_text_fingerprint" -> "graft_fingerprints")
    for ((q, fn) <- oncePer) {
      val analyzed = Pipeline.queries(q)(spark, sf).queryExecution.optimizedPlan.toString
      val evals = fn.r.findAllIn(analyzed).length
      assert(evals == 1, s"$q: $fn appears $evals times\n$analyzed")
    }
  }

  test("q_ann_pq: encoding and ADC stay narrow — corpus never shuffles on vec_id") {
    // the PQ codebook rides as ONE broadcast row (encode) and the query
    // side as a broadcast relation (ADC); an Exchange on vec_id would mean
    // the corpus shuffled to meet a join it should only ever stream past
    val p = finalPlan(Pipeline.queries("q_ann_pq")(spark, sf))
    val vecExchanges = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .filter(_.contains("vec_id")).toSeq
    assert(vecExchanges.isEmpty,
      s"q_ann_pq: corpus shuffled on vec_id: ${vecExchanges.mkString("; ")}\n$p")
    assert(!p.contains("SortMergeJoin"), s"q_ann_pq: join degraded to sort-merge\n$p")
  }

  test("q_dedup_substr: every hash exchange carries the fingerprint, no join") {
    // sampled-gram explode then ONE logical shuffle on fp (the distinct
    // doc-count rewrite may stage it as fp,doc_id then fp — both are
    // fingerprint-partitioned); a join or a non-fp exchange would mean the
    // registry degenerated into a pairwise comparison
    val p = finalPlan(Pipeline.queries("q_dedup_substr")(spark, sf))
    assert(!p.contains("Join"), s"q_dedup_substr plans a join\n$p")
    val ex = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(ex.nonEmpty && ex.forall(_.contains("fp")),
      s"q_dedup_substr: non-fingerprint exchange: ${ex.mkString("; ")}\n$p")
  }

  test("q_train_order: broadcast epoch fan-out, aggregate exchanges on (epoch, shard)") {
    val p = finalPlan(Pipeline.queries("q_train_order")(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"q_train_order: epoch fan-out is not a broadcast\n$p")
    assert(!p.contains("SortMergeJoin"), s"q_train_order degraded to sort-merge\n$p")
    val ex = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(ex.forall(l => l.contains("epoch") && l.contains("shard")),
      s"q_train_order: exchange off the manifest key: ${ex.mkString("; ")}\n$p")
  }

  test("q_rollup_region_priority: Expand before the partial aggregate, broadcast dims") {
    // grouping sets must run as ONE Expand + aggregate pass — the shuffle
    // carries (3 × |groups|) pre-aggregated rows, never 3× the fact table
    // re-scanned per set — and every dimension join stays broadcast
    val p = finalPlan(Relational.queries("q_rollup_region_priority")(spark, sf))
    assert(p.contains("Expand"), s"rollup lost its Expand (grouping sets re-scan?)\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"rollup dimension join shuffles the fact table\n$p")
    assert(p.contains("BroadcastHashJoin"), s"rollup lost its broadcast dims\n$p")
  }

  test("q_returned_orders_semijoin plans a LeftSemi — probe payload never widens") {
    val p = finalPlan(Relational.queries("q_returned_orders_semijoin")(spark, sf))
    assert(p.contains("LeftSemi"), s"EXISTS did not plan as a semi join\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"semi join degraded\n$p")
  }

  test("q_vocab_oov: vocab via TakeOrdered, membership join broadcast") {
    // the 256-term vocabulary must come from per-partition heaps (never a
    // full sort of the term-frequency table) and must BROADCAST to the
    // exploded token stream — a shuffled join on term would re-exchange
    // the whole token stream against a 256-row side
    val p = finalPlan(Pipeline.queries("q_vocab_oov")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), s"vocab derived via full sort\n$p")
    assert(p.contains("BroadcastHashJoin"), s"membership join not broadcast\n$p")
    assert(!p.contains("SortMergeJoin"), s"token stream shuffled to meet the vocab\n$p")
  }

  test("q_mix_alpha joins the corpus only against broadcast targets") {
    // same contract as q_mix_sample: per-lang targets are rollup-tiny, the
    // corpus pass is a narrow Bernoulli filter — no exchange on lang
    val p = finalPlan(Pipeline.queries("q_mix_alpha")(spark, sf))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"q_mix_alpha shuffles the corpus to meet a join\n$p")
    assert(p.contains("BroadcastHashJoin"), s"q_mix_alpha lost its broadcast joins\n$p")
  }

  test("q_partition_prune: lang filter prunes at the directory level") {
    // the language predicate must land in PartitionFilters (directory
    // pruning), NOT as a row-level PushedFilters residual — and lang must
    // be a partition column, absent from the parquet data schema read
    val p = finalPlan(Relational.queries("q_partition_prune")(spark, sf))
    assert(p.contains("PartitionFilters") &&
      p.linesIterator.exists(l => l.contains("PartitionFilters") && l.contains("lang")),
      s"lang predicate did not become a partition filter\n$p")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema"))
      .map(_.split("ReadSchema:")(1)).getOrElse("")
    assert(!readSchema.contains("lang"),
      s"lang still read from the data files: $readSchema")
  }

  test("q_dpp_join: the dim filter becomes a runtime partition filter") {
    // the fact scan's PartitionFilters must carry a dynamicpruning
    // expression fed by the filtered dimension — without it the scan
    // reads all 12 month directories regardless of the dim selection
    val p = finalPlan(Relational.queries("q_dpp_join")(spark, sf))
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"fact scan is not dynamically pruned by the dim side\n$p")
  }

  test("q_pagerank: iterations are edge-keyed joins, never cartesian/nested-loop") {
    // each power iteration must join ranks into the degree-carrying edge
    // table on src and roll up on dst — a CartesianProduct or nested-loop
    // join would mean the rank update degenerated to all-pairs; exchanges
    // may only carry the graph keys (src/dst/id/c/p + the final TakeOrdered)
    val p = finalPlan(Relational.queries("q_pagerank")(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q_pagerank iteration went all-pairs\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"q_pagerank top-20 is a full sort\n$p")
  }

  test("q_cluster_topics: assignment narrow — corpus never shuffles on vec_id") {
    // same contract as the IVF family: the centroid assignment must stay
    // a broadcast-codebook argmax projection; exchanges may carry the
    // (cid, term) rollup keys, never vec_id
    val p = finalPlan(Pipeline.queries("q_cluster_topics")(spark, sf))
    val vecExchanges = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .filter(_.contains("vec_id")).toSeq
    assert(vecExchanges.isEmpty,
      s"q_cluster_topics: corpus shuffled on vec_id: ${vecExchanges.mkString("; ")}\n$p")
  }

  test("q_embed_rp_recall: projection is narrow, corpus never shuffles on vec_id") {
    // the 64→16 projection must be a codegen projection (no exchange), the
    // reduced-space scan must join a BROADCAST query side, and — like the
    // whole ANN family — no Exchange may hash-partition the corpus by
    // vec_id (the post-join window legitimately exchanges on query_id)
    val p = finalPlan(Pipeline.queries("q_embed_rp_recall")(spark, sf))
    val vecExchanges = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .filterNot(_.contains("query_id")).toSeq
    assert(vecExchanges.isEmpty,
      s"q_embed_rp_recall: corpus-side shuffle: ${vecExchanges.mkString("; ")}\n$p")
    assert(!p.contains("SortMergeJoin"), s"q_embed_rp_recall join degraded\n$p")
  }

  test("q_late_priority_orders: correlated EXISTS compiles to ONE semi join") {
    // a rewrite through count-then-filter would materialize the late set
    // and add an aggregate + inner join; the pin is the semi join itself
    val p = finalPlan(Relational.queries("q_late_priority_orders")(spark, sf))
    assert(p.contains("LeftSemi"), s"EXISTS lost its semi join\n$p")
  }

  test("q_lapsed_rich_customers: broadcast scalar + anti join, no corpus shuffle for either") {
    val p = finalPlan(Relational.queries("q_lapsed_rich_customers")(spark, sf))
    assert(p.contains("LeftAnti"), s"NOT EXISTS lost its anti join\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"scalar total not broadcast\n$p")
  }

  test("q_hist_quantiles: shuffle carries HISTOGRAM BUFFERS, not rows — and FUSED ones") {
    // the TypedImperativeAggregate must split partial/final around ONE
    // group-key exchange — losing the partial mode would ship the corpus;
    // and FuseHistQuantiles must collapse the two same-(qty,1) quantiles
    // into one shared buffer (2 buffers total, not 3)
    val df = Relational.queries("q_hist_quantiles")(spark, sf)
    val p = finalPlan(df)
    val oha = p.linesIterator.count(_.contains("ObjectHashAggregate"))
    assert(oha >= 2, s"partial/final aggregate split lost\n$p")
    val ex = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(ex.size == 1 && ex.head.contains("l_returnflag"),
      s"expected exactly one group-key exchange, got: ${ex.mkString("; ")}\n$p")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("graft_hist_quantiles"), s"median/p90 fusion did not fire\n$opt")
  }

  test("q_reads_lake: contig filter prunes to ONE lake partition directory") {
    val df = FormatQueries.queries("q_reads_lake")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    val scan = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scan.contains("chr1"),
      s"contig filter did not reach PartitionFilters — the lake scan reads all contigs\n$p")
  }

  test("q_bam_liftover: chain side broadcasts — reads never shuffle to remap") {
    val p = finalPlan(FormatQueries.queries("q_bam_liftover")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"chain not broadcast\n$p")
    assert(!p.contains("SortMergeJoin"), s"liftover join degraded\n$p")
  }

  test("q_filtered_revenue: every predicate reaches the scan, 4-column read") {
    // the Q6 shape is pure I/O at 100 TB — shipdate/discount/quantity must
    // appear in PushedFilters (row-group min/max pruning), and ReadSchema
    // must carry only the four touched columns, not the full lineitem row
    val df = Relational.queries("q_filtered_revenue")(spark, sf)
    df.collect()
    val scan = df.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("PushedFilters")).mkString("\n")
    assert(scan.contains("l_shipdate") && scan.contains("l_quantity"),
      s"scan filters not pushed\n$scan")
    val read = df.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("l_orderkey") && !read.contains("l_returnflag"),
      s"projection did not prune the scan\n$read")
  }

  test("q_returned_top_customers: top-20 is TakeOrdered, nation broadcast") {
    val p = finalPlan(Relational.queries("q_returned_top_customers")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"),
      s"limit lost its TakeOrdered — a global sort would materialize every customer\n$p")
    assert(p.contains("BroadcastHashJoin"), s"nation not broadcast\n$p")
  }

  test("q_top_supplier: ONE lineitem scan — scalar max via window over the aggregate") {
    val p = finalPlan(Relational.queries("q_top_supplier")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"winner probe not broadcast\n$p")
    // one fact scan only: the max must ride the per-supplier aggregate
    // (window), not a second full pass over lineitem
    val scans = p.linesIterator.count(l => l.contains("FileScan parquet") && l.contains("lineitem"))
    assert(scans == 1, s"lineitem scanned $scans times\n$p")
    assert(p.contains("Window"), s"scalar max lost its window formulation\n$p")
  }

  test("q_part_supplier_variety: bad suppliers excluded via broadcast ANTI join") {
    val p = finalPlan(Relational.queries("q_part_supplier_variety")(spark, sf))
    assert(p.contains("LeftAnti"), s"NOT IN lost its anti join\n$p")
    assert(p.linesIterator.exists(l => l.contains("LeftAnti") && l.contains("Broadcast")),
      s"anti join not broadcast — the tiny bad-supplier set caused a shuffle\n$p")
  }

  test("q_excess_stock_suppliers: supplier probe is LEFT SEMI — no row duplication") {
    val p = finalPlan(Relational.queries("q_excess_stock_suppliers")(spark, sf))
    assert(p.contains("LeftSemi"), s"IN-subquery lost its semi join\n$p")
  }

  test("q_vcf_hwe: per-site genotype counting is NARROW — no explode, no per-sample rows") {
    // the whole HWE classification runs as higher-order array functions in
    // one projection; a Generate here means someone rewrote it as a
    // per-genotype explode — 12x the rows through the aggregate
    val p = finalPlan(FormatQueries.queries("q_vcf_hwe")(spark, sf))
    assert(!p.contains("Generate"),
      s"q_vcf_hwe explodes genotypes — per-site HOF counting lost\n$p")
  }

  test("q_genomic_closest: nearest-feature search is JOIN-FREE (union + window)") {
    // a range/theta join here is quadratic in feature density; the pin is
    // that no join operator appears at all — both directions come from
    // window carries over one contig-keyed sort
    val p = finalPlan(FormatQueries.queries("q_genomic_closest")(spark, sf))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct") && !p.contains("ShuffledHashJoin"),
      s"nearest-feature search degraded to a join\n$p")
    assert(p.contains("Window"), s"window carry lost\n$p")
    // Spark's UnboundedFollowing frame is O(partition²) — both carries
    // must be RUNNING frames (the after-side over the reversed sort)
    assert(!p.toLowerCase.contains("unboundedfollowing"),
      s"an O(n²) following frame crept back in\n$p")
  }

  test("q_events_gapfill: interpolation windows partition by series key") {
    // Window.partitionBy(event_type) — a global (empty-partition) window
    // would serialize every series through one task
    val p = finalPlan(Relational.queries("q_events_gapfill")(spark, sf))
    assert(p.contains("Generate"), s"spine explode lost its Generate\n$p")
    val wins = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(wins.exists(_.contains("event_type")),
      s"interpolation window not keyed by event_type: ${wins.mkString("; ")}\n$p")
    assert(!p.toLowerCase.contains("unboundedfollowing"),
      s"an O(series²) following frame crept back in\n$p")
  }

  test("q_kmer_spectrum: k-mer counting is Generate + hash agg, no pre-agg exchange") {
    // the only wide exchanges may carry k-mer partial counts or the tiny
    // multiplicity rollup — never the exploded per-window rows themselves
    val df = FormatQueries.queries("q_kmer_spectrum")(spark, sf)
    val p = finalPlan(df)
    assert(p.contains("Generate"), s"window explode lost its Generate\n$p")
    val ex = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(ex.forall(l => l.contains("kmer") || l.contains("n#") || l.contains("n ")),
      s"an exchange carries something other than k-mer partials/rollup keys: ${ex.mkString("; ")}\n$p")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 4,
      s"map-side partial aggregation lost\n$p")
  }
}
