package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Large-scale training-data pipeline operators over `documents` /
  * `embeddings`: deduplication (exact, MinHash+LSH, SimHash, n-gram
  * Jaccard, embedding-cosine, cluster resolution to canonical keepers),
  * similarity search (brute-force + LSH-bucketed + IVF ANN), text analysis
  * (token counting, language ID, quality scoring, fingerprinting, TF-IDF),
  * and pipeline assembly (stratified split assignment, sequence packing,
  * quality->dedup->split curation, benchmark decontamination).
  *
  * Every hash is engine-portable (md5-hex-prefix → 60-bit int, see
  * [[graft.functions.GraftFunctions.hash60]]) and every similarity is
  * integer-quantized, so the DuckDB oracle reproduces results bit-for-bit —
  * no float drift at any parallelism.
  *
  * Scale notes (100 TB discipline):
  *  - per-document signatures (minhash/simhash/fingerprints) are computed
  *    with array higher-order functions inside whole-stage codegen — one
  *    narrow pass, no explode, no shuffle until the (tiny) band join;
  *  - pair generation is always bucketed (LSH band, (lang, source) group,
  *    label) so candidate pairs stay near-linear, never all-pairs global;
  *  - the ANN query side is a broadcast (5 vectors), so the big side never
  *    shuffles; the LSH variant prunes candidates by bucket equality first.
  */
object Pipeline {

  // canonical stop lists live next to the native expression that counts
  // them (graft_stop_hits) — the oracle SQL below is built from the same
  // Seqs, so query, expression, and oracle cannot diverge
  private val StopEn = graft.functions.StopHitsExpr.En
  private val StopDe = graft.functions.StopHitsExpr.De
  private val StopFr = graft.functions.StopHitsExpr.Fr
  private val StopEs = graft.functions.StopHitsExpr.Es

  private[graft] val MinhashK = 16
  private[graft] val Bands = 4 // rows per band = 4
  private val SimhashBits = 60
  /** 4 bands × 15 bits: pigeonhole guarantees hamming ≤ 3 pairs collide. */
  private val SimhashBands = 4
  private val FpMod = 17 // keep word-5-gram fingerprints where hash % 17 == 0
  // substring-dedup constants live with the native expression that samples
  // the grams (graft_substr_fps) — same no-divergence convention as the
  // stop lists: query, expression, and oracle read one definition
  private val SubstrGram = graft.functions.SubstrFpsExpr.Gram
  private val SubstrMod = graft.functions.SubstrFpsExpr.Mod
  private val OrderShards = 32 // training-order shards (worker files) per epoch
  // product quantization: 64-dim embedding → 8 subspaces × 8 dims, 16 codes
  // each — constants live on the native kernel object (one definition for
  // query, kernel, and oracle)
  private val PqSub = graft.functions.NativePq.Sub
  private val PqDim = graft.functions.NativePq.Dim
  private val PqCodes = graft.functions.NativePq.Codes

  // PII patterns shared by the Spark query and its oracle: kept to syntax
  // both Java regex and RE2 (DuckDB) read identically
  private val PiiEmailRe = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val PiiPhoneRe = "\\d{3}-\\d{4}-\\d{4}"
  private val QdotThreshold = 300000L // quantized cosine ≥ 0.3
  private val ContainMilli = 200L // containment re-score floor (|A∩B|/min ≥ 0.2)
  private val LshPlanes = 8
  /** LSH bucket-size guard: a (band, bandhash) bucket larger than this
    * emits STAR pairs against its minimum member ([[bucketPairs]]) instead
    * of the full pair expansion — collect_list+quadratic pair generation
    * inside one hot bucket is the classic 100 TB skew bomb, but dropping
    * the bucket outright (the previous rule) silently lost the densest
    * duplicate families, which are the highest-value dedup targets.
    */
  private val MaxBucket = 64
  // chunking: 32-word windows at stride 24 (8-word overlap) — the RAG /
  // context-length splitting shape; constants shared with the oracle
  private val ChunkWords = 32
  private val ChunkStride = 24
  // boilerplate: non-overlapping 8-word segments, boiler = segment hash
  // seen in >= BoilerDf distinct docs (the CCNet paragraph-frequency rule)
  private val SegWords = 8
  private val BoilerDf = 2
  /** SemDeDup near-dup threshold: quantized cosine ≥ 0.35 — tighter than
    * the LSH-bucketed [[QdotThreshold]] because cells are wider than
    * hyperplane buckets (the cell scan sees every in-cell pair).
    */
  private val SemThreshold = 350000L
  /** SemDeDup expected cell occupancy; cells per corpus derive from it. */
  private val SemCellTarget = 128L

  // ---- shared Spark-side builders ---------------------------------------

  /** words + 3-word shingles, guarded for <3-word docs. */
  private def withShingles(df: DataFrame): DataFrame = {
    val ws = filter(split(col("text"), " "), w => length(w) > 0)
    df.withColumn("ws", ws)
      .withColumn("shingles",
        when(size(col("ws")) >= 3,
          transform(sequence(lit(1), size(col("ws")) - 2),
            i => concat_ws(" ", element_at(col("ws"), i), element_at(col("ws"), i + 1),
              element_at(col("ws"), i + 2))))
          .otherwise(array()))
  }

  /** One md5 per shingle (the expensive part), then a universal-hash
    * family h_k = ((2k+1)·h + 1000003·k) mod (2^31-1) for the K minhash
    * slots — 16× fewer md5s than hashing (k, shingle) pairs, same
    * minhash semantics, still portable integer arithmetic.
    */
  private val MinhashP = 2147483647L // 2^31 - 1

  private def shingleHashes: Column =
    transform(col("shingles"), sh => hash60(sh) % MinhashP)

  /** Quantize a float-array embedding to integer millis (exact x-engine). */
  private def quantized(c: Column): Column =
    transform(c, x => round(x.cast("double") * 1000).cast("long"))

  private[graft] def qdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Overlapping-window chunk rows: (doc_id, chunk_idx, chunk_start,
    * chunk_len, chunk_hash) — [[ChunkWords]]-word windows at
    * [[ChunkStride]] stride, last window ragged but always reaching the
    * end of the doc. Stateless and narrow, so the SAME definition runs on
    * a batch corpus AND a document stream ([[graft.streaming.Streaming
    * .chunkDocs]]); the batch query can never silently diverge from the
    * streaming twin.
    */
  private[graft] def chunked(docs: DataFrame): DataFrame = {
    val (cw, st) = (ChunkWords, ChunkStride)
    docs
      .withColumn("ws", filter(split(col("text"), " "), w => length(w) > 0))
      .withColumn("n", size(col("ws")))
      .filter(col("n") > 0)
      // last window start: 0 for short docs, else stride-aligned so the
      // final window still reaches the end of the doc
      .withColumn("last_start",
        when(col("n") <= cw, lit(0))
          .otherwise(expr(s"$st * ((n - $cw + ${st - 1}) div $st)")))
      .select(col("doc_id"), col("ws"),
        posexplode(sequence(lit(0), col("last_start"), lit(st))))
      .toDF("doc_id", "ws", "chunk_idx", "start")
      .select(col("doc_id"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("start").cast("long").as("chunk_start"),
        size(slice(col("ws"), col("start") + 1, lit(cw))).cast("long").as("chunk_len"),
        hash60(concat_ws(" ", slice(col("ws"), col("start") + 1, lit(cw)))).as("chunk_hash"))
  }

  /** doc rows + `segs` = portable hashes of the doc's non-overlapping
    * [[SegWords]]-word blocks (plus `ws`/`n_words`). One definition for
    * the batch boilerplate query and the streaming twin
    * ([[graft.streaming.Streaming.boilerplateSegments]]).
    */
  private[graft] def segmented(docs: DataFrame): DataFrame = {
    val sw = SegWords
    docs
      .withColumn("ws", filter(split(col("text"), " "), w => length(w) > 0))
      .withColumn("n_words", size(col("ws")).cast("long"))
      .withColumn("segs",
        when(col("n_words") >= sw,
          transform(sequence(lit(0), expr(s"int(n_words div $sw) - 1")),
            i => hash60(concat_ws(" ", slice(col("ws"), i * sw + 1, lit(sw))))))
          .otherwise(array().cast("array<long>")))
  }

  /** The batch boilerplate threshold, shared with the streaming twin. */
  private[graft] def boilerDfThreshold: Int = BoilerDf

  /** doc_id + shingle hashes + minhash signature, EMPTY SIGNATURES DROPPED:
    * a doc with <3 words has no shingles, and without this filter every such
    * doc produces the identical all-NULL signature — one corpus-sized
    * (band, bandhash) bucket of semantically meaningless pairs (zero shared
    * shingles). Filtering is both the correct semantics and the skew fix.
    */
  private[graft] def signedDocs(df: DataFrame): DataFrame = {
    // native expression: the whole split→shingle→md5→K-min pipeline is one
    // static call inside whole-stage codegen (the composed HOF form is
    // interpreted; q_dedup_minhash_sig keeps it as the executable spec of
    // the portable semantics, and NativeExprSpec pins equality). NULL sig =
    // <3 words = the rows the old filter dropped.
    graft.functions.MinhashSigExpr.register(df.sparkSession)
    df.withColumn("sig", expr("graft_minhash_sig(text)"))
      .filter(col("sig").isNotNull)
  }

  /** Band hashes over `sig`: Bands slices of the signature, each hashed.
    * Shared with the streaming near-dup twin so the banding expression
    * (not just its parameters) is one definition.
    */
  private[graft] def bandsCol: Column =
    transform(sequence(lit(0), lit(Bands - 1)),
      b => hash60(concat_ws(",",
        transform(slice(col("sig"), b * lit(MinhashK / Bands) + 1, lit(MinhashK / Bands)),
          v => v.cast("string")))))

  /** Candidate pairs within a SORTED bucket-member id array: all (i, j)
    * pairs when the bucket is inside [[MaxBucket]]; STAR pairs — the bucket
    * minimum paired with every other member, O(bucket) rows — once it
    * exceeds the cap. Dropping over-cap buckets (the old rule) silently
    * lost exactly the densest duplicate families: a content-degenerate
    * family (10k near-identical boilerplate docs sharing one band hash)
    * lands in ONE bucket regardless of how many planes/bands the derivation
    * adds, and at 100 TB those viral families are the highest-value dedup
    * targets. Star edges keep every member connected to the bucket minimum
    * in the candidate graph at linear cost — no quadratic pair explosion —
    * and the CC layer already consumes arbitrary edges, so the family still
    * collapses to one cluster. The trade: over-cap buckets contribute
    * star-shaped (not complete) candidate sets, so pair-level consumers see
    * each over-cap member paired with the minimum only.
    */
  private def bucketPairs(ids: Column, aName: String, bName: String): Column =
    bucketPairsWith(ids, (x, y) => struct(x.as(aName), y.as(bName)))

  /** The cap-vs-star branching itself, generalized over the pair payload
    * and the cap — ONE definition of the rule so the minhash/embedding id
    * form, the simhash struct form (which also carries the hamming
    * distance), and the SemDeDup cell form (dot-scored, corpus-derived
    * cap) can never diverge from each other or from the DuckDB oracles'
    * arms.
    */
  private def bucketPairsWith(ms: Column, pairOf: (Column, Column) => Column,
                              cap: Long = MaxBucket.toLong): Column =
    when(size(ms) <= cap,
      flatten(transform(ms, (x, i) =>
        transform(slice(ms, i + lit(2), size(ms)), y => pairOf(x, y)))))
      .otherwise(transform(slice(ms, lit(2), size(ms) - 1),
        y => pairOf(element_at(ms, 1), y)))

  /** Distinct LSH candidate pairs: ONE shuffle groups docs by
    * (band, bandhash); pairs are generated inside each bucket (no self-join,
    * no global pair space) — all pairs within [[MaxBucket]], star pairs
    * against the bucket minimum past it ([[bucketPairs]]) — so the pair
    * count stays near-linear in corpus size with no bucket dropped.
    */
  private[graft] def lshCandidatePairs(sigs: DataFrame): DataFrame = {
    val s = sigs.sparkSession
    import s.implicits._
    sigs.select($"doc_id", posexplode(bandsCol).as(Seq("band", "bandhash")))
      .groupBy($"band", $"bandhash")
      .agg(sort_array(collect_list($"doc_id")).as("ids"))
      .filter(size($"ids") > 1)
      .select(explode(bucketPairs($"ids", "doc_a", "doc_b")).as("p"))
      .select($"p.doc_a", $"p.doc_b")
      .distinct()
  }

  /** Hyperplane count for the sign-bit LSH bucket, derived from corpus
    * size: the smallest count ≥ [[LshPlanes]] whose EXPECTED occupancy
    * n/2^planes sits at or under MaxBucket/8. A fixed plane count is a
    * silent recall cliff at scale — with 8 planes there are only 256
    * buckets, so past ~16k vectors most buckets exceed [[MaxBucket]] and
    * degrade to star pairs, thinning nearly every candidate set. Deriving
    * planes from n keeps the bucket count growing with the corpus instead,
    * reserving the star fallback for genuinely degenerate content.
    *
    * The /8 margin is deliberate: sign-bit orthant masses are NOT uniform
    * (fixed hyperplanes are not orthogonal, so some sign patterns carry
    * several times the average mass — LshScalingSpec measures ~7× on a
    * 50k synthetic corpus), so sizing for expected ≈ cap/2 still drops
    * buckets; expected ≤ cap/8 keeps the heaviest observed bucket inside
    * the cap. At the oracle scale factor (sf0.01, 500 vectors — and any n
    * ≤ 2048) this resolves to exactly [[LshPlanes]] = 8, so oracle-scale
    * results equal the fixed-plane DuckDB oracle.
    */
  private[graft] def lshPlanesFor(n: Long): Int = {
    var planes = LshPlanes
    while (planes < 60 && (n >> planes) > MaxBucket / 8) planes += 1
    planes
  }

  /** SemDeDup cell count for a corpus of `n` vectors: the smallest power
    * of two ≥ 16 whose expected occupancy n/k is at or under
    * [[SemCellTarget]] — the k ∝ n rule the SemDeDup paper applies (50k
    * cells for LAION-440M). A fixed k is a quadratic wall: cell size
    * grows linearly with the corpus and the in-cell pair walk grows with
    * its square (the sf1 scale smoke measured 26× wall for 10× data at
    * fixed k=16). Capped at 65536 — a 64-dim quantized codebook that size
    * is ~32 MB, still comfortably broadcastable; past ~8M vectors a real
    * deployment trains a hierarchical quantizer instead of extending a
    * flat one. The q_dedup_semantic DuckDB oracle replicates this loop in
    * a recursive CTE, so both sides derive the same k at any corpus size.
    */
  private[graft] def semCellsFor(n: Long): Int = {
    var k = 16
    while (k < 65536 && n / k > SemCellTarget) k *= 2
    k
  }

  /** SemDeDup in-cell scored pairs over `assigned(vec_id, cid, q)`: one
    * shuffle on cid, all pairs inside cells within `cellCap`, star pairs
    * against the cell minimum past it, each scored with the exact
    * quantized dot. Factored out of q_dedup_semantic so the cap-vs-star
    * behavior is spec-testable with a tiny injected cap.
    */
  private[graft] def semCellPairs(assigned: DataFrame, cellCap: Long): DataFrame = {
    val s = assigned.sparkSession
    import s.implicits._
    def pairOf(x: Column, y: Column) =
      struct(x.getField("vec_id").as("keep"), y.getField("vec_id").as("dup"),
        qdot(x.getField("q"), y.getField("q")).as("dot"))
    assigned.groupBy($"cid")
      .agg(sort_array(collect_list(struct($"vec_id", $"q"))).as("ms"))
      .filter(size($"ms") > 1)
      .select($"cid", explode(bucketPairsWith($"ms", pairOf, cellCap)).as("p"))
      .select($"cid", $"p.keep", $"p.dup", $"p.dot")
  }

  /** Corpus row count per dataset, computed once per process — the LSH
    * queries need it only to size the plane count, and a real deployment
    * reads corpus statistics from a catalog instead of re-counting the
    * corpus on every query. The memo key folds in the dataset's resolved
    * FILE LIST (already materialized by the DataFrame's file index, no
    * extra RPCs): rewrites and appends change the part-file names, so a
    * long-lived session re-counts when the data changes instead of sizing
    * planes from a stale count — the silent recall cliff again, one step
    * removed. The count itself is a zero-column parquet scan.
    */
  private val corpusCounts = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private[queries] def countOnce(key: String, df: DataFrame): Long = {
    val versioned = s"$key#${java.util.Arrays.hashCode(df.inputFiles.sorted.asInstanceOf[Array[AnyRef]])}"
    val cached = corpusCounts.get(versioned)
    if (cached != null) return cached.longValue()
    // count OUTSIDE the map lock: computeIfAbsent would hold the bin lock
    // for the duration of a Spark job, serializing unrelated first-run
    // queries whose keys hash-collide. Concurrent losers just re-count —
    // the result is identical, putIfAbsent keeps one.
    val n = java.lang.Long.valueOf(df.count())
    // evict superseded versions of this dataset (rewrites change the file
    // list, so long-lived sessions would otherwise grow one entry per
    // data version forever)
    corpusCounts.keySet.removeIf(k => k.startsWith(s"$key#") && k != versioned)
    val prev = corpusCounts.putIfAbsent(versioned, n)
    (if (prev != null) prev else n).longValue()
  }

  /** Pre-populates the corpus-count memo for the datasets whose DataFrame
    * CONSTRUCTION triggers a count job (the LSH plane sizing). The bench
    * calls this once before the timed region so sample 0 measures the
    * query, not the one-time catalog-statistics stand-ins.
    */
  private[graft] def warmCorpusCounts(s: SparkSession, d: String): Unit = {
    countOnce(s"$d/embeddings", Tables.embeddings(s, d))
    // the binned interval join sizes its contig count from this
    countOnce(s"$d/lineitem", Tables.lineitem(s, d))
    // the Bloom filter sizes from the holdout fingerprint count
    countOnce(s"$d/documents#holdout_fps", splitFingerprints(s, d)._2)
  }

  /** Queries that consume the trained-codebook artifact — the bench warms
    * [[trainedCentroids]] only when one of these is in the selected set,
    * so a targeted subset run never pays the 3-round Lloyd training job.
    */
  private[graft] val codebookConsumers: Set[String] = Set("q_ann_ivf", "q_ann_ivfpq")

  /** Warm the offline-training stand-in (3 Lloyd rounds, memoized). */
  private[graft] def warmTrainedCodebook(s: SparkSession, d: String): Unit =
    trainedCentroids(s, d)

  /** One Lloyd round over quantized vectors `e(vec_id, q)` given the
    * current codebook `cb(cid, cq)`: centroids collapse to ONE broadcast
    * row, assignment is the same narrow codegen'd graft_ivf_argmax pass
    * the IVF query uses (the corpus never shuffles, never widens to k rows
    * per vector), and the update aggregates 64 per-dimension partial sums
    * map-side — the only shuffle payload is (#centroids × 64 longs). Means
    * floor-quantize back to integers, so the trajectory is engine-portable
    * bit-for-bit; empty clusters drop identically on both sides.
    */
  private def lloydStep(e: DataFrame, cb: DataFrame): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    val dims = 64
    val codebook = cb.agg(sort_array(collect_list(struct($"cid", $"cq"))).as("cents"))
    val assigned = e.crossJoin(broadcast(codebook))
      .select(expr("graft_ivf_argmax(q, cents)").as("cid"), $"q")
    val aggs = count(lit(1)).as("n") +:
      (0 until dims).map(i => sum(element_at($"q", i + 1)).as(s"s$i"))
    assigned.groupBy($"cid")
      .agg(aggs.head, aggs.tail: _*)
      .select($"cid", array((0 until dims).map(i =>
        floor(col(s"s$i").cast("double") / $"n").cast("long")): _*).as("cq"))
  }

  /** 3 unrolled Lloyd rounds from the deterministic 16-vector seed — the
    * training chain q_kmeans_train exposes and [[trainedCentroids]] caches.
    */
  private[graft] def lloydChain(e: DataFrame): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    val init = e.filter($"vec_id" < 16).select($"vec_id".as("cid"), $"q".as("cq"))
    lloydStep(e, lloydStep(e, lloydStep(e, init)))
  }

  /** The trained coarse codebook per dataset, computed once per process —
    * a real IVF deployment trains the codebook OFFLINE and ships it as an
    * artifact; queries broadcast it, they don't re-run Lloyd. Same memo
    * discipline as [[countOnce]]: keyed by the dataset's resolved file
    * list so appends/rewrites retrain instead of serving a stale codebook,
    * training runs outside any map lock, concurrent losers retrain to the
    * identical (deterministic) result. The collected artifact is ≤16 ×
    * 64 longs — O(codebook) driver memory, the same class as a catalog
    * read — and is re-expressed as a LocalRelation so consumers broadcast
    * it without re-running the training jobs.
    */
  private val trainedCodebooks =
    new java.util.concurrent.ConcurrentHashMap[String, Array[(Long, Seq[Long])]]()
  private[graft] def trainedCentroids(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.functions.NativeIvf.register(s)
    val e = Tables.embeddings(s, d).select($"vec_id", quantized($"embedding").as("q"))
    val key = s"$d/embeddings#codebook"
    // version = full sorted (path, length, mtime) fingerprint, NOT a 32-bit
    // name hash: an in-place rewrite reproducing identical part names (a
    // custom committer, or a birthday-cheap hash collision across many
    // datasets) must retrain, never serve a stale codebook
    val versioned = {
      val conf = s.sessionState.newHadoopConf()
      val fp = e.inputFiles.sorted.map { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        val st = p.getFileSystem(conf).getFileStatus(p)
        s"$f:${st.getLen}:${st.getModificationTime}"
      }.mkString("|")
      s"$key#$fp"
    }
    val cached = trainedCodebooks.get(versioned)
    val rows =
      if (cached != null) cached
      else {
        val trained = lloydChain(e).orderBy($"cid").collect()
          .map(r => (r.getLong(0), r.getSeq[Long](1)))
        trainedCodebooks.keySet.removeIf(k => k.startsWith(s"$key#") && k != versioned)
        val prev = trainedCodebooks.putIfAbsent(versioned, trained)
        if (prev != null) prev else trained
      }
    rows.toSeq.toDF("cid", "cq")
  }

  /** IVF top-k search given a codebook: assignment is one narrow broadcast
    * argmax over the corpus, each query probes its [[probes]] nearest
    * cells, and only vectors in probed cells are scored. Shared by
    * q_ann_ivf and the recall spec so the measured pipeline IS the query.
    */
  private[graft] def ivfSearch(e: DataFrame, cents: DataFrame, qs: DataFrame,
                               probes: Int = 2, k: Int = 10): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    graft.functions.NativeIvf.register(s)
    val codebook = cents.agg(sort_array(collect_list(struct($"cid", $"cq"))).as("cents"))
    val assigned = e.crossJoin(broadcast(codebook))
      .select($"vec_id", expr("graft_ivf_argmax(q, cents)").as("cid"), $"q")
    val pw = Window.partitionBy($"query_id").orderBy($"pdot".desc, $"cid")
    val probed = qs.join(broadcast(cents))
      .select($"query_id", $"qq", $"cid", qdot($"qq", $"cq").as("pdot"))
      .withColumn("prn", row_number().over(pw))
      .filter($"prn" <= probes)
      .select($"query_id", $"qq", $"cid")
    val scored = assigned.join(broadcast(probed),
        assigned("cid") === probed("cid") && $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id", qdot($"q", $"qq").as("dot"))
    val w = Window.partitionBy($"query_id").orderBy($"dot".desc, $"vec_id")
    scored.withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= k)
      .select($"query_id", $"rnk", $"vec_id", $"dot")
  }

  /** Per-plane signed dot products of `q` with the deterministic
    * hyperplanes (plane p component i = hash60("p|i") mod 2001 − 1000,
    * portable integer arithmetic) — the native expression computes the
    * weights once per JVM and runs inside whole-stage codegen; the
    * composed HOF form (which recomputed 64 md5s per plane PER ROW,
    * interpreted) survives only as the equality-pinned spec in
    * NativeExprSpec. Callers must have registered [[graft.functions.NativeLsh]]
    * on the session.
    */
  private def lshPlaneDots(planes: Int): Column = expr(s"graft_lsh_dots(q, $planes)")

  /** Bit value of each plane, aligned with [[lshPlaneDots]]' order. */
  private def planePowers(planes: Int): Column =
    array((0 until planes).map(p => lit(1L << p)): _*)

  /** Sign-bit ANN bucket over a quantized embedding column `q`: bit p set
    * iff the plane-p dot is positive (native; see [[lshPlaneDots]]).
    */
  private[graft] def lshBucket(planes: Int = LshPlanes): Column =
    expr(s"graft_lsh_bucket(q, $planes)")

  /** MaxBucket, exposed for the scaling spec. */
  private[graft] def maxBucket: Int = MaxBucket

  /** Extra buckets probed per ANN query in the multi-probe variant. */
  private val MultiProbes = 2

  /** The multi-probe bucket set over columns `bucket` and `dots`: the own
    * bucket plus the buckets reached by flipping the `probes`
    * lowest-|margin| planes. Shared by q_ann_multiprobe and the scaling
    * spec's recall measurement.
    */
  private[graft] def probeBucketsCol(planes: Int, probes: Int = MultiProbes): Column = {
    val flips = slice(array_sort(
      zip_with(col("dots"), planePowers(planes),
        (dd, pw) => struct(abs(dd).as("a"), pw.as("pw")))),
      1, probes)
    concat(array(col("bucket")),
      transform(flips, f => col("bucket").bitwiseXOR(f.getField("pw"))))
  }

  /** lshPlaneDots, exposed for the scaling spec. */
  private[graft] def planeDots(planes: Int): Column = lshPlaneDots(planes)

  /** Symmetric LSH candidate-pair edge list over the documents table (the
    * input to cluster resolution). localCheckpoint (eager) materializes the
    * edges so the per-round scans of the propagation loop replay stored
    * blocks, and lets the intermediate signature cache be released
    * immediately — a plain persist here would pin both the signature table
    * and the edge list in executor storage for the session's lifetime
    * (checkpoint blocks are freed by the ContextCleaner once unreferenced).
    */
  private def candidateEdges(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sigs = signedDocs(Tables.documents(s, d)).select($"doc_id", $"sig").persist()
    try {
      // raw pair list — resolveClusters symmetrizes internally, so
      // doubling (and checkpointing 2×) the edges here would only add a
      // wasted distinct shuffle
      lshCandidatePairs(sigs)
        .select($"doc_a".as("src"), $"doc_b".as("dst"))
        .localCheckpoint()
    } finally sigs.unpersist()
  }

  /** SimHash near-dup candidate pairs (doc_a, doc_b, hamming), hamming ≤ 3:
    * band the 60-bit fingerprint into 4 × 15-bit keys (pigeonhole — a pair
    * within hamming distance 3 shares at least one intact band), bucket by
    * (band, key) in ONE shuffle, pair within buckets (all pairs inside
    * [[MaxBucket]], star pairs against the bucket minimum past it — same
    * recall rule as [[bucketPairs]]), re-check exact hamming. Shared by
    * q_dedup_simhash_pairs and the ensemble query.
    */
  private def simhashNearDupPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.functions.SimhashExpr.register(s)
    val sims = Tables.documents(s, d)
      .select($"doc_id", expr("graft_simhash(text)").as("sh"))
    val banded = sims.select($"doc_id", $"sh",
      posexplode(array((0 until SimhashBands).map(b =>
        shiftright($"sh", b * 15).bitwiseAND(lit(0x7fffL))): _*)).as(Seq("band", "key")))
    def pairOf(x: Column, y: Column) =
      struct(x.getField("doc_id").as("doc_a"), y.getField("doc_id").as("doc_b"),
        bit_count(x.getField("sh").bitwiseXOR(y.getField("sh"))).cast("long")
          .as("hamming"))
    banded.groupBy($"band", $"key")
      .agg(sort_array(collect_list(struct($"doc_id", $"sh"))).as("ms"))
      .filter(size($"ms") > 1)
      .select(explode(bucketPairsWith($"ms", pairOf)).as("p"))
      .select($"p.doc_a", $"p.doc_b", $"p.hamming")
      .filter($"hamming" <= 3)
      .distinct()
  }

  /** Embedding-cosine near-dup pairs (vec_a, vec_b, qdot), qdot ≥
    * [[QdotThreshold]]: same-sign-bucket candidates (planes derived from
    * corpus size — 8 at oracle scale, see [[lshPlanesFor]]), exact
    * quantized dot scored on candidates only, buckets capped like
    * [[lshCandidatePairs]]. Shared by q_dedup_embedding and the ensemble.
    */
  private def embeddingNearDupPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.functions.NativeLsh.register(s)
    val base = Tables.embeddings(s, d)
    val planes = lshPlanesFor(countOnce(s"$d/embeddings", base))
    val e = base
      .select($"vec_id", quantized($"embedding").as("q"))
      .withColumn("bucket", lshBucket(planes))
      .persist() // quantize+bucket once: feeds pair generation and scoring
    try {
      val pairs = e.groupBy($"bucket")
        .agg(sort_array(collect_list($"vec_id")).as("ids"))
        .filter(size($"ids") > 1)
        .select(explode(bucketPairs($"ids", "vec_a", "vec_b")).as("p"))
        .select($"p.vec_a", $"p.vec_b")
      pairs
        .join(e.select($"vec_id".as("vec_a"), $"q".as("qa")), "vec_a")
        .join(e.select($"vec_id".as("vec_b"), $"q".as("qb")), "vec_b")
        .select($"vec_a", $"vec_b", qdot($"qa", $"qb").as("qdot"))
        .filter($"qdot" >= QdotThreshold)
        // eager: materializes the (tiny) scored pairs so the quantized
        // corpus cache can be released now rather than leaking for the
        // session's lifetime (checkpoint blocks are freed by the
        // ContextCleaner once the result is unreferenced)
        .localCheckpoint()
    } finally e.unpersist()
  }

  /** Train/holdout fingerprint tables for the decontamination pair — ONE
    * definition of the split rule and the fingerprint explode, so
    * q_decontaminate and q_decontam_bloom (documented to produce the
    * identical exact result) can never desynchronize. Returns
    * (train(train_doc, fp), holdout(holdout_doc, fp)) over a persisted
    * common fingerprint table (fingerprint once, not per branch).
    */
  private def splitFingerprints(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    import s.implicits._
    graft.functions.FingerprintsExpr.register(s)
    // localCheckpoint, not persist: both join sides replay the stored
    // blocks (fingerprint once), and the ContextCleaner frees them once
    // the query's result is unreferenced — a plain persist here was a
    // session-lifetime cache of the whole fingerprint table
    val docs = Tables.documents(s, d)
      .withColumn("bucket", hash60(concat(lit("split|"), $"doc_id".cast("string"))) % 1000)
      .withColumn("split", when($"bucket" < 900, "train").otherwise("holdout"))
      .select($"doc_id", $"split", explode(expr("graft_fingerprints(text)")).as("fp"))
      .localCheckpoint()
    (docs.filter($"split" === "train").select($"doc_id".as("train_doc"), $"fp"),
      docs.filter($"split" =!= "train").select($"doc_id".as("holdout_doc"), $"fp"))
  }

  /** Connected components over a symmetric edge list by alternating
    * large-star / small-star contraction (Kiveris et al.): returns
    * (id, lbl) with lbl = the component's minimum id. Each round REWRITES
    * the edge set toward a fixpoint union of stars centered at component
    * minima — see the inline walkthrough below for why star-rewriting (not
    * label propagation over a fixed edge list) bounds the round count at
    * O(log² n). localCheckpoint truncates lineage each round — the rewrite
    * self-joins reference the previous edge table on multiple paths, so
    * without truncation the logical plan (and analyzer time) grows
    * exponentially with iterations, the classic iterative-DataFrame trap.
    * The checkpointed state is the edge table (candidate-graph-sized, tiny
    * relative to the corpus), so executor-local storage is cheap.
    */
  private[graft] def resolveClusters(edges: DataFrame,
                                     forceContraction: Boolean = false): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    // Alternating large-star / small-star connected components (Kiveris
    // et al., "Connected Components in MapReduce and Beyond"): each round
    // REWRITES the edge set — large-star hooks every larger neighbor of u
    // onto min(Γ(u) ∪ {u}), small-star hooks u and its smaller neighbors
    // onto their min — until the graph is a fixpoint union of stars
    // centered at component minima. Star-rewriting (not label propagation
    // over a fixed edge list) is what bounds the round count: a chain of
    // near-duplicates halves every round via the grandparent hooks
    // (provably O(log² n), ~5-7 rounds on real candidate graphs), where
    // fixed-edge min-propagation — even with pointer jumping — walks a
    // new minimum along the chain one hop per round (measured as a
    // ~10-round tail each fixing <10 labels on the ensemble union graph).
    // Per round every shuffle carries only the current (src, dst) edge
    // set; the edge count never grows (each directed pair emits at most
    // one hook), so the 100 TB payload is edge-linear with a shrinking
    // constant. At the star fixpoint the labels are read directly:
    // lbl(v) = min(v, min Γ(v)).
    def sym(e: DataFrame): DataFrame =
      e.union(e.select($"dst".as("src"), $"src".as("dst")))
        .filter($"src" =!= $"dst").distinct()
    var e = sym(edges).localCheckpoint()
    var eCount = e.count() // carried across rounds: e's count IS last round's eS.count()
    // ADAPTIVE fast path: when the symmetric candidate graph fits easily
    // in one task, a single-partition union-find over the already-
    // materialized snapshot replaces the O(log² n) contraction rounds —
    // each round costs two shuffles plus a checkpoint, so a toy-sized
    // graph with a long chain (the fuzzy-linkage shape) pays ~10 s of
    // pure round overhead the one task finishes in milliseconds. Labels
    // are identical (component minimum per node); the distributed path
    // is untouched and still carries any graph above the threshold, so
    // the 100 TB story is unchanged — this is the same small-side
    // adaptivity a broadcast join applies to shuffles.
    if (!forceContraction && eCount <= SmallGraphSymEdges) return unionFindLocal(e)
    var iters = 0
    var done = eCount == 0
    while (!done && iters < 48) {
      // large-star: (v, m) for every neighbor v > u, m = min(Γ(u) ∪ {u})
      val mL = e.groupBy($"src").agg(min($"dst").as("mn"))
        .select($"src".as("u"), least($"mn", $"u").as("m"))
      val large = e.join(mL, $"src" === $"u")
        .filter($"dst" > $"src")
        .select($"dst".as("src"), $"m".as("dst"))
      // localCheckpoint, not a releasable persist: small-star's two
      // consumer stages (the min aggregate and the hook join) can be
      // scheduled concurrently, and a LAZY cache lets both race to compute
      // eL — including its distinct shuffle — before either fills it
      // (measured: the persist variant nearly doubled q_dedup_ensemble).
      // The eager checkpoint materializes eL exactly once; dead snapshots
      // are reclaimed by the context cleaner when the round's references
      // drop, the same convention as every other checkpoint here.
      val eL = sym(large).localCheckpoint()
      // small-star: u and all smaller neighbors hook onto their min
      val smaller = eL.filter($"dst" < $"src")
      val mS = smaller.groupBy($"src").agg(min($"dst").as("m"))
      val small = smaller.join(mS.select($"src".as("u"), $"m"), $"src" === $"u")
        .select($"dst".as("src"), $"m".as("dst"))
        .union(mS.select($"src", $"m".as("dst")))
      val eS = sym(small).localCheckpoint() // eager — consumes eL now
      // fixpoint: the symmetric edge set is unchanged (eS ⊆ e ∧ |eS| = |e|);
      // e's count is carried from last round — one fewer job per round
      val eSCount = eS.count()
      done = eSCount == eCount &&
        eS.join(e, Seq("src", "dst"), "left_anti").isEmpty
      e = eS
      eCount = eSCount
      iters += 1
      if (sys.env.contains("SPARK_GRAFT_PROF"))
        println(s"[eprof] resolve iter $iters edges=$eCount")
    }
    require(done, s"star contraction did not converge in $iters rounds")
    e.groupBy($"src").agg(min($"dst").as("mn"))
      .select($"src".as("id"), least($"src", $"mn").as("lbl"))
  }

  /** Edge count (symmetric) below which [[resolveClusters]] runs as one
    * union-find task instead of contraction rounds. The task's memory is
    * NODE-bounded (the parent map), not edge-bounded — edges stream
    * through in one pass — so 8M symmetric edges (~4M pairs) is a
    * seconds-long single task with a few-hundred-MB worst case, while the
    * contraction path's per-round fixed cost (two shuffles + checkpoint ×
    * O(log² n) rounds) dwarfs that well past this size. Graphs above the
    * threshold — the genuine 100 TB candidate graphs — take the
    * distributed rounds unchanged.
    */
  private val SmallGraphSymEdges = 8000000L

  /** Single-task union-find over a (src, dst) edge DataFrame — the
    * [[resolveClusters]] fast path. Key type is whatever the caller's id
    * column holds (long doc ids, string names); labels are the component
    * minimum under the column type's natural order, matching the
    * contraction path bit-for-bit.
    */
  private def unionFindLocal(edges: DataFrame): DataFrame = {
    val s = edges.sparkSession
    val idType = edges.schema("src").dataType
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", idType),
      org.apache.spark.sql.types.StructField("lbl", idType)))
    def lt(a: Any, b: Any): Boolean = (a, b) match {
      case (x: java.lang.Long, y: java.lang.Long) => x < y
      case (x: java.lang.Integer, y: java.lang.Integer) => x < y
      case (x: String, y: String) => x < y
      case _ => throw new IllegalStateException(
        s"unorderable cluster id type: ${a.getClass}")
    }
    val rows = edges.rdd.coalesce(1).mapPartitions { it =>
      val parent = new java.util.HashMap[Any, Any]()
      def find(x0: Any): Any = {
        var r = x0
        while (parent.get(r) != r) r = parent.get(r)
        var x = x0 // path compression
        while (parent.get(x) != r) { val nx = parent.get(x); parent.put(x, r); x = nx }
        r
      }
      it.foreach { row =>
        val a = row.get(0); val b = row.get(1)
        if (a != b) {
          if (!parent.containsKey(a)) parent.put(a, a)
          if (!parent.containsKey(b)) parent.put(b, b)
          val ra = find(a); val rb = find(b)
          if (ra != rb) parent.put(ra, rb)
        }
      }
      // component minimum per root, then one labeled row per node
      val minOf = new java.util.HashMap[Any, Any]()
      parent.keySet().forEach { n =>
        val r = find(n)
        val m = minOf.get(r)
        if (m == null || lt(n, m)) minOf.put(r, n)
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
      parent.keySet().forEach { n =>
        out += org.apache.spark.sql.Row(n, minOf.get(find(n)))
      }
      out.iterator
    }
    s.createDataFrame(rows, outSchema)
  }

  // ---- BPE tokenizer training -------------------------------------------

  /** Merge rounds for q_bpe_train — vocab target at oracle scale. */
  private[graft] val BpeMerges = 32

  /** Corpus → (symbols, freq) vocabulary: the ONE corpus-sized shuffle of
    * BPE training. Words start as character sequences.
    */
  private[graft] def bpeInitVocab(s: SparkSession, d: String)
  : org.apache.spark.sql.Dataset[(Array[String], Long)] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(explode(split($"text", " ")).as("word"))
      .filter(length($"word") >= 2 && $"word".rlike("^[a-z]+$"))
      .groupBy($"word").agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
      .map { case (w, f) => (w.toCharArray.map(_.toString), f) }
  }

  /** One training round's pair census + argmax over a (syms, freq) frame:
    * adjacent pairs form in a narrow zip_with (no self-join), the shuffle
    * carries PAIR keys only, and the argmax is orderBy().limit(1) =
    * TakeOrderedAndProject (ties broken n desc, lhs, rhs — same order the
    * oracle replays).
    */
  private[graft] def bpePairArgmax(vocab: DataFrame): DataFrame = {
    import vocab.sparkSession.implicits._
    vocab
      .select(explode(zip_with(
        slice($"syms", lit(1), greatest(size($"syms") - 1, lit(0))),
        slice($"syms", lit(2), greatest(size($"syms") - 1, lit(0))),
        (a, b) => struct(a.as("lhs"), b.as("rhs")))).as("p"), $"freq")
      .groupBy($"p.lhs".as("lhs"), $"p.rhs".as("rhs"))
      .agg(sum($"freq").as("n"))
      .orderBy($"n".desc, $"lhs", $"rhs")
      .limit(1)
  }

  /** Canonical greedy left-to-right merge application (Sennrich BPE): scan
    * the symbol sequence once; each (lhs, rhs) occurrence merges and the
    * scan resumes AFTER the merged symbol, so overlapping occurrences
    * ("aaa" under (a,a)) merge non-overlapping from the left.
    */
  private[graft] def bpeApplyMerge(syms: Array[String], lhs: String, rhs: String)
  : Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == lhs && syms(i + 1) == rhs) {
        out += lhs + rhs; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Fixed merge table for the ENCODE pass (q_bpe_encode) — a trained
    * tokenizer's vocabulary, applied in rank order. Deliberately includes
    * CHAINED merges (ers, the, and, ing need earlier ranks to fire first)
    * so the encode provably iterates on merged symbols.
    */
  private[graft] val BpeEncodeMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("i", "n"), ("o", "n"), ("s", "t"), ("a", "n"), ("t", "h"),
    ("er", "s"), ("in", "g"), ("th", "e"), ("an", "d"), ("o", "r"), ("e", "n"),
    ("a", "r"), ("o", "u"), ("l", "l"), ("e", "s"))

  /** DuckDB replay of the encode pass: the fixed merge table inlined as
    * literal fold CTEs (no argmax — the vocabulary is given), then the
    * per-word-length compression rollup.
    */
  private[graft] def bpeEncodeOracle: String = {
    val head =
      """WITH v0 AS MATERIALIZED (SELECT word, COUNT(*) AS freq FROM (
        |    SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
        |  WHERE len(word) >= 2 AND regexp_matches(word, '^[a-z]+$') GROUP BY word),
        |s0 AS MATERIALIZED (SELECT freq, len(word) AS wl, list_transform(range(1, len(word) + 1),
        |    i -> substr(word, CAST(i AS INTEGER), 1)) AS syms FROM v0)""".stripMargin
    val folds = BpeEncodeMerges.zipWithIndex.map { case ((l, r), i) =>
      s"""s${i + 1} AS MATERIALIZED (SELECT freq, wl, string_split(substr(list_reduce(list_concat([''], syms),
         |    (acc, x) -> CASE WHEN x = '$r' AND ends_with(acc, ',' || '$l')
         |                THEN acc || x ELSE acc || ',' || x END), 2), ',') AS syms
         |  FROM s$i)""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$folds
       |SELECT CAST(wl AS BIGINT) AS word_len, COUNT(*) AS n_words,
       |  CAST(SUM(freq) AS BIGINT) AS n_occurrences,
       |  CAST(SUM(wl * freq) AS BIGINT) AS chars_total,
       |  CAST(SUM(len(syms) * freq) AS BIGINT) AS tokens_total,
       |  CAST(SUM(len(syms) * freq) * 1000 // SUM(wl * freq) AS BIGINT) AS compression_permille
       |FROM s${BpeEncodeMerges.length} GROUP BY wl ORDER BY word_len""".stripMargin
  }

  /** DuckDB replay of the fertility audit: the langid CASE (same stop
    * lists as q_text_langid), the (language, word) vocabulary rollup, the
    * fixed merge table as fold CTEs, and the per-language rollup.
    */
  private[graft] def tokenizerFertilityOracle: String = {
    val head =
      s"""WITH lang AS MATERIALIZED (SELECT text,
         |    len(list_filter($wsExpr, w -> list_contains(${stopList(StopEn)}, w))) AS en_hits,
         |    len(list_filter($wsExpr, w -> list_contains(${stopList(StopDe)}, w))) AS de_hits,
         |    len(list_filter($wsExpr, w -> list_contains(${stopList(StopFr)}, w))) AS fr_hits,
         |    len(list_filter($wsExpr, w -> list_contains(${stopList(StopEs)}, w))) AS es_hits
         |  FROM documents),
         |ld AS (SELECT text,
         |    CASE WHEN en_hits >= greatest(de_hits, fr_hits, es_hits) THEN 'en'
         |         WHEN de_hits >= greatest(fr_hits, es_hits) THEN 'de'
         |         WHEN fr_hits >= es_hits THEN 'fr' ELSE 'es' END AS pred_lang
         |  FROM lang),
         |w AS MATERIALIZED (SELECT pred_lang, word, COUNT(*) AS freq FROM (
         |    SELECT pred_lang, unnest(string_split(text, ' ')) AS word FROM ld) t
         |  WHERE len(word) >= 2 AND regexp_matches(word, '^[a-z]+$$') GROUP BY 1, 2),
         |f0 AS MATERIALIZED (SELECT pred_lang, freq, len(word) AS wl,
         |  list_transform(range(1, len(word) + 1),
         |    i -> substr(word, CAST(i AS INTEGER), 1)) AS syms FROM w)""".stripMargin
    val folds = BpeEncodeMerges.zipWithIndex.map { case ((l, r), i) =>
      s"""f${i + 1} AS MATERIALIZED (SELECT pred_lang, freq, wl, string_split(substr(list_reduce(list_concat([''], syms),
         |    (acc, x) -> CASE WHEN x = '$r' AND ends_with(acc, ',' || '$l')
         |                THEN acc || x ELSE acc || ',' || x END), 2), ',') AS syms
         |  FROM f$i)""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$folds
       |SELECT pred_lang, CAST(SUM(freq) AS BIGINT) AS n_words,
       |  COUNT(*) AS n_distinct_words,
       |  CAST(SUM(wl * freq) AS BIGINT) AS chars_total,
       |  CAST(SUM(len(syms) * freq) AS BIGINT) AS tokens_total,
       |  CAST(SUM(len(syms) * freq) * 1000 // SUM(freq) AS BIGINT) AS fertility_milli
       |FROM f${BpeEncodeMerges.length} GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** DuckDB replay of the full training loop, generated per round (the
    * oracle-SQL-built-programmatically convention). Each round r:
    * p{r} = pair census over s{r-1} (UNNEST over adjacent indices),
    * b{r} = argmax (ORDER BY n DESC, lhs, rhs LIMIT 1), and
    * s{r} = the merge applied via a list_reduce fold over ''-seeded
    * comma-joined symbols — append ','||x, or extend the tail symbol when
    * it equals lhs and x equals rhs. The fold is equivalent to the greedy
    * scan: a just-merged tail symbol is lhs+rhs, which can never re-match
    * lhs (rhs is non-empty), so each incoming symbol merges at most once,
    * left to right — BpeTrainSpec pins the equivalence exhaustively.
    * Symbols are ^[a-z]+$ so ',' never collides. CTEs are MATERIALIZED:
    * s{r-1} is referenced twice per round and would otherwise inline
    * exponentially across 32 rounds.
    */
  private[graft] def bpeTrainOracle(n: Int): String = {
    val head =
      """WITH v0 AS MATERIALIZED (SELECT word, COUNT(*) AS freq FROM (
        |    SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
        |  WHERE len(word) >= 2 AND regexp_matches(word, '^[a-z]+$') GROUP BY word),
        |s0 AS MATERIALIZED (SELECT freq, list_transform(range(1, len(word) + 1),
        |    i -> substr(word, CAST(i AS INTEGER), 1)) AS syms FROM v0)""".stripMargin
    val rounds = (1 to n).map { r =>
      val census =
        s"""p$r AS (SELECT syms[i] AS lhs, syms[i+1] AS rhs, CAST(SUM(freq) AS BIGINT) AS n
           |  FROM s${r - 1}, UNNEST(range(1, len(syms))) AS u(i) GROUP BY 1, 2),
           |b$r AS MATERIALIZED (SELECT lhs, rhs, n FROM p$r ORDER BY n DESC, lhs, rhs LIMIT 1)""".stripMargin
      val apply =
        if (r == n) ""
        else
          s""",
             |s$r AS MATERIALIZED (SELECT freq, string_split(substr(list_reduce(list_concat([''], s.syms),
             |    (acc, x) -> CASE WHEN x = b.rhs AND ends_with(acc, ',' || b.lhs)
             |                THEN acc || x ELSE acc || ',' || x END), 2), ',') AS syms
             |  FROM s${r - 1} s CROSS JOIN b$r b)""".stripMargin
      census + apply
    }.mkString(",\n")
    val sel = (1 to n).map(r =>
      s"SELECT CAST($r AS BIGINT) AS rank, lhs, rhs, lhs || rhs AS merged, n FROM b$r")
      .mkString("\nUNION ALL ")
    s"$head,\n$rounds\n$sel\nORDER BY rank"
  }

  // ---- queries ----------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // == text analysis ===================================================

    // token counting: whitespace tokens + BPE-ish regex token count
    "q_text_tokens" -> { (s, d) =>
      import s.implicits._
      Tables.documents(s, d).select(
        $"doc_id",
        size(words($"text")).as("n_ws_tokens"),
        size(regexp_extract_all($"text", lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0)))
          .as("n_bpe_tokens"),
        length($"text").as("len_chars"))
        .orderBy($"doc_id")
    },

    // vocabulary induction: corpus-wide token-bigram heavy hitters (the
    // counting pass of a BPE/wordpiece merge round). Bigrams form in ONE
    // narrow codegen'd pass (zip_with over two slices of the token array —
    // no self-join, no positional shuffle); the count is a single groupBy
    // with map-side partial agg, and top-k is TakeOrdered (per-partition
    // heaps, k rows to the driver) — at 100 TB the only full-data exchange
    // is the bigram rollup itself, which is irreducible for exact counts.
    "q_vocab_bigrams" -> { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .withColumn("ws", words($"text"))
        .select(explode(zip_with(
          slice($"ws", lit(1), greatest(size($"ws") - 1, lit(0))),
          slice($"ws", lit(2), greatest(size($"ws") - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b))).as("bigram"))
        .groupBy($"bigram")
        .agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"bigram")
        .limit(100)
    },

    // one BPE merge round — the counting pass tokenizer training runs
    // thousands of times: corpus → vocabulary rollup FIRST (the only
    // corpus-sized shuffle, identical to q_vocab_bigrams' cost), then the
    // adjacent-symbol-pair census explodes over the VOCAB (corpus-
    // independent size) weighted by word frequency, and the winning pair
    // is the merge. The final rank window runs over the bounded pair
    // space (≤ alphabet², a few hundred rows), so its single-partition
    // sort is constant-size at any corpus scale.
    "q_bpe_merge" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val vocab = Tables.documents(s, d)
        .select(explode(split($"text", " ")).as("word"))
        .filter(length($"word") >= 2 && $"word".rlike("^[a-z]+$"))
        .groupBy($"word").agg(count(lit(1)).as("freq"))
      val pairs = vocab
        .select($"word", $"freq",
          explode(expr("sequence(1, length(word) - 1)")).as("i"))
        .select(expr("substring(word, i, 2)").as("pair"), $"freq")
        .groupBy($"pair").agg(sum($"freq").as("n"))
      // unpartitioned by design: input is the adjacent-pair census —
      // ≤ alphabet² rows, corpus-size-independent (PlanHygieneSpec
      // allowlist: q_bpe_merge)
      val w = Window.orderBy($"n".desc, $"pair")
      pairs.withColumn("rank", row_number().over(w).cast("long"))
        .filter($"rank" <= 20)
        .orderBy($"rank")
        .select($"rank", $"pair", $"n")
    },

    // FULL BPE tokenizer training — the canonical LLM-pipeline operator:
    // N merge rounds to a vocab target, not just one census. The corpus
    // collapses to the (word, freq) vocabulary ONCE (the only corpus-sized
    // shuffle in the whole loop); each round is then ONE aggregate whose
    // shuffle keys are adjacent SYMBOL PAIRS (bounded by live-symbol², not
    // corpus size), an orderBy().limit(1) = TakeOrderedAndProject argmax
    // (per-partition top-1, single row to the driver — the same O(codebook)
    // collect discipline as the k-means trainer), and a narrow map that
    // applies the broadcast-captured winning merge greedily left-to-right.
    // At 100 TB the vocabulary is still distributed (10^8 distinct words)
    // and per-round cost is vocab-linear. Each round localCheckpoints the
    // symbol table: lineage would otherwise chain 32 map stages deep (the
    // round-32 plan carries every earlier round — plan construction alone
    // OOMs), whereas a checkpoint keeps every round's plan constant-size;
    // a production cluster run would use reliable checkpoint() for
    // executor-loss tolerance. The DuckDB oracle replays the IDENTICAL
    // loop, generated programmatically ([[bpeTrainOracle]]): per round a
    // pair census + argmax + a list_reduce fold whose merge-or-append step
    // is provably equivalent to the greedy scan (see BpeTrainSpec).
    "q_bpe_train" -> { (s, d) =>
      import s.implicits._
      var vocab = bpeInitVocab(s, d).localCheckpoint()
      var lastCp = vocab // most recent checkpoint, unpersisted when superseded
      val merges = scala.collection.mutable.ArrayBuffer[(Long, String, String, String, Long)]()
      var round = 1
      var exhausted = false
      while (round <= BpeMerges && !exhausted) {
        // O(1) driver rows: the single argmax merge of this round
        val top = bpePairArgmax(vocab.toDF("syms", "freq")).collect()
        if (top.isEmpty) exhausted = true
        else {
          val (bl, br, bn) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          merges += ((round.toLong, bl, br, bl + br, bn))
          // the final round only needs its argmax recorded — applying the
          // winning merge and checkpointing the result would be one full
          // materialization pass over the distributed vocab that nothing
          // ever reads
          if (round < BpeMerges) {
            val mapped = vocab.map { case (syms, f) => (bpeApplyMerge(syms, bl, br), f) }
            // checkpoint every 8th round, not every round: lineage stays
            // shallow (<= 8 narrow maps above the last checkpoint — the
            // depth that matters for plan size), each argmax recomputes at
            // most 7 trivially cheap vocab-sized maps from cache, and 7/8
            // of the per-round materialization jobs disappear
            if (round % 8 == 0) {
              val prev = lastCp
              vocab = mapped.localCheckpoint()
              lastCp = vocab
              prev.unpersist()
            } else vocab = mapped
          }
          round += 1
        }
      }
      lastCp.unpersist()
      merges.toSeq.toDF("rank", "lhs", "rhs", "merged", "n").orderBy($"rank")
    },

    // BPE ENCODE — the every-document half of the tokenizer (training is
    // rare; encode runs on all 100 TB): a FIXED trained merge table (16
    // ranks, broadcast in the closure) applied in rank order to each
    // vocabulary word, then a per-word-length compression rollup. One
    // corpus→vocab shuffle + one word-length-bounded rollup; the merge
    // application is a narrow map that never shuffles. Chained ranks
    // (ers/the/and/ing) only fire because earlier merges created their
    // left halves — pinning that encode iterates on merged symbols.
    "q_bpe_encode" -> { (s, d) =>
      import s.implicits._
      val table = BpeEncodeMerges
      bpeInitVocab(s, d)
        .map { case (syms, f) =>
          var cur = syms
          table.foreach { case (l, r) => cur = bpeApplyMerge(cur, l, r) }
          (syms.length.toLong, f, syms.length.toLong * f, cur.length.toLong * f)
        }
        .toDF("word_len", "freq", "chars_w", "tokens_w")
        .groupBy($"word_len")
        .agg(count(lit(1)).as("n_words"),
          sum($"freq").as("n_occurrences"),
          sum($"chars_w").as("chars_total"),
          sum($"tokens_w").as("tokens_total"))
        .withColumn("compression_permille",
          expr("tokens_total * 1000 div chars_total"))
        .orderBy($"word_len")
    },

    // TOKENIZER FERTILITY BY LANGUAGE — the audit every multilingual
    // tokenizer ships with: tokens-per-word under the fixed merge table,
    // split by the n-gram language call (same stop-hit census as
    // q_text_langid, one codegen pass). Scale shape: the corpus collapses
    // to the (language, word) vocabulary FIRST — the encode fold then runs
    // once per distinct pair, not per occurrence — and the final rollup
    // has one row per language.
    "q_tokenizer_fertility" -> { (s, d) =>
      import s.implicits._
      graft.functions.StopHitsExpr.register(s)
      val table = BpeEncodeMerges
      val vocab = Tables.documents(s, d)
        .withColumn("sh", expr("graft_stop_hits(text)"))
        .withColumn("pred_lang",
          when($"sh".getItem(0) >= greatest($"sh".getItem(1), $"sh".getItem(2), $"sh".getItem(3)), "en")
            .when($"sh".getItem(1) >= greatest($"sh".getItem(2), $"sh".getItem(3)), "de")
            .when($"sh".getItem(2) >= $"sh".getItem(3), "fr")
            .otherwise("es"))
        .select($"pred_lang", explode(split($"text", " ")).as("word"))
        .filter(length($"word") >= 2 && $"word".rlike("^[a-z]+$"))
        .groupBy($"pred_lang", $"word").agg(count(lit(1)).as("freq"))
      vocab.as[(String, String, Long)]
        .map { case (lang, w, f) =>
          var cur = w.toCharArray.map(_.toString)
          table.foreach { case (l, r) => cur = bpeApplyMerge(cur, l, r) }
          (lang, f, w.length.toLong * f, cur.length.toLong * f)
        }
        .toDF("pred_lang", "freq", "chars_w", "toks_w")
        .groupBy($"pred_lang")
        .agg(sum($"freq").as("n_words"),
          count(lit(1)).as("n_distinct_words"),
          sum($"chars_w").as("chars_total"),
          sum($"toks_w").as("tokens_total"))
        .withColumn("fertility_milli", expr("tokens_total * 1000 div n_words"))
        .orderBy($"pred_lang")
    },

    // tokenizer vocab-coverage curve: the OOV rate a frequency-truncated
    // vocabulary of size k would leave on this corpus, for several k — the
    // analysis that sizes a tokenizer's vocab before training it. Corpus
    // collapses to the vocabulary first (the only corpus-sized shuffle);
    // the rank window runs over the VOCAB (bounded), and the curve is one
    // conditional aggregate over it.
    "q_vocab_coverage_curve" -> { (s, d) =>
      import s.implicits._
      val counts = Tables.documents(s, d)
        .select(explode(split($"text", " ")).as("word"))
        .filter(length($"word") > 0)
        .groupBy($"word").agg(count(lit(1)).as("freq"))
      // Only ranks <= 20 matter, so NEVER rank the whole vocabulary in one
      // unpartitioned window (the vocab grows with corpus content — 10^8
      // distinct tokens at 100 TB would sort in a single task). Instead:
      // orderBy().limit(20) plans TakeOrderedAndProject (parallel partial
      // top-k per partition, 20-row merge on the driver side of the
      // exchange), and the rank-k coverage sums come from a sorted
      // 20-element array — constant-size at any corpus scale.
      val top = counts.orderBy($"freq".desc, $"word").limit(20)
        .agg(array_sort(collect_list(struct(
          (-$"freq").as("negf"), $"word".as("word"), $"freq".as("freq")))).as("arr"))
        .select(
          expr("aggregate(slice(arr, 1, 5), 0L, (a, x) -> a + x.freq)").as("cov5"),
          expr("aggregate(slice(arr, 1, 10), 0L, (a, x) -> a + x.freq)").as("cov10"),
          expr("aggregate(arr, 0L, (a, x) -> a + x.freq)").as("cov20"))
      val totals = counts.agg(
        sum($"freq").as("total_tokens"), count(lit(1)).as("vocab_size"))
      // both sides are single-row aggregates — the join is a broadcast of
      // one row, not a data-sized cartesian
      totals.crossJoin(top)
        .select($"total_tokens", $"vocab_size",
          expr("(total_tokens - cov5) * 1000 div total_tokens").as("oov5_permille"),
          expr("(total_tokens - cov10) * 1000 div total_tokens").as("oov10_permille"),
          expr("(total_tokens - cov20) * 1000 div total_tokens").as("oov20_permille"))
    },

    // HYBRID SEARCH (keyword prefilter + vector rerank — the
    // retrieval-augmentation shape): the term gate prunes the corpus
    // BEFORE any vector math (the entire point of hybrid retrieval at
    // scale), the query vectors broadcast, and top-k is a WindowGroupLimit
    // per query. The keyword side reuses the documents table; doc_id and
    // vec_id are 1:1.
    "q_hybrid_search" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val hits = Tables.documents(s, d)
        .filter($"text".contains("merge"))
        .select($"doc_id")
      val e = Tables.embeddings(s, d).select($"vec_id", quantized($"embedding").as("q"))
      val cand = e.join(hits, e("vec_id") === hits("doc_id")).select($"vec_id", $"q")
      val queriesDf = e.filter($"vec_id" < 3)
        .select($"vec_id".as("query_id"), $"q".as("qq"))
      val scored = cand.join(broadcast(queriesDf), $"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id", qdot($"q", $"qq").as("dot"))
      val w = Window.partitionBy($"query_id").orderBy($"dot".desc, $"vec_id")
      scored.withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 5)
        .select($"query_id", $"rnk", $"vec_id", $"dot")
        .orderBy($"query_id", $"rnk")
    },

    // dataset card: the per-language "datasheet" rollup a corpus release
    // ships with — volume, token-length extremes, exact-duplicate
    // exposure (docs whose first-8-word key repeats corpus-wide, the
    // q_dedup_exact rule), and mean stopword density. Scale shape: one
    // vocabulary-sized key-count join plus one language rollup; nothing
    // corpus-quadratic anywhere.
    "q_data_card" -> { (s, d) =>
      import s.implicits._
      graft.functions.StopHitsExpr.register(s)
      val t = Tables.documents(s, d)
        .withColumn("ws", words($"text"))
        .withColumn("n_tokens", size($"ws"))
        .withColumn("key_hash", hash60(concat_ws(" ", slice($"ws", 1, 8))))
        .withColumn("stop_milli",
          (expr("graft_stop_hits(text)").getItem(4) * 1000 / size($"ws")).cast("long"))
      val kc = t.groupBy($"key_hash").agg(count(lit(1)).as("kc"))
      t.join(kc, "key_hash")
        .groupBy($"lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum($"n_tokens").cast("long").as("sum_tokens"),
          min($"n_tokens").as("min_tokens"),
          max($"n_tokens").as("max_tokens"),
          sum(when($"kc" > 1, 1L).otherwise(0L)).as("n_dup_docs"),
          expr("sum(stop_milli) div count(1)").as("mean_stop_milli"))
        .orderBy($"lang")
    },

    // bigram language-model scoring (the CCNet-shaped quality signal): a
    // bigram LM is trained corpus-wide (bigram + unigram prefix counts),
    // then every document is scored by its mean conditional probability
    // P(w2|w1) = count(w1 w2)/count(w1) in ppm. Integer math end to end so
    // the DuckDB oracle reproduces it bit-for-bit — a geometric mean needs
    // ln(), and mean conditional probability ranks gibberish vs fluent the
    // same way without floats. Scale shape: the two count tables are
    // vocabulary-sized (≪ corpus) and the doc-bigram table joins them on
    // bigram/prefix keys with map-side partial counts — no all-pairs work,
    // no per-doc collect, and the doc rollup is one groupBy(doc_id).
    "q_text_lm_score" -> { (s, d) =>
      import s.implicits._
      val t = Tables.documents(s, d).select($"doc_id", words($"text").as("ws"))
      val bi = t.filter(size($"ws") >= 2).select($"doc_id",
        explode(zip_with(
          slice($"ws", lit(1), size($"ws") - 1),
          slice($"ws", lit(2), size($"ws") - 1),
          (a, b) => concat(a, lit(" "), b))).as("bigram"))
        .withColumn("w1", split($"bigram", " ").getItem(0))
      val bc = bi.groupBy($"bigram").agg(count(lit(1)).as("bn"))
      val uc = t.select(explode($"ws").as("w")).groupBy($"w").agg(count(lit(1)).as("un"))
      bi.join(bc, "bigram")
        .join(uc, bi("w1") === uc("w"))
        .withColumn("ppm", expr("bn * 1000000 div un"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          expr("sum(ppm) div count(1)").as("mean_cond_ppm"))
        .orderBy($"doc_id")
    },

    // language ID: stopword-vote heuristic with deterministic tie-break.
    // The four per-language counts come from ONE native codegen pass
    // (graft_stop_hits) — the composed form is four interpreted filter
    // lambdas per row; NativeExprSpec pins equality.
    "q_text_langid" -> { (s, d) =>
      import s.implicits._
      graft.functions.StopHitsExpr.register(s)
      val df = Tables.documents(s, d)
        .withColumn("sh", expr("graft_stop_hits(text)"))
        .select(
          $"doc_id", $"lang".as("tagged_lang"),
          $"sh".getItem(0).as("en_hits"), $"sh".getItem(1).as("de_hits"),
          $"sh".getItem(2).as("fr_hits"), $"sh".getItem(3).as("es_hits"))
      df.withColumn("pred_lang",
        when($"en_hits" >= greatest($"de_hits", $"fr_hits", $"es_hits"), "en")
          .when($"de_hits" >= greatest($"fr_hits", $"es_hits"), "de")
          .when($"fr_hits" >= $"es_hits", "fr")
          .otherwise("es"))
        .orderBy($"doc_id")
    },

    // quality scoring: integer ratios → deterministic class (the union
    // stopword count comes from graft_stop_hits slot 4 — same single pass)
    "q_text_quality" -> { (s, d) =>
      import s.implicits._
      graft.functions.StopHitsExpr.register(s)
      Tables.documents(s, d)
        .withColumn("ws", words($"text"))
        .select(
          $"doc_id",
          size($"ws").as("n_tokens"),
          (expr("graft_stop_hits(text)").getItem(4) * 1000 / size($"ws"))
            .cast("long").as("stop_milli"),
          (length($"text") * 1000 / size($"ws")).cast("long").as("wlen_milli"))
        .withColumn("quality_class",
          when($"n_tokens" < 20, "short")
            .when($"stop_milli" > 400, "boilerplate")
            .when($"wlen_milli" > 9000, "long_words")
            .otherwise("ok"))
        .orderBy($"doc_id")
    },

    // rolling-hash fingerprinting: word 5-grams sampled by hash % 17 == 0.
    // The md5-per-gram pass runs as a native expression inside whole-stage
    // codegen (graft.functions.FingerprintsExpr — the composed HOF form is
    // interpreted CodegenFallback; NativeExprSpec pins bit-equality).
    "q_text_fingerprint" -> { (s, d) =>
      import s.implicits._
      graft.functions.FingerprintsExpr.register(s)
      Tables.documents(s, d)
        .withColumn("fps", expr("graft_fingerprints(text)"))
        .select($"doc_id",
          size($"fps").as("n_fp"),
          aggregate($"fps", lit(0L), (acc, v) => acc + (v % 1000000007L)).as("fp_sum"))
        .orderBy($"doc_id")
    },

    // repetition signals (Gopher/MassiveText-style quality rules):
    // type-token ratio + duplicate 3-gram fraction, integer-quantized —
    // one narrow array pass per document, no shuffle before the final sort
    "q_text_repetition" -> { (s, d) =>
      import s.implicits._
      withShingles(Tables.documents(s, d))
        .select($"doc_id",
          size($"ws").as("n_words"),
          (size(array_distinct($"ws")).cast("long") * 1000 / size($"ws"))
            .cast("long").as("ttr_milli"),
          when(size($"shingles") > 0,
            ((size($"shingles") - size(array_distinct($"shingles"))).cast("long") * 1000
              / size($"shingles")).cast("long"))
            .otherwise(0L).as("dup3_milli"))
        .withColumn("repetitive", $"dup3_milli" > 200 || $"ttr_milli" < 300)
        .orderBy($"doc_id")
    },

    // PII redaction: the corpus is synthetic word-salad, so deterministic
    // identifiers are injected first (email on every 5th doc, phone on
    // every 7th) and then scrubbed with two regexp passes in one narrow
    // projection — the shape of a scrubber over 100 TB: no shuffle until
    // the per-language report. The aggregate pins match counts AND the
    // redacted byte count, so an over- or under-eager pattern (or a
    // first-match-only replace) hash-mismatches.
    "q_text_pii" -> { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .withColumn("raw", concat($"text",
          when($"doc_id" % 5 === 0,
            concat(lit(" contact user"), $"doc_id", lit("@example.com")))
            .otherwise(lit("")),
          when($"doc_id" % 7 === 0,
            concat(lit(" call 555-"), lpad(($"doc_id" % 10000).cast("string"), 4, "0"),
              lit("-1234")))
            .otherwise(lit(""))))
        .withColumn("redacted", regexp_replace(
          regexp_replace($"raw", PiiEmailRe, "<EMAIL>"), PiiPhoneRe, "<PHONE>"))
        .groupBy($"lang")
        .agg(
          count(lit(1)).as("n_docs"),
          (sum((length($"redacted") - length(replace($"redacted", lit("<EMAIL>"))))
            .cast("long")) / 7).cast("long").as("n_emails"),
          (sum((length($"redacted") - length(replace($"redacted", lit("<PHONE>"))))
            .cast("long")) / 7).cast("long").as("n_phones"),
          sum(length($"redacted").cast("long")).as("sum_len"))
        .orderBy($"lang")
    },

    // == deduplication ===================================================

    // exact dedup on a normalized content key (first 8 words)
    "q_dedup_exact" -> { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .withColumn("ws", words($"text"))
        .withColumn("key", concat_ws(" ", slice($"ws", 1, 8)))
        .groupBy(hash60($"key").as("key_hash"))
        .agg(min($"doc_id").as("keeper"), count(lit(1)).as("n_copies"))
        .select($"keeper", $"n_copies", $"key_hash")
        .orderBy($"keeper")
    },

    // MinHash signature + band hashes per doc (the LSH precursor).
    // The signature runs as the native codegen'd graft_minhash_sig
    // expression (one static call per row inside whole-stage codegen) — the
    // composed HOF form it replaces lives on as the equality-pinned
    // executable spec in NativeExprSpec. `sig` is referenced several times
    // below (band slices + sig_sum), which keeps CollapseProject from
    // inlining the non-cheap expression into each consumer.
    "q_dedup_minhash_sig" -> { (s, d) =>
      import s.implicits._
      graft.functions.MinhashSigExpr.register(s)
      Tables.documents(s, d)
        // coalesce preserves the composed form's <3-word value (the
        // untouched fold init, [MinhashP]*K) where the expression says NULL,
        // so the swap cannot change results on degenerate docs
        .withColumn("sig", coalesce(expr("graft_minhash_sig(text)"),
          transform(sequence(lit(0), lit(MinhashK - 1)), _ => lit(MinhashP))))
        .withColumn("bands", bandsCol)
        .select($"doc_id",
          aggregate($"sig", lit(0L), (acc, v) => acc + (v % 1000000007L)).as("sig_sum"),
          aggregate($"bands", lit(0L), (acc, v) => acc + (v % 1000000007L)).as("band_sum"))
        .orderBy($"doc_id")
    },

    // LSH candidate pairs: docs sharing at least one minhash band.
    // Scale shape: one narrow pass computes signatures, ONE shuffle groups
    // by (band, bandhash), pairs are generated inside each (tiny) bucket —
    // no self-join, no global pair space, over-cap buckets star-paired
    // against their minimum (MaxBucket / bucketPairs).
    "q_dedup_minhash_pairs" -> { (s, d) =>
      import s.implicits._
      // persist = materialization barrier: without it CollapseProject
      // inlines the signature pipeline into the band-explode lambda and the
      // (interpreted, CodegenFallback) md5 pass runs once per band
      val sigs = signedDocs(Tables.documents(s, d)).select($"doc_id", $"sig").persist()
      lshCandidatePairs(sigs)
        .orderBy($"doc_a", $"doc_b")
    },

    // SimHash: 60-bit signature from per-word hash bit votes (bit j set when
    // more than half the words have it set). One native codegen'd pass
    // (graft.functions.SimhashExpr) — the composed form is 60 interpreted
    // filter lambdas per row; NativeExprSpec pins bit-equality.
    "q_dedup_simhash" -> { (s, d) =>
      import s.implicits._
      graft.functions.SimhashExpr.register(s)
      Tables.documents(s, d)
        .select($"doc_id", expr("graft_simhash(text)").as("simhash"))
        .orderBy($"doc_id")
    },

    // SimHash near-dup candidate pairs: band the 60-bit fingerprint into
    // 4 × 15-bit keys (pigeonhole — a pair within hamming distance 3 shares
    // at least one intact band), bucket by (band, key) in ONE shuffle, pair
    // within size-capped buckets exactly like the minhash LSH pass, then
    // keep pairs whose EXACT hamming distance ≤ 3. The cheapest of the
    // near-dup sweeps: signature is one native pass, candidate space is
    // bucket-local, the re-check is two bit ops per pair.
    "q_dedup_simhash_pairs" -> { (s, d) =>
      import s.implicits._
      simhashNearDupPairs(s, d).orderBy($"doc_a", $"doc_b")
    },

    // n-gram Jaccard near-dup: exact Jaccard scored ONLY on LSH candidate
    // pairs (the scale-safe shape — candidate generation is near-linear,
    // re-scoring touches candidate rows only; never an all-pairs join)
    "q_dedup_ngram_jaccard" -> { (s, d) =>
      import s.implicits._
      val base = withShingles(signedDocs(Tables.documents(s, d)))
        .withColumn("shash", shingleHashes)
        .select($"doc_id", $"sig", array_distinct($"shash").as("sh"))
        .persist() // shingle-hash once: feeds both band join and re-score
      val cand = lshCandidatePairs(base)
      cand
        .join(base.select($"doc_id".as("doc_a"), $"sh".as("sh_a")), "doc_a")
        .join(base.select($"doc_id".as("doc_b"), $"sh".as("sh_b")), "doc_b")
        .withColumn("inter", size(array_intersect($"sh_a", $"sh_b")))
        .withColumn("uni", size($"sh_a") + size($"sh_b") - $"inter")
        .filter($"inter" > 0)
        .withColumn("jacc_milli", ($"inter" * 1000 / $"uni").cast("long"))
        .filter($"jacc_milli" >= 30)
        .select($"doc_a", $"doc_b", $"inter", $"uni", $"jacc_milli")
        .orderBy($"doc_a", $"doc_b")
    },

    // URL-normalization dedup (the first dedup pass of every crawl
    // pipeline): the synthetic corpus carries no URLs, so deterministic
    // ones are injected first (scheme/host case variants, trailing
    // slashes, utm_* query strings, fragments — keyed off doc_id like
    // q_text_pii's identifiers), then canonicalized with two anchored
    // regex passes + lowercasing, and duplicate families grouped on the
    // canonical form. Narrow projection into one groupBy — at 100 TB the
    // only exchange is the canonical-url rollup itself.
    "q_dedup_url" -> { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .withColumn("raw_url", concat(
          when($"doc_id" % 3 === 0, lit("HTTPS://")).otherwise(lit("https://")),
          when($"doc_id" % 7 === 0, upper($"lang")).otherwise($"lang"),
          lit(".example.com/"), $"source", lit("/doc/"),
          ($"doc_id" % 200).cast("string"),
          when($"doc_id" % 5 === 0, lit("/")).otherwise(lit("")),
          when($"doc_id" % 2 === 0, lit("?utm_source=feed&utm_campaign=x")).otherwise(lit("")),
          when($"doc_id" % 11 === 0, lit("#section-2")).otherwise(lit(""))))
        .withColumn("url_norm",
          regexp_replace(regexp_replace(lower($"raw_url"), "[?#].*$", ""), "/$", ""))
        .groupBy($"url_norm")
        .agg(count(lit(1)).as("n_urls"), min($"doc_id").as("keeper"),
          countDistinct($"raw_url").as("n_variants"))
        .filter($"n_urls" > 1)
        .orderBy($"url_norm")
    },

    // fuzzy record linkage: gram-blocked candidate pairs verified by exact
    // edit distance — the entity-resolution shape (same machinery dedups
    // author/site/entity names in a crawl pipeline). Blocking: each name's
    // distinct character 3-grams key a block; blocks bigger than MaxBucket
    // are STOP-GRAMS (shared boilerplate like a common prefix) and are
    // dropped — for linkage that's the correct semantic, not a recall
    // hack: a gram carried by everyone separates nothing. Pair space is
    // per-block and cap-bounded, then exact levenshtein (identical integer
    // in Spark and DuckDB) keeps pairs within distance 2. At 100 TB the
    // only corpus-wide exchange is the gram-key shuffle; no all-pairs join
    // exists anywhere.
    "q_fuzzy_linkage" -> { (s, d) =>
      import s.implicits._
      // spreadSmall: gram construction, explode and the gram-key shuffle's
      // map side otherwise run on the single-split scan task (no-op at
      // cluster-scale input sizes)
      val n = Tables.spreadSmall(Tables.customer(s, d).select($"c_name".as("name"))
        .filter(length($"name") >= 3))
      val g = n.select($"name", explode(array_distinct(expr(
        "transform(sequence(1, length(name) - 2), i -> substring(name, i, 3))"))).as("gram"))
      // pairs form INSIDE each gram block (the lshCandidatePairs shape —
      // one shuffle on the gram key, no self-join): a gram-keyed self-join
      // would multiply every pair by its shared-gram count before the
      // distinct could collapse it
      g.groupBy($"gram")
        .agg(sort_array(collect_list($"name")).as("names"))
        .filter(size($"names") > 1 && size($"names") <= MaxBucket)
        .select(explode(bucketPairs($"names", "name_a", "name_b")).as("p"))
        .select($"p.name_a", $"p.name_b")
        // threshold-bounded levenshtein: the banded DP visits O(len·k)
        // cells instead of O(len²) and bails early; pairs beyond the bound
        // return -1. Exact distances for kept pairs are unchanged, so the
        // oracle's unbounded levenshtein agrees on every surviving row.
        // Verification runs BEFORE the distinct: a near pair shares many
        // grams, so the raw candidate stream carries each pair ~10× — the
        // bounded DP re-runs on duplicates (cheap, codegen'd, no exchange)
        // while the distinct's shuffle shrinks from the full candidate
        // space to verified pairs only. Filter∘distinct ≡ distinct∘filter.
        .withColumn("dist", levenshtein($"name_a", $"name_b", 2))
        .filter($"dist" >= 0)
        .distinct()
        .orderBy($"name_a", $"name_b")
    },

    // entity resolution end-to-end: the fuzzy-linkage pairs (gram blocking
    // + edit-distance verify) resolved through the SAME star-contraction
    // component layer the dedup suite uses — blocking, verification and
    // clustering composed into one operator. Labels are the lexicographic
    // minimum name per entity; the rollup is component-sized. On TPC-H's
    // sequential names every pair chains into ONE entity at small SF — the
    // over-merge transitive closure is famous for, demonstrated rather
    // than hidden (production pipelines cut it with a keeper/score layer,
    // q_dedup_keep_best's shape); at larger SF the gram cap thins edges
    // and the components separate.
    "q_linkage_entities" -> { (s, d) =>
      import s.implicits._
      val pairs = queries("q_fuzzy_linkage")(s, d)
        .select($"name_a".as("src"), $"name_b".as("dst"))
      resolveClusters(pairs)
        .groupBy($"lbl".as("entity"))
        .agg(count(lit(1)).as("n_members"), max($"id").as("max_member"))
        .orderBy($"entity")
    },

    // containment near-dup: |A∩B| / min(|A|,|B|) on the SAME LSH candidate
    // pairs — the asymmetric complement of Jaccard. A short doc wholly
    // embedded in a longer one scores ~1000 here while its Jaccard stays
    // low (the union is dominated by the longer doc), so quote-and-extend
    // duplicate families are caught with zero extra candidate generation.
    "q_dedup_containment" -> { (s, d) =>
      import s.implicits._
      val base = withShingles(signedDocs(Tables.documents(s, d)))
        .withColumn("shash", shingleHashes)
        .select($"doc_id", $"sig", array_distinct($"shash").as("sh"))
        .persist() // shingle-hash once: feeds both band join and re-score
      val cand = lshCandidatePairs(base)
      cand
        .join(base.select($"doc_id".as("doc_a"), $"sh".as("sh_a")), "doc_a")
        .join(base.select($"doc_id".as("doc_b"), $"sh".as("sh_b")), "doc_b")
        .withColumn("inter", size(array_intersect($"sh_a", $"sh_b")))
        .withColumn("min_side", least(size($"sh_a"), size($"sh_b")))
        .filter($"inter" > 0)
        .withColumn("cont_milli", ($"inter" * 1000 / $"min_side").cast("long"))
        .filter($"cont_milli" >= ContainMilli)
        .select($"doc_a", $"doc_b", $"inter", $"min_side", $"cont_milli")
        .orderBy($"doc_a", $"doc_b")
    },

    // embedding-cosine near-dup: exact quantized dot scored only on
    // ANN-bucket candidates (same-sign-bucket vectors) — the bucket is the
    // shuffle key, so the pair space is per-bucket, not global or
    // per-label (a label bucket is ~the corpus at 100 TB). Candidate pairs
    // come from the same capped collect_list shape as [[lshCandidatePairs]]:
    // a degenerate embedding cluster (near-duplicate spam, zero vectors)
    // would make one bucket's pair space quadratic in corpus size — buckets
    // past [[MaxBucket]] fall back to star pairs against the bucket
    // minimum (linear), not the full pair expansion and not a silent drop.
    "q_dedup_embedding" -> { (s, d) =>
      import s.implicits._
      embeddingNearDupPairs(s, d).orderBy($"vec_a", $"vec_b")
    },

    // dedup RESOLUTION: candidate pairs → connected components → canonical
    // keeper per cluster (min doc_id). Pairs alone don't dedup a corpus —
    // A~B and B~C must collapse to ONE keeper even though A~C was never a
    // candidate. Min-label propagation to fixpoint over the (tiny,
    // MaxBucket-capped) candidate graph: each iteration is one shuffle join
    // on candidate-sized data, iterations bounded by cluster diameter —
    // the corpus itself is never touched after signature generation.
    "q_dedup_clusters" -> { (s, d) =>
      import s.implicits._
      val labels = resolveClusters(candidateEdges(s, d))
      labels.groupBy($"lbl".as("keeper"))
        .agg(count(lit(1)).as("n_members"), sum($"id").as("sum_ids"))
        .orderBy($"keeper")
    },

    // keeper SELECTION POLICY: real curation keeps the best-quality member
    // of each near-dup cluster (longest document here; ties → smallest id),
    // not the arbitrary min-id — the same resolved components joined with
    // per-doc quality, argmax per cluster
    "q_dedup_keep_best" -> { (s, d) =>
      import s.implicits._
      val labels = resolveClusters(candidateEdges(s, d))
      val toks = Tables.documents(s, d)
        .select($"doc_id", size(words($"text")).as("n_tokens"))
      val sizes = labels.groupBy($"lbl").agg(count(lit(1)).as("n_members"))
      labels.join(toks, $"id" === $"doc_id")
        .groupBy($"lbl")
        .agg(max_by(struct($"id", $"n_tokens"), struct($"n_tokens", -$"id")).as("k"))
        .join(sizes, "lbl")
        .select($"lbl".as("cluster"), $"k.id".as("keeper"),
          $"k.n_tokens".as("keeper_tokens"), $"n_members")
        .orderBy($"cluster")
    },

    // ENSEMBLE dedup: the three near-dup modalities catch different
    // duplicate classes (minhash = shared shingles, simhash = small edit
    // distance, embedding = semantic paraphrase), so a production pipeline
    // unions their candidate edges before resolving components — a doc pair
    // needs to be caught by only ONE sweep to collapse. Edge generation is
    // the three bucket-capped passes above (each one shuffle, near-linear
    // in the corpus); the union graph stays candidate-sized, components
    // resolve exactly as in q_dedup_clusters, and the census carries
    // per-modality edge counts as provenance — which sweep caught each
    // cluster, the QA signal for tuning the thresholds.
    "q_dedup_ensemble" -> { (s, d) =>
      import s.implicits._
      val sigs = signedDocs(Tables.documents(s, d)).select($"doc_id", $"sig").persist()
      // localCheckpoint: materializes the union (3 tagged edge lists) so
      // the propagation loop and the two census aggregates below replay
      // stored blocks, and lets the signature cache go immediately
      // (try/finally: released even if the eager materialization throws)
      val all = try {
        val mh = lshCandidatePairs(sigs)
          .select($"doc_a", $"doc_b", lit("minhash").as("modality"))
        val sh = simhashNearDupPairs(s, d)
          .select($"doc_a", $"doc_b", lit("simhash").as("modality"))
        val em = embeddingNearDupPairs(s, d)
          .select($"vec_a".as("doc_a"), $"vec_b".as("doc_b"), lit("embedding").as("modality"))
        mh.union(sh).union(em).localCheckpoint()
      } finally sigs.unpersist()
      // raw distinct pairs — resolveClusters symmetrizes internally
      val edges = all.select($"doc_a".as("src"), $"doc_b".as("dst"))
        .distinct().localCheckpoint()
      val labels = resolveClusters(edges)
      val mods = all.join(labels.select($"id", $"lbl"), $"doc_a" === $"id")
        .groupBy($"lbl")
        .agg(sum(when($"modality" === "minhash", 1L).otherwise(0L)).as("n_minhash"),
          sum(when($"modality" === "simhash", 1L).otherwise(0L)).as("n_simhash"),
          sum(when($"modality" === "embedding", 1L).otherwise(0L)).as("n_embedding"))
      labels.groupBy($"lbl")
        .agg(count(lit(1)).as("n_members"), sum($"id").as("sum_ids"))
        .join(mods, "lbl")
        .select($"lbl".as("cluster"), $"n_members", $"sum_ids",
          $"n_minhash", $"n_simhash", $"n_embedding")
        .orderBy($"cluster")
    },

    // INCREMENTAL dedup: a new ingest batch (every 10th doc here) checked
    // against the already-ingested corpus without re-pairing the corpus
    // with itself. Same single band-bucket shuffle as the full pass, but
    // pairs are emitted (corpus, new) only — the pair space is
    // batch-linear, never corpus². At 100 TB the corpus half of this
    // band table is computed once and stored bucketed on (band, bandhash),
    // so a daily increment shuffles only the batch signatures; the query
    // keeps that bucket-local pairing shape.
    "q_dedup_incremental" -> { (s, d) =>
      import s.implicits._
      val sigs = signedDocs(Tables.documents(s, d))
        .select($"doc_id", $"sig", ($"doc_id" % 10 === 0).as("is_new"))
      sigs.select($"doc_id", $"is_new",
          posexplode(bandsCol).as(Seq("band", "bandhash")))
        .groupBy($"band", $"bandhash")
        .agg(sort_array(collect_list(struct($"doc_id", $"is_new"))).as("ms"))
        .filter(size($"ms") > 1)
        .select(size($"ms").as("bsize"),
          filter($"ms", m => m.getField("is_new")).as("news"),
          filter($"ms", m => !m.getField("is_new")).as("olds"))
        .filter(size($"news") > 0 && size($"olds") > 0)
        // over-cap buckets: each new doc pairs with the MINIMUM corpus doc
        // only (the star-edge rule, [[bucketPairs]]) — a dense boilerplate
        // family still flags every new member as a known duplicate, at
        // O(batch) instead of O(batch × family) edges
        .select($"news", when($"bsize" <= MaxBucket, $"olds")
          .otherwise(slice($"olds", 1, 1)).as("olds"))
        .select(explode(flatten(transform($"news", nw =>
          transform($"olds", od => struct(nw.getField("doc_id").as("new_doc"),
            od.getField("doc_id").as("dup_of")))))).as("p"))
        .select($"p.new_doc", $"p.dup_of").distinct()
        .groupBy($"new_doc")
        .agg(min($"dup_of").as("dup_of"), count(lit(1)).as("n_corpus_hits"))
        .orderBy($"new_doc")
    },

    // substring-level duplicate spans (the dedup modality document-level
    // minhash can't see: a boilerplate paragraph shared by otherwise-
    // distinct pages). Every word 8-gram gets a rolling 60-bit fingerprint;
    // winnowing keeps the deterministic 1/7 sample (hash % 7 == 0 — a pure
    // content function, so the same span samples identically in every doc
    // it appears in), and the registry is fingerprints seen in ≥2 docs.
    // Scale shape: one narrow codegen'd pass per doc, explode only the
    // SAMPLED grams (~len/7 rows), ONE shuffle on the fingerprint — the
    // 100 TB version of Lee et al.'s suffix-array substring dedup with
    // hash-bucket rather than suffix-order machinery.
    "q_dedup_substr" -> { (s, d) =>
      import s.implicits._
      // native: the md5-per-8-gram pass runs inside whole-stage codegen
      // (the composed HOF form measured 30 s at sf0.1 vs ~1 s native; it
      // survives as the equality-pinned spec in NativeExprSpec)
      graft.functions.SubstrFpsExpr.register(s)
      Tables.documents(s, d)
        .select($"doc_id", explode(expr("graft_substr_fps(text)")).as("fp"))
        .groupBy($"fp")
        .agg(countDistinct($"doc_id").as("n_docs"), count(lit(1)).as("n_occ"),
          min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
        .filter($"n_docs" >= 2)
        .orderBy($"fp")
    },

    // stratified train/val/test assignment by portable content-stable hash:
    // the split is a pure function of doc_id, so re-runs, backfills, and
    // different partitionings all agree — one narrow pass + tiny aggregate
    "q_split_assign" -> { (s, d) =>
      import s.implicits._
      val df = Tables.documents(s, d)
        .withColumn("bucket", hash60(concat(lit("split|"), $"doc_id".cast("string"))) % 1000)
        .withColumn("split",
          when($"bucket" < 900, "train").when($"bucket" < 950, "val").otherwise("test"))
      df.groupBy($"lang", $"split")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_chars".cast("long")).as("sum_chars"),
          min($"doc_id").as("min_doc"))
        .orderBy($"lang", $"split")
    },

    // CROSS-SPLIT LEAKAGE AUDIT: an eval example sharing a winnowed 8-gram
    // fingerprint with ANY train document is compromised (the in-corpus
    // face of decontamination — q_decontaminate gates against an EXTERNAL
    // benchmark; this audits the corpus's own train/val/test cut). Scale
    // shape: fingerprints are the only shuffle key — the per-fp rollup and
    // the eval-side join are BOTH fp-partitioned (co-located, no second
    // shuffle of the corpus), and the train side collapses to one bit per
    // fingerprint before the join, never a doc×doc comparison.
    "q_split_leakage" -> { (s, d) =>
      import s.implicits._
      graft.functions.SubstrFpsExpr.register(s)
      val docs = Tables.documents(s, d)
        .withColumn("bucket",
          hash60(concat(lit("split|"), $"doc_id".cast("string"))) % 1000)
        .withColumn("split",
          when($"bucket" < 900, "train").when($"bucket" < 950, "val").otherwise("test"))
      val fps = docs.select($"doc_id", $"split",
        explode(expr("graft_substr_fps(text)")).as("fp"))
      val trainFps = fps.filter($"split" === "train").select($"fp").distinct()
      fps.filter($"split" =!= "train")
        .join(trainFps, "fp") // fp-partitioned both sides
        .groupBy($"split")
        .agg(
          countDistinct($"doc_id").as("n_leaked_docs"),
          countDistinct($"fp").as("n_leaked_fps"),
          count(lit(1)).as("n_leaked_occurrences"))
        .orderBy($"split")
    },

    // deterministic global training order: every (epoch, doc) gets a
    // content-stable shuffle key (hash of doc_id + epoch salt), sharded to
    // worker files by key mod. The query emits the epoch MANIFEST — per
    // (epoch, shard) counts, key range, and checksums — which is the
    // artifact a trainer validates before reading; the write side is
    // `repartition(shard).sortWithinPartitions(skey)`, i.e. a shuffle whose
    // payload is the corpus exactly once per epoch and whose order within a
    // worker file is reproducible bit-for-bit from (corpus, epoch) alone.
    // Scale shape: narrow key assignment, ONE tiny aggregate (shards ×
    // epochs rows); no window, no global sort in the manifest itself.
    "q_train_order" -> { (s, d) =>
      import s.implicits._
      val epochs = Seq(0L, 1L).toDF("epoch")
      Tables.documents(s, d).select($"doc_id")
        .crossJoin(broadcast(epochs))
        .withColumn("skey", hash60(concat(lit("order|"), $"epoch".cast("string"),
          lit("|"), $"doc_id".cast("string"))))
        .withColumn("shard", $"skey" % OrderShards)
        .groupBy($"epoch", $"shard")
        .agg(count(lit(1)).as("n_docs"),
          min($"skey").as("min_key"), max($"skey").as("max_key"),
          sum($"skey" % lit(1000000007L)).as("key_sum"),
          sum($"doc_id").as("sum_doc_ids"))
        .orderBy($"epoch", $"shard")
    },

    // token-budget MIXTURE sampling: cap every language at a fixed token
    // budget (2k tokens here) by a content-stable hash threshold — how a
    // pretraining mix hits target proportions from a skewed crawl. The
    // per-lang totals are a tiny aggregate broadcast back onto one narrow
    // filter pass: the corpus is read once and never shuffled, and the
    // keep decision is a pure function of (doc_id, published frac_ppm) —
    // re-runs, backfills, and different partitionings keep identical docs.
    // Integer ppm arithmetic end-to-end, so the oracle matches exactly.
    "q_mix_sample" -> { (s, d) =>
      import s.implicits._
      val t = Tables.documents(s, d)
        .select($"doc_id", $"lang", size(words($"text")).cast("long").as("n_tok"))
      val totals = t.groupBy($"lang")
        .agg(count(lit(1)).as("n_total"), sum($"n_tok").as("tok_total"))
        .withColumn("frac_ppm", least(lit(1000000L), expr("2000000000 div tok_total")))
      t.join(broadcast(totals), "lang")
        .filter(hash60(concat(lit("mix|"), $"doc_id".cast("string"))) % 1000000 < $"frac_ppm")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_kept"), sum($"n_tok").as("tok_kept"))
        .join(broadcast(totals), "lang")
        .select($"lang", $"n_total", $"tok_total", $"frac_ppm", $"n_kept", $"tok_kept")
        .orderBy($"lang")
    },

    // MinHash ESTIMATOR ACCURACY — the eval-suite twin of q_ann_recall
    // for the dedup family: on the LSH candidate pairs, the Jaccard
    // estimate from signature agreement (matching positions / K) is
    // scored against the exact shingle Jaccard, bucketed by exact value.
    // The report is the calibration table that justifies the K=16
    // signature at scale: if a refactor degraded the hash family, the
    // per-bucket mean absolute error moves and the hash diverges. Same
    // candidate machinery as the jaccard re-score — no new pair space.
    "q_dedup_minhash_accuracy" -> { (s, d) =>
      import s.implicits._
      val base = withShingles(signedDocs(Tables.documents(s, d)))
        .withColumn("shash", shingleHashes)
        .select($"doc_id", $"sig", array_distinct($"shash").as("sh"))
        .persist()
      val cand = lshCandidatePairs(base)
      cand
        .join(base.select($"doc_id".as("doc_a"), $"sig".as("sig_a"), $"sh".as("sh_a")), "doc_a")
        .join(base.select($"doc_id".as("doc_b"), $"sig".as("sig_b"), $"sh".as("sh_b")), "doc_b")
        .withColumn("inter", size(array_intersect($"sh_a", $"sh_b")))
        .withColumn("uni", size($"sh_a") + size($"sh_b") - $"inter")
        .withColumn("jacc_milli", expr("inter * 1000 div uni"))
        .withColumn("est_milli", expr(
          s"aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)), 0, (a, v) -> a + v) * 1000 div $MinhashK"))
        .groupBy(expr("jacc_milli div 100").as("bucket"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(abs($"est_milli" - $"jacc_milli").cast("long")).as("sum_abs_err"))
        .withColumn("mean_abs_err_milli", expr("sum_abs_err div n_pairs"))
        .orderBy($"bucket")
    },

    // cluster LABELING — the step after clustering that makes the cells
    // human-auditable: every document joins its embedding's nearest
    // centroid (the SAME broadcast-codebook argmax projection the IVF
    // family pins — no corpus exchange on vec_id), then each cluster is
    // named by its top-3 idf-weighted terms. tf is a (cid, term) rollup,
    // idf the corpus-wide df rollup joined on term, and the top-3 cut is
    // a WindowGroupLimit over cluster-sized slices — at 100 TB the only
    // corpus-sized exchanges are the two term rollups.
    "q_cluster_topics" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      graft.functions.NativeIvf.register(s)
      val e = Tables.embeddings(s, d).select($"vec_id", quantized($"embedding").as("q"))
      val cents = e.filter($"vec_id" < 16).select($"vec_id".as("cid"), $"q".as("cq"))
      val codebook = cents.agg(sort_array(collect_list(struct($"cid", $"cq"))).as("cents"))
      val assigned = e.crossJoin(broadcast(codebook))
        .select($"vec_id", expr("graft_ivf_argmax(q, cents)").as("cid"))
      val docs = Tables.documents(s, d)
      val tf = assigned.join(docs.select($"doc_id", $"text"), $"vec_id" === $"doc_id")
        .select($"cid", explode(words($"text")).as("term"))
        .groupBy($"cid", $"term").agg(count(lit(1)).as("tf"))
      val dfreq = docs.select(explode(array_distinct(words($"text"))).as("term"))
        .groupBy($"term").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n"))
      val w = Window.partitionBy($"cid").orderBy($"score".desc, $"term")
      tf.join(dfreq, "term")
        .crossJoin(broadcast(n))
        .withColumn("score", expr("tf * ((n * 1000) div df)"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter($"rn" <= 3)
        .select($"cid", $"rn", $"term", $"tf", $"df", $"score")
        .orderBy($"cid", $"rn")
    },

    // temperature-weighted (α = 0.5) language rebalancing — the standard
    // multilingual-training mix: sampling weight ∝ (lang token mass)^α
    // pulls low-resource languages toward parity without flattening the
    // distribution entirely. Budget = half the corpus tokens, allocated
    // C·√tok_l per language (integer sqrt is IEEE-exact in both engines,
    // so the oracle agrees bit-for-bit); the keep decision is the same
    // doc-hash Bernoulli gate as q_mix_sample — stateless, narrow,
    // deterministic at any parallelism. Only lang-rollup-sized exchanges.
    // The keep fraction is PER-65536 (not ppm): the ppm product
    // budget_tok × 1e6 overflows Long past ~9e12 tokens (≈37 TB of
    // text); ×65536 keeps the same integer-exact oracle parity with
    // headroom past 500 TB.
    "q_mix_alpha" -> { (s, d) =>
      import s.implicits._
      val t = Tables.documents(s, d)
        .select($"doc_id", $"lang", size(words($"text")).cast("long").as("n_tok"))
      val totals = t.groupBy($"lang")
        .agg(count(lit(1)).as("n_total"), sum($"n_tok").as("tok_total"))
        .withColumn("weight", floor(sqrt($"tok_total".cast("double"))).cast("long"))
      val alloc = totals.agg(sum($"weight").as("sum_w"), sum($"tok_total").as("tok_all"))
      val target = totals.crossJoin(broadcast(alloc))
        .withColumn("budget_tok", expr("(tok_all div 2) * weight div sum_w"))
        .withColumn("keep_p16",
          least(lit(65536L), expr("budget_tok * 65536 div tok_total")))
        .select($"lang", $"n_total", $"tok_total", $"weight", $"keep_p16")
      t.join(broadcast(target), "lang")
        .filter(hash60(concat(lit("alpha|"), $"doc_id".cast("string"))) % 65536 < $"keep_p16")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_kept"), sum($"n_tok").as("tok_kept"))
        .join(broadcast(target), "lang")
        .select($"lang", $"n_total", $"tok_total", $"weight", $"keep_p16",
          $"n_kept", $"tok_kept")
        .orderBy($"lang")
    },

    // vocabulary coverage / OOV rate: the fixed top-256 corpus vocabulary
    // (by term frequency, term-tiebroken) scored against every document's
    // token stream, rolled up per language. The vocab derivation is a
    // TakeOrdered over the term-frequency aggregate — never a full sort —
    // and at 256 entries it BROADCASTS to the membership join, so the
    // exploded token stream joins narrowly: no corpus-sized shuffle
    // exists beyond the term-frequency rollup itself. The OOV ppm is the
    // go/no-go statistic for "does a fixed tokenizer vocab cover this
    // corpus slice".
    "q_vocab_oov" -> { (s, d) =>
      import s.implicits._
      val toks = Tables.documents(s, d)
        .select($"doc_id", $"lang", explode(words($"text")).as("term"))
      val vocab = toks.groupBy($"term").agg(count(lit(1)).as("cnt"))
        .orderBy($"cnt".desc, $"term").limit(256)
        .select($"term", lit(1L).as("in_vocab"))
      toks.join(broadcast(vocab), Seq("term"), "left")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_tok"),
          sum(when($"in_vocab".isNull, 1L).otherwise(0L)).as("n_oov"),
          countDistinct(when($"in_vocab".isNull, $"term")).as("n_oov_terms"))
        // per-65536, not ppm: n_oov × 1e6 overflows Long past ~9e12
        // corpus tokens — ×65536 is exact with headroom past 500 TB
        .withColumn("oov_p16", expr("n_oov * 65536 div n_tok"))
        .orderBy($"lang")
    },

    // random-projection (Johnson–Lindenstrauss) dimensionality reduction,
    // evaluated by recall: embeddings are projected 64 → 16 dims through
    // the SAME hash-derived integer hyperplanes the LSH family uses
    // (graft_lsh_dots — one codegen'd pass, weights computed once per
    // JVM), then the top-10-by-dot search runs entirely in the reduced
    // space and is scored against the full-space brute-force top-10. The
    // scale story: the projected corpus is 4× narrower — the scan, the
    // broadcast of the query side, and every dot product shrink with it,
    // and the projection itself never shuffles anything.
    "q_embed_rp_recall" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      graft.functions.NativeLsh.register(s)
      val e = Tables.embeddings(s, d).select($"vec_id", quantized($"embedding").as("q"))
        .withColumn("p", lshPlaneDots(16))
      val qs = e.filter($"vec_id" < 5)
        .select($"vec_id".as("query_id"), $"p".as("qp"))
      val w = Window.partitionBy($"query_id").orderBy($"pdot".desc, $"vec_id")
      val rpTop = e.join(broadcast(qs), $"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id", qdot($"p", $"qp").as("pdot"))
        .withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 10)
        .select($"query_id".as("rq"), $"vec_id".as("rv"))
      val brute = queries("q_ann_bruteforce")(s, d).select($"query_id", $"vec_id")
      brute.join(rpTop, $"query_id" === $"rq" && $"vec_id" === $"rv", "left")
        .groupBy($"query_id")
        .agg(count(lit(1)).as("n_brute"), count($"rv").as("n_overlap"))
        .withColumn("recall_milli", expr("n_overlap * 1000 div n_brute"))
        .orderBy($"query_id")
    },

    // integer-quantized TF-IDF top terms per document: tf from one explode +
    // count, document frequency over the full corpus, idf_milli = N*1000 div
    // df (pure integer — no float drift between engines), top-5 terms per
    // doc by window. The tf side is filtered to the report slice BEFORE the
    // join; df/idf stay corpus-wide as the statistic requires.
    "q_text_tfidf" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val tf = docs.select($"doc_id", explode(words($"text")).as("term"))
        .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy($"term").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n"))
      val scored = tf.filter($"doc_id" < 50)
        .join(dfreq, "term")
        .crossJoin(broadcast(n))
        .withColumn("idf_milli", expr("n * 1000 div df"))
        .withColumn("tfidf_milli", $"tf" * $"idf_milli")
      val w = Window.partitionBy($"doc_id").orderBy($"tfidf_milli".desc, $"term")
      scored.withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 5)
        .select($"doc_id", $"rnk", $"term", $"tf", $"df", $"tfidf_milli")
        .orderBy($"doc_id", $"rnk")
    },

    // BM25-shaped term SEARCH: rank the corpus against a 3-term query
    // picked deterministically from the corpus itself (document-frequency
    // ranks 10–12 — mid-frequency, so the query exists and discriminates
    // at every SF). The query + its df's are a TakeOrdered broadcast;
    // scoring joins them BROADCAST against per-doc tf, so the corpus
    // shuffles once on its natural (doc_id, term) key and the ranking is
    // a TakeOrdered top-20. Integer idf (N·10⁶ div df) keeps both
    // engines bit-equal; because the query terms are corpus-derived
    // mid-frequency, df grows with N and the idf factor stays bounded —
    // no Long overflow at corpus scale.
    "q_term_search" -> { (s, d) =>
      import s.implicits._
      val docs = Tables.documents(s, d)
      val tf = docs.select($"doc_id", explode(words($"text")).as("term"))
        .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy($"term").agg(count(lit(1)).as("df"))
      val qterms = dfreq.orderBy($"df".desc, $"term").limit(12)
        .orderBy($"df".asc, $"term").limit(3)
      val n = docs.agg(count(lit(1)).as("n"))
      tf.join(broadcast(qterms.select($"term".as("qt"), $"df")), $"term" === $"qt")
        .crossJoin(broadcast(n))
        .withColumn("contrib", $"tf" * expr("n * 1000000 div df"))
        .groupBy($"doc_id")
        .agg(sum($"contrib").as("score"), count(lit(1)).as("n_terms_hit"))
        .orderBy($"score".desc, $"doc_id")
        .limit(20)
    },

    // sequence PACKING for pretraining batches: contiguous greedy fill of
    // 512-token bins via a running token prefix-sum. The window partitions
    // by (lang, source) — the shard a packer would own — so no global
    // single-task sort ever exists; each shard's packing is independent,
    // which is exactly how a 100 TB packer shards the work.
    "q_pack_sequences" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val t = Tables.documents(s, d)
        .select($"doc_id", $"lang", $"source", size(words($"text")).as("n_tok"))
      val w = Window.partitionBy($"lang", $"source").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t.withColumn("cum", sum($"n_tok").over(w))
        .withColumn("bin", expr("(cum - n_tok) div 512"))
        .groupBy($"lang", $"source", $"bin")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tok".cast("long")).as("sum_tok"),
          min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
        .orderBy($"lang", $"source", $"bin")
    },

    // end-to-end curation: quality gate -> exact-dedup keepers (within the
    // surviving set) -> stratified split, reported per (lang, split). The
    // composition the individual operators exist for — one narrow pass, one
    // dedup shuffle, one keeper join on doc_id, tiny aggregate.
    "q_curation_pipeline" -> { (s, d) =>
      import s.implicits._
      val allStops = StopEn ++ StopDe ++ StopFr ++ StopEs
      val scored = Tables.documents(s, d)
        .withColumn("ws", words($"text"))
        .withColumn("n_tokens", size($"ws"))
        .withColumn("stop_milli",
          (size(filter($"ws", w => w.isInCollection(allStops))) * 1000 / size($"ws")).cast("long"))
        .withColumn("wlen_milli", (length($"text") * 1000 / size($"ws")).cast("long"))
        .filter($"n_tokens" >= 20 && $"stop_milli" <= 400 && $"wlen_milli" <= 9000)
      val keepers = scored
        .withColumn("key_hash", hash60(concat_ws(" ", slice($"ws", 1, 8))))
        .groupBy($"key_hash").agg(min($"doc_id").as("doc_id"))
        .select($"doc_id")
      scored.join(keepers, "doc_id")
        .withColumn("bucket", hash60(concat(lit("split|"), $"doc_id".cast("string"))) % 1000)
        .withColumn("split",
          when($"bucket" < 900, "train").when($"bucket" < 950, "val").otherwise("test"))
        .groupBy($"lang", $"split")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tokens".cast("long")).as("sum_tokens"))
        .orderBy($"lang", $"split")
    },

    // filter CASCADE report: every curation run publishes WHY documents
    // were dropped — per (lang, first-failing-filter) counts and token
    // mass, the report that tunes thresholds before committing a corpus.
    // Same thresholds as q_curation_pipeline; the cascade ORDER is the
    // semantic (a doc failing length never reaches the stop test, exactly
    // how production filter chains attribute drops). One narrow pass +
    // a #langs × 4 aggregate — nothing corpus-shaped crosses the shuffle.
    "q_filter_cascade" -> { (s, d) =>
      import s.implicits._
      val allStops = StopEn ++ StopDe ++ StopFr ++ StopEs
      Tables.documents(s, d)
        .withColumn("ws", words($"text"))
        .withColumn("n_tokens", size($"ws"))
        .withColumn("reason",
          when($"n_tokens" < 20, "1_too_short")
            .when((size(filter($"ws", w => w.isInCollection(allStops))) * 1000 / size($"ws"))
              .cast("long") > 400, "2_stop_heavy")
            .when((length($"text") * 1000 / size($"ws")).cast("long") > 9000, "3_long_words")
            .otherwise("0_pass"))
        .groupBy($"lang", $"reason")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tokens".cast("long")).as("sum_tokens"))
        .orderBy($"lang", $"reason")
    },

    // deterministic per-group inspection sample: the top-5 docs per
    // language by content-stable hash rank — the "show me 5 random docs
    // per stratum" every curation review needs, reproducible across
    // re-runs, backfills, and partitionings because the rank is a pure
    // function of doc_id. Plans as WindowGroupLimit: each map task keeps
    // only its local top-5 per lang before the shuffle (pinned in
    // PlanShapeSpec), so the exchange carries ≤ 5 × #langs × #partitions
    // rows at any corpus size.
    "q_sample_pergroup" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"lang").orderBy($"rk", $"doc_id")
      Tables.documents(s, d)
        .select($"doc_id", $"lang", $"n_chars",
          hash60(concat(lit("sample|"), $"doc_id".cast("string"))).as("rk"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 5)
        .select($"lang", $"rn", $"doc_id", $"n_chars")
        .orderBy($"lang", $"rn")
    },

    // benchmark DECONTAMINATION: train-split documents sharing at least one
    // sampled 5-gram fingerprint with a holdout document, with overlap
    // counts. The fingerprint sample (1/17 of grams) is the standard
    // decontamination sketch: the exploded fp table is ~|corpus|/17 rows and
    // the join shuffles on the fp hash — never a doc×doc comparison.
    "q_decontaminate" -> { (s, d) =>
      import s.implicits._
      val (train, holdout) = splitFingerprints(s, d)
      train.join(holdout, "fp")
        .groupBy($"train_doc")
        .agg(countDistinct($"holdout_doc").as("n_holdout_docs"),
          count(lit(1)).as("n_shared_fps"))
        .orderBy($"train_doc")
    },

    // Bloom-prefiltered decontamination — the same EXACT result as
    // q_decontaminate, reached through the 100 TB plan: when the holdout
    // fingerprint registry is too big to broadcast as an exact hash table
    // but fits as a bitset (~16 bits per key), the train side takes a
    // narrow broadcast-Bloom membership test BEFORE the confirm join, so
    // the join shuffle carries |true hits| + ~0.3% noise rows instead of
    // every train fingerprint. Correctness does not depend on the filter:
    // false positives die in the exact confirm join, false negatives are
    // impossible by construction (BloomFilterSpec pins both properties,
    // PlanShapeSpec pins the prefilter's position under the join).
    "q_decontam_bloom" -> { (s, d) =>
      import s.implicits._
      val (train, holdout) = splitFingerprints(s, d)
      // sized from the ACTUAL inserted-key count (the exploded holdout
      // fingerprints — sizing from the document count would drift with
      // document length: long docs carry many fps each, silently pushing
      // bits-per-key and the false-positive rate off the design point).
      // Memoized like the LSH corpus counts: a real deployment reads the
      // registry cardinality from catalog stats.
      val mBits = BloomFilter.sizeFor(countOnce(s"$d/documents#holdout_fps", holdout))
      val bloom = BloomFilter.build(holdout.select($"fp"), "fp", mBits)
      train.crossJoin(broadcast(bloom))
        .filter(BloomFilter.mightContain($"bloom", $"fp", mBits))
        .select($"train_doc", $"fp")
        .join(holdout, "fp")
        .groupBy($"train_doc")
        .agg(countDistinct($"holdout_doc").as("n_holdout_docs"),
          count(lit(1)).as("n_shared_fps"))
        .orderBy($"train_doc")
    },

    // snapshot DIFF: the dataset-versioning audit between two corpus
    // snapshots — per (lang, status ∈ added/removed/changed/unchanged)
    // counts from a full-outer join ON THE KEY carrying 8-byte content
    // hashes, never the documents themselves (at 100 TB the diff shuffle
    // moves digests; both snapshots co-partition on the natural key).
    // The "previous snapshot" is derived deterministically so the oracle
    // can state it: every 13th doc is new since old, every 7th doc's text
    // was edited, every 17th doc has an old-only tombstone row.
    "q_snapshot_diff" -> { (s, d) =>
      import s.implicits._
      val cur = Tables.documents(s, d).select($"doc_id", $"lang", $"text")
      val old = cur.filter($"doc_id" % 13 =!= 0)
        .withColumn("text", when($"doc_id" % 7 === 0, reverse($"text")).otherwise($"text"))
        .unionByName(cur.filter($"doc_id" % 17 === 0)
          .select(($"doc_id" + 1000000000L).as("doc_id"), $"lang", $"text"))
      cur.select($"doc_id", $"lang".as("lang_new"), hash60($"text").as("h_new"))
        .join(old.select($"doc_id", $"lang".as("lang_old"), hash60($"text").as("h_old")),
          Seq("doc_id"), "full_outer")
        .select(coalesce($"lang_new", $"lang_old").as("lang"),
          when($"h_old".isNull, "added")
            .when($"h_new".isNull, "removed")
            .when($"h_new" =!= $"h_old", "changed")
            .otherwise("unchanged").as("status"))
        .groupBy($"lang", $"status").agg(count(lit(1)).as("n_docs"))
        .orderBy($"lang", $"status")
    },

    // embedding FEATURE STATS: per-dimension n/sum/sumsq over the
    // quantized corpus — the QA profile an embedding pipeline publishes
    // before training (dead dimensions, scale drift, variance collapse).
    // Integer end-to-end: mean_milli = sum*1000 div n, and the variance
    // ships as its EXACT integer numerator n*sumsq − sum² (no division,
    // no float drift — the consumer divides by n² at display time).
    // Scale shape: one narrow posexplode (64 rows per vector) into a
    // map-side-combined aggregate whose shuffle carries 64 rows per
    // partition at any corpus size.
    "q_embed_stats" -> { (s, d) =>
      import s.implicits._
      Tables.embeddings(s, d)
        .select(posexplode(quantized($"embedding")).as(Seq("dim", "v")))
        .groupBy($"dim")
        .agg(count(lit(1)).as("n"), sum($"v").as("s"), sum($"v" * $"v").as("sq"))
        .select($"dim", $"n", $"s", $"sq",
          expr("s * 1000 div n").as("mean_milli"),
          ($"n" * $"sq" - $"s" * $"s").as("var_num"))
        .orderBy($"dim")
    },

    // == similarity search ===============================================

    // brute-force top-10 nearest (by quantized dot) for 5 query vectors;
    // query side broadcast, big side scanned once — the exact baseline
    "q_ann_bruteforce" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val e = Tables.embeddings(s, d).select($"vec_id", quantized($"embedding").as("q"))
      val queriesDf = e.filter($"vec_id" < 5)
        .select($"vec_id".as("query_id"), $"q".as("qq"))
      val scored = e.join(broadcast(queriesDf), $"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id", qdot($"q", $"qq").as("dot"))
      val w = Window.partitionBy($"query_id").orderBy($"dot".desc, $"vec_id")
      scored.withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 10)
        .select($"query_id", $"rnk", $"vec_id", $"dot")
        .orderBy($"query_id", $"rnk")
    },

    // LSH-bucketed ANN: sign-bit bucket from deterministic hyperplanes
    // (count scales with corpus size, lshPlanesFor), candidates =
    // same-bucket vectors only (the 100-TB scale path: bucket is a shuffle
    // key, each query touches one bucket)
    "q_ann_lsh" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      graft.functions.NativeLsh.register(s)
      val base = Tables.embeddings(s, d)
      val planes = lshPlanesFor(countOnce(s"$d/embeddings", base))
      val e = base.select($"vec_id", quantized($"embedding").as("q"))
      // plane p component i = (hash60("p|i") % 2001) - 1000, fixed + portable
      val bucketed = e.withColumn("bucket", lshBucket(planes))
      val queriesDf = bucketed.filter($"vec_id" < 5)
        .select($"vec_id".as("query_id"), $"q".as("qq"), $"bucket".as("qbucket"))
      val scored = bucketed.join(broadcast(queriesDf),
          $"bucket" === $"qbucket" && $"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id", qdot($"q", $"qq").as("dot"))
      val w = Window.partitionBy($"query_id").orderBy($"dot".desc, $"vec_id")
      scored.withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 5)
        .select($"query_id", $"rnk", $"vec_id", $"dot")
        .orderBy($"query_id", $"rnk")
    },

    // Multi-probe LSH ANN: besides its own sign-bit bucket, each query
    // probes the buckets reached by flipping its lowest-|margin| planes —
    // the standard recall repair for bucketed LSH once the plane count
    // grows with the corpus (a near neighbor differs in exactly the sign
    // bits whose dot sits near zero). Margins and probe buckets are
    // computed on the 5-row broadcast query side only; the corpus side is
    // identical to q_ann_lsh (one bucket per vector, bucket-equality join).
    "q_ann_multiprobe" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      graft.functions.NativeLsh.register(s)
      val base = Tables.embeddings(s, d)
      val planes = lshPlanesFor(countOnce(s"$d/embeddings", base))
      val e = base.select($"vec_id", quantized($"embedding").as("q"))
      val bucketed = e.withColumn("bucket", lshBucket(planes))
      val qs = bucketed.filter($"vec_id" < 5)
        .withColumn("dots", lshPlaneDots(planes))
        .select($"vec_id".as("query_id"), $"q".as("qq"),
          explode(probeBucketsCol(planes)).as("pbucket"))
      val scored = bucketed.join(broadcast(qs),
          $"bucket" === $"pbucket" && $"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id", qdot($"q", $"qq").as("dot"))
      val w = Window.partitionBy($"query_id").orderBy($"dot".desc, $"vec_id")
      scored.withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 5)
        .select($"query_id", $"rnk", $"vec_id", $"dot")
        .orderBy($"query_id", $"rnk")
    },

    // product-quantization ANN: the compression leg of the ANN family
    // (brute-force = exact baseline, LSH = hash cells, IVF = coarse cells,
    // PQ = compressed codes). The 64-dim vector is split into 8 subspaces
    // of 8 dims; each subspace is encoded as the id of its nearest of 16
    // sub-centroids (deterministic codebook standing in for an offline
    // k-means, same convention as IVF). ENCODING is one narrow fold over
    // the broadcast codebook — the corpus never shuffles and stores 8
    // small ints per vector (64× compression at float32). QUERIES score by
    // asymmetric distance: exact query sub-vector vs the centroid of each
    // stored code, i.e. the classic ADC lookup, here folded per candidate
    // because the codebook is broadcast. Top-k per query by approximate
    // distance; at 100 TB the scored side reads the 8-byte codes, not the
    // 256-byte vectors — the point of PQ.
    "q_ann_pq" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      // native kernels: encode (per-subspace argmin over the broadcast
      // codebook) and ADC scoring both run as codegen'd static calls — the
      // composed HOF forms allocate interpreted structs per centroid per
      // row and survive as the equality-pinned specs in NativeExprSpec
      graft.functions.NativePq.register(s)
      val e = Tables.embeddings(s, d).select($"vec_id", quantized($"embedding").as("q"))
      val cents = e.filter($"vec_id" < PqCodes).select($"vec_id".as("cid"), $"q".as("cq"))
      val codebook = cents.agg(sort_array(collect_list(struct($"cid", $"cq"))).as("cb"))
      val encoded = e.crossJoin(broadcast(codebook))
        .select($"vec_id", expr("graft_pq_encode(q, cb)").as("codes"), $"cb")
      val qs = e.filter($"vec_id" < 5).select($"vec_id".as("query_id"), $"q".as("qq"))
      // ADC: sum over subspaces of ||query_sub - centroid(code_m)_sub||^2
      // (cb is cid-ascending with cid = position, so codes index directly)
      val scored = encoded.join(broadcast(qs), $"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id",
          expr("graft_pq_adc(qq, codes, cb)").as("adist"))
      val w = Window.partitionBy($"query_id").orderBy($"adist".asc, $"vec_id")
      scored.withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 10)
        .select($"query_id", $"rnk", $"vec_id", $"adist")
        .orderBy($"query_id", $"rnk")
    },

    // IVF-style ANN: coarse quantizer (16 deterministic centroids standing
    // in for an offline-trained codebook) partitions the corpus by nearest
    // centroid in ONE NARROW projection — the whole codebook rides along as
    // a single broadcast row and the argmax folds over it per vector, so
    // the corpus never shuffles (and never widens to 16 rows per vector);
    // each query probes its 2 nearest cells and scores only vectors
    // assigned there. The third scale shape next to brute-force (scan-all
    // baseline) and LSH buckets (hash cells).
    "q_ann_ivf" -> { (s, d) =>
      import s.implicits._
      graft.functions.NativeIvf.register(s)
      val e = Tables.embeddings(s, d).select($"vec_id", quantized($"embedding").as("q"))
      // TRAINED coarse codebook ([[trainedCentroids]]): the production
      // offline-train → broadcast → assign loop — the k-means trainer
      // q_kmeans_train demonstrates feeds the IVF query, cached per
      // dataset like catalog statistics. It collapses to ONE broadcast
      // row inside ivfSearch; assignment stays the narrow codegen'd
      // graft_ivf_argmax pass (no Exchange on vec_id).
      val cents = trainedCentroids(s, d)
      val qs = e.filter($"vec_id" < 5).select($"vec_id".as("query_id"), $"q".as("qq"))
      ivfSearch(e, cents, qs).orderBy($"query_id", $"rnk")
    },

    // IVF-PQ: the production ANN architecture at 100 TB scale (coarse
    // inverted lists bound the search, PQ residual codes shrink what each
    // list stores from 256 B to 8 B per vector — the FAISS "IVFADC"
    // composition of the two legs above). The corpus pass is ONE narrow
    // codegen'd projection — coarse argmax, residual against the assigned
    // centroid, per-subspace argmin — with both codebooks riding along as
    // single broadcast rows; the corpus never shuffles and raw vectors are
    // never read again after encode. Queries probe their 2 nearest cells,
    // compute the query residual PER PROBED CELL on the broadcast side
    // (residuals are cell-relative), and ADC-score only vectors assigned
    // to those cells.
    "q_ann_ivfpq" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      graft.functions.NativeIvf.register(s)
      graft.functions.NativePq.register(s)
      val e = Tables.embeddings(s, d).select($"vec_id", quantized($"embedding").as("q"))
      // trained coarse codebook, same offline artifact q_ann_ivf consumes
      val coarse = trainedCentroids(s, d)
      val coarseBk = coarse.agg(sort_array(collect_list(struct($"cid", $"cq"))).as("cents"))
      // residual codebook: residuals of vectors 16..31 against their own
      // coarse cells — the deterministic stand-in for an offline-trained
      // residual codebook, same convention as the IVF/PQ codebooks
      val rcb = e.filter($"vec_id" >= 16 && $"vec_id" < 16 + PqCodes)
        .crossJoin(broadcast(coarseBk))
        .select(($"vec_id" - 16).as("rcid"),
          expr("graft_vec_residual(q, cents, graft_ivf_argmax(q, cents))").as("rcq"))
        .agg(sort_array(collect_list(struct($"rcid", $"rcq"))).as("rcents"))
      val encoded = e.crossJoin(broadcast(coarseBk)).crossJoin(broadcast(rcb))
        .select($"vec_id", expr("graft_ivf_argmax(q, cents)").as("cid"),
          expr("graft_pq_encode(graft_vec_residual(q, cents, graft_ivf_argmax(q, cents)), rcents)")
            .as("codes"),
          $"rcents")
      val qs = e.filter($"vec_id" < 5).select($"vec_id".as("query_id"), $"q".as("qq"))
      val pw = Window.partitionBy($"query_id").orderBy($"pdot".desc, $"cid")
      val probes = qs.join(broadcast(coarse))
        .select($"query_id", $"qq", $"cid", qdot($"qq", $"cq").as("pdot"))
        .withColumn("prn", row_number().over(pw))
        .filter($"prn" <= 2)
        .crossJoin(broadcast(coarseBk))
        .select($"query_id", $"cid", expr("graft_vec_residual(qq, cents, cid)").as("qres"))
      val scored = encoded.join(broadcast(probes),
          encoded("cid") === probes("cid") && $"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id", expr("graft_pq_adc(qres, codes, rcents)").as("adist"))
      val w = Window.partitionBy($"query_id").orderBy($"adist".asc, $"vec_id")
      scored.withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 10)
        .select($"query_id", $"rnk", $"vec_id", $"adist")
        .orderBy($"query_id", $"rnk")
    },

    // == codebook training ===============================================

    // Distributed k-means (Lloyd, 3 unrolled rounds) — the trainer that
    // produces the codebook q_ann_ivf consumes. The scale shape per round:
    // centroids collapse to ONE broadcast row, assignment is the same
    // narrow codegen'd graft_ivf_argmax pass the IVF query uses (the
    // ANN quality evaluation: recall@10 of the IVF index against the
    // brute-force ground truth — the offline eval loop every production
    // vector index ships with. Composes the two PIPELINES above verbatim
    // (same plans, same trained codebook) and joins their top-k sets, so
    // the measurement can never drift from what the index actually
    // serves. Scale shape: both sides end TakeOrdered-small (k rows per
    // query); the join and rollup touch k×queries rows only.
    "q_ann_recall" -> { (s, d) =>
      import s.implicits._
      val brute = queries("q_ann_bruteforce")(s, d).select($"query_id", $"vec_id")
      val ivf = queries("q_ann_ivf")(s, d)
        .select($"query_id".as("iq"), $"vec_id".as("iv"))
      brute.join(ivf, $"query_id" === $"iq" && $"vec_id" === $"iv", "left")
        .groupBy($"query_id")
        .agg(count(lit(1)).as("n_brute"), count($"iv").as("n_overlap"))
        .withColumn("recall_milli", expr("n_overlap * 1000 div n_brute"))
        .orderBy($"query_id")
    },

    // corpus never shuffles, never widens to k rows per vector), and the
    // update aggregates 64 per-dimension partial sums map-side — the only
    // shuffle payload per round is (#centroids × 64 longs). Means
    // floor-quantize back to integers each round, so the trajectory is
    // engine-portable bit-for-bit; empty clusters drop identically on
    // both sides. Output is the final codebook exploded to
    // (cid, dim, val) rows.
    "q_kmeans_train" -> { (s, d) =>
      import s.implicits._
      graft.functions.NativeIvf.register(s)
      val e = Tables.embeddings(s, d).select($"vec_id", quantized($"embedding").as("q"))
      // the full 3-round chain, timed — [[trainedCentroids]] caches this
      // exact computation as the offline artifact the IVF family consumes
      lloydChain(e)
        .select($"cid", posexplode($"cq"))
        .toDF("cid", "dim", "val")
        .orderBy($"cid", $"dim")
    },

    // == cross-modal composition =========================================

    // Cluster language purity: the embedding table's cluster assignment
    // (same narrow broadcast-codebook argmax as IVF) joined against the
    // document table's language tags — the "does my embedding space
    // respect language?" QA a multimodal corpus runs before training.
    // The only corpus-sized work is one equi-join on the shared id (both
    // sides co-partition on the natural key — no broadcast requirement);
    // everything after is #clusters × #langs rows.
    "q_cluster_purity" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      graft.functions.NativeIvf.register(s)
      val e = Tables.embeddings(s, d).select($"vec_id", quantized($"embedding").as("q"))
      val cents = e.filter($"vec_id" < 16).select($"vec_id".as("cid"), $"q".as("cq"))
      val codebook = cents.agg(sort_array(collect_list(struct($"cid", $"cq"))).as("cents"))
      val assigned = e.crossJoin(broadcast(codebook))
        .select($"vec_id", expr("graft_ivf_argmax(q, cents)").as("cid"))
      val docs = Tables.documents(s, d).select($"doc_id", $"lang")
      val perLang = assigned.join(docs, $"vec_id" === $"doc_id")
        .groupBy($"cid", $"lang").agg(count(lit(1)).as("nl"))
      val w = Window.partitionBy($"cid").orderBy($"nl".desc, $"lang")
      perLang
        .withColumn("rn", row_number().over(w))
        .withColumn("n_docs", sum($"nl").over(Window.partitionBy($"cid")))
        .filter($"rn" === 1)
        .select($"cid", $"n_docs", $"lang".as("top_lang"), $"nl".as("top_n"))
        .withColumn("purity_milli", expr("(top_n * 1000) div n_docs"))
        .orderBy($"cid")
    },

    // == chunking / boilerplate ==========================================

    // Overlapping-window chunking (RAG indexing / context-length
    // splitting): each doc becomes windows of [[ChunkWords]] words at
    // stride [[ChunkStride]], last window ragged. ONE narrow pass — the
    // explode factor is ~n/stride per doc, there is no shuffle except the
    // oracle-facing final sort, and the chunk id is the portable content
    // hash of the window text, so exact-dedup of chunks (or a chunk-level
    // ANN index) composes with the dedup/ANN families unchanged.
    "q_text_chunk" -> { (s, d) =>
      import s.implicits._
      chunked(Tables.documents(s, d)).orderBy($"doc_id", $"chunk_idx")
    },

    // Corpus-frequency boilerplate strip (CCNet/RefinedWeb paragraph
    // dedup, re-expressed over word blocks since the synthetic docs carry
    // no newline structure): docs split into non-overlapping
    // [[SegWords]]-word segments; a segment whose portable hash appears in
    // >= [[BoilerDf]] distinct docs is boilerplate; the doc keeps the
    // rest. Scale shape: explode → one groupBy on the segment hash
    // (payload = hashes, linear in corpus), join back on the SAME key
    // (co-partitioned by the aggregation's own partitioning), one groupBy
    // doc_id — never a pair space, never a driver-side collect, and the
    // boiler side is aggregation-shrunk before the join.
    "q_boilerplate" -> { (s, d) =>
      import s.implicits._
      val sw = SegWords
      // localCheckpoint: three consumers (frequency census, probe join,
      // per-doc stats) would otherwise each re-scan the text and re-run
      // the split+md5 segment pass. Materializing (doc_id, n_words, segs)
      // once is the right trade at scale too — the hash columns are an
      // order of magnitude smaller than the text they summarize
      val base = segmented(Tables.documents(s, d))
        .select($"doc_id", $"n_words", $"segs").localCheckpoint()
      val segs = base.select($"doc_id", explode($"segs").as("h"))
      val boiler = segs.groupBy($"h")
        .agg(countDistinct($"doc_id").as("df_cnt"))
        .filter($"df_cnt" >= BoilerDf)
        .select($"h")
      val perDoc = segs.join(boiler, "h")
        .groupBy($"doc_id").agg(count(lit(1)).as("n_boiler"))
      base.select($"doc_id", $"n_words", size($"segs").cast("long").as("n_segs"))
        .join(perDoc, Seq("doc_id"), "left")
        .na.fill(0L, Seq("n_boiler"))
        .withColumn("kept_words", $"n_words" - $"n_boiler" * sw)
        .orderBy($"doc_id")
    },

    // SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup
    // scoped to k-means cells — every embedding is assigned to its nearest
    // centroid with the same narrow broadcast-codebook argmax the
    // IVF/kmeans family uses (the corpus never shuffles for assignment),
    // near-duplicate pairs are found ONLY within a cell, and each
    // duplicate keeps the lowest-id member of its group. In a real
    // deployment the cell count tracks corpus size (k ∝ n keeps expected
    // cell size constant — the paper uses 50k cells for LAION-440M), so
    // the per-cell pair expansion is bounded by design; here the
    // deterministic 16-centroid codebook matches the IVF family and the
    // oracle. The pair walk mirrors lshCandidatePairs: one shuffle
    // (groupBy cid), pairs generated inside the bucket, never a global
    // pair space.
    "q_dedup_semantic" -> { (s, d) =>
      import s.implicits._
      graft.functions.NativeIvf.register(s)
      val base = Tables.embeddings(s, d)
      // cell count derived from corpus size (semCellsFor): a FIXED cell
      // count is the quadratic cliff the sf1 smoke measured directly —
      // 10× the corpus at 16 cells made the in-cell pair walk 26× slower
      // (cell size grows linearly, pairs quadratically). Deriving k keeps
      // expected occupancy at or under SemCellTarget, so per-cell pair
      // work is bounded and total work stays corpus-linear. The DuckDB
      // oracle replicates the same doubling loop in a recursive CTE on its
      // own COUNT(*), so query and oracle agree on k at any corpus size.
      val n = countOnce(s"$d/embeddings", base)
      val k = semCellsFor(n)
      val e = base.select($"vec_id", quantized($"embedding").as("q"))
      val cents = e.filter($"vec_id" < k).select($"vec_id".as("cid"), $"q".as("cq"))
      val codebook = cents.agg(sort_array(collect_list(struct($"cid", $"cq"))).as("cents"))
      val assigned = e.crossJoin(broadcast(codebook))
        .select($"vec_id", expr("graft_ivf_argmax(q, cents)").as("cid"), $"q")
      // skew guard: a cell at 32× the EXPECTED occupancy signals
      // degenerate content (the same skew-bomb rationale as MaxBucket — a
      // quadratic walk inside one hot cell is the failure mode). The cap
      // is derived from n/k, not a constant: past semCellsFor's 65536-cell
      // ceiling the expected occupancy itself grows with the corpus, and a
      // fixed cap would drop TYPICAL cells. Over-cap cells fall back to
      // STAR pairs against the cell minimum (bucketPairsWith — the same
      // recall rule as the LSH buckets): a degenerate semantic family
      // still dedups through its anchor at O(cell) cost instead of
      // escaping SemDeDup entirely. At the oracle scale factors the cap
      // resolves to 32 × 128 = 4096 and no cell comes near it; the oracle
      // mirrors both arms anyway.
      val cellCap = 32L * math.max(SemCellTarget, n / k)
      val pairs = semCellPairs(assigned, cellCap)
        .filter($"dot" >= SemThreshold)
      pairs.groupBy($"dup", $"cid")
        .agg(min($"keep").as("keeper"), count(lit(1)).as("n_near"))
        .select($"dup".as("vec_id"), $"cid", $"keeper", $"n_near")
        .orderBy($"vec_id")
    }
  )

  // ---- DuckDB oracles ----------------------------------------------------

  private def h60(expr: String) = s"CAST('0x' || substr(md5($expr), 1, 15) AS BIGINT)"

  private val wsExpr = "list_filter(string_split(text, ' '), w -> len(w) > 0)"

  private def stopList(s: Seq[String]) = s.map(w => s"'$w'").mkString("[", ", ", "]")

  /** Shared oracle CTE chain mirroring [[signedDocs]]+[[lshCandidatePairs]]:
    * words → shingles (docs with <3 words dropped) → shingle hashes →
    * minhash sig → per-band hashes, plus `bok` = buckets within the
    * [2, MaxBucket] size window, `bover` = over-cap buckets with their
    * minimum member, and `cand` = the candidate pairs (all pairs for
    * in-window buckets, star pairs against the minimum for over-cap —
    * mirroring [[bucketPairs]]). Ends WITHOUT a trailing comma.
    */
  /** The simhash bit-vote expression over a `wh` word-hash list — shared by
    * the signature oracle and the pairs oracle so the two can never diverge.
    */
  private lazy val simhashBitTerms: String = (0 until SimhashBits).map { j =>
    s"CASE WHEN 2 * len(list_filter(wh, h -> (h >> $j) % 2 = 1)) > len(wh) THEN ${1L << j} ELSE 0 END"
  }.mkString(" +\n  ")

  private def oracleBandsCte(): String = {
    val shingle = "ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]"
    s"""WITH t AS (SELECT doc_id, $wsExpr AS ws FROM documents),
       |sh AS (SELECT doc_id, list_transform(range(1, len(ws) - 1), i -> $shingle) AS shingles
       |  FROM t WHERE len(ws) >= 3),
       |sh2 AS (SELECT doc_id, list_transform(shingles, sh -> ${h60("sh")} % 2147483647) AS shash FROM sh),
       |sig AS (SELECT doc_id, shash, list_transform(range(0, $MinhashK),
       |    k -> list_min(list_transform(shash, h -> ((k * 2 + 1) * h + k * 1000003) % 2147483647))) AS sig
       |  FROM sh2),
       |bands AS (SELECT doc_id, b AS band,
       |    ${h60(s"array_to_string(list_transform(list_slice(sig, b * ${MinhashK / Bands} + 1, (b + 1) * ${MinhashK / Bands}), v -> CAST(v AS VARCHAR)), ',')")} AS bandhash
       |  FROM sig, UNNEST(range(0, $Bands)) AS u(b)),
       |bok AS (SELECT band, bandhash FROM bands GROUP BY band, bandhash
       |  HAVING COUNT(*) BETWEEN 2 AND $MaxBucket),
       |bover AS (SELECT band, bandhash, MIN(doc_id) AS mdoc FROM bands
       |  GROUP BY band, bandhash HAVING COUNT(*) > $MaxBucket),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bandhash = b.bandhash
       |    AND a.doc_id < b.doc_id
       |  JOIN bok o ON o.band = a.band AND o.bandhash = a.bandhash
       |  UNION
       |  SELECT v.mdoc, b.doc_id FROM bover v JOIN bands b
       |    ON b.band = v.band AND b.bandhash = v.bandhash AND b.doc_id > v.mdoc)""".stripMargin
  }

  /** The 3-round Lloyd training chain as DuckDB CTEs, assuming a CTE `e`
    * (vec_id, q) is already defined: c0 = the 16-vector seed, each round =
    * argmax assignment (tie → smaller cid, matching graft_ivf_argmax) +
    * per-(cid, dim) floor-quantized means. Final centroids are `c3`
    * (cid, cq), exploded form `s3` (cid, dim, val). ONE definition shared
    * by the q_kmeans_train oracle and the IVF-family oracles so the
    * trained codebook can never diverge between them. Ends WITHOUT a
    * trailing comma.
    */
  private def oracleLloydCtes(): String = {
    val dot = "CAST(list_sum(list_transform(range(1, 65), i -> %s[i] * %s[i])) AS BIGINT)"
    def round(n: Int, prev: String) =
      s"""a$n AS (SELECT vec_id, cid, q FROM (
         |    SELECT v.vec_id, c.cid, v.q,
         |      ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY ${dot.format("v.q", "c.cq")} DESC, c.cid) AS rn
         |    FROM e v CROSS JOIN $prev c) WHERE rn = 1),
         |s$n AS (SELECT cid, dim, CAST(FLOOR(CAST(SUM(val) AS DOUBLE) / COUNT(*)) AS BIGINT) AS val
         |  FROM (SELECT cid, UNNEST(q) AS val, UNNEST(range(0, 64)) AS dim FROM a$n)
         |  GROUP BY cid, dim),
         |c$n AS (SELECT cid, list(val ORDER BY dim) AS cq FROM s$n GROUP BY cid)"""
    s"""c0 AS (SELECT vec_id AS cid, q AS cq FROM e WHERE vec_id < 16),
       |${round(1, "c0")},
       |${round(2, "c1")},
       |${round(3, "c2")}""".stripMargin
  }

  /** Shared by q_decontaminate and q_decontam_bloom — the Bloom variant
    * produces the bit-identical exact result through a prefiltered plan.
    */
  private lazy val decontaminateOracle: String =
    s"""WITH t AS (SELECT doc_id, $wsExpr AS ws,
       |    CASE WHEN ${h60("'split|' || CAST(doc_id AS VARCHAR)")} % 1000 < 900
       |      THEN 'train' ELSE 'holdout' END AS split
       |  FROM documents),
       |g AS (SELECT doc_id, split,
       |  CASE WHEN len(ws) >= 5 THEN list_transform(range(1, len(ws) - 3),
       |    i -> ${h60("ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]")})
       |  ELSE [] END AS grams FROM t),
       |f AS (SELECT doc_id, split, list_filter(grams, h -> h % $FpMod = 0) AS fps FROM g),
       |e AS (SELECT doc_id, split, unnest(fps) AS fp FROM f),
       |tr AS (SELECT doc_id AS train_doc, fp FROM e WHERE split = 'train'),
       |te AS (SELECT doc_id AS holdout_doc, fp FROM e WHERE split <> 'train')
       |SELECT train_doc, COUNT(DISTINCT holdout_doc) AS n_holdout_docs,
       |  COUNT(*) AS n_shared_fps
       |FROM tr JOIN te USING (fp) GROUP BY 1 ORDER BY 1""".stripMargin

  def oracles: Map[String, String] = Map(
    "q_text_tokens" ->
      s"""SELECT doc_id, len($wsExpr) AS n_ws_tokens,
         |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS n_bpe_tokens,
         |  len(text) AS len_chars
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_vocab_bigrams" ->
      s"""WITH t AS (SELECT $wsExpr AS toks FROM documents),
         |b AS (SELECT unnest(list_transform(range(1, len(toks)),
         |    i -> toks[CAST(i AS INTEGER)] || ' ' || toks[CAST(i + 1 AS INTEGER)])) AS bigram
         |  FROM t)
         |SELECT bigram, COUNT(*) AS n FROM b
         |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 100""".stripMargin,

    "q_bpe_merge" ->
      """WITH w AS (SELECT word, COUNT(*) AS freq FROM (
        |    SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
        |  WHERE len(word) >= 2 AND regexp_matches(word, '^[a-z]+$')
        |  GROUP BY word),
        |p AS (SELECT substr(word, CAST(i AS INTEGER), 2) AS pair, freq
        |  FROM w, UNNEST(range(1, len(word))) AS u(i)),
        |c AS (SELECT pair, CAST(SUM(freq) AS BIGINT) AS n FROM p GROUP BY pair),
        |r AS (SELECT ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS rank, pair, n FROM c)
        |SELECT rank, pair, n FROM r WHERE rank <= 20 ORDER BY rank""".stripMargin,

    "q_bpe_train" -> bpeTrainOracle(BpeMerges),

    "q_bpe_encode" -> bpeEncodeOracle,

    "q_tokenizer_fertility" -> tokenizerFertilityOracle,

    "q_vocab_coverage_curve" ->
      """WITH w AS (SELECT word, COUNT(*) AS freq FROM (
        |    SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
        |  WHERE len(word) > 0 GROUP BY word),
        |r AS (SELECT freq, ROW_NUMBER() OVER (ORDER BY freq DESC, word) AS rnk FROM w)
        |SELECT CAST(SUM(freq) AS BIGINT) AS total_tokens,
        |  COUNT(*) AS vocab_size,
        |  CAST((SUM(freq) - SUM(CASE WHEN rnk <= 5 THEN freq ELSE 0 END)) * 1000 // SUM(freq) AS BIGINT) AS oov5_permille,
        |  CAST((SUM(freq) - SUM(CASE WHEN rnk <= 10 THEN freq ELSE 0 END)) * 1000 // SUM(freq) AS BIGINT) AS oov10_permille,
        |  CAST((SUM(freq) - SUM(CASE WHEN rnk <= 20 THEN freq ELSE 0 END)) * 1000 // SUM(freq) AS BIGINT) AS oov20_permille
        |FROM r""".stripMargin,

    "q_hybrid_search" ->
      """WITH h AS (SELECT doc_id FROM documents WHERE text LIKE '%merge%'),
        |e AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
        |  FROM embeddings),
        |c AS (SELECT e.vec_id, e.q FROM e JOIN h ON e.vec_id = h.doc_id),
        |s AS (SELECT qv.vec_id AS query_id, c.vec_id,
        |    CAST(list_sum(list_transform(range(1, 65), i -> c.q[i] * qv.q[i])) AS BIGINT) AS dot
        |  FROM c JOIN e qv ON qv.vec_id < 3 AND c.vec_id <> qv.vec_id),
        |r AS (SELECT query_id, vec_id, dot,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id) AS rnk
        |  FROM s)
        |SELECT query_id, rnk, vec_id, dot FROM r WHERE rnk <= 5
        |ORDER BY query_id, rnk""".stripMargin,

    "q_data_card" -> {
      val allStops = stopList(StopEn ++ StopDe ++ StopFr ++ StopEs)
      s"""WITH t AS (SELECT doc_id, lang, $wsExpr AS ws FROM documents),
         |u AS (SELECT doc_id, lang, len(ws) AS n_tokens,
         |    ${h60("array_to_string(list_slice(ws, 1, 8), ' ')")} AS key_hash,
         |    len(list_filter(ws, w -> list_contains($allStops, w))) * 1000 // len(ws) AS stop_milli
         |  FROM t),
         |kc AS (SELECT key_hash, COUNT(*) AS kc FROM u GROUP BY key_hash)
         |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
         |  MIN(n_tokens) AS min_tokens, MAX(n_tokens) AS max_tokens,
         |  CAST(SUM(CASE WHEN kc.kc > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
         |  CAST(SUM(stop_milli) // COUNT(*) AS BIGINT) AS mean_stop_milli
         |FROM u JOIN kc USING (key_hash)
         |GROUP BY lang ORDER BY lang""".stripMargin
    },

    "q_text_lm_score" ->
      s"""WITH t AS (SELECT doc_id, $wsExpr AS ws FROM documents),
         |b AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)),
         |    i -> ws[CAST(i AS INTEGER)] || ' ' || ws[CAST(i + 1 AS INTEGER)])) AS bigram
         |  FROM t WHERE len(ws) >= 2),
         |bc AS (SELECT bigram, COUNT(*) AS bn FROM b GROUP BY bigram),
         |u AS (SELECT unnest(ws) AS w FROM t),
         |uc AS (SELECT w, COUNT(*) AS un FROM u GROUP BY w),
         |j AS (SELECT b.doc_id, bc.bn * 1000000 // uc.un AS ppm
         |  FROM b JOIN bc USING (bigram)
         |  JOIN uc ON uc.w = split_part(b.bigram, ' ', 1))
         |SELECT doc_id, COUNT(*) AS n_bigrams,
         |  CAST(SUM(ppm) // COUNT(*) AS BIGINT) AS mean_cond_ppm
         |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_text_langid" ->
      s"""WITH t AS (SELECT doc_id, lang AS tagged_lang,
         |  len(list_filter($wsExpr, w -> list_contains(${stopList(StopEn)}, w))) AS en_hits,
         |  len(list_filter($wsExpr, w -> list_contains(${stopList(StopDe)}, w))) AS de_hits,
         |  len(list_filter($wsExpr, w -> list_contains(${stopList(StopFr)}, w))) AS fr_hits,
         |  len(list_filter($wsExpr, w -> list_contains(${stopList(StopEs)}, w))) AS es_hits
         |  FROM documents)
         |SELECT doc_id, tagged_lang, en_hits, de_hits, fr_hits, es_hits,
         |  CASE WHEN en_hits >= greatest(de_hits, fr_hits, es_hits) THEN 'en'
         |       WHEN de_hits >= greatest(fr_hits, es_hits) THEN 'de'
         |       WHEN fr_hits >= es_hits THEN 'fr' ELSE 'es' END AS pred_lang
         |FROM t ORDER BY doc_id""".stripMargin,

    "q_text_quality" -> {
      val allStops = stopList(StopEn ++ StopDe ++ StopFr ++ StopEs)
      s"""WITH t AS (SELECT doc_id, $wsExpr AS ws, text FROM documents),
         |u AS (SELECT doc_id, len(ws) AS n_tokens,
         |  CAST(len(list_filter(ws, w -> list_contains($allStops, w))) * 1000 // len(ws) AS BIGINT) AS stop_milli,
         |  CAST(len(text) * 1000 // len(ws) AS BIGINT) AS wlen_milli
         |  FROM t)
         |SELECT doc_id, n_tokens, stop_milli, wlen_milli,
         |  CASE WHEN n_tokens < 20 THEN 'short'
         |       WHEN stop_milli > 400 THEN 'boilerplate'
         |       WHEN wlen_milli > 9000 THEN 'long_words'
         |       ELSE 'ok' END AS quality_class
         |FROM u ORDER BY doc_id""".stripMargin
    },

    "q_text_fingerprint" ->
      s"""WITH t AS (SELECT doc_id, $wsExpr AS ws FROM documents),
         |g AS (SELECT doc_id,
         |  CASE WHEN len(ws) >= 5 THEN list_transform(range(1, len(ws) - 3),
         |    i -> ${h60("ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]")})
         |  ELSE [] END AS grams FROM t),
         |f AS (SELECT doc_id, list_filter(grams, h -> h % $FpMod = 0) AS fps FROM g)
         |SELECT doc_id, len(fps) AS n_fp,
         |  CAST(coalesce(list_sum(list_transform(fps, v -> v % 1000000007)), 0) AS BIGINT) AS fp_sum
         |FROM f ORDER BY doc_id""".stripMargin,

    "q_text_repetition" -> {
      val shingle = "ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]"
      s"""WITH t AS (SELECT doc_id, $wsExpr AS ws FROM documents),
         |g AS (SELECT doc_id, ws, CASE WHEN len(ws) >= 3 THEN
         |    list_transform(range(1, len(ws) - 1), i -> $shingle) ELSE [] END AS sh FROM t),
         |u AS (SELECT doc_id, len(ws) AS n_words,
         |  CAST(len(list_distinct(ws)) * 1000 // len(ws) AS BIGINT) AS ttr_milli,
         |  CASE WHEN len(sh) > 0 THEN
         |    CAST((len(sh) - len(list_distinct(sh))) * 1000 // len(sh) AS BIGINT)
         |  ELSE 0 END AS dup3_milli FROM g)
         |SELECT doc_id, n_words, ttr_milli, dup3_milli,
         |  (dup3_milli > 200 OR ttr_milli < 300) AS repetitive
         |FROM u ORDER BY doc_id""".stripMargin
    },

    "q_text_pii" ->
      s"""WITH r AS (SELECT lang, text ||
         |    CASE WHEN doc_id % 5 = 0
         |      THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
         |      ELSE '' END ||
         |    CASE WHEN doc_id % 7 = 0
         |      THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '-1234'
         |      ELSE '' END AS raw
         |  FROM documents),
         |x AS (SELECT lang, regexp_replace(regexp_replace(raw,
         |    '$PiiEmailRe', '<EMAIL>', 'g'), '$PiiPhoneRe', '<PHONE>', 'g') AS redacted
         |  FROM r)
         |SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(len(redacted) - len(replace(redacted, '<EMAIL>', ''))) // 7 AS BIGINT) AS n_emails,
         |  CAST(SUM(len(redacted) - len(replace(redacted, '<PHONE>', ''))) // 7 AS BIGINT) AS n_phones,
         |  CAST(SUM(len(redacted)) AS BIGINT) AS sum_len
         |FROM x GROUP BY lang ORDER BY lang""".stripMargin,

    "q_dedup_exact" ->
      s"""WITH t AS (SELECT doc_id,
         |  array_to_string(list_slice($wsExpr, 1, 8), ' ') AS key FROM documents)
         |SELECT MIN(doc_id) AS keeper, COUNT(*) AS n_copies, ${h60("key")} AS key_hash
         |FROM t GROUP BY key_hash ORDER BY keeper""".stripMargin,

    "q_dedup_minhash_sig" -> {
      val shingle = "ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]"
      s"""WITH t AS (SELECT doc_id, $wsExpr AS ws FROM documents),
         |sh AS (SELECT doc_id, CASE WHEN len(ws) >= 3 THEN
         |    list_transform(range(1, len(ws) - 1), i -> $shingle) ELSE [] END AS shingles FROM t),
         |sh2 AS (SELECT doc_id, list_transform(shingles, sh -> ${h60("sh")} % 2147483647) AS shash FROM sh),
         |sig AS (SELECT doc_id, list_transform(range(0, $MinhashK),
         |    k -> list_min(list_transform(shash, h -> ((k * 2 + 1) * h + k * 1000003) % 2147483647))) AS sig
         |  FROM sh2),
         |b AS (SELECT doc_id, sig, list_transform(range(0, $Bands),
         |    b -> ${h60(s"array_to_string(list_transform(list_slice(sig, b * ${MinhashK / Bands} + 1, (b + 1) * ${MinhashK / Bands}), v -> CAST(v AS VARCHAR)), ',')")}) AS bands
         |  FROM sig)
         |SELECT doc_id,
         |  CAST(list_sum(list_transform(sig, v -> v % 1000000007)) AS BIGINT) AS sig_sum,
         |  CAST(list_sum(list_transform(bands, v -> v % 1000000007)) AS BIGINT) AS band_sum
         |FROM b ORDER BY doc_id""".stripMargin
    },

    "q_dedup_minhash_pairs" -> {
      s"""${oracleBandsCte()}
         |SELECT doc_a, doc_b FROM cand
         |ORDER BY doc_a, doc_b""".stripMargin
    },

    "q_dedup_incremental" -> {
      // over-cap buckets (bover): each new doc pairs with the MINIMUM
      // corpus doc only — the star-edge rule, mirroring the Spark side
      s"""${oracleBandsCte()},
         |m AS (SELECT b.doc_id, b.band, b.bandhash, (b.doc_id % 10 = 0) AS is_new
         |  FROM bands b JOIN bok o ON o.band = b.band AND o.bandhash = b.bandhash),
         |mo AS (SELECT b.doc_id, b.band, b.bandhash, (b.doc_id % 10 = 0) AS is_new
         |  FROM bands b JOIN bover v ON v.band = b.band AND v.bandhash = b.bandhash),
         |oldmin AS (SELECT band, bandhash, MIN(doc_id) AS dup_of
         |  FROM mo WHERE NOT is_new GROUP BY band, bandhash),
         |p AS (SELECT DISTINCT new_doc, dup_of FROM (
         |  SELECT n.doc_id AS new_doc, c.doc_id AS dup_of
         |  FROM m n JOIN m c ON n.band = c.band AND n.bandhash = c.bandhash
         |  WHERE n.is_new AND NOT c.is_new
         |  UNION
         |  SELECT n.doc_id, om.dup_of
         |  FROM mo n JOIN oldmin om ON om.band = n.band AND om.bandhash = n.bandhash
         |  WHERE n.is_new))
         |SELECT new_doc, MIN(dup_of) AS dup_of, COUNT(*) AS n_corpus_hits
         |FROM p GROUP BY new_doc ORDER BY new_doc""".stripMargin
    },

    "q_dedup_simhash" -> {
      s"""WITH t AS (SELECT doc_id,
         |  list_transform($wsExpr, w -> ${h60("w")}) AS wh FROM documents)
         |SELECT doc_id, CAST($simhashBitTerms AS BIGINT) AS simhash
         |FROM t ORDER BY doc_id""".stripMargin
    },

    "q_dedup_simhash_pairs" -> {
      s"""WITH t AS (SELECT doc_id,
         |  list_transform($wsExpr, w -> ${h60("w")}) AS wh FROM documents),
         |shs AS (SELECT doc_id, CAST($simhashBitTerms AS BIGINT) AS sh FROM t),
         |bb AS (SELECT doc_id, sh, band, (sh >> (band * 15)) & 32767 AS key
         |  FROM shs, UNNEST(range(0, $SimhashBands)) AS u(band)),
         |bok AS (SELECT band, key FROM bb GROUP BY band, key
         |  HAVING COUNT(*) BETWEEN 2 AND $MaxBucket),
         |bover AS (SELECT band, key, MIN(doc_id) AS mdoc, arg_min(sh, doc_id) AS msh
         |  FROM bb GROUP BY band, key HAVING COUNT(*) > $MaxBucket)
         |SELECT DISTINCT doc_a, doc_b, hamming FROM (
         |  SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
         |    CAST(bit_count(xor(a.sh, b2.sh)) AS BIGINT) AS hamming
         |  FROM bb a JOIN bb b2 ON a.band = b2.band AND a.key = b2.key
         |    AND a.doc_id < b2.doc_id
         |  JOIN bok o ON o.band = a.band AND o.key = a.key
         |  UNION
         |  SELECT v.mdoc, b2.doc_id,
         |    CAST(bit_count(xor(v.msh, b2.sh)) AS BIGINT)
         |  FROM bover v JOIN bb b2
         |    ON b2.band = v.band AND b2.key = v.key AND b2.doc_id > v.mdoc)
         |WHERE hamming <= 3
         |ORDER BY doc_a, doc_b""".stripMargin
    },

    "q_dedup_ngram_jaccard" -> {
      s"""${oracleBandsCte()},
         |ss AS (SELECT doc_id, list_distinct(shash) AS sh FROM sh2),
         |p AS (SELECT c.doc_a, c.doc_b,
         |    len(list_intersect(a.sh, b.sh)) AS inter,
         |    len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS uni
         |  FROM cand c JOIN ss a ON a.doc_id = c.doc_a JOIN ss b ON b.doc_id = c.doc_b)
         |SELECT doc_a, doc_b, inter, uni, CAST(inter * 1000 // uni AS BIGINT) AS jacc_milli
         |FROM p WHERE inter > 0 AND inter * 1000 // uni >= 30
         |ORDER BY doc_a, doc_b""".stripMargin
    },

    "q_dedup_url" ->
      s"""WITH u AS (SELECT doc_id,
         |    (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://' ELSE 'https://' END) ||
         |    (CASE WHEN doc_id % 7 = 0 THEN upper(lang) ELSE lang END) || '.example.com/' ||
         |    source || '/doc/' || CAST(doc_id % 200 AS VARCHAR) ||
         |    (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) ||
         |    (CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&utm_campaign=x' ELSE '' END) ||
         |    (CASE WHEN doc_id % 11 = 0 THEN '#section-2' ELSE '' END) AS raw_url
         |  FROM documents),
         |n AS (SELECT doc_id, raw_url,
         |    regexp_replace(regexp_replace(lower(raw_url), '[?#].*$$', ''), '/$$', '') AS url_norm
         |  FROM u)
         |SELECT url_norm, COUNT(*) AS n_urls, MIN(doc_id) AS keeper,
         |  COUNT(DISTINCT raw_url) AS n_variants
         |FROM n GROUP BY url_norm HAVING COUNT(*) > 1 ORDER BY url_norm""".stripMargin,

    "q_fuzzy_linkage" ->
      s"""WITH n AS (SELECT c_name AS name FROM customer WHERE len(c_name) >= 3),
         |g AS (SELECT name, unnest(list_distinct(list_transform(range(1, len(name) - 1),
         |    i -> substr(name, CAST(i AS INTEGER), 3)))) AS gram FROM n),
         |ok AS (SELECT gram FROM g GROUP BY gram
         |  HAVING COUNT(*) > 1 AND COUNT(*) <= $MaxBucket),
         |p AS (SELECT DISTINCT a.name AS name_a, b.name AS name_b
         |  FROM g a JOIN ok USING (gram) JOIN g b USING (gram)
         |  WHERE a.name < b.name)
         |SELECT name_a, name_b, levenshtein(name_a, name_b) AS dist
         |FROM p WHERE levenshtein(name_a, name_b) <= 2
         |ORDER BY name_a, name_b""".stripMargin,

    "q_linkage_entities" ->
      s"""WITH RECURSIVE n AS (SELECT c_name AS name FROM customer WHERE len(c_name) >= 3),
         |g AS (SELECT name, unnest(list_distinct(list_transform(range(1, len(name) - 1),
         |    i -> substr(name, CAST(i AS INTEGER), 3)))) AS gram FROM n),
         |ok AS (SELECT gram FROM g GROUP BY gram
         |  HAVING COUNT(*) > 1 AND COUNT(*) <= $MaxBucket),
         |p AS (SELECT DISTINCT a.name AS name_a, b.name AS name_b
         |  FROM g a JOIN ok USING (gram) JOIN g b USING (gram)
         |  WHERE a.name < b.name),
         |lk AS (SELECT name_a, name_b FROM p WHERE levenshtein(name_a, name_b) <= 2),
         |edges AS (SELECT name_a AS src, name_b AS dst FROM lk
         |  UNION ALL SELECT name_b, name_a FROM lk),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |comp AS (SELECT src AS id, LEAST(src, MIN(dst)) AS lbl FROM reach GROUP BY src)
         |SELECT lbl AS entity, COUNT(*) AS n_members, MAX(id) AS max_member
         |FROM comp GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_dedup_containment" -> {
      s"""${oracleBandsCte()},
         |ss AS (SELECT doc_id, list_distinct(shash) AS sh FROM sh2),
         |p AS (SELECT c.doc_a, c.doc_b,
         |    len(list_intersect(a.sh, b.sh)) AS inter,
         |    least(len(a.sh), len(b.sh)) AS min_side
         |  FROM cand c JOIN ss a ON a.doc_id = c.doc_a JOIN ss b ON b.doc_id = c.doc_b)
         |SELECT doc_a, doc_b, inter, min_side,
         |  CAST(inter * 1000 // min_side AS BIGINT) AS cont_milli
         |FROM p WHERE inter > 0 AND inter * 1000 // min_side >= $ContainMilli
         |ORDER BY doc_a, doc_b""".stripMargin
    },

    "q_dedup_clusters" -> {
      // transitive closure over the capped candidate pairs (recursive CTE =
      // the fixpoint Spark reaches by star contraction)
      s"""${oracleBandsCte().replace("WITH t AS", "WITH RECURSIVE t AS")},
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM cand
         |  UNION ALL SELECT doc_b, doc_a FROM cand),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |comp AS (SELECT src AS id, LEAST(src, MIN(dst)) AS lbl FROM reach GROUP BY src)
         |SELECT lbl AS keeper, COUNT(*) AS n_members, CAST(SUM(id) AS BIGINT) AS sum_ids
         |FROM comp GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q_dedup_keep_best" -> {
      s"""${oracleBandsCte().replace("WITH t AS", "WITH RECURSIVE t AS")},
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM cand
         |  UNION ALL SELECT doc_b, doc_a FROM cand),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |comp AS (SELECT src AS id, LEAST(src, MIN(dst)) AS lbl FROM reach GROUP BY src),
         |toks AS (SELECT doc_id, len(ws) AS n_tokens FROM t),
         |sizes AS (SELECT lbl, COUNT(*) AS n_members FROM comp GROUP BY 1),
         |ranked AS (SELECT c.lbl, c.id, k.n_tokens,
         |    ROW_NUMBER() OVER (PARTITION BY c.lbl ORDER BY k.n_tokens DESC, c.id) AS rn
         |  FROM comp c JOIN toks k ON k.doc_id = c.id)
         |SELECT r.lbl AS cluster, r.id AS keeper, r.n_tokens AS keeper_tokens, s.n_members
         |FROM ranked r JOIN sizes s ON s.lbl = r.lbl
         |WHERE r.rn = 1 ORDER BY cluster""".stripMargin
    },

    "q_dedup_ensemble" -> {
      val bucketTerms = (0 until LshPlanes).map { p =>
        s"CASE WHEN list_sum(list_transform(range(1, 65), i -> q[i] * (${h60(s"'$p|' || CAST(i AS VARCHAR)")} % 2001 - 1000))) > 0 THEN ${1L << p} ELSE 0 END"
      }.mkString(" +\n  ")
      s"""${oracleBandsCte().replace("WITH t AS", "WITH RECURSIVE t AS")},
         |wt AS (SELECT doc_id, list_transform($wsExpr, w -> ${h60("w")}) AS wh FROM documents),
         |shs AS (SELECT doc_id, CAST($simhashBitTerms AS BIGINT) AS sh FROM wt),
         |bb AS (SELECT doc_id, sh, band, (sh >> (band * 15)) & 32767 AS key
         |  FROM shs, UNNEST(range(0, $SimhashBands)) AS u(band)),
         |sok AS (SELECT band, key FROM bb GROUP BY band, key
         |  HAVING COUNT(*) BETWEEN 2 AND $MaxBucket),
         |sover AS (SELECT band, key, MIN(doc_id) AS mdoc, arg_min(sh, doc_id) AS msh
         |  FROM bb GROUP BY band, key HAVING COUNT(*) > $MaxBucket),
         |cand_sh AS (SELECT DISTINCT doc_a, doc_b FROM (
         |  SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b
         |  FROM bb a JOIN bb b2 ON a.band = b2.band AND a.key = b2.key
         |    AND a.doc_id < b2.doc_id
         |  JOIN sok o ON o.band = a.band AND o.key = a.key
         |  WHERE bit_count(xor(a.sh, b2.sh)) <= 3
         |  UNION
         |  SELECT v.mdoc, b2.doc_id FROM sover v JOIN bb b2
         |    ON b2.band = v.band AND b2.key = v.key AND b2.doc_id > v.mdoc
         |  WHERE bit_count(xor(v.msh, b2.sh)) <= 3)),
         |ee AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
         |  FROM embeddings),
         |eb AS (SELECT vec_id, q, CAST($bucketTerms AS BIGINT) AS bucket FROM ee),
         |eok AS (SELECT bucket FROM eb GROUP BY bucket
         |  HAVING COUNT(*) BETWEEN 2 AND $MaxBucket),
         |eover AS (SELECT bucket, MIN(vec_id) AS mvec, arg_min(q, vec_id) AS mq
         |  FROM eb GROUP BY bucket HAVING COUNT(*) > $MaxBucket),
         |cand_em AS (SELECT DISTINCT doc_a, doc_b FROM (
         |  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
         |  FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |  JOIN eok o ON o.bucket = a.bucket
         |  WHERE list_sum(list_transform(range(1, 65), i -> a.q[i] * b.q[i])) >= $QdotThreshold
         |  UNION
         |  SELECT v.mvec, b.vec_id FROM eover v JOIN eb b
         |    ON b.bucket = v.bucket AND b.vec_id > v.mvec
         |  WHERE list_sum(list_transform(range(1, 65), i -> v.mq[i] * b.q[i])) >= $QdotThreshold)),
         |allp AS (SELECT doc_a, doc_b, 'minhash' AS modality FROM cand
         |  UNION ALL SELECT doc_a, doc_b, 'simhash' FROM cand_sh
         |  UNION ALL SELECT doc_a, doc_b, 'embedding' FROM cand_em),
         |up AS (SELECT DISTINCT doc_a, doc_b FROM allp),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM up
         |  UNION ALL SELECT doc_b, doc_a FROM up),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e2.dst FROM reach r JOIN edges e2 ON r.dst = e2.src),
         |comp AS (SELECT src AS id, LEAST(src, MIN(dst)) AS lbl FROM reach GROUP BY src),
         |mods AS (SELECT c.lbl,
         |    CAST(SUM(CASE WHEN modality = 'minhash' THEN 1 ELSE 0 END) AS BIGINT) AS n_minhash,
         |    CAST(SUM(CASE WHEN modality = 'simhash' THEN 1 ELSE 0 END) AS BIGINT) AS n_simhash,
         |    CAST(SUM(CASE WHEN modality = 'embedding' THEN 1 ELSE 0 END) AS BIGINT) AS n_embedding
         |  FROM allp p JOIN comp c ON p.doc_a = c.id GROUP BY 1),
         |mem AS (SELECT lbl, COUNT(*) AS n_members, CAST(SUM(id) AS BIGINT) AS sum_ids
         |  FROM comp GROUP BY 1)
         |SELECT mem.lbl AS cluster, n_members, sum_ids, n_minhash, n_simhash, n_embedding
         |FROM mem JOIN mods ON mods.lbl = mem.lbl ORDER BY cluster""".stripMargin
    },

    "q_decontaminate" -> decontaminateOracle,

    // identical exact result — the Bloom is a plan-level prefilter the
    // oracle never needs to model (false positives die in the confirm
    // join, false negatives are impossible)
    "q_decontam_bloom" -> decontaminateOracle,

    "q_pack_sequences" ->
      s"""WITH t AS (SELECT doc_id, lang, source, len($wsExpr) AS n_tok FROM documents),
         |c AS (SELECT *, SUM(n_tok) OVER (PARTITION BY lang, source ORDER BY doc_id
         |    ROWS UNBOUNDED PRECEDING) AS cum FROM t),
         |b AS (SELECT lang, source, CAST((cum - n_tok) // 512 AS BIGINT) AS bin, n_tok, doc_id FROM c)
         |SELECT lang, source, bin, COUNT(*) AS n_docs,
         |  CAST(SUM(n_tok) AS BIGINT) AS sum_tok,
         |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |FROM b GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q_curation_pipeline" -> {
      val allStops = stopList(StopEn ++ StopDe ++ StopFr ++ StopEs)
      s"""WITH t AS (SELECT doc_id, lang, text, $wsExpr AS ws FROM documents),
         |q AS (SELECT doc_id, lang, ws, len(ws) AS n_tokens
         |  FROM t
         |  WHERE len(ws) >= 20
         |    AND len(list_filter(ws, w -> list_contains($allStops, w))) * 1000 // len(ws) <= 400
         |    AND len(text) * 1000 // len(ws) <= 9000),
         |k AS (SELECT ${h60("array_to_string(list_slice(ws, 1, 8), ' ')")} AS key_hash,
         |    MIN(doc_id) AS doc_id FROM q GROUP BY 1),
         |j AS (SELECT q.doc_id, q.lang, q.n_tokens FROM q JOIN k ON q.doc_id = k.doc_id),
         |u AS (SELECT lang, n_tokens,
         |    CASE WHEN ${h60("'split|' || CAST(doc_id AS VARCHAR)")} % 1000 < 900 THEN 'train'
         |         WHEN ${h60("'split|' || CAST(doc_id AS VARCHAR)")} % 1000 < 950 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM j)
         |SELECT lang, split, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
         |FROM u GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    "q_filter_cascade" -> {
      val allStops = stopList(StopEn ++ StopDe ++ StopFr ++ StopEs)
      s"""WITH t AS (SELECT doc_id, lang, text, $wsExpr AS ws FROM documents),
         |r AS (SELECT lang, len(ws) AS n_tokens,
         |  CASE WHEN len(ws) < 20 THEN '1_too_short'
         |       WHEN len(list_filter(ws, w -> list_contains($allStops, w))) * 1000 // len(ws) > 400 THEN '2_stop_heavy'
         |       WHEN len(text) * 1000 // len(ws) > 9000 THEN '3_long_words'
         |       ELSE '0_pass' END AS reason
         |  FROM t)
         |SELECT lang, reason, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
         |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    "q_sample_pergroup" ->
      s"""WITH r AS (SELECT doc_id, lang, n_chars,
         |    ${h60("'sample|' || CAST(doc_id AS VARCHAR)")} AS rk FROM documents),
         |k AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY rk, doc_id) AS rn FROM r)
         |SELECT lang, rn, doc_id, n_chars FROM k WHERE rn <= 5
         |ORDER BY lang, rn""".stripMargin,

    "q_split_assign" ->
      s"""WITH t AS (SELECT lang, n_chars, doc_id,
         |  ${h60("'split|' || CAST(doc_id AS VARCHAR)")} % 1000 AS bucket FROM documents),
         |u AS (SELECT lang, CASE WHEN bucket < 900 THEN 'train'
         |    WHEN bucket < 950 THEN 'val' ELSE 'test' END AS split, n_chars, doc_id FROM t)
         |SELECT lang, split, COUNT(*) AS n_docs,
         |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars, MIN(doc_id) AS min_doc
         |FROM u GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_split_leakage" -> {
      val gram = (0 until SubstrGram).map(o => s"ws[i+$o]").mkString(" || ' ' || ")
      s"""WITH t AS (SELECT doc_id, text,
         |    ${h60("'split|' || CAST(doc_id AS VARCHAR)")} % 1000 AS bucket FROM documents),
         |u AS (SELECT doc_id, CASE WHEN bucket < 900 THEN 'train'
         |    WHEN bucket < 950 THEN 'val' ELSE 'test' END AS split,
         |    $wsExpr AS ws FROM t),
         |g AS (SELECT doc_id, split, CASE WHEN len(ws) >= $SubstrGram THEN
         |    list_transform(range(1, len(ws) - ${SubstrGram - 2}), i -> ${h60(gram)})
         |  ELSE [] END AS grams FROM u),
         |f AS (SELECT doc_id, split, unnest(list_filter(grams, h -> h % $SubstrMod = 0)) AS fp FROM g),
         |tr AS (SELECT DISTINCT fp FROM f WHERE split = 'train'),
         |lk AS (SELECT f.split, f.doc_id, f.fp FROM f JOIN tr ON f.fp = tr.fp
         |  WHERE f.split <> 'train')
         |SELECT split, COUNT(DISTINCT doc_id) AS n_leaked_docs,
         |  COUNT(DISTINCT fp) AS n_leaked_fps, COUNT(*) AS n_leaked_occurrences
         |FROM lk GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q_mix_sample" ->
      s"""WITH t AS (SELECT doc_id, lang, len($wsExpr) AS n_tok FROM documents),
         |tot AS (SELECT lang, COUNT(*) AS n_total, CAST(SUM(n_tok) AS BIGINT) AS tok_total,
         |    CAST(LEAST(1000000, 2000000000 // SUM(n_tok)) AS BIGINT) AS frac_ppm
         |  FROM t GROUP BY lang),
         |k AS (SELECT t.lang, t.n_tok FROM t JOIN tot USING (lang)
         |  WHERE ${h60("'mix|' || CAST(doc_id AS VARCHAR)")} % 1000000 < frac_ppm),
         |kk AS (SELECT lang, COUNT(*) AS n_kept, CAST(SUM(n_tok) AS BIGINT) AS tok_kept
         |  FROM k GROUP BY lang)
         |SELECT tot.lang, tot.n_total, tot.tok_total, tot.frac_ppm, kk.n_kept, kk.tok_kept
         |FROM tot JOIN kk ON tot.lang = kk.lang ORDER BY tot.lang""".stripMargin,

    "q_dedup_minhash_accuracy" ->
      s"""${oracleBandsCte()},
         |ss AS (SELECT doc_id, list_distinct(shash) AS sh FROM sh2),
         |p AS (SELECT c.doc_a, c.doc_b,
         |    len(list_intersect(sa.sh, sb.sh)) AS inter,
         |    len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) AS uni,
         |    list_sum(list_transform(range(1, ${MinhashK + 1}),
         |      i -> CASE WHEN ga.sig[i] = gb.sig[i] THEN 1 ELSE 0 END)) AS agree
         |  FROM cand c
         |  JOIN ss sa ON sa.doc_id = c.doc_a JOIN ss sb ON sb.doc_id = c.doc_b
         |  JOIN sig ga ON ga.doc_id = c.doc_a JOIN sig gb ON gb.doc_id = c.doc_b),
         |q AS (SELECT inter * 1000 // uni AS jacc_milli,
         |    agree * 1000 // $MinhashK AS est_milli FROM p)
         |SELECT jacc_milli // 100 AS bucket, COUNT(*) AS n_pairs,
         |  CAST(SUM(ABS(est_milli - jacc_milli)) AS BIGINT) AS sum_abs_err,
         |  CAST(SUM(ABS(est_milli - jacc_milli)) // COUNT(*) AS BIGINT) AS mean_abs_err_milli
         |FROM q GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_cluster_topics" -> {
      val dot = "CAST(list_sum(list_transform(range(1, 65), i -> %s[i] * %s[i])) AS BIGINT)"
      s"""WITH e AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
         |  FROM embeddings),
         |c AS (SELECT vec_id AS cid, q AS cq FROM e WHERE vec_id < 16),
         |ad AS (SELECT v.vec_id, c.cid, ${dot.format("v.q", "c.cq")} AS cdot FROM e v CROSS JOIN c),
         |a AS (SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cid) AS rn
         |    FROM ad) WHERE rn = 1),
         |tf AS (SELECT a.cid, t.term, COUNT(*) AS tf
         |  FROM a JOIN (SELECT doc_id, unnest($wsExpr) AS term FROM documents) t
         |    ON a.vec_id = t.doc_id GROUP BY 1, 2),
         |dfreq AS (SELECT term, COUNT(*) AS df FROM
         |  (SELECT doc_id, unnest(list_distinct($wsExpr)) AS term FROM documents)
         |  GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n FROM documents),
         |sc AS (SELECT cid, term, tf, df, tf * ((n * 1000) // df) AS score
         |  FROM tf JOIN dfreq USING (term) CROSS JOIN n)
         |SELECT cid, rn, term, tf, df, CAST(score AS BIGINT) AS score FROM (
         |  SELECT cid, term, tf, df, score,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY cid ORDER BY score DESC, term) AS BIGINT) AS rn
         |  FROM sc) WHERE rn <= 3
         |ORDER BY cid, rn""".stripMargin
    },

    "q_mix_alpha" ->
      s"""WITH t AS (SELECT doc_id, lang, len($wsExpr) AS n_tok FROM documents),
         |tot AS (SELECT lang, COUNT(*) AS n_total, CAST(SUM(n_tok) AS BIGINT) AS tok_total,
         |    CAST(FLOOR(SQRT(CAST(SUM(n_tok) AS DOUBLE))) AS BIGINT) AS weight
         |  FROM t GROUP BY lang),
         |al AS (SELECT CAST(SUM(weight) AS BIGINT) AS sum_w,
         |    CAST(SUM(tok_total) AS BIGINT) AS tok_all FROM tot),
         |tg AS (SELECT lang, n_total, tok_total, weight,
         |    CAST(LEAST(65536, ((tok_all // 2) * weight // sum_w) * 65536 // tok_total)
         |      AS BIGINT) AS keep_p16
         |  FROM tot CROSS JOIN al),
         |k AS (SELECT t.lang, t.n_tok FROM t JOIN tg USING (lang)
         |  WHERE ${h60("'alpha|' || CAST(doc_id AS VARCHAR)")} % 65536 < keep_p16),
         |kk AS (SELECT lang, COUNT(*) AS n_kept, CAST(SUM(n_tok) AS BIGINT) AS tok_kept
         |  FROM k GROUP BY lang)
         |SELECT tg.lang, tg.n_total, tg.tok_total, tg.weight, tg.keep_p16,
         |  kk.n_kept, kk.tok_kept
         |FROM tg JOIN kk ON tg.lang = kk.lang ORDER BY tg.lang""".stripMargin,

    "q_vocab_oov" ->
      s"""WITH toks AS (SELECT doc_id, lang, unnest($wsExpr) AS term FROM documents),
         |v AS (SELECT term FROM (SELECT term, COUNT(*) AS cnt FROM toks
         |    GROUP BY term ORDER BY cnt DESC, term LIMIT 256)),
         |j AS (SELECT lang, toks.term,
         |    CASE WHEN v.term IS NULL THEN 1 ELSE 0 END AS oov
         |  FROM toks LEFT JOIN v ON toks.term = v.term)
         |SELECT lang, COUNT(*) AS n_tok, CAST(SUM(oov) AS BIGINT) AS n_oov,
         |  COUNT(DISTINCT CASE WHEN oov = 1 THEN term END) AS n_oov_terms,
         |  CAST(SUM(oov) AS BIGINT) * 65536 // COUNT(*) AS oov_p16
         |FROM j GROUP BY lang ORDER BY lang""".stripMargin,

    "q_embed_rp_recall" -> {
      val planeTerm = h60("CAST(p AS VARCHAR) || '|' || CAST(i AS VARCHAR)")
      s"""WITH e AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
         |  FROM embeddings),
         |pr AS (SELECT vec_id, q,
         |    list_transform(range(0, 16), p -> CAST(list_sum(list_transform(range(1, 65),
         |      i -> q[i] * ($planeTerm % 2001 - 1000))) AS BIGINT)) AS pv
         |  FROM e),
         |qs AS (SELECT vec_id AS query_id, q AS qq, pv AS qp FROM pr WHERE vec_id < 5),
         |sp AS (SELECT qs.query_id, v.vec_id,
         |    CAST(list_sum(list_transform(range(1, 17), j -> v.pv[j] * qs.qp[j])) AS BIGINT) AS pdot
         |  FROM pr v JOIN qs ON v.vec_id <> qs.query_id),
         |rp AS (SELECT query_id, vec_id FROM (
         |    SELECT query_id, vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY pdot DESC, vec_id) AS rnk
         |    FROM sp) WHERE rnk <= 10),
         |sb AS (SELECT qs.query_id, v.vec_id,
         |    CAST(list_sum(list_transform(range(1, 65), i -> v.q[i] * qs.qq[i])) AS BIGINT) AS dot
         |  FROM e v JOIN qs ON v.vec_id <> qs.query_id),
         |brute AS (SELECT query_id, vec_id FROM (
         |    SELECT query_id, vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id) AS rnk
         |    FROM sb) WHERE rnk <= 10)
         |SELECT b.query_id, COUNT(*) AS n_brute, COUNT(r.vec_id) AS n_overlap,
         |  CAST(COUNT(r.vec_id) * 1000 // COUNT(*) AS BIGINT) AS recall_milli
         |FROM brute b LEFT JOIN rp r ON r.query_id = b.query_id AND r.vec_id = b.vec_id
         |GROUP BY b.query_id ORDER BY b.query_id""".stripMargin
    },

    "q_text_tfidf" ->
      s"""WITH w AS (SELECT doc_id, unnest($wsExpr) AS term FROM documents),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM w GROUP BY 1, 2),
         |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n FROM documents),
         |s AS (SELECT t.doc_id, t.term, t.tf, d.df,
         |    t.tf * ((SELECT n FROM n) * 1000 // d.df) AS tfidf_milli
         |  FROM tf t JOIN dfreq d USING (term) WHERE t.doc_id < 50),
         |r AS (SELECT *, ROW_NUMBER() OVER (
         |    PARTITION BY doc_id ORDER BY tfidf_milli DESC, term) AS rnk FROM s)
         |SELECT doc_id, rnk, term, tf, df, tfidf_milli FROM r WHERE rnk <= 5
         |ORDER BY doc_id, rnk""".stripMargin,

    "q_term_search" ->
      s"""WITH w AS (SELECT doc_id, unnest($wsExpr) AS term FROM documents),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM w GROUP BY 1, 2),
         |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |top12 AS (SELECT term, df FROM dfreq ORDER BY df DESC, term LIMIT 12),
         |q AS (SELECT term, df FROM top12 ORDER BY df ASC, term LIMIT 3),
         |n AS (SELECT COUNT(*) AS n FROM documents)
         |SELECT t.doc_id,
         |  CAST(SUM(t.tf * ((SELECT n FROM n) * 1000000 // q.df)) AS BIGINT) AS score,
         |  COUNT(*) AS n_terms_hit
         |FROM tf t JOIN q ON t.term = q.term
         |GROUP BY 1 ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    "q_dedup_embedding" -> {
      val bucketTerms = (0 until LshPlanes).map { p =>
        s"CASE WHEN list_sum(list_transform(range(1, 65), i -> q[i] * (${h60(s"'$p|' || CAST(i AS VARCHAR)")} % 2001 - 1000))) > 0 THEN ${1L << p} ELSE 0 END"
      }.mkString(" +\n  ")
      s"""WITH e AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
         |  FROM embeddings),
         |eb AS (SELECT vec_id, q, CAST($bucketTerms AS BIGINT) AS bucket FROM e),
         |bok AS (SELECT bucket FROM eb GROUP BY bucket
         |  HAVING COUNT(*) BETWEEN 2 AND $MaxBucket),
         |bover AS (SELECT bucket, MIN(vec_id) AS mvec, arg_min(q, vec_id) AS mq
         |  FROM eb GROUP BY bucket HAVING COUNT(*) > $MaxBucket)
         |SELECT DISTINCT vec_a, vec_b, qdot FROM (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    CAST(list_sum(list_transform(range(1, 65), i -> a.q[i] * b.q[i])) AS BIGINT) AS qdot
         |  FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |  JOIN bok o ON o.bucket = a.bucket
         |  UNION
         |  SELECT v.mvec, b.vec_id,
         |    CAST(list_sum(list_transform(range(1, 65), i -> v.mq[i] * b.q[i])) AS BIGINT)
         |  FROM bover v JOIN eb b ON b.bucket = v.bucket AND b.vec_id > v.mvec)
         |WHERE qdot >= $QdotThreshold
         |ORDER BY vec_a, vec_b""".stripMargin
    },

    "q_snapshot_diff" ->
      s"""WITH cur AS (SELECT doc_id, lang, text FROM documents),
         |old AS (
         |  SELECT doc_id, lang,
         |    CASE WHEN doc_id % 7 = 0 THEN reverse(text) ELSE text END AS text
         |  FROM cur WHERE doc_id % 13 <> 0
         |  UNION ALL
         |  SELECT doc_id + 1000000000, lang, text FROM cur WHERE doc_id % 17 = 0),
         |j AS (SELECT COALESCE(c.lang, o.lang) AS lang,
         |    CASE WHEN o.doc_id IS NULL THEN 'added'
         |         WHEN c.doc_id IS NULL THEN 'removed'
         |         WHEN ${h60("c.text")} <> ${h60("o.text")} THEN 'changed'
         |         ELSE 'unchanged' END AS status
         |  FROM cur c FULL OUTER JOIN old o ON c.doc_id = o.doc_id)
         |SELECT lang, status, COUNT(*) AS n_docs FROM j GROUP BY 1, 2
         |ORDER BY 1, 2""".stripMargin,

    "q_embed_stats" ->
      s"""WITH e AS (SELECT
         |  list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
         |  FROM embeddings),
         |x AS (SELECT UNNEST(range(0, 64)) AS dim, UNNEST(q) AS v FROM e),
         |a AS (SELECT dim, COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS s,
         |    CAST(SUM(v * v) AS BIGINT) AS sq
         |  FROM x GROUP BY 1)
         |SELECT dim, n, s, sq, s * 1000 // n AS mean_milli,
         |  n * sq - s * s AS var_num
         |FROM a ORDER BY dim""".stripMargin,

    "q_ann_bruteforce" ->
      s"""WITH e AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
         |  FROM embeddings),
         |s AS (SELECT qv.vec_id AS query_id, v.vec_id,
         |    CAST(list_sum(list_transform(range(1, 65), i -> v.q[i] * qv.q[i])) AS BIGINT) AS dot
         |  FROM e v JOIN e qv ON qv.vec_id < 5 AND v.vec_id <> qv.vec_id),
         |r AS (SELECT query_id, vec_id, dot,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id) AS rnk
         |  FROM s)
         |SELECT query_id, rnk, vec_id, dot FROM r WHERE rnk <= 10
         |ORDER BY query_id, rnk""".stripMargin,

    "q_ann_lsh" -> {
      val bucketTerms = (0 until LshPlanes).map { p =>
        s"CASE WHEN list_sum(list_transform(range(1, 65), i -> q[i] * (${h60(s"'$p|' || CAST(i AS VARCHAR)")} % 2001 - 1000))) > 0 THEN ${1L << p} ELSE 0 END"
      }.mkString(" +\n  ")
      s"""WITH e AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
         |  FROM embeddings),
         |b AS (SELECT vec_id, q, CAST($bucketTerms AS BIGINT) AS bucket FROM e),
         |s AS (SELECT qv.vec_id AS query_id, v.vec_id,
         |    CAST(list_sum(list_transform(range(1, 65), i -> v.q[i] * qv.q[i])) AS BIGINT) AS dot
         |  FROM b v JOIN b qv ON qv.vec_id < 5 AND v.bucket = qv.bucket AND v.vec_id <> qv.vec_id),
         |r AS (SELECT query_id, vec_id, dot,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id) AS rnk
         |  FROM s)
         |SELECT query_id, rnk, vec_id, dot FROM r WHERE rnk <= 5
         |ORDER BY query_id, rnk""".stripMargin
    },

    "q_ann_multiprobe" -> {
      val np = LshPlanes // 8 at the oracle-pinned scale (see lshPlanesFor)
      s"""WITH e AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
         |  FROM embeddings),
         |b AS (SELECT vec_id, q, list_transform(range(0, $np), p ->
         |    list_sum(list_transform(range(1, 65),
         |      i -> q[i] * (${h60("CAST(p AS VARCHAR) || '|' || CAST(i AS VARCHAR)")} % 2001 - 1000)))) AS dots
         |  FROM e),
         |bb AS (SELECT vec_id, q, dots,
         |    CAST(list_sum(list_transform(range(1, ${np + 1}),
         |      p -> CASE WHEN dots[p] > 0 THEN (1 << (p - 1)) ELSE 0 END)) AS BIGINT) AS bucket
         |  FROM b),
         |qs AS (SELECT vec_id AS query_id, q AS qq, dots, bucket FROM bb WHERE vec_id < 5),
         |m AS (SELECT query_id, (1 << (p - 1)) AS pw,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY abs(dots[p]), p) AS rn
         |  FROM qs, UNNEST(range(1, ${np + 1})) AS u(p)),
         |pr AS (SELECT query_id, bucket AS pbucket FROM qs
         |  UNION ALL
         |  SELECT f.query_id, xor(q2.bucket, CAST(f.pw AS BIGINT))
         |  FROM m f JOIN qs q2 USING (query_id) WHERE f.rn <= 2),
         |s AS (SELECT q3.query_id, v.vec_id,
         |    CAST(list_sum(list_transform(range(1, 65), i -> v.q[i] * q3.qq[i])) AS BIGINT) AS dot
         |  FROM bb v JOIN pr ON v.bucket = pr.pbucket
         |  JOIN qs q3 ON q3.query_id = pr.query_id
         |  WHERE v.vec_id <> q3.query_id),
         |r AS (SELECT query_id, vec_id, dot,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id) AS rnk
         |  FROM s)
         |SELECT query_id, rnk, vec_id, dot FROM r WHERE rnk <= 5
         |ORDER BY query_id, rnk""".stripMargin
    },

    "q_ann_ivf" -> {
      val dot = "CAST(list_sum(list_transform(range(1, 65), i -> %s[i] * %s[i])) AS BIGINT)"
      // c = the TRAINED codebook (3 Lloyd rounds, oracleLloydCtes) — the
      // same artifact the Spark side consumes via trainedCentroids
      s"""WITH e AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
         |  FROM embeddings),
         |${oracleLloydCtes()},
         |c AS (SELECT cid, cq FROM c3),
         |ad AS (SELECT v.vec_id, c.cid, ${dot.format("v.q", "c.cq")} AS cdot FROM e v CROSS JOIN c),
         |a AS (SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cid) AS rn
         |    FROM ad) WHERE rn = 1),
         |qs AS (SELECT vec_id AS query_id, q AS qq FROM e WHERE vec_id < 5),
         |probe AS (SELECT query_id, cid FROM (
         |    SELECT qs.query_id, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY qs.query_id ORDER BY ${dot.format("qs.qq", "c.cq")} DESC, c.cid) AS rn
         |    FROM qs CROSS JOIN c) WHERE rn <= 2),
         |s AS (SELECT p.query_id, a.vec_id, ${dot.format("v.q", "qs.qq")} AS dot
         |  FROM a JOIN probe p ON a.cid = p.cid
         |  JOIN e v ON v.vec_id = a.vec_id
         |  JOIN qs ON qs.query_id = p.query_id
         |  WHERE a.vec_id <> p.query_id),
         |r AS (SELECT query_id, vec_id, dot,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id) AS rnk
         |  FROM s)
         |SELECT query_id, rnk, vec_id, dot FROM r WHERE rnk <= 10
         |ORDER BY query_id, rnk""".stripMargin
    },

    "q_ann_recall" -> {
      val dot = "CAST(list_sum(list_transform(range(1, 65), i -> %s[i] * %s[i])) AS BIGINT)"
      // the IVF chain verbatim (same trained codebook) + the brute chain
      // sharing e/qs, joined on the top-10 sets
      s"""WITH e AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
         |  FROM embeddings),
         |${oracleLloydCtes()},
         |c AS (SELECT cid, cq FROM c3),
         |ad AS (SELECT v.vec_id, c.cid, ${dot.format("v.q", "c.cq")} AS cdot FROM e v CROSS JOIN c),
         |a AS (SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cid) AS rn
         |    FROM ad) WHERE rn = 1),
         |qs AS (SELECT vec_id AS query_id, q AS qq FROM e WHERE vec_id < 5),
         |probe AS (SELECT query_id, cid FROM (
         |    SELECT qs.query_id, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY qs.query_id ORDER BY ${dot.format("qs.qq", "c.cq")} DESC, c.cid) AS rn
         |    FROM qs CROSS JOIN c) WHERE rn <= 2),
         |si AS (SELECT p.query_id, a.vec_id, ${dot.format("v.q", "qs.qq")} AS dot
         |  FROM a JOIN probe p ON a.cid = p.cid
         |  JOIN e v ON v.vec_id = a.vec_id
         |  JOIN qs ON qs.query_id = p.query_id
         |  WHERE a.vec_id <> p.query_id),
         |ivf AS (SELECT query_id, vec_id FROM (
         |    SELECT query_id, vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id) AS rnk
         |    FROM si) WHERE rnk <= 10),
         |sb AS (SELECT qs.query_id, v.vec_id, ${dot.format("v.q", "qs.qq")} AS dot
         |  FROM e v JOIN qs ON v.vec_id <> qs.query_id),
         |brute AS (SELECT query_id, vec_id FROM (
         |    SELECT query_id, vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id) AS rnk
         |    FROM sb) WHERE rnk <= 10)
         |SELECT b.query_id, COUNT(*) AS n_brute, COUNT(i.vec_id) AS n_overlap,
         |  CAST(COUNT(i.vec_id) * 1000 // COUNT(*) AS BIGINT) AS recall_milli
         |FROM brute b LEFT JOIN ivf i ON i.query_id = b.query_id AND i.vec_id = b.vec_id
         |GROUP BY b.query_id ORDER BY b.query_id""".stripMargin
    },

    "q_dedup_substr" -> {
      val gram = (0 until SubstrGram).map(o => s"ws[i+$o]").mkString(" || ' ' || ")
      s"""WITH t AS (SELECT doc_id, $wsExpr AS ws FROM documents),
         |g AS (SELECT doc_id, CASE WHEN len(ws) >= $SubstrGram THEN
         |    list_transform(range(1, len(ws) - ${SubstrGram - 2}), i -> ${h60(gram)})
         |  ELSE [] END AS grams FROM t),
         |f AS (SELECT doc_id, unnest(list_filter(grams, h -> h % $SubstrMod = 0)) AS fp FROM g)
         |SELECT fp, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occ,
         |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |FROM f GROUP BY fp HAVING COUNT(DISTINCT doc_id) >= 2 ORDER BY fp""".stripMargin
    },

    "q_train_order" ->
      s"""WITH ep AS (SELECT unnest([0, 1]) AS epoch),
         |k AS (SELECT d.doc_id, ep.epoch,
         |    ${h60("'order|' || CAST(ep.epoch AS VARCHAR) || '|' || CAST(d.doc_id AS VARCHAR)")} AS skey
         |  FROM documents d CROSS JOIN ep)
         |SELECT epoch, skey % $OrderShards AS shard, COUNT(*) AS n_docs,
         |  MIN(skey) AS min_key, MAX(skey) AS max_key,
         |  CAST(SUM(skey % 1000000007) AS BIGINT) AS key_sum,
         |  CAST(SUM(doc_id) AS BIGINT) AS sum_doc_ids
         |FROM k GROUP BY epoch, shard ORDER BY epoch, shard""".stripMargin,

    "q_ann_pq" -> {
      // squared L2 over subspace `m` (1-based dims m*8+1 .. m*8+8)
      def sq(a: String, b: String, m: String) =
        s"CAST(list_sum(list_transform(range(1, ${PqDim + 1}), " +
          s"i -> ($a[$m*$PqDim+i] - $b[$m*$PqDim+i]) * ($a[$m*$PqDim+i] - $b[$m*$PqDim+i]))) AS BIGINT)"
      s"""WITH e AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
         |  FROM embeddings),
         |c AS (SELECT vec_id AS cid, q AS cq FROM e WHERE vec_id < $PqCodes),
         |sub AS (SELECT unnest(range(0, $PqSub)) AS m),
         |ad AS (SELECT v.vec_id, sub.m, c.cid, ${sq("v.q", "c.cq", "sub.m")} AS d
         |  FROM e v CROSS JOIN sub CROSS JOIN c),
         |enc AS (SELECT vec_id, m, cid FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d, cid) AS rn
         |    FROM ad) WHERE rn = 1),
         |qs AS (SELECT vec_id AS query_id, q AS qq FROM e WHERE vec_id < 5),
         |sc AS (SELECT qs.query_id, enc.vec_id, CAST(SUM(${sq("qs.qq", "c.cq", "enc.m")}) AS BIGINT) AS adist
         |  FROM enc JOIN c ON enc.cid = c.cid CROSS JOIN qs
         |  WHERE enc.vec_id <> qs.query_id
         |  GROUP BY qs.query_id, enc.vec_id),
         |r AS (SELECT query_id, vec_id, adist,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adist, vec_id) AS rnk
         |  FROM sc)
         |SELECT query_id, rnk, vec_id, adist FROM r WHERE rnk <= 10
         |ORDER BY query_id, rnk""".stripMargin
    },

    "q_ann_ivfpq" -> {
      val dot = "CAST(list_sum(list_transform(range(1, 65), i -> %s[i] * %s[i])) AS BIGINT)"
      def sq(a: String, b: String, m: String) =
        s"CAST(list_sum(list_transform(range(1, ${PqDim + 1}), " +
          s"i -> ($a[$m*$PqDim+i] - $b[$m*$PqDim+i]) * ($a[$m*$PqDim+i] - $b[$m*$PqDim+i]))) AS BIGINT)"
      s"""WITH e AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
         |  FROM embeddings),
         |${oracleLloydCtes()},
         |c AS (SELECT cid, cq FROM c3),
         |ad AS (SELECT v.vec_id, c.cid, ${dot.format("v.q", "c.cq")} AS cdot FROM e v CROSS JOIN c),
         |a AS (SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cid) AS rn
         |    FROM ad) WHERE rn = 1),
         |res AS (SELECT e.vec_id, a.cid, list_transform(range(1, 65), i -> e.q[i] - c.cq[i]) AS r
         |  FROM e JOIN a USING (vec_id) JOIN c ON a.cid = c.cid),
         |rc AS (SELECT vec_id - 16 AS rcid, r AS rcq FROM res
         |  WHERE vec_id >= 16 AND vec_id < ${16 + PqCodes}),
         |sub AS (SELECT unnest(range(0, $PqSub)) AS m),
         |encd AS (SELECT vec_id, m, rcid FROM (
         |    SELECT res.vec_id, sub.m, rc.rcid,
         |      ROW_NUMBER() OVER (PARTITION BY res.vec_id, sub.m
         |        ORDER BY ${sq("res.r", "rc.rcq", "sub.m")}, rc.rcid) AS rn
         |    FROM res CROSS JOIN sub CROSS JOIN rc) WHERE rn = 1),
         |qs AS (SELECT vec_id AS query_id, q AS qq FROM e WHERE vec_id < 5),
         |probe AS (SELECT query_id, cid FROM (
         |    SELECT qs.query_id, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY qs.query_id ORDER BY ${dot.format("qs.qq", "c.cq")} DESC, c.cid) AS rn
         |    FROM qs CROSS JOIN c) WHERE rn <= 2),
         |qres AS (SELECT p.query_id, p.cid,
         |    list_transform(range(1, 65), i -> qs.qq[i] - c.cq[i]) AS qr
         |  FROM probe p JOIN c ON p.cid = c.cid JOIN qs ON qs.query_id = p.query_id),
         |sc AS (SELECT qres.query_id, encd.vec_id,
         |    CAST(SUM(${sq("qres.qr", "rc.rcq", "encd.m")}) AS BIGINT) AS adist
         |  FROM encd JOIN a ON encd.vec_id = a.vec_id
         |  JOIN qres ON a.cid = qres.cid
         |  JOIN rc ON encd.rcid = rc.rcid
         |  WHERE encd.vec_id <> qres.query_id
         |  GROUP BY 1, 2),
         |r AS (SELECT query_id, vec_id, adist,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adist, vec_id) AS rnk
         |  FROM sc)
         |SELECT query_id, rnk, vec_id, adist FROM r WHERE rnk <= 10
         |ORDER BY query_id, rnk""".stripMargin
    },

    "q_cluster_purity" -> {
      val dot = "CAST(list_sum(list_transform(range(1, 65), i -> %s[i] * %s[i])) AS BIGINT)"
      s"""WITH e AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
         |  FROM embeddings),
         |c AS (SELECT vec_id AS cid, q AS cq FROM e WHERE vec_id < 16),
         |ad AS (SELECT v.vec_id, c.cid, ${dot.format("v.q", "c.cq")} AS cdot FROM e v CROSS JOIN c),
         |a AS (SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cid) AS rn
         |    FROM ad) WHERE rn = 1),
         |pl AS (SELECT a.cid, d.lang, COUNT(*) AS nl
         |  FROM a JOIN documents d ON a.vec_id = d.doc_id GROUP BY 1, 2),
         |t AS (SELECT cid, CAST(SUM(nl) AS BIGINT) AS n_docs FROM pl GROUP BY 1),
         |top AS (SELECT cid, lang AS top_lang, nl AS top_n FROM (
         |    SELECT pl.*, ROW_NUMBER() OVER (PARTITION BY cid ORDER BY nl DESC, lang) AS rn
         |    FROM pl) WHERE rn = 1)
         |SELECT top.cid, n_docs, top_lang, CAST(top_n AS BIGINT) AS top_n,
         |  CAST(top_n * 1000 // n_docs AS BIGINT) AS purity_milli
         |FROM top JOIN t USING (cid) ORDER BY top.cid""".stripMargin
    },

    "q_kmeans_train" -> {
      s"""WITH e AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
         |  FROM embeddings),
         |${oracleLloydCtes()}
         |SELECT cid, dim, val FROM s3 ORDER BY cid, dim""".stripMargin
    },

    "q_text_chunk" -> {
      val (cw, st) = (ChunkWords, ChunkStride)
      s"""WITH t AS (SELECT doc_id, $wsExpr AS ws FROM documents),
         |n AS (SELECT doc_id, ws, len(ws) AS n FROM t WHERE len(ws) > 0),
         |c AS (SELECT doc_id, ws, n, CASE WHEN n <= $cw THEN 1
         |        ELSE (n - $cw + ${st - 1}) // $st + 1 END AS nchunks FROM n),
         |x AS (SELECT doc_id, ws, unnest(range(0, nchunks)) AS i FROM c),
         |y AS (SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
         |        CAST(i * $st AS BIGINT) AS chunk_start,
         |        list_slice(ws, i * $st + 1, i * $st + $cw) AS cw FROM x)
         |SELECT doc_id, chunk_idx, chunk_start,
         |  CAST(len(cw) AS BIGINT) AS chunk_len,
         |  ${h60("array_to_string(cw, ' ')")} AS chunk_hash
         |FROM y ORDER BY doc_id, chunk_idx""".stripMargin
    },

    "q_boilerplate" -> {
      val sw = SegWords
      val seg = (1 to sw).map(o => s"ws[i*$sw+$o]").mkString(" || ' ' || ")
      s"""WITH t AS (SELECT doc_id, $wsExpr AS ws FROM documents),
         |s AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
         |    CASE WHEN len(ws) >= $sw THEN
         |      list_transform(range(0, len(ws) // $sw), i -> ${h60(seg)})
         |    ELSE [] END AS segs FROM t),
         |x AS (SELECT doc_id, unnest(segs) AS h FROM s),
         |f AS (SELECT h FROM x GROUP BY h HAVING COUNT(DISTINCT doc_id) >= $BoilerDf),
         |b AS (SELECT x.doc_id, CAST(COUNT(*) AS BIGINT) AS n_boiler
         |  FROM x JOIN f ON x.h = f.h GROUP BY x.doc_id)
         |SELECT s.doc_id, s.n_words, CAST(len(s.segs) AS BIGINT) AS n_segs,
         |  COALESCE(b.n_boiler, 0) AS n_boiler,
         |  s.n_words - COALESCE(b.n_boiler, 0) * $sw AS kept_words
         |FROM s LEFT JOIN b USING (doc_id) ORDER BY s.doc_id""".stripMargin
    },

    "q_dedup_semantic" -> {
      val dot = "CAST(list_sum(list_transform(range(1, 65), i -> %s[i] * %s[i])) AS BIGINT)"
      // kk replicates semCellsFor's doubling loop (same integer division,
      // same 65536 cap) on the oracle's own COUNT(*), so the oracle stays
      // valid at ANY corpus size instead of only while k resolves to 16.
      s"""WITH RECURSIVE kk(k) AS (
         |  SELECT 16 UNION ALL
         |  SELECT k * 2 FROM kk
         |  WHERE k < 65536 AND (SELECT COUNT(*) FROM embeddings) // k > $SemCellTarget),
         |e AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
         |  FROM embeddings),
         |c AS (SELECT vec_id AS cid, q AS cq FROM e WHERE vec_id < (SELECT MAX(k) FROM kk)),
         |ad AS (SELECT v.vec_id, c.cid, ${dot.format("v.q", "c.cq")} AS cdot FROM e v CROSS JOIN c),
         |a AS (SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cid) AS rn
         |    FROM ad) WHERE rn = 1),
         |m AS (SELECT a.vec_id, a.cid, e.q FROM a JOIN e USING (vec_id)),
         |cc AS (SELECT 32 * GREATEST($SemCellTarget,
         |    (SELECT COUNT(*) FROM embeddings) // (SELECT MAX(k) FROM kk)) AS cap),
         |csz AS (SELECT cid, COUNT(*) AS n FROM m GROUP BY cid),
         |j AS (
         |  SELECT x.cid, x.vec_id AS keep, y.vec_id AS dup,
         |    ${dot.format("x.q", "y.q")} AS dot
         |  FROM m x JOIN m y ON x.cid = y.cid AND x.vec_id < y.vec_id
         |  JOIN csz ON csz.cid = x.cid WHERE csz.n <= (SELECT cap FROM cc)
         |  UNION ALL
         |  SELECT v.cid, v.mv AS keep, y.vec_id AS dup,
         |    ${dot.format("x2.q", "y.q")} AS dot
         |  FROM (SELECT m2.cid, MIN(m2.vec_id) AS mv FROM m m2
         |      JOIN csz ON csz.cid = m2.cid WHERE csz.n > (SELECT cap FROM cc)
         |      GROUP BY m2.cid) v
         |  JOIN m x2 ON x2.cid = v.cid AND x2.vec_id = v.mv
         |  JOIN m y ON y.cid = v.cid AND y.vec_id > v.mv)
         |SELECT dup AS vec_id, cid, MIN(keep) AS keeper,
         |  CAST(COUNT(*) AS BIGINT) AS n_near
         |FROM j WHERE dot >= $SemThreshold GROUP BY dup, cid
         |ORDER BY vec_id""".stripMargin
    }
  )
}
