package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.functions.GraftFunctions.hash60

/** The LSH plane count must scale with corpus size (VERDICT r5 #2): with
  * the plane count fixed at 8 there are only 256 sign-bit buckets, so on a
  * corpus ~100× denser than the oracle scale nearly every bucket blows past
  * the MaxBucket cap and is DROPPED — a silent recall cliff for
  * q_dedup_embedding / q_ann_lsh. This spec builds that denser corpus
  * (50k vectors, deterministic pseudo-random directions, 500 planted
  * exact-duplicate pairs) and pins:
  *  - the derived plane count keeps every planted pair inside a bucket at
  *    or under the cap (candidate recall stays 1.0);
  *  - the fixed 8-plane bucketing drops essentially all of them;
  *  - at the oracle scale factors the derivation still resolves to 8, so
  *    the DuckDB oracles remain valid.
  */
class LshScalingSpec extends AnyFunSuite with SparkFixture {

  private val N = 50000 // 100× the sf0.01 embeddings table
  private val Pairs = 500 // vec_ids 0..999 are 500 exact-duplicate pairs

  override def beforeAll(): Unit = {
    super.beforeAll()
    graft.functions.NativeLsh.register(spark)
    graft.functions.NativeIvf.register(spark)
  }

  /** Quantized 64-dim vectors in [-1000, 1000], a pure hash of the seed id —
    * ids 2k and 2k+1 below 1000 share a seed, i.e. exact duplicates.
    */
  private def corpus(): DataFrame = {
    val seed = when(col("vec_id") < Pairs * 2, floor(col("vec_id") / 2) * 2)
      .otherwise(col("vec_id"))
    spark.range(N.toLong).select(col("id").as("vec_id"))
      .withColumn("q", transform(sequence(lit(1), lit(64)),
        i => hash60(concat(seed.cast("string"), lit("#"), i.cast("string"))) % 2001 - 1000))
  }

  test("derivation pins to 8 at the oracle scale factor") {
    assert(Pipeline.lshPlanesFor(500) == 8)  // sf0.01 — the correctness gate
    assert(Pipeline.lshPlanesFor(2048) == 8) // the edge of the pinned regime
    assert(Pipeline.lshPlanesFor(N) > 8)
    // monotone, bounded
    assert(Pipeline.lshPlanesFor(1L << 40) <= 60)
  }

  test("multi-probe recovers NEAR pairs that single-bucket probing loses at derived planes") {
    // near-duplicate (not exact) pairs: partner = same seed vector with one
    // component nudged, so a few low-margin sign bits may flip — exactly
    // the loss mode multi-probe exists to repair as planes grow with the
    // corpus. Measured on the 100×-denser corpus at the derived plane count.
    val planes = Pipeline.lshPlanesFor(N)
    val base = corpus().filter(col("vec_id") >= Pairs * 2) // drop the exact-dup block
      .limit(4000)
    val near = base.select((col("vec_id") + lit(10000000L)).as("vec_id"),
      transform(col("q"), (x, i) => when(i === 0, x + 90L).otherwise(x)).as("q"))
    val all = base.unionByName(near)
      .withColumn("bucket", Pipeline.lshBucket(planes))
      .withColumn("dots", Pipeline.planeDots(planes))
      .withColumn("probes", Pipeline.probeBucketsCol(planes))
      .select(col("vec_id"), col("bucket"), col("probes"))
      .persist()
    try {
      val a = all.filter(col("vec_id") < 10000000L)
        .select(col("vec_id").as("id"), col("bucket").as("b_a"), col("probes").as("p_a"))
      val b = all.filter(col("vec_id") >= 10000000L)
        .select((col("vec_id") - 10000000L).as("id"), col("bucket").as("b_b"))
      val joined = a.join(b, "id")
        .select(col("b_a") === col("b_b"), array_contains(col("p_a"), col("b_b")))
        .collect()
      val n = joined.length.toDouble
      val single = joined.count(_.getBoolean(0)) / n
      val multi = joined.count(_.getBoolean(1)) / n
      assert(multi > single,
        f"multi-probe recall $multi%.3f did not beat single-bucket $single%.3f")
      assert(multi >= 0.9, f"multi-probe recall collapsed: $multi%.3f (single $single%.3f)")
    } finally all.unpersist()
  }

  test("derived planes keep the 100x-denser corpus inside the bucket cap; fixed 8 planes collapse") {
    val planes = Pipeline.lshPlanesFor(N)
    val cap = Pipeline.maxBucket
    val df = corpus().persist()
    try {
      def pairSurvival(p: Int): (Long, Long) = {
        val bucketed = df.withColumn("bucket", Pipeline.lshBucket(p))
        val sizes = bucketed.groupBy("bucket").agg(count(lit(1)).as("n"))
        // a planted pair survives when its (shared) bucket is within the cap
        val survivors = bucketed.filter(col("vec_id") < Pairs * 2)
          .join(sizes, "bucket")
          .filter(col("vec_id") % 2 === 0 && col("n") <= cap)
          .count()
        val maxBucket = sizes.agg(max(col("n"))).head.getLong(0)
        (survivors, maxBucket)
      }
      // exact duplicates always share a bucket, so survival == recall here
      val (survived, maxOcc) = pairSurvival(planes)
      assert(maxOcc <= cap,
        s"derived $planes planes still leave an over-cap bucket: max occupancy $maxOcc > $cap")
      assert(survived == Pairs,
        s"recall collapsed under derived planes: $survived/$Pairs planted pairs survive")
      // the pre-fix behavior: at this density the 256 fixed buckets hold
      // ~195 vectors each — over the cap, so candidates are mass-dropped
      val (survived8, maxOcc8) = pairSurvival(8)
      assert(maxOcc8 > cap, s"expected over-cap buckets at 8 planes, max was $maxOcc8")
      assert(survived8 < Pairs / 10,
        s"fixed 8 planes unexpectedly kept $survived8/$Pairs pairs — densify the spec corpus")
    } finally df.unpersist()
  }

  test("trained IVF codebook recall@10 vs brute force >= seed-codebook recall (VERDICT r7 #4)") {
    import spark.implicits._
    // a 5k slice of the dense corpus: enough mass per cell to separate a
    // trained codebook from the raw 16-vector seed, small enough that the
    // brute-force ground truth stays cheap
    val e = corpus().filter(col("vec_id") >= Pairs * 2).limit(5000)
      .select(col("vec_id"), col("q")).persist()
    try {
      val qs = e.filter(col("vec_id") % 499 === 0).limit(10)
        .select(col("vec_id").as("query_id"), col("q").as("qq"))
      val seed = e.filter(col("vec_id") < 1016) // first 16 corpus ids (1000..1015)
        .limit(16).select(col("vec_id").as("cid"), col("q").as("cq"))
      // trainedCentroids is dataset-keyed; train on the synthetic corpus
      // through the same chain it caches
      val trained = Pipeline.lloydChain(
        e.select(col("vec_id"), col("q"))
          .withColumn("vec_id", col("vec_id") - 1000)) // seed rule: vec_id < 16
      def topIds(res: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
        res.collect().map(r => r.getLong(0) -> r.getLong(2))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val brute = topIds(
        e.crossJoin(qs).filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), lit(0).as("rnk"), col("vec_id"),
            Pipeline.qdot(col("q"), col("qq")).as("dot"))
          .withColumn("rnk", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
              .orderBy(col("dot").desc, col("vec_id"))))
          .filter(col("rnk") <= 10))
      // trained centroids were derived under shifted ids; shift back for search
      val trainedCents = trained.select(col("cid"), col("cq"))
      def recall(cents: org.apache.spark.sql.DataFrame): Double = {
        val got = topIds(Pipeline.ivfSearch(e, cents, qs))
        brute.map { case (q, want) =>
          got.getOrElse(q, Set.empty).intersect(want).size.toDouble / want.size
        }.sum / brute.size
      }
      val seedRecall = recall(seed)
      val trainedRecall = recall(trainedCents)
      assert(trainedRecall >= seedRecall,
        f"training regressed recall: trained $trainedRecall%.3f < seed $seedRecall%.3f")
    } finally e.unpersist()
  }
}
