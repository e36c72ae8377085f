package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Over-cap LSH buckets emit STAR edges instead of being dropped (VERDICT
  * r7 #1): a content-degenerate family — hundreds of near-identical
  * boilerplate docs sharing a band hash — lands in ONE bucket regardless of
  * plane/band derivation, and the old `size <= MaxBucket` filter silently
  * discarded it, so precisely the densest (highest-value) duplicate
  * families escaped near-dedup. This spec plants such a family and pins:
  *  - the family resolves to ONE connected component (every member
  *    reachable from the bucket minimum via star edges);
  *  - the candidate edge count stays O(n) for the over-cap bucket — no
  *    quadratic pair explosion (the skew-bomb MaxBucket exists to prevent);
  *  - unrelated docs are not absorbed into the family's cluster.
  */
class StarEdgeSpec extends AnyFunSuite with SparkFixture {

  private val Family = 500
  // ~200 shared words: an appended variant word adds ONE new trigram
  // shingle, so each minhash row keeps its min with probability ~199/200
  // and a variant shares ≥1 of the 4 bands with the identical core
  // essentially always (all-four-flipped ≈ (1 - 0.995^4)^4 ≈ 1.6e-7)
  private val base = (0 until 200).map(j => s"boilerplate${j % 50}word$j").mkString(" ")

  /** 440 bit-identical members + 60 one-word-appended variants (near-
    * identical, not exact) + 40 unrelated distinct docs. doc_ids: family =
    * 0..499, unrelated = 1000..1039.
    */
  private def docs() = {
    import spark.implicits._
    val family = (0 until Family).map { i =>
      val text = if (i < 440) base else s"$base uniquesuffix$i"
      (i.toLong, text)
    }
    val unrelated = (0 until 40).map { i =>
      // pairwise-distinct word streams — no shared shingles with the family
      (1000L + i, (0 until 30).map(j => s"w${i}x$j").mkString(" "))
    }
    (family ++ unrelated).toDF("doc_id", "text")
  }

  test("a 500-member near-identical family resolves to ONE cluster via star edges") {
    import spark.implicits._
    val sigs = Pipeline.signedDocs(docs()).select($"doc_id", $"sig")
    val pairs = Pipeline.lshCandidatePairs(sigs).cache()
    try {
      val nPairs = pairs.count()
      // O(n) edges: the 440 identical docs occupy one over-cap bucket per
      // band whose star pairs dedup to (n-1); variants add at most a few
      // in-cap buckets. Assert linear head-room, nowhere near the ~125k
      // pairs a quadratic expansion of a 500-member family would produce.
      assert(nPairs >= Family - 1, s"family under-connected: $nPairs pairs")
      assert(nPairs < 8L * Family, s"pair explosion: $nPairs pairs")
      val labels = Pipeline.resolveClusters(
        pairs.select($"doc_a".as("src"), $"doc_b".as("dst")))
      val clusters = labels.groupBy($"lbl").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // the whole family — identical core AND appended-word variants — in
      // one component labeled by its minimum
      assert(clusters.get(0L).contains(Family.toLong),
        s"family did not resolve to one 500-member cluster: $clusters")
      // unrelated docs share no shingles, so they never pair and never
      // appear in any component
      val labeled = labels.select($"id").as[Long].collect().toSet
      assert(labeled.forall(_ < Family), "unrelated docs absorbed into the family")
    } finally pairs.unpersist()
  }

  test("SemDeDup over-cap cells star-pair against the cell minimum") {
    import spark.implicits._
    // two cells: cell 0 holds 6 members (over a cap of 3 → star), cell 1
    // holds 3 (within cap → all pairs). Identical q vectors per cell so
    // every pair scores the same positive dot.
    val q0 = Seq.fill(64)(10L)
    val q1 = Seq.fill(64)(7L)
    val assigned = ((0 until 6).map(i => (i.toLong, 0, q0)) ++
      (10 until 13).map(i => (i.toLong, 1, q1)))
      .toDF("vec_id", "cid", "q")
    val pairs = Pipeline.semCellPairs(assigned, cellCap = 3L)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val star = (1 until 6).map(i => (0, 0L, i.toLong)).toSet // cell 0: min=0 vs each
    val full = Set((1, 10L, 11L), (1, 10L, 12L), (1, 11L, 12L)) // cell 1: all pairs
    assert(pairs == star ++ full, s"got $pairs")
  }

  test("the all-identical core alone yields exactly n-1 star pairs") {
    import spark.implicits._
    val core = (0 until 100).map(i => (i.toLong, base))
    val sigs = Pipeline.signedDocs(core.toDF("doc_id", "text"))
      .select($"doc_id", $"sig")
    val pairs = Pipeline.lshCandidatePairs(sigs).collect()
    // identical sigs → every band's bucket holds all 100 members (over
    // MaxBucket=64) → star pairs (0, j) per band, deduped across bands
    assert(pairs.length == 99, s"expected 99 star pairs, got ${pairs.length}")
    assert(pairs.forall(r => r.getLong(0) == 0L), "star center is not the bucket minimum")
  }
}
