package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable DataFrame-level Bloom filter, built by aggregation and carried
  * as a single `array<bigint>` row — the broadcast-prefilter primitive for
  * joins whose small side is too big to broadcast as an exact hash table
  * but fits as ~16 bits/key of bitset (the standard decontamination /
  * anti-join prefilter shape at 100 TB: the corpus passes a narrow
  * membership test and only Bloom-positive rows reach the exact confirm
  * join, so the shuffle carries |hits| + ε·|corpus| rows instead of the
  * whole corpus).
  *
  * Construction is pure DataFrame aggregation — explode k bit positions
  * per key, OR per 64-bit word, assemble the dense word array in one
  * aggregated row. Bit positions come from `xxhash64(key, j)` (never
  * overflows under ANSI mode, deterministic across runs and partitionings).
  * False positives are possible (and harmless behind an exact confirm);
  * false negatives are impossible — membership of every inserted key is
  * guaranteed by construction.
  */
object BloomFilter {

  /** Hash-function count; 4 is the classic choice for ~16 bits/key. */
  val K = 4

  /** Smallest power-of-two bit count ≥ 16 × expected keys (≈ 0.3% false
    * positives at k=4), floored at 2^16 bits (8 KiB) so tiny inputs don't
    * produce degenerate filters, capped at 2^34 bits (a 2 GiB broadcast —
    * the practical single-array ceiling, good for ~10^9 keys at design
    * rate). Past the cap the false-positive rate degrades gracefully
    * rather than the build failing; a registry that large should shard
    * the filter by key prefix (one bloom per shard, the corpus probing
    * its shard's filter) — out of scope for this single-array helper.
    */
  def sizeFor(expectedKeys: Long): Long = {
    var m = 1L << 16
    while (m < 16L * expectedKeys && m < (1L << 34)) m <<= 1
    m
  }

  private def bitPos(key: Column, j: Int, mBits: Long): Column =
    pmod(xxhash64(key, lit(j)), lit(mBits))

  /** One-row DataFrame with column `bloom`: the dense `array<bigint>` of
    * mBits/64 words over the values of `keys(keyCol)`. Aggregation shape:
    * one shuffle on the word index (mBits/64 distinct keys), then a single
    * collect_list row — never a driver-side loop over the keys.
    */
  def build(keys: DataFrame, keyCol: String, mBits: Long): DataFrame = {
    require(mBits % 64 == 0 && mBits > 0, s"mBits must be a positive multiple of 64: $mBits")
    val nWords = mBits / 64
    val sparse = keys
      .select(explode(array((0 until K).map(j => bitPos(col(keyCol), j, mBits)): _*)).as("pos"))
      .select((col("pos") / 64).cast("long").as("word"),
        call_function("shiftleft", lit(1L), (col("pos") % 64).cast("int")).as("mask"))
      .groupBy(col("word")).agg(call_function("bit_or", col("mask")).as("mask"))
    // densify by joining the full word range (a map_from_arrays +
    // element_at-per-index assembly is O(words²) — Spark map lookup is a
    // linear scan, which turned quadratic at a few hundred thousand words)
    keys.sparkSession.range(nWords).toDF("word")
      .join(sparse, Seq("word"), "left")
      .agg(sort_array(collect_list(struct(col("word"),
        coalesce(col("mask"), lit(0L)).as("mask")))).as("wm"))
      .select(transform(col("wm"), s => s.getField("mask")).as("bloom"))
  }

  /** Membership test of `key` against a `bloom` column (the array produced
    * by [[build]], typically ridden along via `crossJoin(broadcast(...))`).
    * k codegen'd word-probe terms — no UDF, no shuffle.
    */
  def mightContain(bloomCol: Column, key: Column, mBits: Long): Column =
    (0 until K).map { j =>
      val bp = bitPos(key, j, mBits)
      (element_at(bloomCol, (bp / 64).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L), (bp % 64).cast("int"))) =!= 0L)
    }.reduce(_ && _)
}
