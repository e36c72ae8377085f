package graft.queries

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two properties the Bloom-prefiltered decontamination plan rests on:
  * no inserted key is ever rejected (false negatives impossible → the
  * confirm join sees every true hit), and the false-positive rate on fresh
  * keys stays near the ~16 bits/key design point (→ the prefilter actually
  * shrinks the join input; a filter that passes everything would silently
  * degrade the plan back to the unfiltered shuffle).
  */
class BloomFilterSpec extends AnyFunSuite with SparkFixture {

  test("every inserted key passes; fresh keys mostly fail") {
    import spark.implicits._
    val n = 5000L
    val keys = spark.range(n).select((col("id") * 2654435761L + 17).as("fp"))
    val mBits = BloomFilter.sizeFor(n)
    val bloom = BloomFilter.build(keys, "fp", mBits)

    val inserted = keys.crossJoin(broadcast(bloom))
      .filter(!BloomFilter.mightContain($"bloom", $"fp", mBits))
      .count()
    assert(inserted == 0, s"$inserted inserted keys rejected — false negatives are a contract violation")

    // fresh keys disjoint from the insert set: id1*C+17 = id2*C+18 needs
    // C*(id1-id2) ≡ 1 (mod 2^64), i.e. id1-id2 = C⁻¹ mod 2^64 — far
    // outside the [0, n) id range, so no collision is possible
    val fresh = spark.range(n).select((col("id") * 2654435761L + 18).as("fp"))
    val falsePos = fresh.crossJoin(broadcast(bloom))
      .filter(BloomFilter.mightContain($"bloom", $"fp", mBits))
      .count()
    // design point ≈ 0.3%; assert an order of magnitude of slack
    assert(falsePos < n / 20,
      s"$falsePos/$n fresh keys passed — filter too dense to prefilter anything")
  }

  test("sizeFor scales with keys and stays a multiple of 64") {
    assert(BloomFilter.sizeFor(0) == (1L << 16))
    assert(BloomFilter.sizeFor(1L << 20) >= 16L * (1L << 20))
    assert(BloomFilter.sizeFor(123456) % 64 == 0)
  }
}
