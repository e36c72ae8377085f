package graft.queries

import graft.SparkFixture
import graft.functions.GraftFunctions.zkey16
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The layout property q_layout_zorder's statistic stands on: after a
  * range-partitioned sort on the z-key, EVERY partition bounds BOTH
  * dimensions (the hyperrectangle that makes file-level min-max stats
  * prune multi-dimensional predicates), while the same layout sorted on a
  * single column leaves the other dimension unbounded. Measured, not
  * assumed — the spec lays out the same data both ways and compares the
  * worst per-partition span of the non-leading dimension.
  */
class ZOrderSpec extends AnyFunSuite with SparkFixture {

  test("z-ordered partitions bound both dims; single-column sort bounds one") {
    import spark.implicits._
    val n = 20000L
    val df = spark.range(n).select(
      (pmod(col("id") * 40503L, lit(65536L))).as("x"),
      (pmod(col("id") * 30011L, lit(65536L))).as("y"))

    // MEAN span per partition: a partition whose z-range straddles a
    // high-bit alignment boundary legitimately spans wide in one dim (the
    // classic z-order boundary effect), so the skipping value shows in the
    // aggregate, not the worst case
    def meanSpans(laid: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val spans = laid.withColumn("pid", spark_partition_id())
        .groupBy($"pid")
        .agg((max($"x") - min($"x")).as("xs"), (max($"y") - min($"y")).as("ys"))
        .agg(avg($"xs"), avg($"ys"))
        .head()
      (spans.getDouble(0), spans.getDouble(1))
    }

    val zOrdered = df.repartitionByRange(16, zkey16($"x", $"y"))
      .sortWithinPartitions(zkey16($"x", $"y"))
    val xSorted = df.repartitionByRange(16, $"x").sortWithinPartitions($"x")

    val (zx, zy) = meanSpans(zOrdered)
    val (_, ly) = meanSpans(xSorted)

    // ~4-bit z prefix per partition → both dims bounded near 2^14 on
    // average; the x-sort leaves y unbounded (~full 2^16 range everywhere)
    assert(zx < 65536 / 2, s"z-order mean x-span not bounded: $zx")
    assert(zy < 65536 / 2, s"z-order mean y-span not bounded: $zy")
    assert(ly > 65536 / 2, s"x-sorted layout unexpectedly bounded y: $ly")
    assert(zy * 2 < ly, s"z-order mean y-span ($zy) not better than x-sort's ($ly)")
  }

  test("zkey16 is the exact bit interleave") {
    import spark.implicits._
    // x = 0b101 (bits at 0,2 → z bits 0,4 = 17), y = 0b11 (bits 0,1 →
    // z bits 1,3 = 10) → z = 27
    val row = Seq((5L, 3L)).toDF("x", "y")
      .select(zkey16($"x", $"y").as("z")).head()
    assert(row.getLong(0) == 27L)
    // full-range corner: x = y = 65535 → z = 2^32 - 1
    val corner = Seq((65535L, 65535L)).toDF("x", "y")
      .select(zkey16($"x", $"y").as("z")).head()
    assert(corner.getLong(0) == (1L << 32) - 1)
  }
}
