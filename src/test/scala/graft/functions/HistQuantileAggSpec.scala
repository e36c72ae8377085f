package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Pins the native exact-quantile aggregate: the lower-weighted-median
  * rule (cw·1000 ≥ p·W), partial-buffer MERGE across many partitions
  * (serialize → shuffle → merge is the production path at any real
  * parallelism), null/zero-weight skipping, and the loud bounded-domain
  * ceiling.
  */
class HistQuantileAggSpec extends AnyFunSuite with SparkFixture {

  private def registered = { HistQuantileAgg.register(spark); spark }

  test("median and p90 over a known multiset, merged across 8 partitions") {
    val s = registered
    import s.implicits._
    // values 1..100 once each: p500 → 50, p900 → 90, p1000 → 100, p10 → 1
    val df = (1 to 100).map(_.toLong).toDF("v").repartition(8)
    val got = df.agg(
      expr("graft_hist_quantile(v, 1, 500)"),
      expr("graft_hist_quantile(v, 1, 900)"),
      expr("graft_hist_quantile(v, 1, 1000)"),
      expr("graft_hist_quantile(v, 1, 10)")).collect().head
    assert(got.toSeq == Seq(50L, 90L, 100L, 1L))
  }

  test("weights shift the median; ties take the smallest qualifying value") {
    val s = registered
    import s.implicits._
    // v=1 w=1, v=2 w=1, v=10 w=8 → W=10, cw(2)=2 < 5, cw(10)=10 → median 10
    val df = Seq((1L, 1L), (2L, 1L), (10L, 8L)).toDF("v", "w")
    assert(df.agg(expr("graft_hist_quantile(v, w, 500)")).collect().head.getLong(0) == 10L)
    // exactly half the mass at v=3: 2·cw(3) = W → 3 qualifies (lower median)
    val even = Seq((3L, 5L), (9L, 5L)).toDF("v", "w")
    assert(even.agg(expr("graft_hist_quantile(v, w, 500)")).collect().head.getLong(0) == 3L)
  }

  test("null values, null weights and non-positive weights are skipped; empty → NULL") {
    val s = registered
    import s.implicits._
    val df = Seq[(Option[Long], Option[Long])](
      (Some(1L), Some(0L)), (Some(2L), None), (None, Some(5L)), (Some(7L), Some(1L)))
      .toDF("v", "w")
    assert(df.agg(expr("graft_hist_quantile(v, w, 500)")).collect().head.getLong(0) == 7L)
    val empty = df.filter($"v" === 999L)
    assert(empty.agg(expr("graft_hist_quantile(v, w, 500)")).collect().head.isNullAt(0))
  }

  test("grouped medians agree with a cumulative-window reference") {
    val s = registered
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 5000).map(_ => (rnd.nextInt(4).toLong, rnd.nextInt(40).toLong, 1L + rnd.nextInt(9)))
    val df = rows.toDF("g", "v", "w").repartition(16)
    val got = df.groupBy($"g").agg(expr("graft_hist_quantile(v, w, 500)").as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      val hist = rs.groupBy(_._2).map { case (v, xs) => v -> xs.map(_._3).sum }.toSeq.sortBy(_._1)
      val total = hist.map(_._2).sum
      var cw = 0L
      g -> hist.collectFirst { case (v, w) if { cw += w; cw * 2 >= total } => v }.get
    }
    assert(got == want)
  }

  test("FuseHistQuantiles: same-(value,weight) quantiles share ONE buffer, same results") {
    val s = registered
    import s.implicits._
    val df = (1 to 100).map(_.toLong).toDF("v").repartition(4)
    val agg = df.agg(
      expr("graft_hist_quantile(v, 1, 500)").as("p50"),
      expr("graft_hist_quantile(v, 1, 900)").as("p90"),
      expr("graft_hist_quantile(v, 1, 10)").as("p10"))
    assert(agg.collect().head.toSeq == Seq(50L, 90L, 1L))
    val plan = agg.queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_hist_quantiles"), s"fusion did not fire\n$plan")
    // the singular form must be gone: one shared buffer computes all three
    assert(!plan.contains("graft_hist_quantile("), s"unfused buffer survived\n$plan")
  }

  test("FuseHistQuantiles: different weights do NOT fuse, results stay correct") {
    val s = registered
    import s.implicits._
    val df = Seq((1L, 1L), (2L, 1L), (10L, 8L)).toDF("v", "w")
    val agg = df.agg(
      expr("graft_hist_quantile(v, 1, 500)").as("plain"),
      expr("graft_hist_quantile(v, w, 500)").as("weighted"))
    assert(agg.collect().head.toSeq == Seq(2L, 10L))
    val plan = agg.queryExecution.optimizedPlan.toString
    assert(!plan.contains("graft_hist_quantiles"), s"cross-weight fusion fired\n$plan")
  }

  test("FuseHistQuantiles: grouped fusion preserves per-group values") {
    val s = registered
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (1 to 3000).map(_ => (rnd.nextInt(3).toLong, rnd.nextInt(50).toLong))
    val df = rows.toDF("g", "v").repartition(8)
    val fused = df.groupBy($"g").agg(
      expr("graft_hist_quantile(v, 1, 500)").as("p50"),
      expr("graft_hist_quantile(v, 1, 900)").as("p90"))
    assert(fused.queryExecution.optimizedPlan.toString.contains("graft_hist_quantiles"))
    val got = fused.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      val sorted = rs.map(_._2).sorted
      def q(p: Int) = {
        val n = sorted.size.toLong
        sorted.zipWithIndex.collectFirst {
          case (v, i) if (i + 1).toLong * 1000 >= p * n => v
        }.get
      }
      (g, q(500), q(900))
    }.toSet
    assert(got == want)
  }

  test("domain ceiling throws loudly instead of growing unbounded") {
    val s = registered
    import s.implicits._
    val wide = spark.range(0, (HistQuantileAgg.MaxBins + 8).toLong, 1, 1).toDF("v")
    val ex = intercept[org.apache.spark.SparkException] {
      wide.agg(expr("graft_hist_quantile(v, 1, 500)")).collect()
    }
    assert(ex.getMessage.contains("graft_hist_quantile") ||
      Option(ex.getCause).exists(_.getMessage.contains("bounded")))
  }
}
