package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Whole-roster plan hygiene: NO oracled query may plan a cartesian
  * product — the one join shape that is always a scale defect at 100 TB
  * (broadcast-scalar sides legitimately plan BroadcastNestedLoopJoin and
  * are allowed; an unbroadcast cartesian is not). Runs the PLAN, not the
  * data: building each DataFrame pays only the eager sink writes at
  * sf0.001.
  */
class PlanHygieneSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  test("no query in the registry plans a CartesianProduct") {
    val offenders = Registry.queries.keys.toSeq.sorted.flatMap { name =>
      val plan = Registry.queries(name)(spark, sf).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: ${offenders.mkString(", ")}")
  }

  /** An unpartitioned window sorts its WHOLE input in one task — a scale
    * defect whenever the input grows with the data. The allowlist names the
    * sites whose input size is proven constant at the site itself (each
    * carries a comment stating the bound):
    *   - q_bam_sort: per-task boundary rollup — #partitions rows
    *     (FormatQueries, "boundary check" window over pid)
    *   - q_bpe_merge: adjacent-symbol-pair space ≤ alphabet² (Pipeline)
    *   - q_daily_moving_revenue: calendar-day-sized input (Relational)
    *   - q_top_supplier: supplier-dimension-sized aggregate (Relational)
    * Everything else must partition its windows (or avoid them — e.g.
    * q_vocab_coverage_curve uses orderBy().limit(k) = TakeOrderedAndProject,
    * a parallel partial top-k, instead of ranking the whole vocabulary).
    */
  test("no unpartitioned window over corpus-sized input") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow, WindowGroupLimit => LWgl}
    val bounded = Set("q_bam_sort", "q_bpe_merge", "q_daily_moving_revenue", "q_top_supplier")
    val offenders = Registry.queries.keys.toSeq.sorted.filterNot(bounded).flatMap { name =>
      val lp = Registry.queries(name)(spark, sf).queryExecution.optimizedPlan
      val bad = lp.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w.simpleString(80)
        case w: LWgl if w.partitionSpec.isEmpty => w.simpleString(80)
      }
      if (bad.nonEmpty) Some(s"$name: ${bad.mkString("; ")}") else None
    }
    assert(offenders.isEmpty, s"unpartitioned windows in:\n${offenders.mkString("\n")}")
  }
}
