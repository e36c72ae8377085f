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
}
