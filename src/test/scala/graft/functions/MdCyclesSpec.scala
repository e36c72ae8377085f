package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** graft_md_cycles: the native MD-tag mismatch-cycle walk must equal the
  * composed Catalyst form (regexp token stream + higher-order aggregate)
  * on the full MD grammar — matched runs, mismatch letters, `^`-prefixed
  * deletion runs (which consume reference but NO read positions), zero
  * runs between adjacent mismatches, and leading/trailing runs.
  */
class MdCyclesSpec extends AnyFunSuite with SparkFixture {

  private val composed =
    """aggregate(
      |  regexp_extract_all(md, '[0-9]+|\\^[A-Z]+|[A-Z]', 0),
      |  named_struct('pos', 0, 'hits', cast(array() as array<int>)),
      |  (acc, t) -> CASE
      |    WHEN t rlike '^[0-9]+$'
      |      THEN named_struct('pos', acc.pos + cast(t as int), 'hits', acc.hits)
      |    WHEN substring(t, 1, 1) = '^'
      |      THEN named_struct('pos', acc.pos, 'hits', acc.hits)
      |    ELSE named_struct('pos', acc.pos + 1,
      |      'hits', array_append(acc.hits, acc.pos)) END,
      |  acc -> acc.hits)""".stripMargin

  test("native == composed on grammar corner cases") {
    import spark.implicits._
    MdCyclesExpr.register(spark)
    val mds = Seq(
      "151",                       // perfect match: no cycles
      "0A150",                     // mismatch at cycle 0
      "7A21C9T2G33A11C5T17A9G12C8T17", // the fixture family shape
      "10A0C10",                   // adjacent mismatches (zero run between)
      "5^ACGT10A5",                // deletion consumes NO read positions
      "^AC5A0C0G1",                // leading deletion + packed tail
      "A",                         // lone mismatch, no runs
      "3AC2",                      // two letters back to back mid-string
      "100T0",                     // trailing zero run
      "12^A0T3")                   // deletion then immediate mismatch
    val df = mds.toDF("md")
      .select($"md", expr("graft_md_cycles(md)").as("native"),
        expr(composed).as("ref"))
    df.collect().foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2),
        s"MD '${r.getString(0)}': native ${r.getSeq[Int](1)} != composed ${r.getSeq[Int](2)}")
    }
    // spot-check absolute semantics, independent of both implementations
    val one = mds.toDF("md").filter($"md" === "5^ACGT10A5")
      .select(expr("graft_md_cycles(md)")).head.getSeq[Int](0)
    assert(one == Seq(15), "deletion must not advance the read cycle")
  }

  test("native == composed on randomized MD strings") {
    import spark.implicits._
    MdCyclesExpr.register(spark)
    val rnd = new scala.util.Random(20260816)
    val mds = (0 until 500).map { _ =>
      val sb = new StringBuilder
      var events = rnd.nextInt(8)
      sb.append(rnd.nextInt(30))
      while (events > 0) {
        if (rnd.nextInt(4) == 0) {
          sb.append('^')
          (0 to rnd.nextInt(3)).foreach(_ => sb.append("ACGT".charAt(rnd.nextInt(4))))
        } else sb.append("ACGT".charAt(rnd.nextInt(4)))
        sb.append(rnd.nextInt(20))
        events -= 1
      }
      sb.toString
    }
    val bad = mds.toDF("md")
      .select(expr("graft_md_cycles(md)").as("native"), expr(composed).as("ref"))
      .filter(expr("native != ref")).count()
    assert(bad == 0L)
  }
}
