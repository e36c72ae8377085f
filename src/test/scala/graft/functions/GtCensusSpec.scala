package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** graft_gt_census must be bit-identical to the interpreted
  * `size(filter(genotypes, gt === lit))` triple it replaced in the popgen
  * family, including nulls/missing genotypes, and measurably faster on a
  * wide (256-sample) cohort — the interpreted-lambda tax multiplies by
  * genotype-array length, so the gap only shows at real cohort widths.
  */
class GtCensusSpec extends AnyFunSuite with SparkFixture {

  private def cohort(nSamples: Int, nSites: Int, withNulls: Boolean) = {
    import spark.implicits._
    val base = spark.range(nSites.toLong).toDF("site")
    val genos = (0 until nSamples).map { j =>
      val code = (col("site") * 31 + lit(j) * 17 + lit(j * j)) % lit(4)
      val gt = when(code === 0, "0/0").when(code === 1, "0/1")
        .when(code === 2, "1/1")
        .otherwise(if (withNulls) lit(null).cast("string") else lit("./."))
      struct(lit(f"s$j%03d").as("sample"), gt.as("gt"),
        map(lit("k"), lit("v")).as("fields"))
    }
    base.select(col("site"), array(genos: _*).as("genotypes"))
  }

  private def interpretedCounts(df: org.apache.spark.sql.DataFrame) = {
    def nGt(g: String) =
      size(filter(col("genotypes"), x => x.getField("gt") === g)).cast("long")
    df.select(col("site"), nGt("0/0").as("a"), nGt("0/1").as("b"),
      nGt("1/1").as("c"))
  }

  private def nativeCounts(df: org.apache.spark.sql.DataFrame) = {
    GtCensusExpr.register(spark)
    df.select(col("site"), expr("graft_gt_census(genotypes)").as("cen"))
      .select(col("site"), col("cen").getItem(0).as("a"),
        col("cen").getItem(1).as("b"), col("cen").getItem(2).as("c"))
  }

  test("census equals the interpreted filter triple, incl. missing/null gt") {
    for (withNulls <- Seq(false, true)) {
      val df = cohort(nSamples = 13, nSites = 500, withNulls = withNulls).cache()
      val nat = nativeCounts(df).collect().sortBy(_.getLong(0))
      val int = interpretedCounts(df).collect().sortBy(_.getLong(0))
      assert(nat.length == int.length)
      nat.zip(int).foreach { case (n, i) =>
        assert(n == i, s"mismatch at site ${n.getLong(0)} withNulls=$withNulls")
      }
      df.unpersist()
    }
  }

  test("null genotype array and empty array yield null / zero counts") {
    import spark.implicits._
    GtCensusExpr.register(spark)
    val schema = org.apache.spark.sql.types.StructType(
      cohort(2, 1, withNulls = false).schema.fields.map(_.copy(nullable = true)))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(0L, null),
      org.apache.spark.sql.Row(1L, Seq.empty[org.apache.spark.sql.Row]))
    val df = spark.createDataFrame(rows, schema)
    val got = df.select(expr("graft_gt_census(genotypes)").as("cen"))
      .collect().map(r => Option(r.get(0)))
    assert(got(0).isEmpty) // null array → null census (nullSafeEval)
    assert(got(1).contains(Seq(0L, 0L, 0L)))
  }

  test("256-sample cohort: native census beats interpreted lambdas >= 2x") {
    val df = cohort(nSamples = 256, nSites = 60000, withNulls = false)
      .cache()
    df.count() // materialize the cache so both passes read identical input

    def time(f: => Long): (Long, Long) = {
      val t0 = System.nanoTime()
      val v = f
      (v, (System.nanoTime() - t0) / 1000000L)
    }
    def total(d: org.apache.spark.sql.DataFrame): Long =
      d.agg(sum(col("a") + col("b") + col("c"))).head().getLong(0)

    // warm both paths (codegen compile, cache touch)
    total(nativeCounts(df)); total(interpretedCounts(df))

    val runs = (1 to 3).map { _ =>
      val (nv, nt) = time(total(nativeCounts(df)))
      val (iv, it) = time(total(interpretedCounts(df)))
      assert(nv == iv, "native and interpreted totals must agree")
      (nt, it)
    }
    val natMed = runs.map(_._1).sorted.apply(1)
    val intMed = runs.map(_._2).sorted.apply(1)
    info(s"native ${natMed}ms vs interpreted ${intMed}ms " +
      f"(${intMed.toDouble / natMed.max(1)}%.1fx)")
    assert(intMed >= 2 * natMed,
      s"expected >=2x speedup, got native=${natMed}ms interpreted=${intMed}ms")
    df.unpersist()
  }
}
