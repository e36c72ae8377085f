package graft.sources.vcf

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Option-free FORMAT/INFO projection: the optimizer rule must derive
  * `formatFields`/`infoFields` from literal-key map lookups in the plan —
  * and must BAIL to the full decode on any shape it cannot positively
  * account for (non-literal keys, the map escaping to the output, node
  * types that could smuggle the map under fresh attribute ids). Values are
  * pinned identical between auto, explicit-option, and full-decode runs.
  */
class VcfAutoProjectionSpec extends AnyFunSuite with SparkFixture {

  private def tmp(): String = {
    val d = Files.createTempDirectory("vcfautoproj")
    d.toFile.deleteOnExit()
    d.toString
  }

  // 3-sample cohort with 3 FORMAT keys + 2 INFO keys, deterministic values
  private lazy val path: String = {
    val p = s"${tmp()}/auto.vcf"
    val lines = Seq(
      "##fileformat=VCFv4.2",
      "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tsA\tsB\tsC") ++
      (1 to 200).map { i =>
        val info = s"DP=${i % 50};CSQ=payload${i % 7}x" + ("Z" * 40) +
          (if (i % 3 == 0) ";DB" else "") // presence-only FLAG key
        val g = (0 until 3).map(j => s"${if ((i + j) % 3 == 0) "0/1" else "0/0"}:${(i * 7 + j) % 40}:${(i + j) % 99}")
        s"chr${i % 2}\t${i * 13 % 9000 + 1}\t.\tA\tG\t30\tPASS\t$info\tGT:DP:GQ\t${g.mkString("\t")}"
      }
    Files.write(java.nio.file.Paths.get(p),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    p
  }

  private def scanDesc(df: DataFrame): String =
    df.queryExecution.optimizedPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        s.scan.description()
    }.mkString("\n")

  private def read(opts: (String, String)*) = {
    var r = spark.read.format("vcf")
    opts.foreach { case (k, v) => r = r.option(k, v) }
    r.load(path)
  }

  test("literal fields lookup through explode derives formatFields automatically") {
    def q(df: DataFrame) = df
      .select(explode(col("genotypes")).as("g"))
      .groupBy(col("g.sample").as("sample"))
      .agg(sum(element_at(col("g.fields"), "DP").cast("long")).as("sdp"),
        count(when(col("g.gt") === "0/1", 1)).as("nhet"))
      .orderBy(col("sample"))
    val auto = q(read())
    assert(scanDesc(auto).contains("formatFields=[DP]"), scanDesc(auto))
    val full = q(read("autoProjection" -> "false"))
    assert(!scanDesc(full).contains("formatFields"), scanDesc(full))
    val explicit = q(read("formatFields" -> "GT,DP"))
    assert(auto.collect().toSeq == full.collect().toSeq)
    assert(auto.collect().toSeq == explicit.collect().toSeq)
  }

  test("literal info lookups (project + filter) derive infoFields; keys union") {
    val auto = read()
      .filter(element_at(col("info"), "CSQ").isNotNull)
      .select(col("contig"), element_at(col("info"), "DP").cast("long").as("dp"))
      .groupBy(col("contig")).agg(sum(col("dp")).as("sdp"), count(lit(1)).as("n"))
      .orderBy(col("contig"))
    val d = scanDesc(auto)
    assert(d.contains("infoFields=[CSQ,DP]"), d)
    val full = read("autoProjection" -> "false")
      .filter(element_at(col("info"), "CSQ").isNotNull)
      .select(col("contig"), element_at(col("info"), "DP").cast("long").as("dp"))
      .groupBy(col("contig")).agg(sum(col("dp")).as("sdp"), count(lit(1)).as("n"))
      .orderBy(col("contig"))
    assert(auto.collect().toSeq == full.collect().toSeq)
  }

  test("bail: non-literal key falls back to the full decode") {
    val df = read()
      .select(explode(col("genotypes")).as("g"))
      .select(element_at(col("g.fields"), col("g.sample")).as("v"))
    assert(!scanDesc(df).contains("formatFields"), scanDesc(df))
    assert(df.count() == 600)
  }

  test("bail: fields map escaping to the output / into map_keys") {
    val escape = read().select(explode(col("genotypes")).as("g"))
      .select(col("g.fields").as("f"), element_at(col("g.fields"), "DP").as("dp"))
    assert(!scanDesc(escape).contains("formatFields"), scanDesc(escape))
    // whole map materialized: every key present
    assert(escape.agg(min(size(col("f")))).collect()(0).getInt(0) == 2)
    val keysUse = read().select(explode(col("genotypes")).as("g"))
      .select(explode(map_keys(col("g.fields"))).as("k")).distinct()
    assert(!scanDesc(keysUse).contains("formatFields"), scanDesc(keysUse))
    assert(keysUse.collect().map(_.getString(0)).sorted.toSeq == Seq("DP", "GQ"))
  }

  test("bail: info map in the final output") {
    val df = read().select(col("info"), element_at(col("info"), "DP").as("dp"))
    assert(!scanDesc(df).contains("infoFields"), scanDesc(df))
    assert(df.agg(min(size(col("info")))).collect()(0).getInt(0) == 2)
  }

  test("union of already-extracted scalars still derives (taint never crosses)") {
    def half(c: String) = read().filter(col("contig") === c)
      .select(explode(col("genotypes")).as("g"))
      .select(col("g.sample").as("s"), element_at(col("g.fields"), "DP").as("dp"))
    val u = half("chr0").union(half("chr1"))
    assert(scanDesc(u).contains("formatFields=[DP]"), scanDesc(u))
    assert(u.count() == 600)
  }

  test("lookup above a union still derives (PushProjectionThroughUnion normalizes)") {
    // the optimizer rewrites the lookup below the Union onto each child's
    // own (tainted) attribute before/while this rule runs, so the derivation
    // is legitimate — each side decodes only DP
    def halfG(c: String) = read().filter(col("contig") === c)
      .select(explode(col("genotypes")).as("g"))
    val u = halfG("chr0").union(halfG("chr1"))
      .select(element_at(col("g.fields"), "DP").cast("long").as("dp"))
    assert(scanDesc(u).contains("formatFields=[DP]"), scanDesc(u))
    val full = halfG("chr0").union(halfG("chr1"))
      .select(element_at(col("g.fields"), "DP").cast("long").as("dp"))
      .withColumn("off", lit(1)) // shape change irrelevant; compare sums
    assert(u.agg(sum(col("dp"))).collect()(0).getLong(0) ==
      full.agg(sum(col("dp"))).collect()(0).getLong(0))
    assert(u.count() == 600)
  }

  test("bail: tainted data flowing into an unhandled node type (observe)") {
    val df = read().observe("autoproj_m", count(lit(1)).as("cnt"))
      .select(explode(col("genotypes")).as("g"))
      .select(element_at(col("g.fields"), "DP").cast("long").as("dp"))
    assert(!scanDesc(df).contains("formatFields"), scanDesc(df))
    assert(df.count() == 600)
  }

  test("map_contains_key rides the mask (flag presence exact)") {
    // map_contains_key is RuntimeReplaceable -> ArrayContains(MapKeys(info))
    // by the time the rule runs; the masked decode preserves key PRESENCE
    // for masked keys, so the containment answer is exact under the mask
    def q(df: DataFrame) = df.select(col("contig"),
        map_contains_key(col("info"), "DB").cast("long").as("has_db"),
        element_at(col("info"), "DP").cast("long").as("dp"))
      .groupBy(col("contig")).agg(sum(col("has_db")).as("n_db"), sum(col("dp")).as("sdp"))
      .orderBy(col("contig"))
    val auto = q(read())
    val d = scanDesc(auto)
    assert(d.contains("infoFields=[DB,DP]"), d)
    val full = q(read("autoProjection" -> "false"))
    assert(auto.collect().toSeq == full.collect().toSeq)
    assert(auto.agg(sum(col("n_db"))).collect()(0).getLong(0) == 200 / 3)
  }

  test("user-provided option wins over the derivation") {
    val df = read("formatFields" -> "GT,DP,GQ")
      .select(explode(col("genotypes")).as("g"))
      .select(element_at(col("g.fields"), "DP").as("dp"))
    val d = scanDesc(df)
    assert(d.contains("formatFields=[GT,DP,GQ]"), d)
  }

  test("gt-only access stays on the nested-pruning path (no derived option)") {
    val df = read().select(explode(col("genotypes")).as("g"))
      .groupBy(col("g.gt")).count()
    assert(!scanDesc(df).contains("formatFields"), scanDesc(df))
    assert(df.collect().map(_.getLong(1)).sum == 600)
  }
}
