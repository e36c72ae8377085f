package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.bam._

/** Option-free `attributes` key projection on the reads formats: the
  * AutoProjection rule must derive `attrKeys` from literal-key map lookups
  * in the plan (the same taint walk that derives formatFields/infoFields on
  * VCF) — and must BAIL to the full tag walk on any shape it cannot
  * positively account for. Values are pinned identical between auto,
  * explicit-option, and full-decode runs; on CRAM the derived mask must
  * keep exclusive unwanted tag blocks compressed.
  */
class AttrAutoProjectionSpec extends AnyFunSuite with SparkFixture {

  private val refsOpt = "chr20:1000000,chr21:2000135"

  private def tmp(): String = {
    val d = Files.createTempDirectory("attrautoproj")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def rec(name: String, attrs: Map[String, String]): AlignmentRecord =
    AlignmentRecord(name, 0, "chr20", 100, 0, 60, "4M", null, 0, 0, "ACGT", "IIII", attrs)

  private def recs(n: Int): Seq[AlignmentRecord] = (0 until n).map { i =>
    val base = Map(
      "NM" -> s"i:${i % 9}", "RG" -> s"Z:rg${i % 4}", "AS" -> s"s:${i - n / 2}",
      "XJ" -> s"Z:junk-payload-$i", "XB" -> s"B:i,$i,${i + 1}")
    rec(f"q$i%05d", if (i % 7 == 0) base - "NM" else base)
  }

  private def scanDesc(df: DataFrame): String =
    df.queryExecution.optimizedPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        s.scan.description()
    }.mkString("\n")

  private lazy val bamPath: String = {
    import spark.implicits._
    val p = s"${tmp()}/auto.bam"
    spark.createDataset(recs(400)).toDF().write.format("bam").mode("overwrite")
      .option("refs", refsOpt).save(p)
    p
  }

  private def readBam(opts: (String, String)*) = {
    var r = spark.read.format("bam")
    opts.foreach { case (k, v) => r = r.option(k, v) }
    r.load(bamPath)
  }

  private def rollup(df: DataFrame) = df
    .filter(element_at(col("attributes"), "NM").isNotNull)
    .groupBy(element_at(col("attributes"), "RG").as("rg"))
    .agg(sum(expr("cast(substring(element_at(attributes,'NM'),3,10) as bigint)")).as("snm"),
      count(lit(1)).as("n"))
    .orderBy(col("rg"))

  test("bam: literal element_at keys derive attrKeys automatically; values exact") {
    val auto = rollup(readBam())
    assert(scanDesc(auto).contains("attrKeys=[NM,RG]"), scanDesc(auto))
    val full = rollup(readBam("autoProjection" -> "false"))
    assert(!scanDesc(full).contains("attrKeys"), scanDesc(full))
    val explicit = rollup(readBam("attrKeys" -> "NM,RG"))
    assert(auto.collect().toSeq == full.collect().toSeq)
    assert(auto.collect().toSeq == explicit.collect().toSeq)
  }

  test("sam: same derivation through the text path") {
    import spark.implicits._
    val p = s"${tmp()}/auto.sam"
    spark.createDataset(recs(200)).toDF().write.format("sam").mode("overwrite")
      .option("refs", refsOpt).save(p)
    val auto = rollup(spark.read.format("sam").load(p))
    assert(scanDesc(auto).contains("attrKeys=[NM,RG]"), scanDesc(auto))
    val full = rollup(spark.read.format("sam").option("autoProjection", "false").load(p))
    assert(auto.collect().toSeq == full.collect().toSeq)
  }

  test("cram: derived mask keeps exclusive unwanted tag blocks compressed") {
    val dir = tmp()
    val out = s"$dir/auto.cram"
    val s = spark
    import s.implicits._
    s.createDataset(recs(3000)).toDF().write.format("cram").mode("overwrite")
      .option("records", "true").option("refs", refsOpt)
      .option("recordsPerContainer", "1000").save(out)
    def countInflations[T](body: => T): (T, Long) = {
      val before = graft.cram.CramRecordCodec.blocksInflated.get()
      val r = body
      (r, graft.cram.CramRecordCodec.blocksInflated.get() - before)
    }
    def read(opts: (String, String)*) = {
      var r = s.read.format("cram").option("records", "true")
      opts.foreach { case (k, v) => r = r.option(k, v) }
      r.load(out)
    }
    val auto = rollup(read())
    assert(scanDesc(auto).contains("attrKeys=[NM,RG]"), scanDesc(auto))
    val (autoRows, autoInfl) = countInflations(auto.collect().toSeq)
    val (fullRows, fullInfl) = countInflations(
      rollup(read("autoProjection" -> "false")).collect().toSeq)
    assert(autoRows == fullRows)
    assert(autoInfl < fullInfl,
      s"derived attrKeys did not skip unwanted tag blocks: auto=$autoInfl full=$fullInfl")
  }

  test("bail: attributes map escaping to the output / into map_keys") {
    val escape = readBam().select(col("attributes"),
      element_at(col("attributes"), "NM").as("nm"))
    assert(!scanDesc(escape).contains("attrKeys"), scanDesc(escape))
    // whole map materialized: junk tags still present
    assert(escape.agg(min(size(col("attributes")))).collect()(0).getInt(0) >= 4)
    val keysUse = readBam()
      .select(explode(map_keys(col("attributes"))).as("k")).distinct()
    assert(!scanDesc(keysUse).contains("attrKeys"), scanDesc(keysUse))
    assert(keysUse.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("AS", "NM", "RG", "XB", "XJ"))
  }

  test("bail: non-literal key falls back to the full decode") {
    val df = readBam()
      .select(element_at(col("attributes"), col("readName")).as("v"))
    assert(!scanDesc(df).contains("attrKeys"), scanDesc(df))
    assert(df.count() == 400)
  }

  test("bail: key outside the two-character tag grammar") {
    val df = readBam()
      .select(element_at(col("attributes"), "XYZ").as("v"),
        element_at(col("attributes"), "NM").as("nm"))
    assert(!scanDesc(df).contains("attrKeys"), scanDesc(df))
    // full decode: the 3-char key is simply absent, NM intact
    val rows = df.collect()
    assert(rows.forall(_.isNullAt(0)))
    assert(rows.count(!_.isNullAt(1)) == 400 - 400 / 7 - 1)
  }

  test("map_contains_key on attributes rides the mask") {
    def q(df: DataFrame) = df.agg(
      sum(map_contains_key(col("attributes"), "NM").cast("long")).as("n_nm"),
      count(element_at(col("attributes"), "RG")).as("n_rg"))
    val auto = q(readBam())
    assert(scanDesc(auto).contains("attrKeys=[NM,RG]"), scanDesc(auto))
    val full = q(readBam("autoProjection" -> "false"))
    assert(auto.collect().toSeq == full.collect().toSeq)
  }

  test("user-provided attrKeys wins over the derivation") {
    val df = readBam("attrKeys" -> "AS,NM,RG")
      .select(element_at(col("attributes"), "NM").as("nm"))
    assert(scanDesc(df).contains("attrKeys=[AS,NM,RG]"), scanDesc(df))
  }

  test("tagColumns composes: typed columns untainted, map mask still derived") {
    val df = readBam("tagColumns" -> "AS:int")
      .filter(col("tag_AS").isNotNull)
      .select(element_at(col("attributes"), "RG").as("rg"), col("tag_AS"))
    assert(scanDesc(df).contains("attrKeys=[RG]"), scanDesc(df))
    val full = readBam("tagColumns" -> "AS:int", "autoProjection" -> "false")
      .filter(col("tag_AS").isNotNull)
      .select(element_at(col("attributes"), "RG").as("rg"), col("tag_AS"))
    assert(df.collect().toSeq == full.collect().toSeq)
  }

  test("scalar-only access stays untouched (no derived option, no bail cost)") {
    val df = readBam().groupBy(col("contig")).count()
    assert(!scanDesc(df).contains("attrKeys"), scanDesc(df))
    assert(df.collect().map(_.getLong(1)).sum == 400)
  }
}
