package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** `compressionLevel` sink option (htsjdk/samtools writer parity): BGZF
  * deflate level 1..9 for BAM and compressed VCF. Pipeline-intermediate
  * files take level 1 (fast); archival output takes the default. Content
  * must be identical at every level — only the byte size may differ.
  */
class CompressionLevelSpec extends AnyFunSuite with SparkFixture {

  private val refs = "chr0:1000000,chr1:1000000,chr2:1000000"

  private def reads = {
    import spark.implicits._
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").limit(500).select(
      concat(lit("r"), monotonically_increasing_id()).as("readName"),
      lit(0).cast("int").as("flags"),
      lit("chr0").as("contig"),
      (pmod($"l_orderkey" * 37 + $"l_linenumber", lit(900000)) + 1).cast("int").as("start"),
      (pmod($"l_orderkey" * 37 + $"l_linenumber", lit(900000)) + 10).cast("int").as("end"),
      lit(60).cast("int").as("mapq"),
      lit("10M").as("cigar"),
      lit(null).cast("string").as("mateContig"),
      lit(0).cast("int").as("mateStart"),
      lit(0).cast("int").as("tlen"),
      lit("ACGTACGTAC").as("seq"),
      lit("FFFFFFFFFF").as("qual"),
      map(lit("XO"), lit("i:1")).as("attributes"))
  }

  private def variants = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").limit(500).select(
      lit("chr0").as("contig"),
      (pmod($"l_orderkey" * 37 + $"l_linenumber", lit(900000)) + 1).cast("int").as("start"),
      (pmod($"l_orderkey" * 37 + $"l_linenumber", lit(900000)) + 1).cast("int").as("end"),
      lit(null).cast("string").as("id"),
      lit("A").as("ref"), array(lit("G")).as("alt"),
      lit(30.0).as("qual"), array(lit("PASS")).as("filters"),
      map().cast(MapType(StringType, StringType, valueContainsNull = false)).as("info"),
      array().cast(ArrayType(graft.vcf.Variant.genotypeType, containsNull = false))
        .as("genotypes"))
  }

  test("BAM level-1 write round-trips identically to default-level write") {
    val dir = java.nio.file.Files.createTempDirectory("clvl").toString
    val p1 = dir + "/l1.bam"; val pd = dir + "/ld.bam"
    reads.write.format("bam").mode("overwrite").option("refs", refs)
      .option("compressionLevel", "1").save(p1)
    reads.write.format("bam").mode("overwrite").option("refs", refs).save(pd)
    val a = spark.read.format("bam").load(p1).orderBy("readName")
      .collect().map(_.toString).toSeq
    val b = spark.read.format("bam").load(pd).orderBy("readName")
      .collect().map(_.toString).toSeq
    assert(a == b && a.size == 500)
    val s1 = new java.io.File(p1).length; val sd = new java.io.File(pd).length
    assert(s1 >= sd, s"level 1 ($s1 B) should not out-compress default ($sd B)")
  }

  test("VCF .bgz level-1 write round-trips identically to default-level write") {
    val dir = java.nio.file.Files.createTempDirectory("clvl").toString
    val p1 = dir + "/l1.vcf.bgz"; val pd = dir + "/ld.vcf.bgz"
    variants.write.format("vcf").mode("overwrite").option("compressionLevel", "1").save(p1)
    variants.write.format("vcf").mode("overwrite").save(pd)
    val a = spark.read.format("vcf").load(p1).orderBy("start").collect().map(_.toString).toSeq
    val b = spark.read.format("vcf").load(pd).orderBy("start").collect().map(_.toString).toSeq
    assert(a == b && a.size == 500)
  }

  test("out-of-range compressionLevel is rejected") {
    val dir = java.nio.file.Files.createTempDirectory("clvl").toString
    val e = intercept[Exception] {
      reads.write.format("bam").mode("overwrite").option("refs", refs)
        .option("compressionLevel", "12").save(dir + "/bad.bam")
    }
    assert(e.getMessage != null)
  }
}
