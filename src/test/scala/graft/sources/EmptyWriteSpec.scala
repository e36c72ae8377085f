package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** Zero-record writes — the shard a filter can always produce at scale
  * (a contig partition with no reads, a date slice with no variants).
  * Every single-file sink must still emit a VALID file (header +
  * terminator, indexes consistent) that reads back as zero rows; a sink
  * that throws or emits a headerless fragment breaks any partitioned
  * pipeline whose predicate ever empties one task.
  */
class EmptyWriteSpec extends AnyFunSuite with SparkFixture {

  private val refs = "chr0:1000000,chr1:1000000,chr2:1000000"

  private def emptyReads = {
    import spark.implicits._
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").limit(5).select(
      concat(lit("r"), $"l_orderkey").as("readName"),
      lit(0).cast("int").as("flags"),
      lit("chr0").as("contig"),
      lit(100).cast("int").as("start"),
      lit(0).cast("int").as("end"),
      lit(60).cast("int").as("mapq"),
      lit("10M").as("cigar"),
      lit(null).cast("string").as("mateContig"),
      lit(0).cast("int").as("mateStart"),
      lit(0).cast("int").as("tlen"),
      lit("*").as("seq"),
      lit("*").as("qual"),
      map(lit("XO"), lit("i:1")).as("attributes"))
      .filter(lit(false))
  }

  private def emptyVariants = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").limit(5).select(
      lit("chr0").as("contig"),
      lit(100).cast("int").as("start"),
      lit(100).cast("int").as("end"),
      lit(null).cast("string").as("id"),
      lit("A").as("ref"), array(lit("G")).as("alt"),
      lit(30.0).as("qual"), array(lit("PASS")).as("filters"),
      map().cast(MapType(StringType, StringType, valueContainsNull = false)).as("info"),
      array().cast(ArrayType(graft.vcf.Variant.genotypeType, containsNull = false))
        .as("genotypes"))
      .filter(lit(false))
  }

  test("empty single-file BAM write round-trips as zero rows") {
    val p = java.nio.file.Files.createTempDirectory("emptyw").toString + "/e.bam"
    emptyReads.write.format("bam").mode("overwrite")
      .option("refs", refs).option("writeSbi", "true").save(p)
    assert(spark.read.format("bam").load(p).count() == 0L)
  }

  test("empty single-file SAM write round-trips as zero rows") {
    val p = java.nio.file.Files.createTempDirectory("emptyw").toString + "/e.sam"
    emptyReads.write.format("sam").mode("overwrite").option("refs", refs).save(p)
    assert(spark.read.format("sam").load(p).count() == 0L)
  }

  test("empty single-file CRAM write round-trips as zero rows") {
    val p = java.nio.file.Files.createTempDirectory("emptyw").toString + "/e.cram"
    emptyReads.write.format("cram").mode("overwrite")
      .option("records", "true").option("refs", refs)
      .option("writeCrai", "true").save(p)
    assert(spark.read.format("cram").option("records", "true").load(p).count() == 0L)
  }

  test("empty single-file VCF write round-trips as zero rows") {
    val p = java.nio.file.Files.createTempDirectory("emptyw").toString + "/e.vcf.bgz"
    emptyVariants.write.format("vcf").mode("overwrite").save(p)
    assert(spark.read.format("vcf").load(p).count() == 0L)
  }
}
