package graft.index

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.bam.TestReads
import graft.vcf.Variant

/** Plan-shape regression guards: the external-index interval scans must PLAN
  * fewer partitions than an unfiltered scan of the same file (split pruning
  * via `.bai` / `.tbi`), not merely filter record-level. A refactor that
  * silently un-prunes these paths fails here even though results stay exact.
  */
class IndexPruningGuardSpec extends AnyFunSuite with SparkFixture {

  test("external .bai prunes planned partitions on interval scans") {
    import spark.implicits._
    val recs = (0 until 4000).map { i =>
      TestReads.pairs(1).head.copy(
        readName = f"r$i%06d", start = 1 + i * 250, end = 1 + i * 250 + 35)
    }
    val dir = Files.createTempDirectory("baiguard")
    dir.toFile.deleteOnExit()
    val out = dir.resolve("sorted.bam")
    // coordinate-sorted, `.bai` only — NO .sbi/.gci sidecar, so pruning can
    // only come from the standard external index
    spark.createDataset(recs).toDF().coalesce(1)
      .write.format("bam").mode("overwrite")
      .option("refs", "chr20:1000000,chr21:1000135")
      .option("writeBai", "true").save(out.toString)
    assert(Files.exists(dir.resolve("sorted.bam.bai")))
    assert(!Files.exists(dir.resolve("sorted.bam.sbi")))

    val all = spark.read.format("bam").option("splitSize", 4096).load(out.toString)
    val iv = spark.read.format("bam").option("splitSize", 4096)
      .option("intervals", "chr21:100000-110000").load(out.toString)
    val (nAll, nIv) = (all.rdd.getNumPartitions, iv.rdd.getNumPartitions)
    assert(nAll > 4, s"want many unfiltered partitions, got $nAll")
    assert(nIv < nAll, s"bai pruning lost: $nIv vs $nAll")
    val want = recs.count(r => r.start <= 110000 && r.end >= 100000)
    assert(iv.count() == want)
  }

  test("tabix .tbi prunes planned partitions on BGZF VCF interval scans") {
    import spark.implicits._
    val vs = (0 until 6000).map { i =>
      Variant("chr1", 1000 + i * 150, 1000 + i * 150, null, "A", Seq("G"),
        java.lang.Double.valueOf(30.0), Seq("PASS"), Map("DP" -> i.toString), Nil)
    }
    val dir = Files.createTempDirectory("tbiguard")
    dir.toFile.deleteOnExit()
    val out = dir.resolve("sorted.vcf.bgz")
    spark.createDataset(vs).toDF().coalesce(1).sortWithinPartitions($"start")
      .write.format("vcf").mode("overwrite")
      .option("writeTbi", "true").save(out.toString)
    assert(Files.exists(dir.resolve("sorted.vcf.bgz.tbi")))

    val all = spark.read.format("vcf").option("splitSize", 4096).load(out.toString)
    val iv = spark.read.format("vcf").option("splitSize", 4096)
      .option("intervals", "chr1:200000-220000").load(out.toString)
    val (nAll, nIv) = (all.rdd.getNumPartitions, iv.rdd.getNumPartitions)
    assert(nAll > 4, s"want many unfiltered partitions, got $nAll")
    assert(nIv < nAll, s"tbi pruning lost: $nIv vs $nAll")
    val want = vs.count(v => v.start <= 220000 && v.end >= 200000)
    assert(iv.count() == want)
  }

  test("tribble .idx prunes planned partitions on plain-text VCF interval scans") {
    import spark.implicits._
    val vs = (0 until 6000).map { i =>
      Variant("chr1", 1000 + i * 150, 1000 + i * 150, null, "A", Seq("G"),
        java.lang.Double.valueOf(30.0), Seq("PASS"), Map("DP" -> i.toString), Nil)
    }
    val dir = Files.createTempDirectory("idxguard")
    dir.toFile.deleteOnExit()
    val out = dir.resolve("sorted.vcf")
    spark.createDataset(vs).toDF().coalesce(1).sortWithinPartitions($"start")
      .write.format("vcf").mode("overwrite")
      .option("writeIdx", "true").save(out.toString)
    assert(Files.exists(dir.resolve("sorted.vcf.idx")))

    val all = spark.read.format("vcf").option("splitSize", 4096).load(out.toString)
    val iv = spark.read.format("vcf").option("splitSize", 4096)
      .option("intervals", "chr1:200000-220000").load(out.toString)
    val (nAll, nIv) = (all.rdd.getNumPartitions, iv.rdd.getNumPartitions)
    assert(nAll > 4, s"want many unfiltered partitions, got $nAll")
    assert(nIv < nAll, s"idx pruning lost: $nIv vs $nAll")
    val want = vs.count(v => v.start <= 220000 && v.end >= 200000)
    assert(iv.count() == want)
  }

  test("crai prunes planned partitions on CRAM interval scans") {
    import spark.implicits._
    val dir = Files.createTempDirectory("craiguard")
    dir.toFile.deleteOnExit()
    val out = dir.resolve("inv.cram")
    val df = spark.range(2000).select(
      org.apache.spark.sql.functions.lit(0).as("ref_seq_id"),
      (org.apache.spark.sql.functions.col("id") * 500 + 1).cast("int").as("start_pos"),
      org.apache.spark.sql.functions.lit(400).as("span"),
      org.apache.spark.sql.functions.lit(10).as("n_records"),
      org.apache.spark.sql.functions.lit(64).as("data_length"))
    df.coalesce(1).sortWithinPartitions($"start_pos")
      .write.format("cram").mode("overwrite")
      .option("writeCrai", "true").save(out.toString)
    assert(Files.exists(dir.resolve("inv.cram.crai")))

    val all = spark.read.format("cram").option("splitSize", 8192).load(out.toString)
    val iv = spark.read.format("cram").option("splitSize", 8192)
      .option("intervals", "0:100000-120000").load(out.toString)
    val (nAll, nIv) = (all.rdd.getNumPartitions, iv.rdd.getNumPartitions)
    assert(nAll > 4, s"want many unfiltered partitions, got $nAll")
    assert(nIv < nAll, s"crai pruning lost: $nIv vs $nAll")
    val want = (0 until 2000).count(k => 500 * k + 1 <= 120000 && 500 * k + 400 >= 100000)
    assert(iv.count() == want) // residual-filtered exact
  }

  test("crai prunes planned partitions on RECORD-level CRAM interval scans") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("craireccguard")
    dir.toFile.deleteOnExit()
    val out = dir.resolve("rec.cram")
    // coordinate-sorted reads, small containers so the crai has enough
    // granularity for pruning to be visible in the partition count
    val df = spark.range(8000).select(
      concat(lit("r"), col("id")).as("readName"),
      lit(0).cast("int").as("flags"),
      lit("chrZ").as("contig"),
      (col("id") * 250 + 1).cast("int").as("start"),
      (col("id") * 250 + 36).cast("int").as("end"),
      lit(60).cast("int").as("mapq"),
      lit("36M").as("cigar"),
      lit(null).cast("string").as("mateContig"),
      lit(0).cast("int").as("mateStart"),
      lit(0).cast("int").as("tlen"),
      lit("*").as("seq"),
      lit("*").as("qual"),
      lit(null).cast("map<string,string>").as("attributes"))
    df.coalesce(1).sortWithinPartitions($"start")
      .write.format("cram").mode("overwrite")
      .option("records", "true").option("refs", "chrZ:3000000")
      .option("recordsPerContainer", "200")
      .option("writeCrai", "true").save(out.toString)
    assert(Files.exists(dir.resolve("rec.cram.crai")))

    val all = spark.read.format("cram").option("records", "true")
      .option("splitSize", 8192).load(out.toString)
    val iv = spark.read.format("cram").option("records", "true")
      .option("splitSize", 8192)
      .option("intervals", "chrZ:100000-120000").load(out.toString)
    val (nAll, nIv) = (all.rdd.getNumPartitions, iv.rdd.getNumPartitions)
    assert(nAll > 4, s"want many unfiltered partitions, got $nAll")
    assert(nIv < nAll, s"records-mode crai pruning lost: $nIv vs $nAll")
    val want = (0 until 8000).count(k => 250 * k + 1 <= 120000 && 250 * k + 36 >= 100000)
    assert(iv.count() == want) // record-level residual exact
  }
}
