package graft.sources.bam

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.bam.TestReads

/** Unfiltered COUNT(*) must be answered from the indexes at planning time
  * (one partition, one row, zero data scan) — and must NOT be index-answered
  * whenever the traversal differs from what a scan would count (intervals,
  * residual filters, missing index on any file).
  */
class CountPushdownSpec extends AnyFunSuite with SparkFixture {

  private def tmpDir(): java.nio.file.Path = {
    val d = Files.createTempDirectory("countspec")
    d.toFile.deleteOnExit()
    d
  }

  private val refsOpt = "chr20:1000000,chr21:1000135"

  private def countPlan(df: org.apache.spark.sql.DataFrame): (Long, String) = {
    val agg = df.groupBy().count()
    val n = agg.head().getLong(0)
    (n, agg.queryExecution.executedPlan.toString)
  }

  test("SBI route: count() reads totalRecords, no data scan") {
    import spark.implicits._
    val recs = TestReads.mixed(700) // includes unmapped reads
    val dir = tmpDir()
    val out = dir.resolve("c.bam")
    spark.createDataset(recs).toDF().repartition(3)
      .write.format("bam").mode("overwrite")
      .option("refs", refsOpt).option("writeSbi", "true").save(out.toString)
    val df = spark.read.format("bam").option("splitSize", 4096).load(out.toString)
    val (n, plan) = countPlan(df)
    assert(n == recs.size)
    assert(plan.contains("indexCount="), s"count not index-answered:\n$plan")
    // the count scan is one partition
    assert(df.groupBy().count().rdd.getNumPartitions >= 1)
  }

  test("BAI route: pseudo-bin counts + n_no_coor answer count() exactly") {
    import spark.implicits._
    // mapped-only sorted reads (the BAI co-write path)
    val recs = TestReads.mixed(500).filter(r => r.contig != null)
    val dir = tmpDir()
    val out = dir.resolve("sorted.bam")
    spark.createDataset(recs).toDF()
      .repartitionByRange(3, $"contig", $"start").sortWithinPartitions($"contig", $"start")
      .write.format("bam").mode("overwrite")
      .option("refs", refsOpt).option("writeBai", "true").save(out.toString)
    assert(Files.exists(dir.resolve("sorted.bam.bai")))
    assert(!Files.exists(dir.resolve("sorted.bam.sbi")))
    val df = spark.read.format("bam").load(out.toString)
    val (n, plan) = countPlan(df)
    assert(n == recs.size)
    assert(plan.contains("indexCount="), s"count not index-answered:\n$plan")
  }

  test("no index, intervals, or a filter each fall back to a real scan") {
    import spark.implicits._
    val recs = TestReads.mixed(300)
    val dir = tmpDir()
    val out = dir.resolve("plain.bam")
    spark.createDataset(recs).toDF().coalesce(1)
      .write.format("bam").mode("overwrite")
      .option("refs", refsOpt).save(out.toString) // no index sidecars
    val plainDf = spark.read.format("bam").load(out.toString)
    val (n1, p1) = countPlan(plainDf)
    assert(n1 == recs.size)
    assert(!p1.contains("indexCount="), "no index present, must scan")

    // indexed file but an intervals traversal: scan count, not file count
    val idx = dir.resolve("idx.bam")
    spark.createDataset(recs).toDF().coalesce(1)
      .write.format("bam").mode("overwrite")
      .option("refs", refsOpt).option("writeSbi", "true").save(idx.toString)
    val ivDf = spark.read.format("bam")
      .option("intervals", "chr21:5000-9999").load(idx.toString)
    val (n2, p2) = countPlan(ivDf)
    assert(!p2.contains("indexCount="), "intervals traversal must not be index-answered")
    assert(n2 == recs.count(r => r.contig == "chr21" && r.start <= 9999 &&
      math.max(r.end, r.start) >= 5000))

    // a residual Catalyst filter blocks aggregate pushdown entirely
    val fDf = spark.read.format("bam").load(idx.toString).filter($"mapq" >= 0)
    val (n3, p3) = countPlan(fDf)
    assert(!p3.contains("indexCount="), "filtered count must not be index-answered")
    assert(n3 == recs.size)
  }

  test("stale .sbi (BAM rewritten in place, length changed) falls back to a scan") {
    import spark.implicits._
    val dir = tmpDir()
    val out = dir.resolve("stale.bam")
    spark.createDataset(TestReads.mixed(300)).toDF().coalesce(1)
      .write.format("bam").mode("overwrite")
      .option("refs", refsOpt).option("writeSbi", "true").save(out.toString)
    val sbiBytes = Files.readAllBytes(dir.resolve("stale.bam.sbi"))
    // rewrite the BAM in place with DIFFERENT content, no re-index: restore
    // the old .sbi on top of the new file (its fileLength no longer matches)
    val rewritten = TestReads.mixed(120)
    spark.createDataset(rewritten).toDF().coalesce(1)
      .write.format("bam").mode("overwrite")
      .option("refs", refsOpt).save(out.toString)
    Files.write(dir.resolve("stale.bam.sbi"), sbiBytes)
    val df = spark.read.format("bam").load(out.toString)
    val (n, plan) = countPlan(df)
    assert(!plan.contains("indexCount="), "stale index must not answer count()")
    assert(n == rewritten.size, "fallback scan must count the REAL file")
  }

  test("stale .bai (older than the BAM) falls back to a scan") {
    import spark.implicits._
    val recs = TestReads.mixed(200).filter(r => r.contig != null)
    val dir = tmpDir()
    val out = dir.resolve("btale.bam")
    spark.createDataset(recs).toDF()
      .repartitionByRange(2, $"contig", $"start").sortWithinPartitions($"contig", $"start")
      .write.format("bam").mode("overwrite")
      .option("refs", refsOpt).option("writeBai", "true").save(out.toString)
    // make the index OLDER than the data file (in-place rewrite scenario)
    val bai = dir.resolve("btale.bam.bai").toFile
    val bam = out.toFile
    assert(bai.setLastModified(bam.lastModified() - 60000))
    assert(bam.setLastModified(bai.lastModified() + 60000))
    val df = spark.read.format("bam").load(out.toString)
    val (n, plan) = countPlan(df)
    assert(!plan.contains("indexCount="), "outdated .bai must not answer count()")
    assert(n == recs.size)
  }

  test("sharded directory: counts sum across per-shard indexes") {
    import spark.implicits._
    val recs = TestReads.mixed(400)
    val dir = tmpDir().resolve("sharded")
    spark.createDataset(recs).toDF().repartition(4)
      .write.format("bam").mode("overwrite")
      .option("refs", refsOpt).option("writeSbi", "true").save(dir.toString)
    val df = spark.read.format("bam").load(dir.toString)
    val (n, plan) = countPlan(df)
    assert(n == recs.size)
    assert(plan.contains("indexCount="), s"sharded count not index-answered:\n$plan")
  }
}
