package graft.sources.cram

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.bam.TestReads

/** Unfiltered COUNT(*) on CRAM must be answered from container headers at
  * planning time (each header carries its `nRecords`): one partition, one
  * row, ZERO block decode. Proven by corrupting a container's compressed
  * payload — the count still answers exactly while a real scan throws.
  */
class CramCountPushdownSpec extends AnyFunSuite with SparkFixture {

  private val refsOpt = "chr20:1000000,chr21:1000135"

  private def writeCram(n: Int, dir: java.nio.file.Path): (java.nio.file.Path, Int) = {
    import spark.implicits._
    val recs = TestReads.mixed(n)
    val out = dir.resolve("c.cram")
    spark.createDataset(recs).toDF().repartition(2)
      .write.format("cram").mode("overwrite")
      .option("records", "true").option("refs", refsOpt).save(out.toString)
    (out, recs.size)
  }

  test("count() is answered from container headers, no scan partition math") {
    val dir = Files.createTempDirectory("cramcount")
    val (out, expected) = writeCram(200, dir)
    val df = spark.read.format("cram").option("records", "true").load(out.toString)
    val agg = df.groupBy().count()
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("containerCount="), s"count not container-answered:\n$plan")
    assert(agg.head().getLong(0) == expected)
  }

  test("count() survives a corrupted container payload (zero block decode)") {
    val dir = Files.createTempDirectory("cramcount")
    val (out, expected) = writeCram(150, dir)
    // corrupt the middle of the largest data container's PAYLOAD (header
    // intact): a header walk never touches it, a record scan must fail
    val in = graft.bgzf.SeekableInput.ofFile(out)
    val cs = try graft.cram.CramContainers.containers(in) finally in.close()
    val victim = cs.filter(c => c.nRecords > 0 && c.dataLength > 64).maxBy(_.dataLength)
    val headerLen = victim.totalLength - victim.dataLength
    val bytes = Files.readAllBytes(out)
    val p = victim.offset.toInt + headerLen.toInt + victim.dataLength / 2
    bytes(p) = (bytes(p) ^ 0x5a).toByte
    bytes(p + 1) = (bytes(p + 1) ^ 0xa5).toByte
    Files.write(out, bytes)
    val df = spark.read.format("cram").option("records", "true").load(out.toString)
    assert(df.count() == expected, "header-walk count must not touch payloads")
    intercept[Exception] { // a real scan decodes the payload and fails
      df.select("readName").collect()
    }
  }

  test("intervals, filters, and lenient stringency each fall back to a scan plan") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("cramcount")
    val (out, expected) = writeCram(100, dir)
    val iv = spark.read.format("cram").option("records", "true")
      .option("intervals", "chr20:1-999999").load(out.toString)
      .groupBy().count()
    assert(!iv.queryExecution.executedPlan.toString.contains("containerCount="))
    // NB: a filter Catalyst can prove vacuous (e.g. mapq >= 0 on these
    // records) is eliminated before pushdown — use a selective one
    val fl = spark.read.format("cram").option("records", "true").load(out.toString)
      .filter(col("mapq") >= 31).groupBy().count()
    assert(!fl.queryExecution.executedPlan.toString.contains("containerCount="))
    assert(fl.head().getLong(0) < expected && fl.head().getLong(0) > 0)
    val len = spark.read.format("cram").option("records", "true")
      .option("mode", "lenient").load(out.toString).groupBy().count()
    assert(!len.queryExecution.executedPlan.toString.contains("containerCount="))
  }

  test("sharded directory: counts sum across shard container walks") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cramcount").resolve("sharded")
    val recs = TestReads.mixed(120)
    spark.createDataset(recs).toDF().repartition(3)
      .write.format("cram").mode("overwrite")
      .option("records", "true").option("refs", refsOpt).save(dir.toString)
    val agg = spark.read.format("cram").option("records", "true")
      .load(dir.toString).groupBy().count()
    assert(agg.queryExecution.executedPlan.toString.contains("containerCount="))
    assert(agg.head().getLong(0) == recs.size)
  }
}
