package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.bam.TestReads
import graft.vcf.{Genotype, Variant}

/** Directory inputs must agree on the metadata their rows are decoded
  * against: BAM sequence dictionaries (refIds), VCF sample lists. The
  * reference leaves mixed-header directories undefined; graft fails at
  * planning with the offending file named.
  */
class HeaderCompatSpec extends AnyFunSuite with SparkFixture {

  test("BAM directory with mismatched sequence dictionaries fails at planning") {
    import spark.implicits._
    val dir = Files.createTempDirectory("hdrcompat")
    dir.toFile.deleteOnExit()
    val out = dir.resolve("shards")
    spark.createDataset(TestReads.pairs(20)).toDF().coalesce(1)
      .write.format("bam").mode("overwrite")
      .option("refs", "chr20:1000000,chr21:2000135").save(out.toString)
    // second shard with a DIFFERENT dictionary, dropped into the same dir
    val extra = dir.resolve("extra")
    spark.createDataset(TestReads.pairs(20)).toDF().coalesce(1)
      .write.format("bam").mode("overwrite")
      .option("refs", "chr20:999999,chr21:2000135").save(extra.toString)
    val shard2 = Files.list(extra).iterator()
    while (shard2.hasNext) {
      val p = shard2.next()
      if (p.getFileName.toString.endsWith(".bam"))
        Files.copy(p, out.resolve("part-zzzzz.bam"))
    }
    val e = intercept[Exception] {
      spark.read.format("bam").load(out.toString).count()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + " | " + msgs(t.getCause)
    assert(msgs(e).contains("incompatible sequence dictionaries"), msgs(e).take(300))
  }

  test("VCF directory with mismatched sample lists fails at planning") {
    import spark.implicits._
    def vs(samples: Seq[String]) = (0 until 20).map { i =>
      Variant("chr1", 100 + i, 100 + i, null, "A", Seq("T"), null, Seq("PASS"),
        Map.empty, samples.map(s => Genotype(s, "0/1", Map.empty)))
    }
    val dir = Files.createTempDirectory("hdrcompat2")
    dir.toFile.deleteOnExit()
    val out = dir.resolve("shards")
    spark.createDataset(vs(Seq("s1", "s2"))).toDF().coalesce(1)
      .write.format("vcf").mode("overwrite").save(out.toString)
    val extra = dir.resolve("extra")
    spark.createDataset(vs(Seq("s1", "s2", "s3"))).toDF().coalesce(1)
      .write.format("vcf").mode("overwrite").save(extra.toString)
    val it = Files.list(extra).iterator()
    while (it.hasNext) {
      val p = it.next()
      if (p.getFileName.toString.endsWith(".vcf"))
        Files.copy(p, out.resolve("part-zzzzz.vcf"))
    }
    val e = intercept[Exception] {
      spark.read.format("vcf").load(out.toString).count()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + " | " + msgs(t.getCause)
    assert(msgs(e).contains("incompatible sample lists"), msgs(e).take(300))
  }
}
