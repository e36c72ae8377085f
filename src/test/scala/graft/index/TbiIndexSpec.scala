package graft.index

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.vcf.Variant

class TbiIndexSpec extends AnyFunSuite with SparkFixture {

  private def variants(n: Int, sorted: Boolean): Seq[Variant] =
    (0 until n).map { i =>
      val j = if (sorted) i else (i * 131) % n
      Variant("chr21", 1 + j * 200, 1 + j * 200, null, "A", Seq("T"),
        java.lang.Double.valueOf(30.0), Seq("PASS"), Map("DP" -> j.toString), Nil)
    }

  test("tbi write + read round-trips; spans cover indexed records") {
    val b = new TbiBuilder
    (0 until 300).foreach { i =>
      b.add("chr1", i * 500, i * 500 + 10, (i.toLong * 777) << 16, ((i.toLong * 777) << 16) + 99)
    }
    (0 until 100).foreach { i =>
      b.add("chr2", i * 300, i * 300 + 5, ((300L * 777 + i * 200) << 16), ((300L * 777 + i * 200) << 16) + 50)
    }
    val idx = TbiPartData.mergeSorted(Seq(b.result()), Seq(0L)).get
    assert(idx.names == IndexedSeq("chr1", "chr2"))
    val bos = new java.io.ByteArrayOutputStream()
    TbiIndex.write(bos, idx)
    val back = TbiIndex.read(graft.bgzf.SeekableInput.ofBytes(bos.toByteArray))
    assert(back.names == IndexedSeq("chr1", "chr2"))
    assert(back.format == TbiIndex.FormatVcf && back.colSeq == 1 && back.colBeg == 2)
    val spans = back.spans("chr1", 50000, 52000)
    assert(spans.nonEmpty)
    (0 until 300).filter(i => i * 500 <= 52000 && i * 500 + 10 >= 50000).foreach { i =>
      val v = (i.toLong * 777) << 16
      assert(spans.exists { case (b0, e0) => v >= b0 && v < e0 }, s"voff $v not covered")
    }
    assert(back.spans("chrX", 0, 1000).isEmpty)
  }

  test("tbi co-write prunes interval VCF splits, results exact") {
    import spark.implicits._
    val vs = variants(4000, sorted = true)
    val dir = Files.createTempDirectory("tbi")
    dir.toFile.deleteOnExit()
    val out = dir.resolve("sorted.vcf.bgz")
    spark.createDataset(vs).toDF()
      .repartitionByRange(4, $"start").sortWithinPartitions($"start")
      .write.format("vcf").mode("overwrite")
      .option("writeTbi", "true")
      .save(out.toString)
    assert(Files.exists(dir.resolve("sorted.vcf.bgz.tbi")))

    val all = spark.read.format("vcf").option("splitSize", 2048).load(out.toString)
    val nPartsAll = all.rdd.getNumPartitions
    assert(nPartsAll > 4, s"want many partitions, got $nPartsAll")

    val iv = spark.read.format("vcf").option("splitSize", 2048)
      .option("intervals", "chr21:100000-110000").load(out.toString)
    val nPartsIv = iv.rdd.getNumPartitions
    assert(nPartsIv < nPartsAll, s"no pruning: $nPartsIv vs $nPartsAll")
    val want = vs.count(v => v.start <= 110000 && v.end >= 100000)
    assert(iv.count() == want)
  }

  test("unsorted vcf skips .tbi, interval scan stays exact") {
    import spark.implicits._
    val vs = variants(1000, sorted = false)
    val dir = Files.createTempDirectory("tbi2")
    dir.toFile.deleteOnExit()
    val out = dir.resolve("unsorted.vcf.bgz")
    spark.createDataset(vs).toDF().coalesce(1)
      .write.format("vcf").mode("overwrite")
      .option("writeTbi", "true")
      .save(out.toString)
    assert(!Files.exists(dir.resolve("unsorted.vcf.bgz.tbi")))
    val iv = spark.read.format("vcf").option("splitSize", 2048)
      .option("intervals", "chr21:100000-110000").load(out.toString)
    val want = vs.count(v => v.start <= 110000 && v.end >= 100000)
    assert(iv.count() == want)
  }
}
