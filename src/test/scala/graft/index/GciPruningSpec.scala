package graft.index

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.bam.TestReads

class GciPruningSpec extends AnyFunSuite with SparkFixture {

  test("coordinate sidecar prunes partitions for interval scans, results exact") {
    import spark.implicits._
    // coordinate-sorted reads spread over chr21 1..1,000,000
    val recs = (0 until 4000).map { i =>
      TestReads.pairs(1).head.copy(
        readName = f"r$i%06d", start = 1 + i * 250, end = 1 + i * 250 + 35)
    }
    val dir = Files.createTempDirectory("gci")
    dir.toFile.deleteOnExit()
    val out = dir.resolve("sorted.bam")
    spark.createDataset(recs).toDF().coalesce(1)
      .write.format("bam").mode("overwrite")
      .option("refs", "chr20:1000000,chr21:1000135")
      .option("writeSbi", "true").option("sbiGranularity", "50")
      .save(out.toString)
    assert(Files.exists(dir.resolve("sorted.bam.gci")))
    val gci = GciIndex.read(graft.bgzf.SeekableInput.ofFile(dir.resolve("sorted.bam.gci")))
    assert(gci.sorted)

    val all = spark.read.format("bam").option("splitSize", 2048).load(out.toString)
    val nPartsAll = all.rdd.getNumPartitions
    assert(nPartsAll > 4, s"want many partitions, got $nPartsAll")

    val iv = spark.read.format("bam").option("splitSize", 2048)
      .option("intervals", "chr21:100000-110000").load(out.toString)
    val nPartsIv = iv.rdd.getNumPartitions
    assert(nPartsIv < nPartsAll, s"no pruning: $nPartsIv vs $nPartsAll")
    val want = recs.count(r => r.start <= 110000 && r.end >= 100000)
    assert(iv.count() == want)
  }

  test("unsorted file: gci marked unsorted, no pruning, still exact") {
    import spark.implicits._
    val recs = (0 until 2000).map { i =>
      TestReads.pairs(1).head.copy(
        readName = f"r$i%06d", start = 1 + ((i * 131) % 2000) * 400,
        end = 1 + ((i * 131) % 2000) * 400 + 35)
    }
    val dir = Files.createTempDirectory("gci2")
    dir.toFile.deleteOnExit()
    val out = dir.resolve("unsorted.bam")
    spark.createDataset(recs).toDF().coalesce(1)
      .write.format("bam").mode("overwrite")
      .option("refs", "chr20:1000000,chr21:1000135")
      .option("writeSbi", "true").option("sbiGranularity", "50")
      .save(out.toString)
    val gci = GciIndex.read(graft.bgzf.SeekableInput.ofFile(dir.resolve("unsorted.bam.gci")))
    assert(!gci.sorted)
    val iv = spark.read.format("bam").option("splitSize", 2048)
      .option("intervals", "chr21:100000-110000").load(out.toString)
    val want = recs.count(r => r.start <= 110000 && r.end >= 100000)
    assert(iv.count() == want)
  }
}
