package graft.index

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.vcf.Variant

class TribbleIdxSpec extends AnyFunSuite with SparkFixture {

  private def variants(n: Int, sorted: Boolean): Seq[Variant] =
    (0 until n).map { i =>
      val j = if (sorted) i else (i * 131) % n
      Variant("chr21", 1 + j * 200, 1 + j * 200, null, "A", Seq("T"),
        java.lang.Double.valueOf(30.0), Seq("PASS"), Map("DP" -> j.toString), Nil)
    }

  test("idx write + read round-trips; blocks cover indexed features") {
    val b = new TribbleIdxBuilder(binWidth = 1000)
    // chr1: 300 features at 1-based starts 1, 501, 1001, … each 80 bytes
    (0 until 300).foreach { i =>
      b.add("chr1", 1 + i * 500, 1 + i * 500 + 9, i * 80L, (i + 1) * 80L)
    }
    (0 until 100).foreach { i =>
      b.add("chr2", 1 + i * 300, 1 + i * 300 + 4, 24000L + i * 80L, 24000L + (i + 1) * 80L)
    }
    val idx = TribblePartData.mergeSorted(Seq(b.result()), Seq(0L)).get
    assert(idx.chrs.map(_.name) == IndexedSeq("chr1", "chr2"))
    assert(idx.chrs.head.nFeatures == 300)
    val bos = new java.io.ByteArrayOutputStream()
    TribbleIdx.write(bos, idx, "x.vcf", 32000L)
    // on-disk magic is the literal bytes "TIDX"
    assert(new String(bos.toByteArray.take(4), "ASCII") == "TIDX")
    val back = TribbleIdx.read(graft.bgzf.SeekableInput.ofBytes(bos.toByteArray))
      .asInstanceOf[TribbleIdx]
    assert(back.chrs.map(_.name) == IndexedSeq("chr1", "chr2"))
    assert(back.chrs.head.binWidth == 1000 && back.chrs.head.nFeatures == 300)
    // every feature overlapping the query must fall inside the block range
    val Seq((s0, e0)) = back.blocks("chr1", 50000, 52000)
    (0 until 300).filter(i => 1 + i * 500 <= 52000 && 1 + i * 500 + 9 >= 50000).foreach { i =>
      assert(i * 80L >= s0 && i * 80L < e0, s"feature $i offset not covered")
    }
    // and the range must exclude most of the file (it actually prunes)
    assert(e0 - s0 < 6000, s"block range too wide: $s0..$e0")
    assert(back.blocks("chrX", 1, 1000).isEmpty)
  }

  test("multi-part merge rebase: bins spanning part seams stay correct") {
    // part 1: chr1 features in bins 0..9; part 2 continues chr1 bins 9..19
    val p1 = new TribbleIdxBuilder(binWidth = 100)
    (0 until 10).foreach(i => p1.add("chr1", 1 + i * 100, 1 + i * 100, i * 50L, (i + 1) * 50L))
    val p2 = new TribbleIdxBuilder(binWidth = 100)
    (9 until 20).foreach(i => p2.add("chr1", 5 + i * 100, 5 + i * 100, (i - 9) * 50L, (i - 8) * 50L))
    val idx = TribblePartData.mergeSorted(Seq(p1.result(), p2.result()), Seq(0L, 500L)).get
    val chr = idx.chrs.head
    assert(chr.blockStarts.length == 20)
    // bins 0..9 come from part 1 unshifted, bins 10..19 from part 2 shifted
    assert(chr.blockStarts(0) == 0L && chr.blockStarts(9) == 450L)
    assert(chr.blockStarts(10) == 500L + 50L)
    assert(chr.lastEnd == 500L + 550L)
    assert(chr.nFeatures == 21)
  }

  test("unsorted parts refuse to merge") {
    val p1 = new TribbleIdxBuilder()
    p1.add("chr2", 100, 100, 0L, 50L)
    val p2 = new TribbleIdxBuilder()
    p2.add("chr1", 100, 100, 0L, 50L)
    val p3 = new TribbleIdxBuilder()
    p3.add("chr2", 100, 100, 0L, 50L) // chr2 again: interleaved runs
    assert(TribblePartData.mergeSorted(
      Seq(p1.result(), p2.result(), p3.result()), Seq(0L, 50L, 100L)).isEmpty)
    // backwards position at a part seam
    val q1 = new TribbleIdxBuilder()
    q1.add("chr1", 900, 900, 0L, 50L)
    val q2 = new TribbleIdxBuilder()
    q2.add("chr1", 100, 100, 0L, 50L)
    assert(TribblePartData.mergeSorted(Seq(q1.result(), q2.result()), Seq(0L, 50L)).isEmpty)
  }

  test("idx co-write prunes plain-text interval VCF splits, results exact") {
    import spark.implicits._
    val vs = variants(4000, sorted = true)
    val dir = Files.createTempDirectory("tidx")
    dir.toFile.deleteOnExit()
    val out = dir.resolve("sorted.vcf")
    spark.createDataset(vs).toDF()
      .repartitionByRange(4, $"start").sortWithinPartitions($"start")
      .write.format("vcf").mode("overwrite")
      .option("writeIdx", "true")
      .save(out.toString)
    assert(Files.exists(dir.resolve("sorted.vcf.idx")))

    val all = spark.read.format("vcf").option("splitSize", 4096).load(out.toString)
    val nPartsAll = all.rdd.getNumPartitions
    assert(nPartsAll > 4, s"want many partitions, got $nPartsAll")

    val iv = spark.read.format("vcf").option("splitSize", 4096)
      .option("intervals", "chr21:100000-110000").load(out.toString)
    val nPartsIv = iv.rdd.getNumPartitions
    assert(nPartsIv < nPartsAll, s"no pruning: $nPartsIv vs $nPartsAll")
    val want = vs.count(v => v.start <= 110000 && v.end >= 100000)
    assert(iv.count() == want)
    // full unpruned read still sees everything (the .idx sidecar must not
    // be mistaken for an input file)
    assert(all.count() == vs.size)
  }

  test("corrupt or unsupported .idx falls back to unpruned scan, stays exact") {
    import spark.implicits._
    val vs = variants(500, sorted = true)
    val dir = Files.createTempDirectory("tidx3")
    dir.toFile.deleteOnExit()
    val out = dir.resolve("sorted.vcf")
    spark.createDataset(vs).toDF().coalesce(1)
      .write.format("vcf").mode("overwrite").save(out.toString)
    // a TRUNCATED index (magic + type but no payload): reader must
    // Try-fail into the unpruned path, never mis-prune
    val bos = new java.io.ByteArrayOutputStream()
    val bb = java.nio.ByteBuffer.allocate(12).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(TribbleIdx.Magic); bb.putInt(TribbleIdx.TypeIntervalTree); bb.putInt(3)
    bos.write(bb.array())
    Files.write(dir.resolve("sorted.vcf.idx"), bos.toByteArray)
    val iv = spark.read.format("vcf").option("splitSize", 2048)
      .option("intervals", "chr21:50000-60000").load(out.toString)
    val want = vs.count(v => v.start <= 60000 && v.end >= 50000)
    assert(iv.count() == want)
  }

  test("interval-tree (type=2) .idx round-trips and prunes plain-text interval scans") {
    import spark.implicits._
    val vs = variants(4000, sorted = true)
    val dir = Files.createTempDirectory("tidx2")
    dir.toFile.deleteOnExit()
    val out = dir.resolve("sorted.vcf")
    spark.createDataset(vs).toDF().coalesce(1)
      .write.format("vcf").mode("overwrite").save(out.toString)
    // author the type-2 sidecar the way htsjdk's IntervalIndexCreator does:
    // runs of features collapse into [min start, max end] intervals, each
    // covering one byte block (pos + size)
    val bytes = Files.readAllBytes(out)
    val feats = scala.collection.mutable.ArrayBuffer[(Int, Long, Long)]() // (start1, offBeg, offEnd)
    var off = 0L
    new String(bytes, "UTF-8").split("\n", -1).iterator.takeWhile(_ => off < bytes.length).foreach { line =>
      val len = line.getBytes("UTF-8").length + 1
      if (line.nonEmpty && !line.startsWith("#"))
        feats += ((line.split("\t")(1).toInt, off, off + len))
      off += len
    }
    assert(feats.size == vs.size)
    val perInterval = 200
    val groups = feats.grouped(perInterval).toSeq
    val tree = TribbleTreeIdx(IndexedSeq(TribbleTreeChr("chr21",
      groups.map(_.head._1).toArray,
      groups.map(_.last._1).toArray, // SNVs: end = start
      groups.map(_.head._2).toArray,
      groups.map(g => g.last._3 - g.head._2).toArray)))
    val bos = new java.io.ByteArrayOutputStream()
    TribbleIdx.writeTree(bos, tree, "sorted.vcf", bytes.length.toLong)
    Files.write(dir.resolve("sorted.vcf.idx"), bos.toByteArray)
    // reader recovers the same structure
    TribbleIdx.read(graft.bgzf.SeekableInput.ofBytes(bos.toByteArray)) match {
      case t: TribbleTreeIdx =>
        assert(t.chrs.head.starts.length == groups.size)
        // a query inside one interval returns (only) that interval's block
        val Seq((s0, e0)) = t.blocks("chr21", 100000, 110000)
        assert(e0 - s0 < bytes.length / 4, s"block range too wide: $s0..$e0")
      case other => fail(s"expected TribbleTreeIdx, got $other")
    }
    // end to end: interval scan prunes splits and stays exact
    val all = spark.read.format("vcf").option("splitSize", 4096).load(out.toString)
    val nPartsAll = all.rdd.getNumPartitions
    val iv = spark.read.format("vcf").option("splitSize", 4096)
      .option("intervals", "chr21:100000-110000").load(out.toString)
    assert(iv.rdd.getNumPartitions < nPartsAll,
      s"type-2 index did not prune: ${iv.rdd.getNumPartitions} vs $nPartsAll")
    val want = vs.count(v => v.start <= 110000 && v.end >= 100000)
    assert(iv.count() == want)
    assert(all.count() == vs.size)
  }

  test("unsorted vcf skips .idx, interval scan stays exact") {
    import spark.implicits._
    val vs = variants(1000, sorted = false)
    val dir = Files.createTempDirectory("tidx2")
    dir.toFile.deleteOnExit()
    val out = dir.resolve("unsorted.vcf")
    spark.createDataset(vs).toDF().coalesce(1)
      .write.format("vcf").mode("overwrite")
      .option("writeIdx", "true")
      .save(out.toString)
    assert(!Files.exists(dir.resolve("unsorted.vcf.idx")))
    val iv = spark.read.format("vcf").option("splitSize", 2048)
      .option("intervals", "chr21:100000-110000").load(out.toString)
    val want = vs.count(v => v.start <= 110000 && v.end >= 100000)
    assert(iv.count() == want)
  }
}
