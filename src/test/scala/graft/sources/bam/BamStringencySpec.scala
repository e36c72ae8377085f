package graft.sources.bam

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.bam.{BamCodec, TestReads}
import graft.bgzf.BgzfOutputStream

/** Validation stringency on the BINARY path: a record whose framing is sane
  * but whose payload is undecodable (here: cigar op 15) is skipped+counted
  * under mode=permissive and fails loudly with file/voff context by default
  * (reference plumbing HtsjdkReadsRddStorage.java:97-100).
  */
class BamStringencySpec extends AnyFunSuite with SparkFixture {

  /** A BAM with `n` records where record `corruptAt` has an invalid cigar op. */
  private def corruptBam(n: Int, corruptAt: Int): java.nio.file.Path = {
    val recs = TestReads.pairs(n / 2 + 1).take(n)
    val dir = Files.createTempDirectory("stringency")
    dir.toFile.deleteOnExit()
    val path = dir.resolve("corrupt.bam")
    val out = new BgzfOutputStream(Files.newOutputStream(path))
    BamCodec.writeHeader(out, TestReads.header)
    recs.zipWithIndex.foreach { case (r, i) =>
      val bytes = BamCodec.encodeRecord(r, TestReads.header)
      if (i == corruptAt) {
        // l_read_name := 255 — name read overruns the record buffer however
        // few columns the scan decodes; framing (block_size) untouched
        bytes(4 + 8) = 0xff.toByte
      }
      out.write(bytes)
    }
    out.close()
    path
  }

  test("default stringency: undecodable record fails with voff context") {
    val path = corruptBam(40, corruptAt = 17)
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("bam").load(path.toString).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val all = messages(e).mkString(" | ")
    assert(all.contains("undecodable BAM record at voff"), all.take(500))
  }

  test("permissive: corrupt record skipped, every other record read") {
    val path = corruptBam(40, corruptAt = 17)
    val got = spark.read.format("bam").option("mode", "permissive")
      .load(path.toString).count()
    assert(got == 39)
  }

  test("permissive composes with split reading") {
    val path = corruptBam(400, corruptAt = 123)
    val got = spark.read.format("bam")
      .option("mode", "permissive").option("splitSize", 4096)
      .load(path.toString).count()
    assert(got == 399)
  }
}
