package graft.sources

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.bam.TestReads

/** File-level truncation behavior of the binary scan paths: a transfer cut
  * mid-BGZF-block must fail LOUDLY (silent record loss is the worst
  * failure mode a 100 TB ingest can have), while a file missing only the
  * 28-byte EOF terminator — htsjdk's "older tool wrote this" case — still
  * yields every record.
  */
class TruncationSpec extends AnyFunSuite with SparkFixture {

  private def tmpDir(): Path = {
    val d = Files.createTempDirectory("trunc")
    d.toFile.deleteOnExit()
    d
  }

  private val refsOpt = "chr20:1000000,chr21:2000135"

  private def writeBam(dir: Path): (Path, Long) = {
    val s = spark
    import s.implicits._
    val out = dir.resolve("full.bam")
    spark.createDataset(TestReads.mixed(300)).toDF()
      .write.format("bam").mode("overwrite").option("refs", refsOpt).save(out.toString)
    (out, spark.read.format("bam").load(out.toString).count())
  }

  test("a BAM cut mid-BGZF-block fails loudly, never silently short") {
    val dir = tmpDir()
    val (full, n) = writeBam(dir)
    assert(n == 602)
    val bytes = Files.readAllBytes(full)
    // strip the EOF terminator and then cut into the last data block
    val cut = dir.resolve("cut.bam")
    Files.write(cut, java.util.Arrays.copyOf(bytes, bytes.length - 28 - 11))
    val thrown = intercept[Exception] {
      spark.read.format("bam").load(cut.toString).count()
    }
    val msg = Option(thrown.getMessage).getOrElse("") +
      Option(thrown.getCause).map(_.toString).getOrElse("")
    assert(msg.nonEmpty, "truncation produced an empty-messaged failure")
  }

  test("a BAM missing only the EOF terminator still yields every record") {
    val dir = tmpDir()
    val (full, n) = writeBam(dir)
    val bytes = Files.readAllBytes(full)
    val noEof = dir.resolve("noeof.bam")
    Files.write(noEof, java.util.Arrays.copyOf(bytes, bytes.length - 28))
    val got = spark.read.format("bam").load(noEof.toString).count()
    assert(got == n, s"missing EOF marker changed the record count: $got vs $n")
  }
}
