package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Validation stringency on the TEXT paths (SAM/VCF): the three-tier matrix
  * of [[Stringency]] — strict fails fast, lenient salvages failures confined
  * to optional columns (and warns+counts), permissive skips silently.
  */
class TextStringencySpec extends AnyFunSuite with SparkFixture {

  private def writeLines(suffix: String, lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("text-stringency")
    dir.toFile.deleteOnExit()
    val p = dir.resolve(s"f$suffix")
    Files.write(p, lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    p.toString
  }

  private val samHeader = Seq("@HD\tVN:1.6", "@SQ\tSN:chr20\tLN:1000000")
  private def samLine(name: String, start: Int, extra: String = ""): String =
    s"$name\t0\tchr20\t$start\t60\t4M\t*\t0\t0\tACGT\tIIII$extra"

  test("sam lenient: malformed optional tag salvaged, mandatory fields kept") {
    // fourth line carries a 1-char optional field — tag parse fails, the 11
    // mandatory columns don't
    val path = writeLines(".sam", samHeader ++ Seq(
      samLine("r1", 100, "\tXO:i:5"), samLine("r2", 200), samLine("r3", 300, "\tX")))
    val rows = spark.read.format("sam").option("mode", "lenient").load(path)
      .selectExpr("readName", "attributes").collect()
    assert(rows.length == 3)
    val r3 = rows.find(_.getString(0) == "r3").get
    assert(r3.getMap[String, String](1).size == 0) // salvaged minus tags
  }

  test("sam strict fails / permissive drops the whole line") {
    val path = writeLines(".sam", samHeader ++ Seq(
      samLine("r1", 100), samLine("r2", 200, "\tX")))
    intercept[org.apache.spark.SparkException] {
      spark.read.format("sam").load(path).selectExpr("attributes").collect()
    }
    val kept = spark.read.format("sam").option("mode", "permissive").load(path)
      .selectExpr("readName", "attributes").collect()
    assert(kept.map(_.getString(0)).toSeq == Seq("r1"))
  }

  private val vcfHeader = Seq("##fileformat=VCFv4.2",
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO")

  test("vcf lenient: unrecoverable line warned+skipped, rest kept") {
    // 'bogus' QUAL is inside the 8 mandatory fields — not salvageable
    val path = writeLines(".vcf", vcfHeader ++ Seq(
      "chr20\t100\t.\tA\tC\t50\tPASS\tDP=10",
      "chr20\t200\t.\tA\tC\tbogus\tPASS\tDP=11",
      "chr20\t300\t.\tA\tC\t70\tPASS\tDP=12"))
    val rows = spark.read.format("vcf").option("mode", "lenient").load(path)
      .selectExpr("start").collect()
    assert(rows.map(_.getInt(0)).toSeq.sorted == Seq(100, 300))
    intercept[org.apache.spark.SparkException] {
      spark.read.format("vcf").load(path).selectExpr("start").collect()
    }
  }
}
