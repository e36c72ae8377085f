package graft.cram

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.bam.{AlignmentRecord, SamHeader}

/** End-to-end shared-block CRAM through the DSv2 scan: the consumed-block
  * fixpoint closure is proven at codec level (CramProjectionSpec drives
  * decodeSlice on a hand-built CompHeader); this spec proves it through a
  * whole FILE — written with the writer's foreign-layout fixture knob
  * (`shareTagCids`), which interleaves one tag series' (len,val) bytes into
  * another tag's external block, a shape the CRAM spec permits but htsjdk
  * and our production writes never emit. Read back via
  * `spark.read.format("cram")`: (a) values are exact under every key mask,
  * (b) inflation counts match the closure's prediction — a mask wanting one
  * of the two sharing tags consumes the shared block (its partner is
  * position-skipped, never copied), while the third tag's exclusive block
  * stays compressed; a mask wanting only the exclusive tag skips the shared
  * block entirely.
  */
class CramSharedBlockFileSpec extends AnyFunSuite with SparkFixture {

  private val refsOpt = "chr20:1000000"
  private val header = SamHeader(SamHeader.parseRefsOption(refsOpt))
  private val n = 500

  private def recs: IndexedSeq[AlignmentRecord] = (0 until n).map { i =>
    // XS and XT will SHARE one external block; XU stays exclusive. Varying
    // lengths make any desync (a skipped partner leaving bytes behind)
    // corrupt values immediately rather than by luck.
    val attrs = Map(
      "XS" -> s"Z:s${"x" * (i % 5)}$i",
      "XT" -> s"Z:t${"y" * ((i + 2) % 7)}$i",
      "XU" -> s"Z:u-exclusive-payload-$i")
    AlignmentRecord(f"q$i%05d", 0, "chr20", 100 + i, 0, 60, "4M", null, 0, 0,
      "ACGT", "IIII", attrs)
  }

  private lazy val path: String = {
    val d = Files.createTempDirectory("cramshared")
    d.toFile.deleteOnExit()
    val p = s"$d/shared.cram"
    val share = Map(
      CramRecordWriter.tagCid("XT", 'Z') -> CramRecordWriter.tagCid("XS", 'Z'))
    val container = CramRecordWriter.encodeContainer(
      recs, header, 0L, NoRefSource, shareTagCids = share)
    val out = new java.io.ByteArrayOutputStream()
    out.write(CramContainers.encodeFileDefinition())
    out.write(CramRecordWriter.encodeHeaderContainer(header))
    out.write(container.bytes)
    out.write(CramContainers.encodeEofContainer())
    Files.write(Paths.get(p), out.toByteArray)
    p
  }

  private def read(opts: (String, String)*) = {
    var r = spark.read.format("cram").option("records", "true")
      .option("autoProjection", "false")
    opts.foreach { case (k, v) => r = r.option(k, v) }
    r.load(path)
  }

  private def countInflations[T](body: => T): (T, Long) = {
    val before = CramRecordCodec.blocksInflated.get()
    val r = body
    (r, CramRecordCodec.blocksInflated.get() - before)
  }

  private def mapOf(r: org.apache.spark.sql.Row): Map[String, String] =
    if (r.isNullAt(1)) null else r.getMap[String, String](1).toMap

  private def collectMaps(opts: (String, String)*): Map[String, Map[String, String]] =
    read(opts: _*).select(col("readName"), col("attributes")).collect()
      .map(r => r.getString(0) -> mapOf(r)).toMap

  test("full decode through the file: both sharing tags and the exclusive tag exact") {
    val full = collectMaps()
    assert(full.size == n)
    recs.foreach { r =>
      assert(full(r.readName) == r.attributes, s"record ${r.readName}")
    }
  }

  test("mask wanting one sharing tag: partner position-skipped, values exact, exclusive block cold") {
    val (full, fullInfl) = countInflations(collectMaps())
    val (masked, maskedInfl) = countInflations(collectMaps("attrKeys" -> "XT"))
    assert(masked.size == n)
    masked.foreach { case (name, m) =>
      assert(m == full(name).view.filterKeys(_ == "XT").toMap,
        s"record $name decoded $m — shared-stream desync through the file")
    }
    // closure prediction: wanted = {shared block}; XS shares it -> consumed
    // (position-skip, same block); XU exclusive -> stays compressed. Exactly
    // ONE block (XU's) drops off versus the full decode.
    assert(fullInfl - maskedInfl == 1,
      s"want exactly the XU block skipped: full=$fullInfl masked=$maskedInfl")
  }

  test("mask wanting only the exclusive tag: shared block never inflates") {
    val (full, fullInfl) = countInflations(collectMaps())
    val (masked, maskedInfl) = countInflations(collectMaps("attrKeys" -> "XU"))
    masked.foreach { case (name, m) =>
      assert(m == full(name).view.filterKeys(_ == "XU").toMap, s"record $name")
    }
    // closure prediction: the shared block backs only unwanted XS/XT ->
    // skipped whole; again exactly one block colder than the full decode
    assert(fullInfl - maskedInfl == 1,
      s"want exactly the shared block skipped: full=$fullInfl masked=$maskedInfl")
  }

  test("typed-tag projection (tagColumns) rides the same closure through the file") {
    val df = read("tagColumns" -> "XT:string")
      .select(col("readName"), col("tag_XT")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    recs.foreach { r =>
      assert(df(r.readName) == r.attributes("XT").substring(2), s"record ${r.readName}")
    }
  }
}
