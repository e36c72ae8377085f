package graft.cram

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.bam.{AlignmentRecord, BamRef, SamHeader}
import graft.bgzf.SeekableInput

/** Randomized CRAM-representable records → container encode → file decode
  * identity — the same oracle style as BamCodecPropertySpec, over the v3
  * writer profile (multi-ref slices, detached mates, rANS/gzip blocks).
  * CRAM-representable means: CIGAR query length equals SEQ length, unmapped
  * records carry no CIGAR/MAPQ, and `=`/`X` ops are pre-collapsed to `M`
  * (the codec's documented fidelity bounds).
  */
class CramRecordPropertySpec extends AnyFunSuite {

  private val header = SamHeader(IndexedSeq(
    BamRef("chr1", 1000000), BamRef("chr2", 1000000), BamRef("chrM", 16000)))

  private def checkProp(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(120), prop)
    assert(res.passed, res.status.toString)
  }

  private val genName: Gen[String] =
    Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n, Gen.choose(33.toChar, 126.toChar))
      .map(_.mkString).suchThat(s => s != "*" && !s.contains('@')))

  private val genCigarOps: Gen[List[(Int, Char)]] = for {
    n <- Gen.chooseNum(1, 5)
    ops <- Gen.listOfN(n, for {
      len <- Gen.chooseNum(1, 50)
      op <- Gen.oneOf('M', 'I', 'D', 'N', 'S', 'H', 'P')
    } yield (len, op))
  } yield {
    // ensure at least one query-consuming op so RL > 0
    val ops1 = if (ops.exists { case (_, o) => "MIS".indexOf(o.toInt) >= 0 }) ops
               else (10, 'M') :: ops
    // canonical CIGAR: merge adjacent same-op runs (CRAM reconstructs the
    // canonical form, so only it round-trips — documented fidelity bound)
    ops1.foldRight(List.empty[(Int, Char)]) {
      case ((l, o), (l2, o2) :: tail) if o == o2 => (l + l2, o) :: tail
      case (op, acc) => op :: acc
    }
  }

  private val genTag: Gen[(String, String)] = for {
    t1 <- Gen.alphaUpperChar; t2 <- Gen.alphaUpperChar
    typed <- Gen.oneOf(
      Gen.const("A:x"),
      Gen.chooseNum(-128, 127).map(v => s"c:$v"),
      Gen.chooseNum(0, 255).map(v => s"C:$v"),
      Gen.chooseNum(-32768, 32767).map(v => s"s:$v"),
      Gen.chooseNum(Int.MinValue, Int.MaxValue).map(v => s"i:$v"),
      Gen.const("f:1.25"),
      Gen.alphaNumStr.map(s => s"Z:$s"),
      Gen.listOfN(3, Gen.chooseNum(-100, 100)).map(vs => "B:i," + vs.mkString(",")))
  } yield (s"$t1$t2", typed)

  private val genRecord: Gen[AlignmentRecord] = for {
    name <- genName
    rawFlags <- Gen.chooseNum(0, 0xffff)
    mapped <- Gen.oneOf(true, false)
    contig <- if (mapped) Gen.oneOf(header.refs.map(_.name)) else Gen.const(null: String)
    start <- if (mapped) Gen.chooseNum(1, 900000) else Gen.const(0)
    cigarOps <- genCigarOps
    seqKnown <- Gen.frequency(9 -> true, 1 -> false)
    qualKnown <- Gen.oneOf(true, false)
    mapq <- Gen.chooseNum(0, 255)
    tlen <- Gen.chooseNum(-100000, 100000)
    mateContig <- Gen.oneOf(null: String, "chr1", "chr2")
    mateStart <- Gen.chooseNum(0, 900000)
    nTags <- Gen.chooseNum(0, 3)
    tags <- Gen.listOfN(nTags, genTag)
    seed <- Gen.long
  } yield {
    val rnd = new scala.util.Random(seed)
    val flags = if (mapped) rawFlags & ~0x4 else rawFlags | 0x4
    val queryLen =
      if (mapped) cigarOps.iterator.collect { case (l, o) if "MIS".indexOf(o.toInt) >= 0 => l }.sum
      else 40
    val cigar = if (mapped) cigarOps.map { case (l, o) => s"$l$o" }.mkString else "*"
    val refLen =
      if (mapped) cigarOps.iterator.collect { case (l, o) if "MDN".indexOf(o.toInt) >= 0 => l }.sum
      else 0
    val seq = if (seqKnown) Array.fill(queryLen)("ACGTN".charAt(rnd.nextInt(5))).mkString else "*"
    val qual = if (qualKnown && seqKnown) Array.fill(queryLen)((33 + rnd.nextInt(86)).toChar).mkString else "*"
    AlignmentRecord(name, flags, contig, start,
      end = if (mapped && refLen > 0) start + refLen - 1 else 0,
      mapq = if (mapped) mapq else 0,
      cigar = cigar, mateContig = mateContig, mateStart = mateStart, tlen = tlen,
      seq = seq, qual = qual, attributes = tags.toMap)
  }

  test("property: container encode → file decode is identity") {
    val genRecords = Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n, genRecord))
    checkProp(Prop.forAll(genRecords) { recList =>
      val recs = recList.toIndexedSeq
      val enc = CramRecordWriter.encodeContainer(recs, header, 0L)
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(CramContainers.encodeFileDefinition())
      bos.write(CramRecordWriter.encodeHeaderContainer(header))
      bos.write(enc.bytes)
      bos.write(CramContainers.encodeEofContainer())
      val (_, back) = CramRecordCodec.decodeFile(SeekableInput.ofBytes(bos.toByteArray), NoRefSource)
      back == recs
    })
  }

  test("property: every 3.1 wire profile round-trips container encode → file decode") {
    // wire 0 = 3.0 rANS 4x8, 1 = 3.1 rANS Nx16, 2 = 3.1 arith; tok3 names
    // and fqz quals compose on the 3.1 wires — random records through
    // every codec combination the sink can emit
    val genRecords = Gen.chooseNum(10, 40).flatMap(n => Gen.listOfN(n, genRecord))
    val profiles = Seq((0, false, false), (1, false, false), (2, false, false),
      (1, true, false), (1, false, true), (2, true, true))
    profiles.foreach { case (wire, tok3, fqz) =>
      checkProp(Prop.forAll(genRecords) { recList =>
        val recs = recList.toIndexedSeq
        val enc = CramRecordWriter.encodeContainer(recs, header, 0L, NoRefSource,
          wire, tok3, fqz)
        val bos = new java.io.ByteArrayOutputStream()
        bos.write(CramContainers.encodeFileDefinition(minor = if (wire > 0) 1 else 0))
        bos.write(CramRecordWriter.encodeHeaderContainer(header))
        bos.write(enc.bytes)
        bos.write(CramContainers.encodeEofContainer())
        val (_, back) = CramRecordCodec.decodeFile(SeekableInput.ofBytes(bos.toByteArray), NoRefSource)
        back == recs
      })
    }
  }

  test("property: records with unknown sequence keep CIGAR and lengths") {
    val genMapped = genRecord.suchThat(r => (r.flags & 0x4) == 0)
    checkProp(Prop.forAll(genMapped) { r0 =>
      val r = r0.copy(seq = "*", qual = "*")
      val enc = CramRecordWriter.encodeContainer(IndexedSeq(r), header, 0L)
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(CramContainers.encodeFileDefinition())
      bos.write(CramRecordWriter.encodeHeaderContainer(header))
      bos.write(enc.bytes)
      bos.write(CramContainers.encodeEofContainer())
      val (_, back) = CramRecordCodec.decodeFile(SeekableInput.ofBytes(bos.toByteArray), NoRefSource)
      back.head == r
    })
  }
}
