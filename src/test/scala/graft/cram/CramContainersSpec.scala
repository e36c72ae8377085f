package graft.cram

import org.scalatest.funsuite.AnyFunSuite
import graft.bgzf.SeekableInput

class CramContainersSpec extends AnyFunSuite {

  test("itf8 / ltf8 round-trip across the size ladder") {
    for (v <- Seq(0, 1, 127, 128, 300, 16383, 16384, 2097151, 2097152,
        268435455, 268435456, Int.MaxValue, -1)) {
      val b = Itf8.write(v)
      val (back, n) = Itf8.read(b, 0)
      assert(back == v && n == b.length, s"itf8 $v -> ${b.toSeq} -> $back")
    }
    for (v <- Seq(0L, 1L, 127L, 128L, 16383L, 16384L, (1L << 21) - 1, 1L << 21,
        (1L << 28) - 1, 1L << 28, (1L << 35), (1L << 42), (1L << 49), (1L << 56),
        Long.MaxValue, -1L)) {
      val b = Ltf8.write(v)
      val (back, n) = Ltf8.read(b, 0)
      assert(back == v && n == b.length, s"ltf8 $v -> ${b.toSeq} -> $back")
    }
  }

  /** Synthetic CRAM: file definition + data containers + EOF container. */
  private def syntheticCram(sizes: Seq[Int]): (Array[Byte], Seq[Long]) = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("CRAM".getBytes("UTF-8"))
    bos.write(3); bos.write(0)
    bos.write(new Array[Byte](20)) // file id
    val offsets = Seq.newBuilder[Long]
    var refPos = 1000
    def writeContainer(dataLen: Int, refSeqId: Int, start: Int, span: Int, nRec: Int): Unit = {
      offsets += bos.size().toLong
      val len = new Array[Byte](4)
      len(0) = dataLen.toByte; len(1) = (dataLen >> 8).toByte
      len(2) = (dataLen >> 16).toByte; len(3) = (dataLen >> 24).toByte
      bos.write(len)
      bos.write(Itf8.write(refSeqId)); bos.write(Itf8.write(start))
      bos.write(Itf8.write(span)); bos.write(Itf8.write(nRec))
      bos.write(Ltf8.write(12345L)); bos.write(Ltf8.write(99999L))
      bos.write(Itf8.write(2)) // nBlocks
      bos.write(Itf8.write(2)); bos.write(Itf8.write(0)); bos.write(Itf8.write(dataLen / 2)) // landmarks
      bos.write(new Array[Byte](4)) // crc
      bos.write(new Array[Byte](dataLen)) // opaque payload (codec out of scope)
    }
    sizes.foreach { sz =>
      writeContainer(sz, refSeqId = 0, start = refPos, span = 5000, nRec = 100)
      refPos += 5000
    }
    writeContainer(0, refSeqId = -1, start = 4542278, span = 0, nRec = 0) // EOF
    (bos.toByteArray, offsets.result())
  }

  test("container walk recovers every offset of a synthetic layout") {
    val sizes = Seq(5000, 12000, 800, 64000, 3000, 25000, 100, 47000)
    val (bytes, offsets) = syntheticCram(sizes)
    val cs = CramContainers.containers(SeekableInput.ofBytes(bytes))
    assert(cs.map(_.offset) == offsets)
    assert(cs.last.isEof)
    assert(cs.init.forall(!_.isEof))
    assert(cs.init.map(_.dataLength) == sizes)
    // geometry closes: each container ends where the next begins
    cs.sliding(2).foreach {
      case Seq(a, b) => assert(a.offset + a.totalLength == b.offset)
      case _ =>
    }
  }

  test("split planning snaps edges to container offsets, covers all, splits none") {
    val sizes = Seq(5000, 12000, 800, 64000, 3000, 25000, 100, 47000, 9000, 2000)
    val (bytes, offsets) = syntheticCram(sizes)
    val cs = CramContainers.containers(SeekableInput.ofBytes(bytes))
    for (splitSize <- Seq(1000L, 20000L, 50000L, 1000000L)) {
      val parts = CramContainers.planPartitions(cs, splitSize)
      // edges are container offsets (or the end of the last data container)
      val valid = offsets.toSet + (cs.init.last.offset + cs.init.last.totalLength)
      parts.foreach { case (s, e) =>
        assert(valid.contains(s), s"start $s not a container offset")
        assert(valid.contains(e), s"end $e not a container offset")
      }
      // disjoint, ordered, complete coverage of data containers
      parts.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(e1 == s2)
        case _ =>
      }
      assert(parts.head._1 == offsets.head)
      val owned = cs.init.map { c =>
        parts.count { case (s, e) => c.offset >= s && c.offset < e }
      }
      assert(owned.forall(_ == 1), s"containers must be owned exactly once: $owned")
    }
  }

  /** Synthetic CRAM with REAL header CRCs (encodeContainer), as the boundary
    * guesser requires; returns (bytes, data-container offsets).
    */
  private def crcCram(specs: Seq[(Int, Int, Int, Int, Int)]): (Array[Byte], Seq[Long]) = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(CramContainers.encodeFileDefinition())
    val offsets = Seq.newBuilder[Long]
    specs.foreach { case (dataLen, ref, start, span, nRec) =>
      offsets += bos.size().toLong
      bos.write(CramContainers.encodeContainer(dataLen, ref, start, span, nRec))
    }
    bos.write(CramContainers.encodeEofContainer())
    (bos.toByteArray, offsets.result())
  }

  test("findBoundary: exact boundary, mid-container snap, end-of-data") {
    val specs = (0 until 8).map(i => (500 + i * 37, 0, 1000 + i * 100, 90, 10))
    val (bytes, offsets) = crcCram(specs)
    val in = SeekableInput.ofBytes(bytes)
    val size = bytes.length.toLong
    // from an exact boundary: returns it
    offsets.foreach(o => assert(CramContainers.findBoundary(in, o, size) == o))
    // from one byte past a boundary: snaps to the NEXT boundary
    offsets.sliding(2).foreach {
      case Seq(a, b) => assert(CramContainers.findBoundary(in, a + 1, size) == b)
      case _ =>
    }
    // mid-payload: also the next boundary
    assert(CramContainers.findBoundary(in, offsets(2) + 40, size) == offsets(3))
    // past the last data container: the EOF container's boundary, then size
    val eofOff = offsets.last +
      CramContainers.readContainerHeader(in, offsets.last, size).totalLength
    assert(CramContainers.findBoundary(in, offsets.last + 1, size) == eofOff)
    assert(CramContainers.findBoundary(in, eofOff + 1, size) == size)
  }

  test("findBoundary: an embedded header copy in a payload is rejected by chain confirm") {
    // craft container 0's payload to contain a byte-exact copy of container
    // 1's header: CRC-valid in isolation, but its chain points into garbage
    val c1bytes = CramContainers.encodeContainer(600, 0, 2000, 90, 10)
    val c1headerLen = c1bytes.length - 600
    val fakeHeader = java.util.Arrays.copyOfRange(c1bytes, 0, c1headerLen)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(CramContainers.encodeFileDefinition())
    val c0off = bos.size().toLong
    // payload: 100 zeros, the fake header, zeros to 1000
    val payload = new Array[Byte](1000)
    System.arraycopy(fakeHeader, 0, payload, 100, fakeHeader.length)
    val c0 = {
      // encodeContainer writes zero payload; splice ours in after the header
      val base = CramContainers.encodeContainer(1000, 0, 1000, 90, 10)
      System.arraycopy(payload, 0, base, base.length - 1000, 1000)
      base
    }
    bos.write(c0)
    val c1off = bos.size().toLong
    bos.write(c1bytes)
    bos.write(CramContainers.encodeEofContainer())
    val bytes = bos.toByteArray
    val in = SeekableInput.ofBytes(bytes)
    // scanning from inside c0 (before the embedded copy) must skip the
    // CRC-valid fake at c0off+hdr+100 and land on the true c1 boundary
    assert(CramContainers.findBoundary(in, c0off + 1, bytes.length.toLong) == c1off)
  }

  /** HEADER bytes of a synthetic container carrying `nLandmarks` five-byte
    * landmarks — spec-valid (ascending, each ≤ dataLength): 5-byte ITF-8
    * encodings require values ≥ 2^28, so the claimed payload is 2^28+n
    * bytes. The payload is never materialized; pair with [[paddedInput]]
    * so size arithmetic holds without allocating 256 MiB.
    */
  private def bigLandmarkContainer(nLandmarks: Int): Array[Byte] = {
    val dataLen = 0x10000000 + nLandmarks + 1
    val hdr = new java.io.ByteArrayOutputStream()
    hdr.write(dataLen & 0xff); hdr.write((dataLen >> 8) & 0xff)
    hdr.write((dataLen >> 16) & 0xff); hdr.write((dataLen >> 24) & 0xff)
    hdr.write(Itf8.write(0)); hdr.write(Itf8.write(1000))
    hdr.write(Itf8.write(90)); hdr.write(Itf8.write(5))
    hdr.write(Ltf8.write(0L)); hdr.write(Ltf8.write(0L))
    hdr.write(Itf8.write(nLandmarks)) // nBlocks
    hdr.write(Itf8.write(nLandmarks))
    (0 until nLandmarks).foreach(i => hdr.write(Itf8.write(0x10000000 + i))) // 5-byte ITF-8s, ascending, ≤ dataLen
    val hb = hdr.toByteArray
    val crc = new java.util.zip.CRC32(); crc.update(hb)
    val c = crc.getValue
    hdr.write((c & 0xff).toInt); hdr.write(((c >> 8) & 0xff).toInt)
    hdr.write(((c >> 16) & 0xff).toInt); hdr.write(((c >> 24) & 0xff).toInt)
    hdr.toByteArray
  }

  /** `bytes` followed by a claimed run of zeros up to `claimedSize` — the
    * sparse stand-in for a payload the header tests never read.
    */
  private def paddedInput(bytes: Array[Byte], claimedSize: Long): SeekableInput =
    new SeekableInput {
      def pread(pos: Long, buf: Array[Byte], off: Int, len: Int): Int = {
        if (pos >= claimedSize) return -1
        val n = math.min(len.toLong, claimedSize - pos).toInt
        var i = 0
        while (i < n) {
          val p = pos + i
          buf(off + i) = if (p < bytes.length) bytes(p.toInt) else 0
          i += 1
        }
        n
      }
      def size: Long = claimedSize
      def close(): Unit = ()
    }

  test("validator and parse window share ONE bound: near-max header parses, over-bound rejects") {
    // the landmark bound is DERIVED from the 64 KiB parse window, so any
    // header the validator accepts fits every parse path's margin — the
    // old escalate-past-the-window ladder (whose findBoundary margin could
    // still silently drop a range-split container) is gone by construction
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(CramContainers.encodeFileDefinition())
    val off = bos.size().toLong
    val maxed = bigLandmarkContainer(CramContainers.MaxLandmarks)
    bos.write(maxed)
    val bytes = bos.toByteArray
    val dataLen = 0x10000000L + CramContainers.MaxLandmarks + 1
    // near-max header fills most of — but by construction fits — the window
    val hdrSize = maxed.length
    assert(hdrSize > (1 << 16) - 100 && hdrSize <= (1 << 16),
      s"near-max header should fill the 64 KiB window, was $hdrSize")
    val in = paddedInput(bytes, off + maxed.length + dataLen)
    val parsed = CramContainers.readValidatedHeader(in, off, in.size)
    assert(parsed.isDefined, "a valid max-landmark header must parse inside the window")
    assert(parsed.get.nBlocks == CramContainers.MaxLandmarks)
    // one landmark past the bound → implausible, rejected (policy, not margin)
    val over = new java.io.ByteArrayOutputStream()
    over.write(CramContainers.encodeFileDefinition())
    val overHdr = bigLandmarkContainer(CramContainers.MaxLandmarks + 1)
    over.write(overHdr)
    val oin = paddedInput(over.toByteArray, off + overHdr.length + dataLen + 1)
    assert(CramContainers.readValidatedHeader(oin, off, oin.size).isEmpty)
  }

  test("landmark sanity: descending or out-of-payload landmarks reject the header") {
    // landmarks are slice offsets within the dataLength-sized payload —
    // non-decreasing and bounded. This is the scan hot-path guard (a
    // garbage candidate byte must exit the landmark loop in ~2 parses, not
    // spin thousands of varints + a multi-KB CRC), so pin both rejections.
    def hdr(landmarks: Seq[Int], dataLen: Int): Array[Byte] = {
      val h = new java.io.ByteArrayOutputStream()
      h.write(dataLen & 0xff); h.write((dataLen >> 8) & 0xff)
      h.write((dataLen >> 16) & 0xff); h.write((dataLen >> 24) & 0xff)
      h.write(Itf8.write(0)); h.write(Itf8.write(1000))
      h.write(Itf8.write(90)); h.write(Itf8.write(5))
      h.write(Ltf8.write(0L)); h.write(Ltf8.write(0L))
      h.write(Itf8.write(landmarks.length))
      h.write(Itf8.write(landmarks.length))
      landmarks.foreach(l => h.write(Itf8.write(l)))
      val hb = h.toByteArray
      val crc = new java.util.zip.CRC32(); crc.update(hb)
      val c = crc.getValue
      h.write((c & 0xff).toInt); h.write(((c >> 8) & 0xff).toInt)
      h.write(((c >> 16) & 0xff).toInt); h.write(((c >> 24) & 0xff).toInt)
      h.write(new Array[Byte](dataLen))
      h.toByteArray
    }
    def parse(landmarks: Seq[Int], dataLen: Int) = {
      val b = hdr(landmarks, dataLen)
      CramContainers.tryParseValidated(b, 0, b.length, 0L, b.length.toLong)
    }
    assert(parse(Seq(10, 20, 30), 64).isDefined, "valid ascending landmarks must parse")
    assert(parse(Seq(30, 20), 64).isEmpty, "descending landmarks must reject")
    assert(parse(Seq(10, 100), 64).isEmpty, "landmark past dataLength must reject")
  }

  test("findBoundary finds a near-max header at a scan-window margin edge") {
    // place the container so its candidate offset sits at the very end of
    // findBoundary's 1 MiB scan window: the parse margin there is exactly
    // the 64 KiB tail, which must hold ANY validator-accepted header
    val rng = new scala.util.Random(42)
    val junkLen = (1 << 20) - 7 // container lands just before the window edge
    val junk = new Array[Byte](junkLen)
    rng.nextBytes(junk)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(CramContainers.encodeFileDefinition())
    val defLen = bos.size()
    bos.write(junk)
    val off = bos.size().toLong
    val hdr = bigLandmarkContainer(CramContainers.MaxLandmarks)
    bos.write(hdr)
    val dataLen = 0x10000000L + CramContainers.MaxLandmarks + 1
    val in = paddedInput(bos.toByteArray, off + hdr.length + dataLen)
    val found = CramContainers.findBoundary(in, defLen.toLong, in.size)
    assert(found == off, s"boundary scan missed the margin-edge container: found $found, want $off")
  }

  test("crai round-trip prunes containers to the interval") {
    val sizes = Seq(5000, 12000, 800, 64000, 3000)
    val (bytes, offsets) = syntheticCram(sizes)
    val cs = CramContainers.containers(SeekableInput.ofBytes(bytes))
    // one crai entry per data container, mirroring its coordinates
    val entries = cs.init.map(c => CraiEntry(c.refSeqId, c.startPos, c.alignmentSpan,
      c.offset, 0, c.dataLength))
    val bos = new java.io.ByteArrayOutputStream()
    CraiIndex.write(bos, CraiIndex(entries))
    val crai = CraiIndex.read(SeekableInput.ofBytes(bos.toByteArray))
    assert(crai.entries == entries)
    // interval covering containers 1..2 only (starts 6000, 11000)
    val hit = CramContainers.prune(cs, Some(crai), refId = 0, start1 = 6200, end1 = 12000)
    assert(hit.map(_.offset) == Seq(offsets(1), offsets(2)))
    // header-coordinate fallback agrees when no crai is present
    val hit2 = CramContainers.prune(cs, None, refId = 0, start1 = 6200, end1 = 12000)
    assert(hit2.map(_.offset) == Seq(offsets(1), offsets(2)))
  }
}
