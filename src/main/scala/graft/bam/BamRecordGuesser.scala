package graft.bam

import java.nio.{ByteBuffer, ByteOrder}
import graft.bgzf.{Bgzf, BgzfBlockGuesser, BgzfInputStream, SeekableInput}

/** Heuristic BAM record-boundary finder — the piece that lets an arbitrary
  * byte split start reading at a true record start without an index.
  *
  * Port of the *semantics* of reference BamRecordGuesser.java:34-52,79-194:
  * a candidate virtual offset is a record start iff [[ReadsToCheck]]
  * consecutive records parse with all fields in valid ranges (refID/pos
  * bounds, printable nul-terminated name, cigar ops ≤ 8, section lengths
  * tiling block_size). Runs executor-side in the partition reader's setup.
  */
final class BamRecordGuesser(input: SeekableInput, refs: IndexedSeq[BamRef], headerEndVoff: Long) {

  import BamRecordGuesser._

  private val stream = new BgzfInputStream(input)
  private val nRef = refs.length

  /** First record-start virtual offset v with
    * `headerEndVoff <= v`, `splitStart <= blockStart(v) < splitEnd`;
    * -1 if the split contains no record start (empty partition).
    */
  def firstRecordAtOrAfter(splitStart: Long, splitEnd: Long): Long = {
    var blockOff =
      if (splitStart <= 0) 0L
      else BgzfBlockGuesser.nextBlockOffset(input, splitStart)
    if (blockOff < 0) return -1L
    while (blockOff < splitEnd) {
      // block length + uncompressed size of this block
      val hdr = new Array[Byte](Bgzf.HeaderLength)
      val got = input.preadFully(blockOff, hdr, 0, Bgzf.HeaderLength)
      if (got < Bgzf.HeaderLength) return -1L
      val blockLen = Bgzf.parseBlockLength(hdr, 0, got)
      if (blockLen < 0) return -1L
      val probe = new BgzfInputStream(input)
      probe.seekBlock(blockOff)
      if (probe.atEof) return -1L
      // uncompressed length of the block = distance until the cursor leaves it
      var ucompLen = 0
      if (!probe.atEof && probe.blockStartOffset == blockOff) {
        // read through to learn size (cheap: one block inflate already done)
        val buf = new Array[Byte](Bgzf.MaxBlockSize)
        var n = probe.read(buf, 0, buf.length)
        if (n > 0) ucompLen = n
      }
      var intra = 0
      while (intra < ucompLen) {
        val voff = Bgzf.makeVirtualOffset(blockOff, intra)
        if (voff >= headerEndVoff && checkRecordStart(voff)) return voff
        intra += 1
      }
      blockOff += blockLen
    }
    -1L
  }

  /** Validate up to [[ReadsToCheck]] consecutive records starting at `voff`. */
  def checkRecordStart(voff: Long): Boolean = {
    try {
      stream.seekVirtual(voff)
      var checked = 0
      while (checked < ReadsToCheck) {
        if (stream.atEof) return checked > 0 // clean EOF after ≥1 valid record
        if (!checkOneRecord()) return false
        checked += 1
      }
      true
    } catch {
      case _: java.io.IOException => false
      case _: IllegalArgumentException => false
    }
  }

  /** Parse one record from the stream, returning false on any invalid field. */
  private def checkOneRecord(): Boolean = {
    val szb = new Array[Byte](4)
    var n = 0
    while (n < 4) {
      val g = stream.read(szb, n, 4 - n)
      if (g < 0) return false // truncated mid-record
      n += g
    }
    val blockSize = (szb(0) & 0xff) | ((szb(1) & 0xff) << 8) | ((szb(2) & 0xff) << 16) | ((szb(3) & 0xff) << 24)
    if (blockSize < 32 || blockSize > MaxRecordSize) return false
    val rec = new Array[Byte](blockSize)
    try stream.readFully(rec, 0, blockSize)
    catch { case _: java.io.EOFException => return false }
    val bb = ByteBuffer.wrap(rec).order(ByteOrder.LITTLE_ENDIAN)
    val refId = bb.getInt
    if (refId < -1 || refId >= nRef) return false
    val pos = bb.getInt
    if (!posOk(refId, pos)) return false
    val lReadName = bb.get & 0xff
    if (lReadName < 1) return false
    bb.get // mapq
    bb.getShort // bin
    val nCigar = bb.getShort & 0xffff
    bb.getShort // flag
    val lSeq = bb.getInt
    if (lSeq < 0) return false
    val nextRefId = bb.getInt
    if (nextRefId < -1 || nextRefId >= nRef) return false
    val nextPos = bb.getInt
    if (!posOk(nextRefId, nextPos)) return false
    bb.getInt // tlen
    val fixed = 32 + lReadName + 4L * nCigar + (lSeq + 1L) / 2 + lSeq
    if (fixed > blockSize) return false
    // read name: printable, NUL exactly at the end
    var i = 0
    while (i < lReadName - 1) {
      val c = rec(32 + i) & 0xff
      if (c < '!' || c > '~') return false
      i += 1
    }
    if (rec(32 + lReadName - 1) != 0) return false
    // cigar ops in range
    var ci = 0
    val cigarBase = 32 + lReadName
    while (ci < nCigar) {
      val v = rec(cigarBase + 4 * ci) & 0xf // low nibble of LE int = op
      if (v > 8) return false
      ci += 1
    }
    true
  }

  /** Position bound from the header's reference dictionary, not a fixed cap:
    * contigs up to 2^31-1 are legal (wheat/axolotl exceed 2^29), so a fixed
    * cap would reject valid records and silently drop whole splits. A mapped
    * read's pos must lie within [−1, refLength]; an unmapped read (refId −1)
    * carries no contig to bound it, so only int sanity applies.
    */
  private def posOk(refId: Int, pos: Int): Boolean =
    if (refId < 0) pos >= -1
    else pos >= -1 && pos <= refs(refId).length

  def close(): Unit = stream.close()
}

object BamRecordGuesser {
  /** Consecutive records confirmed per candidate (reference BamRecordGuesser.java:16). */
  val ReadsToCheck = 10
  /** Upper bound on a sane record size (reference uses 10 MB search cap). */
  val MaxRecordSize = 10000000
}
