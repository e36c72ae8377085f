package graft.index

import java.io.OutputStream
import java.nio.{ByteBuffer, ByteOrder}
import graft.bgzf.{Bgzf, SeekableInput}

/** SBI splitting index: a sampled list of record-start virtual offsets that
  * turns BAM partition planning into a binary search — no heuristic boundary
  * guessing (the *intended* semantics of the reference's SBI branch,
  * BamSource.java:74-92, vendored format htsjdk/samtools/SBIIndex.java:212-275
  * / SBIIndexWriter.java:24-150; file layout from the public hts-specs SBI
  * description).
  *
  * Layout (little-endian): magic "SBI\1" | fileLength i64 | md5 16B |
  * uuid 16B | totalRecords i64 | granularity i64 | numOffsets i64 |
  * offsets i64×n. The offsets list ends with a sentinel: the virtual offset
  * just past the last record.
  */
final case class SbiIndex(fileLength: Long, totalRecords: Long, granularity: Long,
                          offsets: Array[Long]) {

  /** First indexed offset whose BGZF block starts at/after `pos` (compressed
    * byte). Partition boundaries derived this way tile the record space
    * exactly (reference SBIIndex.getChunk semantics).
    */
  def boundaryAtOrAfter(pos: Long): Long = {
    var lo = 0
    var hi = offsets.length - 1
    // smallest offset with blockStart >= pos
    var ans = offsets(offsets.length - 1)
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (Bgzf.blockStart(offsets(mid)) >= pos) { ans = offsets(mid); hi = mid - 1 }
      else lo = mid + 1
    }
    ans
  }
}

object SbiIndex {
  val Magic: Array[Byte] = Array('S', 'B', 'I', 1).map(_.toByte)
  val DefaultGranularity = 4096L // reference SBIIndexWriter.java:29

  def write(out: OutputStream, idx: SbiIndex): Unit = {
    val bb = ByteBuffer.allocate(4 + 8 + 16 + 16 + 8 + 8 + 8 + 8 * idx.offsets.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(Magic)
    bb.putLong(idx.fileLength)
    bb.put(new Array[Byte](32)) // md5 + uuid: zeros (not consumed by planning)
    bb.putLong(idx.totalRecords)
    bb.putLong(idx.granularity)
    bb.putLong(idx.offsets.length.toLong)
    idx.offsets.foreach(bb.putLong)
    out.write(bb.array(), 0, bb.position())
  }

  def read(in: SeekableInput): SbiIndex = {
    val head = new Array[Byte](4 + 8 + 32 + 8 + 8 + 8)
    require(in.preadFully(0, head, 0, head.length) == head.length, "truncated SBI header")
    val bb = ByteBuffer.wrap(head).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4)
    bb.get(magic)
    require(magic.sameElements(Magic), "bad SBI magic")
    val fileLength = bb.getLong
    bb.position(bb.position() + 32)
    val totalRecords = bb.getLong
    val granularity = bb.getLong
    val n = bb.getLong.toInt
    val buf = new Array[Byte](8 * n)
    require(in.preadFully(head.length.toLong, buf, 0, buf.length) == buf.length, "truncated SBI offsets")
    val ob = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
    val offsets = Array.fill(n)(ob.getLong)
    SbiIndex(fileLength, totalRecords, granularity, offsets)
  }
}

/** Streaming sampler used by writers: records every `granularity`-th record
  * start, starting with record 0.
  */
final class SbiSampler(granularity: Long) extends Serializable {
  private val acc = Array.newBuilder[Long]
  private var count = 0L
  def record(voff: Long): Unit = {
    if (count % granularity == 0) acc += voff
    count += 1
  }
  def sampled: Array[Long] = acc.result()
  def total: Long = count
}
