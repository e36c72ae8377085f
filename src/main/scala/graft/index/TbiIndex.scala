package graft.index

import java.io.{ByteArrayOutputStream, OutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import graft.bgzf.{BgzfInputStream, BgzfOutputStream, SeekableInput}

/** Tabix index (`.tbi`) — the standard external index for coordinate-sorted
  * BGZF-compressed tab-delimited genomics text (VCF, BED, GFF). Same 6-level
  * binning + 16 kbp linear index as BAI, wrapped in a BGZF container with a
  * name dictionary and column configuration (tabix paper; reference usage:
  * TribbleIndexIntervalFilteringTextInputFormat.java:33-73,
  * VcfSource.java:143-168 route interval VCF reads through the index).
  *
  * Layout (BGZF-compressed, little-endian): magic "TBI\1" | n_ref | format |
  * col_seq | col_beg | col_end | meta | skip | l_nm | names (nul-separated) |
  * per ref: n_bin × (bin u32, n_chunk, chunks u64×2) then n_intv × ioffset.
  */
final case class TbiIndex(names: IndexedSeq[String], refs: IndexedSeq[BaiRef],
                          format: Int, colSeq: Int, colBeg: Int, colEnd: Int,
                          meta: Int, skip: Int) {
  private val nameIndex: Map[String, Int] = names.zipWithIndex.toMap

  /** Merged virtual-offset spans possibly holding records overlapping
    * [start0, end0] (0-based inclusive) on contig `name`.
    */
  def spans(name: String, start0: Int, end0: Int): Seq[(Long, Long)] =
    nameIndex.get(name) match {
      case Some(r) => BaiIndex.spansOf(refs(r), start0, end0)
      case None => Nil
    }
}

object TbiIndex {
  val Magic: Array[Byte] = Array('T', 'B', 'I', 1).map(_.toByte)
  /** format field: 2 = VCF coordinates (tabix -p vcf). */
  val FormatVcf = 2

  def read(in: SeekableInput): TbiIndex = {
    val stream = new BgzfInputStream(in)
    stream.seekBlock(0)
    val bos = new ByteArrayOutputStream(1 << 16)
    val buf = new Array[Byte](1 << 16)
    var n = stream.read(buf, 0, buf.length)
    while (n > 0) { bos.write(buf, 0, n); n = stream.read(buf, 0, buf.length) }
    val bb = ByteBuffer.wrap(bos.toByteArray).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4)
    bb.get(magic)
    require(magic.sameElements(Magic), "bad TBI magic")
    val nRef = bb.getInt
    val format = bb.getInt; val colSeq = bb.getInt; val colBeg = bb.getInt
    val colEnd = bb.getInt; val meta = bb.getInt; val skip = bb.getInt
    val lNm = bb.getInt
    val nm = new Array[Byte](lNm)
    bb.get(nm)
    val names = new String(nm, "UTF-8").split('\u0000').toIndexedSeq.take(nRef)
    val refs = (0 until nRef).map { _ =>
      val nBin = bb.getInt
      val ids = Array.newBuilder[Int]
      val chunks = Array.newBuilder[Array[Long]]
      var b = 0
      while (b < nBin) {
        val bin = bb.getInt
        val nChunk = bb.getInt
        val cs = new Array[Long](2 * nChunk)
        var c = 0
        while (c < cs.length) { cs(c) = bb.getLong; c += 1 }
        if (bin != BaiIndex.PseudoBin) { ids += bin; chunks += cs }
        b += 1
      }
      val nIntv = bb.getInt
      val linear = new Array[Long](nIntv)
      var w = 0
      while (w < nIntv) { linear(w) = bb.getLong; w += 1 }
      BaiRef(ids.result(), chunks.result(), linear)
    }
    TbiIndex(names, refs, format, colSeq, colBeg, colEnd, meta, skip)
  }

  def write(out: OutputStream, idx: TbiIndex): Unit = {
    val nm = idx.names.map(_ + "\u0000").mkString.getBytes("UTF-8")
    var bytes = 4 + 8 * 4 + nm.length
    idx.refs.foreach { r =>
      bytes += 4
      r.binChunks.foreach(cs => bytes += 4 + 4 + 8 * cs.length)
      bytes += 4 + 8 * r.linear.length
    }
    val bb = ByteBuffer.allocate(bytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(Magic)
    bb.putInt(idx.refs.length)
    bb.putInt(idx.format); bb.putInt(idx.colSeq); bb.putInt(idx.colBeg)
    bb.putInt(idx.colEnd); bb.putInt(idx.meta); bb.putInt(idx.skip)
    bb.putInt(nm.length)
    bb.put(nm)
    idx.refs.foreach { r =>
      bb.putInt(r.binIds.length)
      var b = 0
      while (b < r.binIds.length) {
        bb.putInt(r.binIds(b))
        bb.putInt(r.binChunks(b).length / 2)
        r.binChunks(b).foreach(bb.putLong)
        b += 1
      }
      bb.putInt(r.linear.length)
      r.linear.foreach(bb.putLong)
    }
    val bz = new BgzfOutputStream(out, writeEof = true)
    bz.write(bb.array(), 0, bb.position())
    bz.close()
  }

  /** VCF-config index from merged parts (remapped to global contig ids). */
  def forVcf(names: IndexedSeq[String], parts: Seq[BaiPartData], shifts: Seq[Long]): TbiIndex = {
    val merged = BaiPartData.merge(parts, shifts, names.length)
    TbiIndex(names, merged.refs, FormatVcf, colSeq = 1, colBeg = 2, colEnd = 0,
      meta = '#', skip = 0)
  }
}

/** Per-part tabix accumulator for text sinks: like [[BaiBuilder]] but keyed
  * by contig NAME (global integer ids don't exist until commit merges the
  * per-part dictionaries in part order).
  */
final class TbiBuilder extends Serializable {
  private val localIds = scala.collection.mutable.LinkedHashMap[String, Int]()
  private val bai = new BaiBuilder
  private var sorted = true
  private var prevId = -1
  private var prevPos = -1
  private var firstName: String = _
  private var firstPos = -1
  private var lastName: String = _
  private var lastPos = -1

  def add(contig: String, start0: Int, end0: Int, voffBeg: Long, voffEnd: Long): Unit = {
    val id = localIds.getOrElseUpdate(contig, localIds.size)
    // sorted iff contigs arrive in runs (id never decreases — a revisited
    // contig would reuse a smaller id) and positions are non-decreasing
    if (id < prevId || (id == prevId && start0 < prevPos)) sorted = false
    prevId = id; prevPos = start0
    if (firstName == null) { firstName = contig; firstPos = start0 }
    lastName = contig; lastPos = start0
    bai.add(id, start0, end0, voffBeg, voffEnd)
  }

  def result(): TbiPartData =
    TbiPartData(localIds.keys.toArray, bai.result(), sorted,
      firstName, firstPos, lastName, lastPos)
}

final case class TbiPartData(names: Array[String], data: BaiPartData, sorted: Boolean,
                             firstName: String, firstPos: Int,
                             lastName: String, lastPos: Int) extends Serializable

object TbiPartData {
  /** Global contig order = first appearance across parts in file order;
    * remap each part's local ids, check cross-part sortedness, merge.
    * Returns None when the concatenated file is not coordinate-sorted
    * (a tabix index would be meaningless).
    */
  def mergeSorted(parts: Seq[TbiPartData], shifts: Seq[Long]): Option[TbiIndex] = {
    val names = scala.collection.mutable.LinkedHashMap[String, Int]()
    parts.foreach(_.names.foreach(n => names.getOrElseUpdate(n, names.size)))
    val order = names.toMap
    var sorted = parts.forall(_.sorted)
    var prevId = -1; var prevPos = -1
    parts.foreach { p =>
      if (p.firstName != null) {
        val f = order(p.firstName)
        if (f < prevId || (f == prevId && p.firstPos < prevPos)) sorted = false
        // a part's local first-appearance order must agree with the global
        // order, else its chunk lists are not voff-sorted under the remap
        val ids = p.names.map(order)
        if (!ids.sameElements(ids.sorted)) sorted = false
        prevId = order(p.lastName); prevPos = p.lastPos
      }
    }
    if (!sorted) None
    else {
      val nameSeq = names.keys.toIndexedSeq
      val remapped = parts.map { p =>
        val map = p.names.map(order)
        p.data.copy(refIds = p.data.refIds.map(map))
      }
      Some(TbiIndex.forVcf(nameSeq, remapped, shifts))
    }
  }
}
