package graft.index

import java.io.{ByteArrayOutputStream, OutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import graft.bgzf.SeekableInput

/** Tribble linear index (`.idx`) — the htsjdk-standard external index for
  * coordinate-sorted PLAIN-TEXT feature files (uncompressed VCF foremost);
  * the role tabix `.tbi` plays for BGZF text. The reference routes interval
  * VCF reads through whichever of the two exists
  * (VcfSource.java:143-168 via IndexFactory.loadIndex;
  * TribbleIndexIntervalFilteringTextInputFormat.java:33-73 prunes splits
  * with the loaded index's blocks).
  *
  * On-disk layout (little-endian; htsjdk tribble AbstractIndex/LinearIndex,
  * strings null-terminated):
  *   magic "TIDX" | type (1=linear) | version (3) |
  *   indexedFile str | fileSize i64 | fileTS i64 | md5 str | flags i32 |
  *   nProperties i32 × (key str, value str) | nChromosomes i32 ×
  *     [name str | binWidth i32 | nBins i32 | longestFeature i32 |
  *      oldV3BlockSize i32 | nFeatures i32 | blockStart i64 × nBins |
  *      lastBlockEnd i64]
  *
  * Block positions are what the writer's stream reported: plain byte
  * offsets for uncompressed text, BGZF virtual offsets when htsjdk indexed
  * a compressed file. The caller decides which interpretation applies.
  */
final case class TribbleChr(name: String, binWidth: Int, longestFeature: Int,
                            nFeatures: Int, blockStarts: Array[Long], lastEnd: Long)

/** Common query surface of the two tribble index flavors ([[TribbleIdx]]
  * linear, [[TribbleTreeIdx]] interval-tree): candidate byte ranges for a
  * 1-based interval — always a superset, record-level residual filters
  * provide exactness.
  */
sealed trait TribbleIndex {
  def blocks(name: String, start1: Int, end1: Int): Seq[(Long, Long)]
}

final case class TribbleIdx(chrs: IndexedSeq[TribbleChr]) extends TribbleIndex {
  private val byName: Map[String, TribbleChr] = chrs.map(c => c.name -> c).toMap

  /** Candidate-feature position range for 1-based query [start1, end1] —
    * htsjdk LinearIndex.ChrIndex.getBlocks semantics: start bin is floored
    * by the longest recorded feature (so features starting before the query
    * but extending into it stay candidates), adjacent linear bins merge to
    * one contiguous block. Always a superset of the overlapping features;
    * record-level residual filters provide exactness.
    */
  def blocks(name: String, start1: Int, end1: Int): Seq[(Long, Long)] =
    byName.get(name) match {
      case Some(c) if c.blockStarts.nonEmpty =>
        val adjusted = math.max(start1 - c.longestFeature, 0)
        val startBin = adjusted / c.binWidth
        if (startBin >= c.blockStarts.length) Nil
        else {
          val endBin = math.min(math.max(end1 - 1, 0) / c.binWidth, c.blockStarts.length - 1)
          if (endBin < startBin) Nil
          else {
            val s = c.blockStarts(startBin)
            val e = if (endBin == c.blockStarts.length - 1) c.lastEnd
                    else c.blockStarts(endBin + 1)
            if (e <= s) Nil else Seq((s, e))
          }
        }
      case _ => Nil
    }
}

/** Interval-tree tribble index (type 2) — the other flavor htsjdk's
  * IndexFactory can emit (IntervalIndexCreator groups runs of features into
  * intervals of [min start, max end] covering one byte block each). The
  * on-disk ChrIndex after the shared header:
  *   name str | nIntervals i32 ×
  *     [start i32 | end i32 | blockPos i64 | blockSize i64]
  * Query = blocks of every stored interval overlapping the request —
  * no bin arithmetic, the intervals ARE the index.
  */
final case class TribbleTreeChr(name: String, starts: Array[Int], ends: Array[Int],
                                blockPos: Array[Long], blockSize: Array[Long])

final case class TribbleTreeIdx(chrs: IndexedSeq[TribbleTreeChr]) extends TribbleIndex {
  private val byName: Map[String, TribbleTreeChr] = chrs.map(c => c.name -> c).toMap

  def blocks(name: String, start1: Int, end1: Int): Seq[(Long, Long)] =
    byName.get(name) match {
      case Some(c) =>
        val hits = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
        var i = 0
        while (i < c.starts.length) {
          if (c.starts(i) <= end1 && c.ends(i) >= start1)
            hits += ((c.blockPos(i), c.blockPos(i) + c.blockSize(i)))
          i += 1
        }
        // merge overlapping/adjacent candidate ranges (intervals are stored
        // in feature order, so their blocks are position-sorted)
        hits.sortBy(_._1).foldLeft(List.empty[(Long, Long)]) {
          case ((ps, pe) :: rest, (s, e)) if s <= pe => (ps, math.max(pe, e)) :: rest
          case (acc, r) => r :: acc
        }.reverse
      case None => Nil
    }
}

object TribbleIdx {
  /** "TIDX" read as a little-endian int (htsjdk tribble magic). */
  val Magic = 1480870228
  val TypeLinear = 1
  val TypeIntervalTree = 2
  val Version = 3
  /** htsjdk LinearIndexCreator default bin width (bp per linear bin). */
  val DefaultBinWidth = 8000

  def read(in: SeekableInput): TribbleIndex = {
    val size = in.size
    require(size <= Int.MaxValue, "oversized .idx")
    val bytes = new Array[Byte](size.toInt)
    require(in.preadFully(0, bytes, 0, bytes.length) == bytes.length, "short .idx read")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def str(): String = {
      val sb = new java.lang.StringBuilder
      var b = bb.get()
      while (b != 0) { sb.append(b.toChar); b = bb.get() }
      sb.toString
    }
    require(bb.getInt == Magic, "bad tribble .idx magic")
    val typ = bb.getInt
    require(typ == TypeLinear || typ == TypeIntervalTree,
      s"unsupported tribble index type $typ (want linear=1 or interval-tree=2)")
    val version = bb.getInt
    require(version >= 3, s"unsupported tribble index version $version")
    str() // indexedFile
    bb.getLong; bb.getLong // fileSize, fileTS
    str() // md5
    bb.getInt // flags (v3 carries no inline sequence dictionary)
    var nProps = bb.getInt
    while (nProps > 0) { str(); str(); nProps -= 1 }
    val nChr = bb.getInt
    if (typ == TypeLinear) {
      val chrs = (0 until nChr).map { _ =>
        val name = str()
        val binWidth = bb.getInt
        val nBins = bb.getInt
        val longest = bb.getInt
        bb.getInt // old-v3 largest block size, always 0 in modern writers
        val nFeatures = bb.getInt
        val blocks = new Array[Long](nBins)
        var i = 0
        while (i < nBins) { blocks(i) = bb.getLong; i += 1 }
        val lastEnd = bb.getLong
        TribbleChr(name, binWidth, longest, nFeatures, blocks, lastEnd)
      }
      TribbleIdx(chrs)
    } else {
      val chrs = (0 until nChr).map { _ =>
        val name = str()
        val n = bb.getInt
        require(n >= 0, s"negative interval count for $name")
        val starts = new Array[Int](n)
        val ends = new Array[Int](n)
        val pos = new Array[Long](n)
        val sz = new Array[Long](n)
        var i = 0
        while (i < n) {
          starts(i) = bb.getInt; ends(i) = bb.getInt
          pos(i) = bb.getLong; sz(i) = bb.getLong
          i += 1
        }
        TribbleTreeChr(name, starts, ends, pos, sz)
      }
      TribbleTreeIdx(chrs)
    }
  }

  /** Serialize an interval-tree index (used by specs to author type-2
    * fixtures; the VCF sink co-writes linear indexes via [[write]]).
    */
  def writeTree(out: OutputStream, idx: TribbleTreeIdx, indexedFile: String, fileSize: Long): Unit = {
    val bos = new ByteArrayOutputStream(1 << 12)
    val b4 = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    def i32(v: Int): Unit = { b4.clear(); b4.putInt(v); bos.write(b4.array(), 0, 4) }
    def i64(v: Long): Unit = { b4.clear(); b4.putLong(v); bos.write(b4.array(), 0, 8) }
    def str(s: String): Unit = { bos.write(s.getBytes("UTF-8")); bos.write(0) }
    i32(Magic); i32(TypeIntervalTree); i32(Version)
    str(indexedFile); i64(fileSize); i64(0L)
    str(""); i32(0)
    i32(0) // no properties
    i32(idx.chrs.length)
    idx.chrs.foreach { c =>
      str(c.name); i32(c.starts.length)
      var i = 0
      while (i < c.starts.length) {
        i32(c.starts(i)); i32(c.ends(i)); i64(c.blockPos(i)); i64(c.blockSize(i))
        i += 1
      }
    }
    out.write(bos.toByteArray)
  }

  def write(out: OutputStream, idx: TribbleIdx, indexedFile: String, fileSize: Long): Unit = {
    val bos = new ByteArrayOutputStream(1 << 14)
    val b4 = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    def i32(v: Int): Unit = { b4.clear(); b4.putInt(v); bos.write(b4.array(), 0, 4) }
    def i64(v: Long): Unit = { b4.clear(); b4.putLong(v); bos.write(b4.array(), 0, 8) }
    def str(s: String): Unit = { bos.write(s.getBytes("UTF-8")); bos.write(0) }
    i32(Magic); i32(TypeLinear); i32(Version)
    str(indexedFile); i64(fileSize); i64(0L) // timestamp 0: no staleness check
    str(""); i32(0) // md5 empty, flags 0
    i32(0) // no properties
    i32(idx.chrs.length)
    idx.chrs.foreach { c =>
      str(c.name); i32(c.binWidth); i32(c.blockStarts.length)
      i32(c.longestFeature); i32(0); i32(c.nFeatures)
      c.blockStarts.foreach(i64)
      i64(c.lastEnd)
    }
    out.write(bos.toByteArray)
  }
}

/** Per-part linear-index accumulator for plain-text sinks: htsjdk
  * LinearIndexCreator fill semantics (bin = (start-1)/binWidth; gap bins
  * take the arriving feature's offset, so blockStart(b) = offset of the
  * first feature whose bin ≥ b) over part-local byte offsets; commit merges
  * parts in file order with byte shifts.
  */
final class TribbleIdxBuilder(binWidth: Int = TribbleIdx.DefaultBinWidth) extends Serializable {
  private final class ChrAcc(val name: String) {
    val bins = scala.collection.mutable.ArrayBuffer[Long]()
    var longest = 0
    var nFeatures = 0
    var lastEnd = 0L
  }
  private val chrs = scala.collection.mutable.LinkedHashMap[String, ChrAcc]()
  private var cur: ChrAcc = _
  private var sorted = true
  private var prevStart = -1
  private var firstPos = -1
  private var lastPos = -1

  def add(contig: String, start1: Int, end1: Int, offBeg: Long, offEnd: Long): Unit = {
    if (cur == null || cur.name != contig) {
      if (chrs.contains(contig)) sorted = false // revisited contig: not run-sorted
      cur = chrs.getOrElseUpdate(contig, new ChrAcc(contig))
      prevStart = -1
    }
    if (start1 < prevStart) sorted = false
    prevStart = start1
    if (firstPos < 0) firstPos = start1
    lastPos = start1
    val bin = math.max(0, start1 - 1) / binWidth
    while (cur.bins.length <= bin) cur.bins += offBeg
    cur.longest = math.max(cur.longest, math.max(end1, start1) - start1 + 1)
    cur.nFeatures += 1
    cur.lastEnd = offEnd
  }

  def result(): TribblePartData =
    TribblePartData(
      chrs.values.map(c =>
        TribbleChrPart(c.name, c.bins.toArray, c.longest, c.nFeatures, c.lastEnd)).toIndexedSeq,
      sorted, firstPos, lastPos, binWidth)
}

final case class TribbleChrPart(name: String, blockStarts: Array[Long], longest: Int,
                                nFeatures: Int, lastEnd: Long) extends Serializable

final case class TribblePartData(chrs: IndexedSeq[TribbleChrPart], sorted: Boolean,
                                 firstPos: Int, lastPos: Int, binWidth: Int) extends Serializable

object TribblePartData {
  /** Merge per-part data in part (file) order with byte shifts. Returns None
    * when the concatenated file is not coordinate-sorted by contig runs —
    * a linear index over it would mis-prune.
    */
  def mergeSorted(parts: Seq[TribblePartData], shifts: Seq[Long]): Option[TribbleIdx] = {
    val nonEmpty = parts.zip(shifts).filter(_._1.chrs.nonEmpty)
    if (nonEmpty.isEmpty) return Some(TribbleIdx(IndexedSeq.empty))
    var sorted = nonEmpty.forall(_._1.sorted)
    // contig runs must not interleave across parts, and a contig continuing
    // into the next part must not step backwards in position
    val runs = nonEmpty.flatMap(_._1.chrs.map(_.name))
    val collapsed = runs.foldLeft(List.empty[String]) {
      case (h :: t, n) if h == n => h :: t
      case (acc, n) => n :: acc
    }.reverse
    if (collapsed.distinct.size != collapsed.size) sorted = false
    nonEmpty.sliding(2).foreach {
      case Seq((a, _), (b, _)) =>
        if (a.chrs.last.name == b.chrs.head.name && b.firstPos < a.lastPos) sorted = false
      case _ =>
    }
    if (!sorted) return None
    val binWidth = nonEmpty.head._1.binWidth
    if (!nonEmpty.forall(_._1.binWidth == binWidth)) return None
    // per contig, in global first-appearance order: dense bins fill from the
    // earliest part that covers each bin index (a part's array length caps
    // the bins it has features at/after)
    val order = scala.collection.mutable.LinkedHashMap[String, scala.collection.mutable.ArrayBuffer[(TribbleChrPart, Long)]]()
    nonEmpty.foreach { case (p, shift) =>
      p.chrs.foreach { c =>
        order.getOrElseUpdate(c.name, scala.collection.mutable.ArrayBuffer()) += ((c, shift))
      }
    }
    val chrs = order.map { case (name, contribs) =>
      val maxLen = contribs.map(_._1.blockStarts.length).max
      val dense = new Array[Long](maxLen)
      var filled = 0
      contribs.foreach { case (c, shift) =>
        var b = filled
        while (b < c.blockStarts.length) { dense(b) = c.blockStarts(b) + shift; b += 1 }
        filled = math.max(filled, c.blockStarts.length)
      }
      val (lastC, lastShift) = contribs.last
      TribbleChr(name, binWidth, contribs.map(_._1.longest).max,
        contribs.map(_._1.nFeatures).sum, dense, lastC.lastEnd + lastShift)
    }.toIndexedSeq
    Some(TribbleIdx(chrs))
  }
}
