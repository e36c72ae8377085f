package graft.bam

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.bam.RowToRecord

/** Direct InternalRow → BAM wire bytes, bypassing the AlignmentRecord
  * materialization (UTF8String→String ×6, per-record attribute Map) the
  * object path pays per record. Byte-compatible with
  * `BamCodec.encodeRecord(RowToRecord.convert(row, idx), header)` — the
  * object path stays as the executable spec (BamRowEncoderSpec proves
  * byte identity on production and adversarial shapes) and as the runtime
  * fallback: any shape the fast path can't prove it renders identically
  * (non-ASCII text, CG-spill cigars, unusual tag values) is re-encoded
  * through the spec path, so correctness never depends on fast-path
  * coverage.
  *
  * The encoder owns a reusable output buffer: `encode` returns the record
  * length and the caller writes `buf` — zero per-record allocation on the
  * fast path.
  */
final class BamRowEncoder(schema: StructType, header: SamHeader) {
  private val idx = RowToRecord.indices(schema)

  /** Reusable record buffer (block_size + record bytes). */
  var buf: Array[Byte] = new Array[Byte](1 << 16)
  private var pos = 0

  // coordinates of the record just encoded, for writer-side index bookkeeping
  var lastRefId: Int = -1
  var lastStart: Int = 0 // row `start` column (1-based, 0 = unplaced)
  var lastEnd: Int = 0 // row `end` column
  var lastFlags: Int = 0

  // contig → refId memo for the run-heavy case (records arrive grouped by
  // contig); UTF8String keys must be cloned — the incoming row's backing
  // bytes are writer-reused
  private var lastContig: UTF8String = _
  private var lastContigRefId: Int = -1
  private var lastMateContig: UTF8String = _
  private var lastMateRefId: Int = -1

  private def ensure(n: Int): Unit =
    if (pos + n > buf.length) {
      var cap = buf.length
      while (cap < pos + n) cap <<= 1
      buf = java.util.Arrays.copyOf(buf, cap)
    }

  private def putByte(b: Int): Unit = { ensure(1); buf(pos) = b.toByte; pos += 1 }
  private def putShortLE(v: Int): Unit = {
    ensure(2)
    buf(pos) = v.toByte; buf(pos + 1) = (v >> 8).toByte; pos += 2
  }
  private def putIntLE(v: Int): Unit = {
    ensure(4)
    buf(pos) = v.toByte; buf(pos + 1) = (v >> 8).toByte
    buf(pos + 2) = (v >> 16).toByte; buf(pos + 3) = (v >> 24).toByte
    pos += 4
  }
  private def putIntLEAt(at: Int, v: Int): Unit = {
    buf(at) = v.toByte; buf(at + 1) = (v >> 8).toByte
    buf(at + 2) = (v >> 16).toByte; buf(at + 3) = (v >> 24).toByte
  }
  private def putUtf8(s: UTF8String): Unit = {
    val n = s.numBytes()
    ensure(n)
    s.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + pos)
    pos += n
  }

  /** All bytes < 0x80 — the precondition under which byte-wise rendering is
    * identical to the String path (UTF-16 length == byte length, toUpper is
    * the ASCII table, sort order matches).
    */
  private def ascii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) { if (s.getByte(i) < 0) return false; i += 1 }
    true
  }

  private def refIdOfContig(s: UTF8String): Int =
    if (s == null) -1
    else if (lastContig != null && lastContig.equals(s)) lastContigRefId
    else {
      val id = header.refId(s.toString)
      lastContig = s.clone()
      lastContigRefId = id
      id
    }

  private def refIdOfMate(s: UTF8String): Int =
    if (s == null) -1
    else if (lastMateContig != null && lastMateContig.equals(s)) lastMateRefId
    else {
      val id = header.refId(s.toString)
      lastMateContig = s.clone()
      lastMateRefId = id
      id
    }

  /** Encode one row into `buf`; returns the total length (block_size field +
    * record). Falls back to the object path for any shape outside the proven
    * fast path; validation failures always route through the spec path so
    * error behavior is identical.
    */
  def encode(row: InternalRow): Int = {
    pos = 0
    val x = idx
    // coordinates for the writer's index bookkeeping (same row reads the
    // object path does)
    lastStart = if (x.start < 0 || row.isNullAt(x.start)) 0 else row.getInt(x.start)
    lastEnd = if (x.end < 0 || row.isNullAt(x.end)) 0 else row.getInt(x.end)
    lastFlags = if (x.flags < 0 || row.isNullAt(x.flags)) 0 else row.getInt(x.flags)

    val name: UTF8String =
      if (x.readName < 0 || row.isNullAt(x.readName)) null else row.getUTF8String(x.readName)
    val contig: UTF8String =
      if (x.contig < 0 || row.isNullAt(x.contig)) null else row.getUTF8String(x.contig)
    val cigar: UTF8String =
      if (x.cigar < 0 || row.isNullAt(x.cigar)) null else row.getUTF8String(x.cigar)
    val mateContig: UTF8String =
      if (x.mateContig < 0 || row.isNullAt(x.mateContig)) null else row.getUTF8String(x.mateContig)
    val seq: UTF8String =
      if (x.seq < 0 || row.isNullAt(x.seq)) null else row.getUTF8String(x.seq)
    val qual: UTF8String =
      if (x.qual < 0 || row.isNullAt(x.qual)) null else row.getUTF8String(x.qual)

    // fast-path preconditions; anything else → spec path
    if ((name != null && !ascii(name)) || (contig != null && !ascii(contig)) ||
        (cigar != null && !ascii(cigar)) || (mateContig != null && !ascii(mateContig)) ||
        (seq != null && !ascii(seq)) || (qual != null && !ascii(qual)))
      return fallback(row)

    val mapq = if (x.mapq < 0 || row.isNullAt(x.mapq)) 0 else row.getInt(x.mapq)
    val tlen = if (x.tlen < 0 || row.isNullAt(x.tlen)) 0 else row.getInt(x.tlen)
    val mateStart = if (x.mateStart < 0 || row.isNullAt(x.mateStart)) 0 else row.getInt(x.mateStart)
    if (mapq < 0 || mapq > 255 || lastFlags < 0 || lastFlags > 0xFFFF) return fallback(row)

    val refId = refIdOfContig(contig)
    if (contig != null && refId < 0) return fallback(row) // dictionary error path
    lastRefId = refId

    // name: null/empty → "*"
    val starName = name == null || name.numBytes() == 0
    val nameLen = if (starName) 1 else name.numBytes()
    if (nameLen > 254) return fallback(row)

    // cigar: parse "[0-9]+[MIDNSHP=X]"... from bytes; "*"/null → 0 ops
    var nCigar = 0
    var refLen = 0
    val cigarStar = cigar == null ||
      (cigar.numBytes() == 1 && cigar.getByte(0) == '*')
    // record header is 32 bytes + name; cigar ops appended after — emit
    // into buf after the fixed fields, so parse first into a growable pass
    // (two-pass over the cigar bytes: count, then emit)
    if (!cigarStar) {
      val n = cigar.numBytes()
      var i = 0
      while (i < n) {
        var len = 0L
        val d0 = i
        var b = cigar.getByte(i)
        while (i < n && b >= '0' && b <= '9') {
          len = len * 10 + (b - '0')
          if (len > 0xFFFFFFFL) return fallback(row) // spec path throws (28-bit field)
          i += 1
          if (i < n) b = cigar.getByte(i)
        }
        if (i == d0 || i >= n) return fallback(row)
        val op = "MIDNSHP=X".indexOf(b.toChar)
        if (op < 0) return fallback(row)
        if (op == 0 || op == 2 || op == 3 || op == 7 || op == 8) refLen += len.toInt
        nCigar += 1
        i += 1
      }
      if (nCigar > 0xFFFF) return fallback(row) // CG-spill: spec path handles it
    }

    val lSeq = if (seq == null || (seq.numBytes() == 1 && seq.getByte(0) == '*')) 0 else seq.numBytes()
    val qualStar = qual == null || (qual.numBytes() == 1 && qual.getByte(0) == '*')
    if (!qualStar && qual.numBytes() != lSeq) return fallback(row)

    // tags into the tail of a locally-tracked region: encode AFTER the
    // fixed fields, directly in buf
    val mateRefId = refIdOfMate(mateContig)

    // layout
    val sizeAt = pos
    putIntLE(0) // block_size placeholder
    val recStart = pos
    putIntLE(refId)
    putIntLE(lastStart - 1)
    putByte(nameLen + 1)
    putByte(mapq)
    val bin =
      if (lastStart - 1 >= 0)
        BamCodec.reg2bin(lastStart - 1, if (refLen > 0) lastStart - 1 + refLen else lastStart)
      else 4680
    putShortLE(bin)
    putShortLE(nCigar)
    putShortLE(lastFlags)
    putIntLE(lSeq)
    putIntLE(mateRefId)
    putIntLE(mateStart - 1)
    putIntLE(tlen)
    if (starName) putByte('*') else putUtf8(name)
    putByte(0)
    if (!cigarStar) {
      val n = cigar.numBytes()
      var i = 0
      while (i < n) {
        var len = 0
        var b = cigar.getByte(i)
        while (b >= '0' && b <= '9') { len = len * 10 + (b - '0'); i += 1; b = cigar.getByte(i) }
        putIntLE((len << 4) | "MIDNSHP=X".indexOf(b.toChar))
        i += 1
      }
    }
    if (lSeq > 0) {
      ensure((lSeq + 1) / 2)
      var i = 0
      while (i < lSeq) {
        val hi = BamRowEncoder.nibble(seq.getByte(i))
        val lo = if (i + 1 < lSeq) BamRowEncoder.nibble(seq.getByte(i + 1)) else 0
        buf(pos) = ((hi << 4) | lo).toByte
        pos += 1
        i += 2
      }
    }
    if (qualStar) {
      ensure(lSeq)
      java.util.Arrays.fill(buf, pos, pos + lSeq, 0xff.toByte)
      pos += lSeq
    } else {
      ensure(lSeq)
      var i = 0
      while (i < lSeq) { buf(pos + i) = (qual.getByte(i) - 33).toByte; i += 1 }
      pos += lSeq
    }
    // attributes: sorted by key, dup keys last-value-wins (Map semantics of
    // the spec path)
    if (x.attributes >= 0 && !row.isNullAt(x.attributes)) {
      val m = row.getMap(x.attributes)
      val n = m.numElements()
      if (n > 0) {
        val ks = m.keyArray(); val vs = m.valueArray()
        if (n == 1) {
          if (!putTag(ks.getUTF8String(0), vs.getUTF8String(0))) { pos = 0; return fallback(row) }
        } else {
          // small-n insertion sort over index array by key bytes; equal keys
          // keep only the LAST occurrence (stable sort + last-wins filter)
          val order = new Array[Int](n)
          var i = 0
          while (i < n) { order(i) = i; i += 1 }
          i = 1
          while (i < n) {
            val v = order(i)
            val kv = ks.getUTF8String(v)
            var j = i - 1
            while (j >= 0 && ks.getUTF8String(order(j)).binaryCompare(kv) > 0) {
              order(j + 1) = order(j); j -= 1
            }
            order(j + 1) = v
            i += 1
          }
          i = 0
          while (i < n) {
            val ki = ks.getUTF8String(order(i))
            if (!ascii(ki)) { pos = 0; return fallback(row) }
            // among an equal-key run, emit only the occurrence latest in
            // ORIGINAL map order (Map `+` keeps last inserted value)
            var bestIdx = order(i)
            var j = i + 1
            while (j < n && ks.getUTF8String(order(j)).binaryCompare(ki) == 0) {
              if (order(j) > bestIdx) bestIdx = order(j)
              j += 1
            }
            if (!putTag(ks.getUTF8String(bestIdx), vs.getUTF8String(bestIdx))) {
              pos = 0; return fallback(row)
            }
            i = j
          }
        }
      }
    }
    val size = pos - recStart
    putIntLEAt(sizeAt, size)
    pos
  }

  /** Emit one tag; false = shape outside the fast path (caller falls back).
    * Mirrors BamCodec.encodeTags for the common tag types; B-arrays and
    * floats route through the tiny-string slow lane (identical output, rare
    * in practice).
    */
  private def putTag(k: UTF8String, v: UTF8String): Boolean = {
    if (k.numBytes() != 2 || v == null || v.numBytes() < 2 || v.getByte(1) != ':') return false
    if (!ascii(k) || !ascii(v)) return false
    val t = v.getByte(0).toChar
    val vn = v.numBytes()
    t match {
      case 'Z' | 'H' =>
        putByte(k.getByte(0)); putByte(k.getByte(1)); putByte(t)
        ensure(vn - 2)
        var i = 2
        while (i < vn) { buf(pos) = v.getByte(i); pos += 1; i += 1 }
        putByte(0)
        true
      case 'A' =>
        if (vn != 3) return false
        putByte(k.getByte(0)); putByte(k.getByte(1)); putByte('A'); putByte(v.getByte(2))
        true
      case 'c' | 'C' | 's' | 'S' | 'i' | 'I' =>
        // signed ASCII int; any non-canonical form (sign chars beyond '-',
        // >18 digits, empty) falls back — overflow/range semantics of
        // String.toInt/toLong are then preserved by the spec path
        var i = 2
        var neg = false
        if (i < vn && v.getByte(i) == '-') { neg = true; i += 1 }
        if (i >= vn || vn - i > 18) return false
        var num = 0L
        while (i < vn) {
          val b = v.getByte(i)
          if (b < '0' || b > '9') return false
          num = num * 10 + (b - '0')
          i += 1
        }
        if (neg) num = -num
        t match {
          case 'c' | 'C' =>
            if (num < Int.MinValue || num > Int.MaxValue) return false
            putByte(k.getByte(0)); putByte(k.getByte(1)); putByte(t); putByte(num.toInt)
          case 's' | 'S' =>
            if (num < Int.MinValue || num > Int.MaxValue) return false
            putByte(k.getByte(0)); putByte(k.getByte(1)); putByte(t); putShortLE(num.toInt)
          case 'i' =>
            if (num < Int.MinValue || num > Int.MaxValue) return false
            putByte(k.getByte(0)); putByte(k.getByte(1)); putByte('i'); putIntLE(num.toInt)
          case 'I' =>
            // spec path: v.toLong.toInt (Long range required, then truncate)
            putByte(k.getByte(0)); putByte(k.getByte(1)); putByte('I'); putIntLE(num.toInt)
        }
        true
      case 'f' =>
        putByte(k.getByte(0)); putByte(k.getByte(1)); putByte('f')
        val fv = try java.lang.Float.parseFloat(v.substring(2, vn).toString)
        catch { case _: NumberFormatException => return false }
        putIntLE(java.lang.Float.floatToIntBits(fv))
        true
      case _ => false // 'B' arrays and unknown types: spec path
    }
  }

  private def fallback(row: InternalRow): Int = {
    pos = 0
    val rec = RowToRecord.convert(row, idx)
    lastRefId = header.refId(rec.contig)
    lastStart = rec.start
    lastEnd = rec.end
    lastFlags = rec.flags
    val bytes = BamCodec.encodeRecord(rec, header)
    ensure(bytes.length)
    System.arraycopy(bytes, 0, buf, 0, bytes.length)
    pos = bytes.length
    pos
  }
}

object BamRowEncoder {
  /** seq nibble table, derived from the spec path's `seqNibble(c.toUpper)`
    * for every ASCII byte — identity with the String path by construction.
    */
  private val NibbleTable: Array[Byte] = {
    val t = new Array[Byte](128)
    val nibbles = "=ACMGRSVTWYHKDBN"
    var c = 0
    while (c < 128) {
      val u = Character.toUpperCase(c.toChar)
      val i = nibbles.indexOf(u)
      t(c) = (if (i < 0) 15 else i).toByte
      c += 1
    }
    t
  }

  def nibble(b: Byte): Int = NibbleTable(b & 0x7f)
}
