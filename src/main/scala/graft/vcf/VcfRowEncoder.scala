package graft.vcf

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.vcf.RowToVariant

/** Direct InternalRow → VCF line bytes (trailing '\n' included), bypassing
  * the Variant/Genotype materialization (UTF8String→String per field,
  * per-genotype Scala Maps) the object path pays per row. Byte-compatible
  * with `(VcfCodec.toLine(RowToVariant.convert(row, idx)) + "\n").getBytes`
  * — the object path stays as the executable spec (VcfRowEncoderSpec proves
  * byte identity) and as the runtime fallback for any shape the fast path
  * can't prove it renders identically (non-ASCII text, null contig/ref).
  *
  * The encoder owns a reusable output buffer: `encode` returns the line
  * length and the caller writes `buf` — zero per-row allocation on the
  * GT-only cohort fast shape (the hot write path, VcfWriteCostSpec).
  */
final class VcfRowEncoder(schema: StructType) {
  private val idx = RowToVariant.indices(schema)

  var buf: Array[Byte] = new Array[Byte](1 << 12)
  private var pos = 0

  // coordinates of the row just encoded, for writer-side index bookkeeping
  var lastContig: String = _
  var lastStart: Int = 0
  var lastEnd: Int = 0
  var lastHasGenotypes: Boolean = false

  // contig UTF8String → String memo (records arrive in contig runs); the
  // incoming bytes are writer-reused, so the key must be cloned
  private var memoContig: UTF8String = _

  private def ensure(n: Int): Unit =
    if (pos + n > buf.length) {
      var cap = buf.length
      while (cap < pos + n) cap <<= 1
      buf = java.util.Arrays.copyOf(buf, cap)
    }

  private def putByte(b: Int): Unit = { ensure(1); buf(pos) = b.toByte; pos += 1 }
  private def putUtf8(s: UTF8String): Unit = {
    val n = s.numBytes()
    ensure(n)
    s.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + pos)
    pos += n
  }
  private def putAsciiString(s: String): Unit = {
    ensure(s.length)
    var i = 0
    while (i < s.length) { buf(pos + i) = s.charAt(i).toByte; i += 1 }
    pos += s.length
  }
  private def putInt(v0: Int): Unit =
    if (v0 < 0) putAsciiString(v0.toString) // rare; Int.MinValue-safe
    else {
      var v = v0
      ensure(11)
      var digits = 1
      var p = 10
      while (p <= v && p < 1000000000) { digits += 1; p *= 10 }
      if (v >= 1000000000 * 10L) digits = 10 // unreachable for Int, guard
      var i = pos + digits - 1
      while (i >= pos) { buf(i) = ('0' + v % 10).toByte; v /= 10; i -= 1 }
      pos += digits
    }

  private def ascii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) { if (s.getByte(i) < 0) return false; i += 1 }
    true
  }

  /** Sample names of this row's genotypes (writer header bootstrap — called
    * until the first genotyped row is seen, then never again).
    */
  def samplesOf(row: InternalRow): Seq[String] = {
    val x = idx
    if (x.genotypes < 0 || row.isNullAt(x.genotypes)) return Nil
    val a = row.getArray(x.genotypes)
    (0 until a.numElements()).map { j =>
      val g = a.getStruct(j, x.gArity)
      if (x.gSample < 0 || g.isNullAt(x.gSample)) null else g.getUTF8String(x.gSample).toString
    }
  }

  /** Encode one row into `buf` (line + '\n'); returns the length. */
  def encode(row: InternalRow): Int = {
    pos = 0
    val x = idx
    lastStart = if (row.isNullAt(x.start)) 0 else row.getInt(x.start)
    lastEnd = if (x.end < 0 || row.isNullAt(x.end)) 0 else row.getInt(x.end)

    val contig: UTF8String =
      if (x.contig < 0 || row.isNullAt(x.contig)) null else row.getUTF8String(x.contig)
    if (contig == null || !ascii(contig)) return fallback(row)
    if (memoContig == null || !memoContig.equals(contig)) {
      memoContig = contig.clone()
      lastContig = memoContig.toString
    }

    val ref: UTF8String =
      if (x.ref < 0 || row.isNullAt(x.ref)) null else row.getUTF8String(x.ref)
    if (ref == null || !ascii(ref)) return fallback(row)
    val id: UTF8String =
      if (x.id < 0 || row.isNullAt(x.id)) null else row.getUTF8String(x.id)
    if (id != null && !ascii(id)) return fallback(row)

    putUtf8(contig); putByte('\t')
    putInt(lastStart); putByte('\t')
    if (id == null) putByte('.') else putUtf8(id)
    putByte('\t')
    putUtf8(ref); putByte('\t')

    // alt: "." when absent/empty, else ','-joined
    if (x.alt < 0 || row.isNullAt(x.alt)) putByte('.')
    else {
      val a = row.getArray(x.alt)
      val n = a.numElements()
      if (n == 0) putByte('.')
      else {
        var j = 0
        while (j < n) {
          if (a.isNullAt(j)) { pos = 0; return fallback(row) } // spec path NPEs
          val s = a.getUTF8String(j)
          if (!ascii(s)) { pos = 0; return fallback(row) }
          if (j > 0) putByte(',')
          putUtf8(s)
          j += 1
        }
      }
    }
    putByte('\t')

    // qual: formatQual semantics (integral & |d|<1e15 → Long text)
    if (x.qual < 0 || row.isNullAt(x.qual)) putByte('.')
    else {
      val d = row.getDouble(x.qual)
      putAsciiString(
        if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString)
    }
    putByte('\t')

    // filters: "." when empty, else ';'-joined
    if (x.filters < 0 || row.isNullAt(x.filters)) putByte('.')
    else {
      val a = row.getArray(x.filters)
      val n = a.numElements()
      if (n == 0) putByte('.')
      else {
        var j = 0
        while (j < n) {
          if (a.isNullAt(j)) { pos = 0; return fallback(row) }
          val s = a.getUTF8String(j)
          if (!ascii(s)) { pos = 0; return fallback(row) }
          if (j > 0) putByte(';')
          putUtf8(s)
          j += 1
        }
      }
    }
    putByte('\t')

    // info: sorted by key, dup keys last-wins; flag values ("") emit bare key
    if (x.info < 0 || row.isNullAt(x.info)) putByte('.')
    else if (!putSortedMap(row.getMap(x.info), ';', emptyDot = true)) { pos = 0; return fallback(row) }

    // genotypes
    lastHasGenotypes = false
    if (x.genotypes >= 0 && !row.isNullAt(x.genotypes)) {
      val a = row.getArray(x.genotypes)
      val n = a.numElements()
      if (n > 0) {
        lastHasGenotypes = true
        // convert() substitutes "./." for null/absent gt, so the row path
        // always has gt — hasGt is simply n > 0 (spec: exists(_.gt != null))
        var noFields = true
        var j = 0
        while (j < n && noFields) {
          val g = a.getStruct(j, x.gArity)
          if (x.gFields >= 0 && !g.isNullAt(x.gFields) && g.getMap(x.gFields).numElements() > 0)
            noFields = false
          j += 1
        }
        if (noFields) {
          putByte('\t'); putByte('G'); putByte('T')
          j = 0
          while (j < n) {
            putByte('\t')
            val g = a.getStruct(j, x.gArity)
            if (x.gGt < 0 || g.isNullAt(x.gGt)) { putByte('.'); putByte('/'); putByte('.') }
            else {
              val gt = g.getUTF8String(x.gGt)
              if (!ascii(gt)) { pos = 0; return fallback(row) }
              putUtf8(gt)
            }
            j += 1
          }
        } else if (!putGenotypesWithFields(a, n)) { pos = 0; return fallback(row) }
      }
    }
    putByte('\n')
    pos
  }

  /** FORMAT columns with per-sample fields: union of field keys (sorted,
    * distinct), "GT:" + keys header, per sample gt then each key's value or
    * ".". Returns false on any shape the fast path can't prove (non-ASCII,
    * null map values).
    */
  private def putGenotypesWithFields(a: ArrayData, n: Int): Boolean = {
    val x = idx
    // distinct keys across all genotypes, then sorted (binary == String
    // order for the ASCII keys the fast path requires)
    val keys = new java.util.ArrayList[UTF8String]()
    var j = 0
    while (j < n) {
      val g = a.getStruct(j, x.gArity)
      if (x.gFields >= 0 && !g.isNullAt(x.gFields)) {
        val m = g.getMap(x.gFields)
        val ks = m.keyArray()
        var t = 0
        while (t < m.numElements()) {
          val k = ks.getUTF8String(t)
          if (!ascii(k)) return false
          var seen = false
          var q = 0
          while (q < keys.size && !seen) { if (keys.get(q).equals(k)) seen = true; q += 1 }
          if (!seen) keys.add(k.clone())
          t += 1
        }
      }
      j += 1
    }
    keys.sort((p: UTF8String, q: UTF8String) => p.binaryCompare(q))
    putByte('\t')
    putByte('G'); putByte('T')
    var q = 0
    while (q < keys.size) { putByte(':'); putUtf8(keys.get(q)); q += 1 }
    j = 0
    while (j < n) {
      putByte('\t')
      val g = a.getStruct(j, x.gArity)
      if (x.gGt < 0 || g.isNullAt(x.gGt)) { putByte('.'); putByte('/'); putByte('.') }
      else {
        val gt = g.getUTF8String(x.gGt)
        if (!ascii(gt)) return false
        putUtf8(gt)
      }
      val m: MapData =
        if (x.gFields < 0 || g.isNullAt(x.gFields)) null else g.getMap(x.gFields)
      q = 0
      while (q < keys.size) {
        putByte(':')
        val k = keys.get(q)
        var vi = -1
        if (m != null) {
          val ks = m.keyArray()
          var t = 0
          while (t < m.numElements()) { // last match wins (Map + semantics)
            if (ks.getUTF8String(t).equals(k)) vi = t
            t += 1
          }
        }
        if (vi < 0) putByte('.')
        else {
          if (m.valueArray().isNullAt(vi)) return false // spec path NPEs
          val v = m.valueArray().getUTF8String(vi)
          if (!ascii(v)) return false
          putUtf8(v)
        }
        q += 1
      }
      j += 1
    }
    true
  }

  /** Sorted key=value rendering of a map column (INFO): '.', or entries
    * sorted by key, dup keys keep the LAST value, flag ("") values emit the
    * bare key. False → caller falls back.
    */
  private def putSortedMap(m: MapData, sep: Char, emptyDot: Boolean): Boolean = {
    val n = m.numElements()
    if (n == 0) { if (emptyDot) putByte('.'); return true }
    val ks = m.keyArray(); val vs = m.valueArray()
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
    var first = true
    i = 0
    while (i < n) {
      val ki = ks.getUTF8String(order(i))
      if (!ascii(ki)) return false
      var bestIdx = order(i)
      var j = i + 1
      while (j < n && ks.getUTF8String(order(j)).binaryCompare(ki) == 0) {
        if (order(j) > bestIdx) bestIdx = order(j)
        j += 1
      }
      if (vs.isNullAt(bestIdx)) return false // spec path NPEs
      val v = vs.getUTF8String(bestIdx)
      if (!ascii(v)) return false
      if (!first) putByte(sep)
      putUtf8(ks.getUTF8String(bestIdx))
      if (v.numBytes() > 0) { putByte('='); putUtf8(v) }
      first = false
      i = j
    }
    true
  }

  private def fallback(row: InternalRow): Int = {
    pos = 0
    val v = RowToVariant.convert(row, idx)
    lastContig = v.contig
    lastStart = v.start
    lastEnd = v.end
    lastHasGenotypes = v.genotypes.nonEmpty
    val bytes = VcfCodec.toLine(v).getBytes("UTF-8")
    ensure(bytes.length + 1)
    System.arraycopy(bytes, 0, buf, 0, bytes.length)
    pos = bytes.length
    buf(pos) = '\n'
    pos += 1
    pos
  }
}
