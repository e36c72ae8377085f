package graft.cram

import java.io.IOException

/** FQZComp quality codec — CRAM 3.1's block compression method 7 (public
  * hts-specs "CRAM compression codecs" document §fqzcomp quality codec;
  * htslib reaches it through htscodecs' fqzcomp_qual). Quality bytes are
  * coded with the same carry-cached range coder and adaptive byte models
  * as [[ArithDynamic]], but under a 16-bit mixed context built from the
  * recent quality history (qtab/qbits/qshift at qloc), the remaining
  * position in the record (ptab at ploc), the running mismatch count
  * (dtab at dloc) and the per-record parameter selector (at sloc). Record
  * lengths are part of the stream (four bytes under their own models), so
  * the block is self-contained: decode needs only the raw size.
  *
  * Layout: vers byte (5); gflags (bit 0 multi-param, bit 1 selector
  * table, bit 2 reverse flags); optional parameter-set count and 256-entry
  * selector table; per parameter set a fixed header (uint16-LE initial
  * context, pflags, max_sym, packed qbits/qshift, qloc/sloc, ploc/dloc)
  * plus optional qmap and run-length-coded qtab/ptab/dtab step tables;
  * then one range-coded payload.
  *
  * Scope note (documented de-risk): decode covers the full structure —
  * multi-param selectors, stab, qmap, the three step tables, per-record
  * dedup, fixed-length records, and deferred reversal. The encoder emits
  * a deliberately minimal conforming profile: one parameter set, explicit
  * lengths, identity tables, the whole block as one logical record —
  * record segmentation only affects context resets, never the decoded
  * bytes, so any conforming decoder reproduces the blob. No htslib exists
  * in this environment to cross-validate the byte format; the parameter-
  * header packing and read_array run semantics are the first things to
  * diff against htscodecs if a foreign file disagrees (README
  * §limitations).
  */
object FqzComp {
  private val Vers = 5
  // gflags
  private val GMultiParam = 1
  private val GHaveSTab = 2
  private val GDoRev = 4
  // pflags
  private val PDoDedup = 2
  private val PDoLen = 4
  private val PDoSel = 8
  private val PHaveQMap = 16
  private val PHavePTab = 32
  private val PHaveDTab = 64
  private val PHaveQTab = 128

  private final class Param {
    var context = 0
    var pflags = 0
    var maxSym = 0
    var qbits = 0
    var qshift = 0
    var qloc = 0
    var sloc = 0
    var ploc = 0
    var dloc = 0
    var qmap: Array[Int] = null
    var qtab: Array[Int] = null // 256
    var ptab: Array[Int] = null // 1024
    var dtab: Array[Int] = null // 256
    var lastLen = -1
    def qmask: Int = (1 << qbits) - 1
  }

  // mirror of ArithDynamic's coder/model, re-stated here against the
  // shared classes would be cleaner — they live as private internals
  // there, so FqzComp carries thin local bindings
  private type RC = ArithInternals.RangeDecoder
  private type RCE = ArithInternals.RangeEncoder
  private type Model = ArithInternals.Model

  // ---- public API ----------------------------------------------------------

  /** Decompress a complete method-7 stream into `blockRawSize` quality
    * bytes (the CRAM block header's raw size drives the record loop).
    */
  def uncompress(in: Array[Byte], blockRawSize: Int): Array[Byte] = {
    try decode(in, blockRawSize)
    catch {
      case e: IOException => throw e
      case e @ (_: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException |
                _: IllegalArgumentException) =>
        throw new IOException(s"corrupt fqzcomp stream: $e")
    }
  }

  private final class Cursor(val in: Array[Byte]) {
    var p = 0
    def u8(): Int = {
      if (p >= in.length) throw new IOException("truncated fqzcomp stream")
      val v = in(p) & 0xff; p += 1; v
    }
    def u16(): Int = { val a = u8(); val b = u8(); a | (b << 8) }
  }

  /** Step tables are stored as successive run lengths per value with
    * 255-continuation: value v repeats run(v) times, runs ≥ 255 extend
    * with further bytes.
    */
  private def readArray(cur: Cursor, size: Int): Array[Int] = {
    val out = new Array[Int](size)
    var z = 0
    var v = 0
    while (z < size) {
      var run = cur.u8()
      var total = run
      while (run == 255) { run = cur.u8(); total += run }
      if (z + total > size)
        throw new IOException(s"fqzcomp table run overruns ($total at $z/$size)")
      var i = 0
      while (i < total) { out(z + i) = v; i += 1 }
      z += total
      v += 1
    }
    out
  }

  private def writeArray(out: java.io.ByteArrayOutputStream, arr: Array[Int]): Unit = {
    var z = 0
    var v = 0
    while (z < arr.length) {
      var run = 0
      while (z + run < arr.length && arr(z + run) == v) run += 1
      var rem = run
      out.write(math.min(rem, 255))
      while (math.min(rem, 255) == 255) { rem -= 255; out.write(math.min(rem, 255)) }
      z += run
      v += 1
    }
  }

  private def readParam(cur: Cursor): Param = {
    val pm = new Param
    pm.context = cur.u16()
    pm.pflags = cur.u8()
    pm.maxSym = cur.u8()
    var x = cur.u8()
    pm.qbits = x >> 4; pm.qshift = x & 15
    x = cur.u8()
    pm.qloc = x >> 4; pm.sloc = x & 15
    x = cur.u8()
    pm.ploc = x >> 4; pm.dloc = x & 15
    if ((pm.pflags & PHaveQMap) != 0) {
      pm.qmap = Array.fill(pm.maxSym max 1)(0)
      var j = 0
      while (j < pm.maxSym) { pm.qmap(j) = cur.u8(); j += 1 }
    }
    pm.qtab =
      if (pm.qbits > 0 && (pm.pflags & PHaveQTab) != 0) readArray(cur, 256)
      else Array.tabulate(256)(identity)
    if ((pm.pflags & PHavePTab) != 0) pm.ptab = readArray(cur, 1024)
    if ((pm.pflags & PHaveDTab) != 0) pm.dtab = readArray(cur, 256)
    pm
  }

  private def decode(in: Array[Byte], rawSize: Int): Array[Byte] = {
    if (rawSize < 0) throw new IOException("fqzcomp needs the block raw size")
    val cur = new Cursor(in)
    val vers = cur.u8()
    if (vers != Vers) throw new IOException(s"fqzcomp version $vers != $Vers")
    val gflags = cur.u8()
    val nparam = if ((gflags & GMultiParam) != 0) cur.u8() else 1
    if (nparam <= 0 || nparam > 256) throw new IOException(s"fqzcomp nparam $nparam")
    var maxSel = nparam - 1
    val stab =
      if ((gflags & GHaveSTab) != 0) { maxSel = cur.u8(); readArray(cur, 256) }
      else Array.tabulate(256)(i => math.min(i, nparam - 1))
    val params = Array.fill(nparam)(readParam(cur))
    params.foreach { pm =>
      if (pm.maxSym <= 0 || pm.maxSym > 256)
        throw new IOException(s"fqzcomp max_sym ${pm.maxSym}")
    }
    val rc = new ArithInternals.RangeDecoder(cur.in, cur.p)
    val nsym = params.map(_.maxSym).max + 1
    val qualModels = new Array[Model](1 << 16)
    def qual(ctx: Int): Model = {
      val m = qualModels(ctx)
      if (m != null) m else { val nm = new ArithInternals.Model(nsym); qualModels(ctx) = nm; nm }
    }
    val lenModels = Array.fill(4)(new ArithInternals.Model(256))
    val selModel = if (maxSel > 0) new ArithInternals.Model(maxSel + 1) else null
    val revModel = new ArithInternals.Model(2)
    val dupModel = new ArithInternals.Model(2)
    val out = new Array[Byte](rawSize)
    val recStarts = scala.collection.mutable.ArrayBuffer.empty[Int]
    val recRev = scala.collection.mutable.ArrayBuffer.empty[Boolean]
    var i = 0
    var p = 0 // remaining bytes in the current record (0 = record boundary)
    var pm: Param = params(0)
    var qctx = 0
    var delta = 0
    var prevq = 0
    var sel = 0
    var last = 0
    var recLen = 0
    while (i < rawSize) {
      if (p == 0) {
        sel = if (selModel != null) selModel.decode(rc) else 0
        val pi = stab(sel & 0xff)
        if (pi < 0 || pi >= nparam) throw new IOException(s"fqzcomp selector $sel -> $pi")
        pm = params(pi)
        recLen =
          if ((pm.pflags & PDoLen) != 0 || pm.lastLen < 0) {
            val l = lenModels(0).decode(rc) | (lenModels(1).decode(rc) << 8) |
              (lenModels(2).decode(rc) << 16) | (lenModels(3).decode(rc) << 24)
            pm.lastLen = l
            l
          } else pm.lastLen
        if (recLen <= 0 || i + recLen > rawSize)
          throw new IOException(s"fqzcomp record length $recLen overruns $i/$rawSize")
        val rev = (gflags & GDoRev) != 0 && revModel.decode(rc) == 1
        recStarts += i
        recRev += rev
        // the dedup flag rides on EVERY record when the param enables it —
        // a first-record dup has nothing to copy and is corruption
        val dup = (pm.pflags & PDoDedup) != 0 && dupModel.decode(rc) == 1
        if (dup) {
          if (recStarts.length < 2)
            throw new IOException("fqzcomp first record marked as duplicate")
          val prevStart = recStarts(recStarts.length - 2)
          val prevLen = recStarts.last - prevStart
          if (prevLen != recLen)
            throw new IOException("fqzcomp dedup against a different-length record")
          System.arraycopy(out, prevStart, out, i, recLen)
          i += recLen
          p = 0
        } else {
          p = recLen
          qctx = 0; delta = 0; prevq = 0
          last = pm.context
        }
      }
      if (p > 0) {
        val q = qual(last & 0xffff).decode(rc)
        out(i) = (if (pm.qmap != null) {
          if (q >= pm.qmap.length) throw new IOException(s"fqzcomp qmap overflow $q")
          pm.qmap(q)
        } else q).toByte
        // context update (the spec's fqz_update_ctx)
        qctx = ((qctx << pm.qshift) + pm.qtab(q & 0xff)) & 0xffffffff
        var nl = (qctx & pm.qmask) << pm.qloc
        if (pm.ptab != null) nl += pm.ptab(math.min(p, 1023)) << pm.ploc
        if (pm.dtab != null) nl += pm.dtab(math.min(delta, 255)) << pm.dloc
        if ((pm.pflags & PDoSel) != 0) nl += sel << pm.sloc
        if (prevq != q) delta += 1
        prevq = q
        last = nl & 0xffff
        i += 1
        p -= 1
      }
    }
    // deferred reversal
    var r = 0
    while (r < recStarts.length) {
      if (recRev(r)) {
        val s = recStarts(r)
        val e = (if (r + 1 < recStarts.length) recStarts(r + 1) else rawSize) - 1
        var a = s; var b = e
        while (a < b) { val t = out(a); out(a) = out(b); out(b) = t; a += 1; b -= 1 }
      }
      r += 1
    }
    out
  }

  // ---- encode --------------------------------------------------------------

  /** Compress a quality blob with the minimal conforming profile: one
    * parameter set, identity tables, explicit per-record lengths, the blob
    * as a single logical record. Returns null when the blob can't be coded
    * (symbol ≥ 255 — max_sym is a byte); callers fall back to a general-
    * purpose method.
    */
  def compress(blob: Array[Byte]): Array[Byte] = {
    if (blob.isEmpty) return null
    var maxq = 0
    var i = 0
    while (i < blob.length) { maxq = math.max(maxq, blob(i) & 0xff); i += 1 }
    if (maxq >= 255) return null
    val out = new java.io.ByteArrayOutputStream(blob.length / 2 + 64)
    out.write(Vers)
    out.write(0) // gflags: single param, no stab, no rev
    // param header: context=0, pflags=DO_LEN, max_sym, qbits=12/qshift=5,
    // qloc=0/sloc=0, ploc=0/dloc=0 — context is recent-quality history only
    val qbits = 12
    val qshift = 5
    out.write(0); out.write(0)
    out.write(PDoLen)
    out.write(maxq + 1)
    out.write((qbits << 4) | qshift)
    out.write(0)
    out.write(0)
    val bos = new java.io.ByteArrayOutputStream(blob.length / 2 + 32)
    val rc = new ArithInternals.RangeEncoder(bos)
    val nsym = maxq + 2
    val qualModels = new Array[Model](1 << 16)
    def qual(ctx: Int): Model = {
      val m = qualModels(ctx)
      if (m != null) m else { val nm = new ArithInternals.Model(nsym); qualModels(ctx) = nm; nm }
    }
    val lenModels = Array.fill(4)(new ArithInternals.Model(256))
    val len = blob.length
    lenModels(0).encode(rc, len & 0xff)
    lenModels(1).encode(rc, (len >> 8) & 0xff)
    lenModels(2).encode(rc, (len >> 16) & 0xff)
    lenModels(3).encode(rc, (len >> 24) & 0xff)
    val qmask = (1 << qbits) - 1
    var qctx = 0
    var last = 0
    i = 0
    while (i < len) {
      val q = blob(i) & 0xff
      qual(last & 0xffff).encode(rc, q)
      qctx = (qctx << qshift) + q // identity qtab
      last = (qctx & qmask) & 0xffff
      i += 1
    }
    rc.finish()
    val payload = bos.toByteArray
    out.write(payload, 0, payload.length)
    out.toByteArray
  }

  // writeArray is exercised by specs against readArray even though the
  // minimal encoder profile stores no tables
  private[cram] def writeArrayForSpec(arr: Array[Int]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    writeArray(o, arr)
    o.toByteArray
  }
  private[cram] def readArrayForSpec(in: Array[Byte], size: Int): Array[Int] =
    readArray(new Cursor(in), size)
}
