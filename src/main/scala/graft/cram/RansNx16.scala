package graft.cram

import java.io.IOException

/** rANS Nx16 — CRAM 3.1's block compression method 5 (public hts-specs
  * "CRAM compression codecs" document §rANS Nx16; htslib reaches it through
  * htscodecs' rans_static4x16pr, the reference through htsjdk). N (4 or 32)
  * interleaved 32-bit range-ANS states renormalized 16 bits at a time over
  * 12-bit (order-0) or 10/12-bit (order-1) normalized frequencies, with
  * optional pre-transforms signalled by the leading format byte: bit
  * packing (PACK), run-length encoding (RLE), byte striping (STRIPE), and
  * a stored-uncompressed escape (CAT).
  *
  * Layout: 1 format byte; uncompressed length as uint7 varint (absent with
  * NOSZ — the CRAM block header's raw size supplies it); transform
  * metadata in PACK, RLE order; then the entropy payload (frequency tables
  * + N uint32-LE initial states + 16-bit renormalization words).
  *
  * Scope note (documented de-risk): decode covers order-0/1 × {plain, CAT,
  * PACK, RLE, STRIPE, X32}; encode emits the plain order-0/1 forms (+PACK
  * when profitable) that [[CramRecordWriter]]'s 3.1 mode uses. Interop is
  * validated by spec-conformance round-trip specs; no htslib binary exists
  * in this environment to cross-write real 3.1 fixtures (same residual-risk
  * class as the multi-GB interop de-scope, README §limitations).
  */
object RansNx16 {
  // format byte flags (spec table)
  val FlagOrder = 0x01 // order-1 entropy (else order-0)
  val FlagX32 = 0x04   // 32 interleaved states (else 4)
  val FlagStripe = 0x08
  val FlagNoSz = 0x10  // uncompressed length omitted
  val FlagCat = 0x20   // payload stored uncompressed
  val FlagRle = 0x40
  val FlagPack = 0x80

  private val Tf0 = 12      // order-0 frequency precision (sum = 4096)
  private val L = 1 << 15   // state lower bound (16-bit renormalization)

  private final class Cursor(val in: Array[Byte], var p: Int) {
    def u8(): Int = { val v = in(p) & 0xff; p += 1; v }
    def varint(): Int = { // uint7: MSB-first 7-bit groups, high bit = continue
      var v = 0
      var n = 0
      var b = u8()
      while ((b & 0x80) != 0) {
        v = (v << 7) | (b & 0x7f); b = u8(); n += 1
        // a uint32 needs at most 5 groups; more means a corrupt stream,
        // not a longer number — fail before v<<7 silently overflows
        if (n > 4) throw new IOException("rANS Nx16 varint overruns uint32")
      }
      (v << 7) | b
    }
    def bytes(n: Int): Array[Byte] = {
      if (p + n > in.length) throw new IOException("truncated rANS Nx16 stream")
      val a = java.util.Arrays.copyOfRange(in, p, p + n); p += n; a
    }
  }

  private[cram] def writeVarint(out: java.io.ByteArrayOutputStream, v0: Int): Unit = {
    require(v0 >= 0)
    if (v0 < (1 << 7)) out.write(v0)
    else if (v0 < (1 << 14)) { out.write(0x80 | (v0 >> 7)); out.write(v0 & 0x7f) }
    else if (v0 < (1 << 21)) {
      out.write(0x80 | (v0 >> 14)); out.write(0x80 | ((v0 >> 7) & 0x7f)); out.write(v0 & 0x7f)
    } else if (v0 < (1 << 28)) {
      out.write(0x80 | (v0 >> 21)); out.write(0x80 | ((v0 >> 14) & 0x7f))
      out.write(0x80 | ((v0 >> 7) & 0x7f)); out.write(v0 & 0x7f)
    } else {
      out.write(0x80 | (v0 >>> 28)); out.write(0x80 | ((v0 >> 21) & 0x7f))
      out.write(0x80 | ((v0 >> 14) & 0x7f)); out.write(0x80 | ((v0 >> 7) & 0x7f))
      out.write(v0 & 0x7f)
    }
  }

  // ---- public API ----------------------------------------------------------

  /** Decompress a complete method-5 stream. `blockRawSize` (from the CRAM
    * block header) supplies the output length when the NOSZ flag omits it.
    * Corrupt streams fail with IOException (the block-layer error
    * contract), never with raw index/allocation errors.
    */
  def uncompress(in: Array[Byte], blockRawSize: Int): Array[Byte] = {
    val cur = new Cursor(in, 0)
    try decodeStream(cur, blockRawSize)
    catch {
      case e: IOException => throw e
      case e @ (_: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException |
                _: IllegalArgumentException) =>
        throw new IOException(s"corrupt rANS Nx16 stream: $e")
    }
  }

  /** Compress with the given order (0 or 1); applies PACK when the alphabet
    * is small enough to shrink the input. Inputs too small for order-1
    * context statistics fall back to order-0; the format byte records what
    * was actually used, so decode needs no outside knowledge.
    */
  def compress(raw: Array[Byte], order: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    if (raw.length == 0) { out.write(0); writeVarint(out, 0); return out.toByteArray }
    // PACK when ≤16 distinct symbols and the input is long enough to gain
    val present = distinctSyms(raw)
    val usePack = present.length <= 16 && raw.length >= 32
    val (body, packMeta) =
      if (usePack) (packBytes(raw, present), present)
      else (raw, null)
    val useOrder = if (order == 1 && body.length >= 16) 1 else 0
    var flags = (if (useOrder == 1) FlagOrder else 0) | (if (usePack) FlagPack else 0)
    // entropy-encode; fall back to CAT on expansion — and unconditionally
    // for the empty body a single-symbol PACK leaves (0 bits per value)
    val payload =
      if (body.isEmpty) Array.emptyByteArray
      else if (useOrder == 1) encode1(body, 4) else encode0(body, 4)
    val cat = body.isEmpty || payload.length >= body.length
    if (cat) flags = (flags & ~FlagOrder) | FlagCat
    out.write(flags)
    writeVarint(out, raw.length)
    if (usePack) {
      out.write(packMeta.length)
      packMeta.foreach(b => out.write(b & 0xff))
      writeVarint(out, body.length)
    }
    if (cat) out.write(body, 0, body.length) else out.write(payload, 0, payload.length)
    out.toByteArray
  }

  // ---- stream decode -------------------------------------------------------

  private def decodeStream(cur: Cursor, fallbackLen: Int): Array[Byte] = {
    val flags = cur.u8()
    val ulen = if ((flags & FlagNoSz) != 0) fallbackLen else cur.varint()
    if (ulen < 0) throw new IOException(s"bad rANS Nx16 length $ulen")
    // every caller knows the expected output length (the CRAM block's raw
    // size, a stripe column's share, an RLE meta length) — a stored length
    // that disagrees is corruption, caught BEFORE the ulen allocation
    if ((flags & FlagNoSz) == 0 && fallbackLen >= 0 && ulen != fallbackLen)
      throw new IOException(s"rANS Nx16 stored length $ulen != expected $fallbackLen")
    // embedded contexts (tok3 token streams, compressed tables) pass no
    // expected length — cap the stored one so a corrupt varint fails as an
    // IOException, not a multi-GB allocation
    if (fallbackLen < 0 && ulen > (1 << 26))
      throw new IOException(s"rANS Nx16 embedded stream claims $ulen bytes")
    if (ulen == 0) return Array.emptyByteArray
    if ((flags & FlagStripe) != 0) return decodeStripe(cur, ulen)
    val n = if ((flags & FlagX32) != 0) 32 else 4
    // transform metadata, in stream order
    var packSyms: Array[Byte] = null
    var lenAfterEntropy = ulen
    if ((flags & FlagPack) != 0) {
      val nsym = cur.u8()
      if (nsym > 16) throw new IOException(s"rANS Nx16 PACK nsym $nsym > 16")
      packSyms = cur.bytes(nsym)
      lenAfterEntropy = cur.varint()
    }
    var rleMeta: Array[Byte] = null
    var rleOutLen = 0
    if ((flags & FlagRle) != 0) {
      val metaLen = cur.varint()
      rleOutLen = lenAfterEntropy
      lenAfterEntropy = cur.varint()
      rleMeta =
        if ((metaLen & 1) != 0) cur.bytes(metaLen >> 1)
        else {
          val compLen = cur.varint()
          decodeEmbedded(cur.bytes(compLen), metaLen >> 1)
        }
    }
    var data =
      if ((flags & FlagCat) != 0) cur.bytes(lenAfterEntropy)
      else if ((flags & FlagOrder) != 0) decode1(cur, lenAfterEntropy, n)
      else decode0(cur, lenAfterEntropy, n)
    if (rleMeta != null) data = rleExpand(data, rleMeta, rleOutLen)
    if (packSyms != null) data = unpackBytes(data, packSyms, ulen)
    if (data.length != ulen)
      throw new IOException(s"rANS Nx16 length mismatch: got ${data.length}, want $ulen")
    data
  }

  /** Embedded compressed payload (an order-1 frequency table or RLE
    * metadata, both carrying an explicit uncompressed-length varint in the
    * OUTER stream): decoded tolerantly as a BARE order-0 entropy payload
    * first — the outer length being explicit strongly implies the payload
    * has no header of its own — falling back to a complete Nx16 container
    * if the bare read fails. Our encoder emits neither form (tables ride
    * uncompressed), so this path only serves foreign files; accepting both
    * layouts maximizes the chance of reading them given no htslib exists
    * here to pin the byte-exact convention (documented residual risk).
    */
  private[cram] def decodeEmbedded(bytes: Array[Byte], uncLen: Int): Array[Byte] =
    try {
      // strictFreq: conforming encoders write exact-sum tables, and the
      // exact sum is the only checksum a headerless payload offers — a
      // container misparsed as bare fails it and falls through
      val out = decode0(new Cursor(bytes, 0), uncLen, 4, strictFreq = true)
      if (out.length == uncLen) out else throw new IOException("bare order-0 length mismatch")
    } catch {
      case _: Exception =>
        try decodeStream(new Cursor(bytes, 0), uncLen)
        catch {
          // last resort: bare layout with a (spec-legal) under-summed table
          case _: Exception => decode0(new Cursor(bytes, 0), uncLen, 4)
        }
    }

  /** STRIPE: byte j of every output position group came from sub-stream
    * j mod N; each sub-stream is itself a complete Nx16 stream.
    */
  private def decodeStripe(cur: Cursor, ulen: Int): Array[Byte] = {
    val n = cur.u8()
    if (n <= 0) throw new IOException(s"rANS Nx16 STRIPE with $n streams")
    val clens = Array.fill(n)(cur.varint())
    val out = new Array[Byte](ulen)
    var j = 0
    while (j < n) {
      val subLen = (ulen - j + n - 1) / n
      val sub = new Cursor(cur.bytes(clens(j)), 0)
      val part = decodeStream(sub, subLen)
      if (part.length != subLen)
        throw new IOException(s"rANS Nx16 stripe $j length ${part.length} != $subLen")
      var i = 0
      while (i < subLen) { out(i * n + j) = part(i); i += 1 }
      j += 1
    }
    out
  }

  // ---- PACK / RLE transforms ----------------------------------------------

  private[cram] def distinctSyms(raw: Array[Byte]): Array[Byte] = {
    val seen = new Array[Boolean](256)
    var i = 0
    while (i < raw.length) { seen(raw(i) & 0xff) = true; i += 1 }
    (0 until 256).filter(seen(_)).map(_.toByte).toArray
  }

  private def bitsFor(nsym: Int): Int =
    if (nsym <= 1) 0 else if (nsym <= 2) 1 else if (nsym <= 4) 2 else if (nsym <= 16) 4
    else throw new IOException(s"PACK alphabet $nsym > 16")

  private[cram] def packBytes(raw: Array[Byte], syms: Array[Byte]): Array[Byte] = {
    val bits = bitsFor(syms.length)
    if (bits == 0) return Array.emptyByteArray
    val idx = new Array[Byte](256)
    syms.indices.foreach(i => idx(syms(i) & 0xff) = i.toByte)
    val per = 8 / bits
    val out = new Array[Byte]((raw.length + per - 1) / per)
    var i = 0
    while (i < raw.length) {
      val slot = i / per
      val shift = (i % per) * bits // LSB-first within each byte
      out(slot) = (out(slot) | ((idx(raw(i) & 0xff) & 0xff) << shift)).toByte
      i += 1
    }
    out
  }

  private[cram] def unpackBytes(packed: Array[Byte], syms: Array[Byte], ulen: Int): Array[Byte] = {
    val bits = bitsFor(syms.length)
    val out = new Array[Byte](ulen)
    if (bits == 0) { java.util.Arrays.fill(out, syms(0)); return out }
    val per = 8 / bits
    val mask = (1 << bits) - 1
    var i = 0
    while (i < ulen) {
      val v = (packed(i / per) >> ((i % per) * bits)) & mask
      if (v >= syms.length) throw new IOException(s"PACK index $v outside alphabet")
      out(i) = syms(v)
      i += 1
    }
    out
  }

  /** RLE expansion: metadata = symbol set (count byte, 0 → all 256) then
    * the run lengths as uint7 varints consumed in output order; the data
    * stream carries literals, each listed symbol followed by its run.
    */
  private def rleExpand(data: Array[Byte], meta: Array[Byte], outLen: Int): Array[Byte] = {
    val mc = new Cursor(meta, 0)
    var nsym = mc.u8()
    if (nsym == 0) nsym = 256
    val inRle = new Array[Boolean](256)
    var i = 0
    while (i < nsym) { inRle(mc.u8()) = true; i += 1 }
    val out = new Array[Byte](outLen)
    var o = 0
    i = 0
    while (i < data.length) {
      val b = data(i) & 0xff
      if (inRle(b)) {
        val run = mc.varint()
        var r = 0
        while (r <= run) {
          if (o >= outLen) throw new IOException("rANS Nx16 RLE overrun")
          out(o) = b.toByte; o += 1; r += 1
        }
      } else {
        if (o >= outLen) throw new IOException("rANS Nx16 RLE overrun")
        out(o) = b.toByte; o += 1
      }
      i += 1
    }
    if (o != outLen) throw new IOException(s"rANS Nx16 RLE underrun: $o of $outLen")
    out
  }

  // ---- alphabet + frequency tables ----------------------------------------

  /** Ascending symbol list with consecutive-run compression (the io_lib
    * family format shared with [[Rans]] 4x8): after a symbol equal to
    * previous+1, a run byte counts further consecutive symbols; a zero in
    * symbol position terminates.
    */
  private def readAlphabet(cur: Cursor): Array[Int] = {
    val syms = Array.newBuilder[Int]
    var item = cur.u8()
    var rle = 0
    var done = false
    while (!done) {
      syms += item
      if (rle > 0) { rle -= 1; item += 1 }
      else {
        val prev = item
        item = cur.u8()
        if (item == prev + 1) { rle = cur.u8() }
      }
      if (rle == 0 && item == 0) done = true
    }
    syms.result()
  }

  private def writeAlphabet(out: java.io.ByteArrayOutputStream, items: IndexedSeq[Int]): Unit = {
    require(items.nonEmpty)
    out.write(items(0))
    var i = 0
    var rle = 0
    while (i < items.length) {
      if (rle > 0) rle -= 1
      else if (i + 1 < items.length) {
        val next = items(i + 1)
        out.write(next)
        if (next == items(i) + 1) {
          var run = 0
          while (i + 1 + run + 1 < items.length && items(i + 1 + run + 1) == next + run + 1) run += 1
          out.write(run)
          rle = run
        }
      } else out.write(0)
      i += 1
    }
  }

  /** Normalize raw counts over `syms` to sum exactly 1<<shift, every present
    * symbol ≥ 1, most frequent absorbs drift (same rule as [[Rans]]).
    */
  private def normalize(counts: Array[Int], shift: Int): Array[Int] = {
    val tot = 1 << shift
    var total = 0L
    var i = 0
    while (i < 256) { total += counts(i); i += 1 }
    require(total > 0)
    val out = new Array[Int](256)
    var sum = 0
    var maxIdx = -1
    i = 0
    while (i < 256) {
      if (counts(i) > 0) {
        out(i) = math.max(1, (counts(i).toLong * tot / total).toInt)
        sum += out(i)
        if (maxIdx < 0 || out(i) > out(maxIdx)) maxIdx = i
      }
      i += 1
    }
    out(maxIdx) += tot - sum
    require(out(maxIdx) > 0, "rANS Nx16 normalization underflow")
    out
  }

  private def cumulate(freq: Array[Int], shift: Int): Array[Int] = {
    val cum = new Array[Int](257)
    var i = 0
    while (i < 256) { cum(i + 1) = cum(i) + freq(i); i += 1 }
    if (cum(256) != (1 << shift))
      throw new IOException(s"rANS Nx16 frequencies sum ${cum(256)} != ${1 << shift}")
    cum
  }

  /** Renormalize a frequency table READ from a stream so it sums exactly
    * 1<<shift. The hts-specs decode procedure (and both reference decoders:
    * htscodecs normalise_freq_shift, htsjdk normalizeFrequenciesArray)
    * rescales stored tables to the target total — encoders may legally store
    * under-summed tables, so rejecting them in [[cumulate]] would refuse
    * spec-valid foreign blocks. No-op when already exact; an all-zero table
    * is still corrupt.
    */
  private def renormalizeRead(freq: Array[Int], shift: Int): Array[Int] = {
    var total = 0L
    var i = 0
    while (i < 256) { total += freq(i); i += 1 }
    if (total == (1 << shift)) freq
    else if (total == 0) throw new IOException("rANS Nx16 frequency table sums to 0")
    else normalize(freq, shift)
  }

  private def lookupTable(freq: Array[Int], cum: Array[Int], shift: Int): Array[Byte] = {
    val lk = new Array[Byte](1 << shift)
    var i = 0
    while (i < 256) {
      var j = cum(i)
      while (j < cum(i + 1)) { lk(j) = i.toByte; j += 1 }
      i += 1
    }
    lk
  }

  // ---- order-0 -------------------------------------------------------------

  private def decode0(cur: Cursor, len: Int, n: Int,
                      strictFreq: Boolean = false): Array[Byte] = {
    // table: alphabet, then per-symbol normalized frequency as uint7.
    // strictFreq requires the stored table to sum exactly 1<<Tf0 — used by
    // decodeEmbedded's bare-layout probe, where the exact sum doubles as
    // the discriminator against misparsing a container as a bare payload
    val syms = readAlphabet(cur)
    val freq0 = new Array[Int](256)
    syms.foreach(s => freq0(s) = cur.varint())
    val freq = if (strictFreq) freq0 else renormalizeRead(freq0, Tf0)
    val cum = cumulate(freq, Tf0)
    val lookup = lookupTable(freq, cum, Tf0)
    val states = new Array[Long](n)
    var j = 0
    while (j < n) { states(j) = readInt32(cur); j += 1 }
    val out = new Array[Byte](len)
    val mask = (1 << Tf0) - 1
    var i = 0
    while (i < len) {
      val k = i % n
      val m = (states(k) & mask).toInt
      val s = lookup(m) & 0xff
      out(i) = s.toByte
      states(k) = freq(s) * (states(k) >>> Tf0) + m - cum(s)
      if (states(k) < L) {
        // a valid stream always has the 2 renorm bytes (the final decoder
        // states land back at the encoder's initial L, never below) — a
        // short read here is truncation, not end-of-stream
        if (cur.p + 1 >= cur.in.length)
          throw new IOException("truncated rANS Nx16 stream")
        states(k) = (states(k) << 16) | ((cur.in(cur.p) & 0xff) | ((cur.in(cur.p + 1) & 0xff) << 8))
        cur.p += 2
      }
      i += 1
    }
    out
  }

  private def encode0(raw: Array[Byte], n: Int): Array[Byte] = {
    val counts = new Array[Int](256)
    var i = 0
    while (i < raw.length) { counts(raw(i) & 0xff) += 1; i += 1 }
    val freq = normalize(counts, Tf0)
    val cum = cumulate(freq, Tf0)
    val table = new java.io.ByteArrayOutputStream()
    val syms = (0 until 256).filter(freq(_) > 0)
    writeAlphabet(table, syms)
    syms.foreach(s => writeVarint(table, freq(s)))
    val rev = new java.io.ByteArrayOutputStream(raw.length / 2 + 32)
    val states = Array.fill(n)(L.toLong)
    i = raw.length - 1
    while (i >= 0) {
      encodeSymbol(states, i % n, raw(i) & 0xff, freq, cum, Tf0, rev)
      i -= 1
    }
    flushStates(states, rev)
    assemble(table, rev)
  }

  // ---- order-1 -------------------------------------------------------------

  private def decode1(cur: Cursor, len: Int, n: Int): Array[Byte] = {
    // table header: top nibble = frequency shift (12, or 10 in fast mode),
    // bit 0 = table itself compressed with an order-0 Nx16 stream
    val th = cur.u8()
    val shift = th >> 4
    if (shift < 1 || shift > 16) throw new IOException(s"bad rANS Nx16 order-1 shift $shift")
    val tableCur =
      if ((th & 1) != 0) {
        val uncLen = cur.varint()
        val compLen = cur.varint()
        new Cursor(decodeEmbedded(cur.bytes(compLen), uncLen), 0)
      } else cur
    val syms = readAlphabet(tableCur)
    val freq = new Array[Array[Int]](256)
    val cum = new Array[Array[Int]](256)
    val lookup = new Array[Array[Byte]](256)
    // per-context rows over the shared alphabet, zero-run compressed: a
    // zero frequency is followed by a byte counting further zeros
    var ci = 0
    while (ci < syms.length) {
      val ctx = syms(ci)
      val f = new Array[Int](256)
      var zeros = 0
      var si = 0
      while (si < syms.length) {
        if (zeros > 0) { zeros -= 1 }
        else {
          val v = tableCur.varint()
          f(syms(si)) = v
          if (v == 0) zeros = tableCur.u8()
        }
        si += 1
      }
      freq(ctx) = renormalizeRead(f, shift)
      cum(ctx) = cumulate(freq(ctx), shift)
      lookup(ctx) = lookupTable(freq(ctx), cum(ctx), shift)
      ci += 1
    }
    val states = new Array[Long](n)
    var j = 0
    while (j < n) { states(j) = readInt32(cur); j += 1 }
    val out = new Array[Byte](len)
    val q = len / n
    val mask = (1 << shift) - 1
    val ctxs = new Array[Int](n)
    def decodeOne(j: Int, pos: Int): Unit = {
      val lk = lookup(ctxs(j))
      if (lk == null) throw new IOException(s"rANS Nx16 order-1 missing context ${ctxs(j)}")
      val m = (states(j) & mask).toInt
      val s = lk(m) & 0xff
      out(pos) = s.toByte
      states(j) = freq(ctxs(j))(s) * (states(j) >>> shift) + m - cum(ctxs(j))(s)
      if (states(j) < L) {
        if (cur.p + 1 >= cur.in.length)
          throw new IOException("truncated rANS Nx16 stream")
        states(j) = (states(j) << 16) | ((cur.in(cur.p) & 0xff) | ((cur.in(cur.p + 1) & 0xff) << 8))
        cur.p += 2
      }
      ctxs(j) = s
    }
    var i = 0
    while (i < q) {
      j = 0
      while (j < n) { decodeOne(j, j * q + i); j += 1 }
      i += 1
    }
    var pos = n * q // state n-1 continues through the remainder
    while (pos < len) { decodeOne(n - 1, pos); pos += 1 }
    out
  }

  private def encode1(raw: Array[Byte], n: Int): Array[Byte] = {
    val shift = Tf0 // always the accurate 12-bit mode
    val len = raw.length
    val q = len / n
    val qStart = Array.tabulate(n)(_ * q)
    val qLen = Array.tabulate(n)(j => if (j == n - 1) len - (n - 1) * q else q)
    val counts = Array.ofDim[Int](256, 256)
    var k = 0
    while (k < n) {
      var prev = 0
      var i = qStart(k)
      val end = qStart(k) + qLen(k)
      while (i < end) { counts(prev)(raw(i) & 0xff) += 1; prev = raw(i) & 0xff; i += 1 }
      k += 1
    }
    // shared alphabet = contexts ∪ symbols (context 0 always participates:
    // every interleaved stream starts there)
    val present = new Array[Boolean](256)
    present(0) = true
    var i = 0
    while (i < len) { present(raw(i) & 0xff) = true; i += 1 }
    val syms = (0 until 256).filter(present(_))
    val freq = new Array[Array[Int]](256)
    val cum = new Array[Array[Int]](256)
    syms.foreach { ctx =>
      var any = false
      var s = 0
      while (s < 256 && !any) { any = counts(ctx)(s) > 0; s += 1 }
      if (any) {
        freq(ctx) = normalize(counts(ctx), shift)
        cum(ctx) = cumulate(freq(ctx), shift)
      } else {
        // context never used as predecessor: flat single-entry row keeps
        // the table rectangular (decoder reads a row for every alphabet
        // symbol); cost is a handful of zero bytes
        val f = new Array[Int](256)
        f(syms.head) = 1 << shift
        freq(ctx) = f
        cum(ctx) = cumulate(f, shift)
      }
    }
    val table = new java.io.ByteArrayOutputStream()
    table.write(shift << 4) // uncompressed table
    writeAlphabet(table, syms)
    syms.foreach { ctx =>
      val f = freq(ctx)
      var si = 0
      while (si < syms.length) {
        writeVarint(table, f(syms(si)))
        if (f(syms(si)) == 0) {
          var zeros = 0
          while (si + zeros + 1 < syms.length && f(syms(si + zeros + 1)) == 0) zeros += 1
          table.write(zeros)
          si += zeros
        }
        si += 1
      }
    }
    val rev = new java.io.ByteArrayOutputStream(len / 2 + 32)
    val states = Array.fill(n)(L.toLong)
    val maxLen = qLen(n - 1)
    var step = maxLen - 1
    while (step >= 0) {
      var j = n - 1
      while (j >= 0) {
        if (step < qLen(j)) {
          val pos = qStart(j) + step
          val prev = if (step == 0) 0 else raw(pos - 1) & 0xff
          encodeSymbol(states, j, raw(pos) & 0xff, freq(prev), cum(prev), shift, rev)
        }
        j -= 1
      }
      step -= 1
    }
    flushStates(states, rev)
    assemble(table, rev)
  }

  // ---- shared encode plumbing ---------------------------------------------

  private def encodeSymbol(states: Array[Long], j: Int, s: Int, freq: Array[Int],
                           cum: Array[Int], shift: Int, rev: java.io.ByteArrayOutputStream): Unit = {
    val f = freq(s)
    val xMax = ((L >>> shift).toLong << 16) * f
    while (states(j) >= xMax) {
      // high byte first into `rev`: the final byte-level reversal then
      // presents (lo, hi) forward — the little-endian 16-bit word the
      // decoder's renormalization reads
      rev.write(((states(j) >> 8) & 0xff).toInt)
      rev.write((states(j) & 0xff).toInt)
      states(j) = states(j) >>> 16
    }
    states(j) = ((states(j) / f) << shift) + cum(s) + (states(j) % f)
  }

  /** Emit final states so that, after buffer reversal, they appear as
    * uint32-LE in order 0..n-1 at the head of the entropy payload.
    */
  private def flushStates(states: Array[Long], rev: java.io.ByteArrayOutputStream): Unit = {
    var k = states.length - 1
    while (k >= 0) {
      var b = 3
      while (b >= 0) { rev.write(((states(k) >>> (8 * b)) & 0xff).toInt); b -= 1 }
      k -= 1
    }
  }

  private def assemble(table: java.io.ByteArrayOutputStream,
                       rev: java.io.ByteArrayOutputStream): Array[Byte] = {
    val revBytes = rev.toByteArray
    val out = new Array[Byte](table.size + revBytes.length)
    val t = table.toByteArray
    System.arraycopy(t, 0, out, 0, t.length)
    var i = 0
    while (i < revBytes.length) {
      out(t.length + i) = revBytes(revBytes.length - 1 - i)
      i += 1
    }
    out
  }

  private def readInt32(cur: Cursor): Long = {
    val b = cur.in
    val p = cur.p
    cur.p += 4
    ((b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) | ((b(p + 2) & 0xff) << 16) |
      ((b(p + 3) & 0xffL) << 24)) & 0xffffffffL
  }
}
