package graft.cram

import java.io.IOException

/** Adaptive arithmetic coder — CRAM 3.1's block compression method 6
  * (public hts-specs "CRAM compression codecs" document §Adaptive
  * arithmetic coding; htslib reaches it through htscodecs'
  * arith_dynamic). A single carry-cached 32-bit range coder (the classic
  * Schindler/Subbotin construction, also the LZMA coder) over adaptive
  * per-context byte models: every symbol's frequency starts at 1 and is
  * bumped by a fixed step on use, halving all counts when the total nears
  * 2^16 — no frequency tables are stored, the decoder reconstructs the
  * model by mirroring the encoder's updates.
  *
  * Container layout mirrors [[RansNx16]] (same uint7 varints, same PACK
  * metadata, same STRIPE framing) with method-specific flag semantics:
  * bit 2 is EXT (payload handed to bzip2) instead of rANS's X32, and RLE
  * is modelled INSIDE the coder (literal byte + cap-and-continue run
  * chunks under their own adaptive models) rather than via a separate
  * metadata stream.
  *
  * Scope note (documented de-risk): decode covers order-0/1 ×
  * {plain, CAT, PACK, RLE, STRIPE, EXT, NOSZ}; encode emits the plain
  * order-0/1 forms (+PACK when profitable) with CAT fallback. Interop is
  * validated by round-trip and structural specs; no htslib binary exists
  * in this environment to cross-write real method-6 fixtures, and the
  * adaptive-model constants (STEP=8, MAX_FREQ=2^16−32) plus the RLE run
  * chunking are the first things to diff against htscodecs if a foreign
  * file ever disagrees (README §limitations).
  */
object ArithDynamic {
  // format byte flags (spec table — shared bit positions with rANS Nx16
  // except 0x04, which is EXT here)
  val FlagOrder = 0x01 // order-1 contexts (else order-0)
  val FlagExt = 0x04   // payload compressed with bzip2, no entropy stage
  val FlagStripe = 0x08
  val FlagNoSz = 0x10  // uncompressed length omitted
  val FlagCat = 0x20   // payload stored uncompressed
  val FlagRle = 0x40
  val FlagPack = 0x80

  // range coder + adaptive model live in [[ArithInternals]] (shared with
  // [[FqzComp]], which reuses the identical coder under fqz contexts)

  // ---- public API ----------------------------------------------------------

  /** Decompress a complete method-6 stream; `blockRawSize` supplies the
    * output length when NOSZ omits it. Corrupt streams fail with
    * IOException, never raw index/allocation errors.
    */
  def uncompress(in: Array[Byte], blockRawSize: Int): Array[Byte] = {
    try decodeStream(new Cursor(in, 0), blockRawSize)
    catch {
      case e: IOException => throw e
      case e @ (_: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException |
                _: IllegalArgumentException) =>
        throw new IOException(s"corrupt arith stream: $e")
    }
  }

  /** Compress with the given order (0 or 1); PACK when the alphabet is
    * small enough to gain, CAT on expansion. The format byte records what
    * was used, so decode needs no outside knowledge.
    */
  def compress(raw: Array[Byte], order: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    if (raw.length == 0) { out.write(0); RansNx16.writeVarint(out, 0); return out.toByteArray }
    val present = RansNx16.distinctSyms(raw)
    val usePack = present.length <= 16 && raw.length >= 32
    val (body, packMeta) =
      if (usePack) (RansNx16.packBytes(raw, present), present)
      else (raw, null)
    val useOrder = if (order == 1 && body.length >= 16) 1 else 0
    var flags = (if (useOrder == 1) FlagOrder else 0) | (if (usePack) FlagPack else 0)
    val payload =
      if (body.isEmpty) Array.emptyByteArray
      else entropyEncode(body, useOrder)
    val cat = body.isEmpty || payload.length >= body.length
    if (cat) flags = (flags & ~FlagOrder) | FlagCat
    out.write(flags)
    RansNx16.writeVarint(out, raw.length)
    if (usePack) {
      out.write(packMeta.length)
      packMeta.foreach(b => out.write(b & 0xff))
      RansNx16.writeVarint(out, body.length)
    }
    if (cat) out.write(body, 0, body.length) else out.write(payload, 0, payload.length)
    out.toByteArray
  }

  // ---- stream decode -------------------------------------------------------

  private final class Cursor(val in: Array[Byte], var p: Int) {
    def u8(): Int = {
      if (p >= in.length) throw new IOException("truncated arith stream")
      val v = in(p) & 0xff; p += 1; v
    }
    def varint(): Int = {
      var v = 0
      var n = 0
      var b = u8()
      while ((b & 0x80) != 0) {
        v = (v << 7) | (b & 0x7f); b = u8(); n += 1
        if (n > 4) throw new IOException("arith varint overruns uint32")
      }
      (v << 7) | b
    }
    def bytes(n: Int): Array[Byte] = {
      if (p + n > in.length) throw new IOException("truncated arith stream")
      val a = java.util.Arrays.copyOfRange(in, p, p + n); p += n; a
    }
    def rest(): Array[Byte] = bytes(in.length - p)
  }

  private def decodeStream(cur: Cursor, fallbackLen: Int): Array[Byte] = {
    val flags = cur.u8()
    val ulen = if ((flags & FlagNoSz) != 0) fallbackLen else cur.varint()
    if (ulen < 0) throw new IOException(s"bad arith length $ulen")
    if ((flags & FlagNoSz) == 0 && fallbackLen >= 0 && ulen != fallbackLen)
      throw new IOException(s"arith stored length $ulen != expected $fallbackLen")
    // embedded contexts pass no expected length — cap the stored one so a
    // corrupt varint fails as an IOException, not a multi-GB allocation
    if (fallbackLen < 0 && ulen > (1 << 26))
      throw new IOException(s"arith embedded stream claims $ulen bytes")
    if (ulen == 0) return Array.emptyByteArray
    if ((flags & FlagStripe) != 0) return decodeStripe(cur, ulen)
    var packSyms: Array[Byte] = null
    var lenAfterEntropy = ulen
    if ((flags & FlagPack) != 0) {
      val nsym = cur.u8()
      if (nsym > 16) throw new IOException(s"arith PACK nsym $nsym > 16")
      packSyms = cur.bytes(nsym)
      lenAfterEntropy = cur.varint()
    }
    var data =
      if ((flags & FlagCat) != 0) cur.bytes(lenAfterEntropy)
      else if ((flags & FlagExt) != 0) bunzip2(cur.rest(), lenAfterEntropy)
      else {
        val rc = new ArithInternals.RangeDecoder(cur.in, cur.p)
        val d =
          if ((flags & FlagRle) != 0) decodeRle(rc, lenAfterEntropy, (flags & FlagOrder) != 0)
          else if ((flags & FlagOrder) != 0) decodeO1(rc, lenAfterEntropy)
          else decodeO0(rc, lenAfterEntropy)
        cur.p = rc.p
        d
      }
    if (packSyms != null) data = RansNx16.unpackBytes(data, packSyms, ulen)
    if (data.length != ulen)
      throw new IOException(s"arith length mismatch: got ${data.length}, want $ulen")
    data
  }

  private def decodeStripe(cur: Cursor, ulen: Int): Array[Byte] = {
    val n = cur.u8()
    if (n <= 0) throw new IOException(s"arith STRIPE with $n streams")
    val clens = Array.fill(n)(cur.varint())
    val out = new Array[Byte](ulen)
    var j = 0
    while (j < n) {
      val subLen = (ulen - j + n - 1) / n
      val part = decodeStream(new Cursor(cur.bytes(clens(j)), 0), subLen)
      if (part.length != subLen)
        throw new IOException(s"arith stripe $j length ${part.length} != $subLen")
      var i = 0
      while (i < subLen) { out(i * n + j) = part(i); i += 1 }
      j += 1
    }
    out
  }

  private def decodeO0(rc: ArithInternals.RangeDecoder, len: Int): Array[Byte] = {
    val m = new ArithInternals.Model(256)
    val out = new Array[Byte](len)
    var i = 0
    while (i < len) { out(i) = m.decode(rc).toByte; i += 1 }
    out
  }

  private def decodeO1(rc: ArithInternals.RangeDecoder, len: Int): Array[Byte] = {
    val ms = Array.fill(256)(new ArithInternals.Model(256))
    val out = new Array[Byte](len)
    var last = 0
    var i = 0
    while (i < len) {
      val b = ms(last).decode(rc)
      out(i) = b.toByte
      last = b
      i += 1
    }
    out
  }

  /** RLE form: literal byte under the order-0/1 byte model, then the run
    * length as cap-and-continue 0..255 chunks — the first chunk under a
    * model selected by the literal, continuations under a shared model.
    */
  private def decodeRle(rc: ArithInternals.RangeDecoder, len: Int, order1: Boolean): Array[Byte] = {
    val lit0 = if (order1) null else new ArithInternals.Model(256)
    val lit1 = if (order1) Array.fill(256)(new ArithInternals.Model(256)) else null
    val runs = Array.fill(257)(new ArithInternals.Model(256))
    val out = new Array[Byte](len)
    var last = 0
    var i = 0
    while (i < len) {
      val b = if (order1) lit1(last).decode(rc) else lit0.decode(rc)
      var run = 0
      var part = runs(b).decode(rc)
      run += part
      while (part == 255) { part = runs(256).decode(rc); run += part }
      if (i + 1 + run > len)
        throw new IOException(s"arith RLE run overruns output ($run at $i/$len)")
      var k = 0
      while (k <= run) { out(i + k) = b.toByte; k += 1 }
      i += 1 + run
      last = b
    }
    out
  }

  /** RLE-form encoder — the exact counterpart of [[decodeRle]]'s model
    * layout (literal under the order-0/1 byte model; run as cap-and-
    * continue 0..255 chunks, first under runs[literal], continuations
    * under runs[256]). compress() doesn't reach for it (plain order-1
    * already models runs well); it exists so the decode path our encoder
    * never exercises is still round-trip-pinned by a conforming producer.
    */
  private[cram] def compressRle(raw: Array[Byte], order: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val flags = FlagRle | (if (order == 1) FlagOrder else 0)
    out.write(flags)
    RansNx16.writeVarint(out, raw.length)
    if (raw.isEmpty) return out.toByteArray
    val bos = new java.io.ByteArrayOutputStream(raw.length / 2 + 32)
    val rc = new ArithInternals.RangeEncoder(bos)
    val lit0 = if (order == 1) null else new ArithInternals.Model(256)
    val lit1 = if (order == 1) Array.fill(256)(new ArithInternals.Model(256)) else null
    val runs = Array.fill(257)(new ArithInternals.Model(256))
    var last = 0
    var i = 0
    while (i < raw.length) {
      val b = raw(i) & 0xff
      var run = 0
      while (i + 1 + run < raw.length && (raw(i + 1 + run) & 0xff) == b) run += 1
      if (order == 1) lit1(last).encode(rc, b) else lit0.encode(rc, b)
      var rem = run
      var part = math.min(rem, 255)
      runs(b).encode(rc, part)
      rem -= part
      while (part == 255) {
        part = math.min(rem, 255)
        runs(256).encode(rc, part)
        rem -= part
      }
      i += 1 + run
      last = b
    }
    rc.finish()
    val payload = bos.toByteArray
    out.write(payload, 0, payload.length)
    out.toByteArray
  }

  private def entropyEncode(body: Array[Byte], order: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(body.length / 2 + 32)
    val rc = new ArithInternals.RangeEncoder(bos)
    if (order == 1) {
      val ms = Array.fill(256)(new ArithInternals.Model(256))
      var last = 0
      var i = 0
      while (i < body.length) {
        val b = body(i) & 0xff
        ms(last).encode(rc, b)
        last = b
        i += 1
      }
    } else {
      val m = new ArithInternals.Model(256)
      var i = 0
      while (i < body.length) { m.encode(rc, body(i) & 0xff); i += 1 }
    }
    rc.finish()
    bos.toByteArray
  }

  private def bunzip2(in: Array[Byte], expect: Int): Array[Byte] = {
    val s = new org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream(
      new java.io.ByteArrayInputStream(in))
    val out = try s.readAllBytes() finally s.close()
    if (out.length != expect)
      throw new IOException(s"arith EXT length ${out.length} != expected $expect")
    out
  }
}

/** The adaptive-coding machinery CRAM 3.1's byte-oriented codecs share:
  * the carry-cached 32-bit range coder and the step-bumped adaptive
  * frequency model. [[ArithDynamic]] (method 6) drives them with plain
  * order-0/1 byte contexts; [[FqzComp]] (method 7) with its mixed
  * quality/position/delta contexts.
  */
private[cram] object ArithInternals {
  private val Top = 1L << 24
  private val Mask32 = 0xffffffffL
  private val Step = 8
  private val MaxFreq = (1 << 16) - 32

  // ---- range coder ---------------------------------------------------------

  /** Carry-cached range encoder. `low` is kept unmasked so a carry shows up
    * in bit 32 and propagates through the cached byte plus the pending 0xFF
    * run — the standard LZMA shift-low.
    */
  final class RangeEncoder(out: java.io.ByteArrayOutputStream) {
    private var low = 0L
    private var range = Mask32
    private var cache = 0
    private var cacheSize = 1L // the leading cache byte (0) is emitted first

    private def shiftLow(): Unit = {
      if ((low & Mask32) < 0xff000000L || (low >>> 32) != 0) {
        var t = cache
        val carry = (low >>> 32).toInt
        do { out.write((t + carry) & 0xff); t = 0xff; cacheSize -= 1 } while (cacheSize != 0)
        cache = ((low >>> 24) & 0xff).toInt
      }
      cacheSize += 1
      low = (low & 0x00ffffffL) << 8
    }

    def encode(cumFreq: Int, freq: Int, totFreq: Int): Unit = {
      range /= totFreq
      low += cumFreq * range
      range *= freq
      while (range < Top) { shiftLow(); range <<= 8 }
    }

    def finish(): Unit = { var i = 0; while (i < 5) { shiftLow(); i += 1 } }
  }

  /** Matching decoder: 32-bit `code` window; the encoder's leading zero
    * cache byte falls off the top on the 5th initial shift.
    */
  final class RangeDecoder(in: Array[Byte], var p: Int) {
    private var code = 0L
    private var range = Mask32

    locally {
      var i = 0
      while (i < 5) { code = ((code << 8) | nextByte()) & Mask32; i += 1 }
    }

    private def nextByte(): Int = {
      if (p >= in.length) throw new IOException("truncated arith stream")
      val b = in(p) & 0xff; p += 1; b
    }

    def getFreq(totFreq: Int): Int = {
      range /= totFreq
      val f = code / range
      if (f >= totFreq) throw new IOException("corrupt arith stream: freq out of range")
      f.toInt
    }

    def decode(cumFreq: Int, freq: Int): Unit = {
      code = (code - cumFreq * range) & Mask32
      range *= freq
      while (range < Top) {
        code = ((code << 8) | nextByte()) & Mask32
        range <<= 8
      }
    }
  }

  // ---- adaptive byte model -------------------------------------------------

  /** Adaptive model over `nsym` symbols: counts start at 1, bump by Step on
    * use, halve (keeping ≥1) when the total tops MaxFreq. Symbols bubble
    * one slot toward the front when they overtake their neighbor — a search
    * optimization that changes cumulative order, so encoder and decoder
    * perform the identical swap to stay in sync.
    */
  final class Model(nsym: Int) {
    private val syms = Array.tabulate(nsym)(identity)
    private val freqs = Array.fill(nsym)(1)
    private var total = nsym

    private def bump(k: Int): Unit = {
      freqs(k) += Step
      total += Step
      if (total > MaxFreq) {
        total = 0
        var i = 0
        while (i < nsym) { freqs(i) -= freqs(i) >> 1; total += freqs(i); i += 1 }
      }
      if (k > 0 && freqs(k) > freqs(k - 1)) {
        val ts = syms(k); syms(k) = syms(k - 1); syms(k - 1) = ts
        val tf = freqs(k); freqs(k) = freqs(k - 1); freqs(k - 1) = tf
      }
    }

    def encode(rc: RangeEncoder, sym: Int): Unit = {
      var k = 0
      var acc = 0
      while (syms(k) != sym) { acc += freqs(k); k += 1 }
      rc.encode(acc, freqs(k), total)
      bump(k)
    }

    def decode(rc: RangeDecoder): Int = {
      val f = rc.getFreq(total)
      var k = 0
      var acc = 0
      while (acc + freqs(k) <= f) { acc += freqs(k); k += 1 }
      rc.decode(acc, freqs(k))
      val s = syms(k)
      bump(k)
      s
    }
  }

}
