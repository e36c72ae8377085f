package graft.cram

/** rANS 4x8 — CRAM 3.0's block compression method 4 (hts-specs CRAM v3.0
  * §13 "rANS codec"; the reference reaches it through htsjdk's port of
  * io_lib's rans_static, CramSource.java:57-151). Four interleaved 32-bit
  * range-ANS states over 12-bit (sum=4096) normalized frequencies;
  * order-0 (context-free) and order-1 (previous-byte context).
  *
  * Stream layout: 1-byte order, uint32-LE compressed size (frequency table
  * + ANS blob), uint32-LE raw size, frequency table (ascending symbol list
  * with consecutive-run RLE, 1–2 byte ITF-8-prefix frequencies), then the
  * ANS byte stream with the four initial states as uint32-LE at its head.
  * Order-1 splits the output into four quarters (state 3 also takes the
  * `size % 4` remainder) with per-state previous-byte context starting at 0.
  */
object Rans {
  private val TotFreqBits = 12
  private val TotFreq = 1 << TotFreqBits // 4096
  private val RansByteL = 1 << 23

  // ---- public API ----------------------------------------------------------

  /** Decompress a complete rANS block (header included). Corrupt streams
    * fail with IOException (the block-layer error contract), never raw
    * require/index errors.
    */
  def uncompress(in: Array[Byte]): Array[Byte] = {
    try {
      require(in.length >= 9, "truncated rANS header")
      val order = in(0) & 0xff
      val rawSize = readInt32(in, 5)
      require(rawSize >= 0, s"negative rANS raw size $rawSize")
      if (rawSize == 0) return Array.emptyByteArray
      order match {
        case 0 => uncompress0(in, 9, rawSize)
        case 1 => uncompress1(in, 9, rawSize)
        case o => throw new java.io.IOException(s"unsupported rANS order $o")
      }
    } catch {
      case e: java.io.IOException => throw e
      case e @ (_: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException |
                _: IllegalArgumentException) =>
        throw new java.io.IOException(s"corrupt rANS stream: $e")
    }
  }

  /** Compress with the given order (0 or 1). Inputs too small for order-1
    * context statistics fall back to order-0; the header records the order
    * actually used, so decode needs no outside knowledge.
    */
  def compress(raw: Array[Byte], order: Int): Array[Byte] = {
    val useOrder = if (order == 1 && raw.length >= 4) 1 else 0
    val body =
      if (raw.length == 0) Array.emptyByteArray
      else if (useOrder == 0) compress0(raw)
      else compress1(raw)
    val out = new Array[Byte](9 + body.length)
    out(0) = useOrder.toByte
    writeInt32(out, 1, body.length)
    writeInt32(out, 5, raw.length)
    System.arraycopy(body, 0, out, 9, body.length)
    out
  }

  // ---- run-length symbol/context lists -------------------------------------
  // Shape (spec §13.3): first item byte; after each item's payload, either the
  // run counter consumes the next consecutive item implicitly, or the next
  // item byte follows (with a run-count byte when it is previous+1). A zero
  // item byte in next-position terminates.

  /** Mutable cursor over the input so payload parsers can advance it. */
  private final class Cursor(val in: Array[Byte], var p: Int)

  private def readRuns(cur: Cursor)(payload: (Int, Cursor) => Unit): Unit = {
    var item = cur.in(cur.p) & 0xff; cur.p += 1
    var rle = 0
    var done = false
    while (!done) {
      payload(item, cur)
      if (rle > 0) { rle -= 1; item += 1 }
      else {
        val prev = item
        item = cur.in(cur.p) & 0xff; cur.p += 1
        if (item == prev + 1) { rle = cur.in(cur.p) & 0xff; cur.p += 1 }
      }
      if (rle == 0 && item == 0) done = true
    }
  }

  private def writeRuns(out: java.io.ByteArrayOutputStream, items: IndexedSeq[Int])(
      payload: Int => Unit): Unit = {
    require(items.nonEmpty)
    out.write(items(0))
    var i = 0
    var rle = 0
    while (i < items.length) {
      payload(items(i))
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

  /** 1–2 byte frequency varint (the ITF-8 prefix forms, values < 16384). */
  private def readFreq(cur: Cursor): Int = {
    val b = cur.in(cur.p) & 0xff; cur.p += 1
    if (b < 0x80) b
    else { val lo = cur.in(cur.p) & 0xff; cur.p += 1; ((b & 0x7f) << 8) | lo }
  }

  private def writeFreq(out: java.io.ByteArrayOutputStream, f: Int): Unit = {
    if (f < 0x80) out.write(f)
    else { out.write(0x80 | (f >> 8)); out.write(f & 0xff) }
  }

  /** Normalize raw counts to sum exactly [[TotFreq]], keeping every present
    * symbol ≥ 1; the most frequent symbol absorbs the rounding drift.
    */
  private def normalize(counts: Array[Int]): Array[Int] = {
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
        out(i) = math.max(1, (counts(i).toLong * TotFreq / total).toInt)
        sum += out(i)
        if (maxIdx < 0 || out(i) > out(maxIdx)) maxIdx = i
      }
      i += 1
    }
    out(maxIdx) += TotFreq - sum
    require(out(maxIdx) > 0, "rANS normalization underflow")
    out
  }

  private def cumulate(freq: Array[Int]): Array[Int] = {
    val cum = new Array[Int](257)
    var i = 0
    while (i < 256) { cum(i + 1) = cum(i) + freq(i); i += 1 }
    require(cum(256) == TotFreq, s"rANS frequencies sum ${cum(256)} != $TotFreq")
    cum
  }

  private def lookupTable(freq: Array[Int], cum: Array[Int]): Array[Byte] = {
    val lk = new Array[Byte](TotFreq)
    var i = 0
    while (i < 256) {
      var j = cum(i)
      while (j < cum(i + 1)) { lk(j) = i.toByte; j += 1 }
      i += 1
    }
    lk
  }

  // ---- order-0 -------------------------------------------------------------

  private def uncompress0(in: Array[Byte], p0: Int, rawSize: Int): Array[Byte] = {
    val cur = new Cursor(in, p0)
    val freq = new Array[Int](256)
    readRuns(cur)((sym, c) => freq(sym) = readFreq(c))
    val cum = cumulate(freq)
    val lookup = lookupTable(freq, cum)
    val states = new Array[Long](4)
    var p = cur.p
    var j = 0
    while (j < 4) { states(j) = readInt32(in, p).toLong & 0xffffffffL; p += 4; j += 1 }
    val out = new Array[Byte](rawSize)
    var i = 0
    while (i < rawSize) {
      val k = i & 3
      val m = (states(k) & (TotFreq - 1)).toInt
      val s = lookup(m) & 0xff
      out(i) = s.toByte
      states(k) = freq(s) * (states(k) >>> TotFreqBits) + m - cum(s)
      while (states(k) < RansByteL && p < in.length) {
        states(k) = (states(k) << 8) | (in(p) & 0xff); p += 1
      }
      i += 1
    }
    out
  }

  private def compress0(raw: Array[Byte]): Array[Byte] = {
    val counts = new Array[Int](256)
    var i = 0
    while (i < raw.length) { counts(raw(i) & 0xff) += 1; i += 1 }
    val freq = normalize(counts)
    val cum = cumulate(freq)
    val table = new java.io.ByteArrayOutputStream()
    writeRuns(table, (0 until 256).filter(freq(_) > 0))(s => writeFreq(table, freq(s)))
    // rANS encodes in reverse; bytes land in `rev` backwards
    val rev = new java.io.ByteArrayOutputStream(raw.length / 2 + 32)
    val states = Array.fill(4)(RansByteL.toLong)
    i = raw.length - 1
    while (i >= 0) {
      val k = i & 3
      encodeSymbol(states, k, raw(i) & 0xff, freq, cum, rev)
      i -= 1
    }
    flushStates(states, rev)
    assemble(table, rev)
  }

  // ---- order-1 -------------------------------------------------------------

  private def uncompress1(in: Array[Byte], p0: Int, rawSize: Int): Array[Byte] = {
    val freq = new Array[Array[Int]](256)
    val cum = new Array[Array[Int]](256)
    val lookup = new Array[Array[Byte]](256)
    val cur = new Cursor(in, p0)
    readRuns(cur) { (ctx, c) =>
      val f = new Array[Int](256)
      readRuns(c)((sym, cc) => f(sym) = readFreq(cc))
      freq(ctx) = f
      cum(ctx) = cumulate(f)
      lookup(ctx) = lookupTable(f, cum(ctx))
    }
    val states = new Array[Long](4)
    var p = cur.p
    var j = 0
    while (j < 4) { states(j) = readInt32(in, p).toLong & 0xffffffffL; p += 4; j += 1 }
    val out = new Array[Byte](rawSize)
    val q = rawSize >> 2
    val ctxs = new Array[Int](4)
    def decodeOne(j: Int, pos: Int): Unit = {
      val lk = lookup(ctxs(j))
      if (lk == null) throw new java.io.IOException(s"rANS order-1 missing context ${ctxs(j)}")
      val m = (states(j) & (TotFreq - 1)).toInt
      val s = lk(m) & 0xff
      out(pos) = s.toByte
      states(j) = freq(ctxs(j))(s) * (states(j) >>> TotFreqBits) + m - cum(ctxs(j))(s)
      while (states(j) < RansByteL && p < in.length) {
        states(j) = (states(j) << 8) | (in(p) & 0xff); p += 1
      }
      ctxs(j) = s
    }
    var i = 0
    while (i < q) {
      j = 0
      while (j < 4) { decodeOne(j, j * q + i); j += 1 }
      i += 1
    }
    var pos = 4 * q // state 3 continues through the remainder
    while (pos < rawSize) { decodeOne(3, pos); pos += 1 }
    out
  }

  private def compress1(raw: Array[Byte]): Array[Byte] = {
    val n = raw.length
    val q = n >> 2
    val qStart = Array(0, q, 2 * q, 3 * q)
    val qLen = Array(q, q, q, n - 3 * q)
    val counts = Array.ofDim[Int](256, 256)
    var k = 0
    while (k < 4) {
      var prev = 0
      var i = qStart(k)
      val end = qStart(k) + qLen(k)
      while (i < end) { counts(prev)(raw(i) & 0xff) += 1; prev = raw(i) & 0xff; i += 1 }
      k += 1
    }
    val freq = new Array[Array[Int]](256)
    val cum = new Array[Array[Int]](256)
    var ctx = 0
    while (ctx < 256) {
      var any = false
      var s = 0
      while (s < 256 && !any) { any = counts(ctx)(s) > 0; s += 1 }
      if (any) {
        freq(ctx) = normalize(counts(ctx))
        cum(ctx) = cumulate(freq(ctx))
      }
      ctx += 1
    }
    val table = new java.io.ByteArrayOutputStream()
    writeRuns(table, (0 until 256).filter(freq(_) != null)) { c =>
      writeRuns(table, (0 until 256).filter(freq(c)(_) > 0))(s => writeFreq(table, freq(c)(s)))
    }
    // reverse of the decoder's read order: remainder first (state 3), then
    // interleaved steps descending, states 3 → 0 within each step
    val rev = new java.io.ByteArrayOutputStream(n / 2 + 32)
    val states = Array.fill(4)(RansByteL.toLong)
    val maxLen = qLen(3)
    var step = maxLen - 1
    while (step >= 0) {
      var j = 3
      while (j >= 0) {
        if (step < qLen(j)) {
          val pos = qStart(j) + step
          val prev = if (step == 0) 0 else raw(pos - 1) & 0xff
          encodeSymbol(states, j, raw(pos) & 0xff, freq(prev), cum(prev), rev)
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
                           cum: Array[Int], rev: java.io.ByteArrayOutputStream): Unit = {
    val f = freq(s)
    val xMax = ((RansByteL >>> TotFreqBits) << 8).toLong * f
    while (states(j) >= xMax) { rev.write((states(j) & 0xff).toInt); states(j) = states(j) >>> 8 }
    states(j) = ((states(j) / f) << TotFreqBits) + cum(s) + (states(j) % f)
  }

  /** Emit final states so that, after buffer reversal, they appear as
    * uint32-LE in order 0..3 at the head of the ANS stream.
    */
  private def flushStates(states: Array[Long], rev: java.io.ByteArrayOutputStream): Unit = {
    var k = 3
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

  // ---- little-endian helpers ----------------------------------------------

  private def readInt32(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) | ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)

  private def writeInt32(b: Array[Byte], p: Int, v: Int): Unit = {
    b(p) = v.toByte; b(p + 1) = (v >> 8).toByte; b(p + 2) = (v >> 16).toByte; b(p + 3) = (v >> 24).toByte
  }
}
