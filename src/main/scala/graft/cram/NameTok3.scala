package graft.cram

import java.io.IOException

/** Read-name tokenizer — CRAM 3.1's block compression method 8 (public
  * hts-specs "CRAM compression codecs" document §Name tokenisation;
  * htslib reaches it through htscodecs' tokenise_name3). Names are split
  * into digit / non-digit tokens; each (token position, token type) pair
  * owns a byte stream; a name is coded against an earlier name as
  * DUP (identical), or DIFF plus per-token MATCH / DELTA / literal forms —
  * so the wildly redundant instrument:run:flowcell:lane:tile:x:y shape of
  * real read names collapses to a handful of small, highly compressible
  * streams, each entropy-coded with rANS Nx16 or the adaptive arithmetic
  * coder.
  *
  * Layout: uint32-LE uncompressed length; uint32-LE name count; 1 byte
  * use_arith; then per stream a descriptor byte (bit 7 = first stream of a
  * new token position, bit 6 = duplicate-of reference, low 6 bits = token
  * type) followed by either a 2-byte (position, type) reference or a uint7
  * length + the compressed stream. A new position whose first descriptor
  * is a non-TYPE stream implies a uniform TYPE stream of that type.
  * Names separate with '\0' (the RN series' BYTE_ARRAY_STOP byte).
  *
  * Scope note (documented de-risk): decode covers DUP/DIFF, MATCH,
  * ALPHA/CHAR, DIGITS/DIGITS0(+DZLEN), DELTA/DELTA0, NOP/END, implicit
  * uniform TYPE streams and duplicate-stream references, with both inner
  * entropy families. The encoder emits the explicit-TYPE subset (always
  * DIFF against the immediately previous name, dist 1) and is opt-in at
  * the sink (`names=tok3`) — our default 3.1 output keeps gzip'd RN
  * blocks, which every reader decodes. No htslib exists in this
  * environment to cross-validate the byte format; the descriptor bits and
  * the DIFF distance origin are the first things to diff against
  * htscodecs if a foreign file disagrees (README §limitations).
  */
object NameTok3 {
  // token type codes (spec order)
  private val TType = 0
  private val TAlpha = 1
  private val TChar = 2
  private val TDigits0 = 3
  private val TDzLen = 4
  private val TDup = 5
  private val TDiff = 6
  private val TDigits = 7
  private val TDelta = 8
  private val TDelta0 = 9
  private val TMatch = 10
  private val TNop = 11
  private val TEnd = 12

  private val Sep = 0 // name separator in the raw blob ('\0', the RN stop byte)

  /** One resolved token: its literal bytes plus, for numeric kinds, the
    * value/zero-padded-length needed by a later DELTA/DELTA0.
    */
  private final case class Tok(kind: Int, text: String, num: Long, zlen: Int)

  // ---- decode --------------------------------------------------------------

  /** Decompress a complete method-8 stream; the result must measure
    * `blockRawSize` (the CRAM block header's raw size) when that is ≥ 0.
    */
  def uncompress(in: Array[Byte], blockRawSize: Int): Array[Byte] = {
    try {
      val out = decode(in, blockRawSize)
      if (blockRawSize >= 0 && out.length != blockRawSize)
        throw new IOException(s"tok3 length mismatch: got ${out.length}, want $blockRawSize")
      out
    } catch {
      case e: IOException => throw e
      case e @ (_: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException |
                _: IllegalArgumentException | _: NumberFormatException) =>
        throw new IOException(s"corrupt tok3 stream: $e")
    }
  }

  private def le32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL)) | ((b(p + 1) & 0xffL) << 8) | ((b(p + 2) & 0xffL) << 16) |
      ((b(p + 3) & 0xffL) << 24)

  /** Positioned byte cursor over one decoded token stream. */
  private final class S(val b: Array[Byte]) {
    var p = 0
    def u8(): Int = {
      if (p >= b.length) throw new IOException("tok3 token stream exhausted")
      val v = b(p) & 0xff; p += 1; v
    }
    def u32(): Long = {
      if (p + 4 > b.length) throw new IOException("tok3 token stream exhausted")
      val v = le32(b, p); p += 4; v
    }
    def untilZero(): String = {
      val start = p
      while (p < b.length && b(p) != 0) p += 1
      if (p >= b.length) throw new IOException("tok3 ALPHA missing terminator")
      val s = new String(b, start, p - start, "UTF-8")
      p += 1
      s
    }
  }

  private def decode(in: Array[Byte], expectLen: Int): Array[Byte] = {
    if (in.length < 9) throw new IOException("tok3 stream too short")
    val ulen = le32(in, 0)
    val nnames = le32(in, 4).toInt
    if (nnames < 0 || ulen < 0 || ulen > Int.MaxValue)
      throw new IOException(s"bad tok3 header (ulen=$ulen, nnames=$nnames)")
    // validate header sizes BEFORE any size-driven allocation: the block's
    // raw size bounds ulen, and every name costs at least its separator
    // byte — a corrupt header must fail here, not as a 2 GB allocation
    if (expectLen >= 0 && ulen != expectLen)
      throw new IOException(s"tok3 stored length $ulen != expected $expectLen")
    if (nnames > ulen)
      throw new IOException(s"tok3 $nnames names cannot fit in $ulen bytes")
    val useArith = in(8) & 0xff
    // parse (position, type) -> stream bytes
    val streams = scala.collection.mutable.Map.empty[(Int, Int), Array[Byte]]
    var pos = -1
    var i = 9
    while (i < in.length) {
      val desc = in(i) & 0xff; i += 1
      val isNew = (desc & 0x80) != 0
      val isDup = (desc & 0x40) != 0
      val typ = desc & 0x3f
      if (typ > TEnd) throw new IOException(s"bad tok3 token type $typ")
      if (isNew) {
        pos += 1
        if (typ != TType)
          // implicit uniform TYPE stream: every name's token here has `typ`
          streams((pos, TType)) = Array.fill[Byte](nnames)(typ.toByte)
      }
      if (pos < 0) throw new IOException("tok3 stream before first position")
      if (isDup) {
        if (i + 2 > in.length) throw new IOException("tok3 dup reference truncated")
        val dp = in(i) & 0xff
        val dt = in(i + 1) & 0xff
        i += 2
        streams((pos, typ)) = streams.getOrElse((dp, dt),
          throw new IOException(s"tok3 dup reference ($dp,$dt) unresolved"))
      } else {
        // uint7 length, then an inner entropy container with embedded size
        var clen = 0
        var groups = 0
        var b = in(i) & 0xff; i += 1
        while ((b & 0x80) != 0) {
          clen = (clen << 7) | (b & 0x7f)
          if (i >= in.length) throw new IOException("tok3 varint truncated")
          b = in(i) & 0xff; i += 1
          groups += 1
          if (groups > 4) throw new IOException("tok3 varint overruns uint32")
        }
        clen = (clen << 7) | b
        if (i + clen > in.length) throw new IOException("tok3 stream truncated")
        val packed = java.util.Arrays.copyOfRange(in, i, i + clen)
        i += clen
        streams((pos, typ)) =
          if (useArith != 0) ArithDynamic.uncompress(packed, -1)
          else RansNx16.uncompress(packed, -1)
      }
    }
    val cur = streams.map { case (k, v) => k -> new S(v) }
    def stream(t: Int, typ: Int): S =
      cur.getOrElse((t, typ), throw new IOException(s"tok3 missing stream ($t,$typ)"))
    // reconstruct
    val toks = new Array[IndexedSeq[Tok]](nnames)
    val out = new java.io.ByteArrayOutputStream(math.max(16, ulen.toInt))
    var n = 0
    while (n < nnames) {
      val t0 = stream(0, TType).u8()
      t0 match {
        case TDup =>
          val dist = stream(0, TDup).u32().toInt
          if (dist <= 0 || dist > n) throw new IOException(s"tok3 DUP distance $dist at $n")
          toks(n) = toks(n - dist)
          toks(n).foreach(tk => out.write(tk.text.getBytes("UTF-8")))
          out.write(Sep)
        case TDiff =>
          val dist = stream(0, TDiff).u32().toInt
          if (dist > n || dist < 0) throw new IOException(s"tok3 DIFF distance $dist at $n")
          val prev: IndexedSeq[Tok] = if (dist > 0) toks(n - dist) else null
          val mine = IndexedSeq.newBuilder[Tok]
          var t = 1
          var done = false
          while (!done) {
            val typ = stream(t, TType).u8()
            def prevTok: Tok = {
              if (prev == null || t - 1 >= prev.length)
                throw new IOException(s"tok3 back-reference without token at position $t")
              prev(t - 1)
            }
            typ match {
              case TMatch =>
                mine += prevTok
              case TAlpha =>
                val s = stream(t, TAlpha).untilZero()
                mine += Tok(TAlpha, s, 0, 0)
              case TChar =>
                val c = stream(t, TChar).u8()
                mine += Tok(TChar, c.toChar.toString, 0, 0)
              case TDigits =>
                val v = stream(t, TDigits).u32()
                mine += Tok(TDigits, v.toString, v, 0)
              case TDigits0 =>
                val v = stream(t, TDigits0).u32()
                val dl = stream(t, TDzLen).u8()
                val s = v.toString
                val padded = ("0" * math.max(0, dl - s.length)) + s
                mine += Tok(TDigits0, padded, v, dl)
              case TDelta =>
                val p = prevTok
                val v = p.num + stream(t, TDelta).u8()
                mine += Tok(TDigits, v.toString, v, 0)
              case TDelta0 =>
                val p = prevTok
                val v = p.num + stream(t, TDelta0).u8()
                val s = v.toString
                val padded = ("0" * math.max(0, p.zlen - s.length)) + s
                mine += Tok(TDigits0, padded, v, p.zlen)
              case TNop => // nothing at this position
              case TEnd => done = true
              case other => throw new IOException(s"tok3 unexpected token type $other at $t")
            }
            t += 1
            if (t > (1 << 16)) throw new IOException("tok3 runaway name")
          }
          toks(n) = mine.result()
          toks(n).foreach(tk => out.write(tk.text.getBytes("UTF-8")))
          out.write(Sep)
        case other => throw new IOException(s"tok3 name must open DUP/DIFF, got $other")
      }
      n += 1
    }
    out.toByteArray
  }

  // ---- encode --------------------------------------------------------------

  /** Compress a `name\0name\0…` blob (the RN external block's raw form).
    * Every stream is explicit; each name DIFFs against its immediate
    * predecessor (DUP when identical). Inner streams take the smaller of
    * entropy order 0/1 in the chosen family. Throws IllegalArgumentException
    * when the blob isn't separator-terminated names — callers fall back to
    * a general-purpose method.
    */
  def compress(blob: Array[Byte], useArith: Boolean): Array[Byte] = {
    require(blob.nonEmpty && blob(blob.length - 1) == Sep,
      "tok3 input must be zero-terminated names")
    val names = {
      val ns = IndexedSeq.newBuilder[String]
      var start = 0
      var i = 0
      while (i < blob.length) {
        if (blob(i) == Sep) { ns += new String(blob, start, i - start, "UTF-8"); start = i + 1 }
        i += 1
      }
      ns.result()
    }
    val streams = scala.collection.mutable.Map.empty[(Int, Int),
      java.io.ByteArrayOutputStream]
    def s(t: Int, typ: Int) = streams.getOrElseUpdate((t, typ),
      new java.io.ByteArrayOutputStream())
    def w32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
      o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
      o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt)
    }
    var prev: IndexedSeq[Tok] = null
    var prevName: String = null
    names.foreach { name =>
      if (prevName != null && name == prevName) {
        s(0, TType).write(TDup)
        w32(s(0, TDup), 1L)
      } else {
        s(0, TType).write(TDiff)
        w32(s(0, TDiff), if (prev == null) 0L else 1L)
        val mine = tokenize(name)
        var t = 1
        mine.foreach { tk =>
          val p = if (prev != null && t - 1 < prev.length) prev(t - 1) else null
          if (p != null && p.kind == tk.kind && p.text == tk.text) {
            s(t, TType).write(TMatch)
          } else if (p != null && p.kind == TDigits && tk.kind == TDigits &&
                     tk.num - p.num >= 0 && tk.num - p.num <= 255) {
            s(t, TType).write(TDelta)
            s(t, TDelta).write((tk.num - p.num).toInt)
          } else if (p != null && p.kind == TDigits0 && tk.kind == TDigits0 &&
                     p.zlen == tk.zlen && tk.num - p.num >= 0 && tk.num - p.num <= 255) {
            s(t, TType).write(TDelta0)
            s(t, TDelta0).write((tk.num - p.num).toInt)
          } else tk.kind match {
            case TAlpha =>
              s(t, TType).write(TAlpha)
              val b = tk.text.getBytes("UTF-8")
              s(t, TAlpha).write(b, 0, b.length); s(t, TAlpha).write(0)
            case TChar =>
              s(t, TType).write(TChar)
              s(t, TChar).write(tk.text.charAt(0).toInt)
            case TDigits =>
              s(t, TType).write(TDigits)
              w32(s(t, TDigits), tk.num)
            case TDigits0 =>
              s(t, TType).write(TDigits0)
              w32(s(t, TDigits0), tk.num)
              s(t, TDzLen).write(tk.zlen)
          }
          t += 1
        }
        s(t, TType).write(TEnd)
        prev = mine
        prevName = name
      }
    }
    // serialize: header, then streams in (position, type) order; the TYPE
    // stream (code 0) leads each position and carries the 0x80 marker
    val out = new java.io.ByteArrayOutputStream(blob.length / 2 + 64)
    w32(out, blob.length.toLong)
    w32(out, names.length.toLong)
    out.write(if (useArith) 1 else 0)
    val order = streams.keys.toSeq.sorted
    var lastPos = -1
    order.foreach { case (t, typ) =>
      val raw = streams((t, typ)).toByteArray
      val packed = bestEntropy(raw, useArith)
      out.write(typ | (if (t != lastPos) 0x80 else 0))
      lastPos = t
      RansNx16.writeVarint(out, packed.length)
      out.write(packed, 0, packed.length)
    }
    out.toByteArray
  }

  private def bestEntropy(raw: Array[Byte], useArith: Boolean): Array[Byte] = {
    val o0 = if (useArith) ArithDynamic.compress(raw, 0) else RansNx16.compress(raw, 0)
    val o1 = if (useArith) ArithDynamic.compress(raw, 1) else RansNx16.compress(raw, 1)
    if (o1.length < o0.length) o1 else o0
  }

  /** Digit runs become DIGITS (no leading zero, ≤9 digits) or DIGITS0
    * (leading zeros, recorded length); everything else accumulates into
    * ALPHA runs, except single non-alphanumeric bytes which ride as CHAR.
    */
  private def tokenize(name: String): IndexedSeq[Tok] = {
    val out = IndexedSeq.newBuilder[Tok]
    var i = 0
    while (i < name.length) {
      val c = name.charAt(i)
      if (c.isDigit) {
        var j = i
        while (j < name.length && name.charAt(j).isDigit) j += 1
        val run = name.substring(i, j)
        if (run.length <= 9 && (run.charAt(0) != '0' || run.length == 1))
          out += Tok(TDigits, run, run.toLong, 0)
        else if (run.length <= 255 && run.toLongOption.exists(_ <= 0xffffffffL))
          out += Tok(TDigits0, run, run.toLong, run.length)
        else
          out += Tok(TAlpha, run, 0, 0) // oversized number: literal bytes
        i = j
      } else if (!c.isLetter) {
        out += Tok(TChar, c.toString, 0, 0)
        i += 1
      } else {
        var j = i
        while (j < name.length && name.charAt(j).isLetter) j += 1
        out += Tok(TAlpha, name.substring(i, j), 0, 0)
        i = j
      }
    }
    out.result()
  }
}
