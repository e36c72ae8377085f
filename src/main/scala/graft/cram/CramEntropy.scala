package graft.cram

import java.io.IOException

/** CRAM record-layer entropy codecs (hts-specs CRAM v3.0 §12 "Encodings"):
  * the per-data-series value codecs that read from the slice's core
  * bit-stream or external byte blocks. The reference consumes these through
  * htsjdk inside its RDD readers (CramSource.java:57-151); here they are
  * plain Scala so record decode can run inside a DSv2 partition reader.
  *
  * Core bits are MSB-first. Canonical Huffman assigns codes in order of
  * (bit length, symbol value); a single zero-length symbol consumes no bits
  * (the constant-series form htsjdk emits for e.g. `RL` on uniform reads).
  */
final class BitReader(data: Array[Byte]) {
  private var pos = 0
  private var bit = 0

  def readBit(): Int = {
    if (pos >= data.length) throw new IOException("CRAM core bit-stream exhausted")
    val b = (data(pos) >> (7 - bit)) & 1
    bit += 1
    if (bit == 8) { bit = 0; pos += 1 }
    b
  }

  def readBits(n: Int): Int = {
    var v = 0
    var i = 0
    while (i < n) { v = (v << 1) | readBit(); i += 1 }
    v
  }
}

final class BitWriter {
  private val out = new java.io.ByteArrayOutputStream()
  private var cur = 0
  private var nbits = 0

  def writeBits(v: Int, n: Int): Unit = {
    var i = n - 1
    while (i >= 0) {
      cur = (cur << 1) | ((v >> i) & 1)
      nbits += 1
      if (nbits == 8) { out.write(cur); cur = 0; nbits = 0 }
      i -= 1
    }
  }

  def toByteArray: Array[Byte] = {
    if (nbits > 0) { out.write(cur << (8 - nbits)); cur = 0; nbits = 0 }
    out.toByteArray
  }
}

/** Positioned views over a slice's external blocks, keyed by content id.
  * `resolve` may decompress lazily — a stream never read is a block never
  * inflated (the whole point of the record-level field projection) — so
  * resolved buffers are memoized here.
  */
final class ExtStreams(resolve: Int => Option[Array[Byte]],
                       /** Test seam: observes every byte-array VALUE
                         * materialization (length) on the external-stream read
                         * paths, so a spec can prove consumed-but-unwanted
                         * values are position-skipped, never copied. Reader-
                         * local (one ExtStreams per slice decode) — null in
                         * production, a plain field read in the hot loop.
                         */
                       private[cram] val probe: Int => Unit = null) {
  def this(blocks: Map[Int, Array[Byte]]) = this(blocks.get _)

  private val cache = scala.collection.mutable.Map.empty[Int, Array[Byte]]
  private val pos = scala.collection.mutable.Map.empty[Int, Int].withDefaultValue(0)

  private def buf(cid: Int): Array[Byte] =
    cache.getOrElseUpdate(cid,
      resolve(cid).getOrElse(throw new IOException(s"CRAM external block $cid missing")))

  def readItf8(cid: Int): Int = {
    val b = buf(cid)
    val p = pos(cid)
    val (v, n) = Itf8.read(b, p)
    pos(cid) = p + n
    v
  }

  def readByte(cid: Int): Int = {
    val b = buf(cid)
    val p = pos(cid)
    if (p >= b.length) throw new IOException(s"CRAM external block $cid exhausted")
    pos(cid) = p + 1
    b(p) & 0xff
  }

  def readUntil(cid: Int, stop: Int): Array[Byte] = {
    val b = buf(cid)
    val p = pos(cid)
    var q = p
    while (q < b.length && (b(q) & 0xff) != stop) q += 1
    // a BYTE_ARRAY_STOP value always terminates with the stop byte; hitting
    // end-of-block first is a structural error (truncated/corrupt block) —
    // returning the tail would silently hand one field the rest of the
    // block and surface only as an opaque failure on the NEXT record
    if (q >= b.length)
      throw new IOException(
        f"CRAM external block $cid missing stop byte 0x$stop%02x (read from $p, block length ${b.length})")
    pos(cid) = q + 1 // consume the stop byte
    if (probe != null) probe(q - p)
    java.util.Arrays.copyOfRange(b, p, q)
  }

  /** [[readUntil]]'s stream advancement without the copy — the consume path
    * for values that exist only to keep a shared stream in sync.
    */
  def skipUntil(cid: Int, stop: Int): Unit = {
    val b = buf(cid)
    val p = pos(cid)
    var q = p
    while (q < b.length && (b(q) & 0xff) != stop) q += 1
    if (q >= b.length)
      throw new IOException(
        f"CRAM external block $cid missing stop byte 0x$stop%02x (read from $p, block length ${b.length})")
    pos(cid) = q + 1
  }

  /** Advance `n` raw bytes (the skip face of n×readByte), bounds-checked. */
  def skipBytes(cid: Int, n: Int): Unit = {
    val b = buf(cid)
    val p = pos(cid)
    if (n < 0 || p + n > b.length)
      throw new IOException(s"CRAM external block $cid exhausted (skip $n at $p of ${b.length})")
    pos(cid) = p + n
  }
}

/** One parsed encoding = a value codec. Series types decide which read is
  * legal; mismatches are structural errors in the file.
  */
sealed trait CCodec {
  def readInt(bits: BitReader, ext: ExtStreams): Int =
    throw new IOException(s"codec $this cannot produce ints")
  def readByte(bits: BitReader, ext: ExtStreams): Int =
    throw new IOException(s"codec $this cannot produce bytes")
  def readArray(bits: BitReader, ext: ExtStreams): Array[Byte] =
    throw new IOException(s"codec $this cannot produce byte arrays")
  /** Which streams a read consumes — the skip-eligibility signal for field
    * projection: a series is skippable only if it never touches the shared
    * core bit-stream and its external blocks are exclusively its own.
    */
  def usesCore: Boolean
  def extIds: Set[Int]

  /** Advance every stream exactly as [[readArray]] would, materializing
    * nothing — the consume path for gated-but-unskippable values (kept only
    * to hold shared streams in sync). Default: read and discard; external
    * codecs override with a pure position skip.
    */
  def skipArray(bits: BitReader, ext: ExtStreams): Unit = { readArray(bits, ext); () }
}

/** EXTERNAL (id 1): ITF-8 ints / raw bytes from block `cid`. */
final case class CExternal(cid: Int) extends CCodec {
  override def readInt(bits: BitReader, ext: ExtStreams): Int = ext.readItf8(cid)
  override def readByte(bits: BitReader, ext: ExtStreams): Int = ext.readByte(cid)
  override def usesCore: Boolean = false
  override def extIds: Set[Int] = Set(cid)
}

/** HUFFMAN (id 3), canonical over (bit length, symbol). */
final case class CHuffman(syms: Array[Int], lens: Array[Int]) extends CCodec {
  private val single: Boolean = syms.length == 1 && lens(0) == 0
  // canonical code assignment
  private val (codeLens, codes, values) = {
    val order = syms.indices.sortBy(i => (lens(i), syms(i)))
    val cl = new Array[Int](order.length)
    val cd = new Array[Int](order.length)
    val vs = new Array[Int](order.length)
    var code = 0
    var prevLen = 0
    var k = 0
    order.foreach { i =>
      code <<= (lens(i) - prevLen)
      prevLen = lens(i)
      cl(k) = lens(i); cd(k) = code; vs(k) = syms(i)
      code += 1
      k += 1
    }
    (cl, cd, vs)
  }

  override def readInt(bits: BitReader, ext: ExtStreams): Int = {
    if (single) return syms(0)
    var len = 0
    var code = 0
    var k = 0
    while (true) {
      code = (code << 1) | bits.readBit()
      len += 1
      while (k < codeLens.length && codeLens(k) == len) {
        if (codes(k) == code) return values(k)
        k += 1
      }
      if (len > 31) throw new IOException("bad canonical Huffman stream")
    }
    0 // unreachable
  }
  override def readByte(bits: BitReader, ext: ExtStreams): Int = readInt(bits, ext)
  override def usesCore: Boolean = !single // a zero-length single consumes nothing
  override def extIds: Set[Int] = Set.empty
}

/** BETA (id 6): fixed-width `nbits` minus `offset`. */
final case class CBeta(offset: Int, nbits: Int) extends CCodec {
  override def readInt(bits: BitReader, ext: ExtStreams): Int = bits.readBits(nbits) - offset
  override def readByte(bits: BitReader, ext: ExtStreams): Int = readInt(bits, ext)
  override def usesCore: Boolean = nbits > 0
  override def extIds: Set[Int] = Set.empty
}

/** GAMMA (id 9): Elias gamma minus `offset`. */
final case class CGamma(offset: Int) extends CCodec {
  override def readInt(bits: BitReader, ext: ExtStreams): Int = {
    var n = 0
    while (bits.readBit() == 0) { n += 1; if (n > 31) throw new IOException("bad gamma code") }
    var v = 1
    var i = 0
    while (i < n) { v = (v << 1) | bits.readBit(); i += 1 }
    v - offset
  }
  override def usesCore: Boolean = true
  override def extIds: Set[Int] = Set.empty
}

/** SUBEXP (id 7): sub-exponential with parameter `k`, minus `offset`. */
final case class CSubExp(offset: Int, k: Int) extends CCodec {
  override def readInt(bits: BitReader, ext: ExtStreams): Int = {
    var n = 0
    while (bits.readBit() == 1) { n += 1; if (n > 31) throw new IOException("bad subexp code") }
    val u =
      if (n == 0) bits.readBits(k)
      else (1 << (k + n - 1)) | bits.readBits(k + n - 1)
    u - offset
  }
  override def usesCore: Boolean = true
  override def extIds: Set[Int] = Set.empty
}

/** BYTE_ARRAY_LEN (id 4): nested length codec + per-byte value codec. */
final case class CByteArrayLen(lenCodec: CCodec, valCodec: CCodec) extends CCodec {
  override def readArray(bits: BitReader, ext: ExtStreams): Array[Byte] = {
    val n = lenCodec.readInt(bits, ext)
    if (n < 0) throw new IOException(s"negative byte array length $n")
    if (ext.probe != null) ext.probe(n)
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = valCodec.readByte(bits, ext).toByte; i += 1 }
    out
  }
  override def skipArray(bits: BitReader, ext: ExtStreams): Unit = {
    val n = lenCodec.readInt(bits, ext) // length still decoded (it drives the skip)
    if (n < 0) throw new IOException(s"negative byte array length $n")
    valCodec match {
      case CExternal(cid) => ext.skipBytes(cid, n) // pure position skip
      case vc => var i = 0; while (i < n) { vc.readByte(bits, ext); i += 1 }
    }
  }
  override def usesCore: Boolean = lenCodec.usesCore || valCodec.usesCore
  override def extIds: Set[Int] = lenCodec.extIds ++ valCodec.extIds
}

/** BYTE_ARRAY_STOP (id 5): bytes from block `cid` until `stop`. */
final case class CByteArrayStop(stop: Int, cid: Int) extends CCodec {
  override def readArray(bits: BitReader, ext: ExtStreams): Array[Byte] = ext.readUntil(cid, stop)
  override def skipArray(bits: BitReader, ext: ExtStreams): Unit = ext.skipUntil(cid, stop)
  override def usesCore: Boolean = false
  override def extIds: Set[Int] = Set(cid)
}

object Encoding {
  /** Parse one encoding descriptor `(codecId, paramLen, params)` at `off`;
    * returns the codec and the new offset.
    */
  def parse(buf: Array[Byte], off: Int): (CCodec, Int) = {
    val (codecId, n1) = Itf8.read(buf, off)
    val (plen, n2) = Itf8.read(buf, off + n1)
    val pOff = off + n1 + n2
    val end = pOff + plen
    val codec = codecId match {
      case 0 => null // NULL encoding: series absent
      case 1 =>
        val (cid, _) = Itf8.read(buf, pOff); CExternal(cid)
      case 3 =>
        var p = pOff
        val (nv, a) = Itf8.read(buf, p); p += a
        val syms = new Array[Int](nv)
        var i = 0
        while (i < nv) { val (v, n) = Itf8.read(buf, p); syms(i) = v; p += n; i += 1 }
        val (nl, b) = Itf8.read(buf, p); p += b
        require(nl == nv, s"Huffman symbol/length count mismatch $nv/$nl")
        val lens = new Array[Int](nl)
        i = 0
        while (i < nl) { val (v, n) = Itf8.read(buf, p); lens(i) = v; p += n; i += 1 }
        CHuffman(syms, lens)
      case 4 =>
        val (lenC, p1) = parse(buf, pOff)
        val (valC, _) = parse(buf, p1)
        CByteArrayLen(lenC, valC)
      case 5 =>
        val stop = buf(pOff) & 0xff
        val (cid, _) = Itf8.read(buf, pOff + 1)
        CByteArrayStop(stop, cid)
      case 6 =>
        val (o, a) = Itf8.read(buf, pOff)
        val (w, _) = Itf8.read(buf, pOff + a)
        CBeta(o, w)
      case 7 =>
        val (o, a) = Itf8.read(buf, pOff)
        val (k, _) = Itf8.read(buf, pOff + a)
        CSubExp(o, k)
      case 9 =>
        val (o, _) = Itf8.read(buf, pOff); CGamma(o)
      case other => throw new IOException(s"unsupported CRAM encoding id $other")
    }
    (codec, end)
  }

  // ---- descriptor serialization (writer side) ------------------------------

  private def withParams(codecId: Int, params: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Itf8.write(codecId))
    bos.write(Itf8.write(params.length))
    bos.write(params, 0, params.length)
    bos.toByteArray
  }

  def external(cid: Int): Array[Byte] = withParams(1, Itf8.write(cid))

  def byteArrayStop(stop: Int, cid: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(stop)
    bos.write(Itf8.write(cid))
    withParams(5, bos.toByteArray)
  }

  /** BYTE_ARRAY_LEN with ITF-8 lengths and value bytes in ONE external
    * block — the htsjdk tag-value shape (length then payload, sequential).
    */
  def byteArrayLenExternal(cid: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ext = external(cid)
    bos.write(ext, 0, ext.length)
    bos.write(ext, 0, ext.length)
    withParams(4, bos.toByteArray)
  }
}
