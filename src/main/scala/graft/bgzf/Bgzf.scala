package graft.bgzf

import java.util.zip.{CRC32, Deflater, Inflater}

/** BGZF (Blocked GNU Zip Format) primitives — the splittability layer under
  * BAM and compressed VCF.
  *
  * A BGZF file is a sequence of independent gzip members, each ≤ 64 KiB
  * compressed, carrying a `BC` extra subfield with the compressed block size.
  * A *virtual file offset* addresses a byte as
  * `(compressedBlockStart << 16) | offsetWithinUncompressedBlock`.
  *
  * Spec: SAM/BAM specification §4 (samtools/hts-specs, public). Reference
  * behavior: /root/reference impl/formats/bgzf/BgzfBlockGuesser.java:76-149
  * (block sniffing), BamSource.java:141-145 (virtual offset math).
  */
object Bgzf {

  /** Fixed gzip member header with FEXTRA and the 6-byte BC subfield. */
  val HeaderLength = 18
  /** CRC32 + ISIZE trailer. */
  val FooterLength = 8
  /** BSIZE is (total block size - 1) as uint16, so a block is ≤ 65536 B. */
  val MaxBlockSize = 65536
  /** Max uncompressed payload we place in one block (htsjdk-compatible
    * headroom so even incompressible data fits after stored-mode deflate).
    */
  val MaxUncompressedPayload = 65280

  /** The spec-mandated 28-byte empty terminator block (SAM spec §4.1.2).
    * Same constant the reference writes via htsjdk at BamSink.java:62-65.
    */
  val EofBlock: Array[Byte] = Array(
    0x1f, 0x8b, 0x08, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00, 0xff, 0x06, 0x00,
    0x42, 0x43, 0x02, 0x00, 0x1b, 0x00, 0x03, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00).map(_.toByte)

  // ---- virtual offsets -------------------------------------------------

  def makeVirtualOffset(blockStart: Long, intra: Int): Long = {
    require(intra >= 0 && intra <= 0xffff, s"intra-block offset out of range: $intra")
    (blockStart << 16) | intra
  }
  def blockStart(voff: Long): Long = voff >>> 16
  def intraOffset(voff: Long): Int = (voff & 0xffff).toInt

  // ---- header parsing --------------------------------------------------

  private def u8(b: Byte): Int = b & 0xff
  private def u16le(a: Array[Byte], off: Int): Int = u8(a(off)) | (u8(a(off + 1)) << 8)
  private def u32le(a: Array[Byte], off: Int): Long =
    (u8(a(off)) | (u8(a(off + 1)) << 8) | (u8(a(off + 2)) << 16)).toLong | (u8(a(off + 3)).toLong << 24)

  /** Validate a BGZF member header at `off` and return the total compressed
    * block length, or -1 if this is not a valid BGZF header. Requires at
    * least `HeaderLength`-ish bytes available; validates the full extra
    * subfield chain like the reference guesser (BgzfBlockGuesser.java:96-148)
    * so a random `1f 8b` in compressed data rarely false-positives.
    */
  def parseBlockLength(a: Array[Byte], off: Int, avail: Int): Int = {
    if (avail < 12) return -1
    if (u8(a(off)) != 0x1f || u8(a(off + 1)) != 0x8b) return -1
    if (u8(a(off + 2)) != 8 || (u8(a(off + 3)) & 0x04) == 0) return -1
    val xlen = u16le(a, off + 10)
    if (xlen < 6 || avail < 12 + xlen) return -1
    // walk the subfield chain; it must tile XLEN exactly and contain BC
    var p = off + 12
    val endExtra = off + 12 + xlen
    var bsize = -1
    while (p + 4 <= endExtra) {
      val si1 = u8(a(p)); val si2 = u8(a(p + 1)); val slen = u16le(a, p + 2)
      if (p + 4 + slen > endExtra) return -1
      if (si1 == 0x42 && si2 == 0x43) {
        if (slen != 2) return -1
        bsize = u16le(a, p + 4) + 1
      }
      p += 4 + slen
    }
    if (p != endExtra || bsize < HeaderLength + FooterLength - 6 + xlen) return -1
    bsize
  }

  // ---- block compression ------------------------------------------------

  /** Compress `len` bytes into one complete BGZF member (one-shot; tests and
    * cold paths). Hot write paths hold a [[BgzfBlockCompressor]] instead —
    * `Deflater` construction is a JNI/native-buffer allocation, so doing it
    * per 64 KiB block taxes every sink write.
    */
  def compressBlock(data: Array[Byte], off: Int, len: Int, level: Int = Deflater.DEFAULT_COMPRESSION): Array[Byte] = {
    val c = new BgzfBlockCompressor(level)
    try c.compress(data, off, len) finally c.end()
  }

  /** Inflate the CDATA of a block whose full bytes sit in `comp[off, off+blockLen)`.
    * Returns the uncompressed length written into `out` (ISIZE-verified).
    * One-shot; hot readers pass their own reusable `Inflater` to the overload.
    */
  def inflateBlock(comp: Array[Byte], off: Int, blockLen: Int, out: Array[Byte]): Int = {
    val inf = new Inflater(true)
    try inflateBlock(comp, off, blockLen, out, inf) finally inf.end()
  }

  /** Inflate with a caller-owned `Inflater` (reset here between blocks). */
  def inflateBlock(comp: Array[Byte], off: Int, blockLen: Int, out: Array[Byte],
                   inf: Inflater): Int = {
    val xlen = u16le(comp, off + 10)
    val cdataOff = off + 12 + xlen
    val cdataLen = blockLen - (12 + xlen) - FooterLength
    val isize = u32le(comp, off + blockLen - 4).toInt
    require(isize >= 0 && isize <= out.length, s"ISIZE out of range: $isize")
    inf.reset()
    inf.setInput(comp, cdataOff, cdataLen)
    var n = 0
    while (!inf.finished() && n < isize) {
      val got = inf.inflate(out, n, isize - n)
      if (got == 0 && inf.needsInput()) throw new java.io.IOException("truncated BGZF block")
      n += got
    }
    require(n == isize, s"BGZF ISIZE mismatch: expected $isize, got $n")
    n
  }
}

/** Reusable per-writer BGZF block compressor: one `Deflater` (plus a lazily
  * created stored-mode one for the incompressible fallback), one `CRC32`,
  * and one scratch buffer, `reset()` between blocks. Not thread-safe — one
  * instance per writer, exactly like the stream that owns it.
  *
  * `level` is a deflate level 0..9 or `Deflater.DEFAULT_COMPRESSION` (-1).
  */
final class BgzfBlockCompressor(level: Int) {
  import Bgzf._
  require(level == Deflater.DEFAULT_COMPRESSION || (level >= 0 && level <= 9),
    s"compression level out of range: $level")
  private val deflater = new Deflater(level, true)
  private var storedDeflater: Deflater = null // lazily created; rarely needed
  private val crc = new CRC32
  private val cbuf = new Array[Byte](MaxBlockSize + 1024)
  private var ended = false

  private def deflateInto(d: Deflater, data: Array[Byte], off: Int, len: Int): Int = {
    d.reset()
    d.setInput(data, off, len)
    d.finish()
    var n = 0
    while (!d.finished() && n < cbuf.length) n += d.deflate(cbuf, n, cbuf.length - n)
    n
  }

  /** Compress `len` bytes into one complete BGZF member. */
  def compress(data: Array[Byte], off: Int, len: Int): Array[Byte] = {
    require(!ended, "compressor already ended")
    require(len <= MaxUncompressedPayload, s"payload too large for one block: $len")
    var clen = deflateInto(deflater, data, off, len)
    if (HeaderLength + clen + FooterLength > MaxBlockSize) {
      // incompressible: redo with stored-mode deflate (level 0), guaranteed to fit
      if (storedDeflater == null) storedDeflater = new Deflater(Deflater.NO_COMPRESSION, true)
      clen = deflateInto(storedDeflater, data, off, len)
    }
    val total = HeaderLength + clen + FooterLength
    require(total <= MaxBlockSize, s"BGZF block overflow: $total")
    val out = new Array[Byte](total)
    out(0) = 0x1f.toByte; out(1) = 0x8b.toByte; out(2) = 8; out(3) = 4
    // MTIME(4)=0, XFL=0, OS=0xff
    out(9) = 0xff.toByte
    out(10) = 6; out(11) = 0 // XLEN=6
    out(12) = 0x42; out(13) = 0x43; out(14) = 2; out(15) = 0
    val bsize = total - 1
    out(16) = (bsize & 0xff).toByte; out(17) = ((bsize >> 8) & 0xff).toByte
    System.arraycopy(cbuf, 0, out, HeaderLength, clen)
    crc.reset()
    crc.update(data, off, len)
    val c = crc.getValue
    var p = HeaderLength + clen
    out(p) = (c & 0xff).toByte; out(p + 1) = ((c >> 8) & 0xff).toByte
    out(p + 2) = ((c >> 16) & 0xff).toByte; out(p + 3) = ((c >> 24) & 0xff).toByte
    p += 4
    out(p) = (len & 0xff).toByte; out(p + 1) = ((len >> 8) & 0xff).toByte
    out(p + 2) = ((len >> 16) & 0xff).toByte; out(p + 3) = ((len >> 24) & 0xff).toByte
    out
  }

  /** Release native deflater resources. Idempotent. */
  def end(): Unit = if (!ended) {
    ended = true
    deflater.end()
    if (storedDeflater != null) storedDeflater.end()
  }
}
