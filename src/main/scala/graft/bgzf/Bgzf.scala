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

  /** Compress `len` bytes into one complete BGZF member. */
  def compressBlock(data: Array[Byte], off: Int, len: Int, level: Int = Deflater.DEFAULT_COMPRESSION): Array[Byte] = {
    require(len <= MaxUncompressedPayload, s"payload too large for one block: $len")
    var cdata = deflate(data, off, len, level)
    if (HeaderLength + cdata.length + FooterLength > MaxBlockSize) {
      // incompressible: redo with stored-mode deflate (level 0), guaranteed to fit
      cdata = deflate(data, off, len, Deflater.NO_COMPRESSION)
    }
    val total = HeaderLength + cdata.length + FooterLength
    require(total <= MaxBlockSize, s"BGZF block overflow: $total")
    val out = new Array[Byte](total)
    out(0) = 0x1f.toByte; out(1) = 0x8b.toByte; out(2) = 8; out(3) = 4
    // MTIME(4)=0, XFL=0, OS=0xff
    out(9) = 0xff.toByte
    out(10) = 6; out(11) = 0 // XLEN=6
    out(12) = 0x42; out(13) = 0x43; out(14) = 2; out(15) = 0
    val bsize = total - 1
    out(16) = (bsize & 0xff).toByte; out(17) = ((bsize >> 8) & 0xff).toByte
    System.arraycopy(cdata, 0, out, HeaderLength, cdata.length)
    val crc = new CRC32
    crc.update(data, off, len)
    val c = crc.getValue
    var p = HeaderLength + cdata.length
    out(p) = (c & 0xff).toByte; out(p + 1) = ((c >> 8) & 0xff).toByte
    out(p + 2) = ((c >> 16) & 0xff).toByte; out(p + 3) = ((c >> 24) & 0xff).toByte
    p += 4
    out(p) = (len & 0xff).toByte; out(p + 1) = ((len >> 8) & 0xff).toByte
    out(p + 2) = ((len >> 16) & 0xff).toByte; out(p + 3) = ((len >> 24) & 0xff).toByte
    out
  }

  private def deflate(data: Array[Byte], off: Int, len: Int, level: Int): Array[Byte] = {
    val d = new Deflater(level, true)
    try {
      d.setInput(data, off, len)
      d.finish()
      val buf = new Array[Byte](MaxBlockSize + 1024)
      var n = 0
      while (!d.finished() && n < buf.length) n += d.deflate(buf, n, buf.length - n)
      java.util.Arrays.copyOf(buf, n)
    } finally d.end()
  }

  /** Inflate the CDATA of a block whose full bytes sit in `comp[off, off+blockLen)`.
    * Returns the uncompressed length written into `out` (ISIZE-verified).
    */
  def inflateBlock(comp: Array[Byte], off: Int, blockLen: Int, out: Array[Byte]): Int = {
    val xlen = u16le(comp, off + 10)
    val cdataOff = off + 12 + xlen
    val cdataLen = blockLen - (12 + xlen) - FooterLength
    val isize = u32le(comp, off + blockLen - 4).toInt
    require(isize >= 0 && isize <= out.length, s"ISIZE out of range: $isize")
    val inf = new Inflater(true)
    try {
      inf.setInput(comp, cdataOff, cdataLen)
      var n = 0
      while (!inf.finished() && n < isize) {
        val got = inf.inflate(out, n, isize - n)
        if (got == 0 && inf.needsInput()) throw new java.io.IOException("truncated BGZF block")
        n += got
      }
      require(n == isize, s"BGZF ISIZE mismatch: expected $isize, got $n")
      n
    } finally inf.end()
  }
}
