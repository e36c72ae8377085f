package graft.multimodal

import java.io.IOException
import java.util.zip.{CRC32, Deflater, Inflater}

/** Real PNG codec — pure JVM (`java.util.zip` for the zlib stream), no image
  * libraries. Retires the compressed-image half of the multimodal decode
  * stub: 8-bit truecolor (color type 2) and truecolor+alpha (color type 6),
  * with the full filter machinery the format actually uses — per-scanline
  * filter bytes 0–4 (None/Sub/Up/Average/Paeth) are both ENCODED (caller
  * picks the filter per row, so fixtures cover every type) and DECODED
  * (unfilter reconstructs against the left/up/up-left neighbors per spec
  * §9). Chunk framing is walked for real: 8-byte signature, IHDR first,
  * IDAT payloads concatenated across any number of chunks, unknown
  * ancillary chunks skipped, IEND terminates; every chunk CRC32 is
  * verified. Corrupt input fails with IOException, never wrong pixels.
  *
  * Out of scope (rejected loudly, not mis-decoded): interlace, palettes,
  * grayscale, bit depths other than 8 — the 100 TB pipeline posture is the
  * same as [[Wav]]/[[Bmp]]: decode exactly what we claim, fail on the rest.
  */
object Png {

  /** `pixels` row-major top-down, packed 0xAARRGGBB (alpha 0xff when the
    * source had no alpha channel).
    */
  final case class Image(width: Int, height: Int, pixels: Array[Int], hasAlpha: Boolean)

  private val Signature = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  /** Encode an image as a standalone PNG. `filterFor(row)` picks the
    * scanline filter (0–4) per row — defaults to a deterministic cycle so
    * every filter type appears in any image ≥5 rows tall. `idatChunkSize`
    * splits the compressed stream across multiple IDAT chunks (decoders
    * must concatenate; ours is tested against it).
    */
  def encode(img: Image, filterFor: Int => Int = _ % 5,
             idatChunkSize: Int = 32768, compressionLevel: Int = 6): Array[Byte] = {
    require(img.width > 0 && img.height > 0, "empty image")
    require(img.pixels.length == img.width * img.height, "pixel count")
    val bpp = if (img.hasAlpha) 4 else 3
    val stride = img.width * bpp
    val raw = new Array[Byte]((stride + 1) * img.height)
    val prior = new Array[Byte](stride) // previous row, unfiltered
    val cur = new Array[Byte](stride)
    var y = 0
    while (y < img.height) {
      var x = 0
      var o = 0
      while (x < img.width) {
        val p = img.pixels(y * img.width + x)
        cur(o) = (p >> 16).toByte; cur(o + 1) = (p >> 8).toByte; cur(o + 2) = p.toByte
        if (img.hasAlpha) { cur(o + 3) = (p >>> 24).toByte; o += 4 } else o += 3
        x += 1
      }
      val ft = filterFor(y)
      require(ft >= 0 && ft <= 4, s"filter type $ft")
      val rowOff = y * (stride + 1)
      raw(rowOff) = ft.toByte
      var i = 0
      while (i < stride) {
        val x0 = cur(i) & 0xff
        val a = if (i >= bpp) cur(i - bpp) & 0xff else 0
        val b = prior(i) & 0xff
        val c = if (i >= bpp) prior(i - bpp) & 0xff else 0
        val filtered = ft match {
          case 0 => x0
          case 1 => x0 - a
          case 2 => x0 - b
          case 3 => x0 - ((a + b) >> 1)
          case 4 => x0 - paeth(a, b, c)
        }
        raw(rowOff + 1 + i) = filtered.toByte
        i += 1
      }
      System.arraycopy(cur, 0, prior, 0, stride)
      y += 1
    }

    val deflater = new Deflater(compressionLevel)
    val compressed =
      try {
        deflater.setInput(raw)
        deflater.finish()
        val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
        val buf = new Array[Byte](16384)
        while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
        out.toByteArray
      } finally deflater.end()

    val out = new java.io.ByteArrayOutputStream(compressed.length + 128)
    out.write(Signature, 0, Signature.length)
    val ihdr = new Array[Byte](13)
    writeI32(ihdr, 0, img.width); writeI32(ihdr, 4, img.height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = (if (img.hasAlpha) 6 else 2).toByte // color type
    // compression 0, filter 0, interlace 0 already zero
    writeChunk(out, "IHDR", ihdr, 0, 13)
    var off = 0
    while (off < compressed.length) {
      val n = math.min(idatChunkSize, compressed.length - off)
      writeChunk(out, "IDAT", compressed, off, n)
      off += n
    }
    writeChunk(out, "IEND", Array.emptyByteArray, 0, 0)
    out.toByteArray
  }

  def decode(b: Array[Byte]): Image = {
    def fail(msg: String): Nothing = throw new IOException(s"bad PNG: $msg")
    if (b.length < 8 + 25) fail("shorter than signature + IHDR")
    var i = 0
    while (i < 8) { if (b(i) != Signature(i)) fail("signature"); i += 1 }

    var pos = 8
    var width = 0; var height = 0; var colorType = -1
    var sawIhdr = false; var sawIend = false
    val idat = new java.io.ByteArrayOutputStream(b.length)
    while (!sawIend) {
      if (pos + 8 > b.length) fail("truncated chunk header")
      val len = readI32(b, pos)
      // long arithmetic: a crafted len near Int.MaxValue would wrap
      // `pos + 12 + len` negative and slip past this guard into CRC32.update
      if (len < 0 || pos.toLong + 12L + len > b.length) fail(s"chunk length $len overruns file")
      val typ = new String(b, pos + 4, 4, "US-ASCII")
      val crc = new CRC32
      crc.update(b, pos + 4, 4 + len)
      if (crc.getValue.toInt != readI32(b, pos + 8 + len)) fail(s"$typ CRC mismatch")
      typ match {
        case "IHDR" =>
          if (sawIhdr) fail("duplicate IHDR")
          if (len != 13) fail(s"IHDR length $len")
          width = readI32(b, pos + 8); height = readI32(b, pos + 12)
          if (width <= 0 || height <= 0) fail(s"geometry ${width}x$height")
          // reject before allocating: crafted dimensions overflow the Int
          // products `(stride + 1) * height` / `width * height` below —
          // 2^28 pixels (≈1 GiB of filtered RGBA bytes) is far beyond any
          // legitimate fixture and keeps every product inside Int range
          if (width.toLong * height > (1L << 28)) fail(s"geometry ${width}x$height exceeds pixel bound")
          val bitDepth = b(pos + 16) & 0xff
          colorType = b(pos + 17) & 0xff
          if (bitDepth != 8) fail(s"unsupported bit depth $bitDepth")
          if (colorType != 2 && colorType != 6) fail(s"unsupported color type $colorType")
          if ((b(pos + 18) & 0xff) != 0) fail("compression method")
          if ((b(pos + 19) & 0xff) != 0) fail("filter method")
          if ((b(pos + 20) & 0xff) != 0) fail("interlaced PNG unsupported")
          sawIhdr = true
        case "IDAT" =>
          if (!sawIhdr) fail("IDAT before IHDR")
          idat.write(b, pos + 8, len)
        case "IEND" => sawIend = true
        case _ => // ancillary chunk (tEXt, pHYs, …): CRC-checked above, skipped
      }
      pos += 12 + len
    }
    if (!sawIhdr) fail("missing IHDR")
    if (idat.size() == 0) fail("no IDAT data")

    val hasAlpha = colorType == 6
    val bpp = if (hasAlpha) 4 else 3
    val stride = width * bpp
    val rawLen = (stride + 1) * height
    val raw = new Array[Byte](rawLen)
    val inflater = new Inflater()
    try {
      inflater.setInput(idat.toByteArray)
      var got = 0
      while (got < rawLen && !inflater.finished()) {
        val n = inflater.inflate(raw, got, rawLen - got)
        if (n == 0) {
          if (inflater.needsDictionary()) fail("zlib preset dictionary unsupported")
          if (inflater.needsInput()) fail("zlib stream truncated")
          if (!inflater.finished()) fail("zlib stream stalled")
        }
        got += n
      }
      if (got < rawLen) fail(s"decompressed $got of $rawLen filtered bytes")
    } catch {
      case e: java.util.zip.DataFormatException => fail(s"zlib: ${e.getMessage}")
    } finally inflater.end()

    val px = new Array[Int](width * height)
    val prior = new Array[Byte](stride)
    val cur = new Array[Byte](stride)
    var y = 0
    while (y < height) {
      val rowOff = y * (stride + 1)
      val ft = raw(rowOff) & 0xff
      if (ft > 4) fail(s"filter type $ft on row $y")
      var k = 0
      while (k < stride) {
        val f = raw(rowOff + 1 + k) & 0xff
        val a = if (k >= bpp) cur(k - bpp) & 0xff else 0
        val up = prior(k) & 0xff
        val c = if (k >= bpp) prior(k - bpp) & 0xff else 0
        cur(k) = (ft match {
          case 0 => f
          case 1 => f + a
          case 2 => f + up
          case 3 => f + ((a + up) >> 1)
          case 4 => f + paeth(a, up, c)
        }).toByte
        k += 1
      }
      var x = 0
      var o = 0
      while (x < width) {
        val alpha = if (hasAlpha) cur(o + 3) & 0xff else 0xff
        px(y * width + x) = (alpha << 24) | ((cur(o) & 0xff) << 16) |
          ((cur(o + 1) & 0xff) << 8) | (cur(o + 2) & 0xff)
        o += bpp; x += 1
      }
      System.arraycopy(cur, 0, prior, 0, stride)
      y += 1
    }
    Image(width, height, px, hasAlpha)
  }

  /** Paeth predictor (PNG spec §9.4): nearest of a/b/c to a+b-c, ties a,b,c. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def writeI32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }

  private def readI32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def writeChunk(out: java.io.ByteArrayOutputStream, typ: String,
                         data: Array[Byte], off: Int, len: Int): Unit = {
    val hdr = new Array[Byte](8)
    writeI32(hdr, 0, len)
    val t = typ.getBytes("US-ASCII")
    System.arraycopy(t, 0, hdr, 4, 4)
    out.write(hdr, 0, 8)
    out.write(data, off, len)
    val crc = new CRC32
    crc.update(t, 0, 4)
    crc.update(data, off, len)
    val tail = new Array[Byte](4)
    writeI32(tail, 0, crc.getValue.toInt)
    out.write(tail, 0, 4)
  }
}
