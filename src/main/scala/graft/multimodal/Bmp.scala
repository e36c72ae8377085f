package graft.multimodal

import java.io.IOException

/** Real BMP (Windows bitmap) codec — pure JVM, no image libraries.
  *
  * Retires the decode stub for uncompressed IMAGES the way [[Wav]] does for
  * audio: 24-bit BI_RGB BITMAPINFOHEADER files, with the format's three
  * classic traps handled for real — BGR byte order, bottom-up row order
  * (top-down when height is negative), and 4-byte row padding. The API is
  * row-major top-down packed 0xRRGGBB ints; corrupt input fails with
  * IOException, never wrong pixels.
  */
object Bmp {

  /** `pixels` row-major top-down, packed 0xRRGGBB. */
  final case class Image(width: Int, height: Int, pixels: Array[Int])

  def encode(img: Image, topDown: Boolean = false): Array[Byte] = {
    require(img.width > 0 && img.height > 0, "empty image")
    require(img.pixels.length == img.width * img.height, "pixel count")
    val rowBytes = (img.width * 3 + 3) & ~3
    val dataLen = rowBytes * img.height
    val fileLen = 54 + dataLen
    val b = new Array[Byte](fileLen)
    var p = 0
    def u16(v: Int): Unit = { b(p) = v.toByte; b(p + 1) = (v >> 8).toByte; p += 2 }
    def u32(v: Int): Unit = {
      b(p) = v.toByte; b(p + 1) = (v >> 8).toByte
      b(p + 2) = (v >> 16).toByte; b(p + 3) = (v >> 24).toByte; p += 4
    }
    b(0) = 'B'.toByte; b(1) = 'M'.toByte; p = 2
    u32(fileLen); u32(0); u32(54) // file size, reserved, pixel offset
    u32(40); u32(img.width); u32(if (topDown) -img.height else img.height)
    u16(1); u16(24); u32(0); u32(dataLen) // planes, bpp, BI_RGB, image size
    u32(2835); u32(2835); u32(0); u32(0) // 72 dpi, palette unused
    var y = 0
    while (y < img.height) {
      val srcRow = if (topDown) y else img.height - 1 - y
      var x = 0
      var off = 54 + y * rowBytes
      while (x < img.width) {
        val px = img.pixels(srcRow * img.width + x)
        b(off) = px.toByte // B
        b(off + 1) = (px >> 8).toByte // G
        b(off + 2) = (px >> 16).toByte // R
        off += 3; x += 1
      }
      y += 1
    }
    b
  }

  def decode(b: Array[Byte]): Image = {
    def fail(msg: String): Nothing = throw new IOException(s"bad BMP: $msg")
    if (b.length < 54) fail("shorter than headers")
    if (b(0) != 'B' || b(1) != 'M') fail("magic")
    def u16(off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    def i32(off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    val dataOff = i32(10)
    val hdrSize = i32(14)
    if (hdrSize < 40) fail(s"info header size $hdrSize")
    val width = i32(18)
    val rawHeight = i32(22)
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    if (width <= 0 || height == 0) fail(s"geometry ${width}x$rawHeight")
    if (u16(26) != 1) fail("planes")
    val bpp = u16(28)
    if (bpp != 24) fail(s"unsupported bit depth $bpp")
    if (i32(30) != 0) fail(s"unsupported compression ${i32(30)}")
    // Long arithmetic: a hostile ~2^30 width overflows `width * 3` in Int,
    // flipping rowBytes negative and sailing past the bounds guard
    val rowBytesL = (width.toLong * 3 + 3) & ~3L
    if (dataOff < 54 || dataOff.toLong + rowBytesL * height > b.length)
      fail("pixel data overruns file")
    val rowBytes = rowBytesL.toInt
    val px = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val dstRow = if (topDown) y else height - 1 - y
      var x = 0
      var off = dataOff + y * rowBytes
      while (x < width) {
        px(dstRow * width + x) =
          ((b(off + 2) & 0xff) << 16) | ((b(off + 1) & 0xff) << 8) | (b(off) & 0xff)
        off += 3; x += 1
      }
      y += 1
    }
    Image(width, height, px)
  }
}
