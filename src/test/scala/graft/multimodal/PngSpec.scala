package graft.multimodal

import java.io.IOException

import org.scalatest.funsuite.AnyFunSuite

class PngSpec extends AnyFunSuite {
  private def pattern(w: Int, h: Int, alpha: Boolean): Png.Image =
    Png.Image(w, h, Array.tabulate(w * h) { g =>
      val x = g % w; val y = g / w
      val a = if (alpha) (x * 31 + y * 17 + 5) % 256 else 0xff
      (a << 24) | (((x * 7 + y) % 256) << 16) | (((y * 13 + x) % 256) << 8) |
        ((x * y + 3) % 256)
    }, hasAlpha = alpha)

  test("round-trip RGB and RGBA across sizes, default filter cycle") {
    for (w <- Seq(1, 2, 3, 7, 16); h <- Seq(1, 5, 9); alpha <- Seq(false, true)) {
      val img = pattern(w, h, alpha)
      val back = Png.decode(Png.encode(img))
      assert(back.width == w && back.height == h && back.hasAlpha == alpha)
      assert(back.pixels.toSeq == img.pixels.toSeq, s"${w}x$h alpha=$alpha")
    }
  }

  test("each filter type round-trips alone (uniform-filter images)") {
    for (ft <- 0 to 4; alpha <- Seq(false, true)) {
      val img = pattern(9, 6, alpha)
      val bytes = Png.encode(img, filterFor = _ => ft)
      assert(Png.decode(bytes).pixels.toSeq == img.pixels.toSeq, s"filter $ft alpha=$alpha")
    }
  }

  test("filter choice changes bytes, never pixels") {
    val img = pattern(12, 8, alpha = false)
    val variants = (0 to 4).map(ft => Png.encode(img, filterFor = _ => ft))
    assert(variants.map(_.toSeq).distinct.size == 5) // genuinely different encodings
    variants.foreach(v => assert(Png.decode(v).pixels.toSeq == img.pixels.toSeq))
  }

  test("multi-IDAT streams concatenate (tiny chunk size)") {
    val img = pattern(16, 16, alpha = true)
    val bytes = Png.encode(img, idatChunkSize = 7)
    // count IDAT chunks: must be several
    var pos = 8; var idats = 0
    while (pos + 8 <= bytes.length) {
      val len = ((bytes(pos) & 0xff) << 24) | ((bytes(pos + 1) & 0xff) << 16) |
        ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
      if (new String(bytes, pos + 4, 4, "US-ASCII") == "IDAT") idats += 1
      pos += 12 + len
    }
    assert(idats > 3, s"expected many IDAT chunks, got $idats")
    assert(Png.decode(bytes).pixels.toSeq == img.pixels.toSeq)
  }

  test("unknown ancillary chunk is skipped, CRC still verified") {
    val img = pattern(4, 4, alpha = false)
    val bytes = Png.encode(img)
    // splice a tEXt chunk between IHDR and the first IDAT (after byte 8+25)
    val insertAt = 8 + 25
    val payload = "hello".getBytes("US-ASCII")
    val chunk = new java.io.ByteArrayOutputStream()
    val hdr = new Array[Byte](8)
    hdr(3) = payload.length.toByte
    System.arraycopy("tEXt".getBytes("US-ASCII"), 0, hdr, 4, 4)
    chunk.write(hdr); chunk.write(payload)
    val crc = new java.util.zip.CRC32
    crc.update("tEXt".getBytes("US-ASCII")); crc.update(payload)
    val tail = new Array[Byte](4)
    val cv = crc.getValue.toInt
    tail(0) = (cv >>> 24).toByte; tail(1) = (cv >>> 16).toByte
    tail(2) = (cv >>> 8).toByte; tail(3) = cv.toByte
    chunk.write(tail)
    val spliced = bytes.take(insertAt) ++ chunk.toByteArray ++ bytes.drop(insertAt)
    assert(Png.decode(spliced).pixels.toSeq == img.pixels.toSeq)
    // corrupt the ancillary chunk's CRC: decode must fail, not silently skip
    val badCrc = spliced.clone()
    badCrc(insertAt + 8 + payload.length) = (badCrc(insertAt + 8 + payload.length) ^ 1).toByte
    assertThrows[IOException](Png.decode(badCrc))
  }

  test("corrupt input fails loudly") {
    val good = Png.encode(pattern(6, 4, alpha = false))
    assertThrows[IOException](Png.decode(good.take(20))) // truncated
    val badSig = good.clone(); badSig(1) = 'X'.toByte
    assertThrows[IOException](Png.decode(badSig))
    val badCrc = good.clone(); badCrc(20) = (badCrc(20) ^ 1).toByte // inside IHDR data
    assertThrows[IOException](Png.decode(badCrc))
    // flip a byte inside IDAT payload: zlib or CRC must catch it
    val idatOff = 8 + 25 + 8 + 2
    val badIdat = good.clone(); badIdat(idatOff) = (badIdat(idatOff) ^ 0x40).toByte
    assertThrows[IOException](Png.decode(badIdat))
    assertThrows[IOException](Png.decode(good.dropRight(13))) // missing IEND
  }

  test("crafted overflow inputs fail with IOException, not AIOOBE/OOM") {
    val good = Png.encode(pattern(3, 3, alpha = false))
    // chunk length near Int.MaxValue: pos + 12 + len must not wrap negative
    // and slip past the overrun guard into CRC32.update
    val hugeLen = good.clone()
    hugeLen(8) = 0x7f.toByte; hugeLen(9) = 0xff.toByte
    hugeLen(10) = 0xff.toByte; hugeLen(11) = 0xf0.toByte
    assertThrows[IOException](Png.decode(hugeLen))
    // IHDR geometry whose (stride + 1) * height / width * height products
    // overflow Int: must be rejected before any allocation
    def patchGeom(w: Int, h: Int): Array[Byte] = {
      val b = good.clone()
      def put(off: Int, v: Int): Unit = {
        b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
        b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
      }
      put(16, w); put(20, h) // 8 sig + 8 chunk hdr
      val crc = new java.util.zip.CRC32
      crc.update(b, 12, 4 + 13)
      put(8 + 8 + 13, crc.getValue.toInt)
      b
    }
    assertThrows[IOException](Png.decode(patchGeom(0x40000000, 0x40000000)))
    assertThrows[IOException](Png.decode(patchGeom(1 << 20, 1 << 20)))
    assertThrows[IOException](Png.decode(patchGeom(Int.MaxValue, 1)))
  }

  test("unsupported shapes rejected: interlace, depth, color type") {
    val good = Png.encode(pattern(3, 3, alpha = false))
    def patchIhdr(off: Int, v: Byte): Array[Byte] = {
      val b = good.clone()
      b(8 + 8 + off) = v // 8 sig + 8 chunk hdr + offset into IHDR data
      val crc = new java.util.zip.CRC32
      crc.update(b, 8 + 4, 4 + 13)
      val cv = crc.getValue.toInt
      val cOff = 8 + 8 + 13
      b(cOff) = (cv >>> 24).toByte; b(cOff + 1) = (cv >>> 16).toByte
      b(cOff + 2) = (cv >>> 8).toByte; b(cOff + 3) = cv.toByte
      b
    }
    assertThrows[IOException](Png.decode(patchIhdr(8, 16))) // bit depth 16
    assertThrows[IOException](Png.decode(patchIhdr(9, 3))) // palette
    assertThrows[IOException](Png.decode(patchIhdr(12, 1))) // Adam7
  }
}
