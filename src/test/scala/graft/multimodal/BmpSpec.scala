package graft.multimodal

import java.io.IOException

import org.scalatest.funsuite.AnyFunSuite

class BmpSpec extends AnyFunSuite {
  private def pattern(w: Int, h: Int): Bmp.Image =
    Bmp.Image(w, h, Array.tabulate(w * h) { g =>
      val x = g % w; val y = g / w
      (((x * 7 + y) % 256) << 16) | (((y * 13 + x) % 256) << 8) | ((x * y + 3) % 256)
    })

  test("round-trip at widths that hit every row-padding residue") {
    for (w <- 1 to 8; h <- Seq(1, 3)) {
      val img = pattern(w, h)
      val back = Bmp.decode(Bmp.encode(img))
      assert(back.width == w && back.height == h)
      assert(back.pixels.toSeq == img.pixels.toSeq, s"${w}x$h")
    }
  }

  test("bottom-up and top-down encodings decode to the same raster") {
    val img = pattern(5, 4)
    val up = Bmp.encode(img, topDown = false)
    val down = Bmp.encode(img, topDown = true)
    assert(!up.sameElements(down)) // genuinely different byte layouts
    assert(Bmp.decode(up).pixels.toSeq == img.pixels.toSeq)
    assert(Bmp.decode(down).pixels.toSeq == img.pixels.toSeq)
  }

  test("BGR byte order on disk") {
    val one = Bmp.Image(1, 1, Array(0x112233))
    val b = Bmp.encode(one)
    assert((b(54) & 0xff) == 0x33 && (b(55) & 0xff) == 0x22 && (b(56) & 0xff) == 0x11)
  }

  test("corrupt input fails loudly") {
    val good = Bmp.encode(pattern(3, 2))
    assertThrows[IOException](Bmp.decode(good.take(40))) // truncated header
    assertThrows[IOException](Bmp.decode(good.dropRight(2))) // truncated raster
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assertThrows[IOException](Bmp.decode(badMagic))
    val rle = good.clone(); rle(30) = 1 // BI_RLE8
    assertThrows[IOException](Bmp.decode(rle))
    val bpp8 = good.clone(); bpp8(28) = 8
    assertThrows[IOException](Bmp.decode(bpp8))
  }
}
