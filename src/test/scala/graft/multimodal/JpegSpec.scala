package graft.multimodal

import java.io.IOException

import org.scalatest.funsuite.AnyFunSuite

/** Baseline JPEG codec: table validity, DC-exactness (the property the
  * oracled query leans on), lossy round-trip error bounds, 4:2:0 vs 4:4:4,
  * restart markers, and corrupt/truncated-input rejection.
  */
class JpegSpec extends AnyFunSuite {

  private def grayBlocks(wb: Int, hb: Int, v: (Int, Int) => Int): Jpeg.Image = {
    val w = wb * 8; val h = hb * 8
    val px = Array.tabulate(w * h) { i =>
      val g = v(i % w / 8, i / w / 8) & 0xff
      (g << 16) | (g << 8) | g
    }
    Jpeg.Image(w, h, px)
  }

  test("huffman/zigzag table specs are complete and canonical") {
    // zigzag is a permutation of 0..63 with the known head
    assert(Jpeg.zigzagTable.sorted.toSeq == (0 until 64))
    assert(Jpeg.zigzagTable.take(6).toSeq == Seq(0, 1, 8, 16, 9, 2))
    // the AC symbol alphabet the encoder can emit must be exactly covered:
    // EOB, ZRL, and every (run 0..15, size 1..10)
    val needed = (for { r <- 0 to 15; s <- 1 to 10 } yield (r << 4) | s).toSet + 0x00 + 0xf0
    for ((bits, vals) <- Seq(Jpeg.acLumSpec, Jpeg.acChrSpec)) {
      assert(bits.sum == vals.length)
      assert(vals.toSet == needed, "AC symbol alphabet incomplete")
      assert(vals.length == vals.distinct.length)
      // Kraft: canonical code must fit in 16 bits
      val kraft = bits.zipWithIndex.map { case (n, i) => n.toLong << (16 - (i + 1)) }.sum
      assert(kraft <= (1L << 16), "AC table violates Kraft inequality")
    }
  }

  test("block-constant gray images round-trip EXACTLY at quality 75 (both samplings)") {
    // quality 75 scales the luma DC quantizer to 8, making the whole
    // DC-only path integer-exact — the invariant q_jpeg_features oracles
    assert(Jpeg.scaledTable(Array.fill(64)(16), 75)(0) == 8)
    for (sub <- Seq(false, true)) {
      val img = grayBlocks(4, 4, (bx, by) => (37 * bx + 111 * by + 5) % 256)
      val back = Jpeg.decode(Jpeg.encode(img, quality = 75, subsample420 = sub))
      assert(back.width == img.width && back.height == img.height)
      assert(back.pixels.toSeq == img.pixels.toSeq, s"subsample420=$sub")
    }
    // extremes: v=0 and v=255 blocks stay exact (clamp must not bite)
    val hard = grayBlocks(2, 1, (bx, _) => if (bx == 0) 0 else 255)
    assert(Jpeg.decode(Jpeg.encode(hard)).pixels.toSeq == hard.pixels.toSeq)
  }

  test("lossy round-trip of smooth color content stays within a tight bound") {
    val w = 48; val h = 32
    val px = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      val r = (x * 255 / (w - 1)); val g = (y * 255 / (h - 1)); val b = ((x + y) * 255 / (w + h - 2))
      (r << 16) | (g << 8) | b
    }
    val img = Jpeg.Image(w, h, px)
    for ((sub, tol) <- Seq((false, 14), (true, 22))) {
      val back = Jpeg.decode(Jpeg.encode(img, quality = 90, subsample420 = sub))
      var maxErr = 0
      for (i <- 0 until w * h; shift <- Seq(16, 8, 0)) {
        val a = (px(i) >> shift) & 0xff; val b0 = (back.pixels(i) >> shift) & 0xff
        maxErr = math.max(maxErr, math.abs(a - b0))
      }
      assert(maxErr <= tol, s"subsample420=$sub maxErr=$maxErr")
    }
  }

  test("noisy content round-trips through every AC symbol path without error") {
    // pseudo-random pixels exercise high-frequency AC coding (long runs,
    // ZRL, big categories); the assertion is structural (decodes, right
    // geometry) — noise is exactly what JPEG degrades most
    val rnd = new scala.util.Random(7)
    val w = 40; val h = 24
    val img = Jpeg.Image(w, h, Array.fill(w * h)(rnd.nextInt() & 0xffffff))
    for (q <- Seq(10, 50, 95); sub <- Seq(false, true)) {
      val back = Jpeg.decode(Jpeg.encode(img, q, sub))
      assert(back.width == w && back.height == h)
    }
  }

  test("non-multiple-of-8 dimensions round-trip via edge replication") {
    val img = grayBlocks(3, 2, (bx, by) => 40 * bx + 20 * by) match {
      case Jpeg.Image(w, h, px) =>
        // crop to 19x11: decoder must return the cropped geometry
        val cw = 19; val ch = 11
        Jpeg.Image(cw, ch, Array.tabulate(cw * ch)(i => px(i / cw * w + i % cw)))
    }
    for (sub <- Seq(false, true)) {
      val back = Jpeg.decode(Jpeg.encode(img, 75, sub))
      assert(back.width == 19 && back.height == 11)
      // interior of the first block is constant -> exact even lossy
      assert(((back.pixels(0) >> 8) & 0xff) == ((img.pixels(0) >> 8) & 0xff))
    }
  }

  test("corrupt and truncated input fails with IOException, never a wrong image") {
    val good = Jpeg.encode(grayBlocks(2, 2, (bx, by) => 64 * bx + 32 * by))
    assertThrows[IOException](Jpeg.decode(good.take(2))) // SOI only
    assertThrows[IOException](Jpeg.decode(good.take(20))) // inside APP0/DQT
    assertThrows[IOException](Jpeg.decode(good.dropRight(8))) // truncated scan
    val badSoi = good.clone(); badSoi(1) = 0x00
    assertThrows[IOException](Jpeg.decode(badSoi))
    // SOF0 -> SOF2: progressive must be rejected, not mis-decoded
    val prog = good.clone()
    var i = 2
    var patched = false
    while (!patched && i + 1 < prog.length) {
      if ((prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0) {
        prog(i + 1) = 0xc2.toByte; patched = true
      }
      i += 1
    }
    assert(patched)
    assertThrows[IOException](Jpeg.decode(prog))
    assertThrows[IOException](Jpeg.decode(Array[Byte](0x12, 0x34, 0x56)))
  }
}
