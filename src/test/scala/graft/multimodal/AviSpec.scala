package graft.multimodal

import java.io.IOException
import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

/** MJPEG-in-AVI container: RIFF walk exactness, per-frame T.81 decode,
  * JUNK tolerance, odd-chunk padding, and loud rejection of truncated /
  * corrupt / mismatched files (never a wrong video).
  */
class AviSpec extends AnyFunSuite {

  private def grayValue(id: Long)(fi: Int, b: Int): Int =
    ((id * 31 + fi.toLong * 7 + b.toLong * 13) % 256).toInt

  test("gray MJPEG frames round-trip pixel-exactly (the q75 DC corner)") {
    for (id <- Seq(0L, 1L, 7L, 99L)) {
      val nf = (3 + id % 5).toInt
      val avi = Avi.encodeGrayFrames(16, 16, 10, grayValue(id), nf)
      val (v, frames) = Avi.decodePixels(avi)
      assert(v.width == 16 && v.height == 16 && v.fps == 10)
      assert(frames.length == nf)
      frames.zipWithIndex.foreach { case (img, fi) =>
        assert(img.width == 16 && img.height == 16)
        var k = 0
        while (k < img.pixels.length) {
          val x = k % 16; val y = k / 16
          val b = (y / 8) * 2 + (x / 8)
          val want = grayValue(id)(fi, b)
          val px = img.pixels(k)
          assert(((px >> 16) & 0xff) == want && ((px >> 8) & 0xff) == want && (px & 0xff) == want,
            s"id=$id frame=$fi pixel=$k: got ${px.toHexString}, want gray $want")
          k += 1
        }
      }
    }
  }

  test("4:2:0 color MJPEG frames decode through the video path within the JPEG bound") {
    // the gray lane is hash-exact (DC corner); this lane drives the
    // SUBSAMPLED-CHROMA decode through Avi+Jpeg — smooth color gradients,
    // per-frame phase shift, bounded error (JpegSpec's documented 4:2:0
    // tolerance of 22 at q90)
    val w = 48; val h = 32; val nf = 3
    def framePx(fi: Int): Array[Int] = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      val r = ((x + 4 * fi) * 255 / (w + 4 * (nf - 1) - 1))
      val g = (y * 255 / (h - 1))
      val b = (((x + y + 8 * fi) * 255) / (w + h + 8 * (nf - 1) - 2))
      (r << 16) | (g << 8) | b
    }
    val payloads = (0 until nf).map(fi =>
      Jpeg.encode(Jpeg.Image(w, h, framePx(fi)), quality = 90, subsample420 = true))
    val avi = Avi.encode(w, h, 12, payloads)
    val (v, frames) = Avi.decodePixels(avi)
    assert(v.width == w && v.height == h && v.fps == 12 && frames.length == nf)
    frames.zipWithIndex.foreach { case (img, fi) =>
      val want = framePx(fi)
      var maxErr = 0
      for (i <- 0 until w * h; shift <- Seq(16, 8, 0)) {
        val a = (want(i) >> shift) & 0xff; val b0 = (img.pixels(i) >> shift) & 0xff
        maxErr = math.max(maxErr, math.abs(a - b0))
      }
      assert(maxErr <= 22, s"frame $fi: 4:2:0 maxErr=$maxErr through the video path")
    }
  }

  test("container round-trip preserves arbitrary (odd-length) frame payloads") {
    val frames = Seq(Array[Byte](1, 2, 3), Array[Byte](9), Array.tabulate(257)(i => (i % 251).toByte))
    val avi = Avi.encode(8, 8, 25, frames)
    val v = Avi.decode(avi)
    assert(v.frames.length == 3)
    v.frames.zip(frames).foreach { case (got, want) => assert(got.toSeq == want.toSeq) }
    assert(v.width == 8 && v.height == 8 && v.fps == 25)
  }

  test("JUNK chunk between top-level lists is tolerated") {
    val base = Avi.encodeGrayFrames(16, 16, 10, grayValue(5L), 3)
    // splice a JUNK chunk right after the hdrl LIST and fix the RIFF size
    val bb = ByteBuffer.wrap(base).order(ByteOrder.LITTLE_ENDIAN)
    bb.position(4); val riffSize = bb.getInt
    bb.position(12 + 4) // LIST fourcc at 12; its size at 16
    val hdrlSize = bb.getInt
    val insertAt = 12 + 8 + hdrlSize + (hdrlSize & 1)
    val junk = ByteBuffer.allocate(8 + 6).order(ByteOrder.LITTLE_ENDIAN)
    junk.putInt(('J' & 0xff) | (('U' & 0xff) << 8) | (('N' & 0xff) << 16) | (('K' & 0xff) << 24))
    junk.putInt(6); junk.put(Array[Byte](0, 0, 0, 0, 0, 0))
    val out = new Array[Byte](base.length + 14)
    System.arraycopy(base, 0, out, 0, insertAt)
    System.arraycopy(junk.array(), 0, out, insertAt, 14)
    System.arraycopy(base, insertAt, out, insertAt + 14, base.length - insertAt)
    val ob = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    ob.position(4); ob.putInt(riffSize + 14)
    val (v, frames) = Avi.decodePixels(out)
    assert(v.frames.length == 3 && frames.length == 3)
  }

  test("fps prefers strh dwRate/dwScale; avih usec=0 or rounded usec still decode") {
    val avi = Avi.encodeGrayFrames(16, 16, 30, grayValue(3L), 2)
    // avih dwMicroSecPerFrame sits at byte 32 (RIFF 12 + LIST hdr 12 + avih hdr 8);
    // a foreign muxer writing usec=0 (or a rounded 33333 for 30fps) must not
    // zero/skew the rate — strh dwScale=1/dwRate=30 is authoritative
    for (usec <- Seq(0, 33333)) {
      val patched = avi.clone()
      ByteBuffer.wrap(patched).order(ByteOrder.LITTLE_ENDIAN).putInt(32, usec)
      assert(Avi.decode(patched).fps == 30, s"usec=$usec")
    }
  }

  test("truncated file fails loudly") {
    val avi = Avi.encodeGrayFrames(16, 16, 10, grayValue(1L), 4)
    intercept[IOException](Avi.decode(avi.take(avi.length - 10)))
    intercept[IOException](Avi.decode(avi.take(40)))
    intercept[IOException](Avi.decode(Array[Byte](1, 2, 3)))
  }

  test("non-MJPG stream and non-AVI RIFF are rejected") {
    val avi = Avi.encodeGrayFrames(16, 16, 10, grayValue(2L), 2)
    // corrupt the strh handler fourcc ('MJPG' occurs first in strh)
    val idx = {
      // find 'strh' then handler is 8 bytes after its fourcc
      val pat = "strh".getBytes("ASCII")
      val i = avi.indexOfSlice(pat)
      assert(i > 0)
      i + 8 + 4 // fourcc + size + fccType => handler offset
    }
    val bad = avi.clone()
    bad(idx) = 'X'.toByte
    val ex = intercept[IOException](Avi.decode(bad))
    assert(ex.getMessage.contains("codec"))
    // non-AVI RIFF (e.g. WAVE) is rejected at the magic
    val notAvi = avi.clone()
    notAvi(8) = 'W'.toByte; notAvi(9) = 'A'.toByte; notAvi(10) = 'V'.toByte; notAvi(11) = 'E'.toByte
    intercept[IOException](Avi.decode(notAvi))
  }

  test("frame-count mismatch between avih and movi is rejected") {
    val avi = Avi.encodeGrayFrames(16, 16, 10, grayValue(3L), 3)
    // avih dwTotalFrames sits 16 bytes into the avih data
    val pat = "avih".getBytes("ASCII")
    val i = avi.indexOfSlice(pat)
    assert(i > 0)
    val bb = ByteBuffer.wrap(avi).order(ByteOrder.LITTLE_ENDIAN)
    bb.position(i + 8 + 16)
    bb.putInt(7) // claim 7 frames; movi holds 3
    val ex = intercept[IOException](Avi.decode(avi))
    assert(ex.getMessage.contains("frame count mismatch"))
  }

  test("frame geometry mismatch against the container is rejected") {
    val wrong = Jpeg.encode(Jpeg.Image(8, 8, Array.fill(64)(0x808080)), 75)
    val avi = Avi.encode(16, 16, 10, Seq(wrong))
    val ex = intercept[IOException](Avi.decodePixels(avi))
    assert(ex.getMessage.contains("geometry"))
  }
}
