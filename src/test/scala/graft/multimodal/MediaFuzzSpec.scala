package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-input sweep over the WAV/BMP/PNG container parsers — same
  * contract as the CRAM codec fuzz (CodecFuzzSpec): random byte blobs and
  * bit-flipped valid files must either fail with IOException or decode to a
  * geometry-consistent result. Never a raw index / negative-size /
  * OOM-scale allocation error.
  */
class MediaFuzzSpec extends AnyFunSuite {

  private def mustContainWav(in: Array[Byte]): Unit =
    try {
      val pcm = Wav.decode(in)
      assert(pcm.channels >= 1 && pcm.samples.length % pcm.channels == 0)
    } catch {
      case _: java.io.IOException => // the contract
      case e: Throwable =>
        fail(s"Wav leaked ${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  private def mustContainBmp(in: Array[Byte]): Unit =
    try {
      val img = Bmp.decode(in)
      assert(img.width > 0 && img.height > 0 &&
        img.pixels.length == img.width * img.height)
    } catch {
      case _: java.io.IOException => // the contract
      case e: Throwable =>
        fail(s"Bmp leaked ${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  private def mustContainPng(in: Array[Byte]): Unit =
    try {
      val img = Png.decode(in)
      assert(img.width > 0 && img.height > 0 &&
        img.pixels.length == img.width * img.height)
    } catch {
      case _: java.io.IOException => // the contract
      case e: Throwable =>
        fail(s"Png leaked ${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  test("random byte blobs never escape the IOException contract") {
    val rnd = new java.util.Random(20260815)
    for (_ <- 0 until 500) {
      val blob = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(blob)
      mustContainWav(blob)
      mustContainBmp(blob)
      mustContainPng(blob)
    }
  }

  test("random blobs behind valid magics never escape the contract") {
    val rnd = new java.util.Random(99)
    for (_ <- 0 until 500) {
      val blob = new Array[Byte](12 + rnd.nextInt(200))
      rnd.nextBytes(blob)
      "RIFF".getBytes("ASCII").copyToArray(blob, 0)
      "WAVE".getBytes("ASCII").copyToArray(blob, 8)
      mustContainWav(blob)
      blob(0) = 'B'.toByte; blob(1) = 'M'.toByte
      mustContainBmp(blob)
      val png = new Array[Byte](8 + blob.length)
      Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')
        .copyToArray(png, 0)
      blob.copyToArray(png, 8)
      mustContainPng(png)
    }
  }

  test("single-bit flips in valid files never escape the contract") {
    val wav = Wav.encode(16000, 2, 16, Array.tabulate(64)(i => i * 37 - 900),
      junkBytes = 5)
    val bmp = Bmp.encode(Bmp.Image(7, 5, Array.tabulate(35)(i => i * 0x050301)))
    for (bit <- 0 until wav.length * 8) {
      val m = wav.clone(); m(bit / 8) = (m(bit / 8) ^ (1 << (bit % 8))).toByte
      mustContainWav(m)
    }
    for (bit <- 0 until bmp.length * 8) {
      val m = bmp.clone(); m(bit / 8) = (m(bit / 8) ^ (1 << (bit % 8))).toByte
      mustContainBmp(m)
    }
    val png = Png.encode(Png.Image(7, 5, Array.tabulate(35)(i =>
      (0xff << 24) | (i * 0x050301)), hasAlpha = false))
    for (bit <- 0 until png.length * 8) {
      val m = png.clone(); m(bit / 8) = (m(bit / 8) ^ (1 << (bit % 8))).toByte
      mustContainPng(m)
    }
  }
}
