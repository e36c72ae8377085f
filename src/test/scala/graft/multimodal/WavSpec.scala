package graft.multimodal

import java.io.IOException

import org.scalatest.funsuite.AnyFunSuite

class WavSpec extends AnyFunSuite {

  test("16-bit mono round-trip, with and without a JUNK chunk") {
    val samples = Array(0, 1, -1, 32767, -32768, 12345, -12345, 100)
    for (junk <- Seq(0, 7, 11, 12)) {
      val pcm = Wav.decode(Wav.encode(16000, 1, 16, samples, junkBytes = junk))
      assert(pcm.sampleRate == 16000 && pcm.channels == 1 && pcm.bits == 16)
      assert(pcm.samples.toSeq == samples.toSeq, s"junk=$junk")
    }
  }

  test("8-bit stereo round-trip (excess-128 storage, interleave preserved)") {
    val samples = Array(0, -128, 127, 5, -5, 64, -64, 1) // 4 frames x 2 ch
    val pcm = Wav.decode(Wav.encode(8000, 2, 8, samples))
    assert(pcm.sampleRate == 8000 && pcm.channels == 2 && pcm.bits == 8)
    assert(pcm.frames == 4)
    assert(pcm.samples.toSeq == samples.toSeq)
  }

  test("odd-length 8-bit data chunk is padded and still decodes") {
    val samples = Array(1, 2, 3) // 3 bytes -> odd data chunk
    val bytes = Wav.encode(44100, 1, 8, samples)
    assert(bytes.length % 2 == 0) // pad byte emitted
    assert(Wav.decode(bytes).samples.toSeq == samples.toSeq)
  }

  test("hand-built file with an unknown odd-sized chunk between fmt and data") {
    val base = Wav.encode(8000, 1, 16, Array(7, -7))
    // splice an "xtra" chunk (size 3 + pad) after fmt (ends at 12+8+16=36)
    val xtra = "xtra".getBytes("ASCII") ++ Array[Byte](3, 0, 0, 0, 1, 2, 3, 0)
    val spliced = base.take(36) ++ xtra ++ base.drop(36)
    // fix RIFF size
    val riffLen = spliced.length - 8
    spliced(4) = riffLen.toByte; spliced(5) = (riffLen >> 8).toByte
    spliced(6) = (riffLen >> 16).toByte; spliced(7) = (riffLen >> 24).toByte
    assert(Wav.decode(spliced).samples.toSeq == Seq(7, -7))
  }

  test("corrupt input fails loudly, never wrong samples") {
    val good = Wav.encode(8000, 1, 16, Array(1, -2, 3, -4))
    assertThrows[IOException](Wav.decode(good.take(10))) // truncated header
    assertThrows[IOException](Wav.decode(good.dropRight(3))) // truncated data
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assertThrows[IOException](Wav.decode(badMagic))
    val nonPcm = good.clone(); nonPcm(20) = 3 // fmt code -> IEEE float
    assertThrows[IOException](Wav.decode(nonPcm))
    assertThrows[IOException](Wav.decode(good.take(36))) // no data chunk
  }
}
