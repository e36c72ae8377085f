package graft.multimodal

import java.io.IOException

/** Real RIFF/WAVE PCM codec — pure JVM, no media libraries.
  *
  * This retires the honest decode stub for the AUDIO modality: unlike
  * image/video (whose codecs genuinely need libraries this environment
  * lacks), uncompressed PCM WAV needs none. The decoder walks the RIFF
  * chunk list (skipping unknown chunks, honoring the odd-size pad byte),
  * validates magics and geometry, parses the integer-PCM `fmt ` chunk
  * (8-bit unsigned / 16-bit signed little-endian, any channel count), and
  * decodes the `data` chunk into interleaved int samples (8-bit rebased to
  * signed around 0). Corrupt input fails with IOException, never wrong
  * samples of the right length.
  */
object Wav {

  /** Decoded PCM: interleaved samples, channel-major within each frame. */
  final case class Pcm(sampleRate: Int, channels: Int, bits: Int, samples: Array[Int]) {
    def frames: Int = samples.length / channels
  }

  /** Encode integer PCM to a well-formed WAV. `samples` is interleaved;
    * values must fit the target width (8-bit: [-128,127] stored excess-128;
    * 16-bit: [-32768,32767] little-endian). `junkBytes > 0` inserts a JUNK
    * chunk before `fmt ` so decoders must really walk chunks.
    */
  def encode(sampleRate: Int, channels: Int, bits: Int, samples: Array[Int],
             junkBytes: Int = 0): Array[Byte] = {
    require(bits == 8 || bits == 16, s"unsupported PCM width $bits")
    require(channels >= 1, "channels >= 1")
    require(samples.length % channels == 0, "interleave truncated")
    val bytesPer = bits / 8
    val dataLen = samples.length * bytesPer
    val junkLen = if (junkBytes > 0) 8 + junkBytes + (junkBytes & 1) else 0
    val riffLen = 4 + junkLen + (8 + 16) + (8 + dataLen + (dataLen & 1))
    val out = new java.io.ByteArrayOutputStream(8 + riffLen)
    def ascii(s: String): Unit = out.write(s.getBytes("ASCII"))
    def u32(v: Int): Unit = { out.write(v); out.write(v >> 8); out.write(v >> 16); out.write(v >> 24) }
    def u16(v: Int): Unit = { out.write(v); out.write(v >> 8) }
    ascii("RIFF"); u32(riffLen); ascii("WAVE")
    if (junkBytes > 0) {
      ascii("JUNK"); u32(junkBytes)
      var i = 0
      while (i < junkBytes + (junkBytes & 1)) { out.write(0x6a); i += 1 }
    }
    ascii("fmt "); u32(16)
    u16(1) // PCM
    u16(channels)
    u32(sampleRate)
    u32(sampleRate * channels * bytesPer) // byte rate
    u16(channels * bytesPer) // block align
    u16(bits)
    ascii("data"); u32(dataLen)
    var i = 0
    if (bits == 8) while (i < samples.length) { out.write(samples(i) + 128); i += 1 }
    else while (i < samples.length) { u16(samples(i) & 0xffff); i += 1 }
    if ((dataLen & 1) == 1) out.write(0)
    out.toByteArray
  }

  def decode(b: Array[Byte]): Pcm = {
    def fail(msg: String): Nothing = throw new IOException(s"bad WAV: $msg")
    if (b.length < 12) fail("shorter than RIFF header")
    def tag(off: Int): String = new String(b, off, 4, "ASCII")
    def u32(off: Int): Long =
      ((b(off) & 0xffL)) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    def u16(off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    if (tag(0) != "RIFF") fail(s"magic '${tag(0)}'")
    if (u32(4) + 8 > b.length) fail("RIFF size overruns file")
    if (tag(8) != "WAVE") fail(s"form type '${tag(8)}'")
    var p = 12
    var sampleRate = -1; var channels = -1; var bits = -1; var blockAlign = -1
    var dataOff = -1; var dataLen = -1
    while (p + 8 <= b.length && dataOff < 0) {
      val id = tag(p)
      val size = u32(p + 4)
      if (size > Int.MaxValue || p + 8 + size > b.length) fail(s"chunk '$id' overruns file")
      id match {
        case "fmt " =>
          if (size < 16) fail("fmt chunk too short")
          val fmt = u16(p + 8)
          if (fmt != 1) fail(s"non-PCM format code $fmt")
          channels = u16(p + 10)
          sampleRate = u32(p + 12).toInt
          blockAlign = u16(p + 20)
          bits = u16(p + 22)
          if (bits != 8 && bits != 16) fail(s"unsupported PCM width $bits")
          if (channels < 1) fail("zero channels")
          if (blockAlign != channels * bits / 8)
            fail(s"block align $blockAlign != channels*width")
        case "data" =>
          if (sampleRate < 0) fail("data chunk before fmt")
          dataOff = p + 8; dataLen = size.toInt
        case _ => // unknown chunk (JUNK, LIST, fact, ...): skip
      }
      p += 8 + size.toInt + (size.toInt & 1)
    }
    if (dataOff < 0) fail("no data chunk")
    val bytesPer = bits / 8
    if (dataLen % (channels * bytesPer) != 0) fail("data chunk truncates a frame")
    val n = dataLen / bytesPer
    val out = new Array[Int](n)
    var i = 0
    if (bits == 8) while (i < n) { out(i) = (b(dataOff + i) & 0xff) - 128; i += 1 }
    else while (i < n) {
      out(i) = ((b(dataOff + 2 * i) & 0xff) | (b(dataOff + 2 * i + 1) << 8)).toShort.toInt
      i += 1
    }
    Pcm(sampleRate, channels, bits, out)
  }
}
