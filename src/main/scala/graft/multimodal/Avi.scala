package graft.multimodal

import java.io.IOException
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal MJPEG-in-AVI container codec (pure JVM, no libraries).
  *
  * AVI is RIFF: `RIFF('AVI ', LIST('hdrl', avih + LIST('strl', strh+strf)),
  * LIST('movi', '00dc' chunks), 'idx1')`. Motion-JPEG stores every frame as
  * an independent baseline JPEG inside a `00dc` chunk, which is exactly the
  * corner [[Jpeg]] already owns — so video decode here is REAL: RIFF chunk
  * walk (even-byte padding, JUNK tolerance), MJPG stream validation, then a
  * genuine T.81 decode per frame. The structures follow the public
  * AVI RIFF spec (MSDN AVIMAINHEADER/AVISTREAMHEADER/BITMAPINFOHEADER).
  *
  * The encoder writes a spec-shaped file (hdrl sizes, idx1 keyframe index,
  * even-padding) so foreign players could read it; the decoder rejects
  * truncation, bad magics, non-MJPG streams, and frame-count mismatches
  * loudly rather than returning a wrong video.
  */
object Avi {

  final case class Video(width: Int, height: Int, fps: Int,
                         frames: IndexedSeq[Array[Byte]]) // each a baseline JPEG

  private def fourcc(s: String): Int = {
    require(s.length == 4)
    (s.charAt(0) & 0xff) | ((s.charAt(1) & 0xff) << 8) |
      ((s.charAt(2) & 0xff) << 16) | ((s.charAt(3) & 0xff) << 24)
  }
  private def fccName(v: Int): String =
    new String(Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte), "ASCII")

  // ---- encode ----------------------------------------------------------

  def encode(width: Int, height: Int, fps: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0, "bad video geometry")
    val n = frames.length
    val maxFrame = if (n == 0) 0 else frames.iterator.map(_.length).max
    def padded(len: Int) = len + (len & 1)
    val moviDataSize = 4 + frames.iterator.map(f => 8 + padded(f.length)).sum // 'movi' + chunks
    val hdrlDataSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40)) // 'hdrl' avih LIST(strl strh strf)
    val idx1Size = 16 * n
    val riffDataSize = 4 + (8 + hdrlDataSize) + (8 + moviDataSize) + (8 + idx1Size)
    val out = ByteBuffer.allocate(8 + riffDataSize).order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(fourcc("RIFF")); out.putInt(riffDataSize); out.putInt(fourcc("AVI "))
    // LIST hdrl
    out.putInt(fourcc("LIST")); out.putInt(hdrlDataSize); out.putInt(fourcc("hdrl"))
    // avih (AVIMAINHEADER minus fcc/cb)
    out.putInt(fourcc("avih")); out.putInt(56)
    out.putInt(1000000 / fps) // dwMicroSecPerFrame
    out.putInt(maxFrame * fps) // dwMaxBytesPerSec
    out.putInt(0) // dwPaddingGranularity
    out.putInt(0x10) // dwFlags: AVIF_HASINDEX
    out.putInt(n) // dwTotalFrames
    out.putInt(0) // dwInitialFrames
    out.putInt(1) // dwStreams
    out.putInt(maxFrame) // dwSuggestedBufferSize
    out.putInt(width); out.putInt(height)
    out.putInt(0); out.putInt(0); out.putInt(0); out.putInt(0) // dwReserved
    // LIST strl
    out.putInt(fourcc("LIST")); out.putInt(4 + (8 + 56) + (8 + 40)); out.putInt(fourcc("strl"))
    // strh (AVISTREAMHEADER)
    out.putInt(fourcc("strh")); out.putInt(56)
    out.putInt(fourcc("vids")); out.putInt(fourcc("MJPG"))
    out.putInt(0) // dwFlags
    out.putShort(0); out.putShort(0) // wPriority, wLanguage
    out.putInt(0) // dwInitialFrames
    out.putInt(1) // dwScale
    out.putInt(fps) // dwRate
    out.putInt(0) // dwStart
    out.putInt(n) // dwLength (frames)
    out.putInt(maxFrame) // dwSuggestedBufferSize
    out.putInt(-1) // dwQuality (default)
    out.putInt(0) // dwSampleSize
    out.putShort(0); out.putShort(0); out.putShort(width.toShort); out.putShort(height.toShort)
    // strf (BITMAPINFOHEADER)
    out.putInt(fourcc("strf")); out.putInt(40)
    out.putInt(40); out.putInt(width); out.putInt(height)
    out.putShort(1); out.putShort(24)
    out.putInt(fourcc("MJPG"))
    out.putInt(width * height * 3)
    out.putInt(0); out.putInt(0); out.putInt(0); out.putInt(0)
    // LIST movi
    out.putInt(fourcc("LIST")); out.putInt(moviDataSize); out.putInt(fourcc("movi"))
    val moviFccPos = out.position() - 4 // offset base for idx1 (the 'movi' fourcc)
    val offsets = new Array[Int](n)
    var i = 0
    while (i < n) {
      offsets(i) = out.position() - moviFccPos
      out.putInt(fourcc("00dc")); out.putInt(frames(i).length)
      out.put(frames(i))
      if ((frames(i).length & 1) == 1) out.put(0.toByte) // even padding
      i += 1
    }
    // idx1 (AVIOLDINDEX): keyframe entries, offsets relative to 'movi' fourcc
    out.putInt(fourcc("idx1")); out.putInt(idx1Size)
    i = 0
    while (i < n) {
      out.putInt(fourcc("00dc")); out.putInt(0x10) // AVIIF_KEYFRAME
      out.putInt(offsets(i)); out.putInt(frames(i).length)
      i += 1
    }
    out.array()
  }

  /** One frame per 8x8-block-constant gray [[Jpeg.Image]], encoded q75 —
    * the integer-exact T.81 corner, so decoded pixels are oracle-exact.
    */
  def encodeGrayFrames(width: Int, height: Int, fps: Int,
                       frameBlockValue: (Int, Int) => Int, // (frameIdx, blockIdx) -> 0..255
                       nFrames: Int): Array[Byte] = {
    require(width % 8 == 0 && height % 8 == 0, "gray frames need 8-aligned dims")
    val bw = width / 8
    val frames = (0 until nFrames).map { fi =>
      val px = new Array[Int](width * height)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val b = (y / 8) * bw + (x / 8)
          val v = frameBlockValue(fi, b) & 0xff
          px(y * width + x) = (v << 16) | (v << 8) | v
          x += 1
        }
        y += 1
      }
      Jpeg.encode(Jpeg.Image(width, height, px), quality = 75)
    }
    encode(width, height, fps, frames)
  }

  // ---- decode ----------------------------------------------------------

  private final class Reader(b: Array[Byte]) {
    val buf: ByteBuffer = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    def u32(): Int = {
      if (buf.remaining() < 4) throw new IOException("truncated AVI (u32)")
      buf.getInt
    }
    def bytes(n: Int): Array[Byte] = {
      if (n < 0 || buf.remaining() < n) throw new IOException(s"truncated AVI chunk ($n bytes declared)")
      val out = new Array[Byte](n)
      buf.get(out)
      out
    }
    def skip(n: Int): Unit = {
      if (n < 0 || buf.remaining() < n) throw new IOException("truncated AVI (skip)")
      buf.position(buf.position() + n)
    }
  }

  def decode(b: Array[Byte]): Video = {
    val r = new Reader(b)
    if (r.u32() != fourcc("RIFF")) throw new IOException("not a RIFF file")
    val riffSize = r.u32()
    if (riffSize < 4 || riffSize > b.length - 8)
      throw new IOException(s"RIFF size $riffSize exceeds file (${b.length} bytes)")
    if (r.u32() != fourcc("AVI ")) throw new IOException("RIFF is not AVI")
    val end = 8 + riffSize

    var width = -1; var height = -1; var fps = -1; var totalFrames = -1
    var strhFps = -1 // authoritative per-stream rate/scale (beats avih usec)
    var sawMjpg = false; var sawStrfMjpg = false
    val frames = IndexedSeq.newBuilder[Array[Byte]]
    var idxEntries = -1

    def walkHdrl(limit: Int): Unit = {
      while (r.buf.position() < limit) {
        val fcc = r.u32(); val sz = r.u32()
        val next = r.buf.position() + sz + (sz & 1)
        if (next > limit) throw new IOException(s"truncated AVI header chunk ${fccName(fcc)}")
        if (fcc == fourcc("avih")) {
          if (sz < 56) throw new IOException("short avih")
          val usec = r.u32(); r.skip(12)
          totalFrames = r.u32(); r.skip(12)
          width = r.u32(); height = r.u32()
          fps = if (usec > 0) math.round(1000000.0 / usec).toInt else 0
          r.skip(next - r.buf.position())
        } else if (fcc == fourcc("LIST")) {
          val listType = r.u32()
          if (listType == fourcc("strl")) walkHdrl(next) else r.skip(next - r.buf.position())
        } else if (fcc == fourcc("strh")) {
          if (sz < 56) throw new IOException("short strh")
          val fccType = r.u32(); val handler = r.u32()
          if (fccType == fourcc("vids")) {
            if (handler != fourcc("MJPG") && handler != fourcc("mjpg"))
              throw new IOException(s"unsupported video codec '${fccName(handler)}' (only MJPG)")
            sawMjpg = true
            // dwScale/dwRate are the stream's authoritative timing; the
            // avih dwMicroSecPerFrame is derived (and often rounded or 0
            // in foreign muxers) — prefer rate/scale when present
            r.skip(12) // dwFlags, wPriority+wLanguage, dwInitialFrames
            val scale = r.u32(); val rate = r.u32()
            if (scale > 0 && rate > 0)
              strhFps = math.round(rate.toDouble / scale).toInt
          }
          r.skip(next - r.buf.position())
        } else if (fcc == fourcc("strf")) {
          if (sz >= 40) {
            r.skip(16)
            val compression = r.u32()
            if (compression == fourcc("MJPG") || compression == fourcc("mjpg")) sawStrfMjpg = true
            r.skip(next - r.buf.position())
          } else r.skip(next - r.buf.position())
        } else r.skip(next - r.buf.position()) // JUNK etc.
      }
    }

    def walkMovi(limit: Int): Unit = {
      while (r.buf.position() < limit) {
        val fcc = r.u32(); val sz = r.u32()
        val next = r.buf.position() + sz + (sz & 1)
        if (next > limit) throw new IOException(s"truncated AVI movi chunk ${fccName(fcc)}")
        val name = fccName(fcc)
        if (name.endsWith("dc") || name.endsWith("db")) frames += r.bytes(sz)
        else if (fcc == fourcc("LIST")) { r.u32(); /* rec list: recurse */ walkMovi(next); }
        r.skip(next - r.buf.position())
      }
    }

    while (r.buf.position() < end) {
      val fcc = r.u32(); val sz = r.u32()
      val next = r.buf.position() + sz + (sz & 1)
      if (next > end + 1) throw new IOException(s"truncated AVI top-level chunk ${fccName(fcc)}")
      if (fcc == fourcc("LIST")) {
        val listType = r.u32()
        if (listType == fourcc("hdrl")) walkHdrl(math.min(next, end))
        else if (listType == fourcc("movi")) walkMovi(math.min(next, end))
        else r.skip(math.min(next, end) - r.buf.position())
      } else if (fcc == fourcc("idx1")) {
        idxEntries = sz / 16
        r.skip(math.min(next, end) - r.buf.position())
      } else r.skip(math.min(next, end) - r.buf.position()) // JUNK etc.
    }

    if (width <= 0 || height <= 0) throw new IOException("AVI missing avih geometry")
    if (!sawMjpg || !sawStrfMjpg) throw new IOException("AVI stream is not MJPG")
    val fs = frames.result()
    if (totalFrames >= 0 && fs.length != totalFrames)
      throw new IOException(s"frame count mismatch: avih says $totalFrames, movi has ${fs.length}")
    if (idxEntries >= 0 && idxEntries != fs.length)
      throw new IOException(s"idx1 has $idxEntries entries for ${fs.length} frames")
    Video(width, height, if (strhFps > 0) strhFps else fps, fs)
  }

  /** Decode the container AND every frame's pixels (real T.81 decode). */
  def decodePixels(b: Array[Byte]): (Video, IndexedSeq[Jpeg.Image]) = {
    val v = decode(b)
    val imgs = v.frames.map { f =>
      val img = Jpeg.decode(f)
      if (img.width != v.width || img.height != v.height)
        throw new IOException(
          s"frame geometry ${img.width}x${img.height} != container ${v.width}x${v.height}")
      img
    }
    (v, imgs)
  }
}
