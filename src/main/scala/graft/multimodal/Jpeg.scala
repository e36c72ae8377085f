package graft.multimodal

import java.io.IOException

/** Baseline sequential JPEG (ITU-T T.81) — pure-JVM encoder + decoder, the
  * last multimodal codec to go from documented model to real implementation
  * (PNG/BMP/WAV shipped earlier). Scope: baseline DCT (SOF0), Huffman
  * entropy coding, 8-bit samples, 4:4:4 and 4:2:0 chroma subsampling,
  * restart markers on decode; progressive (SOF2), arithmetic coding, and
  * 12-bit precision are rejected loudly. Quantization pins
  * `floor(x/q + 0.5)` and the final sample rounding `floor(x + 0.5)` so the
  * DC-only path is integer-exact end to end: a block-constant gray image at
  * quality 75 (scaled luma q00 = 8) round-trips EXACTLY, which is what lets
  * a lossy codec live under the engine's hash-equality oracle
  * (q_jpeg_features).
  *
  * Corrupt or truncated input fails with IOException, never a wrong image.
  */
object Jpeg {

  final case class Image(width: Int, height: Int, pixels: Array[Int]) // 00RRGGBB

  // ---- tables (T.81 Annex K) ------------------------------------------------

  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private val QLum: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  private val QChr: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** Quality-scaled table (IJG convention): q=50 is the Annex K base. */
  private[multimodal] def scaledTable(base: Array[Int], quality: Int): Array[Int] = {
    require(quality >= 1 && quality <= 100, s"quality $quality")
    val scale = if (quality < 50) 5000 / quality else 200 - 2 * quality
    base.map(v => math.min(255, math.max(1, (v * scale + 50) / 100)))
  }

  // standard Huffman table specs: (bits per code length 1..16, symbol values)
  private val DcLumBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = Array.tabulate(12)(identity)
  private val DcChrBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val AcLumBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
  private val AcChrBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChrVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  // test hooks: the spec proves the AC specs cover every (run, size) symbol
  // the encoder can emit and that the zigzag is a permutation
  private[multimodal] def acLumSpec: (Array[Int], Array[Int]) = (AcLumBits, AcLumVals)
  private[multimodal] def acChrSpec: (Array[Int], Array[Int]) = (AcChrBits, AcChrVals)
  private[multimodal] def zigzagTable: Array[Int] = ZigZag

  /** Canonical code assignment (T.81 C.2): (codes, lengths) indexed by symbol. */
  private def buildEncodeTable(bits: Array[Int], vals: Array[Int]): (Array[Int], Array[Int]) = {
    val code = new Array[Int](256)
    val len = new Array[Int](256)
    var c = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l - 1)) {
        code(vals(k)) = c
        len(vals(k)) = l
        c += 1; k += 1; i += 1
      }
      c <<= 1
      l += 1
    }
    (code, len)
  }

  // ---- color ---------------------------------------------------------------

  private def cosTable: Array[Double] = {
    val t = new Array[Double](64) // t(u*8+x) = cos((2x+1) u pi / 16)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) { t(u * 8 + x) = math.cos((2 * x + 1) * u * math.Pi / 16); x += 1 }
      u += 1
    }
    t
  }
  private val Cos = cosTable
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)

  // ---- encoder ---------------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0L
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1))
      nbits += len
      while (nbits >= 8) {
        val b = ((acc >>> (nbits - 8)) & 0xff).toInt
        out.write(b)
        if (b == 0xff) out.write(0x00) // byte stuffing
        nbits -= 8
      }
    }
    // T.81 F.1.2.3: pad the final partial byte with 1-bits (stuffing above
    // handles a resulting 0xFF).
    def flush(): Unit = if (nbits > 0) { val pad = 8 - nbits; put((1 << pad) - 1, pad); nbits = 0 }
  }

  private def bitSize(v: Int): Int = {
    var a = math.abs(v); var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  def encode(img: Image, quality: Int = 75, subsample420: Boolean = false): Array[Byte] = {
    val w = img.width; val h = img.height
    require(w > 0 && h > 0 && img.pixels.length == w * h, "bad image geometry")
    val qLum = scaledTable(QLum, quality)
    val qChr = scaledTable(QChr, quality)
    // planes as unrounded doubles (level-shifted at FDCT time)
    val yP = new Array[Double](w * h)
    val cbF = new Array[Double](w * h)
    val crF = new Array[Double](w * h)
    var i = 0
    while (i < w * h) {
      val p = img.pixels(i)
      val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
      yP(i) = 0.299 * r + 0.587 * g + 0.114 * b
      cbF(i) = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
      crF(i) = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
      i += 1
    }
    val (hY, vY) = if (subsample420) (2, 2) else (1, 1)
    val cw = if (subsample420) (w + 1) / 2 else w
    val ch = if (subsample420) (h + 1) / 2 else h
    def subsample(src: Array[Double]): Array[Double] =
      if (!subsample420) src
      else {
        val d = new Array[Double](cw * ch)
        var cy = 0
        while (cy < ch) {
          var cx = 0
          while (cx < cw) {
            var s = 0.0; var n = 0
            var dy = 0
            while (dy < 2) {
              var dx = 0
              while (dx < 2) {
                val x = 2 * cx + dx; val y = 2 * cy + dy
                if (x < w && y < h) { s += src(y * w + x); n += 1 }
                dx += 1
              }
              dy += 1
            }
            d(cy * cw + cx) = s / n
            cy match { case _ => () }
            cx += 1
          }
          cy += 1
        }
        d
      }
    val cbP = subsample(cbF)
    val crP = subsample(crF)

    val out = new java.io.ByteArrayOutputStream(1 << 14)
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8) // SOI
    // APP0 / JFIF
    marker(0xe0); u16(16)
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1); out.write(0); u16(1); u16(1); out.write(0); out.write(0)
    // DQT (two tables, 8-bit precision)
    marker(0xdb); u16(2 + 2 * 65)
    out.write(0x00); ZigZag.foreach(z => out.write(qLum(z)))
    out.write(0x01); ZigZag.foreach(z => out.write(qChr(z)))
    // SOF0
    marker(0xc0); u16(8 + 3 * 3)
    out.write(8); u16(h); u16(w); out.write(3)
    out.write(1); out.write((hY << 4) | vY); out.write(0) // Y
    out.write(2); out.write(0x11); out.write(1) // Cb
    out.write(3); out.write(0x11); out.write(1) // Cr
    // DHT x4
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length)
      out.write((tc << 4) | th)
      bits.foreach(out.write)
      vals.foreach(out.write)
    }
    dht(0, 0, DcLumBits, DcVals)
    dht(1, 0, AcLumBits, AcLumVals)
    dht(0, 1, DcChrBits, DcVals)
    dht(1, 1, AcChrBits, AcChrVals)
    // SOS
    marker(0xda); u16(6 + 2 * 3)
    out.write(3)
    out.write(1); out.write(0x00)
    out.write(2); out.write(0x11)
    out.write(3); out.write(0x11)
    out.write(0); out.write(63); out.write(0)

    val (dcLumCode, dcLumLen) = buildEncodeTable(DcLumBits, DcVals)
    val (acLumCode, acLumLen) = buildEncodeTable(AcLumBits, AcLumVals)
    val (dcChrCode, dcChrLen) = buildEncodeTable(DcChrBits, DcVals)
    val (acChrCode, acChrLen) = buildEncodeTable(AcChrBits, AcChrVals)
    val bw = new BitWriter(out)
    val block = new Array[Double](64)
    val coef = new Array[Int](64)

    /** FDCT + quantize (floor(x/q + 0.5)) in zigzag order into `coef`. */
    def fdctQuant(plane: Array[Double], pw: Int, ph: Int, bx: Int, by: Int, q: Array[Int]): Unit = {
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          // edge replication for non-multiple-of-8 dimensions
          val sx = math.min(pw - 1, bx + x); val sy = math.min(ph - 1, by + y)
          block(y * 8 + x) = plane(sy * pw + sx) - 128.0
          x += 1
        }
        y += 1
      }
      var k = 0
      while (k < 64) {
        val u = ZigZag(k) % 8; val v = ZigZag(k) / 8
        var s = 0.0
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            s += block(yy * 8 + xx) * Cos(u * 8 + xx) * Cos(v * 8 + yy)
            xx += 1
          }
          yy += 1
        }
        val cu = if (u == 0) InvSqrt2 else 1.0
        val cv = if (v == 0) InvSqrt2 else 1.0
        val f = 0.25 * cu * cv * s
        coef(k) = math.floor(f / q(ZigZag(k)) + 0.5).toInt
        k += 1
      }
    }

    def writeBits(v: Int, size: Int): Unit =
      if (size > 0) bw.put(if (v >= 0) v else v + (1 << size) - 1, size)

    var predY = 0; var predCb = 0; var predCr = 0
    def encodeBlock(dcCode: Array[Int], dcLen: Array[Int], acCode: Array[Int],
                    acLen: Array[Int], pred: Int): Int = {
      val dc = coef(0)
      val diff = dc - pred
      val s = bitSize(diff)
      require(dcLen(s) > 0, s"missing DC code for size $s")
      bw.put(dcCode(s), dcLen(s)); writeBits(diff, s)
      var k = 1
      var run = 0
      while (k < 64) {
        val v = coef(k)
        if (v == 0) run += 1
        else {
          while (run >= 16) { bw.put(acCode(0xf0), acLen(0xf0)); run -= 16 }
          val sz = bitSize(v)
          val sym = (run << 4) | sz
          require(acLen(sym) > 0, s"missing AC code for symbol $sym")
          bw.put(acCode(sym), acLen(sym)); writeBits(v, sz)
          run = 0
        }
        k += 1
      }
      if (run > 0) bw.put(acCode(0x00), acLen(0x00)) // EOB
      dc
    }

    val mcuW = 8 * hY; val mcuH = 8 * vY
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        // Y blocks (hY x vY per MCU)
        var by = 0
        while (by < vY) {
          var bx = 0
          while (bx < hY) {
            fdctQuant(yP, w, h, mx * mcuW + bx * 8, my * mcuH + by * 8, qLum)
            predY = encodeBlock(dcLumCode, dcLumLen, acLumCode, acLumLen, predY)
            bx += 1
          }
          by += 1
        }
        fdctQuant(cbP, cw, ch, mx * 8, my * 8, qChr)
        predCb = encodeBlock(dcChrCode, dcChrLen, acChrCode, acChrLen, predCb)
        fdctQuant(crP, cw, ch, mx * 8, my * 8, qChr)
        predCr = encodeBlock(dcChrCode, dcChrLen, acChrCode, acChrLen, predCr)
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ---- decoder ---------------------------------------------------------------

  private def fail(msg: String): Nothing = throw new IOException(s"bad JPEG: $msg")

  /** Canonical decode tables (T.81 F.2.2.3). */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val huffVal: Array[Int] = vals
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) == 0) { maxCode(l) = -1 }
        else {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
      if (k != vals.length) fail("DHT bits/values mismatch")
    }
  }

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var sawEoi = false
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) fail("truncated entropy-coded stream")
        var byte = b(pos) & 0xff; pos += 1
        if (byte == 0xff) {
          if (pos >= b.length) fail("truncated after 0xFF")
          val m = b(pos) & 0xff; pos += 1
          if (m == 0x00) { /* stuffed */ }
          else if (m == 0xd9) { sawEoi = true; byte = 0 /* pad past EOI = truncation */ }
          else fail(f"unexpected marker 0xff$m%02x inside scan")
        }
        if (sawEoi) fail("entropy-coded stream truncated at EOI")
        acc = byte; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    /** Align + consume an RSTn marker (restart-interval support). */
    def restart(n: Int): Unit = {
      nbits = 0
      if (pos + 1 >= b.length) fail("truncated at restart")
      if ((b(pos) & 0xff) != 0xff || (b(pos + 1) & 0xff) != (0xd0 + n)) fail("missing RST marker")
      pos += 2
    }
  }

  private def decodeHuff(br: BitReader, t: HuffTable): Int = {
    var code = br.bit()
    var l = 1
    while (l <= 16 && (t.maxCode(l) < 0 || code > t.maxCode(l))) {
      code = (code << 1) | br.bit()
      l += 1
    }
    if (l > 16) fail("invalid Huffman code")
    t.huffVal(t.valPtr(l) + code - t.minCode(l))
  }

  private def extend(v: Int, size: Int): Int =
    if (size == 0) 0 else if (v < (1 << (size - 1))) v - (1 << size) + 1 else v

  def decode(b: Array[Byte]): Image = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) fail("missing SOI")
    val qtabs = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var w = 0; var h = 0
    // per component: id, hSamp, vSamp, quant id, dc table, ac table
    var compIds: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var compQ: Array[Int] = null
    var restartInterval = 0
    var pos = 2
    def u16(p: Int): Int = {
      if (p + 1 >= b.length) fail("truncated segment length")
      ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
    }
    var scanPos = -1
    var compDc: Array[Int] = null
    var compAc: Array[Int] = null
    while (scanPos < 0) {
      if (pos + 1 >= b.length) fail("no SOS before EOF")
      if ((b(pos) & 0xff) != 0xff) fail(f"expected marker at $pos, got 0x${b(pos) & 0xff}%02x")
      val m = b(pos + 1) & 0xff
      pos += 2
      m match {
        case 0xd8 => // stray SOI
        case 0xd9 => fail("EOI before SOS")
        case 0x01 => // TEM, standalone
        case mm if mm >= 0xd0 && mm <= 0xd7 => // standalone RST outside scan
        case 0xc0 | 0xc1 =>
          val len = u16(pos)
          if (pos + len > b.length) fail("truncated SOF")
          val prec = b(pos + 2) & 0xff
          if (prec != 8) fail(s"unsupported sample precision $prec")
          h = u16(pos + 3); w = u16(pos + 5)
          if (w <= 0 || h <= 0) fail(s"geometry ${w}x$h")
          if (w.toLong * h > (1L << 28)) fail(s"geometry ${w}x$h exceeds pixel bound")
          val nc = b(pos + 7) & 0xff
          if (nc != 3 && nc != 1) fail(s"unsupported component count $nc")
          compIds = new Array(nc); compH = new Array(nc); compV = new Array(nc); compQ = new Array(nc)
          var c = 0
          while (c < nc) {
            compIds(c) = b(pos + 8 + 3 * c) & 0xff
            val hv = b(pos + 9 + 3 * c) & 0xff
            compH(c) = hv >> 4; compV(c) = hv & 0xf
            if (compH(c) < 1 || compH(c) > 2 || compV(c) < 1 || compV(c) > 2)
              fail(s"unsupported sampling ${compH(c)}x${compV(c)}")
            compQ(c) = b(pos + 10 + 3 * c) & 0xff
            c += 1
          }
          pos += len
        case 0xc2 => fail("progressive JPEG (SOF2) unsupported")
        case mm if mm >= 0xc3 && mm <= 0xcf && mm != 0xc4 && mm != 0xc8 =>
          fail(f"unsupported SOF marker 0xff$mm%02x")
        case 0xc4 =>
          val len = u16(pos)
          if (pos + len > b.length) fail("truncated DHT")
          var p = pos + 2
          while (p < pos + len) {
            val tcth = b(p) & 0xff
            val tc = tcth >> 4; val th = tcth & 0xf
            if (tc > 1 || th > 3) fail(s"bad DHT id $tcth")
            val bits = Array.tabulate(16)(i => b(p + 1 + i) & 0xff)
            val n = bits.sum
            if (n > 256 || p + 17 + n > pos + len) fail("bad DHT geometry")
            val vals = Array.tabulate(n)(i => b(p + 17 + i) & 0xff)
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcTabs(th) = t else acTabs(th) = t
            p += 17 + n
          }
          pos += len
        case 0xdb =>
          val len = u16(pos)
          if (pos + len > b.length) fail("truncated DQT")
          var p = pos + 2
          while (p < pos + len) {
            val pqtq = b(p) & 0xff
            val pq = pqtq >> 4; val tq = pqtq & 0xf
            if (tq > 3 || pq > 1) fail(s"bad DQT id $pqtq")
            val t = new Array[Int](64)
            var k = 0
            if (pq == 0) {
              if (p + 65 > pos + len) fail("truncated DQT table")
              while (k < 64) { t(ZigZag(k)) = b(p + 1 + k) & 0xff; k += 1 }
              p += 65
            } else {
              if (p + 129 > pos + len) fail("truncated DQT table")
              while (k < 64) { t(ZigZag(k)) = u16(p + 1 + 2 * k); k += 1 }
              p += 129
            }
            qtabs(tq) = t
          }
          pos += len
        case 0xdd =>
          val len = u16(pos)
          if (len != 4) fail("bad DRI length")
          restartInterval = u16(pos + 2)
          pos += len
        case 0xda =>
          if (compIds == null) fail("SOS before SOF")
          val len = u16(pos)
          if (pos + len > b.length) fail("truncated SOS")
          val ns = b(pos + 2) & 0xff
          if (ns != compIds.length) fail(s"SOS component count $ns != SOF ${compIds.length}")
          compDc = new Array(ns); compAc = new Array(ns)
          var c = 0
          while (c < ns) {
            val cid = b(pos + 3 + 2 * c) & 0xff
            val ci = compIds.indexOf(cid)
            if (ci < 0) fail(s"SOS references unknown component $cid")
            val tt = b(pos + 4 + 2 * c) & 0xff
            compDc(ci) = tt >> 4; compAc(ci) = tt & 0xf
            c += 1
          }
          scanPos = pos + len
        case _ => // APPn, COM, others: length-prefixed skip
          val len = u16(pos)
          if (len < 2 || pos + len > b.length) fail(f"truncated segment 0xff$m%02x")
          pos += len
      }
    }

    val nc = compIds.length
    val hMax = compH.max; val vMax = compV.max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    // per-component plane at its sampled resolution (MCU-padded)
    val planeW = Array.tabulate(nc)(c => mcusX * 8 * compH(c))
    val planeH = Array.tabulate(nc)(c => mcusY * 8 * compV(c))
    val planes = Array.tabulate(nc)(c => new Array[Int](planeW(c) * planeH(c)))
    for (c <- 0 until nc) {
      if (qtabs(compQ(c)) == null) fail(s"missing DQT ${compQ(c)}")
      if (dcTabs(compDc(c)) == null || acTabs(compAc(c)) == null)
        fail("missing DHT for scan")
    }

    val br = new BitReader(b, scanPos)
    val preds = new Array[Int](nc)
    val coef = new Array[Int](64)
    val blk = new Array[Int](64)

    def decodeBlock(c: Int, outX: Int, outY: Int): Unit = {
      val q = qtabs(compQ(c))
      java.util.Arrays.fill(coef, 0)
      val s = decodeHuff(br, dcTabs(compDc(c)))
      if (s > 11) fail(s"bad DC size $s")
      var v = 0
      var i = 0
      while (i < s) { v = (v << 1) | br.bit(); i += 1 }
      preds(c) += extend(v, s)
      coef(0) = preds(c) * q(0)
      var k = 1
      var done = false
      while (!done && k < 64) {
        val rs = decodeHuff(br, acTabs(compAc(c)))
        val r = rs >> 4; val sz = rs & 0xf
        if (sz == 0) {
          if (r == 15) k += 16 else done = true // ZRL or EOB
        } else {
          k += r
          if (k > 63) fail("AC run overflows block")
          var av = 0
          var j = 0
          while (j < sz) { av = (av << 1) | br.bit(); j += 1 }
          coef(ZigZag(k)) = extend(av, sz) * q(ZigZag(k))
          k += 1
        }
      }
      // IDCT
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var sum = 0.0
          var u = 0
          while (u < 8) {
            var vv = 0
            while (vv < 8) {
              val f = coef(vv * 8 + u)
              if (f != 0) {
                val cu = if (u == 0) InvSqrt2 else 1.0
                val cv = if (vv == 0) InvSqrt2 else 1.0
                sum += cu * cv * f * Cos(u * 8 + x) * Cos(vv * 8 + y)
              }
              vv += 1
            }
            u += 1
          }
          val sv = math.floor(0.25 * sum + 128.0 + 0.5).toInt
          blk(y * 8 + x) = if (sv < 0) 0 else if (sv > 255) 255 else sv
          x += 1
        }
        y += 1
      }
      val pw = planeW(c)
      val plane = planes(c)
      var yy = 0
      while (yy < 8) {
        var xx = 0
        while (xx < 8) {
          plane((outY + yy) * pw + outX + xx) = blk(yy * 8 + xx)
          xx += 1
        }
        yy += 1
      }
    }

    var mcuCount = 0
    var rstIdx = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcuCount == restartInterval) {
          br.restart(rstIdx % 8)
          rstIdx += 1; mcuCount = 0
          java.util.Arrays.fill(preds, 0)
        }
        var c = 0
        while (c < nc) {
          var by = 0
          while (by < compV(c)) {
            var bx = 0
            while (bx < compH(c)) {
              decodeBlock(c, (mx * compH(c) + bx) * 8, (my * compV(c) + by) * 8)
              bx += 1
            }
            by += 1
          }
          c += 1
        }
        mcuCount += 1
        mx += 1
      }
      my += 1
    }

    // upsample to full resolution + color convert
    val px = new Array[Int](w * h)
    def sample(c: Int, x: Int, y: Int): Int = {
      val sx = x * compH(c) / hMax
      val sy = y * compV(c) / vMax
      planes(c)(sy * planeW(c) + sx)
    }
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (nc == 1) {
          val g = sample(0, x, y)
          px(y * w + x) = (g << 16) | (g << 8) | g
        } else {
          val yv = sample(0, x, y).toDouble
          val cb = sample(1, x, y) - 128.0
          val cr = sample(2, x, y) - 128.0
          def clamp(d: Double): Int = {
            val v = math.floor(d + 0.5).toInt
            if (v < 0) 0 else if (v > 255) 255 else v
          }
          val r = clamp(yv + 1.402 * cr)
          val g = clamp(yv - 0.344136 * cb - 0.714136 * cr)
          val bb = clamp(yv + 1.772 * cb)
          px(y * w + x) = (r << 16) | (g << 8) | bb
        }
        x += 1
      }
      y += 1
    }
    Image(w, h, px)
  }
}
