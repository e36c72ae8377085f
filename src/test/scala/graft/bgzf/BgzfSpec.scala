package graft.bgzf

import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayOutputStream

class BgzfSpec extends AnyFunSuite {

  private def compress(data: Array[Byte], eof: Boolean = true): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new BgzfOutputStream(bos, writeEof = eof)
    out.write(data)
    out.close()
    bos.toByteArray
  }

  private def decompressAll(file: Array[Byte]): Array[Byte] = {
    val in = new BgzfInputStream(SeekableInput.ofBytes(file))
    in.seekBlock(0L)
    val bos = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
    bos.toByteArray
  }

  /** True block start offsets by walking headers sequentially. */
  private def blockOffsets(file: Array[Byte]): Seq[Long] = {
    var off = 0L
    val acc = Seq.newBuilder[Long]
    while (off < file.length) {
      val len = Bgzf.parseBlockLength(file, off.toInt, file.length - off.toInt)
      assert(len > 0, s"invalid block at $off")
      acc += off
      off += len
    }
    acc.result()
  }

  private val rng = new scala.util.Random(42)

  test("round-trip: sizes spanning block boundaries, compressible data") {
    for (size <- Seq(0, 1, 100, Bgzf.MaxUncompressedPayload - 1, Bgzf.MaxUncompressedPayload,
                     Bgzf.MaxUncompressedPayload + 1, 200000)) {
      val data = Array.tabulate[Byte](size)(i => (i % 251).toByte)
      assert(decompressAll(compress(data)).sameElements(data), s"size $size")
    }
  }

  test("round-trip: incompressible (random) data falls back to stored blocks") {
    val data = new Array[Byte](300000)
    rng.nextBytes(data)
    val file = compress(data)
    assert(decompressAll(file).sameElements(data))
    blockOffsets(file).sliding(2).foreach {
      case Seq(a, b) => assert(b - a <= Bgzf.MaxBlockSize)
      case _ =>
    }
  }

  test("file ends with the 28-byte EOF terminator") {
    val file = compress(Array.tabulate[Byte](1000)(_.toByte))
    assert(file.takeRight(28).sameElements(Bgzf.EofBlock))
  }

  test("headerless mode omits the terminator") {
    val file = compress(Array.tabulate[Byte](1000)(_.toByte), eof = false)
    assert(!file.takeRight(28).sameElements(Bgzf.EofBlock))
  }

  test("virtual offsets: writer offset round-trips through seekVirtual") {
    // write 10 chunks, note the virtual offset before each
    val bos = new ByteArrayOutputStream()
    val out = new BgzfOutputStream(bos)
    val offsets = Seq.newBuilder[(Long, Byte)]
    for (i <- 0 until 10) {
      val chunk = Array.fill[Byte](20000)(i.toByte)
      offsets += ((out.virtualOffset, i.toByte))
      out.write(chunk)
    }
    out.close()
    val file = bos.toByteArray
    val in = new BgzfInputStream(SeekableInput.ofBytes(file))
    offsets.result().foreach { case (voff, expect) =>
      in.seekVirtual(voff)
      assert(in.read() == (expect & 0xff), s"at voff $voff")
    }
    in.close()
  }

  test("block guesser finds the true next block from every byte offset") {
    val data = new Array[Byte](150000)
    rng.nextBytes(data) // random → stored blocks → magic bytes can occur in payload
    val file = compress(data)
    val truth = blockOffsets(file)
    val si = SeekableInput.ofBytes(file)
    var pos = 0L
    while (pos < file.length) {
      val expected = truth.find(_ >= pos).getOrElse(-1L)
      val got = BgzfBlockGuesser.nextBlockOffset(si, pos)
      assert(got == expected, s"from pos $pos: got $got expected $expected")
      pos += 1
    }
  }

  test("compression levels 1..9 all round-trip; low levels are larger but valid") {
    val data = Array.tabulate[Byte](300000)(i => ((i * 31 + i / 7) % 97).toByte)
    val sizes = for (level <- Seq(1, 5, 9)) yield {
      val bos = new ByteArrayOutputStream()
      val out = new BgzfOutputStream(bos, writeEof = true, level = level)
      out.write(data); out.close()
      val file = bos.toByteArray
      assert(decompressAll(file).sameElements(data), s"level $level")
      file.length
    }
    assert(sizes.head >= sizes.last, s"level 1 should not out-compress level 9: $sizes")
  }

  test("one compressor instance survives mixed compressible/stored blocks (deflater reuse)") {
    // alternate highly-compressible and random payloads through ONE stream so
    // the reused deflater crosses the stored-mode fallback repeatedly
    val bos = new ByteArrayOutputStream()
    val out = new BgzfOutputStream(bos)
    val expect = new ByteArrayOutputStream()
    for (i <- 0 until 8) {
      val chunk = new Array[Byte](Bgzf.MaxUncompressedPayload)
      if (i % 2 == 0) java.util.Arrays.fill(chunk, 'A'.toByte) else rng.nextBytes(chunk)
      out.write(chunk); expect.write(chunk)
    }
    out.close()
    assert(decompressAll(bos.toByteArray).sameElements(expect.toByteArray))
  }

  test("BgzfBlockCompressor rejects out-of-range levels and use-after-end") {
    intercept[IllegalArgumentException](new BgzfBlockCompressor(10))
    intercept[IllegalArgumentException](new BgzfBlockCompressor(-2))
    val c = new BgzfBlockCompressor(1)
    c.end(); c.end() // idempotent
    intercept[IllegalArgumentException](c.compress(new Array[Byte](10), 0, 10))
  }

  test("empty blocks mid-stream are skipped (concat of parts)") {
    val a = compress(Array.tabulate[Byte](100)(_.toByte), eof = true) // EOF block mid-file
    val b = compress(Array.tabulate[Byte](100)(i => (i + 100).toByte), eof = true)
    val whole = a ++ b
    val got = decompressAll(whole)
    assert(got.length == 200)
    assert(got(100) == 100.toByte)
  }
}
