package graft.cram

import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-input sweep over every CRAM 3.x block codec: random bytes,
  * bit-flipped valid streams, and hostile header sizes must fail with
  * IOException (the documented corrupt-stream contract) or — rarely, by
  * construction — decode to a correct-length result. Never a raw index /
  * negative-size / OOM-scale allocation error, never a hang.
  */
class CodecFuzzSpec extends AnyFunSuite {

  // (name, decoder, honors the declared raw size) — rans 4x8 carries its
  // own embedded size, so a fluke decode there can be any length
  private val decoders: Seq[(String, (Array[Byte], Int) => Array[Byte], Boolean)] = Seq(
    ("rans4x8", (in: Array[Byte], _: Int) => Rans.uncompress(in), false),
    ("ransNx16", (in: Array[Byte], n: Int) => RansNx16.uncompress(in, n), true),
    ("arith", (in: Array[Byte], n: Int) => ArithDynamic.uncompress(in, n), true),
    ("fqzcomp", (in: Array[Byte], n: Int) => FqzComp.uncompress(in, n), true),
    ("tok3", (in: Array[Byte], n: Int) => NameTok3.uncompress(in, n), true))

  private def mustContain(name: String, in: Array[Byte], rawSize: Int,
                          fn: (Array[Byte], Int) => Array[Byte]): Unit = {
    try {
      val out = fn(in, rawSize)
      // a fluke decode is acceptable ONLY if it honors the declared size
      assert(out.length == rawSize || rawSize < 0,
        s"$name returned ${out.length} bytes for declared $rawSize without error")
    } catch {
      case _: java.io.IOException => // the contract
      case e: Throwable =>
        fail(s"$name leaked ${e.getClass.getSimpleName}: ${e.getMessage} " +
          s"on input ${in.take(12).mkString(",")}…")
    }
  }

  test("random byte blobs never escape the IOException contract") {
    val rnd = new java.util.Random(20260814)
    for (trial <- 0 until 400) {
      val n = rnd.nextInt(200)
      val blob = new Array[Byte](n)
      rnd.nextBytes(blob)
      val rawSize = rnd.nextInt(3) match {
        case 0 => rnd.nextInt(500)
        case 1 => 0
        case _ => 64
      }
      decoders.foreach { case (name, fn, honors) =>
        mustContain(name, blob, if (honors) rawSize else -1, fn)
      }
    }
  }

  test("single-bit flips in valid streams never escape the contract") {
    val rnd = new java.util.Random(7)
    val payload = Array.fill[Byte](600)((rnd.nextInt(23)).toByte)
    val nameBlob = (0 until 40).flatMap(i => s"r:$i".getBytes :+ 0.toByte).toArray
    val streams: Seq[(String, Array[Byte], Int, (Array[Byte], Int) => Array[Byte])] = Seq(
      ("ransNx16", RansNx16.compress(payload, 1), payload.length,
        (in: Array[Byte], n: Int) => RansNx16.uncompress(in, n)),
      ("arith", ArithDynamic.compress(payload, 1), payload.length,
        (in: Array[Byte], n: Int) => ArithDynamic.uncompress(in, n)),
      ("fqzcomp", FqzComp.compress(payload), payload.length,
        (in: Array[Byte], n: Int) => FqzComp.uncompress(in, n)),
      ("tok3", NameTok3.compress(nameBlob, useArith = false), nameBlob.length,
        (in: Array[Byte], n: Int) => NameTok3.uncompress(in, n)))
    streams.foreach { case (name, packed, rawSize, fn) =>
      for (_ <- 0 until 150) {
        val mutated = packed.clone()
        val bit = rnd.nextInt(mutated.length * 8)
        mutated(bit / 8) = (mutated(bit / 8) ^ (1 << (bit % 8))).toByte
        mustContain(name, mutated, rawSize, fn)
      }
    }
  }

  test("hostile header sizes fail fast, not as giant allocations") {
    // tok3 header claiming 2 GB of names in a 16-byte stream
    val t = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = { t.write((v & 0xff).toInt); t.write(((v >> 8) & 0xff).toInt); t.write(((v >> 16) & 0xff).toInt); t.write(((v >> 24) & 0xff).toInt) }
    w32(0x7fffffffL); w32(0x7fffffffL); t.write(0)
    intercept[java.io.IOException] { NameTok3.uncompress(t.toByteArray, 64) }
    // rans/arith embedded stream claiming 2 GB: 5-group uint7 varint
    val big = Array[Byte](0x00, 0x87.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0x7F, 1, 2, 3)
    intercept[java.io.IOException] { RansNx16.uncompress(big, -1) }
    intercept[java.io.IOException] { ArithDynamic.uncompress(big, -1) }
  }
}
