package graft.cram

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** rANS 4x8 codec: encode→decode identity across the input shapes that
  * exercise every structural branch — empty, tiny (< 4 forces order-0
  * fallback), single-symbol (freq 4096), consecutive-symbol runs (table
  * RLE), full-alphabet, skewed, and `length % 4` remainder handling in
  * order-1's quartered layout.
  */
class RansSpec extends AnyFunSuite {

  private def roundtrip(raw: Array[Byte], order: Int): Unit = {
    val packed = Rans.compress(raw, order)
    val back = Rans.uncompress(packed)
    assert(back.toSeq == raw.toSeq, s"order=$order n=${raw.length}")
  }

  test("empty input round-trips at both orders") {
    roundtrip(Array.emptyByteArray, 0)
    roundtrip(Array.emptyByteArray, 1)
  }

  test("single-symbol runs (freq=4096 edge) round-trip") {
    for (order <- Seq(0, 1); n <- Seq(1, 2, 3, 4, 5, 7, 64, 4097))
      roundtrip(Array.fill(n)(0x41.toByte), order)
    // symbol 0 alone: the list terminator is also a valid first symbol
    roundtrip(Array.fill(100)(0.toByte), 0)
    roundtrip(Array.fill(100)(0.toByte), 1)
  }

  test("consecutive symbol alphabet exercises table RLE") {
    val raw = Array.tabulate(1000)(i => (i % 7 + 60).toByte) // symbols 60..66
    roundtrip(raw, 0)
    roundtrip(raw, 1)
  }

  test("full 256-symbol alphabet round-trips") {
    val raw = Array.tabulate(4096)(i => i.toByte)
    roundtrip(raw, 0)
    roundtrip(raw, 1)
  }

  test("length % 4 remainders in order-1") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(4, 5, 6, 7, 8, 101, 1022, 1023, 1024, 1025)) {
      val raw = Array.fill(n)((rnd.nextInt(4) * 31 + 33).toByte)
      roundtrip(raw, 1)
    }
  }

  test("header records raw size and order actually used") {
    val packed = Rans.compress(Array[Byte](1, 2), 1) // too small → order 0
    assert(packed(0) == 0)
    val n = (packed(5) & 0xff) | ((packed(6) & 0xff) << 8)
    assert(n == 2)
  }

  test("random byte arrays round-trip (property)") {
    val gen = for {
      n <- Gen.choose(0, 3000)
      skew <- Gen.choose(1, 8)
      bytes <- Gen.listOfN(n, Gen.choose(0, 255).map(v => (v >> skew << skew).toByte))
    } yield bytes.toArray
    val prop = Prop.forAll(gen, Gen.oneOf(0, 1)) { (raw: Array[Byte], order: Int) =>
      Rans.uncompress(Rans.compress(raw, order)).toSeq == raw.toSeq
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("quality-score-like data compresses below raw size") {
    val rnd = new scala.util.Random(42)
    val raw = Array.fill(100000)((33 + rnd.nextInt(8)).toByte)
    val o0 = Rans.compress(raw, 0)
    val o1 = Rans.compress(raw, 1)
    assert(o0.length < raw.length / 2)
    assert(o1.length < raw.length / 2)
    assert(Rans.uncompress(o0).toSeq == raw.toSeq)
    assert(Rans.uncompress(o1).toSeq == raw.toSeq)
  }
}
