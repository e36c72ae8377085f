package graft.cram

import org.scalatest.funsuite.AnyFunSuite

/** Adaptive arithmetic coder (CRAM 3.1 method 6): encode→decode identity
  * across orders, alphabet shapes, and lengths — including PACK and the CAT
  * escape — plus decode-side structural checks for the flag layouts our
  * encoder never emits (STRIPE, NOSZ, EXT, RLE), hand-assembled from the
  * container framing shared with rANS Nx16.
  */
class ArithDynamicSpec extends AnyFunSuite {

  private def roundTrip(data: Array[Byte], order: Int): Unit = {
    val packed = ArithDynamic.compress(data, order)
    val back = ArithDynamic.uncompress(packed, data.length)
    assert(back.sameElements(data),
      s"order-$order round-trip failed at length ${data.length} (flags=${packed.headOption})")
  }

  test("order-0 and order-1 round-trip across 200 seeded random byte arrays") {
    val rnd = new java.util.Random(6446)
    for (trial <- 0 until 200) {
      val n = rnd.nextInt(5000)
      val alpha = 1 + rnd.nextInt(256)
      val data = Array.fill[Byte](n)((rnd.nextInt(alpha) & 0xff).toByte)
      roundTrip(data, trial % 2)
    }
  }

  test("edge shapes: empty, single byte, all-identical, skewed, long") {
    for (order <- Seq(0, 1)) {
      roundTrip(Array.emptyByteArray, order)
      roundTrip(Array[Byte](42), order)
      roundTrip(Array.fill[Byte](1000)(7), order)
      roundTrip(Array.tabulate[Byte](10000)(i => if (i % 17 == 0) (i % 251).toByte else 3), order)
      // long enough to force several model renormalizations (total tops
      // MAX_FREQ every ~8k symbols at STEP=8)
      val rnd = new java.util.Random(99)
      roundTrip(Array.fill[Byte](120000)((rnd.nextInt(8) & 0xff).toByte), order)
    }
  }

  test("genomic-shaped payloads: quality runs and base streams") {
    val rnd = new java.util.Random(7)
    val quals = Array.fill[Byte](20000)((33 + rnd.nextInt(4) * 10).toByte)
    val bases = Array.fill[Byte](20000)("ACGT" (rnd.nextInt(4)).toByte)
    for (order <- Seq(0, 1)) { roundTrip(quals, order); roundTrip(bases, order) }
    // order-1 beats order-0 on random-walk qualities: >16 distinct symbols
    // (so PACK stays out of the way) with strong adjacent correlation
    var q = 60
    val walk = Array.fill[Byte](20000) {
      q = math.max(33, math.min(73, q + rnd.nextInt(3) - 1)); q.toByte
    }
    for (order <- Seq(0, 1)) roundTrip(walk, order)
    val o0 = ArithDynamic.compress(walk, 0).length
    val o1 = ArithDynamic.compress(walk, 1).length
    assert(o1 < o0, s"order-1 ($o1) should beat order-0 ($o0) on a random walk")
  }

  test("small alphabets trigger PACK and still round-trip") {
    val data = Array.fill[Byte](500)(0).zipWithIndex.map { case (_, i) => (i % 3).toByte }
    val packed = ArithDynamic.compress(data, 0)
    assert((packed(0) & ArithDynamic.FlagPack) != 0, "expected PACK flag")
    assert(ArithDynamic.uncompress(packed, data.length).sameElements(data))
  }

  test("incompressible input falls back to CAT and round-trips") {
    val rnd = new java.util.Random(11)
    val data = new Array[Byte](300)
    rnd.nextBytes(data)
    val packed = ArithDynamic.compress(data, 0)
    assert((packed(0) & ArithDynamic.FlagCat) != 0, "expected CAT flag")
    assert(ArithDynamic.uncompress(packed, data.length).sameElements(data))
  }

  test("STRIPE decode: hand-built 2-stream container") {
    // even bytes in one substream, odd in the other, each a complete
    // method-6 container
    val data = Array.tabulate[Byte](400)(i => ((i * 7) % 200).toByte)
    val even = data.zipWithIndex.collect { case (b, i) if i % 2 == 0 => b }
    val odd = data.zipWithIndex.collect { case (b, i) if i % 2 == 1 => b }
    val se = ArithDynamic.compress(even, 0)
    val so = ArithDynamic.compress(odd, 0)
    val out = new java.io.ByteArrayOutputStream()
    out.write(ArithDynamic.FlagStripe | ArithDynamic.FlagNoSz)
    out.write(2)
    def varint(v: Int): Unit = {
      if (v < 128) out.write(v) else { out.write(0x80 | (v >> 7)); out.write(v & 0x7f) }
    }
    varint(se.length); varint(so.length)
    out.write(se, 0, se.length); out.write(so, 0, so.length)
    assert(ArithDynamic.uncompress(out.toByteArray, data.length).sameElements(data))
  }

  test("EXT decode: bzip2 payload behind the container header") {
    val data = Array.fill[Byte](2000)('q')
    val bz = new java.io.ByteArrayOutputStream()
    val z = new org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream(bz)
    z.write(data); z.close()
    val out = new java.io.ByteArrayOutputStream()
    out.write(ArithDynamic.FlagExt)
    out.write(0x80 | (2000 >> 7)); out.write(2000 & 0x7f)
    val zb = bz.toByteArray
    out.write(zb, 0, zb.length)
    assert(ArithDynamic.uncompress(out.toByteArray, data.length).sameElements(data))
  }

  test("RLE decode round-trips against the conforming RLE producer") {
    // compress() never emits RLE; compressRle is its exact counterpart
    // (literal under the byte model, run as cap-and-continue 0..255
    // chunks: first under runs[literal], continuations under runs[256])
    for (order <- Seq(0, 1)) {
      val data = ("AAAAAAAAAA" + "B" + ("C" * 300) + "DD").getBytes
      assert(ArithDynamic.uncompress(ArithDynamic.compressRle(data, order), data.length)
        .sameElements(data), s"order $order")
      // runs long enough to need several continuation chunks (>2×255)
      val long = Array.fill[Byte](1200)('x') ++ Array[Byte](1, 2) ++ Array.fill[Byte](255)('y')
      assert(ArithDynamic.uncompress(ArithDynamic.compressRle(long, order), long.length)
        .sameElements(long), s"order $order long-run")
    }
  }

  test("truncated streams throw IOException, never wrong bytes") {
    val blob = Array.tabulate[Byte](900)(i => ((i * 31) % 23).toByte)
    for (order <- Seq(0, 1); cut <- 1 to 6) {
      val full = ArithDynamic.compress(blob, order)
      assert(ArithDynamic.uncompress(full, blob.length).sameElements(blob))
      intercept[java.io.IOException] {
        ArithDynamic.uncompress(full.dropRight(cut), blob.length)
      }
    }
  }
}
