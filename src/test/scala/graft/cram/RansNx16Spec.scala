package graft.cram

import org.scalatest.funsuite.AnyFunSuite

/** rANS Nx16 (CRAM 3.1 method 5): encode→decode identity across orders,
  * alphabet shapes, and lengths — including the PACK transform the encoder
  * applies on small alphabets and the CAT escape on incompressible input —
  * plus decode-side structural checks (STRIPE, explicit flag layouts).
  */
class RansNx16Spec extends AnyFunSuite {

  private def roundTrip(data: Array[Byte], order: Int): Unit = {
    val packed = RansNx16.compress(data, order)
    val back = RansNx16.uncompress(packed, data.length)
    assert(back.sameElements(data),
      s"order-$order round-trip failed at length ${data.length} (flags=${packed.headOption})")
  }

  test("order-0 and order-1 round-trip across 200 seeded random byte arrays") {
    val rnd = new java.util.Random(424242)
    for (trial <- 0 until 200) {
      val n = rnd.nextInt(5000)
      val alpha = 1 + rnd.nextInt(256)
      val data = Array.fill[Byte](n)((rnd.nextInt(alpha) & 0xff).toByte)
      roundTrip(data, trial % 2)
    }
  }

  test("edge shapes: empty, single byte, all-identical, length % 4 residues") {
    for (order <- Seq(0, 1)) {
      roundTrip(Array.emptyByteArray, order)
      roundTrip(Array[Byte](42), order)
      roundTrip(Array.fill[Byte](1000)(7), order)
      for (n <- 1 to 9) roundTrip(Array.tabulate[Byte](n)(i => (i * 37).toByte), order)
    }
  }

  test("small alphabets trigger PACK and still round-trip") {
    // 2, 4, 16-symbol alphabets → 1/2/4-bit packing
    for (nsym <- Seq(2, 3, 4, 5, 16); order <- Seq(0, 1)) {
      val data = Array.tabulate[Byte](4097)(i => ((i * 31 + i / 7) % nsym).toByte)
      val packed = RansNx16.compress(data, order)
      assert((packed(0) & RansNx16.FlagPack) != 0, s"nsym=$nsym did not pack")
      roundTrip(data, order)
    }
  }

  test("genomic-shaped payloads: quality runs and base streams") {
    // quality-like: long runs over a tiny alphabet with occasional jitters
    val qual = Array.tabulate[Byte](50000)(i => if (i % 997 == 0) 30 else 38)
    roundTrip(qual, 0); roundTrip(qual, 1)
    // base-like: 4-symbol with order-1 structure
    val acgt = "ACGT".getBytes
    val bases = Array.tabulate[Byte](40000)(i => acgt((i * i + i / 3) % 4))
    roundTrip(bases, 0); roundTrip(bases, 1)
  }

  test("incompressible input falls back to CAT and round-trips") {
    val rnd = new java.util.Random(7)
    // full-alphabet uniform noise: entropy coding cannot shrink it below
    // raw, so the encoder must escape to CAT rather than expand
    val data = new Array[Byte](64)
    rnd.nextBytes(data)
    val packed = RansNx16.compress(data, 0)
    val back = RansNx16.uncompress(packed, data.length)
    assert(back.sameElements(data))
  }

  test("STRIPE decode: hand-built 2-stream container") {
    // stripe container: flags STRIPE, ulen, N=2, clens, then two complete
    // Nx16 sub-streams carrying the even/odd byte columns
    val data = Array.tabulate[Byte](101)(i => (i % 7).toByte)
    val cols = Array.tabulate(2)(j => data.indices.collect { case i if i % 2 == j => data(i) }.toArray)
    val subs = cols.map(RansNx16.compress(_, 0))
    val out = new java.io.ByteArrayOutputStream()
    out.write(RansNx16.FlagStripe)
    out.write(data.length) // 101 < 128: single-byte uint7
    out.write(2)
    subs.foreach(s => out.write(s.length)) // < 128 each for this input
    subs.foreach(s => out.write(s, 0, s.length))
    val back = RansNx16.uncompress(out.toByteArray, data.length)
    assert(back.sameElements(data))
  }

  test("known-answer: hand-built order-0 stream from spec math alone") {
    // Single-symbol alphabet {65 ('A'): freq 4096 = 2^12}. The state
    // transform x → freq·(x>>12) + (x & 0xFFF) − cum = x is the IDENTITY,
    // so no renormalization words exist and the four initial states are
    // the encoder's start value L = 0x8000. Stream assembled by hand:
    //   flags 0x00; ulen 4 (uint7);
    //   alphabet [65, terminator 0]; freq 4096 as uint7 [0xA0, 0x00];
    //   states 4 × uint32-LE 0x00008000.
    val kat = Array[Int](
      0x00, 0x04,
      65, 0x00,
      0xA0, 0x00,
      0x00, 0x80, 0x00, 0x00,
      0x00, 0x80, 0x00, 0x00,
      0x00, 0x80, 0x00, 0x00,
      0x00, 0x80, 0x00, 0x00).map(_.toByte)
    assert(RansNx16.uncompress(kat, 4).sameElements("AAAA".getBytes))
  }

  test("known-answer: two-symbol order-0 decode table split") {
    // Alphabet {66: 2048, 67: 2048}: cumulative [0, 2048), [2048, 4096).
    // A state whose low 12 bits sit below 2048 decodes 'B', above 'C'.
    // States chosen so the post-decode state lands EXACTLY at L = 0x8000
    // (a real encoder's initial state — anything below L would demand
    // renormalization bytes, and their absence is truncation): x = 0x10000
    // (m=0, 'B', next = 2048·16 = 0x8000) for states 0/2 and x = 0x10800
    // (m=0x800, 'C', next = 2048·16 + 0x800 − 0x800 = 0x8000) for 1/3
    // → decodes "BCBC".
    val kat = Array[Int](
      0x00, 0x04,
      66, 67, 0x00, 0x00, // 66; 67 = prev+1 → run byte 0; terminator 0
      0x90, 0x00,         // 2048 as uint7
      0x90, 0x00,
      0x00, 0x00, 0x01, 0x00,
      0x00, 0x08, 0x01, 0x00,
      0x00, 0x00, 0x01, 0x00,
      0x00, 0x08, 0x01, 0x00).map(_.toByte)
    assert(RansNx16.uncompress(kat, 4).sameElements("BCBC".getBytes))
  }

  test("under-summed stored frequency table is renormalized, not rejected") {
    // Same stream as the "BCBC" KAT but the STORED freqs are 1024/1024
    // (sum 2048 < 4096). hts-specs decoders renormalize read tables to
    // 1<<shift (htscodecs normalise_freq_shift); 1024·4096/2048 = 2048
    // each recovers the KAT's working table, so the decode is identical.
    val kat = Array[Int](
      0x00, 0x04,
      66, 67, 0x00, 0x00,
      0x88, 0x00,         // 1024 as uint7 — under-summed on purpose
      0x88, 0x00,
      0x00, 0x00, 0x01, 0x00,
      0x00, 0x08, 0x01, 0x00,
      0x00, 0x00, 0x01, 0x00,
      0x00, 0x08, 0x01, 0x00).map(_.toByte)
    assert(RansNx16.uncompress(kat, 4).sameElements("BCBC".getBytes))
  }

  test("truncated entropy payload throws IOException, never wrong bytes") {
    // Every renormalization word the encoder emitted is consumed on decode;
    // cutting the tail must surface as an error (the documented corrupt-
    // stream contract), not as a correct-length array of wrong bytes.
    val blob = Array.tabulate[Byte](900)(i => ((i * 31) % 23).toByte)
    for (order <- Seq(0, 1); cut <- 1 to 6) {
      val full = RansNx16.compress(blob, order)
      assert(RansNx16.uncompress(full, blob.length).sameElements(blob))
      val trunc = full.dropRight(cut)
      intercept[java.io.IOException] {
        RansNx16.uncompress(trunc, blob.length)
      }
    }
  }

  test("embedded payloads decode in BOTH layouts: bare order-0 and full container") {
    // the foreign-file path: order-1 tables / RLE metadata arrive either as
    // a headerless order-0 entropy payload (the layout the outer explicit
    // length implies) or as a complete Nx16 container — decodeEmbedded
    // accepts both. Blob chosen so compress picks plain order-0 (no
    // PACK: >16 distinct symbols; compressible: skewed distribution).
    val blob = Array.tabulate[Byte](600)(i => if (i % 5 == 0) (i % 23).toByte else 3)
    val container = RansNx16.compress(blob, 0)
    assert((container(0) & 0xff) == 0, s"expected plain order-0 container, flags=${container(0)}")
    // bare form = container minus its header (flags byte + ulen varint)
    var p = 1
    while ((container(p) & 0x80) != 0) p += 1
    p += 1
    val bare = container.drop(p)
    assert(RansNx16.decodeEmbedded(bare, blob.length).sameElements(blob), "bare layout")
    assert(RansNx16.decodeEmbedded(container, blob.length).sameElements(blob), "container layout")
  }

  test("NOSZ flag defers to the block header's raw size") {
    val data = Array.tabulate[Byte](333)(i => (i % 11).toByte)
    val packed = RansNx16.compress(data, 0)
    // rebuild with NOSZ: drop the varint length after the flags byte
    var p = 1
    while ((packed(p) & 0x80) != 0) p += 1
    p += 1
    val nosz = (packed(0) | RansNx16.FlagNoSz).toByte +: packed.drop(p)
    val back = RansNx16.uncompress(nosz, data.length)
    assert(back.sameElements(data))
  }
}
