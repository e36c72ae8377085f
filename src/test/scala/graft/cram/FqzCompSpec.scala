package graft.cram

import org.scalatest.funsuite.AnyFunSuite

/** FQZComp quality codec (CRAM 3.1 method 7): the library encoder's
  * minimal profile round-trips; a spec-local FULL-profile encoder (multi-
  * record, qmap, qtab/ptab/dtab step tables, dedup, reverse flags) pins
  * the decode paths the minimal profile never exercises; step-table
  * read/write round-trips; truncation rejects.
  */
class FqzCompSpec extends AnyFunSuite {

  private def walkQuals(n: Int, seed: Int): Array[Byte] = {
    val rnd = new java.util.Random(seed)
    var q = 30
    Array.fill[Byte](n) {
      q = math.max(0, math.min(60, q + rnd.nextInt(5) - 2)); q.toByte
    }
  }

  test("minimal-profile encode round-trips across shapes and lengths") {
    for ((n, seed) <- Seq((1, 1), (37, 2), (1000, 3), (20000, 4), (100000, 5))) {
      val data = walkQuals(n, seed)
      val packed = FqzComp.compress(data)
      assert(packed != null)
      val back = FqzComp.uncompress(packed, data.length)
      assert(back.sameElements(data), s"fqz round-trip failed at n=$n")
    }
    // binned qualities (the common real-world shape) compress well
    val binned = Array.tabulate[Byte](50000)(i => (Seq(2, 12, 22, 37)((i / 100) % 4)).toByte)
    val packed = FqzComp.compress(binned)
    assert(packed.length * 10 < binned.length,
      s"binned quals should collapse ≥10×: ${packed.length}/${binned.length}")
    assert(FqzComp.uncompress(packed, binned.length).sameElements(binned))
  }

  test("symbols above 254 refuse (caller falls back)") {
    assert(FqzComp.compress(Array[Byte](1, -1, 3)) == null) // 0xff
    assert(FqzComp.compress(Array.emptyByteArray) == null)
  }

  test("step tables write/read round-trip") {
    val rnd = new java.util.Random(11)
    for (size <- Seq(256, 1024)) {
      // monotone step table (the only legal shape): k buckets over size
      var v = 0
      val arr = Array.tabulate(size) { i =>
        if (rnd.nextInt(40) == 0 && v < 60) v += 1 + rnd.nextInt(3)
        v
      }
      val bytes = FqzComp.writeArrayForSpec(arr)
      val back = FqzComp.readArrayForSpec(bytes, size)
      assert(back.sameElements(arr), s"step table round-trip at $size")
    }
    // a run longer than 255 exercises the continuation form
    val long = Array.fill(1024)(0)
    assert(FqzComp.readArrayForSpec(FqzComp.writeArrayForSpec(long), 1024).sameElements(long))
  }

  test("full-profile stream decodes: multi-record, qmap, tables, dedup, reverse") {
    // three records over a 4-symbol alphabet, record 2 a dedup copy of
    // record 1, record 3 reversed — encoded by the spec-local encoder
    // below, which mirrors the decoder's context update exactly
    val r1 = Array[Byte](0, 1, 2, 3, 3, 2, 1, 0, 1, 1)
    val r3 = Array[Byte](3, 3, 0, 0, 2, 1, 2, 1, 0, 3, 2, 2)
    val blob = r1 ++ r1 ++ r3
    val packed = HandFqz.encode(Seq(r1.length, r1.length, r3.length),
      blob, dedupSecond = true, reverseThird = true)
    // the stored stream carries record 3 REVERSED with its rev flag set;
    // decode must undo it
    val back = FqzComp.uncompress(packed, blob.length)
    assert(back.sameElements(r1 ++ r1 ++ r3), back.mkString(","))
  }

  test("fixed-length records decode (DO_LEN unset: one length, many records)") {
    val recs = (0 until 20).map(i => walkQuals(50, 100 + i))
    val blob = recs.reduce(_ ++ _)
    val packed = HandFqz.encodeFixedLen(50, blob)
    assert(FqzComp.uncompress(packed, blob.length).sameElements(blob))
  }

  test("truncated streams throw IOException, never wrong bytes") {
    val data = walkQuals(2000, 9)
    val packed = FqzComp.compress(data)
    assert(FqzComp.uncompress(packed, data.length).sameElements(data))
    for (cut <- Seq(1, 2, 5)) {
      intercept[java.io.IOException] {
        FqzComp.uncompress(packed.dropRight(cut), data.length)
      }
    }
    intercept[java.io.IOException] { FqzComp.uncompress(Array[Byte](9, 9), 4) }
  }
}

/** Spec-local fqzcomp producer for the structures the library's minimal
  * encoder never emits. Mirrors FqzComp.decode symbol-for-symbol: any
  * drift between them fails the round-trip assertions above.
  */
private object HandFqz {
  private val QBits = 8
  private val QShift = 4

  /** gflags DO_REV; pflags DO_LEN|DO_DEDUP|HAVE_QMAP|HAVE_QTAB|HAVE_PTAB|
    * HAVE_DTAB over a 4-symbol qmap'd alphabet.
    */
  def encode(lens: Seq[Int], blob: Array[Byte],
             dedupSecond: Boolean, reverseThird: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(5) // vers
    out.write(4) // gflags: DO_REV
    // param header
    out.write(7); out.write(0) // context = 7 (uint16 LE)
    out.write(4 | 2 | 16 | 128 | 32 | 64) // DO_LEN|DO_DEDUP|QMAP|QTAB|PTAB|DTAB
    out.write(4) // max_sym: 4 mapped symbols
    out.write((QBits << 4) | QShift)
    out.write((0 << 4) | 0) // qloc 0, sloc 0
    out.write((9 << 4) | 13) // ploc 9, dloc 13
    // qmap: model symbol j -> quality byte
    val qmap = Array(0, 1, 2, 3)
    qmap.foreach(out.write)
    val unmap = Array.fill(256)(-1)
    qmap.zipWithIndex.foreach { case (q, j) => unmap(q) = j }
    // qtab over 256 (identity steps for the first 4, flat after),
    // ptab over 1024 (two buckets), dtab over 256 (three buckets)
    val qtab = Array.tabulate(256)(i => math.min(i, 3))
    val ptab = Array.tabulate(1024)(i => if (i < 12) 0 else 1)
    val dtab = Array.tabulate(256)(i => math.min(i / 4, 2))
    out.write(FqzComp.writeArrayForSpec(qtab))
    out.write(FqzComp.writeArrayForSpec(ptab))
    out.write(FqzComp.writeArrayForSpec(dtab))
    // payload
    val bos = new java.io.ByteArrayOutputStream()
    val rc = new ArithInternals.RangeEncoder(bos)
    val nsym = 4 + 1
    val qualModels = new Array[ArithInternals.Model](1 << 16)
    def qual(ctx: Int): ArithInternals.Model = {
      val m = qualModels(ctx)
      if (m != null) m
      else { val nm = new ArithInternals.Model(nsym); qualModels(ctx) = nm; nm }
    }
    val lenModels = Array.fill(4)(new ArithInternals.Model(256))
    val revModel = new ArithInternals.Model(2)
    val dupModel = new ArithInternals.Model(2)
    val qmask = (1 << QBits) - 1
    var off = 0
    lens.zipWithIndex.foreach { case (len, r) =>
      lenModels(0).encode(rc, len & 0xff)
      lenModels(1).encode(rc, (len >> 8) & 0xff)
      lenModels(2).encode(rc, (len >> 16) & 0xff)
      lenModels(3).encode(rc, (len >> 24) & 0xff)
      val rev = reverseThird && r == 2
      revModel.encode(rc, if (rev) 1 else 0)
      val dup = dedupSecond && r == 1
      dupModel.encode(rc, if (dup) 1 else 0)
      if (!dup) {
        val rec0 = blob.slice(off, off + len)
        val rec = if (rev) rec0.reverse else rec0
        var qctx = 0
        var delta = 0
        var prevq = 0
        var last = 7 // pm.context
        var p = len
        rec.foreach { b =>
          val q = unmap(b & 0xff)
          require(q >= 0, s"byte $b outside qmap")
          qual(last & 0xffff).encode(rc, q)
          qctx = (qctx << QShift) + qtab(q)
          var nl = (qctx & qmask) << 0
          nl += ptab(math.min(p, 1023)) << 9
          nl += dtab(math.min(delta, 255)) << 13
          if (prevq != q) delta += 1
          prevq = q
          last = nl & 0xffff
          p -= 1
        }
      }
      off += len
    }
    rc.finish()
    val payload = bos.toByteArray
    out.write(payload, 0, payload.length)
    out.toByteArray
  }

  /** pflags WITHOUT DO_LEN: the length rides once (first record) and every
    * later record reuses it.
    */
  def encodeFixedLen(len: Int, blob: Array[Byte]): Array[Byte] = {
    require(blob.length % len == 0)
    val out = new java.io.ByteArrayOutputStream()
    out.write(5)
    out.write(0) // gflags
    out.write(0); out.write(0) // context 0
    out.write(0) // pflags: nothing — fixed length, identity everything
    var maxq = 0
    blob.foreach(b => maxq = math.max(maxq, b & 0xff))
    out.write(maxq + 1)
    out.write((QBits << 4) | QShift)
    out.write(0)
    out.write(0)
    val bos = new java.io.ByteArrayOutputStream()
    val rc = new ArithInternals.RangeEncoder(bos)
    val nsym = maxq + 2
    val qualModels = new Array[ArithInternals.Model](1 << 16)
    def qual(ctx: Int): ArithInternals.Model = {
      val m = qualModels(ctx)
      if (m != null) m
      else { val nm = new ArithInternals.Model(nsym); qualModels(ctx) = nm; nm }
    }
    val lenModels = Array.fill(4)(new ArithInternals.Model(256))
    val qmask = (1 << QBits) - 1
    var first = true
    blob.grouped(len).foreach { rec =>
      if (first) {
        lenModels(0).encode(rc, len & 0xff)
        lenModels(1).encode(rc, (len >> 8) & 0xff)
        lenModels(2).encode(rc, (len >> 16) & 0xff)
        lenModels(3).encode(rc, (len >> 24) & 0xff)
        first = false
      }
      var qctx = 0
      var last = 0
      rec.foreach { b =>
        val q = b & 0xff
        qual(last & 0xffff).encode(rc, q)
        qctx = (qctx << QShift) + q // identity qtab
        last = (qctx & qmask) & 0xffff
      }
    }
    rc.finish()
    val payload = bos.toByteArray
    out.write(payload, 0, payload.length)
    out.toByteArray
  }
}
