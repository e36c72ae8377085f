package graft.cram

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** CRAM records-mode field projection: pruned qualities/sequence/attributes
  * don't just skip value materialization — their exclusive external blocks
  * are never DECOMPRESSED (counted via the codec's inflate counter), and a
  * pruned seq drops the reference requirement entirely. Values on the
  * columns that ARE read must be identical to a full decode.
  */
class CramProjectionSpec extends AnyFunSuite with SparkFixture {

  private def tmpDir(): java.nio.file.Path = {
    val d = Files.createTempDirectory("cramproj")
    d.toFile.deleteOnExit()
    d
  }

  private def reads(n: Int) = {
    val s = spark
    import s.implicits._
    spark.range(n.toLong).select(
      concat(lit("q"), col("id")).as("readName"),
      lit(0).cast("int").as("flags"),
      when(col("id") % 2 === 0, "chrA").otherwise("chrB").as("contig"),
      (col("id") * 13 % 9000 + 1).cast("int").as("start"),
      (col("id") * 13 % 9000 + 6).cast("int").as("end"),
      lit(30).cast("int").as("mapq"),
      lit("4M2I2M").as("cigar"),
      lit(null).cast("string").as("mateContig"),
      lit(0).cast("int").as("mateStart"),
      lit(0).cast("int").as("tlen"),
      lit("ACGTACGT").as("seq"),
      lit("FFIIFFII").as("qual"),
      map(lit("NM"), concat(lit("i:"), (col("id") % 5).cast("string")),
        lit("XZ"), concat(lit("Z:payload"), (col("id") % 97).cast("string"))).as("attributes"))
  }

  test("pruned qual/seq/attrs skip whole block inflations; kept columns identical") {
    val dir = tmpDir()
    val out = dir.resolve("p.cram")
    reads(4000).write.format("cram").mode("overwrite")
      .option("records", "true").option("refs", "chrA:1000000,chrB:1000000")
      .option("recordsPerContainer", "1000").save(out.toString)

    def countInflations[T](body: => T): (T, Long) = {
      val before = CramRecordCodec.blocksInflated.get()
      val r = body
      (r, CramRecordCodec.blocksInflated.get() - before)
    }
    def shared(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("contig"))
      .agg(count(lit(1)).as("n"), sum(col("start").cast("long")).as("ss"),
        sum(col("end").cast("long")).as("se"))
    def base = spark.read.format("cram").option("records", "true").load(out.toString)
    // full decode: FORCE qual/attrs consumption (a mere selectExpr would be
    // pruned right back out by Catalyst and skip the same blocks)
    val (fullRows, fullInfl) = countInflations {
      val r = base
        .groupBy(col("contig"))
        .agg(count(lit(1)).as("n"), sum(col("start").cast("long")).as("ss"),
          sum(col("end").cast("long")).as("se"),
          sum(length(col("qual")).cast("long")).as("lq"),
          sum(length(element_at(col("attributes"), "XZ")).cast("long")).as("lx"))
        .orderBy(col("contig")).collect().toSeq
      (r.map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3))),
        r.map(_.getLong(4)).sum, r.map(_.getLong(5)).sum)
    }
    assert(fullRows._2 > 0 && fullRows._3 > 0) // qual/attrs really decoded
    val (prunedRows, prunedInfl) = countInflations {
      shared(base).orderBy(col("contig")).collect().toSeq
        .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    }
    assert(prunedRows == fullRows._1, "projection changed kept-column values")
    // the QS block and both tag blocks (NM, XZ) must stay compressed in the
    // pruned read: at least 3 fewer inflations per container x 4 containers
    assert(prunedInfl <= fullInfl - 8,
      s"expected block skips: full=$fullInfl pruned=$prunedInfl")

    // selected columns keep exact values under partial pruning
    val qs = spark.read.format("cram").option("records", "true").load(out.toString)
      .select(col("readName"), col("qual"), col("seq"),
        element_at(col("attributes"), "NM").as("nm"))
      .orderBy(col("readName")).limit(3).collect()
    assert(qs.forall(r => r.getString(1) == "FFIIFFII" && r.getString(2) == "ACGTACGT"))
    assert(qs.forall(_.getString(3).startsWith("i:")))
  }

  test("tagColumns: typed tags decode selectively, unrequested tag blocks stay compressed") {
    val dir = tmpDir()
    val out = dir.resolve("t.cram")
    reads(3000).write.format("cram").mode("overwrite")
      .option("records", "true").option("refs", "chrA:1000000,chrB:1000000")
      .option("recordsPerContainer", "1000").save(out.toString)
    def countInflations[T](body: => T): (T, Long) = {
      val before = CramRecordCodec.blocksInflated.get()
      val r = body
      (r, CramRecordCodec.blocksInflated.get() - before)
    }
    // NM requested as a typed column; the XZ tag block must never inflate
    val (rows, nmInfl) = countInflations {
      spark.read.format("cram").option("records", "true")
        .option("tagColumns", "NM:int")
        .load(out.toString)
        .groupBy(col("contig"))
        .agg(sum(col("tag_NM")).as("snm"), count(lit(1)).as("n"))
        .orderBy(col("contig")).collect().toSeq
    }
    assert(rows.map(_.getLong(2)).sum == 3000)
    // NM values: id % 5 summed per contig parity
    val wantNm = (0 until 3000).groupBy(i => if (i % 2 == 0) "chrA" else "chrB")
      .map { case (c, is) => c -> is.map(_ % 5).sum.toLong }
    rows.foreach(r => assert(r.getLong(1) == wantNm(r.getString(0))))
    val (_, bothInfl) = countInflations {
      spark.read.format("cram").option("records", "true")
        .option("tagColumns", "NM:int,XZ")
        .load(out.toString)
        .select(sum(length(col("tag_XZ"))), sum(col("tag_NM"))).collect()
    }
    // requesting XZ too inflates its blocks: strictly more inflations
    assert(bothInfl > nmInfl,
      s"XZ block not skipped under NM-only projection: nm=$nmInfl both=$bothInfl")
  }

  test("readName pruned -> RN blocks never inflate; kept columns identical") {
    val dir = tmpDir()
    val out = dir.resolve("rn.cram")
    // long names make RN a real block; values must be exact when selected
    val s = spark
    import org.apache.spark.sql.functions.{col => c}
    reads(3000).withColumn("readName",
      concat(lit("instrument-42:run-7:flowcell-XYZ:lane-3:tile-"), col("readName")))
      .write.format("cram").mode("overwrite")
      .option("records", "true").option("refs", "chrA:1000000,chrB:1000000")
      .option("recordsPerContainer", "1000").save(out.toString)
    def countInflations[T](body: => T): (T, Long) = {
      val before = CramRecordCodec.blocksInflated.get()
      val r = body
      (r, CramRecordCodec.blocksInflated.get() - before)
    }
    def base = spark.read.format("cram").option("records", "true").load(out.toString)
    val (withNames, nameInfl) = countInflations {
      base.select(c("readName"), c("start"))
        .agg(sum(length(c("readName"))).cast("long"), sum(c("start").cast("long")))
        .collect()(0)
    }
    assert(withNames.getLong(0) > 3000L * 40) // names really decoded
    val (noNames, noNameInfl) = countInflations {
      base.agg(sum(c("start").cast("long")), count(lit(1))).collect()(0)
    }
    assert(noNames.getLong(0) == withNames.getLong(1), "kept column changed under name pruning")
    assert(noNames.getLong(1) == 3000L)
    assert(noNameInfl < nameInfl,
      s"RN blocks not skipped: withNames=$nameInfl withoutNames=$noNameInfl")
  }

  test("skip eligibility is fixpoint-closed over consumed codecs") {
    // a: usesCore -> always consumed, touches block 1
    // b: shares 1 with the consumer a -> consumed, drags in block 2
    // c: shares 2 with b -> consumed (the transitive step a one-pass rule misses)
    // d: exclusive block 3 -> stays skippable
    val a = CByteArrayLen(CBeta(0, 8), CExternal(1))
    val b = CByteArrayLen(CExternal(1), CExternal(2))
    val c = CByteArrayStop(0, 2)
    val d = CByteArrayStop(0, 3)
    assert(CramRecordCodec.closeConsumedExt(Set.empty, Seq(a, b, c, d)) == Set(1, 2))
    // order-independence: the fixpoint must not depend on iteration order
    assert(CramRecordCodec.closeConsumedExt(Set.empty, Seq(d, c, b, a)) == Set(1, 2))
    // distinct-cid layout (our writer, htsjdk default): nothing grows
    assert(CramRecordCodec.closeConsumedExt(Set(5), Seq(CByteArrayStop(0, 6), d)) == Set(5))
  }

  test("foreign shared-block CRAM: skipped codec must not desync a wanted tag") {
    import graft.bam.{BamFieldMask, SamHeader}
    // Layout a valid-but-foreign writer could emit (our writer never shares
    // content ids): block 20 interleaves XM's stop-terminated values with
    // XN's ITF8 lengths; block 21 interleaves XN's values with wanted XA's.
    // With only XA projected, XN is consumed (shares 21 with XA); skipping
    // XM would leave its bytes in block 20, feeding XN garbage LENGTHS and
    // desyncing XA's stream — the fixpoint must consume XM too.
    val n = 5
    def key(t: String, typ: Char) =
      (t.charAt(0).toInt << 16) | (t.charAt(1).toInt << 8) | typ.toInt
    def const(v: Int) = CHuffman(Array(v), Array(0))
    val ch = CramRecordCodec.CompHeader(
      rnPreserved = false, apDelta = false, refRequired = false,
      subMatrix = Array.fill[Byte](5)(0x1b),
      tagDict = Vector(Vector(("XM", 'Z'), ("XN", 'Z'), ("XA", 'Z'), ("XD", 'Z'))),
      series = Map(
        "BF" -> const(4), "CF" -> const(0), "RL" -> const(0),
        "AP" -> const(0), "RG" -> const(-1), "TL" -> const(0)),
      tagCodecs = Map(
        key("XM", 'Z') -> CByteArrayStop(9, 20),
        key("XN", 'Z') -> CByteArrayLen(CExternal(20), CExternal(21)),
        key("XA", 'Z') -> CByteArrayStop(9, 21),
        key("XD", 'Z') -> CByteArrayStop(9, 23)))
    val b20 = new java.io.ByteArrayOutputStream()
    val b21 = new java.io.ByteArrayOutputStream()
    (0 until n).foreach { i =>
      b20.write(s"m$i".getBytes("ASCII")); b20.write(9) // XM value + stop
      val xn = s"n$i".getBytes("ASCII")
      b20.write(xn.length) // XN ITF8 length (single byte below 0x80)
      b21.write(xn) // XN value
      b21.write(s"aval$i".getBytes("ASCII")); b21.write(9) // XA value + stop
    }
    def raw(cid: Int, bytes: Array[Byte]) =
      new CramRecordCodec.LazyBlock(0, 4, cid, bytes, bytes.length)
    val ext = Map(
      20 -> raw(20, b20.toByteArray),
      21 -> raw(21, b21.toByteArray),
      // XD is untouched by any consumer: its block carries garbage under a
      // DECLARED gzip method, so merely inflating it would throw — proof
      // the exclusive-block skip survives the fixpoint
      23 -> new CramRecordCodec.LazyBlock(1, 4, 23, Array[Byte](1, 2, 3), 16))
    val sh = CramRecordCodec.SliceHeader(-1, 0, 0, n, 3, Array(20, 21, 23), -1,
      new Array[Byte](16))
    val mask = BamFieldMask(cigarAndEnd = false, seq = false, qual = false,
      attrs = false, tagCols = Vector("XA"))
    // materialization probe: consumed XM/XN must be POSITION-skipped — only
    // the wanted XA values (5 bytes x 5 records) are ever copied
    var materialized = 0L
    val recs = CramRecordCodec.decodeSlice(ch, sh, Array.emptyByteArray, ext,
      SamHeader("@HD\tVN:1.6\n", Vector.empty), null, mask,
      probe = materialized += _).toVector
    assert(recs.length == n)
    recs.zipWithIndex.foreach { case (r, i) =>
      assert(r.attributes == Map("XA" -> s"Z:aval$i"),
        s"record $i decoded ${r.attributes} — shared-stream desync")
    }
    assert(materialized == n * 5L,
      s"consumed values were copied: $materialized bytes materialized, want ${n * 5}")
  }

  test("seq pruned -> ref-required CRAM readable without fasta, cigar/end exact") {
    val dir = tmpDir()
    // deterministic indexed FASTA (the CramRecordsSourceSpec shape)
    def refBase(p: Int): Char = "ACGT".charAt(p * 7 % 4)
    val fa = dir.resolve("ref.fasta")
    val len = 120000
    val sb = new StringBuilder(">chrR\n")
    val offset = sb.length.toLong
    var i = 0
    while (i < len) {
      val lineLen = math.min(60, len - i)
      var j = 0
      while (j < lineLen) { sb.append(refBase(i + j)); j += 1 }
      sb.append('\n'); i += lineLen
    }
    Files.write(fa, sb.toString.getBytes("UTF-8"))
    Files.write(dir.resolve("ref.fasta.fai"),
      s"chrR\t$len\t$offset\t60\t61\n".getBytes("UTF-8"))
    val rl = 40
    val recs = (0 until 1200).map { i =>
      val start = i * 31 % 99000 + 1
      val seq = (0 until rl).map(j => refBase(start - 1 + j)).mkString
      graft.bam.AlignmentRecord(s"r$i", 0, "chrR", start, start + rl - 1, 60, s"${rl}M",
        null, 0, 0, seq, "F" * rl, Map("XO" -> s"i:${i % 50}"))
    }
    val s = spark
    import s.implicits._
    val out = dir.resolve("rr.cram")
    s.createDataset(recs).toDF().write.format("cram").mode("overwrite")
      .option("records", "true").option("refs", "chrR:200000")
      .option("recordsPerContainer", "400")
      .option("fasta", fa.toString).save(out.toString)

    // full read without fasta still fails loudly (seq needs the reference)
    val ex = intercept[org.apache.spark.SparkException] {
      spark.read.format("cram").option("records", "true").load(out.toString).collect()
    }
    def rootMsg(t: Throwable): String =
      if (t.getCause == null) String.valueOf(t.getMessage) else rootMsg(t.getCause)
    assert(rootMsg(ex).contains("requires reference bases"))

    // seq-pruned read needs NO reference at all, and cigar/end stay exact
    val got = spark.read.format("cram").option("records", "true").load(out.toString)
      .select(col("readName"), col("start"), col("end"), col("cigar"))
      .orderBy(col("readName")).collect()
    assert(got.length == 1200)
    val want = recs.map(r => (r.readName, r.start, r.end, r.cigar)).sortBy(_._1)
    got.zip(want).foreach { case (g, w) =>
      assert((g.getString(0), g.getInt(1), g.getInt(2), g.getString(3)) == w)
    }
  }
}
