package graft.sources.vcf

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.vcf.{Genotype, VcfCodec, VcfFormatMask}

/** VCF FORMAT-field projection — the genotype-side analog of the BAM
  * `tagColumns` walk. Pins (1) the SKIP property via the codec's
  * materialization probe: unrequested FORMAT values are never turned into
  * strings, (2) exact equivalence of the selective decode against the full
  * decode across the awkward text shapes (trailing dropped fields, empty
  * sample columns, FORMAT without GT, duplicate FORMAT keys, trailing
  * colons), (3) the end-to-end `.option("formatFields", ...)` read and the
  * automatic nested-pruning fast path, (4) option validation.
  */
class VcfFormatProjectionSpec extends AnyFunSuite with SparkFixture {

  private val samples = Seq("sA", "sB", "sC")

  private def tmp(): String = {
    val d = Files.createTempDirectory("vcffmtproj")
    d.toFile.deleteOnExit()
    d.toString
  }

  private val wideLine =
    "chr1\t100\t.\tA\tG\t30\tPASS\t.\tGT:DP:GQ:AD:PL\t" +
      "0/1:12:99:6,6:50,0,40\t1/1:7:88:0,7:90,9,0\t0/0:33:97:33,0:0,10,100"

  test("probe: unrequested FORMAT values are never materialized") {
    def decode(mask: VcfFormatMask): (Seq[Genotype], Seq[String]) = {
      val seen = scala.collection.mutable.ArrayBuffer[String]()
      val v = VcfCodec.fromLine(wideLine, samples, mask, seen += _)
      (v.genotypes, seen.toSeq)
    }
    // full decode materializes every non-GT FORMAT value (4 per sample)
    val (_, fullSeen) = decode(VcfFormatMask.All)
    assert(fullSeen.size == 12)
    // gt-only (fields pruned away): ZERO field values materialized
    val gtOnly = VcfFormatMask(genotypes = true, sample = true, gt = true,
      fields = false, fieldKeys = None)
    val (gtGenos, gtSeen) = decode(gtOnly)
    assert(gtSeen.isEmpty)
    assert(gtGenos.map(_.gt) == Seq("0/1", "1/1", "0/0"))
    assert(gtGenos.forall(_.fields.isEmpty))
    // formatFields = GT,DP: only the three DP values are materialized
    val sel = VcfFormatMask(genotypes = true, sample = true, gt = true,
      fields = true, fieldKeys = Some(Vector("GT", "DP")))
    val (selGenos, selSeen) = decode(sel)
    assert(selSeen.sorted == Seq("12", "33", "7"))
    assert(selGenos.map(_.fields) == Seq(Map("DP" -> "12"), Map("DP" -> "7"), Map("DP" -> "33")))
    assert(selGenos.map(_.gt) == Seq("0/1", "1/1", "0/0"))
    // genotypes pruned entirely: nothing past the mandatory fields is read
    val none = VcfFormatMask(genotypes = false, sample = false, gt = false,
      fields = false, fieldKeys = None)
    val (noneGenos, noneSeen) = decode(none)
    assert(noneGenos.isEmpty && noneSeen.isEmpty)
  }

  test("selective decode is value-identical to the full decode on awkward shapes") {
    val lines = Seq(
      wideLine,
      // trailing fields dropped per sample (VCF §1.6.2 allows it)
      "chr1\t200\t.\tA\tG\t30\tPASS\t.\tGT:DP:GQ\t0/1:5\t1/1\t0/0:9:77",
      // FORMAT without GT (site-only annotation)
      "chr1\t300\t.\tA\tG\t30\tPASS\t.\tDP:GQ\t5:50\t6:60\t7:70",
      // empty + all-colon sample columns (split edge semantics)
      "chr1\t400\t.\tA\tG\t30\tPASS\t.\tGT:DP\t\t:\t0/1:8",
      // duplicate FORMAT key: first position, last value below token count
      "chr1\t500\t.\tA\tG\t30\tPASS\t.\tDP:GT:DP\t1:0/1:2\t3:1/1\t4",
      // trailing colons drop trailing empty tokens
      "chr1\t600\t.\tA\tG\t30\tPASS\t.\tGT:DP:GQ\t0/1:5:\t1/1::\t0/0:6:7",
      // empty tokens mid-column are kept
      "chr1\t700\t.\tA\tG\t30\tPASS\t.\tGT:DP:GQ\t0/1::70\t./.:2:80\t1|0:3:90")
    for (line <- lines) {
      val full = VcfCodec.fromLine(line, samples)
      val fmtKeys = line.split('\t')(8).split(':').toVector.distinct
      // selecting EVERY key must reproduce the full decode exactly
      val allSel = VcfFormatMask(genotypes = true, sample = true, gt = true,
        fields = true, fieldKeys = Some(fmtKeys))
      val selAll = VcfCodec.fromLine(line, samples, allSel, null)
      assert(selAll == full, s"all-keys selective != full for: $line")
      // gt-only must agree on gt
      val gtOnly = VcfFormatMask(genotypes = true, sample = true, gt = true,
        fields = false, fieldKeys = None)
      val selGt = VcfCodec.fromLine(line, samples, gtOnly, null)
      assert(selGt.genotypes.map(_.gt) == full.genotypes.map(_.gt), s"gt mismatch for: $line")
      // single-key projections must each agree with the full map's view
      for (k <- fmtKeys if k != "GT") {
        val selK = VcfCodec.fromLine(line, samples,
          allSel.copy(fieldKeys = Some(Vector(k))), null)
        assert(selK.genotypes.map(_.fields.get(k)) == full.genotypes.map(_.fields.get(k)),
          s"key $k mismatch for: $line")
      }
      // mandatory fields are identical when genotypes are pruned away
      val none = VcfCodec.fromLine(line, samples,
        VcfFormatMask(genotypes = false, sample = false, gt = false,
          fields = false, fieldKeys = None), null)
      assert((none.contig, none.start, none.end, none.ref, none.alt, none.info) ==
        (full.contig, full.start, full.end, full.ref, full.alt, full.info))
    }
  }

  test("end-to-end: formatFields option restricts the fields map, values exact") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    def geno(j: Int) = struct(
      lit(s"s$j").as("sample"),
      when(($"l_orderkey" + lit(j)) % 3 === 0, "0/0")
        .when(($"l_orderkey" + lit(j)) % 3 === 1, "0/1").otherwise("1/1").as("gt"),
      map(
        lit("DP"), (($"l_suppkey" + lit(j)) % 50).cast("string"),
        lit("GQ"), (($"l_partkey" + lit(j)) % 99).cast("string"),
        lit("AD"), concat((($"l_suppkey" + lit(j)) % 9).cast("string"), lit(","),
          (($"l_suppkey" + lit(j)) % 7).cast("string"))).as("fields"))
    val vars = graft.queries.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .limit(500)
      .select(
        concat(lit("chr"), ($"l_orderkey" % 3).cast("string")).as("contig"),
        ((($"l_partkey" * 37) % 999000) + 1).cast("int").as("start"),
        ((($"l_partkey" * 37) % 999000) + 1).cast("int").as("end"),
        lit(null).cast("string").as("id"),
        lit("A").as("ref"), array(lit("G")).as("alt"),
        lit(30.0).as("qual"), array(lit("PASS")).as("filters"),
        map().cast(MapType(StringType, StringType, valueContainsNull = false)).as("info"),
        array(geno(1), geno(2), geno(3)).as("genotypes"))
    val path = s"${tmp()}/wide.vcf.bgz"
    vars.write.format("vcf").mode("overwrite").option("compressionLevel", "1").save(path)

    val full = spark.read.format("vcf").load(path)
      .select($"start", explode($"genotypes").as("g"))
      .select($"start", $"g.sample".as("sample"), $"g.gt".as("gt"),
        element_at($"g.fields", "DP").as("dp"), map_keys($"g.fields").as("ks"))
      .collect()
    assert(full.forall(_.getSeq[String](4).toSet == Set("DP", "GQ", "AD")))

    val proj = spark.read.format("vcf").option("formatFields", "GT,DP").load(path)
      .select($"start", explode($"genotypes").as("g"))
      .select($"start", $"g.sample".as("sample"), $"g.gt".as("gt"),
        element_at($"g.fields", "DP").as("dp"), map_keys($"g.fields").as("ks"))
      .collect()
    // the projected map carries ONLY the requested key…
    assert(proj.forall(_.getSeq[String](4).toSeq == Seq("DP")))
    // …and (start, sample) -> (gt, dp) is value-identical to the full read
    def keyed(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getInt(0), r.getString(1)) -> ((r.getString(2), r.getString(3)))).toMap
    assert(keyed(proj) == keyed(full))
  }

  test("automatic fast path: nested pruning yields gt without FORMAT maps") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val vars = Seq(
      ("chr1", 10, "0/1", "5"), ("chr1", 20, "1/1", "7"), ("chr2", 30, "0/0", "9"))
      .toDF("contig", "start", "gt", "dp")
      .select($"contig", $"start", $"start".as("end"),
        lit(null).cast("string").as("id"),
        lit("A").as("ref"), array(lit("G")).as("alt"),
        lit(30.0).as("qual"), array(lit("PASS")).as("filters"),
        map().cast(MapType(StringType, StringType, valueContainsNull = false)).as("info"),
        array(struct(lit("s1").as("sample"), $"gt".as("gt"),
          map(lit("DP"), $"dp").as("fields"))).as("genotypes"))
    val path = s"${tmp()}/prune.vcf"
    vars.write.format("vcf").mode("overwrite").save(path)
    val got = spark.read.format("vcf").load(path)
      .select($"start", $"genotypes"(0).getField("gt").as("gt"))
      .orderBy($"start").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got == Seq((10, "0/1"), (20, "1/1"), (30, "0/0")))
    // top-level-only projection exercises the capped mandatory-field split
    val contigs = spark.read.format("vcf").load(path)
      .groupBy($"contig").count().orderBy($"contig")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(contigs == Seq(("chr1", 2L), ("chr2", 1L)))
  }

  test("INFO projection: unrequested INFO values never materialized, END honored") {
    val line = "chr1\t100\t.\tAT\tG\t30\tPASS\t" +
      "DP=55;DB;CSQ=hugeannotation|x|y|z;END=222;AF=0.5\tGT\t0/1\t1/1\t0/0"
    def decode(mask: VcfFormatMask): (graft.vcf.Variant, Seq[String]) = {
      val seen = scala.collection.mutable.ArrayBuffer[String]()
      (VcfCodec.fromLine(line, samples, mask, seen += _), seen.toSeq)
    }
    val noG = VcfFormatMask(genotypes = false, sample = false, gt = false,
      fields = false, fieldKeys = None)
    // full: every non-empty INFO value materialized (DB flag has none)
    val (vFull, fullSeen) = decode(noG)
    assert(fullSeen.toSet == Set("55", "hugeannotation|x|y|z", "222", "0.5"))
    assert(vFull.end == 222 && vFull.info("DB") == "")
    // info+end pruned: nothing materialized, map empty, default end
    val (vNone, noneSeen) = decode(noG.copy(info = false, end = false))
    assert(noneSeen.isEmpty && vNone.info.isEmpty && vNone.end == 101)
    // end-only: END honored, no map values materialized
    val (vEnd, endSeen) = decode(noG.copy(info = false, end = true))
    assert(endSeen.isEmpty && vEnd.end == 222 && vEnd.info.isEmpty)
    // infoFields=DP: only DP's value materialized; flags/END behavior intact
    val (vDp, dpSeen) = decode(noG.copy(infoKeys = Some(Vector("DP", "DB"))))
    assert(dpSeen == Seq("55"))
    assert(vDp.info == Map("DP" -> "55", "DB" -> "") && vDp.end == 222)
    // equivalence: selecting EVERY key reproduces the full map + end
    val allKeys = Vector("DP", "DB", "CSQ", "END", "AF")
    val (vAll, _) = decode(noG.copy(infoKeys = Some(allKeys)))
    assert(vAll.info == vFull.info && vAll.end == vFull.end)
    // duplicate key: last value wins on both paths
    val dup = "chr1\t10\t.\tA\tG\t.\t.\tDP=1;DP=9"
    assert(VcfCodec.fromLine(dup, Nil).info("DP") == "9")
    val (vDup, _) = (VcfCodec.fromLine(dup, Nil, noG.copy(infoKeys = Some(Vector("DP"))), null), ())
    assert(vDup.info("DP") == "9")
    // malformed END flag (no value) throws on both paths
    val badEnd = "chr1\t10\t.\tA\tG\t.\t.\tEND"
    assertThrows[Exception](VcfCodec.fromLine(badEnd, Nil))
    assertThrows[Exception](VcfCodec.fromLine(badEnd, Nil, noG.copy(info = false, end = true), null))
  }

  test("INFO projection end-to-end: infoFields option + interval exactness with pruned end") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // deletion record: start 100, INFO END=200 — overlaps 150-160 only via END
    val vars = Seq(
      ("chr1", 100, 200, "55"), ("chr1", 300, 300, "7"), ("chr1", 400, 400, "9"))
      .toDF("contig", "start", "end", "dp")
      .select($"contig", $"start", $"end",
        lit(null).cast("string").as("id"), lit("A").as("ref"),
        array(lit("G")).as("alt"), lit(30.0).as("qual"),
        array(lit("PASS")).as("filters"),
        map_concat(
          map(lit("DP"), $"dp"), map(lit("CSQ"), lit("big|annotation|payload")),
          when($"end" =!= $"start", map(lit("END"), $"end".cast("string")))
            .otherwise(map().cast(MapType(StringType, StringType, valueContainsNull = false)))).as("info"),
        array(struct(lit("s1").as("sample"), lit("0/1").as("gt"),
          map().cast(MapType(StringType, StringType, valueContainsNull = false)).as("fields"))).as("genotypes"))
    val path = s"${tmp()}/info.vcf"
    vars.write.format("vcf").mode("overwrite").save(path)
    // infoFields restricts the map, values exact
    val proj = spark.read.format("vcf").option("infoFields", "DP").load(path)
      .select($"start", map_keys($"info").as("ks"), element_at($"info", "DP").as("dp"))
      .orderBy($"start").collect()
    assert(proj.forall(_.getSeq[String](1).toSeq == Seq("DP")))
    assert(proj.map(r => (r.getInt(0), r.getString(2))).toSeq ==
      Seq((100, "55"), (300, "7"), (400, "9")))
    // interval + fully-pruned projection: the END-extended record must be
    // found even though neither info nor end is in the projected schema
    val hit = spark.read.format("vcf").option("intervals", "chr1:150-160").load(path)
      .select($"contig", $"start").collect()
    assert(hit.map(r => (r.getString(0), r.getInt(1))).toSeq == Seq(("chr1", 100)))
    // end column honored when selected (mask.end -> END scan)
    val ends = spark.read.format("vcf").load(path)
      .select($"start", $"end").orderBy($"start").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(ends == Seq((100, 200), (300, 300), (400, 400)))
  }

  test("plans pin the pruning: scan readSchema drops fields/info under projection") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val vars = Seq(("chr1", 10, "0/1", "5"))
      .toDF("contig", "start", "gt", "dp")
      .select($"contig", $"start", $"start".as("end"),
        lit(null).cast("string").as("id"),
        lit("A").as("ref"), array(lit("G")).as("alt"),
        lit(30.0).as("qual"), array(lit("PASS")).as("filters"),
        map(lit("DP"), $"dp").as("info"),
        array(struct(lit("s1").as("sample"), $"gt".as("gt"),
          map(lit("GQ"), lit("99")).as("fields"))).as("genotypes"))
    val path = s"${tmp()}/prune2.vcf"
    vars.write.format("vcf").mode("overwrite").save(path)
    def scanSchema(df: org.apache.spark.sql.DataFrame): StructType =
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan.readSchema()
      }.head
    // explode + gt-only: the genotype struct must prune to a subset
    // without `fields`, and info/end must be gone from the scan entirely
    val s1 = scanSchema(spark.read.format("vcf").load(path)
      .select(explode($"genotypes").as("g")).select($"g.gt"))
    assert(s1.fieldNames.toSet.subsetOf(Set("genotypes")), s1.treeString)
    val gElem = s1("genotypes").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    assert(!gElem.fieldNames.contains("fields"),
      s"fields not pruned through explode: ${gElem.treeString}")
    assert(gElem.fieldNames.contains("gt"))
    // top-level-only projection: neither genotypes nor info nor end read
    val s2 = scanSchema(spark.read.format("vcf").load(path).select($"contig", $"start"))
    assert(s2.fieldNames.toSet == Set("contig", "start"), s2.treeString)
  }

  test("option validation fails loudly") {
    val ex1 = intercept[Exception] {
      spark.read.format("vcf").option("formatFields", "GT,D P")
        .load("/nonexistent.vcf").collect()
    }
    assert(ex1.getMessage != null)
    val ex2 = intercept[Exception] {
      spark.read.format("vcf").option("formatFields", " , ")
        .load("/nonexistent.vcf").collect()
    }
    assert(ex2.getMessage != null)
  }
}
